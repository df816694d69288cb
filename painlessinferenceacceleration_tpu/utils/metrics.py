"""Engine metrics / observability.

Reference: per-step phase timers and rolling throughput logging in
flood/facade/llm.py:1034-1058, 1823-1855; per-request dls/edls/fts/qts in
lookahead (pretrained_model.py:1104-1111). One small struct serves both.
"""

from __future__ import annotations

import dataclasses
import time
from typing import List


@dataclasses.dataclass
class EngineMetrics:
    start_t: float = dataclasses.field(default_factory=time.perf_counter)
    finished: int = 0
    generated_tokens: int = 0
    prefill_time: float = 0.0
    decode_time: float = 0.0
    drain_time: float = 0.0  # D2H burst drains (inside decode_time)
    decode_steps: int = 0
    spec_steps: int = 0
    spec_accepted: int = 0
    spec_wide_steps: int = 0  # verify steps that ran the Q-wide program
    # (spec_steps - spec_wide_steps were adaptively gated to width-1 AR)
    preempted: int = 0
    prefix_hit_tokens: int = 0  # prompt tokens served from the prefix cache
    chained_bursts: int = 0  # pipelined decode bursts dispatched off device carries
    ttft: List[float] = dataclasses.field(default_factory=list)

    @property
    def mean_accepted_per_step(self) -> float:
        return self.spec_accepted / self.spec_steps if self.spec_steps else 0.0

    @property
    def throughput(self) -> float:
        dt = time.perf_counter() - self.start_t
        return self.generated_tokens / dt if dt > 0 else 0.0

    @property
    def p50_ttft(self) -> float:
        if not self.ttft:
            return 0.0
        s = sorted(self.ttft)
        return s[len(s) // 2]

    def summary(self) -> dict:
        return {
            "finished": self.finished,
            "generated_tokens": self.generated_tokens,
            "throughput_tok_s": round(self.throughput, 2),
            "p50_ttft_s": round(self.p50_ttft, 4),
            "prefill_time_s": round(self.prefill_time, 3),
            "decode_time_s": round(self.decode_time, 3),
            "drain_time_s": round(self.drain_time, 3),
            "decode_steps": self.decode_steps,
            "spec_steps": self.spec_steps,
            "mean_accepted_per_step": round(self.mean_accepted_per_step, 2),
            "preempted": self.preempted,
            "prefix_hit_tokens": self.prefix_hit_tokens,
            "chained_bursts": self.chained_bursts,
        }
