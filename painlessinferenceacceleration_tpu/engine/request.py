"""Request objects.

Reference: flood/utils/request.py — ``Req`` (IPC-lean scheduling record with
chunked-prefill cursors done/todo) and ``Request`` (user-facing). Here
there is one process, so one class serves both; the done/todo chunk cursors
survive because chunked prefill works the same way.
"""

from __future__ import annotations

import dataclasses
import queue
from typing import Any, List, Optional


@dataclasses.dataclass
class SamplingParams:
    temperature: float = 0.0  # 0 => greedy
    top_k: int = 0
    top_p: float = 1.0
    min_p: float = 0.0  # 0 => off (HF min_p warper)
    repetition_penalty: float = 1.0
    max_new_tokens: int = 256
    eos_token_id: Optional[int] = None
    # per-request RNG seed; sampling at stream position p draws from
    # fold_in(PRNGKey(seed), p) so runs are reproducible and the sampled
    # speculative path reproduces the AR stream exactly (ops/sample.py)
    seed: int = 0
    # stop token sequences: generation finishes when output ends with any
    # (reference: HF stopping criteria in the generate fork,
    # pretrained_model.py:348-360)
    stop_sequences: Optional[List[List[int]]] = None


class Request:
    """One generation request moving through the engine.

    States: queued -> prefill (chunk cursor ``done`` advances) -> decode ->
    finished. ``target_ids`` enables PPL-scoring mode (reference
    request.py:57 iterate_target) — scored during prefill, no decode.
    """

    __slots__ = (
        "rid", "input_ids", "sampling", "output_ids", "state", "done",
        "pages", "slot", "last_token", "stream_queue", "target_ids",
        "target_logprobs", "finish_reason", "arrival_t", "first_token_t",
        "finish_t", "mm_embeds", "mm_positions",
    )

    def __init__(
        self,
        rid: int,
        input_ids: List[int],
        sampling: Optional[SamplingParams] = None,
        stream: bool = False,
        target_ids: Optional[List[int]] = None,
        mm_embeds=None,  # np [M, E] precomputed multimodal embeddings
        mm_positions: Optional[List[int]] = None,  # prompt positions
    ):
        self.rid = rid
        self.input_ids = list(input_ids)
        self.sampling = sampling or SamplingParams()
        self.output_ids: List[int] = []
        self.state = "queued"
        self.done = 0  # prefill chunk cursor (reference Req.done)
        self.pages: List[int] = []
        self.slot: Optional[int] = None  # decode-batch slot index
        self.last_token: Optional[int] = None
        self.stream_queue: Optional[queue.Queue] = queue.Queue() if stream else None
        self.target_ids = target_ids
        self.target_logprobs: List[float] = []
        self.finish_reason: Optional[str] = None
        self.arrival_t: float = 0.0
        self.first_token_t: float = 0.0
        self.finish_t: float = 0.0
        self.mm_embeds = mm_embeds
        self.mm_positions = mm_positions

    @property
    def prompt_len(self) -> int:
        return len(self.input_ids)

    @property
    def prefill_source(self) -> List[int]:
        """Tokens to (re)prefill. A preempted request (pages were reclaimed
        under memory pressure — the reference parks such requests in
        ``waits``, flood llm.py:848-871; we recompute like vLLM) replays
        prompt + committed outputs except the last, which becomes the decode
        seed again."""
        if self.output_ids:
            return self.input_ids + self.output_ids[:-1]
        return self.input_ids

    @property
    def ctx_len(self) -> int:
        return self.done + len(self.output_ids)

    def emit(self, tokens: List[int]) -> None:
        self.output_ids.extend(tokens)
        if self.stream_queue is not None:
            for t in tokens:
                self.stream_queue.put(t)

    def finish(self, reason: str) -> None:
        self.state = "finished"
        self.finish_reason = reason
        if self.stream_queue is not None:
            self.stream_queue.put(None)  # sentinel
