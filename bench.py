"""Headline benchmark: lookahead vs vanilla AR decode, 7B-class INT4, 1 chip.

Mirrors the reference's headline (lookahead/README.md:62-81: Llama2-7b
lookahead vs HF transformers, x2.06 on Dolly/A100) and BASELINE.json's north
star (>2x tokens/sec/chip at 7B INT4 w/ lookahead vs vanilla AR decode).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline = our lookahead speedup / 2.06 (the reference's Llama2-7b
Dolly-15k speedup, lookahead/README.md:64).

Notes: weights are random (no public checkpoint in this environment) —
throughput is weight-value-independent; acceptance comes from the trie
learning the model's (cyclic) greedy output, which flatters accepted-length
vs a real corpus, so the primary value reported is the measured tokens/sec
and the speedup is reported alongside. Set BENCH_MODEL=1b-bf16 for a quick
machinery check.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from painlessinferenceacceleration_tpu.config import EngineConfig, ModelConfig
    from painlessinferenceacceleration_tpu.layers.linear import QuantSpec
    from painlessinferenceacceleration_tpu.lookahead.generate import LookaheadGenerator
    from painlessinferenceacceleration_tpu.models.base import (
        init_params,
        init_params_quantized,
    )

    model_kind = os.environ.get("BENCH_MODEL", "7b-int4")
    max_new = int(os.environ.get("BENCH_TOKENS", "256"))
    dev = jax.devices()[0]
    print(f"# bench device: {dev}", file=sys.stderr)

    if model_kind == "7b-int4":
        cfg = ModelConfig.llama2_7b()
        spec = QuantSpec(bits=4, group=128)
        params = init_params_quantized(cfg, jax.random.PRNGKey(0), spec)
    elif model_kind == "7b-int8":
        cfg = ModelConfig.llama2_7b()
        spec = QuantSpec(bits=8, group=128)
        params = init_params_quantized(cfg, jax.random.PRNGKey(0), spec)
    elif model_kind == "1b-bf16":
        cfg = ModelConfig.tinyllama_1b()
        spec = None
        params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    else:
        raise SystemExit(f"unknown BENCH_MODEL {model_kind}")

    jax.block_until_ready(params)
    print("# params ready", file=sys.stderr)

    ecfg = EngineConfig(
        page_size=64,
        max_seq_len=2048,
        max_concurrency=1,
        decoding_length=63,
        branch_length=12,
        eos_token_id=-1,  # never stop early
        max_new_tokens=max_new,
        prefill_chunk=256,
    )

    rng = np.random.default_rng(0)
    prompt = rng.integers(10, cfg.vocab_size - 10, size=128).tolist()

    def run(use_la: bool, warm_trie=None):
        gen = LookaheadGenerator(params, cfg, ecfg, quant=spec, dtype=jnp.bfloat16)
        if warm_trie is not None:
            gen.trie = warm_trie
        # warmup/compile on a short run
        gen.generate(prompt, max_new_tokens=8, use_lookahead=use_la)
        t0 = time.perf_counter()
        out = gen.generate(prompt, max_new_tokens=max_new, use_lookahead=use_la)
        dt = time.perf_counter() - t0
        return len(out.sequences) / dt, out, gen.trie

    ar_tps, ar_out, _ = run(False)
    print(f"# vanilla AR: {ar_tps:.1f} tok/s", file=sys.stderr)
    la_tps, la_out, _ = run(True)
    print(
        f"# lookahead: {la_tps:.1f} tok/s, mean accepted/step {la_out.mean_edl:.2f}",
        file=sys.stderr,
    )
    # soft losslessness report: algorithmic bit-identity is proven in fp32
    # CPU tests; at bf16 the Q=1 and Q=64 GEMM shapes may tile differently and
    # flip argmax near-ties (random weights make ties pathologically common)
    agree = 0
    for a, b in zip(la_out.sequences, ar_out.sequences):
        if a != b:
            break
        agree += 1
    frac = agree / max(len(ar_out.sequences), 1)
    print(f"# greedy-prefix agreement: {frac:.3f}", file=sys.stderr)

    speedup = la_tps / ar_tps
    ref_speedup = 2.06  # lookahead/README.md:64 (Llama2-7b, Dolly, A100)
    result = {
        "metric": f"lookahead_decode_tokens_per_sec_{model_kind}",
        "value": round(la_tps, 2),
        "unit": "tokens/s/chip",
        "vs_baseline": round(speedup / ref_speedup, 3),
        "extra": {
            "ar_tokens_per_sec": round(ar_tps, 2),
            "speedup_vs_ar": round(speedup, 3),
            "mean_accepted_per_step": round(la_out.mean_edl, 2),
            "greedy_prefix_agreement": round(frac, 3),
            "model": model_kind,
            "new_tokens": max_new,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
