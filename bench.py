"""Headline benchmark: lookahead vs vanilla AR decode on one TPU chip.

Mirrors the reference's headline (lookahead/README.md:62-81: Llama2-7b
lookahead vs HF transformers, x2.06 on Dolly/A100) and BASELINE.json's north
star (>2x tokens/sec/chip at 7B INT4 w/ lookahead vs vanilla AR decode).

Both paths run as fully on-device multi-step loops (engine/multistep.py):
the AR baseline is a lax.scan of single-token steps (best-possible vanilla
decode), lookahead adds device-resident draft tables (hash-bucketed 2-gram
-> branch store, the TPU re-design of flood/ops/draft.py GPU tables).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline = our lookahead speedup / 2.06 (the reference's Llama2-7b
Dolly-15k speedup, lookahead/README.md:64).

Notes: runs at the FULL 32k vocab (honest lm_head cost) and prefills a
checked-in real-text corpus (benchmarks/corpus.txt) so prompt-seeded draft
acceptance is honest. Weights are random (no public checkpoint in this
environment): throughput is weight-value-independent, but a random-weight
greedy stream eventually cycles, which inflates mean accepted/step beyond
the reference's real-corpus 2-4 — treat tokens/s as the primary value;
the AR baseline and speedup are measured on identical footing. Env knobs:
BENCH_MODEL=7b-int4|7b-int8|1b-bf16, BENCH_TOKENS, BENCH_BRANCH_LEN,
BENCH_RETRIEVE, BENCH_VOCAB, BENCH_PROMPT=corpus|random.
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
    from painlessinferenceacceleration_tpu.engine.cache import init_kv_cache
    from painlessinferenceacceleration_tpu.engine.multistep import (
        multistep_decode,
        multistep_spec_decode,
    )
    from painlessinferenceacceleration_tpu.engine.step import prefill_step
    from painlessinferenceacceleration_tpu.layers.linear import QuantSpec
    from painlessinferenceacceleration_tpu.lookahead.device_tables import (
        DraftTableConfig,
        init_draft_tables,
        update_tables_seq,
    )
    from painlessinferenceacceleration_tpu.models.base import (
        init_params,
        init_params_quantized,
    )

    model_kind = os.environ.get("BENCH_MODEL", "7b-int4")
    max_new = int(os.environ.get("BENCH_TOKENS", "1536"))
    branch_len = int(os.environ.get("BENCH_BRANCH_LEN", "12"))
    retrieve = int(os.environ.get("BENCH_RETRIEVE", "4"))
    # Full vocab by default (honest per-step cost incl. the lm_head GEMM).
    # BENCH_VOCAB=1024 reproduces the favourable small-vocab mode where the
    # random-weight stream develops n-gram repetition (round-1 headline).
    vocab = int(os.environ.get("BENCH_VOCAB", "32000"))
    # BENCH_PROMPT=corpus (default) prefills real English text (checked-in
    # benchmarks/corpus.txt, word-hash tokenized) so prompt-seeded draft
    # acceptance is honest; =random reproduces the round-1 prompt.
    prompt_src = os.environ.get("BENCH_PROMPT", "corpus")
    dev = jax.devices()[0]
    print(f"# bench device: {dev}", file=sys.stderr)

    if model_kind == "7b-int4":
        cfg, spec = ModelConfig.llama2_7b(), QuantSpec(bits=4, group=128)
    elif model_kind == "7b-int8":
        cfg, spec = ModelConfig.llama2_7b(), QuantSpec(bits=8, group=128)
    elif model_kind == "7b-fp8":  # W8A8 dynamic fp8 (reference linear.py:318)
        cfg, spec = ModelConfig.llama2_7b(), QuantSpec.from_mode("w8a8_fp8")
    elif model_kind == "3b-mla":  # DeepSeek-class latent attention (bf16)
        cfg, spec = ModelConfig.mla_3b(), None
    elif model_kind == "1b-bf16":
        cfg, spec = ModelConfig.tinyllama_1b(), None
    else:
        raise SystemExit(f"unknown BENCH_MODEL {model_kind}")
    if vocab:
        import dataclasses as _dc

        cfg = _dc.replace(cfg, vocab_size=vocab)
    if spec is None:
        params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    else:
        params = init_params_quantized(cfg, jax.random.PRNGKey(0), spec)

    jax.block_until_ready(params)
    print("# params ready", file=sys.stderr)

    ecfg = EngineConfig(page_size=64, max_seq_len=4096, max_concurrency=1)
    tcfg = DraftTableConfig(
        buckets=16384, ways=8, branch_length=branch_len, retrieve_count=retrieve
    )
    rng = np.random.default_rng(0)
    if prompt_src == "corpus":
        import hashlib

        text = open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "benchmarks", "corpus.txt")
        ).read()
        words = text.split()

        def tok(w):  # stable word-hash "tokenizer" (no HF vocab on disk)
            h = int.from_bytes(hashlib.md5(w.encode()).digest()[:4], "little")
            return 10 + h % (cfg.vocab_size - 20)

        prompt = [tok(w) for w in words[:512]]
    else:
        prompt = rng.integers(10, cfg.vocab_size - 10, size=128).tolist()
    P = ecfg.pages_per_req
    pt = jnp.arange(1, 1 + P, dtype=jnp.int32)[None]

    def prefill():
        kv = init_kv_cache(cfg, ecfg, dtype=jnp.bfloat16)
        kv, nxt, _ = prefill_step(
            params, kv, cfg, jnp.array([prompt], jnp.int32),
            jnp.zeros((1,), jnp.int32), jnp.array([len(prompt)], jnp.int32),
            pt, spec,
        )
        return kv, nxt

    ones = jnp.ones((1,), bool)
    ctx0 = jnp.array([len(prompt)], jnp.int32)

    # ---------------- vanilla AR ----------------
    K = 128
    kv, nxt = prefill()
    kv, toks, last, ctx, act = multistep_decode(
        params, kv, cfg, nxt, ctx0, ones, pt, n_steps=K, spec=spec
    )  # compile + warm
    np.asarray(toks[0, -1])
    kv, nxt = prefill()
    t0 = time.perf_counter()
    produced = 1
    ar_stream = [int(nxt[0])]
    last, ctx, act = nxt, ctx0, ones
    while produced < max_new:
        kv, toks, last, ctx, act = multistep_decode(
            params, kv, cfg, last, ctx, act, pt, n_steps=K, spec=spec
        )
        ar_stream.extend(np.asarray(toks[0]).tolist())  # also the D2H sync
        produced += K
    ar_dt = time.perf_counter() - t0
    ar_tps = produced / ar_dt
    print(f"# vanilla AR: {ar_tps:.1f} tok/s ({produced} tokens)", file=sys.stderr)

    # ---------------- lookahead (device tables) ----------------
    KS = 32
    TAIL = tcfg.branch_length + 2

    def spec_setup():
        kv, nxt = prefill()
        tables = init_draft_tables(tcfg)
        seed = prompt + [int(nxt[0])]
        tables = update_tables_seq(
            tables, tcfg, jnp.array(seed, jnp.int32), jnp.int32(len(seed))
        )
        tail = np.full((1, TAIL), -1, np.int32)
        tail[0, -min(TAIL, len(seed)):] = seed[-TAIL:]
        return kv, tables, nxt, jnp.asarray(tail)

    kv, tables, nxt, tail = spec_setup()
    out = multistep_spec_decode(
        params, kv, tables, cfg, tcfg, nxt, ctx0, ones, tail, pt,
        n_steps=KS, spec=spec,
    )  # compile + warm
    np.asarray(out[3][0, -1])

    kv, tables, nxt, tail = spec_setup()
    last, ctx, act = nxt, ctx0, ones
    produced = 1
    la_stream = [int(nxt[0])]
    steps = 0
    t0 = time.perf_counter()
    counts = []
    while produced < max_new:
        kv, tables, out_toks, n_acc, last, ctx, act, tail = multistep_spec_decode(
            params, kv, tables, cfg, tcfg, last, ctx, act, tail, pt,
            n_steps=KS, spec=spec,
        )
        # one fused D2H fetch per chunk (each separate fetch pays relay RTT)
        packed = jnp.concatenate([n_acc[0], act.astype(jnp.int32)])
        packed = np.asarray(packed)
        ot_np = np.asarray(out_toks[0])
        c = packed[:-1]
        for si in range(KS):
            la_stream.extend(int(x) for x in ot_np[si, : c[si]])
        counts.extend(c.tolist())
        produced += int(c.sum())
        steps += KS
        if not packed[-1]:
            break
    la_dt = time.perf_counter() - t0
    la_tps = produced / la_dt
    live = [c for c in counts if c > 0]
    mean_acc = float(np.mean(live)) if live else 0.0
    warm_acc = float(np.mean(live[len(live) // 2 :])) if live else 0.0
    print(
        f"# lookahead: {la_tps:.1f} tok/s ({produced} tokens, {steps} steps, "
        f"mean accepted/step {mean_acc:.2f}, warm-half {warm_acc:.2f})",
        file=sys.stderr,
    )

    # losslessness: the lookahead stream vs the AR greedy stream
    # token-for-token. Engine exactness is asserted bit-wise in the fp32 CPU
    # tests; on TPU both paths run bf16 at DIFFERENT batch widths (Q=1 vs
    # Q=1+r*bl), so shape-dependent rounding can flip argmaxes whose margin
    # is below bf16 noise — with random weights margins are near zero, so
    # exact match over the full stream is possible but not guaranteed (the
    # reference's fp16 GPUs behave the same; its perf_check checks rouge-L,
    # not exactness). The JSON reports the exact-match bit and the first
    # divergence index.
    ncmp = min(len(ar_stream), len(la_stream))
    diverge = next(
        (i for i in range(ncmp) if ar_stream[i] != la_stream[i]), ncmp
    )
    lossless = diverge == ncmp
    print(f"# lossless: {lossless} over {ncmp} tokens"
          + ("" if lossless else f" (first divergence at {diverge})"),
          file=sys.stderr)

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
            "mean_accepted_per_step": round(mean_acc, 2),
            "warm_half_accepted_per_step": round(warm_acc, 2),
            "model": model_kind,
            "vocab": vocab,
            "prompt_source": prompt_src,
            "new_tokens": max_new,
            "branch_length": branch_len,
            "retrieve_count": retrieve,
            "lossless": bool(lossless),
            "lossless_compared_tokens": ncmp,
            "first_divergence": int(diverge),
        },
    }
    print(json.dumps(result))


def _probe_tpu(timeout_s: int = 180) -> bool:
    """True iff jax.devices() returns within timeout in a CHILD process.

    The axon relay can wedge such that jax.devices() blocks forever (the
    registration RPC never completes); probing in a child keeps this
    process clean so we can emit a diagnostic JSON line instead of hanging
    the driver's bench run."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


if __name__ == "__main__":
    if os.environ.get("BENCH_SKIP_PROBE") != "1" and not _probe_tpu():
        print(json.dumps({
            "metric": "lookahead_tokens_per_sec",
            "value": 0,
            "unit": "tok/s",
            "vs_baseline": 0,
            "error": "tpu unreachable (relay down; jax.devices() hung)",
        }))
        sys.exit(0)
    main()
