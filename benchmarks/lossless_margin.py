"""Margin analysis for cross-batch-width greedy losslessness on TPU.

SURVEY §7 hard-part-4 / round-2 review item #3: the AR decode program
(Q=1) and the lookahead verify program (Q=1+R*L) are different XLA
programs; bf16 accumulation-order differences can flip a greedy argmax
when the top-2 logit margin is within the numerical noise. This module
measures BOTH quantities directly so a divergence in the headline bench
can be classified as a sub-noise TIE (the two programs disagree on a
coin-flip token; spec decode remains faithful to ITS verify program's
greedy walk — the algorithmic lossless contract) or a REAL numerics bug
(margin >> noise):

  1. teacher-forced width-1 replay of the AR stream, recording fp32
     top-2 logits per position (bitwise identical to the original AR walk
     — the teacher tokens ARE its argmaxes);
  2. teacher-forced width-Q replay of the SAME stream through the verify
     layout (branch 0 = the AR continuation, other branches invalid —
     exactly the engine's full-hit verify geometry, engine/step.py
     verify_parallel_core), recording per-node fp32 top-2 and the logit
     of the AR token;
  3. stats: cross-width argmax flip positions + their margins, the
     cross-width logit noise on the AR token, and the margin
     distribution at agreeing positions.

A divergence whose width-1 margin sits below the measured noise ceiling
(x4 headroom) is a tie. bench.py gates its `lossless` bit on this rule
(extra.divergence_margin / tie_eps in the JSON).

Reference losslessness contract: the exact greedy walk in
lookahead pretrained_model.py:827-860.

Usage: PYTHONPATH=. python benchmarks/lossless_margin.py [R] [L] [N]
(defaults 2 8 512 — the round-2 failing grid cell geometry).
Env: MARGIN_MODEL=7b-int4|1b-bf16|tiny, MARGIN_VOCAB, MARGIN_CPU=1.
"""

import functools
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np


def replay_margins(params, cfg, spec, ecfg, prompt, stream, R, L):
    """Teacher-forced width-1 and width-Q replays of ``stream`` (a greedy
    AR continuation of ``prompt``; stream[0] = the prefill's first token).

    Returns a dict with per-position fp32 top-2 margins from both
    programs, cross-width flips, and the measured cross-width noise.
    """
    import jax
    import jax.numpy as jnp

    from painlessinferenceacceleration_tpu.engine.cache import init_kv_cache
    from painlessinferenceacceleration_tpu.engine.step import prefill_step
    from painlessinferenceacceleration_tpu.lookahead.device_tables import (
        build_tree_inputs,
    )
    from painlessinferenceacceleration_tpu.models.base import (
        logits_from_hidden,
        transformer_hidden,
    )

    P = ecfg.pages_per_req
    pt = jnp.arange(1, 1 + P, dtype=jnp.int32)[None]
    ctx0 = jnp.array([len(prompt)], jnp.int32)
    n_win = (len(stream) - 1) // (L + 1)
    n = n_win * (L + 1)
    stream_j = jnp.asarray(np.asarray(stream[: n + 1], np.int32))

    def prefill():
        kv = init_kv_cache(cfg, ecfg, dtype=jnp.bfloat16)
        kv, nxt, _ = prefill_step(
            params, kv, cfg, jnp.array([prompt], jnp.int32),
            jnp.zeros((1,), jnp.int32), jnp.array([len(prompt)], jnp.int32),
            pt, spec,
        )
        return kv, nxt

    # ------- width-1 teacher-forced walk, fp32 top-2 per position -------
    # params/stream/pt are ARGUMENTS, never closed over: a closure would
    # capture the full weights as constants and serialize GBs through the
    # remote-compile relay (measured: 3.77GB upload, ~15 min per compile)
    @functools.partial(
        jax.jit, static_argnames=("cfg", "spec", "n"),
        donate_argnames=("kv",),
    )
    def w1_replay(params, kv, stream_j, pt, ctx0, cfg, spec, n):
        ones = jnp.ones((1,), bool)

        def step(carry, t):
            kv, ctx = carry
            last = stream_j[t][None]
            qm = jnp.ones((1, 1, 1), bool)
            h, kv = transformer_hidden(
                params, cfg, kv, last[:, None], ctx[:, None], pt, ctx, qm,
                ones[:, None], spec,
            )
            lg = logits_from_hidden(params, cfg, h, spec)[0, 0]  # [V] f32
            v2, i2 = jax.lax.top_k(lg, 2)
            return (kv, ctx + 1), (v2, i2.astype(jnp.int32))

        (kv, _), (v2s, i2s) = jax.lax.scan(
            step, (kv, ctx0), jnp.arange(n), length=n
        )
        return kv, v2s, i2s

    kv, first = prefill()
    assert int(first[0]) == int(stream[0]), "stream does not continue prompt"
    kv, w1_v2, w1_i2 = w1_replay(
        params, kv, stream_j, pt, ctx0, cfg=cfg, spec=spec, n=n
    )
    w1_v2 = np.asarray(w1_v2)  # [n, 2] (also the sync)
    w1_i2 = np.asarray(w1_i2)
    print(f"# w1 replay done: {n} positions", file=_sys.stderr)

    # ------- width-Q teacher-forced verify replay -------
    Q = 1 + R * L

    @functools.partial(
        jax.jit, static_argnames=("cfg", "spec", "R", "L", "n_win"),
        donate_argnames=("kv",),
    )
    def wq_replay(params, kv, stream_j, pt, ctx0, cfg, spec, R, L, n_win):
        def step(carry, w):
            kv, ctx = carry
            t0 = w * (L + 1)
            root = stream_j[t0]
            chain = jax.lax.dynamic_slice(stream_j, (t0 + 1,), (L,))
            branches = jnp.full((R, L), -1, jnp.int32).at[0].set(chain)
            tokens, parents, qmask, depth = build_tree_inputs(root, branches)
            positions = ctx[:, None] + depth[None]
            valid = (parents > -2)[None]
            h, kv = transformer_hidden(
                params, cfg, kv, tokens[None], positions, pt, ctx,
                qmask[None], valid, spec,
            )
            lg = logits_from_hidden(params, cfg, h, spec)[0]  # [Q, V] f32
            # rows predicting the stream: root (node 0) + branch-0 nodes 1..L
            rows = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                    1 + jnp.arange(L, dtype=jnp.int32)])
            lgr = lg[rows]  # [L+1, V]
            v2, i2 = jax.lax.top_k(lgr, 2)
            # fp32 logit of the AR token at each predicted position
            ar_next = jax.lax.dynamic_slice(stream_j, (t0 + 1,), (L + 1,))
            l_ar = jnp.take_along_axis(lgr, ar_next[:, None], axis=1)[:, 0]
            return (kv, ctx + (L + 1)), (v2, i2.astype(jnp.int32), l_ar)

        (kv, _), (v2s, i2s, lars) = jax.lax.scan(
            step, (kv, ctx0), jnp.arange(n_win), length=n_win
        )
        return kv, v2s, i2s, lars

    kv2, _ = prefill()
    kv2, q_v2, q_i2, q_lar = wq_replay(
        params, kv2, stream_j, pt, ctx0, cfg=cfg, spec=spec, R=R, L=L,
        n_win=n_win,
    )
    q_v2 = np.asarray(q_v2).reshape(n, 2)  # sync
    q_i2 = np.asarray(q_i2).reshape(n, 2)
    q_lar = np.asarray(q_lar).reshape(n)
    print(f"# wQ replay done: {n_win} windows (Q={Q})", file=_sys.stderr)

    ar_next = np.asarray(stream[1 : n + 1])
    flips = np.nonzero(q_i2[:, 0] != ar_next)[0]
    agree = q_i2[:, 0] == ar_next
    # cross-width noise: |l_wQ[ar_tok] - l_w1[ar_tok]| on agreeing positions
    noise = np.abs(q_lar[agree] - w1_v2[agree, 0])
    m1 = w1_v2[:, 0] - w1_v2[:, 1]
    mq = q_v2[:, 0] - q_v2[:, 1]
    noise_max = float(noise.max()) if noise.size else 0.0
    tie_eps = 4.0 * noise_max
    return {
        "n": int(n),
        "Q": Q,
        "margins_w1": m1,
        "margins_wQ": mq,
        "flips": flips,
        "noise_top1_median": float(np.median(noise)) if noise.size else 0.0,
        "noise_top1_p99": float(np.quantile(noise, 0.99)) if noise.size else 0.0,
        "noise_top1_max": noise_max,
        "tie_eps": tie_eps,
        "margin_agree_median": float(np.median(m1[agree])) if agree.any() else 0.0,
    }


def run(R=2, L=8, n_tokens=512, model="7b-int4", vocab=32000, seed=0):
    """CLI: generate an AR stream on random weights, then analyze it."""
    import jax

    if _os.environ.get("MARGIN_CPU") == "1":  # hermetic smoke-test mode
        jax.config.update("jax_platforms", "cpu")
    import dataclasses as _dc
    import json

    import jax.numpy as jnp

    from painlessinferenceacceleration_tpu.config import (
        EngineConfig,
        ModelConfig,
    )
    from painlessinferenceacceleration_tpu.engine.cache import init_kv_cache
    from painlessinferenceacceleration_tpu.engine.multistep import (
        multistep_decode,
    )
    from painlessinferenceacceleration_tpu.engine.step import prefill_step
    from painlessinferenceacceleration_tpu.layers.linear import QuantSpec
    from painlessinferenceacceleration_tpu.models.base import (
        init_params,
        init_params_quantized,
    )

    if model == "7b-int4":
        cfg, spec = ModelConfig.llama2_7b(), QuantSpec(bits=4, group=128)
    elif model == "1b-bf16":
        cfg, spec = ModelConfig.tinyllama_1b(), None
    elif model == "tiny":
        cfg, spec = ModelConfig.tiny(), None
    else:
        raise SystemExit(f"unknown model {model}")
    cfg = _dc.replace(cfg, vocab_size=vocab)
    if spec is None:
        params = init_params(cfg, jax.random.PRNGKey(seed), dtype=jnp.bfloat16)
    else:
        params = init_params_quantized(cfg, jax.random.PRNGKey(seed), spec)
    ecfg = EngineConfig(page_size=64, max_seq_len=4096, max_concurrency=1)
    P = ecfg.pages_per_req
    pt = jnp.arange(1, 1 + P, dtype=jnp.int32)[None]

    from bench import _corpus_tokens

    prompt = _corpus_tokens(256, cfg.vocab_size)

    kv = init_kv_cache(cfg, ecfg, dtype=jnp.bfloat16)
    kv, nxt, _ = prefill_step(
        params, kv, cfg, jnp.array([prompt], jnp.int32),
        jnp.zeros((1,), jnp.int32), jnp.array([len(prompt)], jnp.int32),
        pt, spec,
    )
    kv, toks, _, _, _ = multistep_decode(
        params, kv, cfg, nxt, jnp.array([len(prompt)], jnp.int32),
        jnp.ones((1,), bool), pt, n_steps=n_tokens, spec=spec,
    )
    stream = [int(nxt[0])] + np.asarray(toks[0]).tolist()
    print(f"# AR stream generated: {len(stream)} tokens", file=_sys.stderr)

    st = replay_margins(params, cfg, spec, ecfg, prompt, stream, R, L)
    flips = st["flips"]
    m1, mq = st["margins_w1"], st["margins_wQ"]
    ties = [
        int(i) for i in flips
        if m1[i] < st["tie_eps"] and mq[i] < st["tie_eps"]
    ]
    out = {
        "geometry": {"R": R, "L": L, "Q": st["Q"], "n": st["n"],
                     "model": model},
        "flips": int(flips.size),
        "flip_positions": flips[:32].tolist(),
        "flip_margins_w1": m1[flips][:32].round(5).tolist(),
        "flip_margins_wQ": mq[flips][:32].round(5).tolist(),
        "noise_top1_median": st["noise_top1_median"],
        "noise_top1_p99": st["noise_top1_p99"],
        "noise_top1_max": st["noise_top1_max"],
        "margin_agree_median": st["margin_agree_median"],
        "tie_eps": st["tie_eps"],
        "flips_classified_tie": len(ties),
        "all_flips_are_ties": bool(len(ties) == flips.size),
    }
    print(json.dumps(out, indent=1))
    return out


if __name__ == "__main__":
    a = _sys.argv[1:]
    R = int(a[0]) if len(a) > 0 else 2
    L = int(a[1]) if len(a) > 1 else 8
    N = int(a[2]) if len(a) > 2 else 512
    run(R=R, L=L, n_tokens=N, model=_os.environ.get("MARGIN_MODEL", "7b-int4"),
        vocab=int(_os.environ.get("MARGIN_VOCAB", "32000")))
