"""benchmarks/lossless_margin.py: teacher-forced width-1 vs width-Q replay.

On CPU in fp32 the two programs are bit-identical, so the analysis must
report zero argmax flips and (near-)zero cross-width noise on a greedy AR
stream — the degenerate baseline that anchors the TPU margin classifier
(bench.py divergence_is_tie)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.lossless_margin import replay_margins
from painlessinferenceacceleration_tpu.config import EngineConfig, ModelConfig
from painlessinferenceacceleration_tpu.engine.cache import init_kv_cache
from painlessinferenceacceleration_tpu.engine.multistep import multistep_decode
from painlessinferenceacceleration_tpu.engine.step import prefill_step


def test_replay_margins_cpu_identical():
    import dataclasses

    cfg = dataclasses.replace(ModelConfig.tiny(), vocab_size=256)
    from painlessinferenceacceleration_tpu.models.base import init_params

    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    ecfg = EngineConfig(page_size=16, max_seq_len=256, max_concurrency=1)
    P = ecfg.pages_per_req
    pt = jnp.arange(1, 1 + P, dtype=jnp.int32)[None]
    prompt = [11, 22, 33, 44, 55, 66, 77, 88]

    kv = init_kv_cache(cfg, ecfg, dtype=jnp.float32)
    kv, nxt, _ = prefill_step(
        params, kv, cfg, jnp.array([prompt], jnp.int32),
        jnp.zeros((1,), jnp.int32), jnp.array([len(prompt)], jnp.int32),
        pt, None,
    )
    kv, toks, _, _, _, _ = multistep_decode(
        params, kv, cfg, nxt, jnp.array([len(prompt)], jnp.int32),
        jnp.ones((1,), bool), pt, n_steps=27,
    )
    stream = [int(nxt[0])] + np.asarray(toks[0]).tolist()

    R, L = 2, 8
    st = replay_margins(params, cfg, None, ecfg, prompt, stream, R, L)
    assert st["n"] == 27  # 3 windows of L+1
    assert st["flips"].size == 0  # fp32 CPU: programs agree everywhere
    assert st["noise_top1_max"] < 1e-4
    # margins are positive at every position (top1 > top2 by definition)
    assert (st["margins_w1"] > 0).all()
    assert (st["margins_wQ"] > 0).all()
