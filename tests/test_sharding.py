"""Multi-device sharding on the 8-device virtual CPU mesh.

The reference has no automated distributed test at all (SURVEY.md §4 —
only a manual 2-node example). Here: full prefill+verify steps over a
(data, model) mesh, outputs must match the single-device run exactly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from painlessinferenceacceleration_tpu.config import EngineConfig, ModelConfig
from painlessinferenceacceleration_tpu.engine.cache import init_kv_cache
from painlessinferenceacceleration_tpu.engine.step import (
    decode_inputs,
    prefill_step,
    verify_step,
)
from painlessinferenceacceleration_tpu.models.base import init_params
from painlessinferenceacceleration_tpu.parallel import (
    make_mesh,
    shard_kv,
    shard_params,
)


@pytest.fixture(scope="module")
def setup():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = ModelConfig.tiny(num_key_value_heads=4, num_attention_heads=8)
    ecfg = EngineConfig(page_size=16, max_seq_len=128, max_concurrency=8)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    return cfg, ecfg, params


def _run(cfg, ecfg, params, kv, B):
    P = ecfg.pages_per_req
    pt = jnp.arange(1, 1 + B * P, dtype=jnp.int32).reshape(B, P)
    toks = jnp.tile(jnp.arange(5, 5 + 6, dtype=jnp.int32)[None], (B, 1))
    kv, nxt, logits = prefill_step(
        params, kv, cfg, toks, jnp.zeros((B,), jnp.int32),
        jnp.full((B,), 6, jnp.int32), pt,
    )
    ctx = jnp.full((B,), 6, jnp.int32)
    t, p, qm, par = decode_inputs(nxt, ctx)
    kv, ot, na = verify_step(
        params, kv, cfg, t, p, qm, par, pt, ctx, jnp.ones((B,), bool)
    )
    return np.asarray(nxt), np.asarray(ot[:, 0]), np.asarray(logits)


def test_tp_dp_matches_single_device(setup):
    cfg, ecfg, params = setup
    B = 4
    kv = init_kv_cache(cfg, ecfg, dtype=jnp.float32)
    ref_nxt, ref_dec, ref_logits = _run(cfg, ecfg, params, kv, B)

    mesh = make_mesh((2, 4))
    sp = shard_params(params, cfg, mesh)
    skv = shard_kv(init_kv_cache(cfg, ecfg, dtype=jnp.float32), cfg, mesh)
    got_nxt, got_dec, got_logits = _run(cfg, ecfg, sp, skv, B)

    np.testing.assert_array_equal(ref_nxt, got_nxt)
    np.testing.assert_array_equal(ref_dec, got_dec)
    np.testing.assert_allclose(ref_logits, got_logits, rtol=1e-4, atol=1e-4)


def test_pure_tp_mesh(setup):
    cfg, ecfg, params = setup
    B = 2
    kv = init_kv_cache(cfg, ecfg, dtype=jnp.float32)
    ref_nxt, ref_dec, _ = _run(cfg, ecfg, params, kv, B)
    mesh = make_mesh((1, 8))
    sp = shard_params(params, cfg, mesh)
    skv = shard_kv(init_kv_cache(cfg, ecfg, dtype=jnp.float32), cfg, mesh)
    got_nxt, got_dec, _ = _run(cfg, ecfg, sp, skv, B)
    np.testing.assert_array_equal(ref_nxt, got_nxt)
    np.testing.assert_array_equal(ref_dec, got_dec)
