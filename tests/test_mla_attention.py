"""Pallas MLA (latent MQA) attention vs the jnp reference (interpret mode).

Covers the fusion-cache attention modes of flood/ops/seg_mla.py:28-285:
decode (Q=1), tree-verify (block mask), ragged lengths, row tiling at large
H*Q. V pages equal the latent slice of K pages (mla.py writes
v_lat = k_lat[..., :r]) so the kernel reads only K.
"""

import numpy as np

import jax.numpy as jnp

from painlessinferenceacceleration_tpu.engine.cache import write_kv_pages
from painlessinferenceacceleration_tpu.lookahead.device_tables import (
    build_tree_inputs,
)
from painlessinferenceacceleration_tpu.ops.attention import paged_attention_ref
from painlessinferenceacceleration_tpu.ops.mla_attention import (
    mla_paged_attention,
)


def run_both(B, Q, ctx_lens, qmask, H=4, r=32, rope_d=16, ps=16, seed=0,
             max_seq=128):
    """Build a 1-"head" [latent|k_pe] arena, compare kernel vs oracle."""
    rng = np.random.default_rng(seed)
    Dk = r + rope_d
    P = max_seq // ps
    n_pages = B * P + 1
    k_pages = jnp.zeros((n_pages, ps, Dk), jnp.float32)
    v_pages = jnp.zeros((n_pages, ps, r), jnp.float32)
    pt = jnp.arange(1, 1 + B * P, dtype=jnp.int32).reshape(B, P)
    maxc = max(ctx_lens)
    k_ctx = jnp.asarray(rng.normal(size=(B, maxc, 1, Dk)).astype(np.float32))
    valid = jnp.asarray(np.arange(maxc)[None, :] < np.array(ctx_lens)[:, None])
    k_pages, v_pages = write_kv_pages(
        k_pages, v_pages, k_ctx, k_ctx[..., :r], pt,
        jnp.zeros((B,), jnp.int32), valid,
    )
    ctx = jnp.asarray(np.array(ctx_lens, np.int32))
    k_q = jnp.asarray(rng.normal(size=(B, Q, 1, Dk)).astype(np.float32))
    k_pages, v_pages = write_kv_pages(
        k_pages, v_pages, k_q, k_q[..., :r], pt, ctx
    )
    q = jnp.asarray(rng.normal(size=(B, Q, H, Dk)).astype(np.float32))
    scale = Dk ** -0.5
    ref = paged_attention_ref(
        q, k_pages, v_pages, pt, ctx, qmask, scale, v_dim=r
    )
    got = mla_paged_attention(
        q, k_pages, pt, ctx, qmask, scale, v_dim=r, interpret=True
    )
    return np.asarray(ref), np.asarray(got)


def test_mla_decode_q1():
    B = 3
    qmask = jnp.ones((B, 1, 1), bool)
    ref, got = run_both(B, 1, [5, 17, 32], qmask)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_mla_ragged_page_boundaries():
    B = 4
    qmask = jnp.ones((B, 1, 1), bool)
    ref, got = run_both(B, 1, [15, 16, 17, 1], qmask)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_mla_tree_verify_mask():
    B = 2
    branches = jnp.array([[5, 6, 7], [9, 10, -1]], jnp.int32)
    toks, parents, qm, depth = build_tree_inputs(jnp.int32(3), branches)
    Q = int(toks.shape[0])
    qmask = jnp.tile(qm[None], (B, 1, 1))
    ref, got = run_both(B, Q, [11, 30], qmask)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_mla_row_tiling_many_heads():
    # Q*H > RT(256) exercises the row-tile grid dimension
    B = 2
    Q = 8
    i = jnp.arange(Q)
    qmask = jnp.tile((i[:, None] >= i[None, :])[None], (B, 1, 1))
    ref, got = run_both(B, Q, [9, 21], qmask, H=64)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_mla_wide_causal_prefill_window():
    """Prefill-width windows (Q > the dense kernel's 128 cap) through the
    row-tiled MLA kernel with a causal qmask — the wide-window gate
    (models/base.py use_pallas_prefill) relies on this shape class."""
    B, Q = 2, 160  # H=4 -> 640 rows, several 256-row tiles
    causal = jnp.tril(jnp.ones((Q, Q), bool))[None].repeat(B, 0)
    ref, got = run_both(B, Q, [7, 31], causal, max_seq=256)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)
