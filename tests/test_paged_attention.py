"""Pallas paged attention vs the jnp reference (interpret mode on CPU).

Mode grid mirrors flood/test/test_seg_attn.py:19-177 (prefill/decode/spec x
segment counts): decode (Q=1), tree-verify (block mask), ragged lengths.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from painlessinferenceacceleration_tpu.config import EngineConfig, ModelConfig
from painlessinferenceacceleration_tpu.engine.cache import (
    init_kv_cache,
    write_kv_pages,
)
from painlessinferenceacceleration_tpu.lookahead.device_tables import (
    build_tree_inputs,
)
from painlessinferenceacceleration_tpu.ops.attention import paged_attention_ref
from painlessinferenceacceleration_tpu.ops.paged_attention import paged_attention


def setup_cache(B, ctx_lens, Hkv=2, D=16, ps=16, max_seq=128, seed=0):
    rng = np.random.default_rng(seed)
    n_pages = B * (max_seq // ps) + 1
    k_pages = jnp.zeros((n_pages, ps, Hkv * D), jnp.float32)
    v_pages = jnp.zeros((n_pages, ps, Hkv * D), jnp.float32)
    P = max_seq // ps
    pt = jnp.arange(1, 1 + B * P, dtype=jnp.int32).reshape(B, P)
    # fill ctx tokens per request
    maxc = max(ctx_lens)
    k_new = jnp.asarray(rng.normal(size=(B, maxc, Hkv, D)).astype(np.float32))
    v_new = jnp.asarray(rng.normal(size=(B, maxc, Hkv, D)).astype(np.float32))
    valid = jnp.asarray(
        np.arange(maxc)[None, :] < np.array(ctx_lens)[:, None]
    )
    k_pages, v_pages = write_kv_pages(
        k_pages, v_pages, k_new, v_new, pt, jnp.zeros((B,), jnp.int32), valid
    )
    return k_pages, v_pages, pt


def run_both(B, Q, ctx_lens, qmask, seed=1, Hq=4, Hkv=2, D=16):
    rng = np.random.default_rng(seed)
    k_pages, v_pages, pt = setup_cache(B, ctx_lens, Hkv=Hkv, D=D)
    ctx = jnp.asarray(np.array(ctx_lens, np.int32))
    # write Q in-step tokens too (drafts/current token)
    kq = jnp.asarray(rng.normal(size=(B, Q, Hkv, D)).astype(np.float32))
    vq = jnp.asarray(rng.normal(size=(B, Q, Hkv, D)).astype(np.float32))
    k_pages, v_pages = write_kv_pages(k_pages, v_pages, kq, vq, pt, ctx)
    q = jnp.asarray(rng.normal(size=(B, Q, Hq, D)).astype(np.float32))
    scale = D ** -0.5
    ref = paged_attention_ref(q, k_pages, v_pages, pt, ctx, qmask, scale)
    got = paged_attention(
        q, k_pages, v_pages, pt, ctx, qmask, scale, interpret=True
    )
    return np.asarray(ref), np.asarray(got)


def test_decode_q1():
    B = 3
    qmask = jnp.ones((B, 1, 1), bool)
    ref, got = run_both(B, 1, [5, 17, 32], qmask)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_ragged_lengths_page_boundaries():
    B = 4
    qmask = jnp.ones((B, 1, 1), bool)
    # lengths at/around page size (16) boundaries
    ref, got = run_both(B, 1, [15, 16, 17, 1], qmask)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_causal_chunk():
    B, Q = 2, 8
    i = jnp.arange(Q)
    qmask = jnp.tile((i[:, None] >= i[None, :])[None], (B, 1, 1))
    ref, got = run_both(B, Q, [9, 21], qmask)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_tree_verify_mask():
    B = 2
    branches = jnp.array([[5, 6, 7], [9, 10, -1]], jnp.int32)
    toks, parents, qm, depth = build_tree_inputs(jnp.int32(3), branches)
    Q = int(toks.shape[0])
    qmask = jnp.tile(qm[None], (B, 1, 1))
    ref, got = run_both(B, Q, [11, 30], qmask)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_gqa_groups():
    B = 2
    qmask = jnp.ones((B, 1, 1), bool)
    ref, got = run_both(B, 1, [7, 23], qmask, Hq=8, Hkv=2)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_kv_permute_pages_kernel_matches_jnp():
    """In-kernel tail-window compaction (DMA in -> one-hot permute -> DMA
    back aliased) vs the jnp gather/scatter path of compact_kv_tail."""
    import jax

    from painlessinferenceacceleration_tpu.engine.cache import compact_kv_tail
    from painlessinferenceacceleration_tpu.ops.kv_update import (
        kv_permute_pages_pallas,
    )

    rng = np.random.default_rng(0)
    L, n_pages, ps, HD = 2, 9, 8, 32
    B, P = 2, 4
    Q = 6
    pages = jnp.asarray(
        rng.normal(size=(L, n_pages, ps, HD)).astype(np.float32)
    )
    pt = jnp.arange(1, 1 + B * P, dtype=jnp.int32).reshape(B, P)
    ctx = jnp.array([5, 11], jnp.int32)
    path = jnp.array([[2, 4, 5, -1, -1], [1, 3, -1, -1, -1]], jnp.int32)
    n_edges = jnp.array([3, 2], jnp.int32)
    active = jnp.ones((B,), bool)

    want = compact_kv_tail(pages, pt, ctx, path, n_edges, Q, active)

    # rebuild the kernel inputs the TPU branch would use
    TPP = (Q + ps - 1) // ps + 1
    p0 = ctx // ps
    t = jnp.arange(TPP, dtype=jnp.int32)
    page_pos = jnp.clip(p0[:, None] + t[None, :], 0, P - 1)
    page_ids = jnp.take_along_axis(pt, page_pos, axis=1)
    W = TPP * ps
    win_base = p0 * ps
    slots = win_base[:, None] + jnp.arange(W, dtype=jnp.int32)[None, :]
    src_of = slots
    M = path.shape[1]
    i = jnp.arange(M, dtype=jnp.int32)[None, :]
    dst_slot = ctx[:, None] + 1 + i
    src_slot = ctx[:, None] + path
    mv_valid = i < n_edges[:, None]
    w_idx = jnp.where(mv_valid, dst_slot - win_base[:, None], W)
    bidx = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[:, None], (B, M))
    src_of = src_of.at[bidx, w_idx].set(
        jnp.where(mv_valid, src_slot, 0), mode="drop"
    )
    src_rel = jnp.clip(src_of - win_base[:, None], 0, W - 1)
    got = kv_permute_pages_pallas(pages, page_ids, src_rel, interpret=True)
    # page 0 (null) may differ; compare the real pages
    np.testing.assert_allclose(
        np.asarray(got[:, 1:]), np.asarray(want[:, 1:]), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("Hq,Hkv,D", [(4, 2, 16), (4, 4, 16), (4, 2, 64)])
def test_prefill_kernel_causal_tiled(Hq, Hkv, D):
    """paged_attention_prefill (query-tiled causal kernel) vs the jnp
    reference over a full causal qmask — ragged ctx, tile padding (Q not a
    multiple of qt), GQA and MHA, D=64 exercises HB=2 lane packing."""
    from painlessinferenceacceleration_tpu.ops.paged_attention import (
        paged_attention_prefill,
    )

    B, Q = 2, 40  # qt=16 -> 3 tiles, last padded by 8 rows
    ctx_lens = [7, 20]
    rng = np.random.default_rng(3)
    k_pages, v_pages, pt = setup_cache(B, ctx_lens, Hkv=Hkv, D=D)
    ctx = jnp.asarray(np.array(ctx_lens, np.int32))
    kq = jnp.asarray(rng.normal(size=(B, Q, Hkv, D)).astype(np.float32))
    vq = jnp.asarray(rng.normal(size=(B, Q, Hkv, D)).astype(np.float32))
    k_pages, v_pages = write_kv_pages(k_pages, v_pages, kq, vq, pt, ctx)
    q = jnp.asarray(rng.normal(size=(B, Q, Hq, D)).astype(np.float32))
    scale = D ** -0.5

    causal = jnp.tril(jnp.ones((Q, Q), bool))[None].repeat(B, 0)
    ref = paged_attention_ref(q, k_pages, v_pages, pt, ctx, causal, scale)
    got = paged_attention_prefill(
        q, k_pages, v_pages, pt, ctx, scale, interpret=True, qt=16
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_prefill_kernel_layered_arena():
    """Stacked-[L, ...] arena form with a traced layer index."""
    from painlessinferenceacceleration_tpu.ops.paged_attention import (
        paged_attention_prefill,
    )

    B, Q, Hq, Hkv, D = 1, 24, 4, 2, 16
    ctx_lens = [10]
    rng = np.random.default_rng(5)
    k_pages, v_pages, pt = setup_cache(B, ctx_lens, Hkv=Hkv, D=D)
    ctx = jnp.asarray(np.array(ctx_lens, np.int32))
    kq = jnp.asarray(rng.normal(size=(B, Q, Hkv, D)).astype(np.float32))
    vq = jnp.asarray(rng.normal(size=(B, Q, Hkv, D)).astype(np.float32))
    k_pages, v_pages = write_kv_pages(k_pages, v_pages, kq, vq, pt, ctx)
    q = jnp.asarray(rng.normal(size=(B, Q, Hq, D)).astype(np.float32))
    scale = D ** -0.5
    causal = jnp.tril(jnp.ones((Q, Q), bool))[None].repeat(B, 0)
    ref = paged_attention_ref(q, k_pages, v_pages, pt, ctx, causal, scale)

    kL = jnp.stack([jnp.zeros_like(k_pages), k_pages])  # layer 1 is real
    vL = jnp.stack([jnp.zeros_like(v_pages), v_pages])
    got = paged_attention_prefill(
        q, kL, vL, pt, ctx, scale, interpret=True, layer=jnp.int32(1), qt=16
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_engine_prefill_kernel_forced_token_identical():
    """Chunked prefill routed through paged_attention_prefill (interpret,
    gate monkeypatched) must reproduce the XLA-path stream exactly —
    incl. ragged chunks, multi-chunk prompts, and decode continuing from
    the kernel-prefilled KV."""
    from unittest import mock

    from painlessinferenceacceleration_tpu.engine.llm import LLM
    from painlessinferenceacceleration_tpu.engine.request import (
        SamplingParams,
    )
    from painlessinferenceacceleration_tpu.models import base as mbase
    from painlessinferenceacceleration_tpu.models.base import init_params
    from painlessinferenceacceleration_tpu.ops import paged_attention as pa

    cfg = ModelConfig.tiny()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    ecfg = EngineConfig(page_size=16, max_seq_len=256, max_concurrency=2,
                        prefill_chunk=32, eos_token_id=-2)
    rng = np.random.default_rng(11)
    prompts = [[int(t) for t in rng.integers(5, 500, 50)],
               [int(t) for t in rng.integers(5, 500, 9)]]
    sp = SamplingParams(max_new_tokens=12)

    real = pa.paged_attention_prefill
    calls = []

    def interp(q, k, v, pt, ctx, scale, layer=None):
        calls.append(tuple(q.shape))
        return real(q, k, v, pt, ctx, scale, interpret=True, layer=layer,
                    qt=16)

    # patched engine FIRST: building the unpatched one first would leave a
    # compiled prefill_step in the jit cache (same static shapes) and the
    # patched run would silently reuse it, never tracing the kernel
    jax.clear_caches()
    with mock.patch.object(mbase, "use_pallas_prefill", lambda Q: Q >= 16), \
         mock.patch.object(pa, "paged_attention_prefill", interp):
        llm = LLM(cfg=cfg, params=params, ecfg=ecfg, dtype=jnp.float32)
        out = llm.generate(prompts, sp)
    assert calls, "prefill kernel never engaged"

    jax.clear_caches()
    ref = LLM(cfg=cfg, params=params, ecfg=ecfg, dtype=jnp.float32).generate(
        prompts, sp)
    assert [r.output_ids for r in out] == [r.output_ids for r in ref]


def test_fp8_kv_arena_pallas_decode_and_verify():
    """Decode + tree-verify kernels directly over an e4m3 KV arena
    (SWAR dequant in VMEM, reference quant_to_fp8_and_update_cache
    csrc/quantize/fp8_quant.cu): per-head static scales fold into q (K)
    and the output (V); exact up to e4m3 quantization + bf16 compute."""
    B, Hq, Hkv, D, ps = 2, 4, 2, 16, 16
    HD = Hkv * D
    max_seq = 128
    P = max_seq // ps
    rng = np.random.default_rng(9)
    k_pages = jnp.zeros((1 + B * P, ps, HD), jnp.float8_e4m3fn)
    v_pages = jnp.zeros((1 + B * P, ps, HD), jnp.float8_e4m3fn)
    pt = jnp.arange(1, 1 + B * P, dtype=jnp.int32).reshape(B, P)
    ks = jnp.asarray([0.11, 0.23], jnp.float32)
    vs = jnp.asarray([0.05, 0.4], jnp.float32)

    ctx_lens = [21, 7]
    maxc = max(ctx_lens)
    k_ctx = jnp.asarray(rng.normal(size=(B, maxc, Hkv, D)).astype(np.float32))
    v_ctx = jnp.asarray(rng.normal(size=(B, maxc, Hkv, D)).astype(np.float32))
    valid = jnp.asarray(np.arange(maxc)[None] < np.array(ctx_lens)[:, None])
    k_pages, v_pages = write_kv_pages(
        k_pages, v_pages, k_ctx, v_ctx, pt, jnp.zeros((B,), jnp.int32),
        valid, k_scale=ks, v_scale=vs,
    )
    ctx = jnp.asarray(np.array(ctx_lens, np.int32))

    # ---- decode (Q=1) ----
    Q = 1
    kq = jnp.asarray(rng.normal(size=(B, Q, Hkv, D)).astype(np.float32))
    vq = jnp.asarray(rng.normal(size=(B, Q, Hkv, D)).astype(np.float32))
    k_pages, v_pages = write_kv_pages(k_pages, v_pages, kq, vq, pt, ctx,
                                      k_scale=ks, v_scale=vs)
    q = jnp.asarray(rng.normal(size=(B, Q, Hq, D)).astype(np.float32))
    scale = D ** -0.5
    qm = jnp.ones((B, 1, 1), bool)
    ref = paged_attention_ref(q, k_pages, v_pages, pt, ctx, qm, scale,
                              ks, vs)
    got = paged_attention(q, k_pages, v_pages, pt, ctx, qm, scale,
                          interpret=True, kv_scales=(ks, vs))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-2, atol=3e-2)

    # ---- tree verify (Q=8) over fp8 pages ----
    ctx = ctx + 1
    Q = 8
    kq = jnp.asarray(rng.normal(size=(B, Q, Hkv, D)).astype(np.float32))
    vq = jnp.asarray(rng.normal(size=(B, Q, Hkv, D)).astype(np.float32))
    k_pages, v_pages = write_kv_pages(k_pages, v_pages, kq, vq, pt, ctx,
                                      k_scale=ks, v_scale=vs)
    q = jnp.asarray(rng.normal(size=(B, Q, Hq, D)).astype(np.float32))
    parents = np.array([[-1, 0, 1, 1, 0, 4, 5, 5]] * B, np.int32)
    qmask = np.zeros((B, Q, Q), bool)
    for b in range(B):
        for i in range(Q):
            j = i
            while j >= 0:
                qmask[b, i, j] = True
                j = parents[b, j]
    qmask = jnp.asarray(qmask)
    ref = paged_attention_ref(q, k_pages, v_pages, pt, ctx, qmask, scale,
                              ks, vs)
    got = paged_attention(q, k_pages, v_pages, pt, ctx, qmask, scale,
                          interpret=True, kv_scales=(ks, vs))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-2, atol=3e-2)


def test_engine_fp8_kv_kernel_forced_lossless():
    """Engine with kv_quant='fp8' routed through the fp8 attention kernels
    (forced, interpret): lookahead must reproduce the AR stream of the
    SAME kernel path exactly (spec losslessness is implementation-internal;
    vs the jnp fp8 path only numerics-level agreement holds — the kernel
    computes in bf16, the fallback dequantizes in fp32, and random-weight
    argmax ties can flip, as with the documented bf16/fp32 tie-flips)."""
    import dataclasses
    from unittest import mock

    from painlessinferenceacceleration_tpu.engine.llm import LLM
    from painlessinferenceacceleration_tpu.engine.request import (
        SamplingParams,
    )
    from painlessinferenceacceleration_tpu.models import base as mbase
    from painlessinferenceacceleration_tpu.models.base import init_params
    from painlessinferenceacceleration_tpu.ops import paged_attention as pa

    cfg = ModelConfig.tiny()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    base = EngineConfig(page_size=16, max_seq_len=256, max_concurrency=2,
                        kv_quant="fp8", eos_token_id=-2)
    spec = dataclasses.replace(base, use_lookahead=True, decoding_length=10,
                               branch_length=4, use_spec_min_batch_size=2)
    prompts = [[11, 22, 33, 44] * 4, [9] * 10]
    sp = SamplingParams(max_new_tokens=16)

    real = pa.paged_attention
    calls = []

    def interp(q, k, v, pt, ctx, qm, scale, layer=None, kv_scales=None):
        calls.append((tuple(q.shape), kv_scales is not None))
        return real(q, k, v, pt, ctx, qm, scale, interpret=True,
                    layer=layer, kv_scales=kv_scales)

    def patches():
        return (
            mock.patch.object(mbase, "use_pallas_attention",
                              lambda Q=1: Q <= 16),
            mock.patch.object(mbase, "use_pallas_fp8_kv", lambda: True),
            mock.patch.object(pa, "paged_attention", interp),
        )

    jax.clear_caches()
    p1, p2, p3 = patches()
    with p1, p2, p3:
        ar = LLM(cfg=cfg, params=params, ecfg=base,
                 dtype=jnp.float32).generate(prompts, sp)
    assert calls and all(scaled for _, scaled in calls), calls

    jax.clear_caches()
    p1, p2, p3 = patches()
    with p1, p2, p3:
        llm = LLM(cfg=cfg, params=params, ecfg=spec, dtype=jnp.float32)
        la = llm.generate(prompts, sp)
    assert llm.metrics.spec_steps > 0
    assert [r.output_ids for r in la] == [r.output_ids for r in ar]
