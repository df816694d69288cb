"""On-hardware validation for the opt-in (env-gated) kernels.

Three kernels were written while the TPU relay was unavailable and are
gated OFF on TPU until this script passes on a real chip:
  - ops/paged_attention.py  paged_attention_prefill  (PIA_PREFILL_KERNEL=1)
  - ops/mla_attention.py    wide (Q>128) windows     (same flag)
  - ops/linear_attention.py linear_attention_tree    (PIA_LA_TREE_KERNEL=1)

For each: compile + run on the TPU at realistic geometry, compare against
the jnp oracle (bf16 tolerances), and report device ms vs the XLA path.
Run me as the ONLY TPU process (CLAUDE.md relay discipline). If all
sections print OK, flip the gates' defaults on and delete this note.

Usage: python benchmarks/validate_gated_kernels.py [prefill|mla|tree|all]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

from benchmarks.bench_kernels import device_ms


def _rel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.abs(a - b).max() / max(np.abs(b).max(), 1e-9)


def validate_prefill():
    """7B-like GQA geometry: Hq=32, Hkv=8, D=128, Q=512 chunk, ctx=1536."""
    import jax
    import jax.numpy as jnp

    from painlessinferenceacceleration_tpu.ops.attention import (
        paged_attention_ref,
    )
    from painlessinferenceacceleration_tpu.ops.paged_attention import (
        paged_attention_prefill,
    )

    B, Q, Hq, Hkv, D, ps = 1, 512, 32, 8, 128, 64
    ctx = 1536
    msl = ctx + Q
    P = msl // ps
    rng = np.random.default_rng(0)
    k_pages = jnp.asarray(
        rng.normal(size=(1 + B * P, ps, Hkv * D)).astype(np.float32),
        jnp.bfloat16,
    )
    v_pages = jnp.asarray(
        rng.normal(size=(1 + B * P, ps, Hkv * D)).astype(np.float32),
        jnp.bfloat16,
    )
    pt = jnp.arange(1, 1 + B * P, dtype=jnp.int32).reshape(B, P)
    ctxl = jnp.full((B,), ctx, jnp.int32)
    q = jnp.asarray(
        rng.normal(size=(B, Q, Hq, D)).astype(np.float32), jnp.bfloat16
    )
    scale = D ** -0.5
    causal = jnp.tril(jnp.ones((Q, Q), bool))[None].repeat(B, 0)

    got = paged_attention_prefill(q, k_pages, v_pages, pt, ctxl, scale)
    np.asarray(got[0, 0, 0, :1])  # sync via data fetch (relay discipline)
    ref = paged_attention_ref(q, k_pages, v_pages, pt, ctxl, causal, scale)
    r = _rel(got.astype(np.float32), ref.astype(np.float32))
    print(f"prefill kernel rel-err: {r:.4g}")
    assert r < 0.03, r  # bf16 flash vs materialized softmax

    t_k = device_ms(
        lambda: paged_attention_prefill(q, k_pages, v_pages, pt, ctxl, scale),
        tag="pfk",
    )
    t_x = device_ms(
        lambda: paged_attention_ref(q, k_pages, v_pages, pt, ctxl, causal,
                                    scale),
        tag="pfx",
    )
    print(f"prefill attention Q={Q} ctx={ctx}: kernel {t_k:.3f} ms vs "
          f"XLA {t_x:.3f} ms ({t_x / max(t_k, 1e-9):.2f}x)  OK")


def validate_mla_wide():
    """DeepSeek-V3-like latent geometry at a 512-token window."""
    import jax
    import jax.numpy as jnp

    from painlessinferenceacceleration_tpu.ops.attention import (
        paged_attention_ref,
    )
    from painlessinferenceacceleration_tpu.ops.mla_attention import (
        mla_paged_attention,
    )

    B, Q, H = 1, 512, 16
    r_lat, rope_d = 512, 64
    Dk = 640  # padded [latent | k_pe] row (mla_head_dims)
    ps, ctx = 64, 1024
    P = (ctx + Q) // ps
    rng = np.random.default_rng(1)
    k_pages = jnp.asarray(
        rng.normal(size=(1 + B * P, ps, Dk)).astype(np.float32), jnp.bfloat16
    )
    pt = jnp.arange(1, 1 + B * P, dtype=jnp.int32).reshape(B, P)
    ctxl = jnp.full((B,), ctx, jnp.int32)
    q = jnp.asarray(
        rng.normal(size=(B, Q, H, Dk)).astype(np.float32), jnp.bfloat16
    )
    scale = (r_lat + rope_d) ** -0.5
    causal = jnp.tril(jnp.ones((Q, Q), bool))[None].repeat(B, 0)

    got = mla_paged_attention(q, k_pages, pt, ctxl, causal, scale,
                              v_dim=r_lat)
    np.asarray(got[0, 0, 0, :1])
    v_pages = k_pages[..., :r_lat]
    ref = paged_attention_ref(q, k_pages, v_pages, pt, ctxl, causal, scale,
                              v_dim=r_lat)
    r = _rel(got.astype(np.float32), ref.astype(np.float32))
    print(f"mla wide-window rel-err: {r:.4g}")
    assert r < 0.03, r
    t = device_ms(
        lambda: mla_paged_attention(q, k_pages, pt, ctxl, causal, scale,
                                    v_dim=r_lat),
        tag="mlaw",
    )
    print(f"mla wide window Q={Q} ctx={ctx}: {t:.3f} ms  OK")


def validate_tree():
    """Hybrid verify-window geometry: H=16 heads, D=128, C=64 draft nodes."""
    import jax
    import jax.numpy as jnp

    from painlessinferenceacceleration_tpu.models.linear_attn import (
        default_decays,
    )
    from painlessinferenceacceleration_tpu.ops.linear_attention import (
        linear_attention_tree,
    )

    B, H, C, D = 4, 16, 64, 128
    rng = np.random.default_rng(2)
    xq = jnp.asarray(rng.normal(size=(B, H, C, D)).astype(np.float32))
    xk = jnp.asarray(rng.normal(size=(B, H, C, D)).astype(np.float32))
    xv = jnp.asarray(rng.normal(size=(B, H, C, D)).astype(np.float32))
    s0 = jnp.asarray(rng.normal(size=(B, H, D, D)).astype(np.float32))
    loglam = jnp.log(jnp.clip(default_decays(H), 1e-4, 1 - 1e-6))
    parents = np.zeros((B, C), np.int32)
    for b in range(B):
        for i in range(1, C):
            parents[b, i] = rng.integers(0, i)
    depth = np.zeros((B, C), np.float32)
    vis = np.zeros((B, C, C), bool)
    for b in range(B):
        vis[b, 0, 0] = True
        for i in range(1, C):
            depth[b, i] = depth[b, parents[b, i]] + 1
            vis[b, i] = vis[b, parents[b, i]]
            vis[b, i, i] = True
    depth_j, vis_j = jnp.asarray(depth), jnp.asarray(vis)

    got = linear_attention_tree(xq, xk, xv, s0, depth_j, vis_j, loglam)
    np.asarray(got[0, 0, 0, :1])
    # jnp oracle (models/linear_attn.py tree branch)
    qk = jnp.einsum("bhid,bhjd->bhij", xq, xk)
    dmat = jnp.exp(loglam[None, :, None, None]
                   * (depth_j[:, None, :, None] - depth_j[:, None, None, :]))
    A = qk * jnp.where(vis_j[:, None], dmat, 0.0)
    ref = jnp.einsum("bhij,bhjd->bhid", A, xv)
    powi = jnp.exp(loglam[None, :, None] * (depth_j[:, None, :] + 1.0))
    ref = ref + jnp.einsum("bhid,bhde->bhie", xq, s0) * powi[..., None]
    r = _rel(got, ref)
    print(f"tree linear-attention rel-err: {r:.4g}")
    assert r < 2e-3, r  # fp32 kernel
    t = device_ms(
        lambda: linear_attention_tree(xq, xk, xv, s0, depth_j, vis_j, loglam),
        tag="latree",
    )
    print(f"tree linear attention B={B} H={H} C={C}: {t:.3f} ms  OK")


def validate_fp8_kv():
    """fp8 KV arena decode at 7B GQA geometry vs bf16 arena + jnp dequant.

    PIA_FP8_KV_ATTN=1 gates this path (SWAR dequant in VMEM — the naive
    Mosaic fp8->bf16 convert is catastrophically slow on v5e, and the XLA
    fallback dequantizes the whole context in HBM)."""
    import jax
    import jax.numpy as jnp

    from painlessinferenceacceleration_tpu.ops.attention import (
        paged_attention_ref,
    )
    from painlessinferenceacceleration_tpu.ops.paged_attention import (
        paged_attention,
    )

    B, Hq, Hkv, D, ps = 8, 32, 8, 128, 64
    HD = Hkv * D
    ctx = 2048
    P = (ctx + ps) // ps
    rng = np.random.default_rng(3)
    kf = rng.normal(size=(1 + B * P, ps, HD)).astype(np.float32)
    vf = rng.normal(size=(1 + B * P, ps, HD)).astype(np.float32)
    ks = jnp.full((Hkv,), 0.05, jnp.float32)
    vs = jnp.full((Hkv,), 0.07, jnp.float32)
    k_pages = jnp.asarray(kf / 0.05, jnp.float8_e4m3fn)
    v_pages = jnp.asarray(vf / 0.07, jnp.float8_e4m3fn)
    pt = jnp.arange(1, 1 + B * P, dtype=jnp.int32).reshape(B, P)
    ctxl = jnp.full((B,), ctx, jnp.int32)
    q = jnp.asarray(rng.normal(size=(B, 1, Hq, D)), jnp.bfloat16)
    scale = D ** -0.5
    qm = jnp.ones((B, 1, 1), bool)

    got = paged_attention(q, k_pages, v_pages, pt, ctxl, qm, scale,
                          kv_scales=(ks, vs))
    np.asarray(got[0, 0, 0, :1])
    ref = paged_attention_ref(q, k_pages, v_pages, pt, ctxl, qm, scale,
                              ks, vs)
    r = _rel(np.asarray(got, np.float32), np.asarray(ref, np.float32))
    print(f"fp8-kv decode rel-err: {r:.4g}")
    assert r < 0.05, r
    t8 = device_ms(
        lambda: paged_attention(q, k_pages, v_pages, pt, ctxl, qm, scale,
                                kv_scales=(ks, vs)),
        tag="fp8kv",
    )
    kb = jnp.asarray(kf, jnp.bfloat16)
    vb = jnp.asarray(vf, jnp.bfloat16)
    t16 = device_ms(
        lambda: paged_attention(q, kb, vb, pt, ctxl, qm, scale),
        tag="bf16kv",
    )
    print(f"decode attention B={B} ctx={ctx}: fp8 {t8:.3f} ms vs "
          f"bf16 {t16:.3f} ms ({t16 / max(t8, 1e-9):.2f}x)  OK")


if __name__ == "__main__":
    which = sys_arg = (_sys.argv[1] if len(_sys.argv) > 1 else "all")
    if which in ("prefill", "all"):
        validate_prefill()
    if which in ("mla", "all"):
        validate_mla_wide()
    if which in ("tree", "all"):
        validate_tree()
    if which in ("fp8kv", "all"):
        validate_fp8_kv()
    print("ALL GATED KERNELS VALIDATED" if which == "all" else "done")
