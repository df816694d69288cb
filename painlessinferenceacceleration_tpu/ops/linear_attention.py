"""Pallas chunkwise linear attention (the reference's seg_la prefill path).

Reference kernel: flood/ops/seg_la.py — segment linear attention with
chunked prefill kernels and a recurrent decode kernel, per-head decay.

TPU re-design: one program per (batch row, head). The decay-masked score
matrix A = (q k^T) ⊙ Λ lives only in VMEM (the jnp formulation materializes
the [B, H, C, C] fp32 tensor in HBM for large prefill chunks), and the
three matmuls (q k^T, A v, q S) plus the rank-C state update k^T v all hit
the MXU back-to-back without HBM round-trips:

    out_i = Σ_{j<=i} λ^(i-j) (q_i·k_j) v_j  +  λ^(i+1) q_i @ S
    S'    = λ^Lb S + Σ_{j<Lb} λ^(Lb-1-j) k_j v_j^T

Falls back to interpret mode off-TPU so tests run hermetically on CPU; the
jnp form in models/linear_attn.py stays the correctness oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _la_kernel(lens_ref, lam_ref, q_ref, k_ref, v_ref, s_ref, o_ref, so_ref):
    b = pl.program_id(0)
    h = pl.program_id(1)
    Lb = lens_ref[b].astype(jnp.float32)
    ll = lam_ref[h]  # log decay of this head (SMEM prefetch)
    q = q_ref[0, 0]  # [C, D] fp32
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    S = s_ref[0, 0]  # [D, D]
    C = q.shape[0]

    # Mosaic iota is integer-only; cast to fp32 for the decay exponents
    i = jax.lax.broadcasted_iota(jnp.int32, (C, C), 0).astype(jnp.float32)
    j = jax.lax.broadcasted_iota(jnp.int32, (C, C), 1).astype(jnp.float32)
    vis = (i >= j) & (j < Lb)
    A = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
    # exp overflows to +inf above the diagonal (i < j); the mask discards it
    A = jnp.where(vis, A * jnp.exp(ll * (i - j)), 0.0)
    out = jnp.dot(A, v, preferred_element_type=jnp.float32)

    ic = jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0).astype(jnp.float32)
    carry = jnp.dot(q, S, preferred_element_type=jnp.float32)
    o_ref[0, 0] = out + carry * jnp.exp(ll * (ic + 1.0))

    w = jnp.where(ic < Lb, jnp.exp(ll * (Lb - 1.0 - ic)), 0.0)  # [C, 1]
    so_ref[0, 0] = S * jnp.exp(ll * Lb) + jnp.dot(
        (k * w).T, v, preferred_element_type=jnp.float32
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def linear_attention_chunk(
    xq: jax.Array,  # [B, H, C, D] fp32 (feature-mapped)
    xk: jax.Array,
    xv: jax.Array,
    state: jax.Array,  # [B, H, D, D] fp32
    chunk_lens: jax.Array,  # [B] int32 valid tokens
    loglam: jax.Array,  # [H] fp32 log per-head decay
    interpret: bool = False,
):
    """Returns (out [B, H, C, D], new_state [B, H, D, D]), both fp32."""
    B, H, C, D = xq.shape

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # chunk_lens [B], loglam [H] (SMEM)
        grid=(B, H),
        in_specs=[
            pl.BlockSpec((1, 1, C, D), lambda b, h, lens, lam: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, C, D), lambda b, h, lens, lam: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, C, D), lambda b, h, lens, lam: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, D, D), lambda b, h, lens, lam: (b, h, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, C, D), lambda b, h, lens, lam: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, D, D), lambda b, h, lens, lam: (b, h, 0, 0)),
        ],
    )
    out, new_state = pl.pallas_call(
        _la_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, H, C, D), jnp.float32),
            jax.ShapeDtypeStruct((B, H, D, D), jnp.float32),
        ],
        interpret=interpret,
    )(
        chunk_lens.astype(jnp.int32),
        loglam.astype(jnp.float32),
        xq.astype(jnp.float32),
        xk.astype(jnp.float32),
        xv.astype(jnp.float32),
        state.astype(jnp.float32),
    )
    return out, new_state


def _la_tree_kernel(lam_ref, q_ref, k_ref, v_ref, s_ref, dm_ref, vis_ref,
                    o_ref):
    """Tree/draft-mode linear attention (reference seg_la_s_kernel,
    flood/ops/seg_la.py:189): token i attends its ancestor path with decay
    λ^(depth_i - depth_j) plus the carried-state term λ^(depth_i+1) q_i S.
    The state is NOT updated (acceptance is unknown until after the
    forward — models/linear_attn.py commits the accepted chain later)."""
    h = pl.program_id(1)
    ll = lam_ref[h]
    q = q_ref[0, 0]  # [C, D] fp32
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    S = s_ref[0, 0]
    dm = dm_ref[0]  # [C, C] fp32: depth_i - depth_j (head-independent)
    vs = vis_ref[0]  # [C, C] fp32 mask

    A = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
    A = jnp.where(vs > 0.5, A * jnp.exp(ll * dm), 0.0)
    out = jnp.dot(A, v, preferred_element_type=jnp.float32)
    # node 0 is the committed root (depth 0), so dm[:, 0] == depth_i
    di = dm[:, 0:1]
    carry = jnp.dot(q, S, preferred_element_type=jnp.float32)
    o_ref[0, 0] = out + carry * jnp.exp(ll * (di + 1.0))


@functools.partial(jax.jit, static_argnames=("interpret",))
def linear_attention_tree(
    xq: jax.Array,  # [B, H, C, D] fp32 (feature-mapped)
    xk: jax.Array,
    xv: jax.Array,
    state: jax.Array,  # [B, H, D, D] fp32 (read-only here)
    depth: jax.Array,  # [B, C] node depths (root = 0)
    vis: jax.Array,  # [B, C, C] ancestor-or-self visibility (cols masked)
    loglam: jax.Array,  # [H]
    interpret: bool = False,
) -> jax.Array:
    """Returns out [B, H, C, D] fp32 (state deliberately unchanged)."""
    B, H, C, D = xq.shape
    d = depth.astype(jnp.float32)
    dm = d[:, :, None] - d[:, None, :]  # [B, C, C], tiny (C = verify width)
    vs = vis.astype(jnp.float32)
    ll = loglam.astype(jnp.float32)
    # the kernel reads depth_i as dm[:, i, 0] (relative to node 0); fold the
    # residual λ^depth_0 into the carried state so the λ^(depth_i+1) q S
    # term is exact even when the window root isn't at depth 0
    state = state.astype(jnp.float32) * jnp.exp(
        ll[None, :, None, None] * d[:, 0][:, None, None, None]
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # loglam [H]
        grid=(B, H),
        in_specs=[
            pl.BlockSpec((1, 1, C, D), lambda b, h, lam: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, C, D), lambda b, h, lam: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, C, D), lambda b, h, lam: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, D, D), lambda b, h, lam: (b, h, 0, 0)),
            pl.BlockSpec((1, C, C), lambda b, h, lam: (b, 0, 0)),
            pl.BlockSpec((1, C, C), lambda b, h, lam: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, C, D), lambda b, h, lam: (b, h, 0, 0)),
    )
    return pl.pallas_call(
        _la_tree_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, C, D), jnp.float32),
        interpret=interpret,
    )(
        loglam.astype(jnp.float32),
        xq.astype(jnp.float32),
        xk.astype(jnp.float32),
        xv.astype(jnp.float32),
        state,
        dm,
        vs,
    )


def use_pallas_linear_attention(C: int, D: int) -> bool:
    """Chain-mode chunks on TPU with Mosaic-tileable shapes; C=1 decode
    stays on the (cheap) jnp path — at C=1 the op is a [H, D] x [D, D]
    matvec reading ~1 MB of state per layer, entirely HBM-bound."""
    return (
        jax.default_backend() not in ("cpu", "gpu")
        and C >= 8
        and C % 8 == 0
        and D % 128 == 0
    )


def use_pallas_linear_tree(C: int, D: int) -> bool:
    """Tree-verify windows (spec decode over hybrids). On by default on
    TPU — validated on v5e (benchmarks/validate_gated_kernels_r3.log:
    bit-exact vs the jnp oracle at B=4/H=16/C=64, 0.033 ms). Kill-switch:
    PIA_LA_TREE_KERNEL=0."""
    import os

    return (
        jax.default_backend() not in ("cpu", "gpu")
        and os.environ.get("PIA_LA_TREE_KERNEL", "1") != "0"
        and C >= 8
        and D % 128 == 0
    )
