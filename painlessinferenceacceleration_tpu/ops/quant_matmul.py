"""Fused weight-dequant + matmul for INT8/INT4 weight-only serving GEMMs.

Reference: flood/ops/gemm.py (Triton int8/fp8 GEMMs) and the dequant GEMMs
implied by lookahead/models/*/quantizer.py. Decode GEMMs are
HBM-bandwidth-bound: reading int4/int8 weights instead of bf16 is the win,
so the kernel must dequantize *inside* the matmul tile loop — never
materialize the bf16 weight in HBM.

Two paths:
- jnp reference: dequantize + matmul. XLA on TPU fuses the dequant into the
  GEMM operand read; used as the correctness oracle and the CPU path.
- Pallas kernel (``quant_matmul_pallas``): K-tiled loop, unpack+scale in
  VMEM, MXU matmul with fp32 accumulation. Handles the int4 nibble-packed
  layout produced by layers/linear.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from painlessinferenceacceleration_tpu.layers.linear import (
    QuantSpec,
    dequantize,
    unpack_int4,
)

# The Pallas path wins on TPU (int8 measured 1.72x over the XLA bf16 GEMM at
# M=8, 644 GB/s effective); the jnp path remains the oracle and the CPU path.
USE_PALLAS = None  # tri-state: None = auto by backend


def _on_tpu() -> bool:
    import jax as _jax

    return _jax.default_backend() not in ("cpu", "gpu")


def quant_matmul(
    x: jax.Array, p: dict, spec: QuantSpec, use_pallas: bool | None = None
) -> jax.Array:
    """x [..., K] @ dequant(p) [K, N] -> [..., N] in x.dtype."""
    if use_pallas is None:
        use_pallas = USE_PALLAS
    if use_pallas is None:
        K = x.shape[-1]
        N = p["q"].shape[-1]
        use_pallas = _on_tpu() and K >= 256 and N >= 256 and x.ndim >= 2
    if use_pallas:
        lead = x.shape[:-1]
        x2 = x.reshape(-1, x.shape[-1])
        out = quant_matmul_pallas(x2, p["q"], p["s"], spec.bits)
        return out.reshape(*lead, -1).astype(x.dtype)
    w = dequantize(p, spec, x.dtype)
    return jnp.matmul(x, w, preferred_element_type=jnp.float32).astype(x.dtype)


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------


def _qmm_kernel(x_ref, q_ref, s_ref, o_ref, acc_ref, *, bits, k_tile, group):
    """int8 kernel, grid (M/m, N/n, K/k): accumulate x @ (q * scale)."""
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    ngt = k_tile // group
    s = s_ref[pl.ds(ki * ngt, ngt), :]  # this K-tile's group scales
    x = x_ref[:].astype(jnp.bfloat16)
    qf = q_ref[:].astype(jnp.bfloat16)
    sf = jnp.repeat(s, group, axis=0).astype(jnp.bfloat16)
    acc_ref[:] += jnp.dot(x, qf * sf, preferred_element_type=jnp.float32)

    @pl.when(ki == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _qmm4_kernel_bias(x_ref, q_ref, s_ref, o_ref, *, group, n_groups):
    """int4 kernel with per-group bias correction inside the loop."""
    half = group // 2

    def body(g, acc):
        qg = q_ref[pl.ds(g * half, half), :]
        p32 = pltpu.bitcast(qg, jnp.uint32)
        lo = pltpu.bitcast(p32 & jnp.uint32(0x0F0F0F0F), jnp.int8).astype(
            jnp.bfloat16
        )
        hi = pltpu.bitcast((p32 >> 4) & jnp.uint32(0x0F0F0F0F), jnp.int8).astype(
            jnp.bfloat16
        )
        nib = jnp.concatenate([lo, hi], axis=0)  # [group, n]
        xg = x_ref[:, pl.ds(g * group, group)].astype(jnp.bfloat16)
        partial = jnp.dot(xg, nib, preferred_element_type=jnp.float32)
        xsum_g = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
        s_row = s_ref[pl.ds(g, 1), :]
        return acc + (partial - 8.0 * xsum_g) * s_row

    acc = jax.lax.fori_loop(
        0, n_groups, body, jnp.zeros(o_ref.shape, jnp.float32)
    )
    o_ref[:] = acc.astype(o_ref.dtype)


def _qmm4_stacked_kernel(layer_ref, x_ref, q_ref, s_ref, o_ref, *, group,
                         n_groups):
    """int4 kernel over STACKED weights [L, K/2, N]: the layer is selected by
    the BlockSpec index map (scalar prefetch), so no per-layer weight slice
    is ever materialized to feed the kernel (XLA copies pallas operands that
    are dynamic slices — measured at a full extra weights re-read per step).
    """
    half = group // 2

    def body(g, acc):
        qg = q_ref[0, pl.ds(g * half, half), :]
        p32 = pltpu.bitcast(qg, jnp.uint32)
        lo = pltpu.bitcast(p32 & jnp.uint32(0x0F0F0F0F), jnp.int8).astype(
            jnp.bfloat16
        )
        hi = pltpu.bitcast((p32 >> 4) & jnp.uint32(0x0F0F0F0F), jnp.int8).astype(
            jnp.bfloat16
        )
        nib = jnp.concatenate([lo, hi], axis=0)
        xg = x_ref[:, pl.ds(g * group, group)].astype(jnp.bfloat16)
        partial = jnp.dot(xg, nib, preferred_element_type=jnp.float32)
        xsum_g = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
        s_row = s_ref[0, pl.ds(g, 1), :]
        return acc + (partial - 8.0 * xsum_g) * s_row

    acc = jax.lax.fori_loop(
        0, n_groups, body, jnp.zeros(o_ref.shape, jnp.float32)
    )
    o_ref[:] = acc.astype(o_ref.dtype)


def _qmm8_stacked_kernel(layer_ref, x_ref, q_ref, s_ref, o_ref, acc_ref, *,
                         k_tile, group):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    ngt = k_tile // group
    s = s_ref[0, pl.ds(ki * ngt, ngt), :]
    x = x_ref[:].astype(jnp.bfloat16)
    qf = q_ref[0].astype(jnp.bfloat16)
    sf = jnp.repeat(s, group, axis=0).astype(jnp.bfloat16)
    acc_ref[:] += jnp.dot(x, qf * sf, preferred_element_type=jnp.float32)

    @pl.when(ki == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bits",))
def quant_matmul_pallas_stacked(
    x: jax.Array,  # [M, K]
    q: jax.Array,  # [L, Kq, N] stacked quant weights
    s: jax.Array,  # [L, K // group, N] stacked scales
    bits: int,
    layer: jax.Array,  # scalar int32
) -> jax.Array:
    M, K = x.shape
    L, Kq, N = q.shape
    groups = s.shape[1]
    group = K // groups
    m_tile = 128 if M >= 128 else max(8, 1 << max(M - 1, 0).bit_length())
    m_tile = min(m_tile, M) if M >= 8 else 8
    layer_arr = jnp.asarray(layer, jnp.int32).reshape(1)

    if bits == 4:
        n_tile = min(1024, N)
        grid = (pl.cdiv(M, m_tile), pl.cdiv(N, n_tile))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (m_tile, K), lambda i, j, l: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, Kq, n_tile), lambda i, j, l: (l[0], 0, j),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, groups, n_tile), lambda i, j, l: (l[0], 0, j),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (m_tile, n_tile), lambda i, j, l: (i, j),
                memory_space=pltpu.VMEM,
            ),
        )
        return pl.pallas_call(
            functools.partial(
                _qmm4_stacked_kernel, group=group, n_groups=groups
            ),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
            grid_spec=grid_spec,
        )(layer_arr, x, q, s)

    n_tile = min(512, N)
    k_tile = max(group, (min(2048, K) // group) * group)
    grid = (pl.cdiv(M, m_tile), pl.cdiv(N, n_tile), pl.cdiv(K, k_tile))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (m_tile, k_tile), lambda i, j, k, l: (i, k),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, k_tile, n_tile), lambda i, j, k, l: (l[0], k, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, groups, n_tile), lambda i, j, k, l: (l[0], 0, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (m_tile, n_tile), lambda i, j, k, l: (i, j),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((m_tile, n_tile), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_qmm8_stacked_kernel, k_tile=k_tile, group=group),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        grid_spec=grid_spec,
    )(layer_arr, x, q, s)


def quant_matmul_stacked(
    x: jax.Array, p: dict, spec: QuantSpec, layer
) -> jax.Array:
    """x [..., K] @ dequant(p[layer]); p leaves stacked [L, ...]."""
    lead = x.shape[:-1]
    if _on_tpu():
        x2 = x.reshape(-1, x.shape[-1])
        out = quant_matmul_pallas_stacked(x2, p["q"], p["s"], spec.bits, layer)
        return out.reshape(*lead, -1).astype(x.dtype)
    pl_ = {"q": p["q"][layer], "s": p["s"][layer]}
    w = dequantize(pl_, spec, x.dtype)
    return jnp.matmul(x, w, preferred_element_type=jnp.float32).astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("bits",))
def quant_matmul_pallas(
    x: jax.Array,  # [M, K]
    q: jax.Array,  # int8 [K, N] or packed uint8 [K/2, N] (group-half layout)
    s: jax.Array,  # [K // group, N] f32
    bits: int,
) -> jax.Array:
    M, K = x.shape
    N = q.shape[1]
    groups = s.shape[0]
    group = K // groups
    m_tile = 128 if M >= 128 else max(8, 1 << max(M - 1, 0).bit_length())
    m_tile = min(m_tile, M) if M >= 8 else 8

    if bits == 4:
        # grid over (M, N) only; K stays in VMEM (uint8 packed: K/2 rows)
        n_tile = min(1024, N)
        grid = (pl.cdiv(M, m_tile), pl.cdiv(N, n_tile))
        return pl.pallas_call(
            functools.partial(_qmm4_kernel_bias, group=group, n_groups=groups),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (m_tile, K), lambda i, j: (i, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (K // 2, n_tile), lambda i, j: (0, j), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (groups, n_tile), lambda i, j: (0, j), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (m_tile, n_tile), lambda i, j: (i, j), memory_space=pltpu.VMEM
            ),
        )(x, q, s)

    k_tile = max(group, (min(2048, K) // group) * group)
    grid = (pl.cdiv(M, m_tile), pl.cdiv(N, n_tile := min(512, N)), pl.cdiv(K, k_tile))
    return pl.pallas_call(
        functools.partial(_qmm_kernel, bits=bits, k_tile=k_tile, group=group),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (m_tile, k_tile), lambda i, j, k: (i, k), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (k_tile, n_tile), lambda i, j, k: (k, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (groups, n_tile),  # all group rows (small); K-slice in-kernel
                lambda i, j, k: (0, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (m_tile, n_tile), lambda i, j, k: (i, j), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((m_tile, n_tile), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(x, q, s)
