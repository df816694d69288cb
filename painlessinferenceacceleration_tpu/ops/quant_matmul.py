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

# Enabled on TPU once the Pallas path wins bench.py's microbench; jnp remains
# the oracle.
USE_PALLAS = False


def quant_matmul(
    x: jax.Array, p: dict, spec: QuantSpec, use_pallas: bool | None = None
) -> jax.Array:
    """x [..., K] @ dequant(p) [K, N] -> [..., N] in x.dtype."""
    if use_pallas is None:
        use_pallas = USE_PALLAS
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
    """Grid (M/m, N/n, K/k): accumulate x_tile @ dequant(q_tile) into acc.

    int4 tiles keep 2-D shapes only: with the group-half packing
    (layers/linear.py), a whole-group K tile unpacks as a sublane concat of
    the low/high nibble halves — Mosaic vectorizes this; 3-D group reshapes
    forced relayouts and were ~10x slower.
    """
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # scales arrive with ALL group rows (tiny); slice this K-tile's groups
    ngt = k_tile // group
    s = s_ref[pl.ds(ki * ngt, ngt), :]  # [groups_in_tile, n_tile] f32
    if bits == 4:
        # SWAR nibble unpack: int8-vector shifts don't legalize in Mosaic and
        # int32 widening is slow, so shift four packed bytes at once in
        # 32-bit lanes and bitcast back. Sign-extend 4-bit via (x ^ 8) - 8.
        p32 = pltpu.bitcast(q_ref[:], jnp.uint32)  # [k_tile/2, n_tile/4]
        lo8 = pltpu.bitcast(p32 & jnp.uint32(0x0F0F0F0F), jnp.int8)
        hi8 = pltpu.bitcast((p32 >> 4) & jnp.uint32(0x0F0F0F0F), jnp.int8)
        eight = jnp.int8(8)
        lo = (lo8 ^ eight) - eight
        hi = (hi8 ^ eight) - eight
        if k_tile == group:
            # one group per tile: halves are contiguous row blocks
            q = jnp.concatenate([lo, hi], axis=0)
        else:
            q = jnp.concatenate(
                [lo.reshape(ngt, group // 2, -1), hi.reshape(ngt, group // 2, -1)],
                axis=1,
            ).reshape(k_tile, -1)
        qf = q.astype(jnp.bfloat16)
    else:
        qf = q_ref[:].astype(jnp.bfloat16)
    reps = k_tile // s.shape[0]
    sf = jnp.repeat(s, reps, axis=0).astype(jnp.bfloat16)  # [k_tile, n_tile]
    w = qf * sf
    acc_ref[:] += jnp.dot(
        x_ref[:].astype(jnp.bfloat16), w, preferred_element_type=jnp.float32
    )

    @pl.when(ki == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


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
    n_tile = min(512, N)
    if bits == 4:
        k_tile = group  # one quant group per K tile: 2-D unpack (see kernel)
    else:
        k_tile = max(group, (min(2048, K) // group) * group)
    grid = (pl.cdiv(M, m_tile), pl.cdiv(N, n_tile), pl.cdiv(K, k_tile))
    q_rows = k_tile // 2 if bits == 4 else k_tile

    return pl.pallas_call(
        functools.partial(_qmm_kernel, bits=bits, k_tile=k_tile, group=group),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (m_tile, k_tile), lambda i, j, k: (i, k), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (q_rows, n_tile), lambda i, j, k: (k, j), memory_space=pltpu.VMEM
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
