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
    x: jax.Array, p: dict, spec: QuantSpec, use_pallas: bool | None = None,
    out_dtype=None,
) -> jax.Array:
    """x [..., K] @ dequant(p) [K, N] -> [..., N] in x.dtype.

    ``out_dtype`` keeps the fp32 accumulator un-rounded at the output
    (used by the LM head: bf16-rounded logits make greedy argmax tie
    flips across batch widths ~8x more likely — SURVEY §7 hard-part-4)."""
    od = out_dtype or x.dtype
    if use_pallas is None:
        use_pallas = USE_PALLAS
    if use_pallas is None:
        K = x.shape[-1]
        N = p["q"].shape[-1]
        use_pallas = _on_tpu() and K >= 256 and N >= 256 and x.ndim >= 2
    if spec.act is not None or spec.block:
        from painlessinferenceacceleration_tpu.ops import w8a8

        lead = x.shape[:-1]
        out = w8a8.w8a8_matmul(
            x.reshape(-1, x.shape[-1]), p, spec, use_pallas, out_dtype=od
        )
        return out.reshape(*lead, -1)
    if use_pallas:
        lead = x.shape[:-1]
        x2 = x.reshape(-1, x.shape[-1])
        out = quant_matmul_pallas(x2, p["q"], p["s"], spec.bits, out_dtype=od)
        return out.reshape(*lead, -1)
    w = dequantize(p, spec, x.dtype)
    return jnp.matmul(x, w, preferred_element_type=jnp.float32).astype(od)


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


def _qmm4_v3_acc(xq_ref, xsum_ref, q3, s2):
    """Shared body of the int4 SWAR kernel (plain + stacked variants).

    Unpacking is pure bit-plane work — NO int8->bf16 converts and NO
    per-element weight*scale multiply (both measured VPU bottlenecks: the
    convert+smul variant runs at 337 GB/s-effective vs a 644 GB/s no-scale
    ceiling on v5e). Each nibble v is turned into the bf16 value (128 + v)
    by OR-ing the exponent pattern 0x4300 into the mantissa (magic-OR
    SWAR); the four bit planes are CONCATENATED into one [group, n] operand
    per group so each group is ONE MXU dot (the earlier 4-dots-per-group
    form was M-row-streaming bound: 0.273 ms at M=49 vs 0.116 here, equal
    at M=8 — benchmarks/exp_qmm_variants.py P7). The plane row order is a
    fixed permutation of K that quantize() BAKES INTO THE PACKED WEIGHT
    ROWS (layers/linear.py), so x arrives as a plain reshape. Scales
    are applied per group on the [M, n] partial OUTPUT (16x fewer
    multiplies than scaling the weight), and the constant 136 = 128 (magic
    bias) + 8 (nibble bias) is removed by the closed-form correction
    out -= 136 * sum_k(x_k in g) * s[g]. The per-group x sums ride a
    tiny side operand: computing them IN-KERNEL was measured ~0.5 ms/step
    SLOWER at 7B decode (the serial VPU reduce sits on the critical path
    between the MXU dots).
    """
    p32 = pltpu.bitcast(q3, jnp.uint32)  # [groups, half/4, n]
    m = jnp.uint32(0x000F000F)
    magic = jnp.uint32(0x43004300)
    a = pltpu.bitcast((p32 & m) | magic, jnp.bfloat16)  # [groups, half/2, n]
    b = pltpu.bitcast(((p32 >> 8) & m) | magic, jnp.bfloat16)
    c = pltpu.bitcast(((p32 >> 4) & m) | magic, jnp.bfloat16)
    d = pltpu.bitcast(((p32 >> 12) & m) | magic, jnp.bfloat16)
    groups = q3.shape[0]
    w = jnp.concatenate([a, b, c, d], axis=1)  # [groups, group, n]
    acc = jnp.zeros((xq_ref.shape[0], q3.shape[2]), jnp.float32)
    for g in range(groups):  # static unroll: groups is compile-time
        pg = jnp.dot(
            xq_ref[:, g, :], w[g], preferred_element_type=jnp.float32
        )
        pg = pg - 136.0 * xsum_ref[:, g][:, None]
        acc = acc + pg * s2[g][None, :]
    return acc


def _qmm4_kernel_v3(xq_ref, xsum_ref, q_ref, s_ref, o_ref):
    acc = _qmm4_v3_acc(xq_ref, xsum_ref, q_ref[...], s_ref[...])
    o_ref[...] = acc.astype(o_ref.dtype)


def _qmm4_stacked_kernel_v3(layer_ref, xq_ref, xsum_ref, q_ref, s_ref, o_ref):
    """Stacked [L, ...] variant: the layer is selected by the BlockSpec index
    map (scalar prefetch), so no per-layer weight slice is ever materialized
    to feed the kernel (XLA copies pallas operands that are dynamic slices —
    measured at a full extra weights re-read per step).
    """
    acc = _qmm4_v3_acc(xq_ref, xsum_ref, q_ref[0], s_ref[0])
    o_ref[...] = acc.astype(o_ref.dtype)


def _int4_n_tile(groups: int, N: int) -> int:
    """Per-shape lane tile (measured, benchmarks/profile_qmm_r3.log @7B):
    wide-N GEMMs (qkv 12288, gate-up 22016) pipeline ~10% faster with
    1024-lane tiles; large-groups K (mlp down: 86 groups) REGRESSES at 1024
    (the 5.6M weight block halves the double-buffer headroom), and narrow N
    gains nothing. VMEM at groups<=32, n_tile=1024: 2x 2M weight blocks."""
    if groups <= 32 and N > 4096:
        return 1024
    return min(512, N)


def _int4_x_planes(x: jax.Array, groups: int, group: int):
    """x [M, K] -> ([M, groups, group] bf16, per-group sums [M, groups]).

    The SWAR plane permutation is BAKED INTO THE WEIGHT PACKING
    (layers/linear.py quantize: each byte/nibble stores the row the
    Mosaic uint8->uint32->bf16 bitcast unpack will emit at that position),
    so the activation side is a free contiguous reshape — the previous
    concat-of-4-strided-slices cost ~0.3 ms/step at 7B decode (129
    calls/step). The group sums (bf16-cast values, matching what the MXU
    dots) feed the closed-form biased-nibble correction."""
    M, K = x.shape
    xq = x.reshape(M, groups, group).astype(jnp.bfloat16)
    xsum = jnp.sum(xq.astype(jnp.float32), axis=-1)
    return xq, xsum


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


@functools.partial(jax.jit, static_argnames=("bits", "interpret"))
def quant_matmul_pallas_stacked(
    x: jax.Array,  # [M, K]
    q: jax.Array,  # [L, Kq, N] stacked quant weights
    s: jax.Array,  # [L, K // group, N] stacked scales
    bits: int,
    layer: jax.Array,  # scalar int32
    interpret: bool = False,
) -> jax.Array:
    M, K = x.shape
    L, Kq, N = q.shape
    groups = s.shape[1]
    group = K // groups
    m_tile = 128 if M >= 128 else max(8, 1 << max(M - 1, 0).bit_length())
    m_tile = min(m_tile, M) if M >= 8 else 8
    layer_arr = jnp.asarray(layer, jnp.int32).reshape(1)

    if bits == 4:
        half = group // 2
        xq, xsum = _int4_x_planes(x, groups, group)
        q4 = q.reshape(L, groups, half, N)
        n_tile = _int4_n_tile(groups, N)
        grid = (pl.cdiv(M, m_tile), pl.cdiv(N, n_tile))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (m_tile, groups, group), lambda i, j, l: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (m_tile, groups), lambda i, j, l: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, groups, half, n_tile), lambda i, j, l: (l[0], 0, 0, j),
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
            _qmm4_stacked_kernel_v3,
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
            grid_spec=grid_spec,
            interpret=interpret,
        )(layer_arr, xq, xsum, q4, s)

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
        interpret=interpret,
    )(layer_arr, x, q, s)


def quant_matmul_stacked(
    x: jax.Array, p: dict, spec: QuantSpec, layer
) -> jax.Array:
    """x [..., K] @ dequant(p[layer]); p leaves stacked [L, ...]."""
    lead = x.shape[:-1]
    if spec.act is not None or spec.block:
        from painlessinferenceacceleration_tpu.ops import w8a8

        out = w8a8.w8a8_matmul_stacked(
            x.reshape(-1, x.shape[-1]), p, spec, layer, _on_tpu()
        )
        return out.reshape(*lead, -1).astype(x.dtype)
    if _on_tpu():
        x2 = x.reshape(-1, x.shape[-1])
        out = quant_matmul_pallas_stacked(x2, p["q"], p["s"], spec.bits, layer)
        return out.reshape(*lead, -1).astype(x.dtype)
    pl_ = {"q": p["q"][layer], "s": p["s"][layer]}
    w = dequantize(pl_, spec, x.dtype)
    return jnp.matmul(x, w, preferred_element_type=jnp.float32).astype(x.dtype)


@functools.partial(
    jax.jit, static_argnames=("bits", "interpret", "out_dtype")
)
def quant_matmul_pallas(
    x: jax.Array,  # [M, K]
    q: jax.Array,  # int8 [K, N] or packed uint8 [K/2, N] (group-half layout)
    s: jax.Array,  # [K // group, N] bf16 (stored) or f32 (both accepted)
    bits: int,
    interpret: bool = False,
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    M, K = x.shape
    N = q.shape[1]
    groups = s.shape[0]
    group = K // groups
    m_tile = 128 if M >= 128 else max(8, 1 << max(M - 1, 0).bit_length())
    m_tile = min(m_tile, M) if M >= 8 else 8

    if bits == 4:
        # grid over (M, N) only; K stays in VMEM (uint8 packed: K/2 rows)
        half = group // 2
        xq, xsum = _int4_x_planes(x, groups, group)
        q4 = q.reshape(groups, half, N)
        n_tile = _int4_n_tile(groups, N)
        grid = (pl.cdiv(M, m_tile), pl.cdiv(N, n_tile))
        return pl.pallas_call(
            _qmm4_kernel_v3,
            out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (m_tile, groups, group), lambda i, j: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (m_tile, groups), lambda i, j: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (groups, half, n_tile), lambda i, j: (0, 0, j),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (groups, n_tile), lambda i, j: (0, j),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (m_tile, n_tile), lambda i, j: (i, j), memory_space=pltpu.VMEM
            ),
            interpret=interpret,
        )(xq, xsum, q4, s)

    k_tile = max(group, (min(2048, K) // group) * group)
    grid = (pl.cdiv(M, m_tile), pl.cdiv(N, n_tile := min(512, N)), pl.cdiv(K, k_tile))
    return pl.pallas_call(
        functools.partial(_qmm_kernel, bits=bits, k_tile=k_tile, group=group),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
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
        interpret=interpret,
    )(x, q, s)
