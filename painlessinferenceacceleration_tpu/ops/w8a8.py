"""W8A8 activation-quantized GEMMs (INT8 and FP8-e4m3, plus 128x128 block).

Reference: flood/flood/layers/linear.py:318-1097 (DynamicW8A8Fp8Linear,
StaticW8A8Fp8Linear, Dynamic/StaticW8A8Int8Linear, token-block and
128x128-block FP8) and flood/flood/ops/gemm.py:193-393 /
ops/quantization.py:264-383 (Triton W8A8 GEMMs + per-token quant kernels).

TPU re-design:
- Activation quantization runs OUTSIDE the kernel in the jit wrapper — XLA
  fuses the per-token amax/scale/cast chain into the producing op, so no
  separate "quant kernel" is needed (the reference needs one per variant).
- The per-token activation scale is applied to the GEMM OUTPUT after the
  pallas call (rank-1: out * xs[m] — fused by XLA into the consumer),
  so the kernel only applies the per-out-channel weight scale.
- Weights are dotted in bf16 on the MXU: int8/e4m3 values are exactly
  representable in bf16 and products accumulate in f32, so the integer
  semantics match the oracle to f32-accumulation rounding. (A native
  s8xs8->s32 MXU path is a further 2x MXU-throughput option for prefill;
  decode is HBM-bound where the 1-byte weight read is the whole win.)
- 128x128-block FP8 (DeepSeek V3 checkpoint format): K-gridded kernel,
  one 128-row K-block per step; the [K/128, N/128] weight scale is
  pre-expanded to [K/128, N] by the wrapper and the per-(token, K-block)
  activation scale multiplies the per-block partial product in-kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from painlessinferenceacceleration_tpu.layers.linear import FP8_MAX, QuantSpec

INT8_MAX = 127.0


def quant_act(x2: jax.Array, spec: QuantSpec, xs_static=None):
    """Quantize activations x2 [M, K] per spec.

    Returns (xq, xs) where xs is [M] (per-token) or [M, K/block] for the
    block format. Static specs use the calibrated scalar ``xs_static``.
    """
    qmax = FP8_MAX if spec.wfmt == "fp8" else INT8_MAX
    xf = x2.astype(jnp.float32)
    if spec.block:
        M, K = x2.shape
        B = spec.block
        kb = -(-K // B)
        xp = jnp.zeros((M, kb * B), jnp.float32).at[:, :K].set(xf)
        xg = xp.reshape(M, kb, B)
        xs = jnp.maximum(jnp.max(jnp.abs(xg), axis=-1) / qmax, 1e-8)  # [M, kb]
        if spec.act_pow2:  # token-block variant: pow2 scales (tile_quant,
            # reference quantization.py:198-199)
            xs = jnp.exp2(jnp.floor(jnp.log2(xs) + 0.5))
        xq = xg / xs[:, :, None]
    elif spec.act == "static":
        xs = jnp.broadcast_to(jnp.asarray(xs_static, jnp.float32), (x2.shape[0],))
        xq = xf / xs[:, None]
    else:
        xs = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1) / qmax, 1e-8)  # [M]
        xq = xf / xs[:, None]
    if spec.wfmt == "fp8":
        # saturate like Triton's fp8 conversion (the pow2-snapped Tb scales
        # can land below amax/448, putting values past the e4m3 max; a bare
        # jnp cast would produce NaN)
        xq = jnp.clip(xq, -FP8_MAX, FP8_MAX).astype(jnp.float8_e4m3fn)
    else:
        xq = jnp.clip(jnp.round(xq), -127, 127).astype(jnp.int8)
    if spec.block:
        M, K = x2.shape
        xq = xq.reshape(M, -1)[:, :K]
    return xq, xs


def calibrate_act_scale(samples: jax.Array, spec: QuantSpec) -> jax.Array:
    """Static activation scale from calibration activations [.., K]."""
    qmax = FP8_MAX if spec.wfmt == "fp8" else INT8_MAX
    return jnp.maximum(jnp.max(jnp.abs(samples.astype(jnp.float32))) / qmax, 1e-8)


# ---------------------------------------------------------------------------
# jnp oracle (CPU path + correctness reference for the kernels)
# ---------------------------------------------------------------------------


def w8a8_matmul_ref(x2: jax.Array, p: dict, spec: QuantSpec,
                    out_dtype=None) -> jax.Array:
    """x2 [M, K] @ W8A8 weights -> [M, N] bf16-ish (x2.dtype)."""
    od = out_dtype or x2.dtype
    xq, xs = quant_act(x2, spec, p.get("xs"))
    q, s = p["q"], p["s"]
    if spec.block:
        B = spec.block
        M, K = x2.shape
        N = q.shape[1]
        nkb = s.shape[0]
        acc = jnp.zeros((M, N), jnp.float32)
        for kb in range(nkb):
            part = jnp.matmul(
                xq[:, kb * B : (kb + 1) * B].astype(jnp.float32),
                q[kb * B : (kb + 1) * B].astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
            sn = jnp.repeat(s[kb], B)[:N]  # [N]
            acc = acc + part * xs[:, kb : kb + 1] * sn[None, :]
        return acc.astype(od)
    if spec.wfmt == "fp8":
        acc = jnp.matmul(
            xq.astype(jnp.float32), q.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
    else:
        acc = jnp.matmul(
            xq.astype(jnp.int32), q.astype(jnp.int32),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
    return (acc * xs[:, None] * s[None, :]).astype(od)


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------


def _swar_e4m3_half_to_bf16(h):
    """uint32 lanes holding one e4m3 byte per 16-bit HALF -> bf16 pairs.

    bf16 = sign | (exp+120)<<7 | mant<<4, built with lane-wide integer ops
    ((byte & 0x7F) << 4) + 0x3C00, sign OR'd in. e4m3 zero/subnormals
    (exp field 0) are flushed to +-0 by an integer-SWAR exponent test
    (OR-spread bits to one flag, expand to a half mask via 0xFFFF multiply)
    — max flush error is amax/28672, far below the quantization step.
    Probe-validated exact on v5e incl. +-448/negatives (/tmp probe, kept in
    benchmarks/exp_bitcast_probe.py's sibling)."""
    y = ((h & jnp.uint32(0x007F007F)) << 4) + jnp.uint32(0x3C003C00)
    y = y | ((h & jnp.uint32(0x00800080)) << 8)
    e = h & jnp.uint32(0x00780078)
    z = e | (e >> 1)
    z = z | (z >> 2)
    z = z | (z >> 3)
    keep = (z >> 3) & jnp.uint32(0x00010001)
    y = y & (keep * jnp.uint32(0xFFFF))
    return pltpu.bitcast(y, jnp.bfloat16)


def _fp8_w_to_bf16(q):
    """e4m3 weight tile [kt, n] -> bf16 [kt, n] with rows reordered to
    [even rows..., odd rows...] (Mosaic's u8->u32 sublane packing puts
    even rows in the low bytes; the WRAPPER permutes x's columns to match).

    Exists because Mosaic's native fp8->bf16 vector convert is
    catastrophically slow on v5e (the naive kernel measured 11 tok/s AR at
    7B vs 132 for int4); this is the same magic-constant SWAR trick as the
    int4 kernel, one octave up."""
    p32 = pltpu.bitcast(q, jnp.uint32)  # [kt/4, n]
    lo = p32 & jnp.uint32(0x00FF00FF)
    hi = (p32 >> 8) & jnp.uint32(0x00FF00FF)
    return jnp.concatenate(
        [_swar_e4m3_half_to_bf16(lo), _swar_e4m3_half_to_bf16(hi)], axis=0
    )


def _w_bf16(q, fp8_w: bool):
    return _fp8_w_to_bf16(q) if fp8_w else q.astype(jnp.bfloat16)


def _w8a8_kernel(x_ref, q_ref, s_ref, o_ref, acc_ref, *, k_grid, fp8_w):
    """Per-channel W8A8: K-gridded accumulation, weight scale at the end.

    The per-token activation scale is applied OUTSIDE (wrapper)."""
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:].astype(jnp.bfloat16)
    w = _w_bf16(q_ref[:], fp8_w)
    acc_ref[:] += jnp.dot(x, w, preferred_element_type=jnp.float32)

    @pl.when(ki == k_grid - 1)
    def _():
        o_ref[:] = (acc_ref[:] * s_ref[:]).astype(o_ref.dtype)


def _w8a8_stacked_kernel(layer_ref, x_ref, q_ref, s_ref, o_ref, acc_ref, *,
                         k_grid, fp8_w):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:].astype(jnp.bfloat16)
    w = _w_bf16(q_ref[0], fp8_w)
    acc_ref[:] += jnp.dot(x, w, preferred_element_type=jnp.float32)

    @pl.when(ki == k_grid - 1)
    def _():
        o_ref[:] = (acc_ref[:] * s_ref[0]).astype(o_ref.dtype)


def _block_fp8_kernel(x_ref, xs_ref, q_ref, s_ref, o_ref, acc_ref, *, k_grid):
    """128x128-block fp8: per-K-block partial scaled by xs[m, kb] * s[kb, n]."""
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:].astype(jnp.bfloat16)
    w = _w_bf16(q_ref[:], True)
    part = jnp.dot(x, w, preferred_element_type=jnp.float32)
    acc_ref[:] += part * xs_ref[:, 0][:, None] * s_ref[:]

    @pl.when(ki == k_grid - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _block_fp8_stacked_kernel(layer_ref, x_ref, xs_ref, q_ref, s_ref, o_ref,
                              acc_ref, *, k_grid):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:].astype(jnp.bfloat16)
    w = _w_bf16(q_ref[0], True)
    part = jnp.dot(x, w, preferred_element_type=jnp.float32)
    acc_ref[:] += part * xs_ref[:, 0][:, None] * s_ref[0]

    @pl.when(ki == k_grid - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _even_odd_k_cols(x2q: jax.Array, k_tile: int) -> jax.Array:
    """Permute x columns within each k_tile to [even rows..., odd rows...],
    matching _fp8_w_to_bf16's row order. Zero-pads K up to a whole number
    of tiles so the last weight block's out-of-range rows (whatever Pallas
    pads them with) multiply against explicit zeros."""
    M, K = x2q.shape
    kt = min(k_tile, K)
    Kp = -(-K // kt) * kt
    if Kp != K:
        x2q = jnp.pad(x2q, ((0, 0), (0, Kp - K)))
    xr = x2q.reshape(M, Kp // kt, kt // 2, 2)
    return jnp.concatenate([xr[..., 0], xr[..., 1]], axis=-1).reshape(M, Kp)


def _mtile(M: int) -> int:
    m = 128 if M >= 128 else max(8, 1 << max(M - 1, 0).bit_length())
    return min(m, M) if M >= 8 else 8


@functools.partial(jax.jit, static_argnames=("interpret",))
def _w8a8_pallas(x2q, s, q, interpret=False):
    """Unscaled-activation W8A8 GEMM: (x2q @ q) * s[None, :].

    x2q is the ALREADY-quantized activation (int8 or e4m3); the wrapper
    applies the per-token scale to the output."""
    M, K = x2q.shape
    N = q.shape[1]
    m_tile = _mtile(M)
    n_tile = min(512, N)
    k_tile = min(2048, K)
    k_grid = pl.cdiv(K, k_tile)
    fp8_w = q.dtype == jnp.float8_e4m3fn
    if fp8_w:  # bf16 upconvert + even/odd permute OUTSIDE the kernel (XLA);
        # the in-kernel weight path uses the SWAR converter
        x2q = _even_odd_k_cols(x2q.astype(jnp.bfloat16), k_tile)
    elif K % k_tile:  # explicit zero x-pad: the last weight block reads
        # past K and Pallas pads it with arbitrary bytes
        x2q = jnp.pad(x2q, ((0, 0), (0, k_grid * k_tile - K)))
    grid = (pl.cdiv(M, m_tile), pl.cdiv(N, n_tile), k_grid)
    return pl.pallas_call(
        functools.partial(_w8a8_kernel, k_grid=k_grid, fp8_w=fp8_w),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        grid=grid,
        in_specs=[
            pl.BlockSpec((m_tile, k_tile), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_tile, n_tile), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_tile), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m_tile, n_tile), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((m_tile, n_tile), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x2q, q, s.reshape(1, N).astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("interpret",))
def _w8a8_pallas_stacked(x2q, s, q, layer, interpret=False):
    M, K = x2q.shape
    L, _, N = q.shape
    m_tile = _mtile(M)
    n_tile = min(512, N)
    k_tile = min(2048, K)
    k_grid = pl.cdiv(K, k_tile)
    fp8_w = q.dtype == jnp.float8_e4m3fn
    if fp8_w:
        x2q = _even_odd_k_cols(x2q.astype(jnp.bfloat16), k_tile)
    elif K % k_tile:  # see _w8a8_pallas: zero x-pad over the ragged K tail
        x2q = jnp.pad(x2q, ((0, 0), (0, k_grid * k_tile - K)))
    grid = (pl.cdiv(M, m_tile), pl.cdiv(N, n_tile), k_grid)
    layer_arr = jnp.asarray(layer, jnp.int32).reshape(1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((m_tile, k_tile), lambda i, j, k, l: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_tile, n_tile), lambda i, j, k, l: (l[0], k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_tile), lambda i, j, k, l: (l[0], 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m_tile, n_tile), lambda i, j, k, l: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((m_tile, n_tile), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_w8a8_stacked_kernel, k_grid=k_grid, fp8_w=fp8_w),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        grid_spec=grid_spec,
        interpret=interpret,
    )(layer_arr, x2q, q, s.reshape(L, 1, N).astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def _block_fp8_pallas(x2q, xs, q, s_exp, block, interpret=False):
    """Block-fp8 GEMM. xs [M, K/B]; s_exp pre-expanded [K/B, N]."""
    M, K = x2q.shape
    N = q.shape[1]
    B = block
    m_tile = _mtile(M)
    n_tile = min(512, N)
    k_grid = K // B
    x2q = _even_odd_k_cols(x2q.astype(jnp.bfloat16), B)
    grid = (pl.cdiv(M, m_tile), pl.cdiv(N, n_tile), k_grid)
    return pl.pallas_call(
        functools.partial(_block_fp8_kernel, k_grid=k_grid),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        grid=grid,
        in_specs=[
            pl.BlockSpec((m_tile, B), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m_tile, 1), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, n_tile), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_tile), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m_tile, n_tile), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((m_tile, n_tile), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x2q, xs.astype(jnp.float32), q, s_exp.astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def _block_fp8_pallas_stacked(x2q, xs, q, s_exp, layer, block,
                              interpret=False):
    M, K = x2q.shape
    L, _, N = q.shape
    B = block
    m_tile = _mtile(M)
    n_tile = min(512, N)
    k_grid = K // B
    x2q = _even_odd_k_cols(x2q.astype(jnp.bfloat16), B)
    grid = (pl.cdiv(M, m_tile), pl.cdiv(N, n_tile), k_grid)
    layer_arr = jnp.asarray(layer, jnp.int32).reshape(1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((m_tile, B), lambda i, j, k, l: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m_tile, 1), lambda i, j, k, l: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, n_tile), lambda i, j, k, l: (l[0], k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_tile), lambda i, j, k, l: (l[0], k, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m_tile, n_tile), lambda i, j, k, l: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((m_tile, n_tile), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_block_fp8_stacked_kernel, k_grid=k_grid),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        grid_spec=grid_spec,
        interpret=interpret,
    )(layer_arr, x2q, xs.astype(jnp.float32), q,
      s_exp.astype(jnp.float32))


def _expand_block_scales(s: jax.Array, B: int) -> jax.Array:
    """[K/B, N/B] -> [K/B, N] (repeat along out channels)."""
    return jnp.repeat(s, B, axis=-1)


def w8a8_matmul(x2: jax.Array, p: dict, spec: QuantSpec,
                use_pallas: bool, interpret: bool = False,
                out_dtype=None) -> jax.Array:
    """Dispatch: activation quant (wrapper) + W8A8 GEMM.

    ``out_dtype`` skips the output downcast (LM-head fp32 logits)."""
    od = out_dtype or x2.dtype
    if spec.block and (
        x2.shape[-1] % spec.block or p["q"].shape[-1] % spec.block
    ):
        use_pallas = False  # edge blocks: jnp path handles padding
    if not use_pallas:
        return w8a8_matmul_ref(x2, p, spec, out_dtype=od)
    xq, xs = quant_act(x2, spec, p.get("xs"))
    if spec.block:
        s_exp = _expand_block_scales(p["s"], spec.block)
        return _block_fp8_pallas(
            xq, xs, p["q"], s_exp, spec.block, interpret=interpret
        ).astype(od)
    out = _w8a8_pallas(xq, p["s"], p["q"], interpret=interpret)
    return (out * xs[:, None]).astype(od)


def w8a8_matmul_stacked(x2: jax.Array, p: dict, spec: QuantSpec, layer,
                        use_pallas: bool, interpret: bool = False
                        ) -> jax.Array:
    if spec.block and (
        x2.shape[-1] % spec.block or p["q"].shape[-1] % spec.block
    ):
        use_pallas = False
    if not use_pallas:
        pl_ = {k: v[layer] for k, v in p.items()}
        return w8a8_matmul_ref(x2, pl_, spec)
    xs_static = p["xs"][layer] if "xs" in p else None
    xq, xs = quant_act(x2, spec, xs_static)
    if spec.block:
        s_exp = _expand_block_scales(p["s"], spec.block)
        return _block_fp8_pallas_stacked(
            xq, xs, p["q"], s_exp, layer, spec.block, interpret=interpret
        ).astype(x2.dtype)
    out = _w8a8_pallas_stacked(xq, p["s"], p["q"], layer, interpret=interpret)
    return (out * xs[:, None]).astype(x2.dtype)
