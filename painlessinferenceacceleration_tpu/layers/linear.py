"""Quantized linear layers.

Reference: flood/layers/linear.py (AutoLinear + 7 variants: native bf16 with
QKV/gate-up merging, dynamic/static W8A8 FP8, dynamic/static W8A8 INT8,
token-block FP8, 128x128-block FP8) and the lookahead INT8/INT4 weight-only
quantizers (lookahead/models/*/quantizer.py).

TPU design: weight-only INT8/INT4 with grouped scales is the serving
sweet-spot on v5e (decode is HBM-bandwidth-bound; SURVEY §7 step 5). Weights
are stored pre-transposed as ``[in, out]`` so ``x @ w`` hits the MXU without
a transpose. A linear param leaf is either a raw array (native) or a dict of
arrays (so layer stacking / lax.scan over layers works — static metadata
lives in ``QuantSpec``, not in the pytree):

    int8:  {"q": int8[in, out],                  "s": bf16[in/group, out]}
    int4:  {"q": uint8[in/2, out] packed nibbles, "s": bf16[in/group, out]}

(grouped scales are stored bf16: f32 scales alone are 1/16 of the int4
weight bytes, a measured 5% of decode GEMM time — see profile_qmm_r3.log)

The jnp path dequantizes then matmuls (XLA fuses the dequant into the matmul
read); the fused Pallas dequant-matmul kernel lives in ops/quant_matmul.py.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Union

import jax
import jax.numpy as jnp

LinearParams = Union[jax.Array, dict]


@dataclasses.dataclass(frozen=True)
class QuantSpec:
    """Static quantization descriptor shared by all quantized linears.

    Weight-only (``act is None``): INT8/INT4 with per-(group, out-channel)
    scales — the decode sweet-spot (HBM-bound; the dequant folds into the
    GEMM read).

    Activation-quantized (W8A8, reference flood/layers/linear.py:318-1097):
    ``act`` selects how the activation scale is obtained —
      - "dyn":    per-token amax computed on the fly (DynamicW8A8*Linear)
      - "static": calibrated scalar scale stored in the leaf (StaticW8A8*)
    ``wfmt`` selects the 8-bit weight format: "int" (int8) or "fp8"
    (float8_e4m3fn). W8A8 weights use per-out-channel scales (groups=1) so
    the dequant applies AFTER the full-K accumulation.

    ``block=128`` selects the DeepSeek-style 128x128-block FP8 format
    (reference Block128x128FP8Linear): weight scales [K/128, N/128] with
    per-(token, K-block) dynamic activation scales. ``act_pow2`` snaps the
    activation scales to powers of two — the reference's token-block
    variant (DynamicTbW8A8Fp8Linear, linear.py:852 + tile_quant
    quantization.py:187-206 ``exp2(floor(log2 s + .5))``).
    """

    bits: int = 8  # 8 | 4
    group: int = 128  # input-dim group size for scales (weight-only)
    wfmt: str = "int"  # "int" | "fp8"
    act: Optional[str] = None  # None | "dyn" | "static"
    block: int = 0  # 0 | 128 (block-quantized fp8)
    act_pow2: bool = False  # snap activation scales to powers of two (Tb)

    @classmethod
    def from_mode(cls, mode: str, group: int = 128) -> Optional["QuantSpec"]:
        if mode in ("none", "", None):
            return None
        if mode == "int8":
            return cls(bits=8, group=group)
        if mode == "int4":
            return cls(bits=4, group=group)
        if mode == "w8a8_int8":
            return cls(bits=8, act="dyn")
        if mode == "w8a8_int8_static":
            return cls(bits=8, act="static")
        if mode == "w8a8_fp8":
            return cls(bits=8, wfmt="fp8", act="dyn")
        if mode == "w8a8_fp8_static":
            return cls(bits=8, wfmt="fp8", act="static")
        if mode == "fp8_block":
            return cls(bits=8, wfmt="fp8", act="dyn", block=128)
        if mode == "fp8_tb":  # token-block: pow2-snapped activation scales
            return cls(bits=8, wfmt="fp8", act="dyn", block=128, act_pow2=True)
        raise ValueError(f"unknown quant mode {mode!r}")


def _group_scales(w: jax.Array, group: int, qmax: float):
    """Per-(group, out-channel) symmetric scales for w [in, out]."""
    din, dout = w.shape
    g = min(group, din)
    if din % g:
        g = din  # fall back to per-channel when not divisible
    wg = w.reshape(din // g, g, dout).astype(jnp.float32)
    amax = jnp.max(jnp.abs(wg), axis=1)  # [groups, out]
    scale = jnp.maximum(amax / qmax, 1e-8)
    # stored bf16 (halves scale read traffic: f32 scales are 1/16 of the
    # int4 weight bytes — measured 5.54 vs 5.87 ms/step at 7B,
    # benchmarks/profile_qmm_r3.log); q is computed against the ROUNDED
    # scale so quantize/dequantize stay self-consistent. The bf16 cast
    # must round UP: a rounded-down scale maps the group-max weight past
    # qmax and clips it (avoidable error on exactly the largest weight).
    scale_bf = scale.astype(jnp.bfloat16)
    next_up = jax.lax.bitcast_convert_type(  # scales are positive: +1 ulp
        jax.lax.bitcast_convert_type(scale_bf, jnp.uint16) + 1, jnp.bfloat16
    )
    scale_bf = jnp.where(scale_bf.astype(jnp.float32) < scale, next_up, scale_bf)
    return wg, scale_bf, g


def effective_group(din: int, group: int) -> int:
    g = min(group, din)
    return g if din % g == 0 else din


FP8_MAX = 448.0  # float8_e4m3fn


def quantize(
    w: jax.Array, spec: QuantSpec, act_scale: Optional[float] = None
) -> dict:
    """Symmetric quantization of w [in, out] per ``spec``.

    ``act_scale`` seeds the stored activation scale for static-act specs
    (calibration value; defaults to 1.0 — see ``calibrate_act_scale``).
    """
    if spec.block:
        # 128x128-block fp8: scales [ceil(K/B), ceil(N/B)] (edge blocks are
        # partial — HF DeepSeek-V3 weight_scale_inv convention)
        B = spec.block
        din, dout = w.shape
        kb, nb = -(-din // B), -(-dout // B)
        wp = jnp.zeros((kb * B, nb * B), jnp.float32).at[:din, :dout].set(
            w.astype(jnp.float32)
        )
        wb = wp.reshape(kb, B, nb, B)
        amax = jnp.max(jnp.abs(wb), axis=(1, 3))  # [kb, nb]
        scale = jnp.maximum(amax / FP8_MAX, 1e-8)
        q = (wb / scale[:, None, :, None]).astype(jnp.float8_e4m3fn)
        return {"q": q.reshape(kb * B, nb * B)[:din, :dout], "s": scale}
    if spec.act is not None:
        # W8A8: per-out-channel weight scales (dequant after full-K accum)
        amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0)  # [out]
        if spec.wfmt == "fp8":
            scale = jnp.maximum(amax / FP8_MAX, 1e-8)
            q = (w.astype(jnp.float32) / scale[None, :]).astype(
                jnp.float8_e4m3fn
            )
        else:
            scale = jnp.maximum(amax / 127.0, 1e-8)
            q = jnp.clip(
                jnp.round(w.astype(jnp.float32) / scale[None, :]), -127, 127
            ).astype(jnp.int8)
        p = {"q": q, "s": scale}
        if spec.act == "static":
            p["xs"] = jnp.float32(1.0 if act_scale is None else act_scale)
        return p
    if spec.bits == 8:
        wg, scale, g = _group_scales(w, spec.group, 127.0)
        q = jnp.clip(jnp.round(wg / scale[:, None, :]), -127, 127).astype(jnp.int8)
        return {"q": q.reshape(w.shape), "s": scale}
    if spec.bits == 4:
        wg, scale, g = _group_scales(w, spec.group, 7.0)
        # Layout (chosen for the Mosaic TPU kernel, ops/quant_matmul.py):
        # - nibbles are stored BIASED (value + 8, in 0..15): the kernel then
        #   needs no sign-extension select chain — it dots the biased
        #   nibbles and subtracts the closed-form correction
        #   8 * sum_k(x_k) * scale per group;
        # - PLANE-BAKED row order: the kernel's uint8->uint32 bitcast SWAR
        #   unpack emits rows in a fixed permutation (even bytes' low
        #   nibbles, odd low, even high, odd high). The inverse permutation
        #   is baked into which row each byte/nibble stores, so the
        #   unpacked weight block comes out in NATURAL row order and the
        #   activation needs NO per-call plane reorder (a pure reshape
        #   replaces the concat-of-4-slices that cost ~0.3 ms/step at 7B
        #   decode — 129 reorders/step).
        assert g % 8 == 0, "int4 SWAR packing needs group % 8 == 0"
        q = jnp.clip(jnp.round(wg / scale[:, None, :]), -8, 7).astype(jnp.int32) + 8
        j = jnp.arange(g // 2)
        losrc = j // 2 + (j % 2) * (g // 4)  # byte j's low-nibble source row
        lo = q[:, losrc].astype(jnp.uint8) & 0xF
        hi = (q[:, losrc + g // 2].astype(jnp.uint8) & 0xF) << 4
        packed = (lo | hi).astype(jnp.uint8)  # [groups, g/2, out]
        din, dout = w.shape
        return {"q": packed.reshape(din // 2, dout), "s": scale}
    raise ValueError(spec)


def unpack_int4(packed: jax.Array, group: int) -> jax.Array:
    """[K/2, N] uint8 (biased plane-baked layout) -> [K, N] int8 (signed)."""
    import numpy as _np

    k2, n = packed.shape
    g = min(group, k2 * 2)
    p = packed.reshape(k2 * 2 // g, g // 2, n).astype(jnp.int32)
    lo = (p & 0xF) - 8
    hi = ((p >> 4) & 0xF) - 8
    both = jnp.concatenate([lo, hi], axis=1)  # index j holds row losrc[j]
    j = _np.arange(g // 2)
    losrc = j // 2 + (j % 2) * (g // 4)
    inv = _np.empty(g, _np.int32)
    inv[losrc] = j
    inv[losrc + g // 2] = j + g // 2
    out = both[:, inv]  # [groups, g, n] natural row order
    return out.reshape(k2 * 2, n).astype(jnp.int8)


def dequantize(p: dict, spec: QuantSpec, dtype=jnp.bfloat16) -> jax.Array:
    """Reconstruct the dense weight [in, out] (jnp reference path)."""
    if spec.block:
        B = spec.block
        din, dout = p["q"].shape
        kb, nb = p["s"].shape
        qp = jnp.zeros((kb * B, nb * B), jnp.float32).at[:din, :dout].set(
            p["q"].astype(jnp.float32)
        )
        w = qp.reshape(kb, B, nb, B) * p["s"][:, None, :, None]
        return w.reshape(kb * B, nb * B)[:din, :dout].astype(dtype)
    if spec.act is not None:
        return (p["q"].astype(jnp.float32) * p["s"][None, :]).astype(dtype)
    if spec.bits == 8:
        q = p["q"].astype(jnp.float32)
    else:
        din = p["q"].shape[0] * 2
        q = unpack_int4(p["q"], din // p["s"].shape[0]).astype(jnp.float32)
    din, dout = q.shape
    scale = p["s"]  # [groups, out]
    g = din // scale.shape[0]
    q = q.reshape(din // g, g, dout) * scale[:, None, :]
    return q.reshape(din, dout).astype(dtype)


def make_linear(w: jax.Array, spec: Optional[QuantSpec]) -> LinearParams:
    return w if spec is None else quantize(w, spec)


def linear_at(
    p_stacked: LinearParams,
    li: jax.Array,
    x: jax.Array,
    spec: Optional[QuantSpec] = None,
    bias_stacked: Optional[jax.Array] = None,
) -> jax.Array:
    """``x @ W[li] (+ bias[li])`` over STACKED leaves [L, ...].

    Quantized leaves route to the stacked Pallas GEMM (layer chosen by the
    kernel's block index map): a dynamic per-layer slice feeding a pallas
    call would be materialized by XLA — a full extra weights read per step.
    Native bf16 leaves slice normally (XLA fuses slices into dot operands).
    """
    if isinstance(p_stacked, dict):
        from painlessinferenceacceleration_tpu.ops import quant_matmul

        out = quant_matmul.quant_matmul_stacked(x, p_stacked, spec, li)
    else:
        w = p_stacked[li]
        out = jnp.matmul(x, w.astype(x.dtype), preferred_element_type=jnp.float32)
        out = out.astype(x.dtype)
    if bias_stacked is not None:
        out = out + bias_stacked[li].astype(out.dtype)
    return out


def linear(
    p: LinearParams,
    x: jax.Array,
    spec: Optional[QuantSpec] = None,
    bias: Optional[jax.Array] = None,
    out_dtype=None,
) -> jax.Array:
    """``x @ W (+ bias)`` with dispatch on quantized leaves.

    ``out_dtype`` keeps the fp32 accumulator un-rounded at the output
    (the LM head passes fp32: bf16-rounded logits make greedy argmax tie
    flips across batch widths far more likely)."""
    if isinstance(p, dict):
        from painlessinferenceacceleration_tpu.ops import quant_matmul

        out = quant_matmul.quant_matmul(x, p, spec, out_dtype=out_dtype)
    else:
        out = jnp.matmul(x, p.astype(x.dtype), preferred_element_type=jnp.float32)
        out = out.astype(out_dtype or x.dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out
