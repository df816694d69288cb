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

    int8:  {"q": int8[in, out],                  "s": f32[in/group, out]}
    int4:  {"q": uint8[in/2, out] packed nibbles, "s": f32[in/group, out]}

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
    """Static quantization descriptor shared by all quantized linears."""

    bits: int = 8  # 8 | 4
    group: int = 128  # input-dim group size for scales

    @classmethod
    def from_mode(cls, mode: str, group: int = 128) -> Optional["QuantSpec"]:
        if mode in ("none", "", None):
            return None
        if mode == "int8":
            return cls(bits=8, group=group)
        if mode == "int4":
            return cls(bits=4, group=group)
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
    return wg, scale, g


def effective_group(din: int, group: int) -> int:
    g = min(group, din)
    return g if din % g == 0 else din


def quantize(w: jax.Array, spec: QuantSpec) -> dict:
    """Symmetric weight-only quantization of w [in, out]."""
    if spec.bits == 8:
        wg, scale, g = _group_scales(w, spec.group, 127.0)
        q = jnp.clip(jnp.round(wg / scale[:, None, :]), -127, 127).astype(jnp.int8)
        return {"q": q.reshape(w.shape), "s": scale}
    if spec.bits == 4:
        wg, scale, g = _group_scales(w, spec.group, 7.0)
        # Layout (chosen for the Mosaic TPU kernel, ops/quant_matmul.py):
        # - group-half packing: within each scale group of g rows, byte j
        #   holds row j (low nibble) and row j + g/2 (high nibble) -> the
        #   unpack is a concat of contiguous halves, no sublane interleave;
        # - nibbles are stored BIASED (value + 8, in 0..15): the kernel then
        #   needs no sign-extension select chain — it dots the biased
        #   nibbles and subtracts the closed-form correction
        #   8 * sum_k(x_k) * scale per group.
        assert g % 2 == 0, "int4 packing needs an even group size"
        q = jnp.clip(jnp.round(wg / scale[:, None, :]), -8, 7).astype(jnp.int32) + 8
        lo = q[:, : g // 2].astype(jnp.uint8) & 0xF
        hi = (q[:, g // 2 :].astype(jnp.uint8) & 0xF) << 4
        packed = (lo | hi).astype(jnp.uint8)  # [groups, g/2, out]
        din, dout = w.shape
        return {"q": packed.reshape(din // 2, dout), "s": scale}
    raise ValueError(spec)


def unpack_int4(packed: jax.Array, group: int) -> jax.Array:
    """[K/2, N] uint8 (biased group-half layout) -> [K, N] int8 (signed)."""
    k2, n = packed.shape
    g = min(group, k2 * 2)
    p = packed.reshape(k2 * 2 // g, g // 2, n).astype(jnp.int32)
    lo = (p & 0xF) - 8
    hi = ((p >> 4) & 0xF) - 8
    out = jnp.concatenate([lo, hi], axis=1)  # [groups, g, n]
    return out.reshape(k2 * 2, n).astype(jnp.int8)


def dequantize(p: dict, spec: QuantSpec, dtype=jnp.bfloat16) -> jax.Array:
    """Reconstruct the dense weight [in, out] (jnp reference path)."""
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
) -> jax.Array:
    """``x @ W (+ bias)`` with dispatch on quantized leaves."""
    if isinstance(p, dict):
        from painlessinferenceacceleration_tpu.ops import quant_matmul

        out = quant_matmul.quant_matmul(x, p, spec)
    else:
        out = jnp.matmul(x, p.astype(x.dtype), preferred_element_type=jnp.float32)
        out = out.astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out
