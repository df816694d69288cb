"""Rotary position embeddings: native / YaRN / Llama-3.1 scaling, QK-norm fusion.

Reference: flood/layers/rope.py:12-270 (NativeRope / YarnRope /
DeepseekYarnRope / Llama31Rope), flood/csrc/rope/rope.cu (varlen in-place
kernels), flood/ops/rope.py (fused QK-RMSNorm + RoPE for Qwen3).

TPU design: rope is a cheap elementwise op that XLA fuses into the QKV
projection epilogue, so the jnp formulation IS the fast path; we precompute
inv_freq once and gather cos/sin by position. All math in fp32 (HF parity).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp


def rope_inv_freq(cfg) -> jax.Array:
    """Per-pair inverse frequencies, with optional HF rope_scaling applied.

    Handles: none, linear, "llama3" (flood/layers/rope.py:238-270 /
    csrc/rope/rope.cu:633), "yarn" (flood/layers/rope.py:112-236,
    helpers :12-43).
    """
    dim = cfg.qk_rope_head_dim or cfg.head_dim
    pf = getattr(cfg, "partial_rotary_factor", 1.0)
    if pf < 1.0:  # chatglm rotates only the first half of the head dim
        dim = int(dim * pf)
    base = cfg.rope_theta
    inv = 1.0 / (base ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    sc = cfg.rope_scaling_dict()
    if not sc:
        return inv
    rt = sc.get("rope_type", sc.get("type", "default"))
    if rt in ("default", "none"):
        return inv
    if rt == "linear":
        return inv / float(sc["factor"])
    if rt == "llama3":
        # llama-3.1 frequency-band scaling (HF _compute_llama3_parameters;
        # reference kernel csrc/rope/rope.cu:633 apply_llama31_rope_inplace)
        factor = float(sc["factor"])
        lo = float(sc.get("low_freq_factor", 1.0))
        hi = float(sc.get("high_freq_factor", 4.0))
        old_ctx = float(sc.get("original_max_position_embeddings", 8192))
        wavelen = 2.0 * math.pi / inv
        low_wl = old_ctx / lo
        high_wl = old_ctx / hi
        smooth = (old_ctx / wavelen - lo) / (hi - lo)
        scaled = jnp.where(wavelen > low_wl, inv / factor, inv)
        mid = (1.0 - smooth) * inv / factor + smooth * inv
        is_mid = (wavelen <= low_wl) & (wavelen >= high_wl)
        return jnp.where(is_mid, mid, scaled)
    if rt == "yarn":
        # YaRN NTK-by-parts interpolation (flood/layers/rope.py:112-236)
        factor = float(sc["factor"])
        orig = float(sc.get("original_max_position_embeddings", 4096))
        beta_fast = float(sc.get("beta_fast", 32))
        beta_slow = float(sc.get("beta_slow", 1))

        def find_dim(num_rot):
            return (dim * math.log(orig / (num_rot * 2 * math.pi))) / (
                2 * math.log(base)
            )

        low = max(math.floor(find_dim(beta_fast)), 0)
        high = min(math.ceil(find_dim(beta_slow)), dim - 1)
        r = jnp.arange(dim // 2, dtype=jnp.float32)
        ramp = jnp.clip((r - low) / max(high - low, 0.001), 0.0, 1.0)
        inv_extr = inv
        inv_interp = inv / factor
        return inv_interp * ramp + inv_extr * (1.0 - ramp)
    raise ValueError(f"unsupported rope_type {rt!r}")


def yarn_mscale(cfg) -> float:
    """YaRN attention magnitude scale (flood/layers/rope.py:24-30)."""
    sc = cfg.rope_scaling_dict()
    if not sc:
        return 1.0
    rt = sc.get("rope_type", sc.get("type", "default"))
    if rt != "yarn":
        return 1.0
    factor = float(sc["factor"])
    mscale = float(sc.get("mscale", 1.0))
    if factor <= 1.0:
        return 1.0
    return 0.1 * mscale * math.log(factor) + 1.0


def rope_cos_sin(inv_freq: jax.Array, positions: jax.Array, mscale: float = 1.0):
    """cos/sin [..., dim/2] for integer positions [...]. fp32.

    ``mscale`` is the YaRN attention factor folded into cos/sin (HF
    multiplies attention_scaling into the embedding for dense models, so
    q·k picks up mscale^2)."""
    angles = positions.astype(jnp.float32)[..., None] * inv_freq
    cos, sin = jnp.cos(angles), jnp.sin(angles)
    if mscale != 1.0:
        cos, sin = cos * mscale, sin * mscale
    return cos, sin


def dense_cos_sin(cfg, positions: jax.Array):
    """cos/sin for the dense (non-MLA) attention path, with the YaRN
    attention factor applied (HF parity; the MLA path instead folds
    mscale^2 into its softmax scale — models/mla.py)."""
    return rope_cos_sin(rope_inv_freq(cfg), positions, yarn_mscale(cfg))


def apply_rope(
    x: jax.Array, cos: jax.Array, sin: jax.Array, interleaved: bool = False
) -> jax.Array:
    """Rotate ``x`` [..., H, D] with cos/sin [..., D/2] (broadcast over H).

    Default is neox/HF "rotate_half" layout (first half/second half pairs),
    matching HF Llama so greedy parity tests hold. ``interleaved=True`` is the
    GPT-J layout (reference supports both: csrc/rope/rope.cu full vs half
    rotation).
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    c = cos[..., None, :]  # broadcast over heads
    s = sin[..., None, :]
    if interleaved:
        x1 = xf[..., 0::2]
        x2 = xf[..., 1::2]
        o1 = x1 * c - x2 * s
        o2 = x2 * c + x1 * s
        out = jnp.stack([o1, o2], axis=-1).reshape(x.shape)
    else:
        half = x.shape[-1] // 2
        x1 = xf[..., :half]
        x2 = xf[..., half:]
        out = jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)
    return out.astype(dtype)


def apply_qk_rope(
    q: jax.Array,
    k: jax.Array,
    inv_freq: jax.Array,
    positions: jax.Array,
    q_norm: Optional[jax.Array] = None,
    k_norm: Optional[jax.Array] = None,
    eps: float = 1e-6,
):
    """(optional QK-RMSNorm) + rope for q [B,T,Hq,D] and k [B,T,Hk,D].

    The fused qk-norm+rope path mirrors flood/ops/rope.py:383
    ``triton_qk_norm_and_rope_forward`` (Qwen3); XLA fuses these elementwise
    stages on TPU without a custom kernel.
    """
    from painlessinferenceacceleration_tpu.ops.rmsnorm import rms_norm

    if q_norm is not None:
        q = rms_norm(q, q_norm, eps)
    if k_norm is not None:
        k = rms_norm(k, k_norm, eps)
    cos, sin = rope_cos_sin(inv_freq, positions)
    return apply_rope(q, cos, sin), apply_rope(k, cos, sin)
