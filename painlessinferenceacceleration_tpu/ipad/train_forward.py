"""Training-time forward pass (no KV cache, full-sequence causal attention).

The serving forward (models/base.py) is built around the paged KV arena;
training wants clean gradients and full-sequence logits, so this module
reimplements the same parameter structure as a straight causal transformer.
Mirrors what the reference's forked training modeling files do
(ipad/models/*/modeling_*.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from painlessinferenceacceleration_tpu.config import ModelConfig
from painlessinferenceacceleration_tpu.ops.rmsnorm import rms_norm
from painlessinferenceacceleration_tpu.ops.rope import (
    apply_rope,
    rope_cos_sin,
    rope_inv_freq,
)


def _linear(w, x):
    return jnp.matmul(x, w.astype(x.dtype), preferred_element_type=jnp.float32).astype(
        x.dtype
    )


def _masked_rms_norm(x, w, eps, dim_mask=None):
    """RMSNorm whose mean runs over KEPT dims only when a hidden-dim mask is
    present — this makes the masked model numerically IDENTICAL to the
    reparam'd (sliced) model, so training sees exactly what serving gets
    (the reference's dim mode approximates this; distill_worker.py:243-342)."""
    if dim_mask is None:
        return rms_norm(x, w, eps)
    xf = x.astype(jnp.float32) * dim_mask
    n = jnp.maximum(jnp.sum(dim_mask), 1.0)
    var = jnp.sum(xf * xf, axis=-1, keepdims=True) / n
    return (xf * jax.lax.rsqrt(var + eps) * w).astype(x.dtype)


def forward_logits(
    params: dict,
    cfg: ModelConfig,
    tokens: jax.Array,  # [B, T]
    masks: Optional[dict] = None,  # channel masks (ipad/sparse.py layout)
    return_hidden: bool = False,
) -> jax.Array:
    """Full-sequence causal logits [B, T, V] (fp32). ``masks`` multiplies
    gates into the mlp intermediate and attention-head channels (the
    reference's SparseMLP/SparseAttn behavior, sparse_module.py:205-1507);
    an optional ``dim`` mask prunes the hidden/residual width (the
    reference's dim mode, distill_worker.py:243-342). With
    ``return_hidden`` also returns the final normed hidden state (for
    hidden-state distill losses, _calc_loss :583)."""
    B, T = tokens.shape
    E = cfg.hidden_size
    H, Hk, D, I = (
        cfg.num_attention_heads,
        cfg.num_key_value_heads,
        cfg.head_dim,
        cfg.intermediate_size,
    )
    dim_mask = None
    if masks is not None and "dim" in masks:
        dim_mask = masks["dim"].astype(jnp.float32)  # [E]
    h = jnp.take(params["embed"], tokens, axis=0)
    if dim_mask is not None:
        h = h * dim_mask.astype(h.dtype)
    inv = rope_inv_freq(cfg)
    pos = jnp.tile(jnp.arange(T, dtype=jnp.int32)[None], (B, 1))
    cos, sin = rope_cos_sin(inv, pos)
    causal = jnp.tril(jnp.ones((T, T), bool))

    def layer(h, lp, li):
        hn = _masked_rms_norm(h, lp["input_ln"], cfg.rms_norm_eps, dim_mask)
        qkv = _linear(lp["wqkv"], hn)
        xq = qkv[..., : H * D].reshape(B, T, H, D)
        xk = qkv[..., H * D : (H + Hk) * D].reshape(B, T, Hk, D)
        xv = qkv[..., (H + Hk) * D :].reshape(B, T, Hk, D)
        if cfg.qk_norm:
            xq = rms_norm(xq, lp["q_norm"], cfg.rms_norm_eps)
            xk = rms_norm(xk, lp["k_norm"], cfg.rms_norm_eps)
        xq = apply_rope(xq, cos, sin)
        xk = apply_rope(xk, cos, sin)
        G = H // Hk
        qg = xq.transpose(0, 2, 1, 3).reshape(B, Hk, G * T, D)
        kc = xk.transpose(0, 2, 1, 3)
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", qg, kc, preferred_element_type=jnp.float32
        ) * (D ** -0.5)
        scores = scores.reshape(B, Hk, G, T, T)
        scores = jnp.where(causal[None, None, None], scores, -1e30)
        p = jax.nn.softmax(scores, axis=-1).astype(h.dtype)
        vc = xv.transpose(0, 2, 1, 3)
        att = jnp.einsum(
            "bhgqk,bhkd->bhgqd", p, vc, preferred_element_type=jnp.float32
        ).astype(h.dtype)
        att = att.transpose(0, 3, 1, 2, 4)  # [B, T, Hk, G, D]
        if masks is not None and "head" in masks:
            # mask the head's OUTPUT contribution (zeroing q would leave a
            # uniform-softmax V mix, not a pruned head)
            att = att * masks["head"][li].reshape(Hk, G)[None, None, :, :, None]
        att = att.reshape(B, T, H * D)
        lm = masks["layer"][li] if masks is not None and "layer" in masks else 1.0
        dout = _linear(lp["wo"], att)
        if dim_mask is not None:
            dout = dout * dim_mask.astype(h.dtype)
        h = h + lm * dout
        hn = _masked_rms_norm(h, lp["post_ln"], cfg.rms_norm_eps, dim_mask)
        gu = _linear(lp["wgu"], hn)
        gate, up = gu[..., :I], gu[..., I:]
        act = jax.nn.silu(gate.astype(jnp.float32)).astype(h.dtype) * up
        if masks is not None and "mlp" in masks:
            act = act * masks["mlp"][li][None, None, :]
        mout = _linear(lp["wdown"], act)
        if dim_mask is not None:
            mout = mout * dim_mask.astype(h.dtype)
        h = h + lm * mout
        return h

    def body(h, xs):
        lp, li = xs
        return layer(h, lp, li), None

    idx = jnp.arange(cfg.num_hidden_layers, dtype=jnp.int32)
    h, _ = jax.lax.scan(body, h, (params["layers"], idx))
    h = _masked_rms_norm(h, params["final_ln"], cfg.rms_norm_eps, dim_mask)
    head = params.get("lm_head")
    if head is None:
        head = params["embed"].T
    logits = jnp.matmul(h, head.astype(h.dtype), preferred_element_type=jnp.float32)
    if return_hidden:
        return logits, h
    return logits
