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


def forward_logits(
    params: dict,
    cfg: ModelConfig,
    tokens: jax.Array,  # [B, T]
    masks: Optional[dict] = None,  # channel masks (ipad/sparse.py layout)
) -> jax.Array:
    """Full-sequence causal logits [B, T, V] (fp32). ``masks`` multiplies
    gates into the mlp intermediate and attention-head channels (the
    reference's SparseMLP/SparseAttn behavior, sparse_module.py:205-1507)."""
    B, T = tokens.shape
    E = cfg.hidden_size
    H, Hk, D, I = (
        cfg.num_attention_heads,
        cfg.num_key_value_heads,
        cfg.head_dim,
        cfg.intermediate_size,
    )
    h = jnp.take(params["embed"], tokens, axis=0)
    inv = rope_inv_freq(cfg)
    pos = jnp.tile(jnp.arange(T, dtype=jnp.int32)[None], (B, 1))
    cos, sin = rope_cos_sin(inv, pos)
    causal = jnp.tril(jnp.ones((T, T), bool))

    def layer(h, lp, li):
        hn = rms_norm(h, lp["input_ln"], cfg.rms_norm_eps)
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
        h = h + lm * _linear(lp["wo"], att)
        hn = rms_norm(h, lp["post_ln"], cfg.rms_norm_eps)
        gu = _linear(lp["wgu"], hn)
        gate, up = gu[..., :I], gu[..., I:]
        act = jax.nn.silu(gate.astype(jnp.float32)).astype(h.dtype) * up
        if masks is not None and "mlp" in masks:
            act = act * masks["mlp"][li][None, None, :]
        h = h + lm * _linear(lp["wdown"], act)
        return h

    def body(h, xs):
        lp, li = xs
        return layer(h, lp, li), None

    idx = jnp.arange(cfg.num_hidden_layers, dtype=jnp.int32)
    h, _ = jax.lax.scan(body, h, (params["layers"], idx))
    h = rms_norm(h, params["final_ln"], cfg.rms_norm_eps)
    head = params.get("lm_head")
    if head is None:
        head = params["embed"].T
    return jnp.matmul(h, head.astype(h.dtype), preferred_element_type=jnp.float32)
