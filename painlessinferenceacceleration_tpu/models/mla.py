"""Multi-head Latent Attention (DeepSeek V2/V3 family).

Reference: flood/ops/seg_mla.py (MLA attention on the fused latent+rope
cache), flood/utils/cache.py:90 (update_fusion_cache), flood model classes
modeling_deepseek*.py; router with sigmoid scoring + group-limited top-k
(csrc/moe/topk_softmax_kernels.cu, moe.py:580 grouped_topk).

Two cache modes (``ModelConfig.mla_latent_cache``):
- expanded (default): kv_b is applied at write time and full K/V rows are
  cached per head (K head dim = nope+rope with the rope part shared, V head
  dim = v_head_dim); reuses the paged arena and verify machinery unchanged.
- latent: cache only ``[latent | roped k_pe]`` once per token (the
  reference's fusion cache, flood/utils/cache.py:90) and run
  weight-absorbed MQA attention in latent space — bytes/token drop from
  ``H*(nope+rope+v_d)`` to ``(r+rope)+r`` (61440 -> 1088 for V3 shapes)
  and the paged-attention page DMA reads one head instead of H.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from painlessinferenceacceleration_tpu.config import ModelConfig
from painlessinferenceacceleration_tpu.engine.cache import write_kv_pages
from painlessinferenceacceleration_tpu.layers.linear import (
    QuantSpec,
    dequantize,
    linear,
    make_linear,
)
from painlessinferenceacceleration_tpu.ops.attention import paged_attention_ref
from painlessinferenceacceleration_tpu.ops.rmsnorm import rms_norm
from painlessinferenceacceleration_tpu.ops.rope import (
    apply_rope,
    rope_cos_sin,
    rope_inv_freq,
    yarn_mscale,
)


def mla_head_dims(cfg: ModelConfig) -> Tuple[int, int]:
    """(K head dim, V head dim) of the MLA cache.

    Expanded mode caches per-head K/V; latent mode caches one shared
    "head" holding the compressed latent: K = latent + roped k_pe,
    V = latent (the reference's fusion cache, flood/utils/cache.py:90).
    The latent K row is padded up to a 128-lane multiple (576 -> 640 at V3
    shapes) so Pallas page DMA stays lane-aligned on TPU; q is zero-padded
    to match, which leaves attention scores untouched."""
    if cfg.mla_latent_cache:
        dk = cfg.kv_lora_rank + cfg.qk_rope_head_dim
        return -(-dk // 128) * 128, cfg.kv_lora_rank
    return cfg.qk_nope_head_dim + cfg.qk_rope_head_dim, cfg.v_head_dim


def mla_cache_heads(cfg: ModelConfig) -> int:
    """KV heads held in the arena (1 in latent mode — MQA over the latent)."""
    return 1 if cfg.mla_latent_cache else cfg.num_attention_heads


def init_mla_attn(cfg: ModelConfig, key, dtype, spec: Optional[QuantSpec]) -> dict:
    E = cfg.hidden_size
    H = cfg.num_attention_heads
    nope, rope_d = cfg.qk_nope_head_dim, cfg.qk_rope_head_dim
    r = cfg.kv_lora_rank
    v_d = cfg.v_head_dim
    ks = jax.random.split(key, 5)
    std = 0.02

    def w(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * std).astype(dtype)

    p = {
        "kv_a": make_linear(w(ks[1], (E, r + rope_d)), spec),
        "kv_a_ln": jnp.ones((r,), dtype),
        "kv_b": make_linear(w(ks[2], (r, H * (nope + v_d))), spec),
        "wo": make_linear(w(ks[3], (H * v_d, E)), spec),
    }
    if cfg.q_lora_rank:
        p["q_a"] = make_linear(w(ks[0], (E, cfg.q_lora_rank)), spec)
        p["q_a_ln"] = jnp.ones((cfg.q_lora_rank,), dtype)
        p["q_b"] = make_linear(w(ks[4], (cfg.q_lora_rank, H * (nope + rope_d))), spec)
    else:
        p["wq"] = make_linear(w(ks[0], (E, H * (nope + rope_d))), spec)
    return p


def mla_attn_block(
    lp: dict,
    cfg: ModelConfig,
    spec: Optional[QuantSpec],
    h: jax.Array,  # [B, Q, E]
    cos: jax.Array,  # [B, Q, rope_d/2]
    sin: jax.Array,
    kk: jax.Array,  # [L, H, np, ps, Dk]
    vv: jax.Array,  # [L, H, np, ps, Dv]
    li: jax.Array,
    page_tables: jax.Array,
    start_lens: jax.Array,
    qmask: jax.Array,
    valid,
    attn_mask=None,
):
    B, Q, E = h.shape
    H = cfg.num_attention_heads
    nope, rope_d = cfg.qk_nope_head_dim, cfg.qk_rope_head_dim
    r = cfg.kv_lora_rank
    v_d = cfg.v_head_dim

    if "q_a" in lp:
        qa = rms_norm(linear(lp["q_a"], h, spec), lp["q_a_ln"], cfg.rms_norm_eps)
        q = linear(lp["q_b"], qa, spec)
    else:
        q = linear(lp["wq"], h, spec)
    q = q.reshape(B, Q, H, nope + rope_d)
    q_nope, q_pe = q[..., :nope], q[..., nope:]

    kva = linear(lp["kv_a"], h, spec)  # [B, Q, r + rope_d]
    c_kv = rms_norm(kva[..., :r], lp["kv_a_ln"], cfg.rms_norm_eps)
    k_pe = kva[..., r:][:, :, None, :]  # [B, Q, 1, rope_d] (shared across heads)

    # deepseek uses interleaved rotary pairing (HF rope_interleave=True)
    q_pe = apply_rope(q_pe, cos, sin, interleaved=True)
    k_pe = apply_rope(k_pe, cos, sin, interleaved=True)
    scale = (nope + rope_d) ** -0.5 * (yarn_mscale(cfg) ** 2)

    if cfg.mla_latent_cache:
        # Weight-absorbed latent attention (the reference's fusion-cache
        # decode, seg_mla.py): cache only [latent | roped k_pe] once per
        # token (MQA), fold W_uk into q and W_uv out of the attention
        # output. score = (q_nope W_uk) . c_kv + q_pe . k_pe is exactly the
        # expanded-path score by associativity.
        wkv = (
            dequantize(lp["kv_b"], spec, h.dtype)
            if isinstance(lp["kv_b"], dict) else lp["kv_b"]
        )
        wkv = wkv.reshape(r, H, nope + v_d)
        w_uk, w_uv = wkv[..., :nope], wkv[..., nope:]
        q_abs = jnp.einsum(
            "bqhn,rhn->bqhr", q_nope, w_uk.astype(q_nope.dtype),
            preferred_element_type=jnp.float32,
        ).astype(h.dtype)
        q_full = jnp.concatenate([q_abs, q_pe], axis=-1)  # [B,Q,H,r+rope_d]
        k_lat = jnp.concatenate([c_kv[:, :, None, :], k_pe], axis=-1)
        pad = mla_head_dims(cfg)[0] - (r + rope_d)
        if pad:  # lane-align the fused row for Pallas page DMA (see
            # mla_head_dims); zero q-lanes keep the scores exact
            zq = jnp.zeros(q_full.shape[:-1] + (pad,), q_full.dtype)
            zk = jnp.zeros(k_lat.shape[:-1] + (pad,), k_lat.dtype)
            q_full = jnp.concatenate([q_full, zq], axis=-1)
            k_lat = jnp.concatenate([k_lat, zk], axis=-1)
        v_lat = c_kv[:, :, None, :]
        kk, vv = write_kv_pages(
            kk, vv, k_lat, v_lat, page_tables, start_lens, valid, layer=li
        )
        from painlessinferenceacceleration_tpu.models.base import (
            use_pallas_attention,
            use_pallas_prefill,
        )

        # the kernel rebuilds visibility from start_lens+qmask itself, so the
        # precomputed attn_mask (ref-path convenience) is simply unused here.
        # Unlike the dense kernel, the MLA kernel row-tiles internally, so
        # prefill widths (Q > 128) only need the wide-window opt-in — the
        # qmask input makes it correct for any window, causal or tree
        if (
            use_pallas_attention(Q) or use_pallas_prefill(Q)
        ) and kk.dtype != jnp.float8_e4m3fn:
            # Pallas MQA over the fused [latent | k_pe] pages; V is the
            # latent slice of K so only the K arena is read (ops/mla_attention)
            from painlessinferenceacceleration_tpu.ops.mla_attention import (
                mla_paged_attention,
            )

            out = mla_paged_attention(
                q_full, kk, page_tables, start_lens, qmask, scale,
                v_dim=r, layer=li,
            )  # [B, Q, H, r]
        else:
            out = paged_attention_ref(
                q_full, kk[li], vv[li], page_tables, start_lens, qmask, scale,
                mask=attn_mask, v_dim=r,
            )  # [B, Q, H, r]
        out = jnp.einsum(
            "bqhr,rhv->bqhv", out, w_uv.astype(out.dtype),
            preferred_element_type=jnp.float32,
        ).astype(h.dtype)
    else:
        kvb = linear(lp["kv_b"], c_kv, spec).reshape(B, Q, H, nope + v_d)
        k_nope = kvb[..., :nope]
        v = kvb[..., nope:]
        k = jnp.concatenate(
            [k_nope, jnp.broadcast_to(k_pe, (B, Q, H, rope_d))], axis=-1
        )
        q_full = jnp.concatenate([q_nope, q_pe], axis=-1)
        kk, vv = write_kv_pages(
            kk, vv, k, v, page_tables, start_lens, valid, layer=li
        )
        out = paged_attention_ref(
            q_full, kk[li], vv[li], page_tables, start_lens, qmask, scale,
            mask=attn_mask, v_dim=v_d,
        )
    out = linear(lp["wo"], out.reshape(B, Q, H * v_d), spec)
    return out, kk, vv


def mla_rope_cos_sin(cfg: ModelConfig, positions: jax.Array):
    inv = rope_inv_freq(cfg)  # uses qk_rope_head_dim
    return rope_cos_sin(inv, positions)
