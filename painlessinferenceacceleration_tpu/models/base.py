"""Generic dense decoder (llama / mistral / qwen2 / qwen3 class), functional.

Replaces the reference's per-model HF forks (lookahead/models/*/modeling_*.py
— whose only real delta is accepting a rank-4 tree-draft attention mask,
lookahead/README.md:273-299) and flood's codegen'd model classes
(flood/models/scaffold.py). Here the tree mask is native: every forward takes
``qmask`` (in-step visibility), so prefill / decode / lookahead-verify are one
code path.

TPU-first choices:
- layers are **stacked** (leading layer axis on every weight) and the forward
  runs ``lax.scan`` over them: one compile of one layer body, weights stream
  from HBM, KV pages update in place via dynamic-update-slice.
- qkv and gate/up are **merged** into single GEMMs (the reference patches
  models the same way at load: flood/facade/llm.py:309-316 flood_patch_func).
- all matmuls accumulate in fp32 (``preferred_element_type``), norms/rope in
  fp32 — the verify forward and the decode forward share these exact
  numerics, which is what makes lookahead lossless (SURVEY §7 hard part 4).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from painlessinferenceacceleration_tpu.config import ModelConfig
from painlessinferenceacceleration_tpu.engine.cache import write_kv_pages
from painlessinferenceacceleration_tpu.layers.linear import (
    QuantSpec,
    linear,
    linear_at,
    make_linear,
)
from painlessinferenceacceleration_tpu.ops.attention import paged_attention_ref
from painlessinferenceacceleration_tpu.ops.rmsnorm import rms_norm
from painlessinferenceacceleration_tpu.ops.rope import (
    apply_rope,
    rope_cos_sin,
    rope_inv_freq,
)


# ---------------------------------------------------------------------------
# Parameter construction
# ---------------------------------------------------------------------------


def _init_layer(cfg: ModelConfig, key, dtype, spec: Optional[QuantSpec]) -> dict:
    E = cfg.hidden_size
    H, Hk, D, I = (
        cfg.num_attention_heads,
        cfg.num_key_value_heads,
        cfg.head_dim,
        cfg.intermediate_size,
    )
    ks = jax.random.split(key, 4)
    std = 0.02

    def w(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * std).astype(dtype)

    p = {
        "input_ln": jnp.ones((E,), dtype),
        "post_ln": jnp.ones((E,), dtype),
        "wgu": make_linear(w(ks[2], (E, 2 * I)), spec),
        "wdown": make_linear(w(ks[3], (I, E)), spec),
    }
    if cfg.is_mla:
        from painlessinferenceacceleration_tpu.models.mla import init_mla_attn

        p.update(init_mla_attn(cfg, ks[0], dtype, spec))
        return p
    p["wqkv"] = make_linear(w(ks[0], (E, (H + 2 * Hk) * D)), spec)
    p["wo"] = make_linear(w(ks[1], (H * D, E)), spec)
    if cfg.attention_bias:
        p["bqkv"] = jnp.zeros(((H + 2 * Hk) * D,), dtype)
    if cfg.qk_norm:
        p["q_norm"] = jnp.ones((D,), dtype)
        p["k_norm"] = jnp.ones((D,), dtype)
    return p


def init_params(
    cfg: ModelConfig,
    key: jax.Array,
    dtype=jnp.bfloat16,
    quant: Optional[QuantSpec] = None,
) -> dict:
    """Random-init parameters with stacked layers.

    Used by tests (tiny fixture) and by bench.py (random 7B weights — perf is
    independent of weight values). MoE configs split layers into a dense
    prefix stack (< moe_layer_start) and an MoE stack — lax.scan needs
    homogeneous pytrees per stack (deepseek's first_k_dense_replace pattern).
    """
    kl, ke, kh = jax.random.split(key, 3)
    layer_keys = jax.random.split(kl, cfg.num_hidden_layers)
    dense_layers = []
    moe_layers = []
    for li, k in enumerate(layer_keys):
        lp = _init_layer(cfg, k, dtype, quant)
        if cfg.is_moe and li >= cfg.moe_layer_start:
            from painlessinferenceacceleration_tpu.models.moe import init_moe_layer

            # MoE layers drop the dense MLP weights
            lp.pop("wgu")
            lp.pop("wdown")
            lp.update(init_moe_layer(cfg, jax.random.fold_in(k, 1), dtype, quant))
            moe_layers.append(lp)
        else:
            dense_layers.append(lp)
    params = {
        "embed": (jax.random.normal(ke, (cfg.vocab_size, cfg.hidden_size)) * 0.02).astype(dtype),
        "final_ln": jnp.ones((cfg.hidden_size,), dtype),
    }
    if dense_layers:
        params["layers"] = jax.tree.map(lambda *xs: jnp.stack(xs), *dense_layers)
    if moe_layers:
        params["moe_layers"] = jax.tree.map(lambda *xs: jnp.stack(xs), *moe_layers)
    if not cfg.tie_word_embeddings:
        params["lm_head"] = make_linear(
            (jax.random.normal(kh, (cfg.hidden_size, cfg.vocab_size)) * 0.02).astype(
                dtype
            ),
            quant,
        )
    return params


def _rand_quant_leaf(key, din: int, dout: int, spec: QuantSpec, std: float = 0.02):
    """Directly sample a quantized linear leaf (bench path: a random 7B fp32
    tensor would not fit HBM just to be quantized and thrown away)."""
    kq, ks = jax.random.split(key)
    g = din // max(1, din // min(spec.group, din))
    groups = din // g
    if spec.bits == 8:
        q = jax.random.randint(kq, (din, dout), -127, 128, jnp.int8)
        scale = jnp.full((groups, dout), std / 127.0, jnp.float32)
    else:
        vals = jax.random.randint(kq, (din, dout), -8, 8, jnp.int8)
        lo = vals[0::2].astype(jnp.uint8) & 0xF
        hi = (vals[1::2].astype(jnp.uint8) & 0xF) << 4
        q = lo | hi
        scale = jnp.full((groups, dout), std / 7.0, jnp.float32)
    return {"q": q, "s": scale}


def init_params_quantized(
    cfg: ModelConfig, key: jax.Array, spec: QuantSpec, dtype=jnp.bfloat16
) -> dict:
    """Random-init with all big GEMM weights directly in quantized form."""
    E = cfg.hidden_size
    H, Hk, D, I = (
        cfg.num_attention_heads,
        cfg.num_key_value_heads,
        cfg.head_dim,
        cfg.intermediate_size,
    )
    n = cfg.num_hidden_layers
    keys = jax.random.split(key, 4 * n + 3)

    def stack(fn):
        return jax.tree.map(lambda *xs: jnp.stack(xs), *[fn(i) for i in range(n)])

    layers = {
        "input_ln": jnp.ones((n, E), dtype),
        "post_ln": jnp.ones((n, E), dtype),
        "wqkv": stack(lambda i: _rand_quant_leaf(keys[4 * i], E, (H + 2 * Hk) * D, spec)),
        "wo": stack(lambda i: _rand_quant_leaf(keys[4 * i + 1], H * D, E, spec)),
        "wgu": stack(lambda i: _rand_quant_leaf(keys[4 * i + 2], E, 2 * I, spec)),
        "wdown": stack(lambda i: _rand_quant_leaf(keys[4 * i + 3], I, E, spec)),
    }
    if cfg.qk_norm:
        layers["q_norm"] = jnp.ones((n, D), dtype)
        layers["k_norm"] = jnp.ones((n, D), dtype)
    params = {
        "embed": (jax.random.normal(keys[-1], (cfg.vocab_size, E)) * 0.02).astype(dtype),
        "layers": layers,
        "final_ln": jnp.ones((E,), dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = _rand_quant_leaf(keys[-2], E, cfg.vocab_size, spec)
    return params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def use_pallas_attention() -> bool:
    """Pallas paged attention on TPU; jnp gather path on CPU (oracle)."""
    return jax.default_backend() not in ("cpu", "gpu")


def _attn_block(
    lp: dict,
    cfg: ModelConfig,
    spec: Optional[QuantSpec],
    h: jax.Array,  # [B, Q, E]
    cos: jax.Array,  # [B, Q, D/2] fp32
    sin: jax.Array,
    kk: jax.Array,  # FULL stacked [L, Hk, n_pages, ps, D]
    vv: jax.Array,
    li: jax.Array,  # layer index (traced scalar)
    page_tables: jax.Array,
    start_lens: jax.Array,
    qmask: jax.Array,
    valid: Optional[jax.Array],
    kv_scales: Optional[Tuple[jax.Array, jax.Array]],
    attn_mask: Optional[jax.Array] = None,
):
    B, Q, E = h.shape
    H, Hk, D = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    qkv = linear(lp["wqkv"], h, spec, lp.get("bqkv"))
    xq = qkv[..., : H * D].reshape(B, Q, H, D)
    xk = qkv[..., H * D : (H + Hk) * D].reshape(B, Q, Hk, D)
    xv = qkv[..., (H + Hk) * D :].reshape(B, Q, Hk, D)
    if cfg.qk_norm:  # qwen3: per-head RMSNorm before rope (flood/ops/rope.py:383)
        xq = rms_norm(xq, lp["q_norm"], cfg.rms_norm_eps)
        xk = rms_norm(xk, lp["k_norm"], cfg.rms_norm_eps)
    xq = apply_rope(xq, cos, sin)
    xk = apply_rope(xk, cos, sin)

    k_scale = v_scale = None
    if kv_scales is not None:
        k_scale, v_scale = kv_scales
    kk, vv = write_kv_pages(
        kk, vv, xk, xv, page_tables, start_lens, valid, k_scale, v_scale,
        layer=li,
    )
    scale = D ** -0.5
    if use_pallas_attention() and kk.dtype != jnp.float8_e4m3fn:
        from painlessinferenceacceleration_tpu.ops.paged_attention import (
            paged_attention,
        )

        out = paged_attention(
            xq, kk, vv, page_tables, start_lens, qmask, scale, layer=li
        )
    else:
        out = paged_attention_ref(
            xq, kk[li], vv[li], page_tables, start_lens, qmask, scale,
            k_scale, v_scale, attn_mask,
        )
    out = linear(lp["wo"], out.reshape(B, Q, H * D), spec)
    return out, kk, vv


def _mlp_block(lp: dict, cfg: ModelConfig, spec, h: jax.Array) -> jax.Array:
    I = cfg.intermediate_size
    gu = linear(lp["wgu"], h, spec)
    gate, up = gu[..., :I], gu[..., I:]
    act = jax.nn.silu(gate.astype(jnp.float32)).astype(h.dtype) * up
    return linear(lp["wdown"], act, spec)


def _mlp_block_at(stack: dict, li, cfg: ModelConfig, spec, h: jax.Array):
    I = cfg.intermediate_size
    gu = linear_at(stack["wgu"], li, h, spec)
    gate, up = gu[..., :I], gu[..., I:]
    act = jax.nn.silu(gate.astype(jnp.float32)).astype(h.dtype) * up
    return linear_at(stack["wdown"], li, act, spec)


def _attn_block_at(
    stack: dict,
    li,
    cfg: ModelConfig,
    spec: Optional[QuantSpec],
    h: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
    kk: jax.Array,
    vv: jax.Array,
    page_tables: jax.Array,
    start_lens: jax.Array,
    qmask: jax.Array,
    valid: Optional[jax.Array],
    kv_scales,
    attn_mask=None,
):
    """_attn_block over stacked weights (no per-layer slice materialization
    for the quantized Pallas GEMMs)."""
    B, Q, E = h.shape
    H, Hk, D = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    qkv = linear_at(stack["wqkv"], li, h, spec, stack.get("bqkv"))
    xq = qkv[..., : H * D].reshape(B, Q, H, D)
    xk = qkv[..., H * D : (H + Hk) * D].reshape(B, Q, Hk, D)
    xv = qkv[..., (H + Hk) * D :].reshape(B, Q, Hk, D)
    if cfg.qk_norm:
        xq = rms_norm(xq, stack["q_norm"][li], cfg.rms_norm_eps)
        xk = rms_norm(xk, stack["k_norm"][li], cfg.rms_norm_eps)
    xq = apply_rope(xq, cos, sin)
    xk = apply_rope(xk, cos, sin)

    k_scale = v_scale = None
    if kv_scales is not None:
        k_scale, v_scale = kv_scales
    kk, vv = write_kv_pages(
        kk, vv, xk, xv, page_tables, start_lens, valid, k_scale, v_scale,
        layer=li,
    )
    scale = D ** -0.5
    if use_pallas_attention() and kk.dtype != jnp.float8_e4m3fn:
        from painlessinferenceacceleration_tpu.ops.paged_attention import (
            paged_attention,
        )

        out = paged_attention(
            xq, kk, vv, page_tables, start_lens, qmask, scale, layer=li
        )
    else:
        out = paged_attention_ref(
            xq, kk[li], vv[li], page_tables, start_lens, qmask, scale,
            k_scale, v_scale, attn_mask,
        )
    out = linear_at(stack["wo"], li, out.reshape(B, Q, H * D), spec)
    return out, kk, vv


def transformer_hidden(
    params: dict,
    cfg: ModelConfig,
    kv: dict,
    tokens: jax.Array,  # [B, Q] int32
    positions: jax.Array,  # [B, Q] int32
    page_tables: jax.Array,  # [B, P] int32
    start_lens: jax.Array,  # [B] int32 committed lengths (in-step writes begin here)
    qmask: jax.Array,  # [B, Q, Q] bool in-step visibility
    valid: Optional[jax.Array] = None,  # [B, Q] bool
    spec: Optional[QuantSpec] = None,
    slot_ids: Optional[jax.Array] = None,  # [B] engine slots (linear-attn state)
    embed_override=None,  # (local_pos [B, M], embeds [B, M, E]) mm splice
):
    """Run all decoder layers; returns (hidden [B,Q,E], updated kv).

    One function serves prefill (causal qmask), decode (Q=1) and
    lookahead-verify (tree qmask) — the reference needs three code paths for
    this (flood/utils/batch.py:174/382/484).
    """
    if cfg.linear_attention:
        from painlessinferenceacceleration_tpu.models.linear_attn import (
            hybrid_forward,
        )

        return hybrid_forward(
            params, cfg, kv, tokens, positions, page_tables, start_lens,
            qmask, valid, spec, slot_ids,
        )
    h = jnp.take(params["embed"], tokens, axis=0)
    if embed_override is not None:
        local, embeds = embed_override
        bidx = jnp.arange(h.shape[0], dtype=jnp.int32)[:, None]
        h = h.at[bidx, local].set(embeds.astype(h.dtype), mode="drop")
    inv_freq = rope_inv_freq(cfg)
    cos, sin = rope_cos_sin(inv_freq, positions)
    # hoist the [B, Q, L] visibility mask out of the layer scan — it is
    # layer-invariant (the reference rebuilds its rank-4 mask per step, once)
    from painlessinferenceacceleration_tpu.ops.attention import attention_mask

    L_view = page_tables.shape[1] * kv["k"].shape[2]  # P * page_size
    attn_mask = attention_mask(start_lens, qmask, L_view)

    def make_body(is_moe_stack: bool):
        def body(carry, xs):
            h, kk, vv = carry
            lp, li = xs
            hn = rms_norm(h, lp["input_ln"], cfg.rms_norm_eps)
            if cfg.is_mla:
                from painlessinferenceacceleration_tpu.models.mla import (
                    mla_attn_block,
                )

                attn_out, kk, vv = mla_attn_block(
                    lp, cfg, spec, hn, cos, sin, kk, vv, li, page_tables,
                    start_lens, qmask, valid, attn_mask,
                )
            else:
                layer_scales = None
                if "k_scale" in kv:
                    layer_scales = (kv["k_scale"][li], kv["v_scale"][li])
                attn_out, kk, vv = _attn_block(
                    lp, cfg, spec, hn, cos, sin, kk, vv, li, page_tables,
                    start_lens, qmask, valid, layer_scales, attn_mask,
                )
            h = h + attn_out
            hn = rms_norm(h, lp["post_ln"], cfg.rms_norm_eps)
            if is_moe_stack:
                from painlessinferenceacceleration_tpu.models.moe import moe_block

                h = h + moe_block(lp, cfg, spec, hn)
            else:
                h = h + _mlp_block(lp, cfg, spec, hn)
            return (h, kk, vv), None

        return body

    kk, vv = kv["k"], kv["v"]
    n_dense = 0
    if "layers" in params:
        n_dense = jax.tree.leaves(params["layers"])[0].shape[0]
        stack = params["layers"]

        def dense_body(carry, li):
            h, kk, vv = carry
            hn = rms_norm(h, stack["input_ln"][li], cfg.rms_norm_eps)
            layer_scales = None
            if "k_scale" in kv:
                layer_scales = (kv["k_scale"][li], kv["v_scale"][li])
            attn_out, kk, vv = _attn_block_at(
                stack, li, cfg, spec, hn, cos, sin, kk, vv, page_tables,
                start_lens, qmask, valid, layer_scales, attn_mask,
            )
            h = h + attn_out
            hn = rms_norm(h, stack["post_ln"][li], cfg.rms_norm_eps)
            h = h + _mlp_block_at(stack, li, cfg, spec, hn)
            return (h, kk, vv), None

        idx = jnp.arange(n_dense, dtype=jnp.int32)
        if cfg.is_mla:
            (h, kk, vv), _ = jax.lax.scan(
                make_body(False), (h, kk, vv), (params["layers"], idx)
            )
        else:
            (h, kk, vv), _ = jax.lax.scan(dense_body, (h, kk, vv), idx)
    if "moe_layers" in params:
        n_moe = jax.tree.leaves(params["moe_layers"])[0].shape[0]
        idx = n_dense + jnp.arange(n_moe, dtype=jnp.int32)
        (h, kk, vv), _ = jax.lax.scan(
            make_body(True), (h, kk, vv), (params["moe_layers"], idx)
        )
    new_kv = dict(kv)
    new_kv["k"] = kk
    new_kv["v"] = vv
    return h, new_kv


def logits_from_hidden(
    params: dict, cfg: ModelConfig, h: jax.Array, spec: Optional[QuantSpec] = None
) -> jax.Array:
    """Final norm + LM head; fp32 logits."""
    h = rms_norm(h, params["final_ln"], cfg.rms_norm_eps)
    head = params.get("lm_head")
    if head is None:  # tied embeddings
        return jnp.matmul(
            h, params["embed"].T.astype(h.dtype), preferred_element_type=jnp.float32
        )
    out = linear(head, h, spec)
    return out.astype(jnp.float32)
