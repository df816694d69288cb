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
from painlessinferenceacceleration_tpu.ops.attention import (
    alibi_slopes,
    paged_attention_ref,
)
from painlessinferenceacceleration_tpu.ops.rmsnorm import layer_norm, rms_norm
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

    up_w = 2 * I if cfg.gated_mlp else I
    p = {
        "input_ln": jnp.ones((E,), dtype),
        "post_ln": jnp.ones((E,), dtype),
        "wgu": make_linear(w(ks[2], (E, up_w)), spec),
        "wdown": make_linear(w(ks[3], (I, E)), spec),
    }
    if cfg.norm_type == "layernorm":
        p["input_ln_b"] = jnp.zeros((E,), dtype)
        p["post_ln_b"] = jnp.zeros((E,), dtype)
    if cfg.mlp_bias:
        p["bgu"] = jnp.zeros((up_w,), dtype)
        p["bdown"] = jnp.zeros((E,), dtype)
    if cfg.attention_out_bias:
        p["bo"] = jnp.zeros((E,), dtype)
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
    if cfg.norm_type == "layernorm":
        params["final_ln_b"] = jnp.zeros((cfg.hidden_size,), dtype)
    if cfg.position_embedding_type in ("learned", "glm_2d"):
        params["pos_embed"] = (
            jax.random.normal(
                jax.random.fold_in(ke, 7),
                (cfg.max_position_embeddings, cfg.hidden_size),
            )
            * 0.02
        ).astype(dtype)
    if cfg.position_embedding_type == "glm_2d":  # AntGLM block positions
        params["block_pos_embed"] = (
            jax.random.normal(
                jax.random.fold_in(ke, 8),
                (cfg.max_position_embeddings, cfg.hidden_size),
            )
            * 0.02
        ).astype(dtype)
    if cfg.embed_layernorm:
        params["embed_ln"] = jnp.ones((cfg.hidden_size,), dtype)
        params["embed_ln_b"] = jnp.zeros((cfg.hidden_size,), dtype)
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
    if spec.block:
        B = spec.block
        q = jax.random.normal(kq, (din, dout), jnp.float32).astype(
            jnp.float8_e4m3fn
        )
        scale = jnp.full((din // B, dout // B), std / 448.0, jnp.float32)
        return {"q": q, "s": scale}
    if spec.act is not None:
        if spec.wfmt == "fp8":
            q = jax.random.normal(kq, (din, dout), jnp.float32).astype(
                jnp.float8_e4m3fn
            )
            scale = jnp.full((dout,), std / 448.0, jnp.float32)
        else:
            q = jax.random.randint(kq, (din, dout), -127, 128, jnp.int8)
            scale = jnp.full((dout,), std / 127.0, jnp.float32)
        p = {"q": q, "s": scale}
        if spec.act == "static":
            p["xs"] = jnp.float32(1.0)
        return p
    # grouped weight-only scales are stored bf16 (matches quantize() /
    # _group_scales — the bench pytree must share the real checkpoints'
    # jit signature and kernel path)
    if spec.bits == 8:
        q = jax.random.randint(kq, (din, dout), -127, 128, jnp.int8)
        scale = jnp.full((groups, dout), std / 127.0, jnp.bfloat16)
    else:
        vals = jax.random.randint(kq, (din, dout), -8, 8, jnp.int8)
        lo = vals[0::2].astype(jnp.uint8) & 0xF
        hi = (vals[1::2].astype(jnp.uint8) & 0xF) << 4
        q = lo | hi
        scale = jnp.full((groups, dout), std / 7.0, jnp.bfloat16)
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


def use_pallas_attention(q_width: int = 1) -> bool:
    """Pallas paged attention on TPU for decode/verify widths; prefill
    chunks (large Q) use the XLA path — the kernel keeps per-row softmax
    state in VMEM, which is sized for Q <= 128, and prefill is
    compute-bound where XLA's fused attention is already good."""
    return jax.default_backend() not in ("cpu", "gpu") and q_width <= 128


def use_pallas_prefill(q_width: int) -> bool:
    """Query-tiled CAUSAL chunk-attention kernel for prefill widths
    (ops/paged_attention.py paged_attention_prefill): the XLA fallback
    materializes [B, H, Q, L] scores in HBM, which dominates prefill
    attention at long context. On by default on TPU — validated on v5e
    (benchmarks/validate_gated_kernels_r3.log: rel-err 3.4e-3 vs the jnp
    oracle, 18.1x over the XLA path at Q=512/ctx=1536). Kill-switch:
    PIA_PREFILL_KERNEL=0."""
    import os

    return (
        jax.default_backend() not in ("cpu", "gpu")
        and q_width > 128
        and os.environ.get("PIA_PREFILL_KERNEL", "1") != "0"
    )


def use_pallas_fp8_kv() -> bool:
    """Decode/verify attention kernels directly over the e4m3 KV arena
    (SWAR dequant in VMEM; half the page DMA vs bf16, and no whole-context
    dequant in HBM like the XLA fallback). On by default on TPU —
    validated on v5e (benchmarks/validate_gated_kernels_r3.log: rel-err
    6.2e-3, 0.93x bf16-arena latency at half the HBM footprint).
    Kill-switch: PIA_FP8_KV_ATTN=0."""
    import os

    return (
        jax.default_backend() not in ("cpu", "gpu")
        and os.environ.get("PIA_FP8_KV_ATTN", "1") != "0"
    )


def _norm(cfg: ModelConfig, x: jax.Array, w: jax.Array, b=None) -> jax.Array:
    if cfg.norm_type == "layernorm":
        return layer_norm(x, w, b, cfg.rms_norm_eps)
    return rms_norm(x, w, cfg.rms_norm_eps)


def _activate(x: jax.Array, act: str) -> jax.Array:
    xf = x.astype(jnp.float32)
    if act in ("gelu_new", "gelu_pytorch_tanh", "gelu_fast"):
        y = jax.nn.gelu(xf, approximate=True)
    elif act == "gelu":
        y = jax.nn.gelu(xf, approximate=False)
    elif act in ("silu", "swish"):
        y = jax.nn.silu(xf)
    elif act == "relu":
        y = jax.nn.relu(xf)
    else:
        raise ValueError(f"unsupported hidden_act {act!r}")
    return y.astype(x.dtype)


def _apply_positional(cfg: ModelConfig, xq, xk, cos, sin):
    """Rope (full / partial / interleaved) or pass-through (learned/alibi)."""
    if cfg.position_embedding_type != "rope":
        return xq, xk
    il = cfg.rope_interleaved
    rot = cos.shape[-1] * 2
    if rot < xq.shape[-1]:  # chatglm: rotate first half, pass the rest
        q_r = apply_rope(xq[..., :rot], cos, sin, il)
        k_r = apply_rope(xk[..., :rot], cos, sin, il)
        xq = jnp.concatenate([q_r, xq[..., rot:].astype(q_r.dtype)], axis=-1)
        xk = jnp.concatenate([k_r, xk[..., rot:].astype(k_r.dtype)], axis=-1)
        return xq, xk
    return apply_rope(xq, cos, sin, il), apply_rope(xk, cos, sin, il)


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
    alibi: Optional[jax.Array] = None,
    causal_window: bool = False,  # prefill: qmask is pure lower-triangular
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
    xq, xk = _apply_positional(cfg, xq, xk, cos, sin)

    k_scale = v_scale = None
    if kv_scales is not None:
        k_scale, v_scale = kv_scales
    kk, vv = write_kv_pages(
        kk, vv, xk, xv, page_tables, start_lens, valid, k_scale, v_scale,
        layer=li,
    )
    scale = D ** -0.5
    fp8_kv = kk.dtype == jnp.float8_e4m3fn
    cp_mesh = None
    if (cfg.context_parallel and alibi is None and attn_mask is None
            and not fp8_kv):
        from painlessinferenceacceleration_tpu.ops.cp_attention import (
            ambient_cp_mesh,
        )

        cp_mesh = ambient_cp_mesh()
    if cp_mesh is not None:
        # context parallelism: pages sharded over 'model', partial-softmax
        # merge across shards (EngineConfig.context_parallel via DistLLM)
        from painlessinferenceacceleration_tpu.ops.cp_attention import (
            cp_paged_attention_stacked,
        )

        out = cp_paged_attention_stacked(
            xq, kk, vv, li, page_tables, start_lens, qmask, scale
        )
    elif (
        use_pallas_attention(Q)
        and (not fp8_kv or use_pallas_fp8_kv())
        and alibi is None
    ):
        from painlessinferenceacceleration_tpu.ops.paged_attention import (
            paged_attention,
        )

        out = paged_attention(
            xq, kk, vv, page_tables, start_lens, qmask, scale, layer=li,
            kv_scales=(k_scale, v_scale) if fp8_kv else None,
        )
    elif (
        causal_window
        and use_pallas_prefill(Q)
        and kk.dtype != jnp.float8_e4m3fn
        and alibi is None
    ):
        from painlessinferenceacceleration_tpu.ops.paged_attention import (
            paged_attention_prefill,
        )

        out = paged_attention_prefill(
            xq, kk, vv, page_tables, start_lens, scale, layer=li
        )
    else:
        out = paged_attention_ref(
            xq, kk[li], vv[li], page_tables, start_lens, qmask, scale,
            k_scale, v_scale, attn_mask, alibi=alibi,
        )
    out = linear(lp["wo"], out.reshape(B, Q, H * D), spec, lp.get("bo"))
    return out, kk, vv


def _mlp_block(lp: dict, cfg: ModelConfig, spec, h: jax.Array) -> jax.Array:
    gu = linear(lp["wgu"], h, spec, lp.get("bgu"))
    if not cfg.gated_mlp:  # gpt2/bloom: up -> act -> down
        act = _activate(gu, cfg.hidden_act)
    else:
        I = cfg.intermediate_size
        gate, up = gu[..., :I], gu[..., I:]
        act = _activate(gate, cfg.hidden_act) * up
    return linear(lp["wdown"], act, spec, lp.get("bdown"))


def _mlp_block_at(stack: dict, li, cfg: ModelConfig, spec, h: jax.Array):
    bgu = stack["bgu"] if "bgu" in stack else None
    gu = linear_at(stack["wgu"], li, h, spec, bgu)
    if not cfg.gated_mlp:
        act = _activate(gu, cfg.hidden_act)
    else:
        I = cfg.intermediate_size
        gate, up = gu[..., :I], gu[..., I:]
        act = _activate(gate, cfg.hidden_act) * up
    bdown = stack["bdown"] if "bdown" in stack else None
    return linear_at(stack["wdown"], li, act, spec, bdown)


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
    alibi=None,
    causal_window: bool = False,
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
    xq, xk = _apply_positional(cfg, xq, xk, cos, sin)

    scale = D ** -0.5
    tok_mode = (
        isinstance(kv_scales, tuple) and len(kv_scales) == 3
        and kv_scales[0] == "tok"
    )
    if tok_mode:  # dynamic per-token fp8 (scale arenas ride the scan carry)
        _, kts, vts = kv_scales
        kk, vv, kts, vts = write_kv_pages(
            kk, vv, xk, xv, page_tables, start_lens, valid, layer=li,
            k_tok_scale=kts, v_tok_scale=vts,
        )
        if (Q == 1 and use_pallas_attention(1) and use_pallas_fp8_kv()
                and alibi is None):
            # NB: attn_mask here is the hoisted layer-invariant [B, Q, L]
            # convenience mask for the jnp path; the Pallas kernels derive
            # visibility from ctx_lens themselves (same as the static-fp8
            # dispatch below)
            # Pallas decode over the e4m3 arena with per-token scale DMA
            # (ops/paged_attention.py paged_attention_tok); verify/prefill
            # widths keep the jnp path
            from painlessinferenceacceleration_tpu.ops.paged_attention import (
                paged_attention_tok,
            )

            out = paged_attention_tok(
                xq, kk, vv, kts, vts, page_tables, start_lens, scale,
                layer=li,
            )
        else:
            out = paged_attention_ref(
                xq, kk[li], vv[li], page_tables, start_lens, qmask, scale,
                kts[li], vts[li], attn_mask, alibi=alibi,
            )
    else:
        k_scale = v_scale = None
        if kv_scales is not None:
            k_scale, v_scale = kv_scales
        kk, vv = write_kv_pages(
            kk, vv, xk, xv, page_tables, start_lens, valid, k_scale, v_scale,
            layer=li,
        )
        fp8_kv = kk.dtype == jnp.float8_e4m3fn
        cp_mesh = None
        if (cfg.context_parallel and alibi is None and attn_mask is None
                and not fp8_kv):
            from painlessinferenceacceleration_tpu.ops.cp_attention import (
                ambient_cp_mesh,
            )

            cp_mesh = ambient_cp_mesh()
        if cp_mesh is not None:
            from painlessinferenceacceleration_tpu.ops.cp_attention import (
                cp_paged_attention_stacked,
            )

            out = cp_paged_attention_stacked(
                xq, kk, vv, li, page_tables, start_lens, qmask, scale
            )
        elif (
            use_pallas_attention(Q)
            and (not fp8_kv or use_pallas_fp8_kv())
            and alibi is None
        ):
            from painlessinferenceacceleration_tpu.ops.paged_attention import (
                paged_attention,
            )

            out = paged_attention(
                xq, kk, vv, page_tables, start_lens, qmask, scale, layer=li,
                kv_scales=(k_scale, v_scale) if fp8_kv else None,
            )
        elif (
            causal_window
            and use_pallas_prefill(Q)
            and kk.dtype != jnp.float8_e4m3fn
            and alibi is None
        ):
            from painlessinferenceacceleration_tpu.ops.paged_attention import (
                paged_attention_prefill,
            )

            out = paged_attention_prefill(
                xq, kk, vv, page_tables, start_lens, scale, layer=li
            )
        else:
            out = paged_attention_ref(
                xq, kk[li], vv[li], page_tables, start_lens, qmask, scale,
                k_scale, v_scale, attn_mask, alibi=alibi,
            )
    bo = stack["bo"] if "bo" in stack else None
    out = linear_at(stack["wo"], li, out.reshape(B, Q, H * D), spec)
    if bo is not None:
        out = out + bo[li].astype(out.dtype)
    if tok_mode:
        return out, kk, vv, kts, vts
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
    defer_state: bool = False,  # linear-attn spec verify: stash window feats
    causal_window: bool = False,  # prefill: qmask is pure lower-triangular
    glm_ids: Optional[jax.Array] = None,  # [B, 2] (prompt_len_eff, mask_pos)
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
            qmask, valid, spec, slot_ids, defer_state, causal_window,
        )
    # misconfiguration guard: hybrid params with cfg.linear_attention unset
    # would silently skip every layer below (neither "layers" nor
    # "moe_layers" exists) and serve embeddings-only logits
    assert "hybrid_layers" not in params, (
        "params contain hybrid_layers but cfg.linear_attention is False"
    )
    from painlessinferenceacceleration_tpu.layers.embedding import embed_lookup

    h = embed_lookup(params["embed"], tokens, params["final_ln"].dtype)
    if embed_override is not None:
        local, embeds = embed_override
        bidx = jnp.arange(h.shape[0], dtype=jnp.int32)[:, None]
        h = h.at[bidx, local].set(embeds.astype(h.dtype), mode="drop")
    if cfg.position_embedding_type == "learned":  # gpt2 family
        h = h + jnp.take(params["pos_embed"], positions, axis=0).astype(h.dtype)
    elif cfg.position_embedding_type == "glm_2d":
        # AntGLM 2D positions (modeling_glm.py:300-304 + the tokenizer's
        # build_inputs_for_generation, tokenization_glm.py:277-310): prompt
        # tokens carry (item=p, block=0); the <sop> and every generated
        # token carry (item=mask_pos, block=p - prompt_len_eff + 1). Both
        # learned tables add to the word embedding.
        assert glm_ids is not None, "glm_2d positions need glm_ids [B, 2]"
        p_eff = glm_ids[:, :1]
        mpos = glm_ids[:, 1:]
        in_prompt = positions < p_eff
        cap = params["pos_embed"].shape[0] - 1
        item = jnp.clip(jnp.where(in_prompt, positions, mpos), 0, cap)
        block = jnp.clip(
            jnp.where(in_prompt, 0, positions - p_eff + 1), 0, cap
        )
        h = h + jnp.take(params["pos_embed"], item, axis=0).astype(h.dtype)
        h = h + jnp.take(
            params["block_pos_embed"], block, axis=0
        ).astype(h.dtype)
    if cfg.embed_layernorm:  # bloom word_embeddings_layernorm
        h = layer_norm(h, params["embed_ln"], params["embed_ln_b"], cfg.rms_norm_eps)
    alibi = (
        alibi_slopes(cfg.num_attention_heads)
        if cfg.position_embedding_type == "alibi"
        else None
    )
    inv_freq = rope_inv_freq(cfg)
    # YaRN attention factor rides on cos/sin for dense models (HF parity);
    # the MLA path applies mscale^2 in its softmax scale instead (mla.py)
    from painlessinferenceacceleration_tpu.ops.rope import yarn_mscale

    cos, sin = rope_cos_sin(
        inv_freq, positions, 1.0 if cfg.is_mla else yarn_mscale(cfg)
    )
    # hoist the [B, Q, L] visibility mask out of the layer scan — it is
    # layer-invariant (the reference rebuilds its rank-4 mask per step, once)
    from painlessinferenceacceleration_tpu.ops.attention import attention_mask

    L_view = page_tables.shape[1] * kv["k"].shape[2]  # P * page_size
    attn_mask = attention_mask(start_lens, qmask, L_view)

    def make_body(is_moe_stack: bool):
        def body(carry, xs):
            h, kk, vv = carry
            lp, li = xs
            hn = _norm(cfg, h, lp["input_ln"], lp.get("input_ln_b"))
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
                    start_lens, qmask, valid, layer_scales, attn_mask, alibi,
                    causal_window,
                )
            h = h + attn_out
            hn = _norm(cfg, h, lp["post_ln"], lp.get("post_ln_b"))
            if is_moe_stack:
                from painlessinferenceacceleration_tpu.models.moe import moe_block

                h = h + moe_block(lp, cfg, spec, hn)
            else:
                h = h + _mlp_block(lp, cfg, spec, hn)
            return (h, kk, vv), None

        return body

    kk, vv = kv["k"], kv["v"]
    n_dense = 0
    tok_mode = "k_tok_scale" in kv  # dynamic per-token fp8 (dense stack only)
    assert not (tok_mode and ("moe_layers" in params or cfg.is_mla)), (
        "kv_quant='fp8_tok' supports the dense stacked-layer family only"
    )
    kts = kv.get("k_tok_scale")
    vts = kv.get("v_tok_scale")
    if "layers" in params:
        n_dense = jax.tree.leaves(params["layers"])[0].shape[0]
        stack = params["layers"]

        def dense_body(carry, li):
            if tok_mode:
                h, kk, vv, kts, vts = carry
            else:
                h, kk, vv = carry
            iln_b = stack["input_ln_b"][li] if "input_ln_b" in stack else None
            hn = _norm(cfg, h, stack["input_ln"][li], iln_b)
            if tok_mode:
                layer_scales = ("tok", kts, vts)
            elif "k_scale" in kv:
                layer_scales = (kv["k_scale"][li], kv["v_scale"][li])
            else:
                layer_scales = None
            res = _attn_block_at(
                stack, li, cfg, spec, hn, cos, sin, kk, vv, page_tables,
                start_lens, qmask, valid, layer_scales, attn_mask, alibi,
                causal_window,
            )
            if tok_mode:
                attn_out, kk, vv, kts2, vts2 = res
            else:
                attn_out, kk, vv = res
            if cfg.parallel_residual:  # gptj: one LN feeds attn AND mlp
                h = h + attn_out + _mlp_block_at(stack, li, cfg, spec, hn)
            else:
                h = h + attn_out
                pln_b = stack["post_ln_b"][li] if "post_ln_b" in stack else None
                hn = _norm(cfg, h, stack["post_ln"][li], pln_b)
                h = h + _mlp_block_at(stack, li, cfg, spec, hn)
            if tok_mode:
                return (h, kk, vv, kts2, vts2), None
            return (h, kk, vv), None

        idx = jnp.arange(n_dense, dtype=jnp.int32)
        if cfg.is_mla:
            (h, kk, vv), _ = jax.lax.scan(
                make_body(False), (h, kk, vv), (params["layers"], idx)
            )
        elif tok_mode:
            (h, kk, vv, kts, vts), _ = jax.lax.scan(
                dense_body, (h, kk, vv, kts, vts), idx
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
    if tok_mode:
        new_kv["k_tok_scale"] = kts
        new_kv["v_tok_scale"] = vts
    return h, new_kv


def logits_from_hidden(
    params: dict, cfg: ModelConfig, h: jax.Array, spec: Optional[QuantSpec] = None
) -> jax.Array:
    """Final norm + LM head; fp32 logits straight from the accumulator.

    The LM-head GEMM requests out_dtype=fp32 so logits are never rounded
    through bf16: a bf16 ulp at logit scale (~0.06 at |l|~10) is an order
    of magnitude wider than the cross-batch-width numerical noise, so
    rounding multiplies greedy argmax tie flips between the AR (Q=1) and
    verify (Q=1+R*L) programs (SURVEY §7 hard-part-4; reference exact
    greedy walk pretrained_model.py:827-860)."""
    h = _norm(cfg, h, params["final_ln"], params.get("final_ln_b"))
    head = params.get("lm_head")
    if head is None:  # tied embeddings
        from painlessinferenceacceleration_tpu.layers.embedding import embed_logits

        return embed_logits(params["embed"], h)
    out = linear(head, h, spec, params.get("lm_head_b"),
                 out_dtype=jnp.float32)  # gptj lm_head bias
    return out.astype(jnp.float32)
