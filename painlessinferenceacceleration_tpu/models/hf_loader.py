"""HF checkpoint -> stacked JAX params.

Reference loads HF checkpoints via transformers.from_pretrained with a
per-stage device_map and then patches modules (flood/facade/llm.py:292-349
load_model + flood_patch_func: QKV and gate/up merging, dtype retyping).
TPU equivalent: read safetensors directly into numpy, merge QKV / gate-up,
transpose to [in, out], optionally quantize shard-by-shard (so the bf16
weight never fully materializes in HBM), and stack layers for lax.scan.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from painlessinferenceacceleration_tpu.config import ModelConfig
from painlessinferenceacceleration_tpu.layers.linear import QuantSpec, make_linear


def _np(t) -> np.ndarray:
    """torch tensor / np array -> np float32 array."""
    if isinstance(t, np.ndarray):
        return t
    import torch

    if t.dtype == torch.bfloat16:
        t = t.float()
    if t.dtype == getattr(torch, "float8_e4m3fn", None):
        import ml_dtypes

        return (
            t.view(torch.uint8).cpu().numpy().view(ml_dtypes.float8_e4m3fn)
        )
    return t.detach().cpu().numpy()


def quant_from_hf_config(conf: dict) -> Optional[QuantSpec]:
    """QuantSpec for a PRE-quantized checkpoint's quantization_config
    (reference AutoLinear.quant_type dispatch, flood linear.py:135-196):
    fp8 with weight_block_size [128, 128] -> the DeepSeek-V3 block format.
    Returns None when the checkpoint is unquantized/unknown."""
    qc = conf.get("quantization_config") or {}
    if qc.get("quant_method") == "fp8":
        bs = qc.get("weight_block_size") or [128, 128]
        if list(bs) == [128, 128]:
            return QuantSpec.from_mode("fp8_block")
    return None


def _is_fp8(a) -> bool:
    return getattr(a, "dtype", None) is not None and "float8" in str(a.dtype)


def _prequant_leaf(sd: Dict, key: str):
    """{"q","s"} leaf straight from a pre-quantized fp8-block checkpoint:
    weight [N, K] e4m3 + weight_scale_inv [N/128, K/128] f32 transpose to
    our [K, N] / [kb, nb] layout — the ORIGINAL scales are kept (no
    requantization round trip)."""
    q = _np(sd[key + ".weight"]).T  # [K, N] e4m3
    sc = _np(sd[key + ".weight_scale_inv"]).astype(np.float32).T  # [kb, nb]
    return {"q": jnp.asarray(q), "s": jnp.asarray(sc)}


def load_hf_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read all safetensors shards of an HF model dir.

    Uses the torch framework when available: the numpy framework cannot
    materialize F8_E4M3 tensors (pre-quantized fp8 checkpoints), while
    ``_np`` converts torch fp8 via a byte view. Values are torch tensors
    or numpy arrays; all consumers go through ``_np``."""
    from safetensors import safe_open

    try:
        import torch  # noqa: F401

        fw = "pt"
    except Exception:
        fw = "np"
    files = sorted(
        f for f in os.listdir(path) if f.endswith(".safetensors")
    )
    index = os.path.join(path, "model.safetensors.index.json")
    if os.path.exists(index):
        with open(index) as f:
            weight_map = json.load(f)["weight_map"]
        files = sorted(set(weight_map.values()))
    sd: Dict[str, np.ndarray] = {}
    for fn in files:
        with safe_open(os.path.join(path, fn), framework=fw) as f:
            for k in f.keys():
                sd[k] = f.get_tensor(k)
    return sd


def params_from_state_dict(
    sd: Dict,
    cfg: ModelConfig,
    dtype=jnp.bfloat16,
    quant: Optional[QuantSpec] = None,
) -> dict:
    """Map an HF llama-class state dict to our stacked param pytree.

    Handles llama / mistral / qwen2 (attention bias) / qwen3 (qk-norm), plus
    the legacy gpt2 / bloom / chatglm families (separate key schemes).
    Keys follow HF naming: model.layers.{i}.self_attn.q_proj.weight etc.
    """
    if cfg.model_type == "gpt2":
        return _params_gpt2(sd, cfg, dtype, quant)
    if cfg.model_type == "bloom":
        return _params_bloom(sd, cfg, dtype, quant)
    if cfg.model_type in ("chatglm", "glm"):
        if cfg.position_embedding_type == "glm_2d":  # AntGLM proper
            return _params_glm(sd, cfg, dtype, quant)
        return _params_chatglm(sd, cfg, dtype, quant)
    if cfg.model_type == "opt":
        return _params_opt(sd, cfg, dtype, quant)
    if cfg.model_type == "gptj":
        return _params_gptj(sd, cfg, dtype, quant)
    if cfg.model_type == "baichuan":
        return _params_baichuan(sd, cfg, dtype, quant)
    if cfg.model_type == "qwen":
        return _params_qwen1(sd, cfg, dtype, quant)
    if cfg.linear_attention:
        return _params_bailing_linear(sd, cfg, dtype, quant)
    H, Hk, D = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim

    def get(k):
        return _np(sd[k]).astype(np.float32)

    def j(x):
        return jnp.asarray(x, dtype)

    import jax

    # pre-quantized fp8-block checkpoints (DeepSeek-V3 format) carry
    # weight_scale_inv tensors: those leaves load DIRECTLY with their
    # original scales; leaves without scales (norms, embed, lm_head at
    # bf16) stay plain arrays — ``linear`` dispatches per leaf type
    has_scale_inv = any(k.endswith(".weight_scale_inv") for k in sd)
    prequant = (
        has_scale_inv and quant is not None
        and quant.wfmt == "fp8" and quant.block == 128
    )
    if has_scale_inv and not prequant:
        raise ValueError(
            "checkpoint is pre-quantized fp8-block (weight_scale_inv "
            "tensors present); pass quant=None (auto-detect) or "
            "quant='fp8_block' — re-quantizing fp8 payloads to "
            f"{quant!r} is not supported"
        )

    def lin(key):  # key WITHOUT the ".weight" suffix
        if prequant and key + ".weight_scale_inv" in sd:
            return _prequant_leaf(sd, key)
        return make_linear(j(get(key + ".weight").T), quant)

    def lin_fused(keys):  # concat along the OUT dim (qkv / gate-up merges)
        if prequant and all(k + ".weight_scale_inv" in sd for k in keys):
            leaves = [_prequant_leaf(sd, k) for k in keys]
            return {
                "q": jnp.concatenate([l["q"] for l in leaves], axis=1),
                "s": jnp.concatenate([l["s"] for l in leaves], axis=1),
            }
        ws = [get(k + ".weight").T for k in keys]
        return make_linear(j(np.concatenate(ws, axis=1)), quant)

    def _moe_layer(p: str) -> dict:
        """Map one MoE layer's experts (mixtral block_sparse_moe naming or
        qwen3_moe/deepseek mlp.experts naming) to stacked tensors."""
        X = cfg.num_experts
        if p + "block_sparse_moe.gate.weight" in sd:  # mixtral
            gate_key = p + "block_sparse_moe.gate.weight"
            e = p + "block_sparse_moe.experts.{x}."
            names = ("w1.weight", "w3.weight", "w2.weight")  # gate, up, down
        else:  # qwen3_moe / deepseek routed experts
            gate_key = p + "mlp.gate.weight"
            e = p + "mlp.experts.{x}."
            names = ("gate_proj.weight", "up_proj.weight", "down_proj.weight")
        out = {
            "router": j(get(gate_key).T),
        }
        if gate_key.replace(".weight", ".e_score_correction_bias") in sd:
            out["router_bias"] = jnp.asarray(
                get(gate_key.replace(".weight", ".e_score_correction_bias")),
                jnp.float32,
            )
        base0 = e.format(x=0) + names[0][:-len(".weight")]
        if prequant and base0 + ".weight_scale_inv" in sd:
            # pre-quantized experts: stack the fp8 blocks + original scales
            def stk(fused):
                qs, ss = [], []
                for x in range(X):
                    keys = [e.format(x=x) + n[:-len(".weight")] for n in fused]
                    leaves = [_prequant_leaf(sd, k) for k in keys]
                    qs.append(jnp.concatenate([l["q"] for l in leaves], axis=1))
                    ss.append(jnp.concatenate([l["s"] for l in leaves], axis=1))
                return {"q": jnp.stack(qs), "s": jnp.stack(ss)}

            out["moe_wgu"] = stk([names[0], names[1]])
            out["moe_wdown"] = stk([names[2]])
        else:
            wgu = np.stack([
                np.concatenate(
                    [get(e.format(x=x) + names[0]).T,
                     get(e.format(x=x) + names[1]).T],
                    axis=1,
                )
                for x in range(X)
            ])  # [X, E, 2I]
            wdn = np.stack([get(e.format(x=x) + names[2]).T for x in range(X)])
            out.update({
                "moe_wgu": jax.vmap(lambda w: make_linear(w, quant))(jnp.asarray(wgu, jnp.float32))
                if quant is not None
                else j(wgu),
                "moe_wdown": jax.vmap(lambda w: make_linear(w, quant))(jnp.asarray(wdn, jnp.float32))
                if quant is not None
                else j(wdn),
            })
        if cfg.num_shared_experts:
            sh = p + "mlp.shared_experts."
            out["shared_wgu"] = lin_fused([sh + "gate_proj", sh + "up_proj"])
            out["shared_wdown"] = lin(sh + "down_proj")
        return out

    dense_layers, moe_layers = [], []
    for i in range(cfg.num_hidden_layers):
        p = f"model.layers.{i}."
        lp = {
            "input_ln": j(get(p + "input_layernorm.weight")),
            "post_ln": j(get(p + "post_attention_layernorm.weight")),
        }
        if cfg.is_mla:  # deepseek v2/v3 latent attention projections
            lp["kv_a"] = lin(p + "self_attn.kv_a_proj_with_mqa")
            lp["kv_a_ln"] = j(get(p + "self_attn.kv_a_layernorm.weight"))
            lp["kv_b"] = lin(p + "self_attn.kv_b_proj")
            lp["wo"] = lin(p + "self_attn.o_proj")
            if cfg.q_lora_rank:
                lp["q_a"] = lin(p + "self_attn.q_a_proj")
                lp["q_a_ln"] = j(get(p + "self_attn.q_a_layernorm.weight"))
                lp["q_b"] = lin(p + "self_attn.q_b_proj")
            else:
                lp["wq"] = lin(p + "self_attn.q_proj")
        else:
            lp["wqkv"] = lin_fused([
                p + "self_attn.q_proj", p + "self_attn.k_proj",
                p + "self_attn.v_proj",
            ])
            lp["wo"] = lin(p + "self_attn.o_proj")
            if cfg.attention_bias:
                bq = get(p + "self_attn.q_proj.bias")
                bk = get(p + "self_attn.k_proj.bias")
                bv = get(p + "self_attn.v_proj.bias")
                lp["bqkv"] = j(np.concatenate([bq, bk, bv]))
            if cfg.attention_out_bias and p + "self_attn.o_proj.bias" in sd:
                lp["bo"] = j(get(p + "self_attn.o_proj.bias"))  # internlm
            if cfg.qk_norm:
                lp["q_norm"] = j(get(p + "self_attn.q_norm.weight"))
                lp["k_norm"] = j(get(p + "self_attn.k_norm.weight"))
        if cfg.is_moe and i >= cfg.moe_layer_start:
            lp.update(_moe_layer(p))
            moe_layers.append(lp)
        else:
            lp["wgu"] = lin_fused([p + "mlp.gate_proj", p + "mlp.up_proj"])
            lp["wdown"] = lin(p + "mlp.down_proj")
            dense_layers.append(lp)

    params = {
        "embed": j(get("model.embed_tokens.weight")),
        "final_ln": j(get("model.norm.weight")),
    }
    if dense_layers:
        params["layers"] = jax.tree.map(lambda *xs: jnp.stack(xs), *dense_layers)
    if moe_layers:
        params["moe_layers"] = jax.tree.map(lambda *xs: jnp.stack(xs), *moe_layers)
    if not cfg.tie_word_embeddings:
        # pre-quantized checkpoints ship lm_head in bf16 on purpose (the
        # reference keeps the head unquantized) — don't re-quantize it
        params["lm_head"] = make_linear(
            j(get("lm_head.weight").T), None if prequant else quant
        )
    return params


def _params_opt(sd, cfg, dtype, quant):
    """OPTForCausalLM keys -> params (reference fork: lookahead/models/opt).

    OPT's learned position table carries a +2 offset (HF
    OPTLearnedPositionalEmbedding); slicing the first two rows off makes
    plain positions index it directly. Assumes do_layer_norm_before=True
    and word_embed_proj_dim == hidden_size (the 125m..13b family)."""

    def get(k):
        k2 = "model.decoder." + k
        return _np(sd[k2 if k2 in sd else k]).astype(np.float32)

    def j(x):
        return jnp.asarray(x, dtype)

    layers = []
    for i in range(cfg.num_hidden_layers):
        p = f"layers.{i}."
        wq = get(p + "self_attn.q_proj.weight").T
        wk = get(p + "self_attn.k_proj.weight").T
        wv = get(p + "self_attn.v_proj.weight").T
        layers.append({
            "input_ln": j(get(p + "self_attn_layer_norm.weight")),
            "input_ln_b": j(get(p + "self_attn_layer_norm.bias")),
            "post_ln": j(get(p + "final_layer_norm.weight")),
            "post_ln_b": j(get(p + "final_layer_norm.bias")),
            "wqkv": make_linear(j(np.concatenate([wq, wk, wv], axis=1)), quant),
            "bqkv": j(np.concatenate([
                get(p + "self_attn.q_proj.bias"),
                get(p + "self_attn.k_proj.bias"),
                get(p + "self_attn.v_proj.bias"),
            ])),
            "wo": make_linear(j(get(p + "self_attn.out_proj.weight").T), quant),
            "bo": j(get(p + "self_attn.out_proj.bias")),
            "wgu": make_linear(j(get(p + "fc1.weight").T), quant),
            "bgu": j(get(p + "fc1.bias")),
            "wdown": make_linear(j(get(p + "fc2.weight").T), quant),
            "bdown": j(get(p + "fc2.bias")),
        })
    return {
        "embed": j(get("embed_tokens.weight")),
        "pos_embed": j(get("embed_positions.weight")[2:]),
        "layers": _stack_layers(layers),
        "final_ln": j(get("final_layer_norm.weight")),
        "final_ln_b": j(get("final_layer_norm.bias")),
    }


def _params_gptj(sd, cfg, dtype, quant):
    """GPTJForCausalLM keys -> params (reference fork: lookahead/models/gptj).

    Parallel residual: ln_1 feeds both attention and mlp (post_ln absent;
    cfg.parallel_residual skips it). Rotary is interleaved over the first
    rotary_dim lanes (cfg.partial_rotary_factor + rope_interleaved)."""

    def get(k):
        k2 = "transformer." + k
        return _np(sd[k2 if k2 in sd else k]).astype(np.float32)

    def j(x):
        return jnp.asarray(x, dtype)

    layers = []
    for i in range(cfg.num_hidden_layers):
        p = f"h.{i}."
        wq = get(p + "attn.q_proj.weight").T
        wk = get(p + "attn.k_proj.weight").T
        wv = get(p + "attn.v_proj.weight").T
        layers.append({
            "input_ln": j(get(p + "ln_1.weight")),
            "input_ln_b": j(get(p + "ln_1.bias")),
            "wqkv": make_linear(j(np.concatenate([wq, wk, wv], axis=1)), quant),
            "wo": make_linear(j(get(p + "attn.out_proj.weight").T), quant),
            "wgu": make_linear(j(get(p + "mlp.fc_in.weight").T), quant),
            "bgu": j(get(p + "mlp.fc_in.bias")),
            "wdown": make_linear(j(get(p + "mlp.fc_out.weight").T), quant),
            "bdown": j(get(p + "mlp.fc_out.bias")),
        })
    params = {
        "embed": j(get("wte.weight")),
        "layers": _stack_layers(layers),
        "final_ln": j(get("ln_f.weight")),
        "final_ln_b": j(get("ln_f.bias")),
        "lm_head": make_linear(j(get("lm_head.weight").T), quant),
    }
    if "lm_head.bias" in sd:
        params["lm_head_b"] = j(get("lm_head.bias"))
    return params


def _params_baichuan(sd, cfg, dtype, quant):
    """BaichuanForCausalLM keys -> params (reference forks:
    lookahead/models/baichuan{,2}_{7,13}b).

    W_pack fuses q|k|v along the OUT dim ([3E, E]); 13B checkpoints (40
    heads) use ALiBi (cfg set by from_hf). Baichuan2 (vocab 125696)
    L2-normalizes each lm_head row at inference (NormHead,
    Baichuan2 modeling_baichuan.py) — baked into the weights here;
    Baichuan1 (vocab 64000) passes through unchanged."""

    def get(k):
        return _np(sd[k]).astype(np.float32)

    def j(x):
        return jnp.asarray(x, dtype)

    norm_head = cfg.vocab_size >= 125696  # Baichuan2 family
    E = cfg.hidden_size
    layers = []
    for i in range(cfg.num_hidden_layers):
        p = f"model.layers.{i}."
        wpack = get(p + "self_attn.W_pack.weight")  # [3E, E]
        wq, wk, wv = wpack[:E].T, wpack[E:2 * E].T, wpack[2 * E:].T
        wg = get(p + "mlp.gate_proj.weight").T
        wu = get(p + "mlp.up_proj.weight").T
        layers.append({
            "input_ln": j(get(p + "input_layernorm.weight")),
            "post_ln": j(get(p + "post_attention_layernorm.weight")),
            "wqkv": make_linear(j(np.concatenate([wq, wk, wv], axis=1)), quant),
            "wo": make_linear(j(get(p + "self_attn.o_proj.weight").T), quant),
            "wgu": make_linear(j(np.concatenate([wg, wu], axis=1)), quant),
            "wdown": make_linear(j(get(p + "mlp.down_proj.weight").T), quant),
        })
    head = get("lm_head.weight")  # [V, E]
    if norm_head:
        head = head / np.maximum(
            np.linalg.norm(head, axis=1, keepdims=True), 1e-7
        )
    return {
        "embed": j(get("model.embed_tokens.weight")),
        "layers": _stack_layers(layers),
        "final_ln": j(get("model.norm.weight")),
        "lm_head": make_linear(j(head.T), quant),
    }


def _params_qwen1(sd, cfg, dtype, quant):
    """QWenLMHeadModel (qwen1) keys -> params (reference fork:
    lookahead/models/qwen).

    c_attn fuses q|k|v on the out dim with bias; the mlp is half-width
    swiglu: w2 is the GATE, w1 the UP projection, c_proj down
    (modeling_qwen.QWenMLP) — cfg.intermediate_size is already the half
    width (from_hf divides by 2)."""

    def get(k):
        k2 = "transformer." + k
        return _np(sd[k2 if k2 in sd else k]).astype(np.float32)

    def j(x):
        return jnp.asarray(x, dtype)

    layers = []
    for i in range(cfg.num_hidden_layers):
        p = f"h.{i}."
        wg = get(p + "mlp.w2.weight").T  # gate
        wu = get(p + "mlp.w1.weight").T  # up
        layers.append({
            "input_ln": j(get(p + "ln_1.weight")),
            "post_ln": j(get(p + "ln_2.weight")),
            "wqkv": make_linear(j(get(p + "attn.c_attn.weight").T), quant),
            "bqkv": j(get(p + "attn.c_attn.bias")),
            "wo": make_linear(j(get(p + "attn.c_proj.weight").T), quant),
            "wgu": make_linear(j(np.concatenate([wg, wu], axis=1)), quant),
            "wdown": make_linear(j(get(p + "mlp.c_proj.weight").T), quant),
        })
    return {
        "embed": j(get("wte.weight")),
        "layers": _stack_layers(layers),
        "final_ln": j(get("ln_f.weight")),
        "lm_head": make_linear(j(get("lm_head.weight").T), quant),
    }


def _params_bailing_linear(sd, cfg, dtype, quant):
    """BailingMoeLinearV2ForCausalLM keys -> hybrid params.

    Reference: flood/flood/models/modeling_bailing_moe_linear_v2.py —
    `model.layers.{i}.attention.query_key_value/dense/g_proj/
    query_layernorm/key_layernorm/g_norm` on linear layers (:254-299),
    the same minus g_proj/g_norm on full-attention layers (:142-180),
    `model.word_embeddings` (:502), per-layer decay law computed in
    flood_patch_func (:345-350). MoE mlp follows BailingMoeV2MoE
    (`mlp.gate` + `gate.expert_bias`, `mlp.experts.{x}`,
    `mlp.shared_experts`, :78-114); dense layers use gate/up/down_proj.

    No public bailing-linear checkpoint ships in this environment, so
    parity is covered by a synthetic-state-dict test
    (tests/test_linear_attn.py) that checks placement and that the loaded
    model serves."""
    import math

    import jax

    from painlessinferenceacceleration_tpu.models.linear_attn import (
        is_full_layer,
    )

    H, D = cfg.num_attention_heads, cfg.head_dim
    L = cfg.num_hidden_layers

    def get(k):
        return _np(sd[k]).astype(np.float32)

    def j(x):
        return jnp.asarray(x, dtype)

    def decay_scales(li: int) -> jnp.ndarray:
        # flood_patch_func :345-350 (no-GQA: per query head)
        start = 2.0 ** (-(2.0 ** -(math.log2(H) - 3.0)))
        exps = np.arange(1, H + 1, dtype=np.float32)
        return jnp.asarray(
            np.power(start, exps) * (1.0 - li / max(L - 1, 1) + 1e-5),
            jnp.float32,
        )

    def moe_or_dense_mlp(p: str, lp: dict) -> None:
        if cfg.is_moe and p + "mlp.gate.weight" in sd:
            X = cfg.num_experts
            e = p + "mlp.experts.{x}."
            wgu = np.stack([
                np.concatenate(
                    [get(e.format(x=x) + "gate_proj.weight").T,
                     get(e.format(x=x) + "up_proj.weight").T], axis=1,
                )
                for x in range(X)
            ])
            wdn = np.stack(
                [get(e.format(x=x) + "down_proj.weight").T for x in range(X)]
            )
            lp["router"] = j(get(p + "mlp.gate.weight").T)
            bias_key = p + "mlp.gate.expert_bias"
            if bias_key in sd:
                lp["router_bias"] = jnp.asarray(get(bias_key), jnp.float32)
            lp["moe_wgu"] = (
                jax.vmap(lambda w: make_linear(w, quant))(jnp.asarray(wgu))
                if quant is not None else j(wgu)
            )
            lp["moe_wdown"] = (
                jax.vmap(lambda w: make_linear(w, quant))(jnp.asarray(wdn))
                if quant is not None else j(wdn)
            )
            if cfg.num_shared_experts:
                sh = p + "mlp.shared_experts."
                sgu = np.concatenate(
                    [get(sh + "gate_proj.weight").T,
                     get(sh + "up_proj.weight").T], axis=1,
                )
                lp["shared_wgu"] = make_linear(j(sgu), quant)
                lp["shared_wdown"] = make_linear(
                    j(get(sh + "down_proj.weight").T), quant
                )
        else:
            wg = get(p + "mlp.gate_proj.weight").T
            wu = get(p + "mlp.up_proj.weight").T
            lp["wgu"] = make_linear(j(np.concatenate([wg, wu], axis=1)), quant)
            lp["wdown"] = make_linear(j(get(p + "mlp.down_proj.weight").T), quant)

    layers = []
    for i in range(L):
        p = f"model.layers.{i}."
        a = p + "attention."
        lp = {
            "input_ln": j(get(p + "input_layernorm.weight")),
            "post_ln": j(get(p + "post_attention_layernorm.weight")),
            "wqkv": make_linear(j(get(a + "query_key_value.weight").T), quant),
            "wo": make_linear(j(get(a + "dense.weight").T), quant),
        }
        if cfg.attention_bias and a + "query_key_value.bias" in sd:
            lp["bqkv"] = j(get(a + "query_key_value.bias"))
        if cfg.attention_out_bias and a + "dense.bias" in sd:
            lp["bo"] = j(get(a + "dense.bias"))
        if is_full_layer(cfg, i):
            if cfg.qk_norm:
                lp["q_norm"] = j(get(a + "query_layernorm.weight"))
                lp["k_norm"] = j(get(a + "key_layernorm.weight"))
        else:
            lp["w_gate"] = make_linear(j(get(a + "g_proj.weight").T), quant)
            lp["out_norm"] = j(get(a + "g_norm.weight"))
            lp["decay"] = decay_scales(i)
            if cfg.linear_qk_norm:
                lp["q_norm"] = j(get(a + "query_layernorm.weight"))
                lp["k_norm"] = j(get(a + "key_layernorm.weight"))
        moe_or_dense_mlp(p, lp)
        layers.append(lp)

    params = {
        "embed": j(get("model.word_embeddings.weight")),
        "hybrid_layers": tuple(layers),
        "final_ln": j(get("model.norm.weight")),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = make_linear(j(get("lm_head.weight").T), quant)
    return params


def _stack_layers(layers: list) -> dict:
    import jax

    return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)


def _params_gpt2(sd, cfg, dtype, quant):
    """GPT2LMHeadModel keys -> params (reference fork: lookahead/models/gpt2).

    HF GPT2 uses Conv1D, so weights are ALREADY [in, out] — no transpose.
    c_attn is fused q|k|v along the output dim, matching our wqkv layout.
    """

    def get(k):
        k = k if k in sd else "transformer." + k
        return _np(sd[k]).astype(np.float32)

    def j(x):
        return jnp.asarray(x, dtype)

    layers = []
    for i in range(cfg.num_hidden_layers):
        p = f"h.{i}."
        layers.append({
            "input_ln": j(get(p + "ln_1.weight")),
            "input_ln_b": j(get(p + "ln_1.bias")),
            "post_ln": j(get(p + "ln_2.weight")),
            "post_ln_b": j(get(p + "ln_2.bias")),
            "wqkv": make_linear(j(get(p + "attn.c_attn.weight")), quant),
            "bqkv": j(get(p + "attn.c_attn.bias")),
            "wo": make_linear(j(get(p + "attn.c_proj.weight")), quant),
            "bo": j(get(p + "attn.c_proj.bias")),
            "wgu": make_linear(j(get(p + "mlp.c_fc.weight")), quant),
            "bgu": j(get(p + "mlp.c_fc.bias")),
            "wdown": make_linear(j(get(p + "mlp.c_proj.weight")), quant),
            "bdown": j(get(p + "mlp.c_proj.bias")),
        })
    return {
        "embed": j(get("wte.weight")),
        "pos_embed": j(get("wpe.weight")),
        "layers": _stack_layers(layers),
        "final_ln": j(get("ln_f.weight")),
        "final_ln_b": j(get("ln_f.bias")),
    }


def _params_glm(sd, cfg, dtype, quant):
    """GLMForConditionalGeneration (AntGLM) keys -> params.

    Reference: lookahead/models/glm/modeling_glm.py — GLMStack with TWO
    learned position tables (:276-277), LayerNorm blocks, fused
    query_key_value ordered q|k|v over the out dim (:140-142 view(3,H,D)),
    GELU MLP dense_h_to_4h/dense_4h_to_h, tied lm_head (:505).
    nn.Linear weights are [out, in] -> transpose to our [in, out].
    """

    def get(k):
        for pref in ("", "glm.", "glm.transformer.", "transformer."):
            if pref + k in sd:
                return _np(sd[pref + k]).astype(np.float32)
        raise KeyError(k)

    def j(x):
        return jnp.asarray(x, dtype)

    layers = []
    for i in range(cfg.num_hidden_layers):
        p = f"layers.{i}."
        layers.append({
            "input_ln": j(get(p + "input_layernorm.weight")),
            "input_ln_b": j(get(p + "input_layernorm.bias")),
            "post_ln": j(get(p + "post_attention_layernorm.weight")),
            "post_ln_b": j(get(p + "post_attention_layernorm.bias")),
            "wqkv": make_linear(j(get(p + "attention.query_key_value.weight").T), quant),
            "bqkv": j(get(p + "attention.query_key_value.bias")),
            "wo": make_linear(j(get(p + "attention.dense.weight").T), quant),
            "bo": j(get(p + "attention.dense.bias")),
            "wgu": make_linear(j(get(p + "mlp.dense_h_to_4h.weight").T), quant),
            "bgu": j(get(p + "mlp.dense_h_to_4h.bias")),
            "wdown": make_linear(j(get(p + "mlp.dense_4h_to_h.weight").T), quant),
            "bdown": j(get(p + "mlp.dense_4h_to_h.bias")),
        })
    return {
        "embed": j(get("word_embeddings.weight")),
        "pos_embed": j(get("position_embeddings.weight")),
        "block_pos_embed": j(get("block_position_embeddings.weight")),
        "layers": _stack_layers(layers),
        "final_ln": j(get("final_layernorm.weight")),
        "final_ln_b": j(get("final_layernorm.bias")),
    }


def _params_bloom(sd, cfg, dtype, quant):
    """BloomForCausalLM keys -> params (reference fork: lookahead/models/bloom).

    Bloom fuses qkv per-head interleaved: weight [H*3*D, E] viewed as
    [H, 3, D, E] — de-interleave to our q|k|v block layout.
    """
    H, D = cfg.num_attention_heads, cfg.head_dim

    def get(k):
        k = k if k in sd else "transformer." + k
        return _np(sd[k]).astype(np.float32)

    def j(x):
        return jnp.asarray(x, dtype)

    layers = []
    for i in range(cfg.num_hidden_layers):
        p = f"h.{i}."
        wqkv = get(p + "self_attention.query_key_value.weight").reshape(H, 3, D, -1)
        bqkv = get(p + "self_attention.query_key_value.bias").reshape(H, 3, D)
        wqkv = np.concatenate(
            [wqkv[:, 0].reshape(H * D, -1), wqkv[:, 1].reshape(H * D, -1),
             wqkv[:, 2].reshape(H * D, -1)]
        ).T  # [E, 3*H*D]
        bqkv = np.concatenate([bqkv[:, 0].ravel(), bqkv[:, 1].ravel(), bqkv[:, 2].ravel()])
        layers.append({
            "input_ln": j(get(p + "input_layernorm.weight")),
            "input_ln_b": j(get(p + "input_layernorm.bias")),
            "post_ln": j(get(p + "post_attention_layernorm.weight")),
            "post_ln_b": j(get(p + "post_attention_layernorm.bias")),
            "wqkv": make_linear(j(wqkv), quant),
            "bqkv": j(bqkv),
            "wo": make_linear(j(get(p + "self_attention.dense.weight").T), quant),
            "bo": j(get(p + "self_attention.dense.bias")),
            "wgu": make_linear(j(get(p + "mlp.dense_h_to_4h.weight").T), quant),
            "bgu": j(get(p + "mlp.dense_h_to_4h.bias")),
            "wdown": make_linear(j(get(p + "mlp.dense_4h_to_h.weight").T), quant),
            "bdown": j(get(p + "mlp.dense_4h_to_h.bias")),
        })
    return {
        "embed": j(get("word_embeddings.weight")),
        "embed_ln": j(get("word_embeddings_layernorm.weight")),
        "embed_ln_b": j(get("word_embeddings_layernorm.bias")),
        "layers": _stack_layers(layers),
        "final_ln": j(get("ln_f.weight")),
        "final_ln_b": j(get("ln_f.bias")),
    }


def _params_chatglm(sd, cfg, dtype, quant):
    """ChatGLM2/3 keys -> params (reference fork: lookahead/models/chatglm).

    query_key_value is fused q|k|v block-wise (MQA: k/v have Hk*D rows);
    mlp dense_h_to_4h is gate|up concatenated (swiglu), matching wgu.
    """

    def get(k):
        for cand in (k, "transformer." + k, "transformer.encoder." + k):
            if cand in sd:
                return _np(sd[cand]).astype(np.float32)
        raise KeyError(k)

    def j(x):
        return jnp.asarray(x, dtype)

    layers = []
    for i in range(cfg.num_hidden_layers):
        p = f"layers.{i}."
        lp = {
            "input_ln": j(get(p + "input_layernorm.weight")),
            "post_ln": j(get(p + "post_attention_layernorm.weight")),
            "wqkv": make_linear(
                j(get(p + "self_attention.query_key_value.weight").T), quant
            ),
            "wo": make_linear(j(get(p + "self_attention.dense.weight").T), quant),
            "wgu": make_linear(j(get(p + "mlp.dense_h_to_4h.weight").T), quant),
            "wdown": make_linear(j(get(p + "mlp.dense_4h_to_h.weight").T), quant),
        }
        if cfg.attention_bias:
            lp["bqkv"] = j(get(p + "self_attention.query_key_value.bias"))
        layers.append(lp)
    return {
        "embed": j(get("embedding.word_embeddings.weight")),
        "layers": _stack_layers(layers),
        "final_ln": j(get("final_layernorm.weight")),
        "lm_head": make_linear(j(get("output_layer.weight").T), quant),
    }


def load_model(
    path: str, dtype=jnp.bfloat16, quant: Optional[QuantSpec] = None
):
    """One-call load: (ModelConfig, params, QuantSpec) from an HF model dir.

    When the checkpoint carries a quantization_config (pre-quantized
    fp8-block weights, DeepSeek-V3 format) and no spec was forced, the
    detected spec is adopted and the fp8 weights + original scales load
    directly (reference AutoLinear dispatch, flood linear.py:135-196)."""
    cpath = path
    if os.path.isdir(cpath):
        cpath = os.path.join(cpath, "config.json")
    with open(cpath) as f:
        conf = json.load(f)
    cfg = ModelConfig.from_hf(conf)
    auto = quant_from_hf_config(conf)
    if quant is None and auto is not None:
        quant = auto
    sd = load_hf_state_dict(path)
    return cfg, params_from_state_dict(sd, cfg, dtype, quant), quant


def params_from_torch_model(model, cfg: ModelConfig, dtype=jnp.float32,
                            quant: Optional[QuantSpec] = None) -> dict:
    """Convert an in-memory HF torch model (test fixture path)."""
    sd = {k: _np(v) for k, v in model.state_dict().items()}
    if cfg.tie_word_embeddings:
        sd.pop("lm_head.weight", None)
    return params_from_state_dict(sd, cfg, dtype, quant)
