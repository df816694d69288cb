"""Legacy families round 2: opt / gptj (HF torch parity) and baichuan /
qwen1 (synthetic state dicts — their HF classes need trust_remote_code,
unavailable offline).

Reference per-model forks: lookahead/models/{opt,gptj,baichuan*,qwen}.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from painlessinferenceacceleration_tpu.config import EngineConfig, ModelConfig
from painlessinferenceacceleration_tpu.engine.cache import init_kv_cache
from painlessinferenceacceleration_tpu.models.base import (
    logits_from_hidden,
    transformer_hidden,
)
from painlessinferenceacceleration_tpu.models.hf_loader import (
    params_from_state_dict,
    params_from_torch_model,
)
from painlessinferenceacceleration_tpu.ops.attention import causal_qmask


def hf_logits(model, ids):
    import torch

    with torch.no_grad():
        out = model(torch.tensor([ids], dtype=torch.long)).logits[0]
    return out.float().numpy()


def full_logits(params, cfg, ids):
    ecfg = EngineConfig(page_size=16, max_seq_len=128, max_concurrency=2)
    kv = init_kv_cache(cfg, ecfg, dtype=jnp.float32)
    T = len(ids)
    pt = jnp.arange(1, 1 + ecfg.pages_per_req, dtype=jnp.int32)[None]
    h, _ = transformer_hidden(
        params, cfg, kv, jnp.array([ids], jnp.int32),
        jnp.arange(T, dtype=jnp.int32)[None], pt,
        jnp.zeros((1,), jnp.int32), causal_qmask(T)[None],
    )
    return np.asarray(logits_from_hidden(params, cfg, h)[0])


def test_opt_hf_parity():
    torch = pytest.importorskip("torch")
    from transformers import OPTConfig, OPTForCausalLM

    torch.manual_seed(0)
    hf_cfg = OPTConfig(
        vocab_size=512, hidden_size=64, num_hidden_layers=3,
        num_attention_heads=4, ffn_dim=128, max_position_embeddings=128,
        word_embed_proj_dim=64, do_layer_norm_before=True, dropout=0.0,
        activation_function="relu",
    )
    model = OPTForCausalLM(hf_cfg).eval()
    cfg = ModelConfig.from_hf(hf_cfg.to_dict())
    assert cfg.position_embedding_type == "learned"
    params = params_from_torch_model(model, cfg, dtype=jnp.float32)
    ids = [5, 17, 301, 42, 9, 250, 77]
    np.testing.assert_allclose(
        full_logits(params, cfg, ids), hf_logits(model, ids),
        rtol=2e-4, atol=2e-4,
    )


def test_gptj_hf_parity():
    torch = pytest.importorskip("torch")
    from transformers import GPTJConfig, GPTJForCausalLM

    torch.manual_seed(0)
    hf_cfg = GPTJConfig(
        vocab_size=512, n_embd=64, n_layer=3, n_head=4, n_positions=128,
        rotary_dim=8, n_inner=None, activation_function="gelu_new",
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
    )
    model = GPTJForCausalLM(hf_cfg).eval()
    cfg = ModelConfig.from_hf(hf_cfg.to_dict())
    assert cfg.parallel_residual and cfg.rope_interleaved
    assert abs(cfg.partial_rotary_factor - 0.5) < 1e-6  # 8 of 16
    params = params_from_torch_model(model, cfg, dtype=jnp.float32)
    ids = [5, 17, 301, 42, 9, 250, 77, 80]
    np.testing.assert_allclose(
        full_logits(params, cfg, ids), hf_logits(model, ids),
        rtol=3e-4, atol=3e-4,
    )


def _engine_runs(cfg, params):
    from painlessinferenceacceleration_tpu.engine.llm import LLM
    from painlessinferenceacceleration_tpu.engine.request import SamplingParams

    ecfg = EngineConfig(page_size=16, max_seq_len=128, max_concurrency=2,
                        eos_token_id=-2)
    llm = LLM(cfg=cfg, params=params, ecfg=ecfg, dtype=jnp.float32)
    out = llm.generate([[5, 6, 7]], SamplingParams(max_new_tokens=6))[0]
    assert len(out.output_ids) == 6


def test_baichuan_synthetic_loader():
    """W_pack split + rope (7B layout). The W_pack rows must land as
    q|k|v column blocks of wqkv."""
    E, H, L, I, V = 32, 4, 2, 64, 128
    conf = dict(
        model_type="baichuan", vocab_size=V, hidden_size=E,
        num_hidden_layers=L, num_attention_heads=H,
        intermediate_size=I, max_position_embeddings=128,
    )
    cfg = ModelConfig.from_hf(conf)
    assert cfg.position_embedding_type == "rope"  # 7B class
    rng = np.random.default_rng(0)

    def t(*s):
        return (rng.normal(size=s) * 0.05).astype(np.float32)

    sd = {"model.embed_tokens.weight": t(V, E),
          "model.norm.weight": np.ones(E, np.float32),
          "lm_head.weight": t(V, E)}
    for i in range(L):
        p = f"model.layers.{i}."
        sd[p + "self_attn.W_pack.weight"] = t(3 * E, E)
        sd[p + "self_attn.o_proj.weight"] = t(E, E)
        sd[p + "mlp.gate_proj.weight"] = t(I, E)
        sd[p + "mlp.up_proj.weight"] = t(I, E)
        sd[p + "mlp.down_proj.weight"] = t(E, I)
        sd[p + "input_layernorm.weight"] = np.ones(E, np.float32)
        sd[p + "post_attention_layernorm.weight"] = np.ones(E, np.float32)
    params = params_from_state_dict(sd, cfg, dtype=jnp.float32)
    wpack = sd["model.layers.0.self_attn.W_pack.weight"]
    np.testing.assert_array_equal(
        np.asarray(params["layers"]["wqkv"][0][:, :E]), wpack[:E].T
    )
    np.testing.assert_array_equal(
        np.asarray(params["layers"]["wqkv"][0][:, 2 * E:]), wpack[2 * E:].T
    )
    _engine_runs(cfg, params)
    # 13B class (>= 40 heads) switches to ALiBi
    cfg13 = ModelConfig.from_hf(dict(conf, num_attention_heads=40))
    assert cfg13.position_embedding_type == "alibi"


def test_qwen1_synthetic_loader():
    """qwen1 fused c_attn + half-width swiglu (w2 = gate, w1 = up)."""
    E, H, L, FF, V = 32, 4, 2, 128, 128
    conf = dict(
        model_type="qwen", vocab_size=V, hidden_size=E,
        num_hidden_layers=L, num_attention_heads=H,
        intermediate_size=FF, max_position_embeddings=128,
        layer_norm_epsilon=1e-6,
    )
    cfg = ModelConfig.from_hf(conf)
    assert cfg.intermediate_size == FF // 2
    rng = np.random.default_rng(1)

    def t(*s):
        return (rng.normal(size=s) * 0.05).astype(np.float32)

    sd = {"transformer.wte.weight": t(V, E),
          "transformer.ln_f.weight": np.ones(E, np.float32),
          "lm_head.weight": t(V, E)}
    for i in range(L):
        p = f"transformer.h.{i}."
        sd[p + "ln_1.weight"] = np.ones(E, np.float32)
        sd[p + "ln_2.weight"] = np.ones(E, np.float32)
        sd[p + "attn.c_attn.weight"] = t(3 * E, E)
        sd[p + "attn.c_attn.bias"] = t(3 * E)
        sd[p + "attn.c_proj.weight"] = t(E, E)
        sd[p + "mlp.w1.weight"] = t(FF // 2, E)
        sd[p + "mlp.w2.weight"] = t(FF // 2, E)
        sd[p + "mlp.c_proj.weight"] = t(E, FF // 2)
    params = params_from_state_dict(sd, cfg, dtype=jnp.float32)
    # gate block first (w2), then up (w1)
    np.testing.assert_array_equal(
        np.asarray(params["layers"]["wgu"][0][:, : FF // 2]),
        sd["transformer.h.0.mlp.w2.weight"].T,
    )
    np.testing.assert_array_equal(
        np.asarray(params["layers"]["wgu"][0][:, FF // 2:]),
        sd["transformer.h.0.mlp.w1.weight"].T,
    )
    _engine_runs(cfg, params)


def test_internlm_alias():
    """internlm rides the llama loader path with biases on (conf['bias'])."""
    cfg = ModelConfig.from_hf(dict(
        model_type="internlm", vocab_size=128, hidden_size=32,
        num_hidden_layers=2, num_attention_heads=4, intermediate_size=64,
        bias=True, max_position_embeddings=128,
    ))
    assert cfg.attention_bias and cfg.attention_out_bias
