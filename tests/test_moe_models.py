"""MoE (mixtral-class) and qwen3 (qk-norm) parity vs HF torch oracles."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from painlessinferenceacceleration_tpu.config import EngineConfig, ModelConfig
from painlessinferenceacceleration_tpu.engine.cache import init_kv_cache
from painlessinferenceacceleration_tpu.models.base import (
    init_params,
    logits_from_hidden,
    transformer_hidden,
)
from painlessinferenceacceleration_tpu.models.hf_loader import (
    params_from_torch_model,
)
from painlessinferenceacceleration_tpu.ops.attention import causal_qmask


def run_ours(cfg, params, ids):
    ecfg = EngineConfig(page_size=16, max_seq_len=64, max_concurrency=2)
    kv = init_kv_cache(cfg, ecfg, dtype=jnp.float32)
    T = len(ids)
    pt = jnp.arange(1, 1 + ecfg.pages_per_req, dtype=jnp.int32)[None]
    h, _ = transformer_hidden(
        params, cfg, kv, jnp.array([ids], jnp.int32),
        jnp.arange(T, dtype=jnp.int32)[None], pt, jnp.zeros((1,), jnp.int32),
        causal_qmask(T)[None],
    )
    return np.asarray(logits_from_hidden(params, cfg, h)[0])


def hf_logits(model, ids):
    import torch

    with torch.no_grad():
        return model(torch.tensor([ids])).logits[0].float().numpy()


def test_mixtral_parity():
    torch = pytest.importorskip("torch")
    from transformers import MixtralConfig, MixtralForCausalLM

    torch.manual_seed(0)
    hf_cfg = MixtralConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=64, rms_norm_eps=1e-5,
    )
    model = MixtralForCausalLM(hf_cfg).eval()
    cfg = ModelConfig(
        model_type="mixtral", vocab_size=128, hidden_size=32,
        intermediate_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, num_experts=4, num_experts_per_tok=2,
        rms_norm_eps=1e-5,
    )
    params = params_from_torch_model(model, cfg, dtype=jnp.float32)
    ids = [3, 17, 50, 9, 33]
    ours = run_ours(cfg, params, ids)
    ref = hf_logits(model, ids)
    np.testing.assert_allclose(ours, ref, rtol=3e-4, atol=3e-4)


def test_qwen3_parity():
    torch = pytest.importorskip("torch")
    from transformers import Qwen3Config, Qwen3ForCausalLM

    torch.manual_seed(0)
    hf_cfg = Qwen3Config(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, max_position_embeddings=64, rms_norm_eps=1e-5,
        tie_word_embeddings=False,
    )
    model = Qwen3ForCausalLM(hf_cfg).eval()
    cfg = ModelConfig(
        model_type="qwen3", vocab_size=128, hidden_size=32,
        intermediate_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=8, qk_norm=True, rms_norm_eps=1e-5,
    )
    params = params_from_torch_model(model, cfg, dtype=jnp.float32)
    ids = [3, 17, 50, 9, 33]
    ours = run_ours(cfg, params, ids)
    ref = hf_logits(model, ids)
    np.testing.assert_allclose(ours, ref, rtol=3e-4, atol=3e-4)


def test_moe_engine_decode():
    """MoE model runs through the full engine (random weights)."""
    from painlessinferenceacceleration_tpu.engine.llm import LLM
    from painlessinferenceacceleration_tpu.engine.request import SamplingParams

    cfg = ModelConfig(
        model_type="qwen3_moe", vocab_size=256, hidden_size=32,
        intermediate_size=64, moe_intermediate_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, qk_norm=True,
        num_experts=4, num_experts_per_tok=2, moe_layer_start=1,
        num_shared_experts=1,
    )
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    assert "layers" in params and "moe_layers" in params
    ecfg = EngineConfig(page_size=16, max_seq_len=128, max_concurrency=4, eos_token_id=-2)
    llm = LLM(cfg=cfg, params=params, ecfg=ecfg, dtype=jnp.float32)
    outs = llm.generate([[5, 6, 7], [9, 10]], SamplingParams(max_new_tokens=8))
    assert all(len(o.output_ids) == 8 for o in outs)


def test_deepseek_v3_mla_parity():
    """MLA attention + sigmoid/group routing vs HF DeepseekV3 (tiny)."""
    torch = pytest.importorskip("torch")
    from transformers import DeepseekV3Config, DeepseekV3ForCausalLM

    torch.manual_seed(0)
    hf_cfg = DeepseekV3Config(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        moe_intermediate_size=48, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=4, q_lora_rank=None, kv_lora_rank=32,
        qk_nope_head_dim=16, qk_rope_head_dim=8, v_head_dim=16,
        first_k_dense_replace=1, n_routed_experts=4, num_experts_per_tok=2,
        n_shared_experts=1, n_group=2, topk_group=1, norm_topk_prob=True,
        routed_scaling_factor=2.5, rms_norm_eps=1e-5,
    )
    model = DeepseekV3ForCausalLM(hf_cfg).eval()
    cfg = ModelConfig(
        model_type="deepseek_v3", vocab_size=128, hidden_size=64,
        intermediate_size=96, moe_intermediate_size=48, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=4, kv_lora_rank=32,
        qk_nope_head_dim=16, qk_rope_head_dim=8, v_head_dim=16,
        moe_layer_start=1, num_experts=4, num_experts_per_tok=2,
        num_shared_experts=1, n_group=2, topk_group=1, norm_topk_prob=True,
        routed_scaling_factor=2.5, scoring_func="sigmoid", rms_norm_eps=1e-5,
    )
    params = params_from_torch_model(model, cfg, dtype=jnp.float32)
    ids = [3, 17, 50, 9, 33]
    ours = run_ours(cfg, params, ids)
    ref = hf_logits(model, ids)
    np.testing.assert_allclose(ours, ref, rtol=4e-4, atol=4e-4)

    # latent fusion-cache mode: weight-absorbed MQA over [latent|k_pe] must
    # reproduce the expanded path (same score by associativity)
    import dataclasses

    lat_cfg = dataclasses.replace(cfg, mla_latent_cache=True)
    lat = run_ours(lat_cfg, params, ids)
    np.testing.assert_allclose(lat, ref, rtol=4e-4, atol=4e-4)


def test_mla_engine_decode():
    from painlessinferenceacceleration_tpu.engine.llm import LLM
    from painlessinferenceacceleration_tpu.engine.request import SamplingParams

    cfg = ModelConfig(
        model_type="deepseek_v3", vocab_size=256, hidden_size=64,
        intermediate_size=96, moe_intermediate_size=48, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=4, kv_lora_rank=32,
        qk_nope_head_dim=16, qk_rope_head_dim=8, v_head_dim=16,
        moe_layer_start=1, num_experts=4, num_experts_per_tok=2,
        num_shared_experts=1, scoring_func="sigmoid",
    )
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    ecfg = EngineConfig(page_size=16, max_seq_len=128, max_concurrency=4, eos_token_id=-2)
    llm = LLM(cfg=cfg, params=params, ecfg=ecfg, dtype=jnp.float32)
    outs = llm.generate([[5, 6, 7], [9, 10]], SamplingParams(max_new_tokens=8))
    assert all(len(o.output_ids) == 8 for o in outs)


def test_mla_latent_cache_engine_tokens_match_expanded():
    """Full serving path (continuous batching + spec verify machinery) emits
    identical tokens in both MLA cache modes; the latent arena is smaller."""
    import dataclasses

    from painlessinferenceacceleration_tpu.engine.llm import LLM
    from painlessinferenceacceleration_tpu.engine.request import SamplingParams

    cfg = ModelConfig(
        model_type="deepseek_v3", vocab_size=256, hidden_size=64,
        intermediate_size=96, moe_intermediate_size=48, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=4, kv_lora_rank=32,
        qk_nope_head_dim=16, qk_rope_head_dim=8, v_head_dim=16,
        moe_layer_start=1, num_experts=4, num_experts_per_tok=2,
        num_shared_experts=1, scoring_func="sigmoid",
    )
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    ecfg = EngineConfig(page_size=16, max_seq_len=128, max_concurrency=4,
                        eos_token_id=-2)
    prompts = [[5, 6, 7], [9, 10], [40, 41, 42, 43]]
    llm = LLM(cfg=cfg, params=params, ecfg=ecfg, dtype=jnp.float32)
    expect = [o.output_ids for o in
              llm.generate(prompts, SamplingParams(max_new_tokens=10))]

    lat_cfg = dataclasses.replace(cfg, mla_latent_cache=True)
    lat_kv = init_kv_cache(lat_cfg, ecfg, dtype=jnp.float32)
    exp_kv = init_kv_cache(cfg, ecfg, dtype=jnp.float32)
    # (r + rope_d) rounded up to a 128-lane multiple for Pallas page DMA
    # (models/mla.py mla_head_dims)
    assert lat_kv["k"].shape[-1] == 128
    assert lat_kv["v"].shape[-1] == 32
    assert exp_kv["k"].shape[-1] == 4 * (16 + 8)  # H * (nope + rope_d)
    llm2 = LLM(cfg=lat_cfg, params=params, ecfg=ecfg, dtype=jnp.float32)
    got = [o.output_ids for o in
           llm2.generate(prompts, SamplingParams(max_new_tokens=10))]
    assert got == expect


def test_grouped_moe_matches_scan():
    """Grouped megablocks-style prefill path (ops/moe_matmul.py, interpret
    mode) == scan-over-experts oracle, exactly routed (no dropping)."""
    from painlessinferenceacceleration_tpu.models.moe import (
        init_moe_layer,
        moe_block,
        route_topk,
    )
    from painlessinferenceacceleration_tpu.ops.moe_matmul import (
        moe_block_grouped,
    )

    cfg = ModelConfig(
        model_type="qwen3_moe", vocab_size=64, hidden_size=32,
        intermediate_size=64, moe_intermediate_size=32, num_hidden_layers=1,
        num_attention_heads=4, num_key_value_heads=2,
        num_experts=8, num_experts_per_tok=2, moe_layer_start=0,
    )
    lp = init_moe_layer(cfg, jax.random.PRNGKey(0), jnp.float32, None)
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.normal(size=(2, 96, 32)).astype(np.float32))

    ref = moe_block(lp, cfg, None, h)  # scan path (no shared experts in cfg)

    x = h.reshape(-1, 32)
    logits = jnp.matmul(x, lp["router"], preferred_element_type=jnp.float32)
    route_w = route_topk(cfg, logits, lp.get("router_bias"))
    got = moe_block_grouped(lp, cfg, h, route_w, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
    )
