"""Legacy model families: gpt2 (learned pos), bloom (ALiBi), chatglm (partial
interleaved rope + MQA).

The reference serves these via per-model HF forks (lookahead/models/gpt2,
lookahead/models/bloom, lookahead/models/chatglm). Here one decoder covers
them through config knobs; parity is asserted against HF torch oracles where
transformers ships the architecture (gpt2/bloom), and by self-consistency for
chatglm (its HF implementation requires trust_remote_code — unavailable
offline).
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from painlessinferenceacceleration_tpu.config import EngineConfig, ModelConfig
from painlessinferenceacceleration_tpu.engine.cache import init_kv_cache
from painlessinferenceacceleration_tpu.engine.step import (
    decode_inputs,
    prefill_step,
    verify_step,
)
from painlessinferenceacceleration_tpu.models.base import (
    init_params,
    logits_from_hidden,
    transformer_hidden,
)
from painlessinferenceacceleration_tpu.models.hf_loader import (
    params_from_torch_model,
)
from painlessinferenceacceleration_tpu.ops.attention import causal_qmask


def hf_logits(model, ids):
    import torch

    with torch.no_grad():
        out = model(torch.tensor([ids], dtype=torch.long)).logits[0]
    return out.float().numpy()


def fresh_cache(cfg):
    ecfg = EngineConfig(page_size=16, max_seq_len=128, max_concurrency=4)
    kv = init_kv_cache(cfg, ecfg, dtype=jnp.float32)
    return ecfg, kv


def page_table(ecfg, req=0):
    p = ecfg.pages_per_req
    return jnp.arange(1 + req * p, 1 + (req + 1) * p, dtype=jnp.int32)[None]


def full_logits(params, cfg, ids):
    ecfg, kv = fresh_cache(cfg)
    T = len(ids)
    h, _ = transformer_hidden(
        params, cfg, kv, jnp.array([ids], jnp.int32),
        jnp.arange(T, dtype=jnp.int32)[None], page_table(ecfg),
        jnp.zeros((1,), jnp.int32), causal_qmask(T)[None],
    )
    return np.asarray(logits_from_hidden(params, cfg, h)[0])


@pytest.fixture(scope="module")
def gpt2_fixture():
    torch = pytest.importorskip("torch")
    from transformers import GPT2Config, GPT2LMHeadModel

    torch.manual_seed(0)
    hf_cfg = GPT2Config(
        vocab_size=512, n_embd=64, n_layer=3, n_head=4, n_positions=512,
        activation_function="gelu_new", layer_norm_epsilon=1e-5,
        attn_pdrop=0.0, embd_pdrop=0.0, resid_pdrop=0.0,
    )
    model = GPT2LMHeadModel(hf_cfg).eval()
    cfg = ModelConfig.tiny_gpt2()
    params = params_from_torch_model(model, cfg, dtype=jnp.float32)
    return model, cfg, params


@pytest.fixture(scope="module")
def bloom_fixture():
    torch = pytest.importorskip("torch")
    from transformers import BloomConfig, BloomForCausalLM

    torch.manual_seed(0)
    hf_cfg = BloomConfig(
        vocab_size=512, hidden_size=64, n_layer=3, n_head=4,
        layer_norm_epsilon=1e-5, attention_dropout=0.0, hidden_dropout=0.0,
    )
    model = BloomForCausalLM(hf_cfg).eval()
    cfg = ModelConfig.tiny_bloom()
    params = params_from_torch_model(model, cfg, dtype=jnp.float32)
    return model, cfg, params


def test_gpt2_prefill_parity(gpt2_fixture):
    model, cfg, params = gpt2_fixture
    ids = [3, 17, 250, 9, 101, 44, 7]
    np.testing.assert_allclose(
        full_logits(params, cfg, ids), hf_logits(model, ids),
        rtol=2e-4, atol=2e-4,
    )


def test_gpt2_incremental_decode(gpt2_fixture):
    model, cfg, params = gpt2_fixture
    prompt = [3, 17, 250, 9]
    ecfg, kv = fresh_cache(cfg)
    pt = page_table(ecfg)
    kv, next_tok, _ = prefill_step(
        params, kv, cfg, jnp.array([prompt], jnp.int32),
        jnp.zeros((1,), jnp.int32), jnp.array([len(prompt)], jnp.int32), pt,
    )
    seq = list(prompt)
    assert int(hf_logits(model, seq)[-1].argmax()) == int(next_tok[0])
    ctx, cur = len(prompt), int(next_tok[0])
    for _ in range(4):
        seq.append(cur)
        t, p, qm, par = decode_inputs(
            jnp.array([cur], jnp.int32), jnp.array([ctx], jnp.int32)
        )
        kv, out_tokens, n_acc = verify_step(
            params, kv, cfg, t, p, qm, par, pt,
            jnp.array([ctx], jnp.int32), jnp.ones((1,), bool),
        )
        cur = int(out_tokens[0, 0])
        assert int(hf_logits(model, seq)[-1].argmax()) == cur
        ctx += 1


def test_bloom_prefill_parity(bloom_fixture):
    model, cfg, params = bloom_fixture
    ids = [3, 17, 250, 9, 101, 44, 7]
    np.testing.assert_allclose(
        full_logits(params, cfg, ids), hf_logits(model, ids),
        rtol=3e-4, atol=3e-4,
    )


def test_bloom_incremental_decode(bloom_fixture):
    """ALiBi must hold under the paged incremental path too."""
    model, cfg, params = bloom_fixture
    prompt = [3, 17, 250, 9, 55]
    ecfg, kv = fresh_cache(cfg)
    pt = page_table(ecfg)
    kv, next_tok, _ = prefill_step(
        params, kv, cfg, jnp.array([prompt], jnp.int32),
        jnp.zeros((1,), jnp.int32), jnp.array([len(prompt)], jnp.int32), pt,
    )
    seq = list(prompt)
    assert int(hf_logits(model, seq)[-1].argmax()) == int(next_tok[0])
    ctx, cur = len(prompt), int(next_tok[0])
    for _ in range(3):
        seq.append(cur)
        t, p, qm, par = decode_inputs(
            jnp.array([cur], jnp.int32), jnp.array([ctx], jnp.int32)
        )
        kv, out_tokens, _ = verify_step(
            params, kv, cfg, t, p, qm, par, pt,
            jnp.array([ctx], jnp.int32), jnp.ones((1,), bool),
        )
        cur = int(out_tokens[0, 0])
        assert int(hf_logits(model, seq)[-1].argmax()) == cur
        ctx += 1


def test_chatglm_chunked_prefill_consistency():
    """Partial interleaved rope + MQA: chunked == single-shot prefill."""
    cfg = ModelConfig.tiny_chatglm()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    ids = [3, 17, 250, 9, 101, 44, 7, 88, 12, 31]
    ref = full_logits(params, cfg, ids)

    ecfg, kv = fresh_cache(cfg)
    pt = page_table(ecfg)
    kv, _, _ = prefill_step(
        params, kv, cfg, jnp.array([ids[:6]], jnp.int32),
        jnp.zeros((1,), jnp.int32), jnp.array([6], jnp.int32), pt,
    )
    kv, _, logits = prefill_step(
        params, kv, cfg, jnp.array([ids[6:]], jnp.int32),
        jnp.array([6], jnp.int32), jnp.array([4], jnp.int32), pt,
    )
    np.testing.assert_allclose(np.asarray(logits[0]), ref[-1], rtol=2e-5, atol=2e-5)
    # the rotary half really is partial: inv_freq covers D/2 pairs
    from painlessinferenceacceleration_tpu.ops.rope import rope_inv_freq

    assert rope_inv_freq(cfg).shape[0] == cfg.head_dim // 4


def test_legacy_from_hf_configs():
    g = ModelConfig.from_hf({"model_type": "gpt2", "n_embd": 96, "n_layer": 2,
                             "n_head": 6, "vocab_size": 300})
    assert g.position_embedding_type == "learned" and g.norm_type == "layernorm"
    assert g.hidden_size == 96 and g.intermediate_size == 384 and not g.gated_mlp
    b = ModelConfig.from_hf({"model_type": "bloom", "hidden_size": 128,
                             "n_layer": 2, "n_head": 8, "vocab_size": 300})
    assert b.position_embedding_type == "alibi" and b.embed_layernorm
    c = ModelConfig.from_hf({
        "model_type": "chatglm", "hidden_size": 128, "num_layers": 2,
        "num_attention_heads": 8, "multi_query_group_num": 2,
        "ffn_hidden_size": 256, "padded_vocab_size": 300, "add_qkv_bias": True,
    })
    assert c.num_key_value_heads == 2 and c.partial_rotary_factor == 0.5
    assert c.rope_interleaved and c.vocab_size == 300


def test_alibi_slopes_formula():
    from painlessinferenceacceleration_tpu.ops.attention import alibi_slopes

    s8 = np.asarray(alibi_slopes(8))
    np.testing.assert_allclose(s8, [2.0 ** (-i) for i in range(1, 9)], rtol=1e-6)
    s12 = np.asarray(alibi_slopes(12))  # non-power-of-2 head count
    assert s12.shape == (12,) and np.all(s12 > 0)
