"""Parity of the JAX decoder vs HF transformers (torch CPU oracle).

The reference's correctness story is "examples print identical outputs with
and without lookahead" (lookahead/scripts/tests.sh). Here we assert logits
parity against HF directly on a tiny random llama (fp32), covering prefill,
incremental decode and the paged KV path.
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
    logits_from_hidden,
    transformer_hidden,
)
from painlessinferenceacceleration_tpu.models.hf_loader import (
    params_from_torch_model,
)
from painlessinferenceacceleration_tpu.ops.attention import causal_qmask


@pytest.fixture(scope="module")
def hf_fixture():
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    hf_cfg = LlamaConfig(
        vocab_size=512,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=3,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=256,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        tie_word_embeddings=False,
        attention_bias=False,
    )
    model = LlamaForCausalLM(hf_cfg).eval()
    cfg = ModelConfig.tiny()
    params = params_from_torch_model(model, cfg, dtype=jnp.float32)
    return model, cfg, params


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


def test_prefill_logits_match_hf(hf_fixture):
    model, cfg, params = hf_fixture
    ids = [3, 17, 250, 9, 101, 44, 7]
    ref = hf_logits(model, ids)

    ecfg, kv = fresh_cache(cfg)
    T = len(ids)
    tokens = jnp.array([ids], dtype=jnp.int32)
    pos = jnp.arange(T, dtype=jnp.int32)[None]
    qmask = causal_qmask(T)[None]
    h, kv = transformer_hidden(
        params, cfg, kv, tokens, pos, page_table(ecfg),
        jnp.zeros((1,), jnp.int32), qmask,
    )
    logits = logits_from_hidden(params, cfg, h)[0]
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=2e-4, atol=2e-4)


def test_incremental_decode_matches_full_forward(hf_fixture):
    """prefill + paged KV decode steps == HF full-context logits."""
    model, cfg, params = hf_fixture
    prompt = [3, 17, 250, 9]
    n_steps = 5
    ecfg, kv = fresh_cache(cfg)
    pt = page_table(ecfg)

    tokens = jnp.array([prompt], dtype=jnp.int32)
    kv, next_tok, logits = prefill_step(
        params, kv, cfg, tokens,
        jnp.zeros((1,), jnp.int32), jnp.array([len(prompt)], jnp.int32), pt,
    )
    seq = list(prompt)
    ctx = len(prompt)
    out = [int(next_tok[0])]
    ref_full = hf_logits(model, seq)
    assert int(ref_full[-1].argmax()) == out[0]

    for _ in range(n_steps):
        seq.append(out[-1])
        t, p, qm, par = decode_inputs(
            jnp.array([out[-1]], jnp.int32), jnp.array([ctx], jnp.int32)
        )
        kv, out_tokens, n_acc = verify_step(
            params, kv, cfg, t, p, qm, par, pt,
            jnp.array([ctx], jnp.int32), jnp.ones((1,), bool),
        )
        assert int(n_acc[0]) == 1
        nxt = int(out_tokens[0, 0])
        ref = hf_logits(model, seq)
        assert int(ref[-1].argmax()) == nxt
        out.append(nxt)
        ctx += 1


def test_chunked_prefill_matches_single_shot(hf_fixture):
    model, cfg, params = hf_fixture
    ids = [3, 17, 250, 9, 101, 44, 7, 88, 12, 31]
    ecfg, kv = fresh_cache(cfg)
    pt = page_table(ecfg)
    # two chunks: 6 + 4 (reference chunked prefill: flood llm.py:666-759)
    c1, c2 = ids[:6], ids[6:]
    kv, _, _ = prefill_step(
        params, kv, cfg, jnp.array([c1], jnp.int32),
        jnp.zeros((1,), jnp.int32), jnp.array([6], jnp.int32), pt,
    )
    kv, next_tok, logits = prefill_step(
        params, kv, cfg, jnp.array([c2], jnp.int32),
        jnp.array([6], jnp.int32), jnp.array([4], jnp.int32), pt,
    )
    ref = hf_logits(model, ids)
    np.testing.assert_allclose(
        np.asarray(logits[0]), ref[-1], rtol=2e-4, atol=2e-4
    )


def test_padded_chunk_is_ignored(hf_fixture):
    """Padding tokens in a prefill chunk must not disturb logits."""
    model, cfg, params = hf_fixture
    ids = [3, 17, 250, 9, 101]
    ecfg, kv = fresh_cache(cfg)
    pt = page_table(ecfg)
    padded = ids + [0, 0, 0]
    kv, next_tok, logits = prefill_step(
        params, kv, cfg, jnp.array([padded], jnp.int32),
        jnp.zeros((1,), jnp.int32), jnp.array([len(ids)], jnp.int32), pt,
    )
    ref = hf_logits(model, ids)
    np.testing.assert_allclose(
        np.asarray(logits[0]), ref[-1], rtol=2e-4, atol=2e-4
    )


def test_llama31_rope_scaling_parity():
    """YaRN-family rope scaling vs HF (llama3 rule)."""
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(1)
    rs = {
        "rope_type": "llama3",
        "factor": 4.0,
        "low_freq_factor": 1.0,
        "high_freq_factor": 4.0,
        "original_max_position_embeddings": 64,
    }
    hf_cfg = LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rms_norm_eps=1e-5, rope_theta=10000.0,
        rope_scaling=rs, tie_word_embeddings=False,
    )
    model = LlamaForCausalLM(hf_cfg).eval()
    cfg = ModelConfig(
        vocab_size=256, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rms_norm_eps=1e-5, rope_scaling=rs,
    )
    from painlessinferenceacceleration_tpu.models.hf_loader import (
        params_from_torch_model as _pfm,
    )

    params = _pfm(model, cfg, dtype=jnp.float32)
    ids = [3, 17, 50, 9, 101, 44, 7]
    ref = hf_logits(model, ids)
    from painlessinferenceacceleration_tpu.engine.cache import init_kv_cache as _ik

    ecfg = EngineConfig(page_size=16, max_seq_len=128, max_concurrency=2)
    kv = _ik(cfg, ecfg, dtype=jnp.float32)
    T = len(ids)
    pt = jnp.arange(1, 1 + ecfg.pages_per_req, dtype=jnp.int32)[None]
    h, _ = transformer_hidden(
        params, cfg, kv, jnp.array([ids], jnp.int32),
        jnp.arange(T, dtype=jnp.int32)[None], pt, jnp.zeros((1,), jnp.int32),
        causal_qmask(T)[None],
    )
    logits = logits_from_hidden(params, cfg, h)[0]
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=3e-4, atol=3e-4)


def test_yarn_rope_parity_vs_hf():
    """ops/rope.py yarn branch (reference YarnRope, flood/layers/rope.py
    :112-236) vs transformers' _compute_yarn_parameters: inverse
    frequencies AND the attention factor must match."""
    import pytest
    from transformers import LlamaConfig
    from transformers.modeling_rope_utils import ROPE_INIT_FUNCTIONS

    from painlessinferenceacceleration_tpu.config import ModelConfig
    from painlessinferenceacceleration_tpu.ops.rope import (
        rope_inv_freq,
        yarn_mscale,
    )

    rs = {"rope_type": "yarn", "factor": 4.0,
          "original_max_position_embeddings": 1024,
          "beta_fast": 32.0, "beta_slow": 1.0}
    hf_cfg = LlamaConfig(
        hidden_size=256, num_attention_heads=4, num_key_value_heads=4,
        rope_theta=10000.0, rope_scaling=dict(rs),
        max_position_embeddings=4096,
    )
    inv_hf, att_hf = ROPE_INIT_FUNCTIONS["yarn"](hf_cfg, device="cpu")

    cfg = ModelConfig.tiny(
        hidden_size=256, num_attention_heads=4, num_key_value_heads=4,
        rope_theta=10000.0, rope_scaling=rs, max_position_embeddings=4096,
    )
    np.testing.assert_allclose(
        np.asarray(rope_inv_freq(cfg)), inv_hf.cpu().numpy(),
        rtol=1e-6, atol=0,
    )
    assert yarn_mscale(cfg) == pytest.approx(float(att_hf), rel=1e-6)
