"""Sampling ops + engine integration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from painlessinferenceacceleration_tpu.config import EngineConfig, ModelConfig
from painlessinferenceacceleration_tpu.engine.llm import LLM
from painlessinferenceacceleration_tpu.engine.request import SamplingParams
from painlessinferenceacceleration_tpu.models.base import init_params
from painlessinferenceacceleration_tpu.ops.sample import sample_tokens, target_logprobs


def test_greedy_rows_take_argmax():
    logits = jnp.asarray(np.random.default_rng(0).normal(size=(4, 50)).astype(np.float32))
    out = sample_tokens(
        logits, jax.random.PRNGKey(0),
        temperature=jnp.array([0.0, 0.0, 1.0, 0.0]),
        top_k=jnp.zeros(4, jnp.int32), top_p=jnp.ones(4),
    )
    ref = jnp.argmax(logits, -1)
    for i in (0, 1, 3):
        assert int(out[i]) == int(ref[i])


def test_top_k_restricts_support():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(1, 100)).astype(np.float32))
    topk_ids = set(np.asarray(jnp.argsort(logits[0])[::-1][:5]).tolist())
    for s in range(30):
        out = sample_tokens(
            logits, jax.random.PRNGKey(s),
            temperature=jnp.array([1.5]), top_k=jnp.array([5], jnp.int32),
            top_p=jnp.ones(1),
        )
        assert int(out[0]) in topk_ids


def test_top_p_restricts_support():
    # peaked distribution: nucleus at p=0.5 is a single token
    logits = jnp.asarray(np.array([[10.0, 0.0, 0.0, 0.0]], np.float32))
    for s in range(10):
        out = sample_tokens(
            logits, jax.random.PRNGKey(s),
            temperature=jnp.array([1.0]), top_k=jnp.zeros(1, jnp.int32),
            top_p=jnp.array([0.5]),
        )
        assert int(out[0]) == 0


def test_target_logprobs():
    logits = jnp.asarray(np.random.default_rng(0).normal(size=(6, 40)).astype(np.float32))
    tgt = jnp.asarray(np.arange(6, dtype=np.int32))
    lp = target_logprobs(logits, tgt)
    ref = np.asarray(jax.nn.log_softmax(logits, -1))[np.arange(6), np.arange(6)]
    np.testing.assert_allclose(np.asarray(lp), ref, rtol=1e-6)


def test_engine_sampled_generation_deterministic_per_seed():
    cfg = ModelConfig.tiny()
    params = init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    ecfg = EngineConfig(page_size=16, max_seq_len=256, max_concurrency=4, eos_token_id=-2)
    sp = SamplingParams(temperature=0.8, top_k=50, max_new_tokens=16)
    llm = LLM(cfg=cfg, params=params, ecfg=ecfg, dtype=jnp.float32)
    a = llm.generate([[5, 6, 7]], sp)[0].output_ids
    llm2 = LLM(cfg=cfg, params=params, ecfg=ecfg, dtype=jnp.float32)
    b = llm2.generate([[5, 6, 7]], sp)[0].output_ids
    assert a == b  # same engine seed -> deterministic
    assert len(a) == 16
    # sampled differs from greedy (overwhelmingly likely on 16 tokens)
    llm3 = LLM(cfg=cfg, params=params, ecfg=ecfg, dtype=jnp.float32)
    g = llm3.generate([[5, 6, 7]], SamplingParams(max_new_tokens=16))[0].output_ids
    assert a != g


def test_repetition_penalty_blocks_cycles():
    cfg = ModelConfig.tiny()
    params = init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    ecfg = EngineConfig(page_size=16, max_seq_len=512, max_concurrency=2, eos_token_id=-2)
    llm = LLM(cfg=cfg, params=params, ecfg=ecfg, dtype=jnp.float32)
    g = llm.generate([[7, 8, 9]], SamplingParams(max_new_tokens=120))[0].output_ids

    def cycle_frac(seq):
        from collections import Counter

        c = Counter(zip(seq, seq[1:]))
        return sum(v - 1 for v in c.values()) / max(len(seq) - 1, 1)

    llm2 = LLM(cfg=cfg, params=params, ecfg=ecfg, dtype=jnp.float32)
    r = llm2.generate(
        [[7, 8, 9]],
        SamplingParams(max_new_tokens=120, repetition_penalty=1.8),
    )[0].output_ids
    assert len(r) == 120
    assert cycle_frac(r) < cycle_frac(g), (cycle_frac(r), cycle_frac(g))
