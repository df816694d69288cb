"""PPL target-scoring mode (reference: Req.target_ids / sampler targeting)."""

import math

import numpy as np

import jax
import jax.numpy as jnp

from painlessinferenceacceleration_tpu.config import EngineConfig, ModelConfig
from painlessinferenceacceleration_tpu.engine.llm import LLM
from painlessinferenceacceleration_tpu.engine.request import SamplingParams
from painlessinferenceacceleration_tpu.ipad.train_forward import forward_logits
from painlessinferenceacceleration_tpu.models.base import init_params


def test_target_logprobs_match_full_forward():
    cfg = ModelConfig.tiny()
    params = init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    ecfg = EngineConfig(page_size=16, max_seq_len=128, max_concurrency=4,
                        prefill_chunk=32, eos_token_id=-2)
    llm = LLM(cfg=cfg, params=params, ecfg=ecfg, dtype=jnp.float32)
    prompt = [5, 6, 7, 8]
    targets = [9, 10, 11]
    req = llm.add_request(prompt, target_ids=targets)
    while req.state != "finished":
        llm.step()
    assert req.finish_reason == "score"
    assert len(req.target_logprobs) == 3

    # oracle: full forward log-softmax
    full = prompt + targets
    logits = np.asarray(forward_logits(params, cfg, jnp.array([full], jnp.int32))[0])
    logp = logits - np.log(np.exp(logits - logits.max(-1, keepdims=True)).sum(-1, keepdims=True)) - logits.max(-1, keepdims=True)
    for i, t in enumerate(targets):
        ref = logp[len(prompt) - 1 + i, t]
        assert math.isclose(req.target_logprobs[i], float(ref), rel_tol=1e-3, abs_tol=1e-3)


def test_option_ranking():
    """Higher-likelihood continuations score higher (option scoring use)."""
    cfg = ModelConfig.tiny()
    params = init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    ecfg = EngineConfig(page_size=16, max_seq_len=128, max_concurrency=4,
                        prefill_chunk=32, eos_token_id=-2)
    llm = LLM(cfg=cfg, params=params, ecfg=ecfg, dtype=jnp.float32)
    # greedy continuation should beat a random one
    g = llm.generate([[5, 6, 7]], SamplingParams(max_new_tokens=3))[0]
    greedy_cont = g.output_ids
    r1 = llm.add_request([5, 6, 7], target_ids=greedy_cont)
    r2 = llm.add_request([5, 6, 7], target_ids=[1, 2, 3])
    while r1.state != "finished" or r2.state != "finished":
        llm.step()
    assert sum(r1.target_logprobs) > sum(r2.target_logprobs)
