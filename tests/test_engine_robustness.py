"""Engine robustness: memory pressure, preemption, sampled spec decoding,
stop sequences, seeds, chunked scoring.

Covers the failure modes the round-1 review found (decode-phase page
exhaustion silently corrupting requests) and the reference behaviors they
map to (flood llm.py:848-871 waits-parking; pretrained_model.py:827-860
sampled verification).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from painlessinferenceacceleration_tpu.config import EngineConfig, ModelConfig
from painlessinferenceacceleration_tpu.engine.llm import LLM
from painlessinferenceacceleration_tpu.engine.request import SamplingParams
from painlessinferenceacceleration_tpu.models.base import init_params


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig.tiny()
    params = init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    return cfg, params


def make_llm(cfg, params, **over):
    kw = dict(
        page_size=16,
        max_seq_len=256,
        max_concurrency=8,
        prefill_chunk=32,
        eos_token_id=-2,
        decode_buckets=(1, 2, 4, 8),
    )
    kw.update(over)
    return LLM(cfg=cfg, params=params, ecfg=EngineConfig(**kw), dtype=jnp.float32)


PROMPTS = [[7, 8, 9, 10, 11], [100, 200, 300], [42, 43, 44, 45]]


def test_oversubscribed_arena_token_identical(setup):
    """Decode under an arena too small for all residents at full length:
    requests must park/preempt, never corrupt (round-1 review Weak #1)."""
    cfg, params = setup
    ample = make_llm(cfg, params)
    expect = [r.output_ids for r in
              ample.generate(PROMPTS, SamplingParams(max_new_tokens=60))]

    # 9 usable pages; each request needs ~5 at full length -> constant pressure
    tight = make_llm(cfg, params, num_pages=10)
    outs = tight.generate(PROMPTS, SamplingParams(max_new_tokens=60))
    assert [r.output_ids for r in outs] == expect
    # all pages come back
    assert tight.allocator.free_pages == tight.ecfg.num_pages - 1


def test_manual_preemption_recompute_identical(setup):
    """Preempting a mid-decode request (pages reclaimed, replayed via
    chunked prefill) must not change its tokens."""
    cfg, params = setup
    ref = make_llm(cfg, params)
    expect = ref.generate([PROMPTS[0]], SamplingParams(max_new_tokens=40))[0]

    llm = make_llm(cfg, params)
    req = llm.add_request(PROMPTS[0], SamplingParams(max_new_tokens=40))
    while len(req.output_ids) < 10:
        llm.step()
    llm._preempt(req)
    assert req.state == "queued" and not req.pages
    while req.state != "finished":
        llm.step()
    assert req.output_ids == expect.output_ids
    assert llm.metrics.preempted == 1


def test_sampled_spec_decoding_lossless(setup):
    """Seeded sampled generation: spec on == spec off token-identical
    (reference sampled verification, pretrained_model.py:827-860)."""
    cfg, params = setup
    sp = SamplingParams(max_new_tokens=80, temperature=0.9, top_k=12, seed=7)
    ref = make_llm(cfg, params, max_seq_len=512)
    expect = ref.generate([PROMPTS[0]], sp)[0]

    llm = make_llm(cfg, params, max_seq_len=512, use_lookahead=True,
                   decoding_length=12, branch_length=6,
                   use_spec_min_batch_size=4)
    out = llm.generate([PROMPTS[0]], sp)[0]
    assert out.output_ids == expect.output_ids
    assert llm.metrics.spec_steps > 0


def test_seed_reproducibility_and_min_p(setup):
    cfg, params = setup
    sp = SamplingParams(max_new_tokens=24, temperature=1.0, top_p=0.9,
                        min_p=0.05, seed=123)
    a = make_llm(cfg, params).generate([PROMPTS[1]], sp)[0]
    b = make_llm(cfg, params).generate([PROMPTS[1]], sp)[0]
    assert a.output_ids == b.output_ids  # same seed -> same stream

    sp2 = SamplingParams(max_new_tokens=24, temperature=1.0, top_p=0.9,
                         min_p=0.05, seed=124)
    c = make_llm(cfg, params).generate([PROMPTS[1]], sp2)[0]
    assert len(c.output_ids) == 24  # different seed still generates


def test_prompt_too_long_rejected(setup):
    cfg, params = setup
    llm = make_llm(cfg, params, max_seq_len=64)
    req = llm.add_request(list(range(5, 5 + 70)), SamplingParams(max_new_tokens=4))
    assert req.state == "finished"
    assert req.finish_reason.startswith("error")
    # engine still serves normal traffic afterwards
    ok = llm.generate([PROMPTS[0]], SamplingParams(max_new_tokens=4))[0]
    assert len(ok.output_ids) == 4


def test_stop_sequences(setup):
    cfg, params = setup
    probe = make_llm(cfg, params).generate(
        [PROMPTS[0]], SamplingParams(max_new_tokens=12)
    )[0]
    stop = probe.output_ids[3:5]
    llm = make_llm(cfg, params)
    out = llm.generate(
        [PROMPTS[0]],
        SamplingParams(max_new_tokens=12, stop_sequences=[stop]),
    )[0]
    assert out.output_ids == probe.output_ids[:5]
    assert out.finish_reason == "stop_sequence"


def test_chunked_scoring_matches_single_chunk(setup):
    """PPL scoring of prompt+targets longer than prefill_chunk iterates
    chunks (reference iterate_target, flood request.py:57)."""
    cfg, params = setup
    rng = np.random.default_rng(0)
    prompt = [int(x) for x in rng.integers(5, 500, 40)]
    targets = [int(x) for x in rng.integers(5, 500, 12)]

    big = make_llm(cfg, params, prefill_chunk=128)
    r1 = big.add_request(prompt, target_ids=targets)
    while r1.state != "finished":
        big.step()

    small = make_llm(cfg, params, prefill_chunk=16)
    r2 = small.add_request(prompt, target_ids=targets)
    while r2.state != "finished":
        small.step()

    np.testing.assert_allclose(r1.target_logprobs, r2.target_logprobs,
                               rtol=1e-4, atol=1e-5)


def test_randomized_soak_scheduler_invariance(setup):
    """Randomized soak: many requests with random lengths through a SMALL
    arena with lookahead, prefix cache, chunked prefill, and pipelined
    decode all active — every output must equal the same request's solo
    run (scheduling, eviction, and spec decisions must never leak into
    tokens). fp32 keeps batch-shape padding from flipping argmax ties."""
    cfg, params = setup
    rng = np.random.default_rng(7)
    prompts = []
    for i in range(10):
        n = int(rng.integers(4, 56))
        base = rng.integers(5, cfg.vocab_size - 5, size=max(n // 2, 2))
        # half the prompts repeat (spec-friendly), half are pure noise
        toks = (list(base) * 3)[:n] if i % 2 == 0 else list(
            rng.integers(5, cfg.vocab_size - 5, size=n)
        )
        prompts.append([int(t) for t in toks])
    sp = SamplingParams(max_new_tokens=24)

    kw = dict(max_seq_len=128, max_concurrency=3, prefill_chunk=16,
              use_lookahead=True, decoding_length=10, branch_length=4,
              use_spec_min_batch_size=3)
    batch = make_llm(cfg, params, **kw)
    got = [r.output_ids for r in batch.generate(prompts, sp)]
    assert all(len(t) == 24 for t in got)

    solo = make_llm(cfg, params, **kw)
    for p, want in zip(prompts, got):
        assert solo.generate([p], sp)[0].output_ids == want
