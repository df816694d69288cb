"""Continuous-batching engine tests.

Correctness bar the reference never asserts (SURVEY §4): batched continuous
serving must produce the SAME tokens as one-at-a-time generation.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from painlessinferenceacceleration_tpu.config import EngineConfig, ModelConfig
from painlessinferenceacceleration_tpu.engine.llm import LLM
from painlessinferenceacceleration_tpu.engine.pages import PageAllocator
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
    ecfg = EngineConfig(**kw)
    return LLM(cfg=cfg, params=params, ecfg=ecfg, dtype=jnp.float32)


PROMPTS = [[7, 8, 9, 10, 11], [100, 200, 300], [42, 43], [5, 6, 7]]


def test_page_allocator():
    a = PageAllocator(num_pages=10, page_size=16)
    p1 = a.allocate(4)
    assert len(p1) == 4 and 0 not in p1
    p2 = a.allocate(5)
    assert len(p2) == 5
    assert a.allocate(1) is None  # exhausted (9 usable)
    a.free(p1)
    assert a.free_pages == 4
    lst = list(p2)
    assert a.ensure_capacity(lst, 16 * 7)
    assert len(lst) == 7


def test_single_request_matches_generator(setup):
    cfg, params = setup
    llm = make_llm(cfg, params)
    out = llm.generate([PROMPTS[0]], SamplingParams(max_new_tokens=24))
    assert len(out[0].output_ids) == 24

    from painlessinferenceacceleration_tpu.lookahead.generate import LookaheadGenerator

    ecfg2 = EngineConfig(page_size=16, max_seq_len=256, max_concurrency=2, eos_token_id=-2)
    g = LookaheadGenerator(params, cfg, ecfg2, dtype=jnp.float32)
    ref = g.generate(PROMPTS[0], use_lookahead=False, max_new_tokens=24)
    assert out[0].output_ids == ref.sequences


def test_batch_matches_individual(setup):
    cfg, params = setup
    llm = make_llm(cfg, params)
    outs = llm.generate(PROMPTS, SamplingParams(max_new_tokens=16))
    llm2 = make_llm(cfg, params)
    for p, o in zip(PROMPTS, outs):
        solo = llm2.generate([p], SamplingParams(max_new_tokens=16))[0]
        assert o.output_ids == solo.output_ids, p


def test_more_requests_than_slots(setup):
    cfg, params = setup
    llm = make_llm(cfg, params, max_concurrency=2)
    prompts = [[int(x) for x in np.random.default_rng(i).integers(5, 500, 4)] for i in range(6)]
    outs = llm.generate(prompts, SamplingParams(max_new_tokens=8))
    assert all(len(o.output_ids) == 8 for o in outs)
    # all pages returned after completion
    assert llm.allocator.free_pages == llm.ecfg.num_pages - 1


def test_eos_finishes_request(setup):
    cfg, params = setup
    llm = make_llm(cfg, params)
    probe = llm.generate([PROMPTS[1]], SamplingParams(max_new_tokens=6))[0]
    eos = probe.output_ids[2]
    llm2 = make_llm(cfg, params)
    out = llm2.generate(
        [PROMPTS[1]], SamplingParams(max_new_tokens=20, eos_token_id=eos)
    )[0]
    assert out.output_ids == probe.output_ids[:3]
    assert out.finish_reason == "stop"


def test_streaming(setup):
    cfg, params = setup
    llm = make_llm(cfg, params)
    got = list(llm.stream_generate(PROMPTS[0], SamplingParams(max_new_tokens=12)))
    llm2 = make_llm(cfg, params)
    ref = llm2.generate([PROMPTS[0]], SamplingParams(max_new_tokens=12))[0]
    assert got == ref.output_ids


def test_spec_mode_lossless_in_engine(setup):
    cfg, params = setup
    llm = make_llm(cfg, params, max_seq_len=512, use_lookahead=True,
                   decoding_length=12, branch_length=6,
                   use_spec_min_batch_size=4)
    out = llm.generate([PROMPTS[0]], SamplingParams(max_new_tokens=120))[0]
    llm2 = make_llm(cfg, params, max_seq_len=512)
    ref = llm2.generate([PROMPTS[0]], SamplingParams(max_new_tokens=120))[0]
    assert out.output_ids == ref.output_ids
    assert llm.metrics.spec_steps > 0


def test_background_loop(setup):
    cfg, params = setup
    llm = make_llm(cfg, params)
    llm.launch()
    try:
        outs = llm.generate(PROMPTS[:2], SamplingParams(max_new_tokens=10))
        assert all(len(o.output_ids) == 10 for o in outs)
    finally:
        llm.shutdown()


def test_metrics_populated(setup):
    cfg, params = setup
    llm = make_llm(cfg, params)
    llm.generate(PROMPTS[:2], SamplingParams(max_new_tokens=8))
    s = llm.metrics.summary()
    assert s["finished"] == 2
    assert s["generated_tokens"] == 16
    assert s["p50_ttft_s"] > 0


def test_multimodal_embedding_splice(setup):
    """Precomputed embeddings spliced at prompt positions must behave exactly
    like the tokens whose embedding rows they equal (reference: flood
    multimodal emb_idx windows)."""
    cfg, params = setup
    llm = make_llm(cfg, params)
    ref = llm.generate([[5, 6, 7, 8]], SamplingParams(max_new_tokens=8))[0]

    llm2 = make_llm(cfg, params)
    emb = np.asarray(params["embed"])[[6, 7]]  # embeddings of tokens 6, 7
    req = llm2.add_request(
        [5, 0, 0, 8], SamplingParams(max_new_tokens=8),
        mm_embeds=emb, mm_positions=[1, 2],
    )
    while req.state != "finished":
        llm2.step()
    assert req.output_ids == ref.output_ids


@pytest.mark.parametrize("policy", ["mix", "timely"])
def test_schedule_policies_match_pingpong(setup, policy):
    """mix/timely are scheduling-policy variants: same greedy tokens as
    pingpong (reference schedulers llm.py:587/1060/1298)."""
    cfg, params = setup
    ref = make_llm(cfg, params)
    expect = [r.output_ids for r in
              ref.generate(PROMPTS, SamplingParams(max_new_tokens=16))]
    llm = make_llm(cfg, params, schedule_policy=policy)
    # stagger arrivals so prefill and decode genuinely overlap
    reqs = [llm.add_request(PROMPTS[0], SamplingParams(max_new_tokens=16)),
            llm.add_request(PROMPTS[1], SamplingParams(max_new_tokens=16))]
    for _ in range(3):
        llm.step()
    reqs += [llm.add_request(p, SamplingParams(max_new_tokens=16))
             for p in PROMPTS[2:]]
    while any(r.state != "finished" for r in reqs):
        llm.step()
    assert [r.output_ids for r in reqs] == expect


def test_mix_policy_serves_sampled_rows(setup):
    """Sampled requests ride mix batches too: counter-mode sampling at the
    burst stream positions makes mix token-identical to the pingpong burst
    path for sampled rows (reference mode-10 mix has no greedy carve-out,
    flood/utils/batch.py:605)."""
    cfg, params = setup
    sp_g = SamplingParams(max_new_tokens=12)
    sp_s = SamplingParams(max_new_tokens=12, temperature=0.8, top_k=50, seed=7)

    def run(policy):
        llm = make_llm(cfg, params, schedule_policy=policy)
        greedy = llm.add_request(PROMPTS[0], sp_g)
        sampled = llm.add_request(PROMPTS[1], sp_s)
        late = None
        n = 0
        while any(r.state != "finished" for r in (greedy, sampled)):
            llm.step()
            n += 1
            if n == 2:  # keep prefill work in flight mid-decode
                late = llm.add_request(
                    PROMPTS[2], SamplingParams(max_new_tokens=4)
                )
        while late is not None and late.state != "finished":
            llm.step()
        return greedy.output_ids, sampled.output_ids

    ref_g, ref_s = run("pingpong")
    mix_g, mix_s = run("mix")
    assert len(mix_s) == 12
    assert mix_g == ref_g
    assert mix_s == ref_s


def test_kv_bytes_and_auto_sizing():
    """HBM-based cache sizing (reference: free-VRAM segment sizing).
    On backends without memory stats it falls back to the default."""
    from painlessinferenceacceleration_tpu.engine.cache import (
        auto_size_pages,
        kv_bytes_per_page,
    )

    cfg = ModelConfig.tiny()
    ecfg = EngineConfig(page_size=16, max_seq_len=128, max_concurrency=4,
                        cache_memory_fraction=0.5)
    per = kv_bytes_per_page(cfg, ecfg, jnp.float32)
    # [L=3, ps=16, HkD=2*16] k+v fp32
    assert per == 3 * 16 * 32 * 4 * 2
    n = auto_size_pages(cfg, ecfg, jnp.float32)
    assert 2 <= n <= ecfg.max_concurrency * ecfg.pages_per_req + 1
    # engine constructs and serves with auto sizing enabled
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    llm = LLM(cfg=cfg, params=params, ecfg=ecfg, dtype=jnp.float32)
    assert llm.ecfg.num_pages == n
    out = llm.generate([[5, 6, 7]], SamplingParams(max_new_tokens=4))[0]
    assert len(out.output_ids) == 4


def test_pipelined_decode_token_identical():
    """The pipelined (dispatch-then-drain) decode path must emit exactly the
    tokens of a step-by-step engine: force chaining by making one request
    decode alone through many bursts, mixing greedy and sampled rows."""
    cfg = ModelConfig.tiny()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    prompts = [[5, 6, 7, 8] * 4, [9, 10, 11]]
    samps = [SamplingParams(max_new_tokens=40),
             SamplingParams(max_new_tokens=33, temperature=0.8, top_k=20,
                            seed=7)]

    def run(burst):
        ecfg = EngineConfig(page_size=16, max_seq_len=256, max_concurrency=4,
                            eos_token_id=-2, decode_burst=burst,
                            decode_burst_idle=burst)
        llm = LLM(cfg=cfg, params=params, ecfg=ecfg, dtype=jnp.float32)
        reqs = [llm.add_request(p, s) for p, s in zip(prompts, samps)]
        while any(r.state != "finished" for r in reqs):
            llm.step()
        # one speculative chained burst may still be in flight when the last
        # request finishes; draining it must be a no-op for outputs
        llm._drain_pending()
        assert llm._pending is None
        return [r.output_ids for r in reqs]

    a = run(2)   # many chained bursts
    b = run(8)   # fewer, larger bursts
    assert a == b
    assert len(a[0]) == 40 and len(a[1]) == 33


def test_spec_cooldown_gates_to_ar_on_novel_traffic():
    """Chunk-level adaptive gate (round-4 review #3): when a spec burst's
    draft retrieval runs dry (novel prompts, cold tables), the engine
    falls back to AR bursts for spec_cooldown_bursts — and the emitted
    streams stay identical to the spec-off engine."""
    import numpy as np

    cfg = ModelConfig.tiny()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    rng = np.random.default_rng(5)
    # incompressible prompts: distinct random ids, no 2-gram repeats
    prompts = [rng.integers(5, cfg.vocab_size - 5, 24).tolist()
               for _ in range(3)]
    sp = SamplingParams(max_new_tokens=40)

    outs = {}
    metrics = {}
    for spec_on in (False, True):
        ecfg = EngineConfig(
            page_size=16, max_seq_len=256, max_concurrency=4,
            eos_token_id=-7, use_lookahead=spec_on,
            use_spec_min_batch_size=8, decode_burst=4,
            decode_burst_idle=8, spec_cooldown_bursts=3,
        )
        llm = LLM(cfg=cfg, params=params, ecfg=ecfg, dtype=jnp.float32)
        reqs = llm.generate(prompts, sp)
        outs[spec_on] = [r.output_ids for r in reqs]
        metrics[spec_on] = llm.metrics
    assert outs[True] == outs[False]
    m = metrics[True]
    assert m.spec_steps > 0  # spec was tried
    assert m.decode_steps > 0  # ...and the cooldown gated to AR bursts
    # retrieval on random streams mostly misses
    assert m.spec_wide_steps < m.spec_steps
