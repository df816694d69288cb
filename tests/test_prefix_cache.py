"""Prefix caching: page-granular shared-prefix KV reuse.

Reference: flood's share=1 shared-prefix slots (flood/utils/batch.py:35-48,
allocate :900-952). Checks: (1) chained-hash match/register/evict unit
semantics; (2) a repeated prompt skips its cached prefix at admission and
produces identical tokens; (3) eviction under page pressure keeps the
engine correct."""

import numpy as np

import jax
import jax.numpy as jnp

from painlessinferenceacceleration_tpu.config import EngineConfig, ModelConfig
from painlessinferenceacceleration_tpu.engine.llm import LLM
from painlessinferenceacceleration_tpu.engine.pages import PageAllocator
from painlessinferenceacceleration_tpu.engine.prefix_cache import PrefixCache
from painlessinferenceacceleration_tpu.engine.request import SamplingParams
from painlessinferenceacceleration_tpu.models.base import init_params


def test_unit_match_register_evict():
    alloc = PageAllocator(num_pages=32, page_size=4)
    pc = PrefixCache(alloc, page_size=4)
    toks = list(range(100, 117))  # 17 tokens -> 4 full pages
    pages = alloc.allocate(5)
    added = pc.register(toks, pages)
    assert added == 4
    assert [alloc.refs[p] for p in pages[:4]] == [2, 2, 2, 2]

    hit, n = pc.match(toks)
    assert hit == pages[:4] and n == 16
    # full-sequence cap: an exactly-page-aligned sequence matches one page
    # short (at least one token must go through prefill)
    hit2, n2 = pc.match(toks[:16])
    assert n2 == 12 and hit2 == pages[:3]
    # diverging block breaks the chain
    div = toks[:8] + [999] * 9
    hit3, n3 = pc.match(div)
    assert n3 == 8 and hit3 == pages[:2]

    free_before = alloc.free_pages
    alloc.free(pages)  # request finishes; cache still holds its refs
    assert [alloc.refs[p] for p in pages[:4]] == [1, 1, 1, 1]
    pc.evict(2)
    assert alloc.free_pages == free_before + 1 + 2  # partial page + 2 evicted
    hit4, n4 = pc.match(toks)
    assert n4 <= 8  # LRU evicts the chain head first


def _build(ps=16, max_seq=256, conc=4, prefix_cache=True, num_pages=0):
    cfg = ModelConfig.tiny()
    ecfg = EngineConfig(
        page_size=ps, max_seq_len=max_seq, max_concurrency=conc,
        prefix_cache=prefix_cache, num_pages=num_pages,
    )
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    return LLM(cfg=cfg, params=params, ecfg=ecfg, dtype=jnp.float32)


def test_engine_shared_prefix_identical_tokens():
    rng = np.random.default_rng(3)
    prompt = rng.integers(10, 300, size=49).tolist()  # 3 full pages @ ps=16
    samp = SamplingParams(max_new_tokens=24)

    base = _build(prefix_cache=False)
    want = base.generate([prompt], samp)[0].output_ids

    llm = _build(prefix_cache=True)
    r1 = llm.generate([prompt], samp)[0]
    hits_after_first = llm.metrics.prefix_hit_tokens
    assert hits_after_first == 0
    free_mid = llm.allocator.free_pages
    r2 = llm.generate([prompt], samp)[0]
    assert r1.output_ids == want
    assert r2.output_ids == want, "prefix-cached decode diverged"
    assert llm.metrics.prefix_hit_tokens == 48  # 3 pages matched
    # second run reused the cached pages: at most the fresh tail pages moved
    assert llm.allocator.free_pages >= free_mid - 2


def test_engine_prefix_hit_mid_flight_batch():
    """Two same-prefix requests in one batch: the second admission may run
    before the first registers; outputs must match the uncached engine."""
    rng = np.random.default_rng(5)
    shared = rng.integers(10, 300, size=32).tolist()
    p1 = shared + rng.integers(10, 300, size=5).tolist()
    p2 = shared + rng.integers(10, 300, size=9).tolist()
    samp = SamplingParams(max_new_tokens=16)

    base = _build(prefix_cache=False)
    w1, w2 = [r.output_ids for r in base.generate([p1, p2], samp)]
    llm = _build(prefix_cache=True)
    g1, g2 = [r.output_ids for r in llm.generate([p1, p2], samp)]
    # run p2 again: now the shared prefix is cached from p1/p2's prefill
    g2b = llm.generate([p2], samp)[0].output_ids
    assert (g1, g2) == (w1, w2)
    assert g2b == w2
    assert llm.metrics.prefix_hit_tokens >= 32


def test_eviction_under_page_pressure():
    """A tiny arena forces cache eviction at admission; requests still get
    correct pages and identical outputs to the uncached engine."""
    rng = np.random.default_rng(7)
    prompts = [rng.integers(10, 300, size=40).tolist() for _ in range(4)]
    samp = SamplingParams(max_new_tokens=12)

    base = _build(prefix_cache=False, conc=2, num_pages=2 * 16 + 1)
    want = [base.generate([p], samp)[0].output_ids for p in prompts]
    llm = _build(prefix_cache=True, conc=2, num_pages=2 * 16 + 1)
    got = [llm.generate([p], samp)[0].output_ids for p in prompts]
    assert got == want
    # rerun the first prompt; its pages may have been evicted — correctness
    # must hold either way
    again = llm.generate([prompts[0]], samp)[0].output_ids
    assert again == want[0]


def test_eviction_cannot_reclaim_matched_pages():
    """Regression: _admit must retain matched prefix pages BEFORE _reserve
    may evict them — otherwise eviction frees the matched pages and
    allocate() hands them back as 'fresh', silently corrupting the shared
    prefix (the request skips re-prefilling it)."""
    rng = np.random.default_rng(11)
    prompt = rng.integers(10, 300, size=48).tolist()  # 3 full pages @ ps=16
    long_p = rng.integers(10, 300, size=60).tolist()
    samp = SamplingParams(max_new_tokens=10)

    def build(pc):
        # 8 usable pages: A's cached prefix (3) + C resident (5 max) leave
        # almost nothing free when B arrives
        return _build(prefix_cache=pc, conc=2, num_pages=9)

    base = build(False)
    want_b = base.generate([prompt], samp)[0].output_ids

    llm = build(True)
    llm.generate([prompt], samp)  # A: populates the cache, then finishes
    # C (long, holds pages) and B (same prefix as A) arrive together
    rc = llm.add_request(long_p, SamplingParams(max_new_tokens=12))
    rb = llm.add_request(prompt, samp)
    while rb.state != "finished" or rc.state != "finished":
        llm.step()
    assert rb.output_ids == want_b, "shared prefix corrupted under eviction pressure"


def test_prefix_cache_with_spec_decode_lossless():
    """Cross-feature: a prefix-cached admission followed by lookahead spec
    decode must stay token-identical to the uncached, non-spec engine."""
    import dataclasses

    rng = np.random.default_rng(13)
    prompt = ([17, 18, 19, 20, 21] * 7)[:34]  # repetitive: drafts fire
    samp = SamplingParams(max_new_tokens=20)

    base = _build(prefix_cache=False)
    want = base.generate([prompt], samp)[0].output_ids

    cfg = ModelConfig.tiny()
    ecfg = EngineConfig(page_size=16, max_seq_len=256, max_concurrency=4,
                        prefix_cache=True, use_lookahead=True,
                        decoding_length=13, branch_length=4,
                        use_spec_min_batch_size=4, eos_token_id=-2)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    llm = LLM(cfg=cfg, params=params, ecfg=ecfg, dtype=jnp.float32)
    first = llm.generate([prompt], samp)[0].output_ids
    second = llm.generate([prompt], samp)[0].output_ids  # prefix-cached
    assert first == want
    assert second == want
    assert llm.metrics.prefix_hit_tokens == 32  # 2 full pages
    assert llm.metrics.spec_steps > 0
