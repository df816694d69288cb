"""On-device multi-step decode loops: AR and device-table lookahead.

These are the TPU-native serving hot paths (engine/multistep.py): the whole
decode loop — draft retrieval, tree verify, KV compaction, table updates —
runs inside one jit. Correctness bar: bit-identical to the single-step path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from painlessinferenceacceleration_tpu.config import EngineConfig, ModelConfig
from painlessinferenceacceleration_tpu.engine.cache import init_kv_cache
from painlessinferenceacceleration_tpu.engine.multistep import (
    multistep_decode,
    multistep_spec_decode,
)
from painlessinferenceacceleration_tpu.engine.step import prefill_step
from painlessinferenceacceleration_tpu.lookahead.device_tables import (
    DraftTableConfig,
    build_tree_inputs,
    init_draft_tables,
    retrieve_drafts,
    update_tables_seq,
)
from painlessinferenceacceleration_tpu.models.base import init_params


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig.tiny()
    ecfg = EngineConfig(page_size=16, max_seq_len=512, max_concurrency=2)
    params = init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    return cfg, ecfg, params


def _prefill(cfg, ecfg, params, prompt):
    kv = init_kv_cache(cfg, ecfg, dtype=jnp.float32)
    P = ecfg.pages_per_req
    pt = jnp.arange(1, 1 + P, dtype=jnp.int32)[None]
    kv, nxt, _ = prefill_step(
        params, kv, cfg, jnp.array([prompt], jnp.int32),
        jnp.zeros((1,), jnp.int32), jnp.array([len(prompt)], jnp.int32), pt,
    )
    return kv, nxt, pt


# ---------------------------------------------------------------------------
# device draft tables
# ---------------------------------------------------------------------------


def test_table_update_and_retrieve():
    tcfg = DraftTableConfig(buckets=64, ways=4, branch_length=4, retrieve_count=2)
    tables = init_draft_tables(tcfg)
    seq = jnp.array([1, 2, 3, 4, 5, 6, 7, 8], jnp.int32)
    tables = update_tables_seq(tables, tcfg, seq, jnp.int32(8))
    branches, freqs = retrieve_drafts(tables, tcfg, jnp.int32(1), jnp.int32(2))
    assert float(freqs[0]) > 0
    np.testing.assert_array_equal(np.asarray(branches[0]), [3, 4, 5, 6])


def test_table_freq_bump_on_repeat():
    tcfg = DraftTableConfig(buckets=64, ways=4, branch_length=3, retrieve_count=2)
    tables = init_draft_tables(tcfg)
    seq = jnp.array([1, 2, 3, 4, 5], jnp.int32)
    for _ in range(3):
        tables = update_tables_seq(tables, tcfg, seq, jnp.int32(5))
    _, freqs = retrieve_drafts(tables, tcfg, jnp.int32(1), jnp.int32(2))
    assert float(freqs[0]) == 3.0


def test_table_distinct_continuations_occupy_ways():
    tcfg = DraftTableConfig(buckets=64, ways=4, branch_length=3, retrieve_count=4)
    tables = init_draft_tables(tcfg)
    tables = update_tables_seq(tables, tcfg, jnp.array([1, 2, 7, 8, 9], jnp.int32), jnp.int32(5))
    tables = update_tables_seq(tables, tcfg, jnp.array([1, 2, 5, 6, 4], jnp.int32), jnp.int32(5))
    branches, freqs = retrieve_drafts(tables, tcfg, jnp.int32(1), jnp.int32(2))
    firsts = set(int(b[0]) for b, f in zip(np.asarray(branches), np.asarray(freqs)) if f > 0)
    assert firsts == {7, 5}


def test_build_tree_inputs_layout():
    branches = jnp.array([[5, 6, -1], [9, -1, -1]], jnp.int32)
    toks, parents, qmask, depth = build_tree_inputs(jnp.int32(3), branches)
    Q = 7
    assert toks.shape == (Q,)
    np.testing.assert_array_equal(np.asarray(toks), [3, 5, 6, 0, 9, 0, 0])
    np.testing.assert_array_equal(np.asarray(parents), [-1, 0, 1, -2, 0, -2, -2])
    np.testing.assert_array_equal(np.asarray(depth), [0, 1, 2, 0, 1, 0, 0])
    m = np.asarray(qmask)
    assert m[2, 1] and m[2, 0] and not m[2, 4]  # branch-0 chain
    assert m[4, 0] and not m[4, 1]  # branch 1 sees only root


def test_win_filter_new_vs_extension():
    tcfg = DraftTableConfig(buckets=64, ways=4, branch_length=3, retrieve_count=2)
    tables = init_draft_tables(tcfg)
    seq = jnp.array([1, 2, 3, 4, 5, 6], jnp.int32)
    # new token span = positions [4, 6) (values 5, 6):
    #   new windows: i=2 (prefix (3,4)), i=3 (prefix (4,5))
    #   window i=0 (prefix (1,2), branch at 2..4) is an extension candidate
    #   but has no existing entry -> must NOT be created
    tables = update_tables_seq(tables, tcfg, seq, jnp.int32(6),
                               win_lo=jnp.int32(4), win_hi=jnp.int32(6))
    _, f12 = retrieve_drafts(tables, tcfg, jnp.int32(1), jnp.int32(2))
    _, f34 = retrieve_drafts(tables, tcfg, jnp.int32(3), jnp.int32(4))
    assert float(f12[0]) == 0.0
    assert float(f34[0]) == 1.0


def test_extension_fills_pads_without_freq_bump():
    tcfg = DraftTableConfig(buckets=64, ways=4, branch_length=4, retrieve_count=2)
    tables = init_draft_tables(tcfg)
    seq = jnp.array([1, 2, 3, 4, 5, 6, 7], jnp.int32)
    # step 1: tokens up to position 4 exist; window (1,2) created with
    # branch [3, 4, -1, -1]
    tables = update_tables_seq(tables, tcfg, seq, jnp.int32(5),
                               win_lo=jnp.int32(0), win_hi=jnp.int32(5))
    br, fr = retrieve_drafts(tables, tcfg, jnp.int32(1), jnp.int32(2))
    np.testing.assert_array_equal(np.asarray(br[0]), [3, 4, 5, -1])
    assert float(fr[0]) == 1.0
    # step 2: two more tokens arrive; the (1,2) window extends, no freq bump
    tables = update_tables_seq(tables, tcfg, seq, jnp.int32(7),
                               win_lo=jnp.int32(5), win_hi=jnp.int32(7))
    br, fr = retrieve_drafts(tables, tcfg, jnp.int32(1), jnp.int32(2))
    np.testing.assert_array_equal(np.asarray(br[0]), [3, 4, 5, 6])
    assert float(fr[0]) == 1.0


# ---------------------------------------------------------------------------
# multistep loops
# ---------------------------------------------------------------------------


def test_multistep_decode_matches_singlestep(setup):
    cfg, ecfg, params = setup
    prompt = [7, 8, 9, 10, 11]
    kv, nxt, pt = _prefill(cfg, ecfg, params, prompt)
    ctx = jnp.array([len(prompt)], jnp.int32)
    kv, toks, last, ctx2, act, _ = multistep_decode(
        params, kv, cfg, nxt, ctx, jnp.ones((1,), bool), pt, n_steps=20,
    )
    seq_multi = [int(nxt[0])] + np.asarray(toks[0]).tolist()

    from painlessinferenceacceleration_tpu.lookahead.generate import LookaheadGenerator

    g = LookaheadGenerator(params, cfg, ecfg, dtype=jnp.float32)
    ref = g.generate(prompt, use_lookahead=False, max_new_tokens=21)
    assert seq_multi == ref.sequences


def test_multistep_decode_eos_stops(setup):
    cfg, ecfg, params = setup
    prompt = [7, 8, 9, 10, 11]
    kv, nxt, pt = _prefill(cfg, ecfg, params, prompt)
    ctx = jnp.array([len(prompt)], jnp.int32)
    kv, toks0, last, ctx2, act, _ = multistep_decode(
        params, kv, cfg, nxt, ctx, jnp.ones((1,), bool), pt, n_steps=3,
    )
    eos = int(toks0[0, 1])  # stop at the 2nd generated-after-prefill token
    kv2, nxt2, pt2 = _prefill(cfg, ecfg, params, prompt)
    kv2, toks, last2, ctx3, act2, _ = multistep_decode(
        params, kv2, cfg, nxt2, ctx, jnp.ones((1,), bool), pt2,
        n_steps=10, eos=eos,
    )
    arr = np.asarray(toks[0])
    assert arr[1] == eos
    assert (arr[2:] == -1).all()
    assert not bool(act2[0])


def test_multistep_spec_lossless_and_accelerating(setup):
    cfg, ecfg, params = setup
    prompt = [7, 8, 9, 10, 11]
    tcfg = DraftTableConfig(buckets=512, ways=4, branch_length=6, retrieve_count=2)

    # reference: pure AR on-device loop
    kv, nxt, pt = _prefill(cfg, ecfg, params, prompt)
    ctx = jnp.array([len(prompt)], jnp.int32)
    kv, toks, *_ = multistep_decode(
        params, kv, cfg, nxt, ctx, jnp.ones((1,), bool), pt, n_steps=400,
    )
    ref_seq = [int(nxt[0])] + np.asarray(toks[0]).tolist()

    # spec decode with device tables
    kv2, nxt2, pt2 = _prefill(cfg, ecfg, params, prompt)
    tables = init_draft_tables(tcfg)
    TAIL = tcfg.branch_length + 2
    tail = np.full((1, TAIL), -1, np.int32)
    seed = prompt + [int(nxt2[0])]
    tail[0, -len(seed):] = seed[-TAIL:]
    # warm the tables with the prompt (reference puts prompt n-grams)
    tables = update_tables_seq(
        tables, tcfg, jnp.array(seed, jnp.int32), jnp.int32(len(seed))
    )
    out_all = [int(nxt2[0])]
    state = (nxt2, ctx, jnp.ones((1,), bool), jnp.asarray(tail))
    accs = []
    while len(out_all) < len(ref_seq) - 40:
        kv2, tables, out_toks, n_acc, last, ctx_, act, tl, _ = multistep_spec_decode(
            params, kv2, tables, cfg, tcfg, state[0], state[1], state[2],
            state[3], pt2, n_steps=10,
        )
        state = (last, ctx_, act, tl)
        for s in range(out_toks.shape[1]):
            k = int(n_acc[0, s])
            out_all.extend(int(x) for x in np.asarray(out_toks[0, s])[:k])
            if k:
                accs.append(k)
    n = min(len(out_all), len(ref_seq))
    assert out_all[:n] == ref_seq[:n], (out_all[:40], ref_seq[:40])
    # once the stream develops repeats, tables must accelerate; early cold
    # steps drag the mean, so check the warm half
    warm = accs[len(accs) // 2 :]
    assert np.mean(warm) > 1.3, (np.mean(warm), warm[:40])


# ---------------------------------------------------------------------------
# adaptive draft gating (round-4 review #3)
# ---------------------------------------------------------------------------


def test_adaptive_gate_token_identical_and_engages(setup):
    """With adaptive gating on, (a) the emitted stream is bit-identical to
    the non-adaptive fixed-width run, and (b) steps where no draft is
    retrievable actually run the narrow width-1 branch (wide_mask False)."""
    cfg, ecfg, params = setup
    tcfg_on = DraftTableConfig(
        buckets=64, ways=4, branch_length=4, retrieve_count=2, adaptive=True
    )
    tcfg_off = DraftTableConfig(
        buckets=64, ways=4, branch_length=4, retrieve_count=2, adaptive=False
    )
    prompt = [3, 1, 4, 1, 5, 9, 2, 6]

    def run(tcfg):
        kv, nxt, pt = _prefill(cfg, ecfg, params, prompt)
        tables = init_draft_tables(tcfg)
        TAIL = tcfg.branch_length + 2
        tail = np.full((1, TAIL), -1, np.int32)
        seed = prompt + [int(nxt[0])]
        tail[0, -len(seed):] = seed[-TAIL:]
        tables = update_tables_seq(
            tables, tcfg, jnp.array(seed, jnp.int32), jnp.int32(len(seed))
        )
        out_all = [int(nxt[0])]
        state = (nxt, jnp.array([len(prompt)], jnp.int32),
                 jnp.ones((1,), bool), jnp.asarray(tail))
        wide_flags = []
        for _ in range(6):
            kv, tables, out_toks, n_acc, last, ctx_, act, tl, wides = (
                multistep_spec_decode(
                    params, kv, tables, cfg, tcfg, state[0], state[1],
                    state[2], state[3], pt, n_steps=10,
                )
            )
            state = (last, ctx_, act, tl)
            wide_flags.extend(bool(w) for w in np.asarray(wides))
            for s in range(out_toks.shape[1]):
                k = int(n_acc[0, s])
                out_all.extend(int(x) for x in np.asarray(out_toks[0, s])[:k])
        return out_all, wide_flags

    out_on, wides_on = run(tcfg_on)
    out_off, wides_off = run(tcfg_off)
    n = min(len(out_on), len(out_off))
    assert out_on[:n] == out_off[:n], (out_on[:40], out_off[:40])
    # the draft-retrievable probe is mode-independent (same tables/stream)
    assert wides_on == wides_off
    # the cold random-weight stream must miss at least once early on
    # (those steps run the narrow branch under adaptive=True) and hit once
    # the stream develops repeats
    assert not all(wides_on), wides_on
    assert any(wides_on), wides_on


def test_adaptive_gate_novel_teacher_stream(setup):
    """Teacher-forced replay over a stream with no 2-gram repeats: every
    retrieval misses, so ALL steps must gate to the narrow branch and still
    emit the teacher stream exactly (one token per step)."""
    cfg, ecfg, params = setup
    tcfg = DraftTableConfig(
        buckets=64, ways=4, branch_length=4, retrieve_count=2, adaptive=True
    )
    # strictly increasing tokens: no 2-gram ever repeats
    stream = list(range(10, 138))
    prompt = stream[:16]
    kv, nxt, pt = _prefill(cfg, ecfg, params, prompt)
    teacher = jnp.asarray([stream], jnp.int32)
    nxt = teacher[:, len(prompt)]
    tables = init_draft_tables(tcfg)
    TAIL = tcfg.branch_length + 2
    tail = np.full((1, TAIL), -1, np.int32)
    seed = prompt + [int(nxt[0])]
    tail[0, -TAIL:] = seed[-TAIL:]
    tables = update_tables_seq(
        tables, tcfg, jnp.array(seed, jnp.int32), jnp.int32(len(seed))
    )
    out_all = [int(nxt[0])]
    state = (nxt, jnp.array([len(prompt)], jnp.int32),
             jnp.ones((1,), bool), jnp.asarray(tail))
    wide_flags = []
    for _ in range(4):
        kv, tables, out_toks, n_acc, last, ctx_, act, tl, wides = (
            multistep_spec_decode(
                params, kv, tables, cfg, tcfg, state[0], state[1],
                state[2], state[3], pt, n_steps=8, teacher=teacher,
            )
        )
        state = (last, ctx_, act, tl)
        wide_flags.extend(bool(w) for w in np.asarray(wides))
        for s in range(out_toks.shape[1]):
            k = int(n_acc[0, s])
            out_all.extend(int(x) for x in np.asarray(out_toks[0, s])[:k])
    assert not any(wide_flags), wide_flags  # every step gated narrow
    want = stream[len(prompt): len(prompt) + len(out_all)]
    assert out_all == want, (out_all[:20], want[:20])
