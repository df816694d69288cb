"""Differential test: C++ trie vs the Python trie on random workloads."""

import numpy as np
import pytest

from painlessinferenceacceleration_tpu.lookahead import DraftCache

native = pytest.importorskip(
    "painlessinferenceacceleration_tpu.lookahead.native"
)


@pytest.fixture(scope="module")
def ncls():
    if native.load_native() is None:
        pytest.skip("g++ build unavailable")
    return native.NativeDraftCache


def test_basic_parity(ncls):
    py = DraftCache(eos_ids=(0,))
    cc = ncls(eos_ids=(0,))
    seq = [5, 6, 7, 8, 9, 6, 7, 8, 11]
    for c in (py, cc):
        c.put(seq, branch_length=4, mode="output")
    for q in ([5, 6], [6, 7], [8, 9], [1, 2]):
        a = py.hier_get(q, decoding_length=16, branch_length=4)
        b = cc.hier_get(q, decoding_length=16, branch_length=4)
        assert a[0] == b[0], (q, a[0], b[0])
        np.testing.assert_array_equal(a[1], b[1])
        assert a[2] == b[2]


def test_random_differential(ncls):
    rng = np.random.default_rng(0)
    py = DraftCache(eos_ids=())
    cc = ncls(eos_ids=())
    for _ in range(30):
        doc = rng.integers(1, 40, rng.integers(3, 40)).tolist()
        for c in (py, cc):
            c.put(doc, branch_length=6, mode="output")
    for _ in range(100):
        q = rng.integers(1, 40, 2).tolist()
        a = py.hier_get(q, decoding_length=24, branch_length=6)
        b = cc.hier_get(q, decoding_length=24, branch_length=6)
        assert a[0] == b[0], (q, a[0], b[0])
        np.testing.assert_array_equal(a[1], b[1])
        assert a[2] == b[2]
        ao = py.one_get(q, decoding_length=24, branch_length=6)
        bo = cc.one_get(q, decoding_length=24, branch_length=6)
        assert ao[0] == bo[0]


def test_stream_put_parity(ncls):
    py = DraftCache(eos_ids=())
    cc = ncls(eos_ids=())
    chunks = [[1, 2, 3], [4, 5, 6, 7], [2, 3, 4]]
    for c in (py, cc):
        for ch in chunks:
            c.stream_put(ch, branch_length=4, idx=0)
        c.stream_put([], branch_length=4, final=True, idx=0)
    for q in ([1, 2], [3, 4], [6, 7]):
        a = py.hier_get(q, decoding_length=16, branch_length=4)
        b = cc.hier_get(q, decoding_length=16, branch_length=4)
        assert a[0] == b[0], q


def test_native_is_faster(ncls):
    import time

    rng = np.random.default_rng(0)
    docs = [rng.integers(10, 32000, 512).tolist() for _ in range(8)]
    py = DraftCache(eos_ids=())
    cc = ncls(eos_ids=())
    t0 = time.perf_counter()
    for d in docs:
        py.put(d, branch_length=12, mode="output")
    t_py = time.perf_counter() - t0
    t0 = time.perf_counter()
    for d in docs:
        cc.put(d, branch_length=12, mode="output")
    t_cc = time.perf_counter() - t0
    assert t_cc < t_py / 3, (t_py, t_cc)


def test_native_save_load_roundtrip(tmp_path):
    """Native trie persistence (capability parity with DraftCache
    save_mem/load_mem, reference lookahead_cache.py:578): retrievals after
    a save/load round-trip are identical; fresh() empties the cache."""
    from painlessinferenceacceleration_tpu.lookahead.native import (
        NativeDraftCache,
        load_native,
    )

    if load_native() is None:
        import pytest

        pytest.skip("native trie unavailable")
    c = NativeDraftCache(eos_ids=(-2,))
    seqs = [[5, 6, 7, 8, 9, 6, 7, 8], [6, 7, 8, 10, 11], [7, 8, 9, 6, 7]]
    for s in seqs:
        c.put(s, branch_length=4)
        c.stream_put(s[:3], branch_length=4, idx=1)
        c.stream_put(s[3:], branch_length=4, final=True, idx=1)
    want = c.hier_get([6, 7], decoding_length=16, branch_length=4)

    path = str(tmp_path / "trie.bin")
    c.save_mem(path)

    c2 = NativeDraftCache(eos_ids=(-2,))
    c2.load_mem(path)
    got = c2.hier_get([6, 7], decoding_length=16, branch_length=4)
    assert got[0] == want[0]
    assert (got[1] == want[1]).all()
    assert got[2] == want[2]

    c2.fresh()
    empty = c2.hier_get([6, 7], decoding_length=16, branch_length=4)
    assert len(empty[0]) <= 1  # bare fallback only
