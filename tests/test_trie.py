"""Trie draft-cache semantics.

Expected values for single/multi-branch retrieval mirror the reference's one
hermetic unit test (lookahead/tests/test_lookahead_cache.py:16-46), plus
coverage the reference lacks: parents, par_get layout, stream_put windowing,
squeeze eviction law, persistence round-trip.
"""

import numpy as np

from painlessinferenceacceleration_tpu.lookahead import DraftCache, TokenTrie


def test_get_one_branch_chain():
    tree = TokenTrie(1)
    tree.put([2, 3, 4], mode="output", idx=-1)
    ids, mask, parents, sizes = tree.get(
        [], max_size=63, max_length=8, output_weight=1e-4, mode="mix", idx=0
    )
    assert ids == [1, 2, 3, 4]
    ref = np.array([[1, 0, 0, 0], [1, 1, 0, 0], [1, 1, 1, 0], [1, 1, 1, 1]])
    assert (mask == ref).all()
    assert parents == [-1, 0, 1, 2]


def test_get_multi_branches():
    tree = TokenTrie(1)
    tree.put([2, 3], mode="output", idx=-1)
    tree.put([2, 4], mode="output", idx=-1)
    ids, mask, parents, sizes = tree.get(
        [], max_size=63, max_length=8, output_weight=1e-4, mode="mix", idx=0
    )
    assert ids == [1, 2, 3, 4]
    ref = np.array([[1, 0, 0, 0], [1, 1, 0, 0], [1, 1, 1, 0], [1, 1, 0, 1]])
    assert (mask == ref).all()
    assert parents == [-1, 0, 1, 1]


def test_match_walks_query_suffix():
    tree = TokenTrie(1)
    tree.put([2, 3, 4, 5], mode="output", idx=-1)
    # query [2, 3]: root should be 3, drafting continues with 4, 5
    ids, mask, parents, _ = tree.get([2, 3], max_size=8, max_length=8, mode="mix")
    assert ids == [3, 4, 5]
    assert parents == [-1, 0, 1]


def test_budget_prefers_hot_branch():
    tree = TokenTrie(1)
    for _ in range(5):
        tree.put([2, 3, 4], mode="output", idx=-1)
    tree.put([2, 7, 8], mode="output", idx=-1)
    ids, mask, parents, _ = tree.get([], max_size=4, max_length=8, mode="mix")
    # hot branch (3,4) fills the budget before the cold sibling 7
    assert ids == [1, 2, 3, 4]


def test_hier_get_via_cache():
    cache = DraftCache(eos_ids=(0,))
    cache.put([5, 6, 7, 8, 9], branch_length=4, mode="output")
    ids, mask, parents, sizes = cache.hier_get([5, 6], decoding_length=16, branch_length=4)
    assert ids[0] == 6
    assert ids[:4] == [6, 7, 8, 9]


def test_eos_truncation():
    cache = DraftCache(eos_ids=(2,))
    cache.put([5, 6, 2, 7, 8], branch_length=4, mode="output")
    # nothing after eos is inserted
    ids, _, _, _ = cache.hier_get([6], decoding_length=8, branch_length=4)
    assert 7 not in ids and 8 not in ids


def test_stream_put_windowing():
    cache = DraftCache(eos_ids=())
    cache.stream_put([1, 2, 3], branch_length=4, idx=0)
    cache.stream_put([4, 5, 6, 7], branch_length=4, idx=0)
    cache.stream_put([], branch_length=4, final=True, idx=0)
    ids, _, _, _ = cache.hier_get([1, 2], decoding_length=16, branch_length=4)
    assert ids[:4] == [2, 3, 4, 5]
    # n-gram spanning the two stream chunks was inserted exactly once
    tree = cache.mem[3]
    node = tree.root[4]
    assert node.out_freq == 1.0


def test_squeeze_eviction_law():
    tree = TokenTrie(1, max_node=4, max_output_node=4)
    for _ in range(3):
        tree.put([2, 3], mode="output", idx=-1)
    tree.put([4, 5, 6], mode="output", idx=-1)  # freq-1 chain
    assert tree.n_node == 5
    tree.squeeze()
    # freq>1 nodes halved and kept; freq<=1 dropped
    assert 2 in tree.root and 4 not in tree.root
    assert tree.root[2].out_freq == 1.5


def test_input_freq_reset_on_final():
    cache = DraftCache(eos_ids=())
    cache.put([1, 2, 3, 4], branch_length=4, mode="input", idx=7, final=True)
    # after final, input freqs for idx 7 are zeroed -> no draft in input mode
    ids, mask, _, _ = cache.hier_get([1], decoding_length=8, branch_length=4, mode="input", idx=7)
    assert len(ids) == 1 and mask.shape == (1, 1)


def test_par_get_layout():
    cache = DraftCache(eos_ids=())
    cache.put([1, 2, 3], branch_length=4, mode="output")
    cache.put([1, 2, 4], branch_length=4, mode="output")
    ids, mask, parents, sizes = cache.par_get([1], decoding_length=16, branch_length=4)
    # branches laid out sequentially, each causal within itself, root visible
    n = len(ids)
    assert ids[0] == 1
    assert mask.shape == (n, n)
    assert (mask[:, 0] == 1).all()
    for r in range(1, n):
        assert mask[r, r] == 1


def test_bat_get_sub_budget():
    cache = DraftCache(eos_ids=())
    cache.put(list(range(1, 30)), branch_length=8, mode="output")
    outs = cache.bat_get([[3], [10]], decoding_length=16, branch_length=8)
    assert len(outs) == 2
    for ids, mask, parents, sizes in outs:
        assert len(ids) <= 8 + 1  # sub-budget = 16 // 2


def test_persistence_roundtrip(tmp_path):
    cache = DraftCache(eos_ids=())
    cache.put([1, 2, 3, 4], branch_length=4, mode="output")
    p = str(tmp_path / "mem.json")
    cache.save_mem(p)
    fresh = DraftCache(eos_ids=())
    fresh.load_mem(p)
    ids, _, _, _ = fresh.hier_get([1, 2], decoding_length=8, branch_length=4)
    assert ids[:3] == [2, 3, 4]
