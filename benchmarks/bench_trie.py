"""Host-trie latency benchmark (reference: lookahead/benchmarks
perf_check_trie, benchmark.py:353 + trie_benchmark.py).

The trie query sits on the host path of the classic LOOKAHEAD API; this
measures put/get latency at realistic sizes.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import numpy as np

from painlessinferenceacceleration_tpu.lookahead import DraftCache


def main():
    rng = np.random.default_rng(0)
    cache = DraftCache(eos_ids=())
    # warm with many streams
    docs = [rng.integers(10, 32000, 512).tolist() for _ in range(64)]
    t0 = time.perf_counter()
    for d in docs:
        cache.put(d, branch_length=12, mode="output")
    put_ms = (time.perf_counter() - t0) / len(docs) * 1000
    n_nodes = sum(t.n_node for t in cache.mem.values())
    print(f"put: {put_ms:.2f} ms per 512-token doc; trie nodes {n_nodes}")

    queries = [d[i : i + 2] for d in docs for i in (10, 100, 400)]
    t0 = time.perf_counter()
    total = 0
    for q in queries:
        ids, mask, parents, sizes = cache.hier_get(
            q, decoding_length=64, branch_length=12
        )
        total += len(ids)
    get_us = (time.perf_counter() - t0) / len(queries) * 1e6
    print(f"hier_get: {get_us:.0f} us/query, mean draft {total/len(queries):.1f} tokens")

    t0 = time.perf_counter()
    for q in queries[:100]:
        cache.one_get(q, decoding_length=64, branch_length=12)
    print(f"one_get: {(time.perf_counter()-t0)/100*1e6:.0f} us/query")


if __name__ == "__main__":
    main()
