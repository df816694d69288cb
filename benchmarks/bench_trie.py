"""Host-trie latency benchmark at reference scale (lookahead/benchmarks
perf_check_trie, benchmark.py:353 + trie_benchmark.py).

The trie query sits on the host path of the classic LOOKAHEAD API (qts in
the reference's stats); for it to stay hidden behind the device step, a
hier_get must complete well under the ~6.6 ms 7B decode step. This bench
drives BOTH trie implementations (python lookahead/trie.py and native C++
csrc/trie.cpp via ctypes) through ~1M token insertions at max_node=65536
with squeeze pressure, and records put / hier_get latency histograms
(p50/p90/p99) plus node-count trajectories.

Scenarios:
- text:    the BPE FAQ corpus cycled with zipf block repetition — realistic
           token distribution; hot first-token tries hit max_node and squeeze
- uniform: random ids over a 512-token vocab — adversarial concentration
           (every trie is hot), worst-case squeeze churn

Env: TRIE_BENCH_TOKENS (default 1_000_000), TRIE_BENCH_JSON (artifact path).
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import time

import numpy as np

from painlessinferenceacceleration_tpu.lookahead import DraftCache

DEVICE_STEP_MS = 6.6  # 7B int4 AR step on v5e (BENCH_r04 151 tok/s)


def text_stream(n_tokens: int, seed: int = 0):
    from benchmarks.bpe import load_default

    tok = load_default()
    text = open(_os.path.join(
        _os.path.dirname(_os.path.abspath(__file__)), "corpus.txt"
    )).read()
    blocks = ["Question:" + b for b in text.split("Question:") if b.strip()]
    bids = [tok.encode(b) for b in blocks]
    rng = np.random.default_rng(seed)
    nb = len(bids)
    w = 1.0 / np.arange(1, nb + 1) ** 1.1
    w /= w.sum()
    out = []
    while len(out) < n_tokens:
        out.extend(bids[int(rng.choice(nb, p=w))])
    return out[:n_tokens]


def uniform_stream(n_tokens: int, vocab: int = 512, seed: int = 0):
    rng = np.random.default_rng(seed)
    return rng.integers(2, vocab, n_tokens).tolist()


def pct(xs, q):
    return float(np.percentile(np.asarray(xs), q)) if xs else 0.0


def drive(cache, stream, chunk=512, bl=12, dl=12, query_every=64):
    """Feed the stream in chunks (put final=True per chunk so squeeze
    runs), querying hier_get with recent 2-grams along the way."""
    put_ms, get_us, sizes = [], [], []
    n = len(stream)
    for off in range(0, n - chunk, chunk):
        doc = stream[off : off + chunk]
        t0 = time.perf_counter()
        cache.put(doc, branch_length=bl, mode="output", final=True)
        put_ms.append((time.perf_counter() - t0) * 1000)
        # queries: 2-grams sampled from this chunk
        for qoff in range(0, chunk - 2, query_every):
            q = doc[qoff : qoff + 2]
            t0 = time.perf_counter()
            ids, mask, parents, szs = cache.hier_get(
                q, decoding_length=dl, branch_length=bl
            )
            get_us.append((time.perf_counter() - t0) * 1e6)
            sizes.append(len(ids))
    trees = getattr(cache, "mem", None)
    stats = {}
    if trees is not None:  # python impl exposes per-tree node counts
        nn = [t.n_node for t in trees.values()]
        stats = {
            "trees": len(nn), "total_nodes": int(np.sum(nn)),
            "max_tree_nodes": int(np.max(nn)) if nn else 0,
            "trees_at_cap_frac": float(np.mean(
                [x >= 0.9 * cache.max_node for x in nn]
            )) if nn else 0.0,
        }
    return {
        "chunks": len(put_ms),
        "queries": len(get_us),
        "put_ms_per_chunk": {
            "p50": round(pct(put_ms, 50), 3), "p90": round(pct(put_ms, 90), 3),
            "p99": round(pct(put_ms, 99), 3), "max": round(max(put_ms), 3),
        },
        "hier_get_us": {
            "p50": round(pct(get_us, 50), 1), "p90": round(pct(get_us, 90), 1),
            "p99": round(pct(get_us, 99), 1), "max": round(max(get_us), 1),
        },
        "hier_get_p99_vs_device_step": round(
            pct(get_us, 99) / (DEVICE_STEP_MS * 1000), 4
        ),
        "mean_draft_tokens": round(float(np.mean(sizes)), 2),
        **stats,
    }


def main():
    n_tokens = int(_os.environ.get("TRIE_BENCH_TOKENS", "1000000"))
    out = {"tokens": n_tokens, "max_node": 65536,
           "device_step_ms": DEVICE_STEP_MS}
    scenarios = {
        "text": text_stream(n_tokens),
        "uniform": uniform_stream(n_tokens),
    }
    impls = {"python": lambda: DraftCache(eos_ids=(), max_node=65536)}
    try:
        from painlessinferenceacceleration_tpu.lookahead.native import (
            NativeDraftCache,
        )

        impls["native"] = lambda: NativeDraftCache(
            eos_ids=(), max_node=65536
        )
    except Exception as e:  # native lib not built
        out["native_error"] = repr(e)
    for sname, stream in scenarios.items():
        for iname, mk in impls.items():
            t0 = time.perf_counter()
            r = drive(mk(), stream)
            r["wall_s"] = round(time.perf_counter() - t0, 1)
            out[f"{sname}/{iname}"] = r
            print(f"[{sname}/{iname}] put p99 "
                  f"{r['put_ms_per_chunk']['p99']:.2f} ms/512tok, hier_get "
                  f"p50/p99 {r['hier_get_us']['p50']:.0f}/"
                  f"{r['hier_get_us']['p99']:.0f} us "
                  f"({100*r['hier_get_p99_vs_device_step']:.1f}% of device "
                  f"step), draft {r['mean_draft_tokens']:.1f} tok, "
                  f"wall {r['wall_s']}s", flush=True)
    path = _os.environ.get(
        "TRIE_BENCH_JSON",
        _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                      "trie_latency.json"),
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
