"""Trie latency regression guard (round-4 review #8).

The host trie's hier_get sits on the qts path of the classic lookahead API;
it must stay well under the device step time (~6.6 ms at 7B int4) or the
host query stops being hidden by device compute. benchmarks/bench_trie.py
commits the full 1M-insert artifact (benchmarks/trie_latency.json); this
test drives a scaled-down version of the same harness under squeeze
pressure and guards the p99.

Reference: lookahead/benchmarks/benchmark.py:353 perf_check_trie.
"""

import numpy as np
import pytest

from benchmarks.bench_trie import DEVICE_STEP_MS, drive, uniform_stream

from painlessinferenceacceleration_tpu.lookahead import DraftCache


N_TOKENS = 60_000  # enough for squeeze pressure at vocab 512 / max_node 64k
STEP_US = DEVICE_STEP_MS * 1000


@pytest.fixture(scope="module")
def stream():
    return uniform_stream(N_TOKENS)


def test_python_trie_hier_get_p99_under_device_step(stream):
    r = drive(DraftCache(eos_ids=(), max_node=65536), stream)
    # the host query must hide behind the device step with margin
    assert r["hier_get_us"]["p99"] < STEP_US, r["hier_get_us"]
    assert r["mean_draft_tokens"] > 4  # queries actually retrieved drafts


def test_native_trie_hier_get_p99_well_under_device_step(stream):
    native = pytest.importorskip(
        "painlessinferenceacceleration_tpu.lookahead.native"
    )
    try:
        cache = native.NativeDraftCache(eos_ids=(), max_node=65536)
    except Exception as e:  # .so not built in this checkout
        pytest.skip(f"native trie unavailable: {e!r}")
    r = drive(cache, stream)
    assert r["hier_get_us"]["p99"] < STEP_US / 2, r["hier_get_us"]
    assert r["mean_draft_tokens"] > 4
