"""HTTP serving tests (stdlib server; port 0 -> ephemeral)."""

import json
import urllib.request

import pytest

import jax
import jax.numpy as jnp

from painlessinferenceacceleration_tpu.config import EngineConfig, ModelConfig
from painlessinferenceacceleration_tpu.engine.llm import LLM
from painlessinferenceacceleration_tpu.models.base import init_params
from painlessinferenceacceleration_tpu.service.server import StdlibServer


@pytest.fixture(scope="module")
def server():
    cfg = ModelConfig.tiny()
    params = init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    ecfg = EngineConfig(
        page_size=16, max_seq_len=256, max_concurrency=4, eos_token_id=-2
    )
    llm = LLM(cfg=cfg, params=params, ecfg=ecfg, dtype=jnp.float32)
    srv = StdlibServer(llm, host="127.0.0.1", port=0)
    srv.start()
    yield srv
    srv.stop()


def _post(srv, body):
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}/generate",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
    )
    return urllib.request.urlopen(req, timeout=120)


def test_health_and_metrics(server):
    with urllib.request.urlopen(f"http://127.0.0.1:{server.port}/health") as r:
        assert json.load(r)["status"] == "ok"
    with urllib.request.urlopen(f"http://127.0.0.1:{server.port}/metrics") as r:
        assert "generated_tokens" in json.load(r)


def test_generate_nonstream(server):
    with _post(server, {"input_ids": [5, 6, 7], "max_new_tokens": 8, "stream": False}) as r:
        out = json.load(r)
    assert len(out["output_ids"]) == 8
    assert out["finish_reason"] == "length"


def test_generate_stream(server):
    toks = []
    with _post(server, {"input_ids": [5, 6, 7], "max_new_tokens": 6, "stream": True}) as r:
        for line in r:
            toks.append(json.loads(line)["token"])
    assert len(toks) == 6
    # same as non-stream
    with _post(server, {"input_ids": [5, 6, 7], "max_new_tokens": 6, "stream": False}) as r:
        assert json.load(r)["output_ids"] == toks


def test_concurrent_streams(server):
    import threading

    results = {}

    def go(i):
        with _post(server, {"input_ids": [5, 6, 7 + i], "max_new_tokens": 6, "stream": False}) as r:
            results[i] = json.load(r)["output_ids"]

    ts = [threading.Thread(target=go, args=(i,)) for i in range(3)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert len(results) == 3
    assert all(len(v) == 6 for v in results.values())


def test_client_and_bench_service(server):
    """service/client.py (reference send_http_request + bench_service):
    single request, streaming parity, and the concurrent load driver."""
    from painlessinferenceacceleration_tpu.service import client

    url = f"http://127.0.0.1:{server.port}"
    out = client.generate(url, input_ids=[5, 6, 7], max_new_tokens=6)
    assert len(out["output_ids"]) == 6
    chunks = list(client.stream_generate(url, input_ids=[5, 6, 7],
                                         max_new_tokens=6))
    toks = [c["token"] for c in chunks if "token" in c]
    assert toks == out["output_ids"]

    rng = __import__("numpy").random.default_rng(0)
    prompts = [rng.integers(5, 200, 6).tolist() for _ in range(6)]
    rep = client.bench_service(url, prompts, max_new_tokens=5, concurrency=3)
    assert rep["requests"] == 6
    assert rep["generated_tokens"] == 30
    assert rep["p50_latency_s"] > 0


def test_soak_concurrent_mixed_streams(server):
    """Round-4 review #9: >=8 concurrent streaming clients plus non-stream
    clients and one deliberately slow consumer against the stdlib server
    (reference load driver: flood/service/bench_service.py). Asserts no
    cross-stream interleaving corruption (every stream equals the greedy
    reference for its prompt), fair completion (all clients finish), and
    backpressure (the slow consumer still receives its full stream)."""
    import threading
    import time

    N_STREAM, N_PLAIN, M = 9, 4, 8
    prompts = [[5, 6, 7 + (i % 5)] for i in range(N_STREAM + N_PLAIN)]
    # greedy reference per distinct prompt (deterministic)
    expected = {}
    for p in prompts:
        key = tuple(p)
        if key not in expected:
            with _post(server, {"input_ids": p, "max_new_tokens": M,
                                "stream": False}) as r:
                expected[key] = json.load(r)["output_ids"]

    results = {}
    errors = {}

    def stream_client(i, slow=False):
        try:
            toks = []
            with _post(server, {"input_ids": prompts[i], "max_new_tokens": M,
                                "stream": True}) as r:
                for line in r:
                    toks.append(json.loads(line)["token"])
                    if slow:
                        time.sleep(0.05)  # slow consumer: server-side
                        # writes hit the socket buffer / handler thread
            results[i] = toks
        except Exception as e:  # pragma: no cover - failure reporting
            errors[i] = repr(e)

    def plain_client(i):
        try:
            with _post(server, {"input_ids": prompts[i], "max_new_tokens": M,
                                "stream": False}) as r:
                results[i] = json.load(r)["output_ids"]
        except Exception as e:  # pragma: no cover
            errors[i] = repr(e)

    ts = [threading.Thread(target=stream_client, args=(i, i == 0))
          for i in range(N_STREAM)]
    ts += [threading.Thread(target=plain_client, args=(N_STREAM + j,))
           for j in range(N_PLAIN)]
    [t.start() for t in ts]
    deadline = time.time() + 120
    for t in ts:
        t.join(timeout=max(0.1, deadline - time.time()))
    assert not errors, errors
    assert len(results) == N_STREAM + N_PLAIN  # fair completion: none stuck
    for i, toks in results.items():
        assert toks == expected[tuple(prompts[i])], (
            i, toks, expected[tuple(prompts[i])]
        )
