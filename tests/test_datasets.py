"""Dataset prep/eval harness (benchmarks/datasets.py).

Covers the reference's preprocess_sample.py contract (raw -> {prompt,answer}
jsonl + split) and the perf_check eval loop (benchmark.py:243) on the
synthetic stand-in corpus.
"""

import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.datasets import (
    eval_lookahead,
    load_jsonl,
    preprocess_dolly,
    preprocess_gsm8k,
    preprocess_humaneval,
    rouge_l,
    stand_in,
    word_hash_tokens,
)


def test_preprocess_dolly_roundtrip(tmp_path):
    src = tmp_path / "dolly.jsonl"
    rows = [
        {"instruction": "Say hi", "context": "", "response": "hi"},
        {"instruction": "Add", "context": "2 and 3", "response": "5"},
    ] * 3
    src.write_text("\n".join(json.dumps(r) for r in rows))
    preprocess_dolly(str(src), str(tmp_path / "out"))
    test = load_jsonl(str(tmp_path / "out" / "test.jsonl"))
    assert len(test) == 6
    assert all(set(p) == {"prompt", "answer"} for p in test)
    # context-ful rows use the with-input template
    assert "Input:" in test[1]["prompt"] and "Input:" not in test[0]["prompt"]


def test_preprocess_gsm8k_and_humaneval(tmp_path):
    g = tmp_path / "g.jsonl"
    g.write_text(json.dumps({"question": "1+1?", "answer": "2"}))
    preprocess_gsm8k(str(g), str(tmp_path / "og"))
    assert load_jsonl(str(tmp_path / "og" / "test.jsonl"))[0]["answer"] == "2"
    h = tmp_path / "h.jsonl"
    h.write_text(json.dumps(
        {"prompt": "def f():", "canonical_solution": "    return 1"}
    ))
    preprocess_humaneval(str(h), str(tmp_path / "oh"))
    assert load_jsonl(
        str(tmp_path / "oh" / "test.jsonl")
    )[0]["prompt"].startswith("def f")


def test_stand_in_statistics():
    test, train = stand_in("gsm8k", n_test=16, n_train=32, seed=1)
    assert len(test) == 16 and len(train) == 32
    # deterministic
    t2, _ = stand_in("gsm8k", n_test=16, n_train=32, seed=1)
    assert [x["prompt"] for x in test] == [x["prompt"] for x in t2]
    # the load-bearing property: train and test answers share n-grams
    # (boilerplate phrases), so trie warm-up produces real draft hits
    def bigrams(text):
        w = text.split()
        return set(zip(w, w[1:]))

    train_bi = set()
    for ex in train:
        train_bi |= bigrams(ex["answer"])
    hits = [
        len(bigrams(ex["answer"]) & train_bi) / max(len(bigrams(ex["answer"])), 1)
        for ex in test
    ]
    assert np.mean(hits) > 0.2  # substantial but not degenerate overlap
    assert np.mean(hits) < 0.99


def test_rouge_l():
    assert rouge_l([1, 2, 3], [1, 2, 3]) == 1.0
    assert rouge_l([1, 2, 3], [4, 5, 6]) == 0.0
    # one token changed out of 4: LCS=3, P=R=3/4 -> F1=0.75
    assert abs(rouge_l([1, 2, 3, 4], [1, 2, 9, 4]) - 0.75) < 1e-9
    assert rouge_l([], []) == 1.0


def test_word_hash_tokens_stable():
    ids = word_hash_tokens("the cat sat on the mat", 1000)
    assert len(ids) == 6 and ids[0] == ids[4]  # same word, same id
    assert all(10 <= t < 990 for t in ids)


def test_eval_lookahead_stand_in_lossless():
    import jax
    import jax.numpy as jnp

    from painlessinferenceacceleration_tpu.config import (
        EngineConfig,
        ModelConfig,
    )
    from painlessinferenceacceleration_tpu.lookahead.generate import (
        LookaheadGenerator,
    )
    from painlessinferenceacceleration_tpu.models.base import init_params

    cfg = dataclasses.replace(ModelConfig.tiny(), vocab_size=512)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    ecfg = EngineConfig(page_size=16, max_seq_len=512, max_concurrency=1,
                        eos_token_id=-2)
    gen = LookaheadGenerator(params, cfg, ecfg=ecfg, dtype=jnp.float32)
    test, train = stand_in("dolly", n_test=3, n_train=12, seed=0)
    r = eval_lookahead(gen, test, train, cfg.vocab_size, max_new_tokens=24)
    assert r["n"] == 3
    assert r["exact_match"] == 1.0  # bit-exact lossless
    assert r["rouge_l"] == 1.0
    assert r["mean_edl"] >= 1.0
