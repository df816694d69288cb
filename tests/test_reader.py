"""Dataset readers (reference flood/utils/reader.py:16-123)."""

import json

from painlessinferenceacceleration_tpu.utils.reader import (
    dummy_requests,
    read_jsonl,
    read_sharegpt,
)


def test_read_jsonl(tmp_path):
    p = tmp_path / "d.jsonl"
    rows = [{"prompt": f"q{i}", "answer": f"a{i}"} for i in range(5)]
    p.write_text("\n".join(json.dumps(r) for r in rows) + "\n\n")
    got = list(read_jsonl(str(p), output_key="answer"))
    assert got == [(f"q{i}", f"a{i}") for i in range(5)]
    assert len(list(read_jsonl(str(p), limit=2))) == 2
    assert list(read_jsonl(str(p)))[0] == ("q0", None)


def test_read_sharegpt(tmp_path):
    p = tmp_path / "sg.json"
    convs = [
        {"conversations": [
            {"from": "system", "value": "s"},
            {"from": "human", "value": "hi"},
            {"from": "gpt", "value": "hello"},
            {"from": "human", "value": "more"},
        ]},
        {"conversations": [{"from": "gpt", "value": "orphan reply"}]},
        {"conversations": [
            {"from": "human", "value": "q2"},
            {"from": "gpt", "value": "a2"},
        ]},
    ]
    p.write_text(json.dumps(convs))
    got = read_sharegpt(str(p))
    assert got == [("hi", "hello"), ("q2", "a2")]
    assert read_sharegpt(str(p), limit=1) == [("hi", "hello")]


def test_dummy_requests_shape_and_determinism():
    prompts, olens = dummy_requests(20, vocab=512, prompt_len=(4, 64),
                                    output_len=(8, 32))
    assert len(prompts) == len(olens) == 20
    assert all(4 <= len(p) <= 64 for p in prompts)
    assert all(8 <= o <= 32 for o in olens)
    assert all(10 <= t < 502 for p in prompts for t in p)
    again, _ = dummy_requests(20, vocab=512, prompt_len=(4, 64),
                              output_len=(8, 32))
    assert again == prompts  # seeded
