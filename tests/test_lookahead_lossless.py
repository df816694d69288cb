"""Losslessness: lookahead generation must be bit-identical to greedy.

The reference only checks this via rouge + eyeballed example output
(SURVEY.md §4); here it is exact: same tokens, fewer steps.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from painlessinferenceacceleration_tpu.config import EngineConfig, ModelConfig
from painlessinferenceacceleration_tpu.lookahead.generate import LookaheadGenerator
from painlessinferenceacceleration_tpu.models.base import init_params


@pytest.fixture(scope="module")
def gen_setup():
    cfg = ModelConfig.tiny()
    ecfg = EngineConfig(
        page_size=16,
        max_seq_len=512,
        max_concurrency=2,
        decoding_length=15,
        branch_length=6,
        eos_token_id=499,
        max_new_tokens=64,
    )
    params = init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    return cfg, ecfg, params


PROMPTS = [[7, 8, 9, 10, 11], [100, 200, 300], [42]]


def test_lookahead_is_lossless(gen_setup):
    cfg, ecfg, params = gen_setup
    for prompt in PROMPTS:
        g1 = LookaheadGenerator(params, cfg, ecfg, dtype=jnp.float32)
        greedy = g1.generate(prompt, use_lookahead=False, max_new_tokens=48)
        g2 = LookaheadGenerator(params, cfg, ecfg, dtype=jnp.float32)
        la = g2.generate(prompt, use_lookahead=True, max_new_tokens=48)
        assert la.sequences == greedy.sequences, (prompt, la.sequences, greedy.sequences)


def test_lookahead_accelerates_cyclic_output(gen_setup):
    """Random-weight greedy decode cycles; the trie must learn the cycle and
    accept multiple tokens per step."""
    cfg, ecfg, params = gen_setup
    g = LookaheadGenerator(params, cfg, ecfg, dtype=jnp.float32)
    out = g.generate([7, 8, 9, 10, 11], use_lookahead=True, max_new_tokens=200)
    assert len(out.sequences) == 200
    assert out.mean_edl > 1.2, out.edls
    # stats arrays aligned
    assert len(out.dls) == len(out.edls) == len(out.fts) == len(out.qts)


def test_second_request_reuses_global_trie(gen_setup):
    """Output n-grams learned from request 0 accelerate request 1 from its
    first steps (the reference's cross-request warm trie behavior)."""
    cfg, ecfg, params = gen_setup
    g = LookaheadGenerator(params, cfg, ecfg, dtype=jnp.float32)
    first = g.generate([7, 8, 9, 10, 11], use_lookahead=True, max_new_tokens=48)
    second = g.generate(
        [7, 8, 9, 10, 11], use_lookahead=True, max_new_tokens=48, request_idx=1
    )
    assert second.sequences == first.sequences
    assert np.mean(second.edls) >= np.mean(first.edls)


def test_eos_stops_generation(gen_setup):
    cfg, ecfg, params = gen_setup
    # find the eos organically: pick a prompt, force eos to be the first
    # generated token by setting eos to it
    g = LookaheadGenerator(params, cfg, ecfg, dtype=jnp.float32)
    probe = g.generate([5, 6], use_lookahead=False, max_new_tokens=3)
    first_tok = probe.sequences[0]
    g2 = LookaheadGenerator(params, cfg, ecfg, dtype=jnp.float32)
    out = g2.generate(
        [5, 6], use_lookahead=False, max_new_tokens=32, eos_token_id=first_tok
    )
    assert out.sequences == [first_tok]


def test_par_and_one_modes_lossless(gen_setup):
    cfg, ecfg, params = gen_setup
    prompt = [7, 8, 9, 10, 11]
    g = LookaheadGenerator(params, cfg, ecfg, dtype=jnp.float32)
    ref = g.generate(prompt, use_lookahead=False, max_new_tokens=40).sequences
    for mode in ("par", "one"):
        gm = LookaheadGenerator(params, cfg, ecfg, dtype=jnp.float32)
        out = gm.generate(
            prompt, use_lookahead=True, decoding_mode=mode, max_new_tokens=40
        )
        assert out.sequences == ref, mode


def test_stream_generate_incremental():
    """stream_generate yields per accepted step (true incremental streaming,
    reference pretrained_model.py:1323), and the stream equals generate()."""
    import jax
    import jax.numpy as jnp

    from painlessinferenceacceleration_tpu.config import EngineConfig, ModelConfig
    from painlessinferenceacceleration_tpu.lookahead.generate import (
        LookaheadGenerator,
    )
    from painlessinferenceacceleration_tpu.models.base import init_params

    cfg = ModelConfig.tiny()
    ecfg = EngineConfig(page_size=16, max_seq_len=256, max_concurrency=1,
                        eos_token_id=-2)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    prompt = [11, 22, 33, 44, 55] * 4
    g = LookaheadGenerator(params, cfg, ecfg, dtype=jnp.float32)
    want = g.generate(prompt, use_lookahead=True, max_new_tokens=32).sequences

    g2 = LookaheadGenerator(params, cfg, ecfg, dtype=jnp.float32)
    steps = g2._steps(prompt, use_lookahead=True, max_new_tokens=32)
    chunks = []
    while True:
        try:
            chunks.append(next(steps))
        except StopIteration:
            break
    got = [t for c in chunks for t in c]
    assert got == want
    assert len(chunks) >= 2  # first token streamed alone after prefill
    assert chunks[0] == [want[0]]

    g3 = LookaheadGenerator(params, cfg, ecfg, dtype=jnp.float32)
    assert list(g3.stream_generate(prompt, use_lookahead=True,
                                   max_new_tokens=32)) == want


def test_batch_generate_lossless():
    """Host-trie BATCHED generation (reference pretrained_model_batch.py,
    bat_get sub-budget retrieval): every row's tokens must equal its solo
    greedy stream; rows finish independently."""
    import jax
    import jax.numpy as jnp

    from painlessinferenceacceleration_tpu.config import EngineConfig, ModelConfig
    from painlessinferenceacceleration_tpu.lookahead.generate import (
        LookaheadGenerator,
    )
    from painlessinferenceacceleration_tpu.models.base import init_params

    cfg = ModelConfig.tiny()
    ecfg = EngineConfig(page_size=16, max_seq_len=256, max_concurrency=4,
                        eos_token_id=-2, decoding_length=15, branch_length=4)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    prompts = [
        [11, 22, 33, 44, 55] * 3,
        [7, 8, 9, 7, 8, 9, 7, 8],
        [100, 101, 102, 103],
    ]
    lens = [24, 17, 30]

    want = []
    for p, n in zip(prompts, lens):
        g = LookaheadGenerator(params, cfg, ecfg, dtype=jnp.float32)
        want.append(g.generate(p, use_lookahead=False,
                               max_new_tokens=n).sequences)

    gb = LookaheadGenerator(params, cfg, ecfg, dtype=jnp.float32)
    res = gb.batch_generate(prompts, max_new_tokens=max(lens))
    for r, (w, o) in enumerate(zip(want, res)):
        assert o.sequences[: len(w)] == w, f"row {r} diverged"
    # row budget honored per-row via eos/max_new; here all hit max_new
    assert all(len(o.sequences) == max(lens) for o in res)
