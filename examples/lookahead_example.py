"""Latency-oriented lookahead generation with the HOST trie (the
reference's LOOKAHEAD API, lookahead/examples/*_example.py): single
stream, losslessness demonstrated by comparing against plain greedy."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

if _os.environ.get("PIA_PLATFORM"):  # e.g. PIA_PLATFORM=cpu to demo off-TPU
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["PIA_PLATFORM"])


import sys

import jax
import jax.numpy as jnp

from painlessinferenceacceleration_tpu.config import EngineConfig, ModelConfig
from painlessinferenceacceleration_tpu.lookahead.generate import (
    LookaheadGenerator,
)
from painlessinferenceacceleration_tpu.models.base import init_params

if __name__ == "__main__":
    cfg = ModelConfig.tiny()
    ecfg = EngineConfig(page_size=16, max_seq_len=512, max_concurrency=1,
                        eos_token_id=-2, decoding_length=15, branch_length=4)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    prompt = [11, 22, 33, 44, 55] * 4

    greedy = LookaheadGenerator(params, cfg, ecfg, dtype=jnp.float32).generate(
        prompt, use_lookahead=False, max_new_tokens=64)
    spec = LookaheadGenerator(params, cfg, ecfg, dtype=jnp.float32).generate(
        prompt, use_lookahead=True, max_new_tokens=64)
    assert greedy.sequences == spec.sequences, "lookahead must be lossless"
    print("tokens:", spec.sequences[:16], "...")
    print(f"steps: {len(greedy.dls)} (greedy) -> {len(spec.dls)} (lookahead); "
          f"mean accepted/step "
          f"{sum(spec.edls) / max(len(spec.edls), 1):.2f}")
