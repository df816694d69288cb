"""Minimal serving example (reference flood/example/simple_example.py).

Runs on whatever backend JAX picks (TPU if available); with no checkpoint
path it builds a tiny random model so the example is runnable anywhere.

Usage: python examples/simple_example.py [/path/to/hf/checkpoint]
"""

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
from painlessinferenceacceleration_tpu.engine.llm import LLM
from painlessinferenceacceleration_tpu.engine.request import SamplingParams


def build_llm(path=None):
    ecfg = EngineConfig(max_seq_len=2048, max_concurrency=8,
                        eos_token_id=-2, use_lookahead=True)
    if path:
        return LLM(model_path=path, ecfg=ecfg)
    cfg = ModelConfig.tiny()
    from painlessinferenceacceleration_tpu.models.base import init_params

    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    return LLM(cfg=cfg, params=params, ecfg=ecfg, dtype=jnp.float32)


if __name__ == "__main__":
    llm = build_llm(sys.argv[1] if len(sys.argv) > 1 else None)
    prompts = [[11, 22, 33, 44] * 4, [7, 8, 9, 7, 8, 9]]
    for req in llm.generate(prompts, SamplingParams(max_new_tokens=32)):
        text = (llm.decode_text(req.output_ids)
                if llm.tokenizer else req.output_ids)
        print(f"req {req.rid} [{req.finish_reason}]: {text}")
    print(llm.metrics.summary())
