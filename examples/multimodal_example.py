"""Multimodal embedding-splice example (reference
flood/example/multimodal_example.py): precomputed image embeddings are
spliced into the prompt at marker positions during prefill."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

if _os.environ.get("PIA_PLATFORM"):
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["PIA_PLATFORM"])

import jax
import jax.numpy as jnp
import numpy as np

from painlessinferenceacceleration_tpu.config import EngineConfig, ModelConfig
from painlessinferenceacceleration_tpu.engine.llm import LLM
from painlessinferenceacceleration_tpu.engine.request import SamplingParams
from painlessinferenceacceleration_tpu.models.base import init_params

if __name__ == "__main__":
    cfg = ModelConfig.tiny()
    ecfg = EngineConfig(page_size=16, max_seq_len=256, max_concurrency=2,
                        eos_token_id=-2)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    llm = LLM(cfg=cfg, params=params, ecfg=ecfg, dtype=jnp.float32)
    # a prompt with two "image" placeholder positions (1, 2) whose
    # embeddings come from a vision tower (random here)
    prompt = [5, 0, 0, 9, 10, 11]
    img = np.random.default_rng(0).normal(size=(2, cfg.hidden_size)) * 0.02
    req = llm.add_request(prompt, SamplingParams(max_new_tokens=16),
                          mm_embeds=img.astype(np.float32),
                          mm_positions=[1, 2])
    while req.state != "finished":
        llm.step()
    print("tokens:", req.output_ids)
