"""Multi-chip example (reference flood/example/dist_example.py): DistLLM
shards params + KV over the local device mesh; run under
XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu for a
virtual mesh, or on a real TPU slice as-is."""

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
from painlessinferenceacceleration_tpu.engine.dist_llm import DistLLM
from painlessinferenceacceleration_tpu.engine.request import SamplingParams
from painlessinferenceacceleration_tpu.models.base import init_params

if __name__ == "__main__":
    n = len(jax.devices())
    cfg = ModelConfig.tiny(num_attention_heads=8, num_key_value_heads=4)
    ecfg = EngineConfig(page_size=16, max_seq_len=512, max_concurrency=4,
                        eos_token_id=-2)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    llm = DistLLM(cfg=cfg, params=params, ecfg=ecfg, dtype=jnp.float32,
                  mesh_shape=(1, n))
    print(f"mesh: {llm.mesh}")
    for req in llm.generate([[5, 6, 7, 8] * 3],
                            SamplingParams(max_new_tokens=24)):
        print("tokens:", req.output_ids)
