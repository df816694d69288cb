"""IPAD prune+distill example (reference ipad/ workflow): stage-wise
pruning with DistillPipe, then serve the reparam'd smaller model on the
unmodified engine."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

if _os.environ.get("PIA_PLATFORM"):  # e.g. PIA_PLATFORM=cpu to demo off-TPU
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["PIA_PLATFORM"])


import jax
import jax.numpy as jnp
import numpy as np

from painlessinferenceacceleration_tpu.config import EngineConfig, ModelConfig
from painlessinferenceacceleration_tpu.engine.llm import LLM
from painlessinferenceacceleration_tpu.engine.request import SamplingParams
from painlessinferenceacceleration_tpu.ipad import DistillPipe, DistillStage
from painlessinferenceacceleration_tpu.models.base import init_params

if __name__ == "__main__":
    cfg = ModelConfig.tiny(num_hidden_layers=2, intermediate_size=64)
    teacher = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    rng = np.random.default_rng(0)

    def data():
        while True:
            yield rng.integers(1, cfg.vocab_size - 1, size=(4, 16)).astype(np.int32)

    pipe = DistillPipe(cfg, teacher, [
        DistillStage(mode="mlp", sparsity=0.5, steps=8, prune_steps=6),
        DistillStage(mode="finetune", steps=4, lr=5e-5),
    ])
    new_cfg, new_params, hist = pipe.run(data())
    print(f"pruned: intermediate {cfg.intermediate_size} -> "
          f"{new_cfg.intermediate_size}; final loss {hist[-1]['loss']:.4f}")
    ecfg = EngineConfig(page_size=16, max_seq_len=128, max_concurrency=2,
                        eos_token_id=-2)
    llm = LLM(cfg=new_cfg, params=new_params, ecfg=ecfg, dtype=jnp.float32)
    print("serves:", llm.generate([[5, 6, 7]],
                                  SamplingParams(max_new_tokens=8))[0].output_ids)
