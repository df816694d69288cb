"""TPU-native inference acceleration framework.

A brand-new JAX/XLA/Pallas/pjit framework with the capabilities of
alipay/PainlessInferenceAcceleration (PIA):

- ``lookahead``: on-the-fly trie-tree draft cache producing hierarchical
  multi-branch drafts verified in a single forward pass (lossless vs greedy,
  no assist model) — reference: lookahead/common/lookahead_cache.py,
  lookahead/common/pretrained_model.py.
- ``engine``: throughput-oriented serving with continuous batching, chunked
  prefill and a paged KV arena — reference: flood/facade/llm.py,
  flood/utils/batch.py (the segment cache becomes a page arena: XLA wants
  static shapes, so the reference's variable segments become fixed-size pages).
- ``ops``: Pallas TPU kernels for the hot paths (paged/tree attention,
  fused dequant-matmul, rmsnorm, KV scatter) — replacing the reference's
  Triton/CUDA kernels (flood/ops/*, flood/csrc/*).
- ``parallel``: tensor sharding over an ICI mesh via jax.sharding/pjit —
  replacing the reference's pipeline parallelism (flood/README.md:21).
- ``ipad``: iterative pruning + distillation (reference: ipad/).
"""

__version__ = "0.1.0"

from painlessinferenceacceleration_tpu.config import (  # noqa: F401
    EngineConfig,
    ModelConfig,
)
