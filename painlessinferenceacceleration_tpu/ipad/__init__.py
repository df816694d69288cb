"""IPAD: iterative pruning and distillation (training-side).

Reference: ipad/ — DistillWorker (ipad/common/distill_worker.py:36-1445:
teacher-logit caching, per-layer sparse training with progressive channel
masks, distill losses, reparam back to dense) and the SparseModule family
(ipad/common/sparse_module.py:47-1507). WWW'24 paper workflow.

TPU re-design: pure-functional JAX training — masks are pytrees multiplied
into weights inside the jitted loss (no module surgery), sensitivity comes
from |w|*E|x| statistics, pruning schedules shrink masks progressively, and
``reparam`` physically slices the weights to the pruned shape so inference
runs on the standard engine with a smaller ModelConfig.
"""

from painlessinferenceacceleration_tpu.ipad.distill import (  # noqa: F401
    DistillConfig,
    Distiller,
    DistillPipe,
    DistillStage,
)
