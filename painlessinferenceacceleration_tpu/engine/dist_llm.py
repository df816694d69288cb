"""DistLLM: the multi-chip serving facade.

Reference: flood/facade/dist_llm.py — a two-node pipeline where rank 0 owns
scheduling and pickles activations across NCCL (:198-276). TPU re-design:
one CONTROLLER process schedules exactly like `LLM`; the model/KV arena are
sharded over a (data, model) device mesh at construction and GSPMD inserts
the collectives — no wire format, no rank loop, no pickling.

For multi-process (multi-host) operation every process runs the same SPMD
program over a global mesh joined via ``initialize_multihost`` and places
host-built batches with ``host_local_batch_to_global`` — the pattern
exercised end-to-end by tests/mp_worker.py (2-process CPU smoke test).
This facade covers the single-controller case, which on TPU pods spans all
chips a process can address (vastly more than the reference's 2 nodes).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax

from painlessinferenceacceleration_tpu.engine.llm import LLM
from painlessinferenceacceleration_tpu.parallel.mesh import (
    make_mesh,
    shard_kv,
    shard_params,
)


class DistLLM(LLM):
    """LLM with params + KV arena sharded over the local device mesh.

    ``mesh_shape``: (data, model); default (1, n_devices) — pure tensor
    parallelism. Expert parallelism rides the same 'model' axis when the
    ModelConfig sets ``expert_parallel``. ``multihost=True`` first joins
    the jax.distributed process group (PIA_COORDINATOR/... env contract,
    parallel/multihost.py)."""

    def __init__(
        self,
        *args,
        mesh_shape: Optional[Tuple[int, int]] = None,
        multihost: bool = False,
        **kwargs,
    ):
        if multihost:
            from painlessinferenceacceleration_tpu.parallel.multihost import (
                initialize_multihost,
            )

            initialize_multihost()
        super().__init__(*args, **kwargs)
        n = len(jax.devices())
        self.mesh = make_mesh(mesh_shape or (1, n))
        self.params = shard_params(self.params, self.cfg, self.mesh)
        self.kv = shard_kv(self.kv, self.cfg, self.mesh)
