"""DistLLM: the multi-chip serving facade.

Reference: flood/facade/dist_llm.py — a two-node pipeline where rank 0 owns
scheduling and pickles activations across NCCL (:198-276). TPU re-design:
one CONTROLLER process schedules exactly like `LLM`; the model/KV arena are
sharded over a (data, model) device mesh at construction and GSPMD inserts
the collectives — no wire format, no rank loop, no pickling.

For multi-process (multi-host) operation every process runs the SAME
scheduler loop (deterministic host code -> identical jitted step sequences;
the reference instead runs a bespoke rank>0 recv/forward loop,
dist_llm.py:247-276). Params/KV/draft-tables are placed as GLOBAL arrays
over a (dcn, data, model) mesh joined via ``initialize_multihost``;
host-built batch inputs are plain numpy (auto-replicated: every process
passes identical values), and output fetches happen in lockstep so XLA can
assemble cross-process values. tests/mp_worker.py drives a full
``generate()`` (scheduler + multistep + spec verify) across 2 processes and
asserts token identity with the single-process engine.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np

from painlessinferenceacceleration_tpu.engine.llm import LLM
from painlessinferenceacceleration_tpu.parallel.mesh import (
    kv_shardings,
    make_mesh,
    param_shardings,
    shard_kv,
    shard_params,
)


class DistLLM(LLM):
    """LLM with params + KV arena sharded over the local device mesh.

    ``mesh_shape``: (data, model); default (1, n_devices) — pure tensor
    parallelism. Expert parallelism rides the same 'model' axis when the
    ModelConfig sets ``expert_parallel``. ``multihost=True`` first joins
    the jax.distributed process group (PIA_COORDINATOR/... env contract,
    parallel/multihost.py) and, with >1 process, places params/KV/tables
    as global arrays over the (dcn, data, model) mesh so the inherited
    scheduler loop runs SPMD across all processes."""

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
        if multihost and jax.process_count() > 1:
            from jax.sharding import PartitionSpec as P

            from painlessinferenceacceleration_tpu.parallel.multihost import (
                host_local_batch_to_global,
                make_multihost_mesh,
            )

            tp = (mesh_shape or (1, n // jax.process_count() or 1))[1]
            self.mesh = make_multihost_mesh(tp=tp)

            def glob(x, spec):
                return host_local_batch_to_global(
                    self.mesh, spec, np.asarray(x)
                )

            pspecs = param_shardings(self.cfg, self.mesh, self.params)
            self.params = jax.tree.map(
                glob, self.params, pspecs,
                is_leaf=lambda x: hasattr(x, "shape"),
            )
            kspecs = kv_shardings(self.cfg, self.mesh, self.kv)
            self.kv = {k: glob(v, kspecs[k]) for k, v in self.kv.items()}
            if self.tables is not None:
                # draft tables replicate (every process updates them through
                # the same jitted programs, so they stay identical)
                self.tables = jax.tree.map(
                    lambda x: glob(x, P(*([None] * np.asarray(x).ndim))),
                    self.tables,
                )
            return
        self.mesh = make_mesh(mesh_shape or (1, n))
        self._round_cp_pages()
        self.params = shard_params(self.params, self.cfg, self.mesh)
        self.kv = shard_kv(self.kv, self.cfg, self.mesh)

    def _round_cp_pages(self) -> None:
        """Exact CP page rounding once the mesh is known: EngineConfig's
        16-multiple only guarantees divisibility for power-of-two model-axis
        sizes; non-power-of-two axes (3, 6, 24, ...) re-init the (still
        empty) arena with num_pages rounded to the actual axis size."""
        if not self.cfg.context_parallel:
            return
        axis = int(self.mesh.shape["model"])
        if axis <= 1 or self.ecfg.num_pages % axis == 0:
            return
        import dataclasses as _dc

        from painlessinferenceacceleration_tpu.engine.cache import init_kv_cache
        from painlessinferenceacceleration_tpu.engine.pages import PageAllocator

        rounded = self.ecfg.num_pages + (axis - self.ecfg.num_pages % axis)
        self.ecfg = _dc.replace(
            self.ecfg, num_pages=rounded, cache_memory_fraction=0.0
        )
        self.kv = init_kv_cache(self.cfg, self.ecfg, dtype=self.dtype)
        self.allocator = PageAllocator(self.ecfg.num_pages, self.ecfg.page_size)
        if self.prefix_cache is not None:
            from painlessinferenceacceleration_tpu.engine.prefix_cache import (
                PrefixCache,
            )

            self.prefix_cache = PrefixCache(self.allocator, self.ecfg.page_size)

    def generate(self, *args, **kwargs):
        """Scheduler loop under the ambient mesh: the EP and CP shard_map
        paths (models/moe.py, ops/cp_attention.py) bind mesh axes at trace
        time via jax.set_mesh."""
        import jax as _jax

        with _jax.set_mesh(self.mesh):
            return super().generate(*args, **kwargs)

    def step(self, *args, **kwargs):
        import jax as _jax

        with _jax.set_mesh(self.mesh):
            return super().step(*args, **kwargs)
