"""Parallelism: device mesh, sharding rules, collectives.

The reference scales by pure pipeline parallelism over CUDA streams and
NCCL p2p (flood/README.md:21, SURVEY §2.5) — and explicitly avoids tensor
parallelism. The TPU-native design inverts this: weights and the KV arena
are tensor-sharded over the ICI mesh via jax.sharding/pjit (collectives ride
ICI; XLA overlaps them with compute), data parallelism is a mesh axis instead
of scheduler-process fan-out, and cross-host goes over DCN with the same
GSPMD machinery instead of NCCL object pickling.
"""

from painlessinferenceacceleration_tpu.parallel.mesh import (  # noqa: F401
    kv_shardings,
    make_mesh,
    param_shardings,
    shard_kv,
    shard_params,
)
