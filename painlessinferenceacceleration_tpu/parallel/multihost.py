"""Multi-host serving over DCN (cross-slice) + ICI (intra-slice).

Reference: flood/facade/dist_llm.py — two-node pipeline over NCCL p2p with
rank 0 owning all scheduling and activations pickled across
(`Batch.send/recv`, batch.py:748-898; SURVEY §2.5 calls out the costs).

TPU-native replacement:
- `jax.distributed.initialize()` turns N hosts into one JAX process group;
  the (dcn, data, model) mesh places tensor-parallel shards on ICI and
  data-parallel replicas across DCN — XLA moves activations, nothing is
  pickled.
- Scheduling stays single-controller: host 0 runs the engine loop and every
  host executes the SAME jitted step on its address-local shard (GSPMD
  single-program). Request metadata (token ids, page tables) is broadcast
  as host-local numpy -> device_put with the mesh sharding; this is the
  "schedule broadcast" design from SURVEY §7 hard part 5.

This module is exercised on the virtual CPU mesh in tests (the driver's
dryrun_multichip covers the sharded step execution); real multi-host needs
a pod slice, which this environment does not provide — the initialization
path follows the standard jax.distributed contract.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

from painlessinferenceacceleration_tpu.parallel.mesh import make_mesh


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join the jax.distributed process group.

    Environment fallbacks mirror the reference's FLOOD_RANK/WORLD_SIZE/
    MASTER/PORT contract (dist_llm.py:25-28) with PIA_* names:
    PIA_COORDINATOR (host:port), PIA_NUM_PROCESSES, PIA_PROCESS_ID.
    On TPU pods with the standard metadata server, bare
    ``jax.distributed.initialize()`` autodetects everything.
    """
    if getattr(jax.distributed, "is_initialized", lambda: False)():
        return  # already joined (idempotent: DistLLM after a manual join)
    coordinator_address = coordinator_address or os.environ.get("PIA_COORDINATOR")
    if num_processes is None and "PIA_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["PIA_NUM_PROCESSES"])
    if process_id is None and "PIA_PROCESS_ID" in os.environ:
        process_id = int(os.environ["PIA_PROCESS_ID"])
    if coordinator_address is None:
        jax.distributed.initialize()  # TPU pod autodetection
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def make_multihost_mesh(
    tp: Optional[int] = None,
    axes: Tuple[str, str, str] = ("dcn", "data", "model"),
) -> Mesh:
    """3-axis mesh: model (TP) confined to a host's ICI domain, data within
    a slice, dcn across slices — collectives on the model axis never cross
    DCN (the scaling-book recipe; the reference instead pipelines across
    nodes, dist_llm.py:94-140)."""
    devices = jax.devices()
    n = len(devices)
    per_host = max(1, n // max(jax.process_count(), 1))
    tp = tp or per_host
    assert n % tp == 0
    dp = (n // tp) // max(jax.process_count(), 1) or 1
    dcn = n // (tp * dp)
    dev = np.asarray(devices).reshape(dcn, dp, tp)
    return Mesh(dev, axes)


def host_local_batch_to_global(mesh: Mesh, spec, arr: np.ndarray):
    """Place a host-built batch array into the mesh-sharded global array.

    With single-controller scheduling every host builds the same numpy
    batch; each process donates the rows its devices own
    (make_array_from_callback assembles the global array without any
    cross-host transfer). No pickled queues, no NCCL object lists
    (contrast batch.py:748-898).
    """
    from jax.sharding import NamedSharding

    sh = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(arr.shape, sh, lambda idx: arr[idx])
