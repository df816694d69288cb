"""Mesh construction and sharding rules.

Axes:
- ``data``  — request-batch parallelism (replaces the reference's scheduler
  process fan-out, flood/facade/llm.py:529-549),
- ``model`` — tensor parallelism over attention heads / mlp hidden
  (replaces the reference's layer-split pipeline, llm.py:354-392).

Megatron-style placement: qkv & gate/up column-parallel, o_proj & down
row-parallel, KV pages sharded on the kv-heads axis. Norm weights and rope
tables replicate.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from painlessinferenceacceleration_tpu.config import ModelConfig


def make_mesh(
    shape: Optional[Tuple[int, int]] = None,
    axes: Tuple[str, str] = ("data", "model"),
    devices=None,
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (1, n)
    assert shape[0] * shape[1] == n, (shape, n)
    dev = np.asarray(devices).reshape(shape)
    return Mesh(dev, axes)


def param_shardings(cfg: ModelConfig, mesh: Mesh, params: dict) -> dict:
    """PartitionSpec pytree matching the params structure.

    Quantized linear leaves are dicts {"q","s"}: both shard on the same
    output axis (scales are [groups, out]).
    """
    tp = mesh.shape["model"]

    def col(ndim):  # column-parallel: shard last (out) axis
        return P(*([None] * (ndim - 1) + ["model"]))

    def row(ndim):  # row-parallel: shard second-to-last (in) axis
        return P(*([None] * (ndim - 2) + ["model", None]))

    def lin(leaf, kind):
        if isinstance(leaf, dict):
            # q: [L, in, out] (or packed), s: [L, groups, out]
            if kind == "col":
                return {"q": col(leaf["q"].ndim), "s": col(leaf["s"].ndim)}
            return {"q": row(leaf["q"].ndim), "s": row(leaf["s"].ndim)}
        return col(leaf.ndim) if kind == "col" else row(leaf.ndim)

    L = params["layers"]
    layer_specs = {}
    for name, leaf in L.items():
        if name in ("wqkv", "wgu"):
            layer_specs[name] = lin(leaf, "col")
        elif name in ("wo", "wdown"):
            layer_specs[name] = lin(leaf, "row")
        elif name == "bqkv":
            layer_specs[name] = P(None, "model")
        else:  # norms, qk-norm scales
            layer_specs[name] = P(*([None] * leaf.ndim))
    specs = {
        "embed": P(None, "model") if params["embed"].shape[1] % tp == 0 else P(),
        "layers": layer_specs,
        "final_ln": P(None),
    }
    if "lm_head" in params:
        specs["lm_head"] = lin(params["lm_head"], "col")
    return specs


def kv_shardings(cfg: ModelConfig, mesh: Mesh, kv: dict) -> dict:
    """KV arena: shard the kv-heads axis on 'model' when it divides evenly,
    else replicate (MHA small-head fallback)."""
    tp = mesh.shape["model"]
    head_spec = "model" if cfg.num_key_value_heads % tp == 0 else None
    # folded token-major arena [L, np, ps, H*D]: heads shard on the trailing
    # axis (per-head 128-blocks divide evenly across shards)
    page_spec = P(None, None, None, head_spec)
    out = {}
    for k, v in kv.items():
        if k in ("k", "v"):
            out[k] = page_spec
        elif k == "s":  # linear-attn state [n_lin, slots, H, Dk, Dv]
            hs = "model" if cfg.num_attention_heads % tp == 0 else None
            out[k] = P(None, None, hs, None, None)
        else:  # per-(layer, head) scales
            out[k] = P(None, head_spec)
    return out


def shard_params(params: dict, cfg: ModelConfig, mesh: Mesh) -> dict:
    specs = param_shardings(cfg, mesh, params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params,
        specs,
        is_leaf=lambda x: isinstance(x, jax.Array) or hasattr(x, "shape"),
    )


def shard_kv(kv: dict, cfg: ModelConfig, mesh: Mesh) -> dict:
    specs = kv_shardings(cfg, mesh, kv)
    return {
        k: jax.device_put(v, NamedSharding(mesh, specs[k])) for k, v in kv.items()
    }


def batch_shardings(mesh: Mesh):
    """Request-batch arrays shard on 'data' (first axis)."""

    def spec(ndim):
        return P(*(["data"] + [None] * (ndim - 1)))

    return spec
