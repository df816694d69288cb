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


# Name-based tensor-parallel placement rules. One table covers every model
# family (dense / MoE / MLA / linear-hybrid / legacy): leaves are looked up by
# their pytree key regardless of which stack ("layers", "moe_layers",
# "hybrid_layers") they live in. Megatron placement: projections INTO
# head/expert/hidden space are column-parallel (shard the out axis), the
# projections back are row-parallel (shard the in axis).
_COL_LEAVES = frozenset({
    "wqkv", "wgu", "wq", "q_b", "kv_b",      # dense + MLA up-projections
    "moe_wgu", "shared_wgu", "w_gate",        # MoE experts + linear-attn gate
    "lm_head",
})
_ROW_LEAVES = frozenset({
    "wo", "wdown", "moe_wdown", "shared_wdown",
})
_COL_BIAS_LEAVES = frozenset({"bqkv", "bgu"})
# small latents / routers / norms / decays / row-parallel biases replicate
# (row-parallel bias adds to the all-reduced output, so it must be whole).


def _col(ndim):  # column-parallel: shard last (out) axis
    return P(*([None] * (ndim - 1) + ["model"]))


def _row(ndim):  # row-parallel: shard second-to-last (in) axis
    return P(*([None] * (ndim - 2) + ["model", None]))


def _leaf_spec(name: str, leaf):
    def lin(kind):
        if isinstance(leaf, dict):  # quantized {"q","s"(,"xs")}: q/s follow
            # the placement; any extra leaf (static act scale xs, ...)
            # replicates
            out = {}
            for k2, v2 in leaf.items():
                nd = getattr(v2, "ndim", 0)
                if k2 in ("q", "s"):
                    out[k2] = _col(nd) if kind == "col" else _row(nd)
                else:
                    out[k2] = P(*([None] * nd))
            return out
        return _col(leaf.ndim) if kind == "col" else _row(leaf.ndim)

    if name in _COL_LEAVES:
        return lin("col")
    if name in _ROW_LEAVES:
        return lin("row")
    if name in _COL_BIAS_LEAVES:
        return _col(leaf.ndim)
    if isinstance(leaf, dict):
        return {k: P(*([None] * v.ndim)) for k, v in leaf.items()}
    return P(*([None] * leaf.ndim))


def _stack_specs(stack: dict) -> dict:
    return {name: _leaf_spec(name, leaf) for name, leaf in stack.items()}


def param_shardings(cfg: ModelConfig, mesh: Mesh, params: dict) -> dict:
    """PartitionSpec pytree matching the params structure (any model family).

    Quantized linear leaves are dicts {"q","s"}: both shard on the same
    output axis (scales are [groups, out]).
    """
    tp = mesh.shape["model"]

    def _ep_stack_specs(stack: dict) -> dict:
        """Expert-parallel placement: stacked expert weights shard on the
        EXPERT axis; everything else follows the name table. Pairs with the
        dense all-experts einsum in models/moe.py (cfg.expert_parallel)."""
        out = {}
        def expert_axis_spec(v):
            # layer-stacked leaves are [L, X, ...] (expert axis 1); hybrid
            # per-layer dicts hold [X, ...] (expert axis 0). Quantized
            # experts ({"q","s"} leaves, layers/linear.py) carry the expert
            # axis in the same position. Sub-matrix leaves (static act
            # scales etc.) are tiny -> replicate.
            if v.ndim < 3:
                return P(*([None] * v.ndim))
            ax = 1 if v.ndim == 4 else 0
            spec = [None] * v.ndim
            spec[ax] = "model"
            return P(*spec)

        for name, leaf in stack.items():
            if name in ("moe_wgu", "moe_wdown"):
                out[name] = (
                    {k2: expert_axis_spec(v2) for k2, v2 in leaf.items()}
                    if isinstance(leaf, dict) else expert_axis_spec(leaf)
                )
            else:
                out[name] = _leaf_spec(name, leaf)
        return out

    if cfg.context_parallel:
        # CP: the 'model' axis carries KV PAGES (kv_shardings), so params
        # replicate on it (q must see all heads inside the CP shard_map).
        # 'data' still shards the batch inputs.
        def _rep(x):
            return P(*([None] * x.ndim))

        return jax.tree.map(_rep, params)

    stack_specs = (
        _ep_stack_specs if getattr(cfg, "expert_parallel", False)
        else _stack_specs
    )
    specs: dict = {}
    for name, sub in params.items():
        if name in ("layers", "moe_layers"):
            specs[name] = stack_specs(sub)
        elif name == "hybrid_layers":  # tuple of per-layer dicts
            specs[name] = tuple(stack_specs(lp) for lp in sub)
        elif name in ("embed", "pos_embed", "block_pos_embed"):
            if isinstance(sub, dict):  # fp8 table: {"q": [V, E], "s": [V]}
                specs[name] = {
                    "q": (P(None, "model") if sub["q"].shape[1] % tp == 0
                          else P(None, None)),
                    "s": P(None),
                }
            else:
                specs[name] = (
                    P(None, "model") if sub.shape[1] % tp == 0 else P(None, None)
                )
        elif name == "lm_head":
            specs[name] = _leaf_spec("lm_head", sub)
        else:  # final_ln(_b), embed_ln(_b), ...
            specs[name] = P(*([None] * sub.ndim))
    return specs


def kv_shardings(cfg: ModelConfig, mesh: Mesh, kv: dict) -> dict:
    """KV arena: shard the kv-heads axis on 'model' when it divides evenly,
    else replicate (MHA small-head fallback)."""
    tp = mesh.shape["model"]
    if cfg.context_parallel:
        # CP: PAGE axis shards over 'model' (heads stay whole); scale arenas
        # co-partition their page axis. ops/cp_attention.py masks non-local
        # pages inside the shard_map.
        out = {}
        for k, v in kv.items():
            if k in ("k", "v") or v.ndim == 4:  # arenas + fp8_tok scales
                out[k] = P(None, "model", None, None)
            else:
                out[k] = P(*([None] * v.ndim))
        return out
    if cfg.is_mla:
        from painlessinferenceacceleration_tpu.models.mla import mla_cache_heads

        # latent mode caches ONE shared head -> the arena replicates (it is
        # 56x smaller); expanded mode shards the per-head fold like dense
        n_heads = mla_cache_heads(cfg)
    else:
        n_heads = cfg.num_key_value_heads
    head_spec = "model" if (n_heads % tp == 0 and n_heads >= tp) else None
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
        elif v.ndim == 4:  # fp8_tok per-token scales [L, np, ps, 128pad]:
            # the lane-padded head axis (real heads in lanes [0:Hkv]) does
            # NOT align with the page arenas' head fold — replicate (512
            # B/token, small next to the sharded fp8 pages)
            out[k] = P(None, None, None, None)
        else:  # static per-(layer, head) scales [L, H]
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
