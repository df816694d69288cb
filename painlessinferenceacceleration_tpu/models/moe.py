"""Mixture-of-Experts decoder layers (mixtral / qwen3-moe / bailing /
deepseek-lite class).

Reference: flood/layers/moe.py — AutoExperts with NativeExperts /
StackExperts (expert weights stacked into single tensors, :1018-1309) and
the vLLM-derived fused_moe Triton kernel (:40-675); router top-k softmax
(csrc/moe/topk_softmax_kernels.cu), grouped_topk (:580) for deepseek.

TPU-first design: experts are stacked tensors ``[n_exp, in, out]`` and the
forward *scans over experts*, streaming each expert's weights from HBM once
and accumulating the router-weighted contribution of every token:

    out = sum_x route_w[:, x] * mlp_x(tokens)

Decode batches touch nearly all experts collectively, so all expert weights
must be read from HBM regardless of dispatch — the scan is bandwidth-optimal
there and needs no sorting/alignment machinery (the reference's
moe_align_block_size). MXU-bound prefill batches instead route to the
grouped-matmul path (ops/moe_matmul.py): tokens sorted by expert, block-
padded, and two Pallas GEMMs whose weight tile is chosen per block from a
scalar-prefetched block->expert map — exact (no capacity dropping), with
(n_exp / top_k)x fewer FLOPs than the scan.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from painlessinferenceacceleration_tpu.config import ModelConfig
from painlessinferenceacceleration_tpu.layers.linear import (
    QuantSpec,
    linear,
    make_linear,
)


def init_moe_layer(cfg: ModelConfig, key, dtype, spec: Optional[QuantSpec]) -> dict:
    """Extra params for one MoE layer (added to the attention params)."""
    E = cfg.hidden_size
    I = cfg.moe_intermediate_size or cfg.intermediate_size
    X = cfg.num_experts
    ks = jax.random.split(key, 4)
    std = 0.02

    def w(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * std).astype(dtype)

    p = {
        "router": w(ks[0], (E, X)),  # kept bf16: tiny, precision-critical
        "moe_wgu": _make_expert(w(ks[1], (X, E, 2 * I)), spec),
        "moe_wdown": _make_expert(w(ks[2], (X, I, E)), spec),
    }
    if cfg.scoring_func == "sigmoid":
        p["router_bias"] = jnp.zeros((X,), jnp.float32)
    if cfg.num_shared_experts:
        Ish = I * cfg.num_shared_experts
        p["shared_wgu"] = make_linear(w(ks[3], (E, 2 * Ish)), spec)
        p["shared_wdown"] = make_linear(
            w(jax.random.split(ks[3])[0], (Ish, E)), spec
        )
    return p


def _make_expert(w3, spec):
    """Quantize a stacked [X, in, out] expert tensor (vmap over experts)."""
    if spec is None:
        return w3
    from painlessinferenceacceleration_tpu.layers.linear import quantize

    return jax.vmap(lambda w: quantize(w, spec))(w3)


def route_topk(
    cfg: ModelConfig, router_logits: jax.Array, bias: Optional[jax.Array] = None
) -> jax.Array:
    """[T, X] logits -> [T, X] routing weights (zeros off the top-k).

    Covers fused_topk (moe.py:547, softmax-then-topk with renormalization)
    and deepseek-v3 noaux-tc routing: sigmoid scores, e_score_correction
    bias for selection only, group-limited top-k (reference grouped_topk,
    moe.py:580 / csrc/moe/topk_softmax_kernels.cu).
    """
    k = cfg.num_experts_per_tok
    T, X = router_logits.shape
    lf = router_logits.astype(jnp.float32)
    if cfg.scoring_func == "sigmoid":
        scores = jax.nn.sigmoid(lf)
        choice = scores + (bias if bias is not None else 0.0)
    else:
        scores = jax.nn.softmax(lf, axis=-1)
        choice = scores
    if cfg.n_group > 1 and cfg.topk_group > 0:
        G = cfg.n_group
        cg = choice.reshape(T, G, X // G)
        if cfg.scoring_func == "sigmoid":
            # v3 noaux-tc rule: group score = sum of its top-2 expert scores
            gscore = jax.lax.top_k(cg, min(2, X // G))[0].sum(axis=-1)  # [T, G]
        else:
            # v2 grouped top-k scores a group by its max expert (HF
            # DeepseekV2 moe_gate; the top-2 sum is v3-only)
            gscore = cg.max(axis=-1)
        _, gi = jax.lax.top_k(gscore, cfg.topk_group)
        gmask = jnp.zeros((T, G), bool).at[jnp.arange(T)[:, None], gi].set(True)
        choice = jnp.where(
            jnp.repeat(gmask, X // G, axis=1), choice, -jnp.inf
        )
    topv_choice, topi = jax.lax.top_k(choice, k)
    topv = jnp.take_along_axis(scores, topi, axis=1)  # weights w/o bias
    if cfg.norm_topk_prob:
        topv = topv / (jnp.sum(topv, axis=-1, keepdims=True) + 1e-20)
    topv = topv * cfg.routed_scaling_factor
    w = jnp.zeros((T, X), jnp.float32)
    w = w.at[jnp.arange(T)[:, None], topi].set(topv)
    return w


def _moe_expert_parallel(
    lp: dict, cfg: ModelConfig, spec: Optional[QuantSpec],
    x: jax.Array, route_w: jax.Array,
) -> jax.Array:
    """Expert parallelism (SURVEY §2.5): the EXPERT axis of the stacked
    weights shards across 'model' (see parallel/mesh.py _ep_stack_specs).

    ROUTED path (the reference's sharded fused_experts,
    flood/layers/moe.py:675 + moe_align_block_size :258): inside a
    shard_map over 'model' each device top-k's the replicated routing
    weights, DROPS the (token, choice) pairs owned by remote shards (the
    moe_align overflow bin), and runs the grouped two-GEMM expert MLP over
    only its LOCAL routed rows — sum(top_k) rows per step split across
    shards instead of the dense all-experts T*X, an (X/k * tp)x FLOP cut.
    One psum over 'model' combines shard contributions (exact: every
    (token, expert) pair is computed by exactly one shard). Supports
    bf16 and weight-only INT8/INT4 experts (grouped_quant_matmul).

    Requires an ambient mesh (jax.set_mesh) so the shard_map can bind the
    'model' axis; without one — or for activation-quantized experts — bf16
    experts fall back to the dense all-experts einsum whose zero-masked sum
    GSPMD turns into local-expert compute + psum (correct, X/k x the
    FLOPs), and quantized experts return None (caller's scan path)."""
    from jax.sharding import PartitionSpec as P, get_abstract_mesh

    T, E = x.shape
    X = cfg.num_experts
    k = cfg.num_experts_per_tok
    I = cfg.moe_intermediate_size or cfg.intermediate_size
    quant = isinstance(lp["moe_wgu"], dict)
    am = get_abstract_mesh()
    tp = am.shape.get("model", 1) if am is not None else 1
    routed_ok = (
        tp > 1
        and X % tp == 0
        and (not quant or (spec is not None and spec.act is None
                           and not spec.block))
    )
    if routed_ok:
        Xl = X // tp
        wspec = (
            {kk: P("model", *([None] * (vv.ndim - 1)))
             for kk, vv in lp["moe_wgu"].items()}
            if quant else P("model", None, None)
        )
        interpret = jax.default_backend() == "cpu"

        def local(xl, rwl, wgu_l, wdn_l):
            from painlessinferenceacceleration_tpu.ops.moe_matmul import (
                routed_expert_mlp,
            )

            base = jax.lax.axis_index("model") * Xl
            topv, topi = jax.lax.top_k(rwl, k)
            valid = (topi >= base) & (topi < base + Xl) & (topv > 0.0)
            ex = jnp.where(valid, topi - base, Xl)  # Xl = dropped sentinel
            tw = jnp.where(valid, topv, 0.0)
            out = routed_expert_mlp(
                xl, ex, tw, wgu_l, wdn_l, Xl, I, spec, interpret=interpret
            )
            return jax.lax.psum(out, "model")

        return jax.shard_map(
            local,
            mesh=am,
            in_specs=(P(None, None), P(None, None), wspec, wspec),
            out_specs=P(None, None),
            axis_names={"model"},
            check_vma=False,  # pallas_call outputs carry no vma metadata
        )(x, route_w, lp["moe_wgu"], lp["moe_wdown"])

    # dense all-experts fallback: parallel over x, GSPMD shards the expert
    # axis and psums the zero-masked sum. Exact but X/k x the routed FLOPs.
    # Quantized experts can't ride the einsum -> signal scan fallback.
    if quant:
        return None
    wgu = lp["moe_wgu"].astype(x.dtype)  # [X, E, 2I]
    wdn = lp["moe_wdown"].astype(x.dtype)  # [X, I, E]
    gu = jnp.einsum("te,xei->txi", x, wgu, preferred_element_type=jnp.float32)
    act = (jax.nn.silu(gu[..., :I]) * gu[..., I:]).astype(x.dtype)
    return jnp.einsum(
        "txi,xie,tx->te", act, wdn, route_w.astype(x.dtype),
        preferred_element_type=jnp.float32,
    )


def moe_block(
    lp: dict, cfg: ModelConfig, spec: Optional[QuantSpec], h: jax.Array
) -> jax.Array:
    """MoE MLP over h [B, Q, E]."""
    B, Q, E = h.shape
    x = h.reshape(B * Q, E)
    router_logits = jnp.matmul(
        x, lp["router"].astype(x.dtype), preferred_element_type=jnp.float32
    )
    route_w = route_topk(cfg, router_logits, lp.get("router_bias"))  # [T, X]

    I = cfg.moe_intermediate_size or cfg.intermediate_size

    from painlessinferenceacceleration_tpu.ops.moe_matmul import (
        moe_block_grouped,
        use_grouped_moe,
    )

    ep_out = (
        _moe_expert_parallel(lp, cfg, spec, x, route_w)
        if cfg.expert_parallel else None
    )
    if ep_out is not None:
        out = ep_out.astype(h.dtype)
    elif use_grouped_moe(cfg, spec, lp, B * Q):
        out = moe_block_grouped(lp, cfg, h, route_w).reshape(B * Q, E)
        out = out.astype(h.dtype)
    else:

        def expert_body(carry, xs):
            acc = carry
            wgu, wdown, rw = xs  # this expert's weights + route col [T]
            gu = linear(wgu, x, spec)
            act = (
                jax.nn.silu(gu[..., :I].astype(jnp.float32)).astype(x.dtype)
                * gu[..., I:]
            )
            out = linear(wdown, act, spec)
            acc = acc + out.astype(jnp.float32) * rw[:, None]
            return acc, None

        acc0 = jnp.zeros((B * Q, E), jnp.float32)
        acc, _ = jax.lax.scan(
            expert_body, acc0, (lp["moe_wgu"], lp["moe_wdown"], route_w.T)
        )
        out = acc.astype(h.dtype)

    if "shared_wgu" in lp:  # deepseek/bailing shared experts (always on)
        gu = linear(lp["shared_wgu"], x, spec)
        half = gu.shape[-1] // 2
        act = jax.nn.silu(gu[..., :half].astype(jnp.float32)).astype(x.dtype) * gu[..., half:]
        out = out + linear(lp["shared_wdown"], act, spec)
    return out.reshape(B, Q, E)
