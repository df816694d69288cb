"""Grouped (megablocks-style) MoE matmul for MXU-bound prefill.

Reference: flood/layers/moe.py:40-675 — the vLLM-derived fused_moe Triton
kernel + moe_align_block_size (tokens sorted by expert, each expert's run
padded to the matmul block so every block touches exactly one expert).

TPU re-design: the alignment is plain jnp (stable sort by expert id +
exclusive-cumsum block offsets — static shapes, no host round trip), and the
two GEMMs are Pallas kernels whose WEIGHT BlockSpec index_map reads the
block->expert table from scalar prefetch (SMEM): each grid step DMAs only
the selected expert's weight tile from HBM, so no [n_blocks, E, I] weight
gather is ever materialized (the same trick as the stacked-layer GEMM in
ops/quant_matmul.py). Unlike capacity-factor dispatch, this path is EXACT —
no token dropping — and computes sum(top_k) rows instead of the
scan-over-experts path's T*n_experts (models/moe.py:113), an
(n_experts/top_k)x FLOP cut for prefill.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_M = 128


def moe_align(topi: jax.Array, topv: jax.Array, n_experts: int, n_tokens: int):
    """Sort (token, expert) pairs by expert and pad each expert's run to
    BLOCK_M rows (the reference's moe_align_block_size, moe.py:172-260).

    topi/topv: [T, k] expert ids / routing weights. Entries with expert id
    == n_experts are DROPPED: they sort past every real expert into virtual
    overflow blocks at indices >= n_used, which the grouped kernels skip
    (zero output) — the expert-parallel path uses this to exclude tokens
    routed to remote shards without dynamic shapes.

    Returns (dest_tok [R] int32 — source token per padded row, pad rows = T,
    row_w [R] f32, block_expert [NB] int32, n_used [1] int32) with
    R = NB*BLOCK_M and NB = ceil(T*k/BLOCK_M) + n_experts + 1 (static
    worst-case padding incl. the overflow bin).
    """
    T, k = topi.shape
    M = T * k
    NB = -(-M // BLOCK_M) + n_experts + 1
    R = NB * BLOCK_M

    ex = topi.reshape(M).astype(jnp.int32)
    wt = topv.reshape(M).astype(jnp.float32)
    tok = jnp.repeat(jnp.arange(T, dtype=jnp.int32), k)

    order = jnp.argsort(ex, stable=True)
    ex_s, tok_s, wt_s = ex[order], tok[order], wt[order]
    wt_s = jnp.where(ex_s < n_experts, wt_s, 0.0)  # dropped rows weigh 0

    counts = jnp.bincount(ex, length=n_experts + 1)  # [X+1] incl. dropped
    nb_x = -(-counts // BLOCK_M)  # blocks per expert (+ overflow bin)
    boff = jnp.cumsum(nb_x) - nb_x  # exclusive block offsets
    ccum = jnp.cumsum(counts) - counts  # exclusive token offsets
    pos = jnp.arange(M, dtype=jnp.int32) - ccum[ex_s].astype(jnp.int32)
    dest = boff[ex_s].astype(jnp.int32) * BLOCK_M + pos

    dest_tok = jnp.full((R,), n_tokens, jnp.int32).at[dest].set(tok_s)
    row_w = jnp.zeros((R,), jnp.float32).at[dest].set(wt_s)
    real_cum = jnp.cumsum(nb_x[:n_experts])
    block_expert = jnp.clip(
        jnp.searchsorted(real_cum, jnp.arange(NB), side="right"),
        0, n_experts - 1,
    ).astype(jnp.int32)
    n_used = real_cum[-1].astype(jnp.int32).reshape(1)
    return dest_tok, row_w, block_expert, n_used


def _gmm_kernel(be_ref, nused_ref, x_ref, w_ref, o_ref):
    del be_ref  # consumed by the weight index_map
    b = pl.program_id(1)

    @pl.when(b < nused_ref[0])
    def _():
        o_ref[...] = jnp.dot(
            x_ref[...], w_ref[0], preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)

    @pl.when(b >= nused_ref[0])
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)


@functools.partial(jax.jit, static_argnames=("interpret",))
def grouped_matmul(
    x: jax.Array,  # [R, K] (R = NB*BLOCK_M, rows grouped by expert)
    block_expert: jax.Array,  # [NB] int32 expert of each row block
    n_used: jax.Array,  # [1] int32 blocks holding >=1 real row
    w: jax.Array,  # [X, K, N] stacked expert weights
    interpret: bool = False,
) -> jax.Array:
    """Per-block expert GEMM; block b computes x[b] @ w[block_expert[b]].

    Grid is (N tiles, row blocks) with the row-block axis INNERMOST: blocks
    are expert-sorted, so the weight index_map output repeats across a run
    of same-expert blocks and Pallas elides the re-DMA — each expert's
    weight tile crosses HBM once per N tile, like the streaming scan, while
    only routed rows are computed. Worst-case pad blocks past ``n_used``
    skip the MXU entirely."""
    R, K = x.shape
    X, _, N = w.shape
    NB = R // BLOCK_M
    BN = min(512, N)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(pl.cdiv(N, BN), NB),
        in_specs=[
            pl.BlockSpec((BLOCK_M, K), lambda n, b, be, nu: (b, 0)),
            pl.BlockSpec((1, K, BN), lambda n, b, be, nu: (be[b], 0, n)),
        ],
        out_specs=pl.BlockSpec((BLOCK_M, BN), lambda n, b, be, nu: (b, n)),
    )
    return pl.pallas_call(
        _gmm_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R, N), x.dtype),
        interpret=interpret,
    )(block_expert, n_used, x, w)


def _gqmm4_kernel(be_ref, nused_ref, xq_ref, xsum_ref, q_ref, s_ref, o_ref):
    """Grouped int4 SWAR kernel: row block b uses expert be[b]'s weights;
    blocks past n_used (expert-run padding + dropped rows) write zeros."""
    del be_ref
    from painlessinferenceacceleration_tpu.ops.quant_matmul import _qmm4_v3_acc

    b = pl.program_id(1)

    @pl.when(b < nused_ref[0])
    def _():
        acc = _qmm4_v3_acc(xq_ref, xsum_ref, q_ref[0], s_ref[0])
        o_ref[...] = acc.astype(o_ref.dtype)

    @pl.when(b >= nused_ref[0])
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)


def _gqmm8_kernel(be_ref, nused_ref, x_ref, q_ref, s_ref, o_ref, acc_ref, *,
                  k_tile, group):
    del be_ref
    b = pl.program_id(1)
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(b < nused_ref[0])
    def _():
        ngt = k_tile // group
        s = s_ref[0, pl.ds(ki * ngt, ngt), :]
        x = x_ref[:]  # compute dtype follows x (bf16 on TPU, f32 in tests)
        qf = q_ref[0].astype(x.dtype)
        sf = jnp.repeat(s, group, axis=0).astype(x.dtype)
        acc_ref[:] += jnp.dot(x, qf * sf, preferred_element_type=jnp.float32)

    @pl.when(ki == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def grouped_quant_matmul(
    x: jax.Array,  # [R, K] rows grouped by expert (R = NB*BLOCK_M)
    block_expert: jax.Array,  # [NB] int32
    n_used: jax.Array,  # [1] int32
    p: dict,  # {"q": [X, Kq, N], "s": [X, K//group, N]} weight-only quant
    bits: int,
    interpret: bool = False,
) -> jax.Array:
    """Per-block expert GEMM over weight-only INT8/INT4 experts — the
    grouped twin of quant_matmul_pallas_stacked (same SWAR dequant bodies,
    expert chosen by the scalar-prefetched block->expert map). Covers the
    reference's quantized fused_experts (flood/layers/moe.py:675
    use_fp8_w8a8/use_int8_w8a16 branches) for the routed EP path."""
    q, s = p["q"], p["s"]
    R, K = x.shape
    X, _, N = q.shape
    groups = s.shape[1]
    group = K // groups
    NB = R // BLOCK_M
    n_tile = min(512, N)

    if bits == 4:
        from painlessinferenceacceleration_tpu.ops.quant_matmul import (
            _int4_x_planes,
        )

        half = group // 2
        xq, xsum = _int4_x_planes(x, groups, group)
        q4 = q.reshape(X, groups, half, N)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(pl.cdiv(N, n_tile), NB),
            in_specs=[
                pl.BlockSpec(
                    (BLOCK_M, groups, group), lambda n, b, be, nu: (b, 0, 0)
                ),
                pl.BlockSpec((BLOCK_M, groups), lambda n, b, be, nu: (b, 0)),
                pl.BlockSpec(
                    (1, groups, half, n_tile),
                    lambda n, b, be, nu: (be[b], 0, 0, n),
                ),
                pl.BlockSpec(
                    (1, groups, n_tile), lambda n, b, be, nu: (be[b], 0, n)
                ),
            ],
            out_specs=pl.BlockSpec(
                (BLOCK_M, n_tile), lambda n, b, be, nu: (b, n)
            ),
        )
        return pl.pallas_call(
            _gqmm4_kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((R, N), jnp.bfloat16),
            interpret=interpret,
        )(block_expert, n_used, xq, xsum, q4, s)

    k_tile = max(group, (min(2048, K) // group) * group)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(pl.cdiv(N, n_tile), NB, pl.cdiv(K, k_tile)),
        in_specs=[
            pl.BlockSpec((BLOCK_M, k_tile), lambda n, b, k, be, nu: (b, k)),
            pl.BlockSpec(
                (1, k_tile, n_tile), lambda n, b, k, be, nu: (be[b], k, n)
            ),
            pl.BlockSpec(
                (1, groups, n_tile), lambda n, b, k, be, nu: (be[b], 0, n)
            ),
        ],
        out_specs=pl.BlockSpec(
            (BLOCK_M, n_tile), lambda n, b, k, be, nu: (b, n)
        ),
        scratch_shapes=[pltpu.VMEM((BLOCK_M, n_tile), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_gqmm8_kernel, k_tile=k_tile, group=group),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R, N), x.dtype),
        interpret=interpret,
    )(block_expert, n_used, x, q, s)


def routed_expert_mlp(
    x: jax.Array,  # [T, E]
    topi: jax.Array,  # [T, k] expert ids; id == n_experts -> dropped
    topv: jax.Array,  # [T, k] routing weights
    wgu,  # [X, E, 2I] bf16 or weight-only quant dict (X = local experts)
    wdown,  # [X, I, E] likewise
    n_experts: int,
    inter_size: int,
    spec=None,
    interpret: bool = False,
) -> jax.Array:
    """Exact routed two-GEMM expert MLP (align -> gather -> gate -> scatter).

    The shared core of the grouped prefill path and the expert-parallel
    per-shard path (reference fused_experts, flood/layers/moe.py:675).
    Returns the routed contribution [T, E] in f32."""
    T, E = x.shape
    I = inter_size
    dest_tok, row_w, block_expert, n_used = moe_align(
        topi, topv, n_experts, T
    )
    x_pad = jnp.concatenate([x, jnp.zeros((1, E), x.dtype)], axis=0)
    xg = x_pad[dest_tok]  # [R, E]; pad/dropped rows read the zero row

    def gmm(inp, w):
        if isinstance(w, dict):
            return grouped_quant_matmul(
                inp, block_expert, n_used, w, spec.bits, interpret=interpret
            )
        return grouped_matmul(
            inp, block_expert, n_used, w.astype(inp.dtype),
            interpret=interpret,
        )

    gu = gmm(xg, wgu)  # [R, 2I]
    act = (
        jax.nn.silu(gu[..., :I].astype(jnp.float32)).astype(x.dtype)
        * gu[..., I:]
    )
    outr = gmm(act, wdown)  # [R, E]
    out = jnp.zeros((T + 1, E), jnp.float32)
    out = out.at[dest_tok].add(outr.astype(jnp.float32) * row_w[:, None])
    return out[:T]


def moe_block_grouped(
    lp: dict,
    cfg,
    h: jax.Array,  # [B, Q, E]
    route_w: jax.Array,  # [T, X] dense routing weights (zeros off top-k)
    interpret: bool = False,
) -> jax.Array:
    """Routed-experts contribution via grouped matmul (bf16 experts only;
    quantized experts use the scan path). Shared experts are handled by the
    caller (models/moe.py moe_block)."""
    B, Q, E = h.shape
    T = B * Q
    X = cfg.num_experts
    k = cfg.num_experts_per_tok
    I = cfg.moe_intermediate_size or cfg.intermediate_size
    x = h.reshape(T, E)

    topv, topi = jax.lax.top_k(route_w, k)  # recover sparse routing
    out = routed_expert_mlp(
        x, topi, topv, lp["moe_wgu"], lp["moe_wdown"], X, I,
        interpret=interpret,
    )
    return out.reshape(B, Q, E)


def use_grouped_moe(cfg, spec, lp, n_tokens: int) -> bool:
    """Prefill-size batches on TPU with bf16 experts; decode batches touch
    ~every expert so the streaming scan is already bandwidth-optimal.

    Measured crossover (v5e, E=1024/I=512): wins once the average routed
    rows per expert fill >=2 blocks (amortizes alignment + gathers) —
    1.63x at T=4096/X=64/k=4, and grows with expert count since the scan
    degrades linearly in X while this path scales with top_k."""
    X, k = cfg.num_experts, cfg.num_experts_per_tok
    return (
        jax.default_backend() not in ("cpu", "gpu")
        and spec is None
        and not isinstance(lp["moe_wgu"], dict)
        and n_tokens * k >= 2 * BLOCK_M * X
    )
