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

    topi/topv: [T, k] expert ids / routing weights.
    Returns (dest_tok [R] int32 — source token per padded row, pad rows = T,
    row_w [R] f32, block_expert [NB] int32) with R = NB*BLOCK_M and
    NB = ceil(T*k/BLOCK_M) + n_experts (static worst-case padding).
    """
    T, k = topi.shape
    M = T * k
    NB = -(-M // BLOCK_M) + n_experts
    R = NB * BLOCK_M

    ex = topi.reshape(M).astype(jnp.int32)
    wt = topv.reshape(M).astype(jnp.float32)
    tok = jnp.repeat(jnp.arange(T, dtype=jnp.int32), k)

    order = jnp.argsort(ex, stable=True)
    ex_s, tok_s, wt_s = ex[order], tok[order], wt[order]

    counts = jnp.bincount(ex, length=n_experts)  # [X]
    nb_x = -(-counts // BLOCK_M)  # blocks per expert
    boff = jnp.cumsum(nb_x) - nb_x  # exclusive block offsets
    ccum = jnp.cumsum(counts) - counts  # exclusive token offsets
    pos = jnp.arange(M, dtype=jnp.int32) - ccum[ex_s].astype(jnp.int32)
    dest = boff[ex_s].astype(jnp.int32) * BLOCK_M + pos

    dest_tok = jnp.full((R,), n_tokens, jnp.int32).at[dest].set(tok_s)
    row_w = jnp.zeros((R,), jnp.float32).at[dest].set(wt_s)
    block_expert = jnp.clip(
        jnp.searchsorted(jnp.cumsum(nb_x), jnp.arange(NB), side="right"),
        0, n_experts - 1,
    ).astype(jnp.int32)
    n_used = jnp.sum(nb_x).astype(jnp.int32).reshape(1)
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
    dest_tok, row_w, block_expert, n_used = moe_align(topi, topv, X, T)

    x_pad = jnp.concatenate([x, jnp.zeros((1, E), x.dtype)], axis=0)
    xg = x_pad[dest_tok]  # [R, E]; pad rows read the zero row
    gu = grouped_matmul(
        xg, block_expert, n_used, lp["moe_wgu"].astype(x.dtype),
        interpret=interpret,
    )  # [R, 2I]
    act = (
        jax.nn.silu(gu[..., :I].astype(jnp.float32)).astype(x.dtype)
        * gu[..., I:]
    )
    outr = grouped_matmul(
        act, block_expert, n_used, lp["moe_wdown"].astype(x.dtype),
        interpret=interpret,
    )  # [R, E]
    out = jnp.zeros((T + 1, E), jnp.float32)
    out = out.at[dest_tok].add(outr.astype(jnp.float32) * row_w[:, None])
    return out[:T].reshape(B, Q, E)


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
