"""In-place KV-arena updates as Pallas kernels (guaranteed zero-copy).

Reference: flood/csrc/cache/cache.cu (update_cache scatter) and
flood/ops/draft.py:546-570 (update_draft_cache compaction).

Why Pallas and not jnp scatter: XLA lowers advanced-index scatters on the
[L, np, ps, H, D] arena through relayout copies of the whole buffer
(measured 1.65 ms per layer per step on 7B — 100x the useful work) in both
index orders we tried. ``input_output_aliases`` on a pallas_call is a hard
in-place guarantee; each token row is one contiguous [H, D] DMA in the
token-major layout (the last two dims stay whole — Mosaic only allows thin
slices on leading, non-tiled dims).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RING = 8  # outstanding DMAs


def _write_kernel(page_idx_ref, row_idx_ref, layer_ref, rows_ref, pages_ref,
                  out_ref, sems, *, N):
    l = layer_ref[0]

    def mk(i):
        return pltpu.make_async_copy(
            rows_ref.at[i],
            out_ref.at[l, page_idx_ref[i], row_idx_ref[i]],
            sems.at[jax.lax.rem(i, RING)],
        )

    def body(i, _):
        @pl.when(i >= RING)
        def _():
            mk(i - RING).wait()

        mk(i).start()
        return 0

    jax.lax.fori_loop(0, N, body, 0)

    def drain(i, _):
        mk(i).wait()
        return 0

    jax.lax.fori_loop(jnp.maximum(N - RING, 0), N, drain, 0)


@jax.jit
def kv_write_rows(
    pages: jax.Array,  # [L, np, ps, H, D] (token-major)
    rows: jax.Array,  # [N, H, D] new rows (already dtype-converted)
    page_idx: jax.Array,  # [N] int32 (0 = null page for dropped rows)
    row_idx: jax.Array,  # [N] int32
    layer: jax.Array,  # scalar int32
) -> jax.Array:
    """Write rows[i] -> pages[layer, page_idx[i], row_idx[i]] in place."""
    N = rows.shape[0]
    layer_arr = jnp.asarray(layer, jnp.int32).reshape(1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(1,),
        in_specs=[
            # rows in HBM: HBM->HBM DMAs keep the tiled last-two dims whole
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # rows
            pl.BlockSpec(memory_space=pl.ANY),  # pages (aliased)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((RING,))],
    )
    return pl.pallas_call(
        functools.partial(_write_kernel, N=N),
        out_shape=jax.ShapeDtypeStruct(pages.shape, pages.dtype),
        grid_spec=grid_spec,
        input_output_aliases={4: 0},  # pages operand -> output
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(page_idx, row_idx, layer_arr, rows, pages)


def _move_kernel(sp_ref, sr_ref, dp_ref, dr_ref, pages_ref, out_ref, sems,
                 *, N):
    def mk(i):
        # one strided DMA moves this slot's row across ALL layers at once
        return pltpu.make_async_copy(
            out_ref.at[:, sp_ref[i], sr_ref[i]],
            out_ref.at[:, dp_ref[i], dr_ref[i]],
            sems.at[jax.lax.rem(i, RING)],
        )

    def body(i, _):
        @pl.when(i >= RING)
        def _():
            mk(i - RING).wait()

        mk(i).start()
        return 0

    jax.lax.fori_loop(0, N, body, 0)

    def drain(i, _):
        mk(i).wait()
        return 0

    jax.lax.fori_loop(jnp.maximum(N - RING, 0), N, drain, 0)


@jax.jit
def kv_move_rows_pallas(
    pages: jax.Array,  # [L, np, ps, H, D]
    src_page: jax.Array,  # [N] int32
    src_row: jax.Array,
    dst_page: jax.Array,  # [N] int32 (0 = null page for masked moves)
    dst_row: jax.Array,
) -> jax.Array:
    """pages[:, dst] = pages[:, src] in place (lookahead KV compaction).

    Accepted-branch rows always move to LOWER slots than their sources and
    sources are read before any destination overlapping them is written
    (sequential ring), so the move is safe without staging.
    """
    N = src_page.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((RING,))],
    )
    return pl.pallas_call(
        functools.partial(_move_kernel, N=N),
        out_shape=jax.ShapeDtypeStruct(pages.shape, pages.dtype),
        grid_spec=grid_spec,
        input_output_aliases={4: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(src_page, src_row, dst_page, dst_row, pages)


def _permute_kernel(page_ids_ref, src_rel_ref, pages_hbm, out_ref,
                    win_buf, out_buf, perm_ref, sems_in, sems_out, *,
                    L, TPP, ps):
    """Per request b: DMA the tail-window pages in, permute rows with a
    one-hot matmul (out[w'] = win[src_rel[w']]), DMA them back ALIASED.

    Exists because the jnp gather+scatter compaction made XLA pick a
    non-default arena layout inside the spec while-loop and relayout-copy
    the WHOLE 2.2 GB arena twice per step (profiled 6.6 ms/step at 7B);
    with both sides as in-kernel DMAs the arena never meets an XLA gather
    and keeps one layout."""
    b = pl.program_id(0)
    W = TPP * ps

    # one-hot permutation [W, W] — shared across layers:
    # perm[w', w] = (sel[w'] == w)
    ws = jax.lax.broadcasted_iota(jnp.int32, (W, W), 1)
    sel = src_rel_ref[b]  # [W] int32 (VMEM; full [B, W] block — a (1, W)
    # block has a second-to-last dim of 1, which Mosaic rejects for B > 1)
    perm_ref[:] = (sel[:, None] == ws).astype(jnp.float32)

    def dma_in(slot, l, p):
        return pltpu.make_async_copy(
            pages_hbm.at[l, page_ids_ref[b, p]],
            win_buf.at[slot, pl.ds(p * ps, ps)],
            sems_in.at[slot, p],
        )

    def dma_out(slot, l, p):
        return pltpu.make_async_copy(
            out_buf.at[slot, pl.ds(p * ps, ps)],
            out_ref.at[l, page_ids_ref[b, p]],
            sems_out.at[slot, p],
        )

    def start_in(slot, l):
        for p in range(TPP):
            dma_in(slot, l, p).start()

    @pl.when(L > 0)
    def _():
        start_in(0, 0)

    def body(l, _):
        slot = jax.lax.rem(l, 2)
        nxt = jax.lax.rem(l + 1, 2)

        @pl.when(l + 1 < L)
        def _():
            start_in(nxt, l + 1)

        for p in range(TPP):
            dma_in(slot, l, p).wait()

        @pl.when(l >= 2)
        def _():  # previous use of this out_buf slot must have landed
            for p in range(TPP):
                dma_out(slot, l - 2, p).wait()

        win = win_buf[slot].astype(jnp.float32)
        out_buf[slot] = jax.lax.dot_general(
            perm_ref[:], win, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(out_buf.dtype)
        for p in range(TPP):
            dma_out(slot, l, p).start()
        return 0

    jax.lax.fori_loop(0, L, body, 0)

    def drain(l, _):
        slot = jax.lax.rem(l, 2)
        for p in range(TPP):
            dma_out(slot, l, p).wait()
        return 0

    jax.lax.fori_loop(jnp.maximum(L - 2, 0), L, drain, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def kv_permute_pages_pallas(
    pages: jax.Array,  # [L, np, ps, HD] (bf16/f32 arena)
    page_ids: jax.Array,  # [B, TPP] int32 window pages (0 = null-routed)
    src_rel: jax.Array,  # [B, W] int32 source row per window slot (W=TPP*ps)
    interpret: bool = False,
) -> jax.Array:
    L, n_pages, ps, HD = pages.shape
    B, TPP = page_ids.shape
    W = TPP * ps
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(
                (B, W), lambda b, *_: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),  # pages (aliased)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, W, HD), pages.dtype),
            pltpu.VMEM((2, W, HD), pages.dtype),
            pltpu.VMEM((W, W), jnp.float32),
            pltpu.SemaphoreType.DMA((2, TPP)),
            pltpu.SemaphoreType.DMA((2, TPP)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_permute_kernel, L=L, TPP=TPP, ps=ps),
        out_shape=jax.ShapeDtypeStruct(pages.shape, pages.dtype),
        grid_spec=grid_spec,
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(page_ids, src_rel, pages)


def _page_write_kernel(page_ids_ref, windows_ref, pages_ref, out_ref, sems,
                       *, W):
    """Write whole pages: windows[:, w] -> pages[:, page_ids[w]] (all layers
    per DMA; [L, ps, HD] slices keep the tiled last-two dims whole)."""

    def mk(i):
        return pltpu.make_async_copy(
            windows_ref.at[:, i],
            out_ref.at[:, page_ids_ref[i]],
            sems.at[jax.lax.rem(i, RING)],
        )

    def body(i, _):
        @pl.when(i >= RING)
        def _():
            mk(i - RING).wait()

        mk(i).start()
        return 0

    jax.lax.fori_loop(0, W, body, 0)

    def drain(i, _):
        mk(i).wait()
        return 0

    jax.lax.fori_loop(jnp.maximum(W - RING, 0), W, drain, 0)


@jax.jit
def kv_write_pages_pallas(
    pages: jax.Array,  # [L, np, ps, HD]
    windows: jax.Array,  # [L, W, ps, HD] replacement pages
    page_ids: jax.Array,  # [W] int32 destinations (0 = null page)
) -> jax.Array:
    W = windows.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # windows
            pl.BlockSpec(memory_space=pl.ANY),  # pages (aliased)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((RING,))],
    )
    return pl.pallas_call(
        functools.partial(_page_write_kernel, W=W),
        out_shape=jax.ShapeDtypeStruct(pages.shape, pages.dtype),
        grid_spec=grid_spec,
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(page_ids, windows, pages)
