"""Paged KV-cache arena.

Reference: flood/utils/cache.py (SegmentCache: per-layer flat
``[max_token, k_dim+v_dim]`` tensors) + the Slot segment allocator
(flood/utils/batch.py:35-48). TPU re-design: XLA requires static shapes, so
variable-length segments become **fixed-size pages**; a request's "segment"
is a list of pages in a per-request page table, and the reference's
contiguity optimization becomes page-run coalescing inside the attention
kernel.

Layout ``[n_layers, n_pages, page_size, n_kv_heads * head_dim]`` — token-
major with the head axis FOLDED into the trailing dim:
- leading layer axis lets the transformer scan over layers,
- a token's row (all heads) is one contiguous [H*D] vector: the per-step
  write is a row DMA, the attention kernel DMAs a whole [ps, H*D] page
  contiguously and slices heads as aligned 128-multiple columns,
- the fold is PHYSICAL: reshaping between [.., H, D] and [.., H*D] views of
  a tiled TPU buffer materializes a full-arena copy (measured 1.7 ms per
  layer per step on 7B — this and the equivalent scatter/moveaxis copies
  were three separate 50-100x regressions before settling on this layout),
- heads shard on the trailing axis ("model", per-head blocks divide evenly),
- page 0 is a reserved null page so padded page-table entries gather/scatter
  harmlessly.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from painlessinferenceacceleration_tpu.config import EngineConfig, ModelConfig


def _on_tpu() -> bool:
    return jax.default_backend() not in ("cpu", "gpu")


def kv_cache_shape(mcfg: ModelConfig, ecfg: EngineConfig) -> Tuple[int, ...]:
    return (
        mcfg.num_hidden_layers,
        ecfg.num_pages,
        ecfg.page_size,
        mcfg.num_key_value_heads * mcfg.head_dim,
    )


def kv_bytes_per_page(mcfg: ModelConfig, ecfg: EngineConfig, dtype=jnp.bfloat16) -> int:
    """Bytes one KV page costs across all layers (for HBM-based sizing —
    the reference sizes its cache from free VRAM, flood llm.py:1740s)."""
    itemsize = 1 if ecfg.kv_quant.startswith("fp8") else jnp.dtype(dtype).itemsize
    ps = ecfg.page_size
    if mcfg.linear_attention:
        from painlessinferenceacceleration_tpu.models.linear_attn import (
            n_linear_layers,
        )

        n_full = max(mcfg.num_hidden_layers - n_linear_layers(mcfg), 1)
        hd = mcfg.num_key_value_heads * mcfg.head_dim
        return n_full * ps * hd * itemsize * 2
    if mcfg.is_mla:
        from painlessinferenceacceleration_tpu.models.mla import (
            mla_cache_heads,
            mla_head_dims,
        )

        dk, dv = mla_head_dims(mcfg)
        H = mla_cache_heads(mcfg)
        return mcfg.num_hidden_layers * ps * H * (dk + dv) * itemsize
    hd = mcfg.num_key_value_heads * mcfg.head_dim
    base = mcfg.num_hidden_layers * ps * hd * itemsize * 2
    if ecfg.kv_quant == "fp8_tok":
        # 128-lane-padded f32 per-token scale arenas (k + v)
        base += mcfg.num_hidden_layers * ps * 128 * 4 * 2
    return base


def auto_size_pages(
    mcfg: ModelConfig, ecfg: EngineConfig, dtype=jnp.bfloat16
) -> int:
    """Pages that fit ``ecfg.cache_memory_fraction`` of the chip's FREE HBM
    (queried after params are resident), capped by what max_concurrency can
    ever address. Falls back to the default sizing when memory stats are
    unavailable (e.g. CPU tests, relay backends without stats)."""
    import jax

    default = ecfg.max_concurrency * ecfg.pages_per_req + 1
    try:
        stats = jax.devices()[0].memory_stats()
        free = stats["bytes_limit"] - stats["bytes_in_use"]
    except Exception:
        return default
    budget = int(free * ecfg.cache_memory_fraction)
    n = budget // max(kv_bytes_per_page(mcfg, ecfg, dtype), 1)
    return max(2, min(int(n), default))


def init_kv_cache(mcfg: ModelConfig, ecfg: EngineConfig, dtype=jnp.bfloat16) -> dict:
    """Allocate the arena. With ``ecfg.kv_quant == 'fp8'`` pages are stored as
    float8_e4m3 plus a per-(layer, head) scale (reference:
    flood/csrc/quantize/fp8_quant.cu quant_to_fp8_and_update_cache).

    MLA models (deepseek) cache either expanded per-head K/V (different K
    and V head dims) or, with ``mcfg.mla_latent_cache``, a single shared
    latent head (the reference's fused latent — cache.py:90
    update_fusion_cache)."""
    if mcfg.linear_attention:
        from painlessinferenceacceleration_tpu.models.linear_attn import (
            n_linear_layers,
        )

        n_lin = n_linear_layers(mcfg)
        n_full = mcfg.num_hidden_layers - n_lin
        H, D = mcfg.num_attention_heads, mcfg.head_dim
        full_shape = (
            max(n_full, 1), ecfg.num_pages, ecfg.page_size,
            mcfg.num_key_value_heads * D,
        )
        return {
            "k": jnp.zeros(full_shape, dtype),
            "v": jnp.zeros(full_shape, dtype),
            # recurrent state slots (reference fix-size cache llm.py:218-230)
            "s": jnp.zeros((n_lin, ecfg.max_concurrency, H, D, D), jnp.float32),
        }
    if mcfg.is_mla:
        from painlessinferenceacceleration_tpu.models.mla import (
            mla_cache_heads,
            mla_head_dims,
        )

        dk, dv = mla_head_dims(mcfg)
        base = (
            mcfg.num_hidden_layers, ecfg.num_pages, ecfg.page_size,
        )
        H = mla_cache_heads(mcfg)
        return {
            "k": jnp.zeros(base + (H * dk,), dtype),
            "v": jnp.zeros(base + (H * dv,), dtype),
        }
    shape = kv_cache_shape(mcfg, ecfg)
    if ecfg.kv_quant == "fp8_tok":
        # dynamic per-token fp8: each (token, head) row carries its own
        # scale (reference fp8_quant.cu quant_to_fp8_and_update_cache's
        # dynamic path) — no calibration needed. The head lane dim is
        # PADDED to 128 so the Pallas decode kernel can DMA scale tiles
        # (Mosaic lane slices must be 128-multiples); real heads occupy
        # lanes [0:Hkv]. Overhead: 2x512 B/token on top of the fp8 KV's
        # ~4 KB/token at 7B.
        assert mcfg.num_key_value_heads <= 128, "fp8_tok: Hkv > 128"
        return {
            "k": jnp.zeros(shape, jnp.float8_e4m3fn),
            "v": jnp.zeros(shape, jnp.float8_e4m3fn),
            "k_tok_scale": jnp.zeros(shape[:3] + (128,), jnp.float32),
            "v_tok_scale": jnp.zeros(shape[:3] + (128,), jnp.float32),
        }
    if ecfg.kv_quant == "fp8":
        cache = {
            "k": jnp.zeros(shape, jnp.float8_e4m3fn),
            "v": jnp.zeros(shape, jnp.float8_e4m3fn),
            # static scales (amax-calibrated online would need two passes;
            # the reference uses static input scales for its static FP8 path)
            "k_scale": jnp.full(
                (shape[0], mcfg.num_key_value_heads), ecfg.kv_scale_init,
                jnp.float32,
            ),
            "v_scale": jnp.full(
                (shape[0], mcfg.num_key_value_heads), ecfg.kv_scale_init,
                jnp.float32,
            ),
        }
    else:
        cache = {
            "k": jnp.zeros(shape, dtype),
            "v": jnp.zeros(shape, dtype),
        }
    return cache


def write_kv_pages(
    k_pages: jax.Array,
    v_pages: jax.Array,
    new_k: jax.Array,
    new_v: jax.Array,
    page_tables: jax.Array,
    start_lens: jax.Array,
    valid: Optional[jax.Array] = None,
    k_scale: Optional[jax.Array] = None,
    v_scale: Optional[jax.Array] = None,
    layer: Optional[jax.Array] = None,
    k_tok_scale: Optional[jax.Array] = None,
    v_tok_scale: Optional[jax.Array] = None,
):
    """Scatter per-step K/V into the arena.

    Replaces the reference's update_cache CUDA kernel
    (flood/csrc/cache/cache.cu: scatter rows at ``cache_indices``).

    Args:
      k_pages/v_pages: [n_pages, page_size, H*D] (one layer), or the full
        stacked [L, n_pages, page_size, H*D] with ``layer`` given — the
        stacked form avoids materializing a per-layer slice inside the
        layer scan.
      new_k/new_v: [B, Q, H, D] tokens produced this step.
      page_tables: [B, P] int32 page ids per request (0 = null page).
      start_lens: [B] committed context length; token q of request b lands at
        slot ``start_lens[b] + q``.
      valid: optional [B, Q] bool; invalid tokens are routed to the null page.
      k_scale/v_scale: per-head fp32 scales when the arena is fp8
        (fused quantize+scatter — csrc/quantize/fp8_quant.cu).
    """
    B, Q, H, D = new_k.shape
    layered = k_pages.ndim == 4
    page_size = k_pages.shape[2] if layered else k_pages.shape[1]
    slots = start_lens[:, None] + jnp.arange(Q, dtype=jnp.int32)[None, :]  # [B,Q]
    page_of = jnp.take_along_axis(page_tables, slots // page_size, axis=1)
    row_of = slots % page_size
    if valid is not None:
        page_of = jnp.where(valid, page_of, 0)
    flat_page = page_of.reshape(-1)
    flat_row = row_of.reshape(-1)
    Dv = new_v.shape[-1]  # may differ from D (MLA)
    nk = new_k.reshape(B * Q, H, D)
    nv = new_v.reshape(B * Q, H, Dv)
    sk = sv = None
    if k_tok_scale is not None:
        # dynamic per-token fp8: scale each (token, head) row by its own
        # amax/448 (e4m3 max normal) — fused quantize+scatter of values AND
        # scales (reference fp8_quant.cu dynamic path)
        kf, vf = nk.astype(jnp.float32), nv.astype(jnp.float32)
        sk = jnp.maximum(jnp.max(jnp.abs(kf), axis=-1), 1e-8) / 448.0  # [BQ,H]
        sv = jnp.maximum(jnp.max(jnp.abs(vf), axis=-1), 1e-8) / 448.0
        nk = (kf / sk[..., None]).astype(k_pages.dtype)
        nv = (vf / sv[..., None]).astype(v_pages.dtype)
        # scale arenas are lane-padded to 128 (Pallas DMA tiles)
        pad = k_tok_scale.shape[-1] - sk.shape[-1]
        if pad:
            sk = jnp.pad(sk, ((0, 0), (0, pad)))
            sv = jnp.pad(sv, ((0, 0), (0, pad)))
    elif k_pages.dtype == jnp.float8_e4m3fn:
        # saturate at +-448 like the CUDA quantizers: values past the
        # static scale's range must clamp, not overflow to NaN
        nk = jnp.clip(
            nk.astype(jnp.float32) / k_scale[None, :, None], -448.0, 448.0
        ).astype(k_pages.dtype)
        nv = jnp.clip(
            nv.astype(jnp.float32) / v_scale[None, :, None], -448.0, 448.0
        ).astype(v_pages.dtype)
    else:
        nk = nk.astype(k_pages.dtype)
        nv = nv.astype(v_pages.dtype)
    nk = nk.reshape(B * Q, H * D)  # rows match the folded arena layout
    nv = nv.reshape(B * Q, H * Dv)
    if layered:
        # adjacent advanced indices on the folded arena lower to a plain
        # in-place scatter (the historical full-arena copies came from
        # moveaxis/reshape relayouts, not the scatter itself)
        k_pages = k_pages.at[layer, flat_page, flat_row].set(nk)
        v_pages = v_pages.at[layer, flat_page, flat_row].set(nv)
        if sk is not None:
            k_tok_scale = k_tok_scale.at[layer, flat_page, flat_row].set(sk)
            v_tok_scale = v_tok_scale.at[layer, flat_page, flat_row].set(sv)
    else:
        k_pages = k_pages.at[flat_page, flat_row].set(nk)
        v_pages = v_pages.at[flat_page, flat_row].set(nv)
        if sk is not None:
            k_tok_scale = k_tok_scale.at[flat_page, flat_row].set(sk)
            v_tok_scale = v_tok_scale.at[flat_page, flat_row].set(sv)
    if k_tok_scale is not None:
        return k_pages, v_pages, k_tok_scale, v_tok_scale
    return k_pages, v_pages


def gather_kv_pages(
    pages: jax.Array,
    page_tables: jax.Array,
    head_dim: int,
    scale: Optional[jax.Array] = None,
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """Gather a request-batch's KV as dense [B, H, L, D] (L = P * page_size).

    pages: [n_pages, page_size, H*D] (one layer, folded). This is the jnp
    reference data path; the Pallas attention kernel reads pages directly
    from HBM instead (only up to kv_len), see ops/paged_attention.py.
    """
    g = pages[page_tables]  # [B, P, page, H*D]
    B, P, S, HD = g.shape
    H = HD // head_dim
    g = g.reshape(B, P, S, H, head_dim).transpose(0, 3, 1, 2, 4)
    g = g.reshape(B, H, P * S, head_dim)
    if pages.dtype == jnp.float8_e4m3fn:
        if scale.ndim == 3:  # per-token scales [n_pages, ps, 128pad] (fp8_tok)
            sc = scale[page_tables][..., :H]  # [B, P, S, H]
            sc = sc.transpose(0, 3, 1, 2).reshape(B, H, P * S, 1)
            g = g.astype(jnp.float32) * sc
        else:  # static per-head [H]
            g = g.astype(jnp.float32) * scale[None, :, None, None]
    return g.astype(out_dtype)


def move_kv_rows(
    pages: jax.Array,
    page_tables: jax.Array,
    src_slots: jax.Array,
    dst_slots: jax.Array,
    valid: jax.Array,
) -> jax.Array:
    """Gather rows at src_slots and scatter them to dst_slots (KV compaction
    after lookahead verification — reference: flood/ops/draft.py:546-570
    ``update_draft_cache``; lookahead rollback
    pretrained_model.py:894-937 ``_update_cache_with_axis_*``).

    pages: [L, n_pages, page_size, H*D] (all layers at once — one fused
    gather/scatter instead of the reference's per-layer loop).
    src_slots/dst_slots: [B, M] absolute slot indices; valid: [B, M] bool.
    """
    page_size = pages.shape[2]
    sp = jnp.take_along_axis(page_tables, src_slots // page_size, axis=1)
    sr = src_slots % page_size
    dp = jnp.take_along_axis(page_tables, dst_slots // page_size, axis=1)
    dr = dst_slots % page_size
    dp = jnp.where(valid, dp, 0)  # invalid moves write into the null page
    rows = pages[:, sp.reshape(-1), sr.reshape(-1)]  # [L, N, H*D]
    return pages.at[:, dp.reshape(-1), dr.reshape(-1)].set(rows)


def compact_kv_tail(
    pages: jax.Array,  # [L, n_pages, ps, H*D]
    page_tables: jax.Array,  # [B, P]
    ctx_lens: jax.Array,  # [B]
    path: jax.Array,  # [B, M] accepted in-step node offsets (draft indexing)
    n_edges: jax.Array,  # [B] accepted edges (moves = n_edges)
    q_width: int,  # verify width Q (tail window = [ctx, ctx+Q))
    active: jax.Array = None,  # [B]; inactive rows' windows go to null page
    force_jnp: bool = False,  # narrow-lane arrays (fp8_tok scales) skip the
    # Pallas page writer (its DMA wants 128-lane rows)
) -> jax.Array:
    """Lookahead KV compaction as PAGE-WINDOW rewrites.

    Moves node (ctx + path[i]) -> (ctx + 1 + i) like move_kv_rows, but
    expressed as: gather the O(Q/ps) tail pages, permute their rows through
    a small slot-source LUT, scatter whole pages back. Full-window scatters
    alias in place, whereas the row-wise scatter made XLA copy the whole
    arena per call (measured 6.7 ms/step at 7B).
    """
    B, M = path.shape
    L = pages.shape[0]
    ps = pages.shape[2]
    P = page_tables.shape[1]
    TPP = (q_width + ps - 1) // ps + 1  # pages overlapping the tail window

    p0 = ctx_lens // ps  # first affected page index (per request)
    t = jnp.arange(TPP, dtype=jnp.int32)
    page_pos = jnp.clip(p0[:, None] + t[None, :], 0, P - 1)  # [B, TPP]
    page_ids = jnp.take_along_axis(page_tables, page_pos, axis=1)
    if active is not None:
        # padding batch rows may alias another request's page table: their
        # identity rewrite could race the real compaction — null-route them
        page_ids = jnp.where(active[:, None], page_ids, 0)

    # slot-source LUT over the window: default identity, moved slots remap
    W = TPP * ps
    win_base = p0 * ps  # window start slot (page-aligned)
    slots = win_base[:, None] + jnp.arange(W, dtype=jnp.int32)[None, :]
    src_of = slots  # [B, W]
    i = jnp.arange(M, dtype=jnp.int32)[None, :]
    dst_slot = ctx_lens[:, None] + 1 + i
    src_slot = ctx_lens[:, None] + path
    mv_valid = i < n_edges[:, None]
    w_idx = jnp.where(mv_valid, dst_slot - win_base[:, None], W)  # W -> dropped
    bidx = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[:, None], (B, M))
    src_of = src_of.at[bidx, w_idx].set(
        jnp.where(mv_valid, src_slot, 0), mode="drop"
    )

    if (
        _on_tpu()
        and not force_jnp
        and pages.dtype != jnp.float8_e4m3fn
    ):
        # fully in-kernel compaction: DMA window pages in, one-hot-permute
        # rows, DMA back aliased (ops/kv_update.py). The earlier
        # jnp-gather + pallas-write split left an XLA gather on the arena,
        # which made XLA relayout-copy the WHOLE arena twice per spec step
        # inside the multistep while-loop (profiled 6.6 ms/step at 7B).
        from painlessinferenceacceleration_tpu.ops.kv_update import (
            kv_permute_pages_pallas,
        )

        src_rel = jnp.clip(src_of - win_base[:, None], 0, W - 1)
        return kv_permute_pages_pallas(pages, page_ids, src_rel)

    # gather window rows from their (possibly remapped) sources
    g_page = jnp.take_along_axis(
        page_tables, jnp.clip(src_of // ps, 0, P - 1), axis=1
    )  # [B, W]
    g_row = src_of % ps
    rows = pages[:, g_page.reshape(-1), g_row.reshape(-1)]  # [L, B*W, HD]
    new_windows = rows.reshape(L, B, TPP, ps, -1).reshape(L, B * TPP, ps, -1)

    if _on_tpu() and not force_jnp:
        # aliased whole-page DMA writeback (the jnp page scatter still made
        # XLA copy the arena, ~1.7ms per array per step at 7B)
        from painlessinferenceacceleration_tpu.ops.kv_update import (
            kv_write_pages_pallas,
        )

        return kv_write_pages_pallas(pages, new_windows, page_ids.reshape(-1))
    return pages.at[:, page_ids.reshape(-1)].set(new_windows)
