"""Pallas paged attention: decode / tree-verify over the KV page arena.

Reference kernel: flood/ops/seg_attn.py — varlen flash attention over the
segment KV arena with tree-mask support (MASK_TYPE 2, :72-131) and GQA
packing into the M tile (:612-616). TPU re-design:

- grid (B,): one program per request; each page is ONE contiguous
  [ps, H*D] DMA from the token-major arena (a per-head grid needed strided
  256-byte bursts — measured 50x slower), and a fori loop over kv heads
  computes with aligned column slices of the page buffer.
- the G query heads of a group and the Q in-step positions pack into the M
  dimension per kv head (rows = G*Q) — the TPU analogue of the reference's
  TOKEN=BLOCK_M/GROUP warp packing.
- the page table and context lengths are **scalar-prefetched**, so the
  kernel walks only the pages a request actually uses (dynamic fori over
  ceil((ctx+Q)/page) pages) with double-buffered async DMA.
- online softmax (m/l running max/sum) in fp32, one visibility rule for
  prefix + in-step tree mask (ops/attention.py semantics).

Falls back to interpret mode off-TPU so the same tests run hermetically on
CPU (the reference's kernels are GPU-only and untestable without one —
SURVEY §4).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _fp8_kv_to_bf16(tile):
    """e4m3 KV tile [T, n] -> bf16 [T, n] with TOKEN ROWS reordered to
    [even rows..., odd rows...] (Mosaic's u8->u32 bitcast packs sublanes;
    same SWAR trick as ops/w8a8.py — the native fp8->bf16 vector convert
    is catastrophically slow on v5e). Attention is order-invariant over
    keys, so the callers remap only the VISIBILITY column index; scores
    and P@V stay exact because K and V share the permutation."""
    from painlessinferenceacceleration_tpu.ops.w8a8 import _fp8_w_to_bf16

    return _fp8_w_to_bf16(tile)


def _perm_cols(idx, T: int):
    """Map dequantized-buffer column c to its original token offset."""
    return jnp.where(idx < T // 2, 2 * idx, 2 * (idx - T // 2) + 1)


def _attn_verify_kernel(
    # scalar prefetch
    page_tables_ref,  # [B, P] int32 (SMEM)
    ctx_lens_ref,  # [B] int32 (SMEM)
    layer_ref,  # [1] int32 (SMEM; -1 sentinel when unlayered)
    # inputs
    qbd_ref,  # [1, NG, RG, HBD] VMEM: per-group block-diagonal q rows
    oh_ref,  # [1, RG, HB] VMEM f32: one-hot lane-block of each row
    qmask_ref,  # [1, Q, Q] VMEM bool
    k_pages_hbm,  # [(L,) n_pages, ps, H*D] ANY (token-major, heads folded)
    v_pages_hbm,
    # output
    o_ref,  # [1, NG, RG, D] VMEM
    # scratch
    k_buf,  # [2, PP*ps, H*D] VMEM
    v_buf,
    acc_ref,  # [NG, RG, HBD] f32
    m_ref,  # [NG, RG, 128] f32 (row max, lane-broadcast)
    l_ref,  # [NG, RG, 128] f32 (row sum)
    sems,  # DMA sems [2, 2, PP]
    *,
    NG: int,
    HB: int,
    G: int,
    Q: int,
    ps: int,
    D: int,
    PP: int,
    layered: bool,
    fp8: bool = False,  # e4m3 arena: SWAR dequant in VMEM (half the DMA)
):
    """Tree-verify / chunk attention (1 < Q <= 128) over the page arena.

    Two M/iteration optimizations over the original per-(head, page) loop
    (which measured ~0.8 ms/layer at 7B MHA Q=49 — launch/issue bound):
    - pages are DMA'd and processed in PP-page blocks (T = PP*ps keys per
      softmax update instead of ps),
    - HB kv heads pack into one BLOCK-DIAGONAL dot: rows = HB*G*Q fill the
      MXU's 128-row tile, lanes = HB*D; the off-diagonal zero work is the
      price of HBx fewer loop iterations (picked so rows <= 128).
    Per (block, group): ONE [RG, HBD] x [HBD, T] score dot + ONE
    [RG, T] x [T, HBD] value dot; the per-row head block of the result is
    extracted with a one-hot mask reduce at the end (same trick as the
    decode kernel)."""
    b = pl.program_id(0)
    ctx = ctx_lens_ref[b]
    n_used = (ctx + Q + ps - 1) // ps
    n_blk = (n_used + PP - 1) // PP
    RG = qbd_ref.shape[2]
    HBD = HB * D
    T = PP * ps

    acc_ref[:] = jnp.zeros_like(acc_ref)
    m_ref[:] = jnp.full_like(m_ref, NEG_INF)
    l_ref[:] = jnp.zeros_like(l_ref)

    def dma(slot, blk, p, which):
        page = page_tables_ref[b, blk * PP + p]
        src = k_pages_hbm if which == 0 else v_pages_hbm
        dst = k_buf if which == 0 else v_buf
        src_at = src.at[layer_ref[0], page] if layered else src.at[page]
        return pltpu.make_async_copy(
            src_at, dst.at[slot, pl.ds(p * ps, ps)], sems.at[slot, which, p]
        )

    def start_blk(slot, blk):
        for p in range(PP):
            @pl.when(blk * PP + p < n_used)
            def _(p=p):
                dma(slot, blk, p, 0).start()
                dma(slot, blk, p, 1).start()

    def wait_blk(slot, blk):
        for p in range(PP):
            @pl.when(blk * PP + p < n_used)
            def _(p=p):
                dma(slot, blk, p, 0).wait()
                dma(slot, blk, p, 1).wait()

    @pl.when(n_blk > 0)
    def _():
        start_blk(0, 0)

    def body(i, _):
        slot = jax.lax.rem(i, 2)
        nxt = jax.lax.rem(i + 1, 2)

        @pl.when(i + 1 < n_blk)
        def _():
            start_blk(nxt, i + 1)

        wait_blk(slot, i)
        for p in range(PP):  # zero un-DMA'd pages (0 * NaN poisons P@V)
            @pl.when(i * PP + p >= n_used)
            def _(p=p):
                k_buf[slot, pl.ds(p * ps, ps)] = jnp.zeros(
                    (ps, k_buf.shape[-1]), k_buf.dtype
                )
                v_buf[slot, pl.ds(p * ps, ps)] = jnp.zeros(
                    (ps, v_buf.shape[-1]), v_buf.dtype
                )

        # visibility of key j (global index i*T + col) to row r, whose
        # in-step position is t = r mod Q — shared across groups. The qmask
        # column lookup is a one-hot matmul (Mosaic cannot lower a
        # take_along_axis gather here), and the row expansion is a second
        # one-hot matmul ([RG, Q] selector).
        jcol = jax.lax.broadcasted_iota(jnp.int32, (RG, T), 1)
        kcol = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
        if fp8:  # SWAR dequant permutes token rows — remap visibility cols
            jcol = _perm_cols(jcol, T)
            kcol = _perm_cols(kcol, T)
        jcol = jcol + i * T
        kcol = kcol + i * T
        srange = jax.lax.broadcasted_iota(jnp.int32, (Q, T), 0)
        onehot = (srange == (kcol - ctx)).astype(jnp.float32)  # [Q(s), T]
        qm = qmask_ref[0].astype(jnp.float32)  # [Q(t), Q(s)]
        instep = jax.lax.dot_general(
            qm, onehot, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Q, T]
        rr = jax.lax.broadcasted_iota(jnp.int32, (RG, Q), 0)
        cc = jax.lax.broadcasted_iota(jnp.int32, (RG, Q), 1)
        rows = (jax.lax.rem(rr, Q) == cc).astype(jnp.float32)  # [RG, Q]
        instep_rg = (
            jax.lax.dot_general(
                rows, instep, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            > 0.5
        )
        vis_rows = (jcol < ctx) | (
            (jcol >= ctx) & (jcol < ctx + Q) & instep_rg
        )

        def group(ng, _):
            k_blk = k_buf[slot, :, pl.ds(ng * HBD, HBD)]  # [T, HBD]
            v_blk = v_buf[slot, :, pl.ds(ng * HBD, HBD)]
            if fp8:
                k_blk = _fp8_kv_to_bf16(k_blk)
                v_blk = _fp8_kv_to_bf16(v_blk)
            s = jax.lax.dot_general(
                qbd_ref[0, ng], k_blk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [RG, T]
            s = jnp.where(vis_rows, s, NEG_INF)
            m_prev = m_ref[ng, :, :1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p_ = jnp.exp(s - m_new)
            l_ref[ng] = jnp.broadcast_to(
                l_ref[ng, :, :1] * alpha + jnp.sum(p_, axis=1, keepdims=True),
                l_ref.shape[1:],
            )
            m_ref[ng] = jnp.broadcast_to(m_new, m_ref.shape[1:])
            pv = jax.lax.dot_general(
                p_.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [RG, HBD]
            acc_ref[ng] = acc_ref[ng] * alpha + pv
            return 0

        jax.lax.fori_loop(0, NG, group, 0)
        return 0

    jax.lax.fori_loop(0, n_blk, body, 0)

    def finish(ng, _):
        l = l_ref[ng, :, :1]
        safe_l = jnp.where(l > 0.0, l, 1.0)
        full = acc_ref[ng] / safe_l  # [RG, HB*D]
        # static lane slices (reshape to [RG, HB, D] is an unsupported lane
        # split when D % 128 != 0)
        out = full[:, 0:D] * oh_ref[0][:, 0:1]
        for j in range(1, HB):
            out = out + full[:, j * D : (j + 1) * D] * oh_ref[0][:, j : j + 1]
        o_ref[0, ng] = out.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, NG, finish, 0)


def _attn_decode_kernel(
    # scalar prefetch
    page_tables_ref,  # [B, P] int32 (SMEM)
    ctx_lens_ref,  # [B] int32 (SMEM)
    layer_ref,  # [1] int32 (SMEM; -1 sentinel when unlayered)
    # inputs
    qbd_ref,  # [1, R, HD] VMEM: block-diagonal q (R = Hq rows)
    oh_ref,  # [1, R, Hkv] VMEM f32: one-hot kv-head of each row
    k_pages_hbm,  # [(L,) n_pages, ps, HD] ANY
    v_pages_hbm,
    # output
    o_ref,  # [1, R, D] VMEM
    # scratch
    k_buf,  # [2, PP*ps, HD] VMEM
    v_buf,
    acc_ref,  # [R, HD] f32
    m_ref,  # [R, 128] f32
    l_ref,  # [R, 128] f32
    sems,  # DMA sems [2, 2, PP]
    *,
    Hkv: int,
    ps: int,
    D: int,
    PP: int,  # pages per block
    layered: bool,
    fp8: bool = False,  # e4m3 arena: SWAR dequant in VMEM (half the DMA)
):
    """Single-token decode (Q=1): ALL heads in one MXU dot per page block.

    The per-head loop of `_attn_kernel` is latency-bound at decode (GQ=1
    rows x Hkv heads x pages of tiny dots — measured ~140us/layer vs a
    ~12us DMA floor). Instead the wrapper packs q into a BLOCK-DIAGONAL
    [Hq, Hkv*D] operand so scores for every head come from ONE
    [R, HD] x [HD, T] dot against the token-major page block (the MXU
    multiplies the off-diagonal zeros — ~0.1ms/step of waste vs ~4ms of
    launch+issue latency saved), and out = P @ V [T, HD] accumulates all
    heads at once; the per-row kv-head block of the result is extracted
    with a one-hot mask reduce at the end.
    """
    b = pl.program_id(0)
    ctx = ctx_lens_ref[b]
    n_used = (ctx + 1 + ps - 1) // ps  # Q == 1
    n_blk = (n_used + PP - 1) // PP
    R = qbd_ref.shape[1]
    T = PP * ps

    acc_ref[:] = jnp.zeros_like(acc_ref)
    m_ref[:] = jnp.full_like(m_ref, NEG_INF)
    l_ref[:] = jnp.zeros_like(l_ref)

    def dma(slot, blk, p, which):
        page = page_tables_ref[b, blk * PP + p]
        src = k_pages_hbm if which == 0 else v_pages_hbm
        dst = k_buf if which == 0 else v_buf
        src_at = src.at[layer_ref[0], page] if layered else src.at[page]
        return pltpu.make_async_copy(
            src_at, dst.at[slot, pl.ds(p * ps, ps)], sems.at[slot, which, p]
        )

    def start_blk(slot, blk):
        for p in range(PP):
            @pl.when(blk * PP + p < n_used)
            def _():
                dma(slot, blk, p, 0).start()
                dma(slot, blk, p, 1).start()

    def wait_blk(slot, blk):
        for p in range(PP):
            @pl.when(blk * PP + p < n_used)
            def _():
                dma(slot, blk, p, 0).wait()
                dma(slot, blk, p, 1).wait()

    @pl.when(n_blk > 0)
    def _():
        start_blk(0, 0)

    def body(i, _):
        slot = jax.lax.rem(i, 2)
        nxt = jax.lax.rem(i + 1, 2)

        @pl.when(i + 1 < n_blk)
        def _():
            start_blk(nxt, i + 1)

        wait_blk(slot, i)
        # zero un-DMA'd trailing pages: their p_ weights are 0 but 0 * NaN
        # garbage would still poison the P@V dot
        for p in range(PP):
            @pl.when(i * PP + p >= n_used)
            def _(p=p):
                k_buf[slot, pl.ds(p * ps, ps)] = jnp.zeros(
                    (ps, k_buf.shape[-1]), k_buf.dtype
                )
                v_buf[slot, pl.ds(p * ps, ps)] = jnp.zeros(
                    (ps, v_buf.shape[-1]), v_buf.dtype
                )

        jcol = jax.lax.broadcasted_iota(jnp.int32, (R, T), 1)
        if fp8:
            # SWAR dequant permutes token rows even-then-odd; remap only
            # the visibility index (K and V share the permutation)
            kd = _fp8_kv_to_bf16(k_buf[slot])
            vd = _fp8_kv_to_bf16(v_buf[slot])
            jcol = _perm_cols(jcol, T)
        else:
            kd = k_buf[slot]
            vd = v_buf[slot]
        jcol = jcol + i * T
        vis = jcol <= ctx  # decode: token at position ctx sees prefix + self
        s = jax.lax.dot_general(
            qbd_ref[0], kd, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [R, T]
        s = jnp.where(vis, s, NEG_INF)
        m_prev = m_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p_ = jnp.exp(s - m_new)
        l_ref[:] = jnp.broadcast_to(
            l_ref[:, :1] * alpha + jnp.sum(p_, axis=1, keepdims=True),
            l_ref.shape,
        )
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        pv = jax.lax.dot_general(
            p_.astype(vd.dtype), vd, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [R, HD]
        acc_ref[:] = acc_ref[:] * alpha + pv
        return 0

    jax.lax.fori_loop(0, n_blk, body, 0)

    l = l_ref[:, :1]
    safe_l = jnp.where(l > 0.0, l, 1.0)
    full = acc_ref[:] / safe_l  # [R, Hkv*D]
    # extract each row's own head block with STATIC lane slices (a
    # [R, Hkv, D] reshape is an unsupported lane split when D % 128 != 0)
    out = full[:, 0:D] * oh_ref[0][:, 0:1]
    for j in range(1, Hkv):
        out = out + full[:, j * D : (j + 1) * D] * oh_ref[0][:, j : j + 1]
    o_ref[0] = out.astype(o_ref.dtype)


def _attn_decode_tok_kernel(
    # scalar prefetch
    page_tables_ref,  # [B, P] int32 (SMEM)
    ctx_lens_ref,  # [B] int32 (SMEM)
    layer_ref,  # [1] int32 (SMEM; -1 sentinel when unlayered)
    # inputs
    qbd_ref,  # [1, R, HD] VMEM: block-diagonal q (R = Hq rows)
    oh_ref,  # [1, R, 128] VMEM f32: one-hot kv-head of each row (lane-pad)
    k_pages_hbm,  # [(L,) n_pages, ps, HD] ANY e4m3
    v_pages_hbm,
    ks_pages_hbm,  # [(L,) n_pages, ps, 128] ANY f32 per-token K scales
    vs_pages_hbm,
    # output
    o_ref,  # [1, R, D] VMEM
    # scratch
    k_buf,  # [2, PP*ps, HD] VMEM e4m3
    v_buf,
    ks_buf,  # [2, PP*ps, 128] VMEM f32
    vs_buf,
    acc_ref,  # [R, HD] f32
    m_ref,  # [R, 128] f32
    l_ref,  # [R, 128] f32
    sems,  # DMA sems [2, 4, PP]
    *,
    Hkv: int,
    ps: int,
    D: int,
    PP: int,
    layered: bool,
):
    """fp8_tok decode: `_attn_decode_kernel`'s fp8 path with PER-(token,
    head) dequant scales DMA'd from the lane-padded scale arenas
    (reference: csrc/quantize/fp8_quant.cu dynamic path). The SWAR
    dequant's even/odd token-row permutation is applied to the scale tiles
    via an in-VMEM permutation-matrix matmul; the K scale then folds into
    the scores (s *= oh @ ks_perm^T, exact — happens before softmax) and
    the V scale into the probabilities before the P@V dot (exact for each
    row's own head block, which is the only block the one-hot epilogue
    extracts)."""
    b = pl.program_id(0)
    ctx = ctx_lens_ref[b]
    n_used = (ctx + 1 + ps - 1) // ps
    n_blk = (n_used + PP - 1) // PP
    R = qbd_ref.shape[1]
    T = PP * ps

    acc_ref[:] = jnp.zeros_like(acc_ref)
    m_ref[:] = jnp.full_like(m_ref, NEG_INF)
    l_ref[:] = jnp.zeros_like(l_ref)

    srcs = (k_pages_hbm, v_pages_hbm, ks_pages_hbm, vs_pages_hbm)
    dsts = (k_buf, v_buf, ks_buf, vs_buf)

    def dma(slot, blk, p, which):
        page = page_tables_ref[b, blk * PP + p]
        src, dst = srcs[which], dsts[which]
        src_at = src.at[layer_ref[0], page] if layered else src.at[page]
        return pltpu.make_async_copy(
            src_at, dst.at[slot, pl.ds(p * ps, ps)], sems.at[slot, which, p]
        )

    def start_blk(slot, blk):
        for p in range(PP):
            @pl.when(blk * PP + p < n_used)
            def _(p=p):
                for w in range(4):
                    dma(slot, blk, p, w).start()

    def wait_blk(slot, blk):
        for p in range(PP):
            @pl.when(blk * PP + p < n_used)
            def _(p=p):
                for w in range(4):
                    dma(slot, blk, p, w).wait()

    @pl.when(n_blk > 0)
    def _():
        start_blk(0, 0)

    def body(i, _):
        slot = jax.lax.rem(i, 2)
        nxt = jax.lax.rem(i + 1, 2)

        @pl.when(i + 1 < n_blk)
        def _():
            start_blk(nxt, i + 1)

        wait_blk(slot, i)
        # zero un-DMA'd trailing pages (0 * garbage would poison the dots)
        for p in range(PP):
            @pl.when(i * PP + p >= n_used)
            def _(p=p):
                k_buf[slot, pl.ds(p * ps, ps)] = jnp.zeros(
                    (ps, k_buf.shape[-1]), k_buf.dtype
                )
                v_buf[slot, pl.ds(p * ps, ps)] = jnp.zeros(
                    (ps, v_buf.shape[-1]), v_buf.dtype
                )
                ks_buf[slot, pl.ds(p * ps, ps)] = jnp.zeros(
                    (ps, 128), jnp.float32
                )
                vs_buf[slot, pl.ds(p * ps, ps)] = jnp.zeros(
                    (ps, 128), jnp.float32
                )

        jcol = jax.lax.broadcasted_iota(jnp.int32, (R, T), 1)
        kd = _fp8_kv_to_bf16(k_buf[slot])
        vd = _fp8_kv_to_bf16(v_buf[slot])
        jcol = _perm_cols(jcol, T)
        jcol = jcol + i * T
        vis = jcol <= ctx
        # scale tiles -> dequant row order (even rows then odd rows),
        # then expand each head's scale across its D lanes and fold into
        # the dequantized K/V ROWS. Both matmuls are NORMAL-form bf16
        # (contract (1,0)) — Mosaic rejects the transposed-B form for the
        # 128-lane scale operand ("Bad lhs type"). The 0/1 matrices are
        # exact in bf16 and the scales keep f32's exponent (only ~0.4%
        # mantissa loss, inside the e4m3 noise).
        pi = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
        pj = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
        src_row = jnp.where(pi < T // 2, 2 * pi, 2 * (pi - T // 2) + 1)
        Pm = (pj == src_row).astype(jnp.bfloat16)
        ksp = jax.lax.dot_general(
            Pm, ks_buf[slot].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [T, 128] in dequant row order
        vsp = jax.lax.dot_general(
            Pm, vs_buf[slot].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        HD = kd.shape[-1]
        eh = jax.lax.broadcasted_iota(jnp.int32, (128, HD), 0)
        ec = jax.lax.broadcasted_iota(jnp.int32, (128, HD), 1)
        E = (ec // D == eh).astype(jnp.bfloat16)  # head -> D-lane expander
        ks_exp = jax.lax.dot_general(
            ksp.astype(jnp.bfloat16), E, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [T, HD]
        vs_exp = jax.lax.dot_general(
            vsp.astype(jnp.bfloat16), E, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        kd = (kd.astype(jnp.float32) * ks_exp).astype(jnp.bfloat16)
        vd = (vd.astype(jnp.float32) * vs_exp).astype(jnp.bfloat16)
        s = jax.lax.dot_general(
            qbd_ref[0], kd, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [R, T]
        s = jnp.where(vis, s, NEG_INF)
        m_prev = m_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p_ = jnp.exp(s - m_new)
        l_ref[:] = jnp.broadcast_to(
            l_ref[:, :1] * alpha + jnp.sum(p_, axis=1, keepdims=True),
            l_ref.shape,
        )
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        pv = jax.lax.dot_general(
            p_.astype(vd.dtype), vd, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [R, HD]
        acc_ref[:] = acc_ref[:] * alpha + pv
        return 0

    jax.lax.fori_loop(0, n_blk, body, 0)

    l = l_ref[:, :1]
    safe_l = jnp.where(l > 0.0, l, 1.0)
    full = acc_ref[:] / safe_l  # [R, Hkv*D]
    out = full[:, 0:D] * oh_ref[0][:, 0:1]
    for j in range(1, Hkv):
        out = out + full[:, j * D : (j + 1) * D] * oh_ref[0][:, j : j + 1]
    o_ref[0] = out.astype(o_ref.dtype)


def _paged_attention_decode_tok(
    q, k_pages, v_pages, page_tables, ctx_lens, scale, interpret, layer,
    ks_pages, vs_pages,
):
    """Decode over a dynamic per-token fp8 arena (kv_quant='fp8_tok')."""
    B, Q, Hq, D = q.shape
    layered = k_pages.ndim == 4
    n_pages, ps, HD = k_pages.shape[-3:]
    Hkv = HD // D
    G = Hq // Hkv
    PP = max(1, min(256 // ps, page_tables.shape[1]))
    kvh = jnp.arange(Hq, dtype=jnp.int32) // G
    onehot = (kvh[:, None] == jnp.arange(Hkv, dtype=jnp.int32)[None, :])
    qf = q[:, 0].astype(jnp.float32) * scale  # scales come per-token in-kernel
    q2 = qf.astype(jnp.bfloat16)
    qbd = (q2[:, :, None, :] * onehot[None, :, :, None].astype(q2.dtype))
    qbd = qbd.reshape(B, Hq, HD)
    oh128 = jnp.zeros((B, Hq, 128), jnp.float32)
    oh128 = oh128.at[:, :, :Hkv].set(
        jnp.broadcast_to(onehot.astype(jnp.float32)[None], (B, Hq, Hkv))
    )
    if layer is None:
        layer_arr = jnp.full((1,), -1, jnp.int32)
    else:
        layer_arr = jnp.asarray(layer, jnp.int32).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(
                (1, Hq, HD), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, Hq, 128), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, Hq, D), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, PP * ps, HD), k_pages.dtype),
            pltpu.VMEM((2, PP * ps, HD), v_pages.dtype),
            pltpu.VMEM((2, PP * ps, 128), jnp.float32),
            pltpu.VMEM((2, PP * ps, 128), jnp.float32),
            pltpu.VMEM((Hq, HD), jnp.float32),
            pltpu.VMEM((Hq, 128), jnp.float32),
            pltpu.VMEM((Hq, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 4, PP)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _attn_decode_tok_kernel, Hkv=Hkv, ps=ps, D=D, PP=PP,
            layered=layered,
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hq, D), jnp.bfloat16),
        grid_spec=grid_spec,
        interpret=interpret,
    )(page_tables, ctx_lens, layer_arr, qbd, oh128, k_pages, v_pages,
      ks_pages, vs_pages)
    return out.astype(q.dtype)[:, None]  # [B, 1, Hq, D]


def _paged_attention_decode(
    q, k_pages, v_pages, page_tables, ctx_lens, scale, interpret, layer,
    kv_scales=None,
):
    """Decode fast path (Q == 1). Same contract as ``paged_attention``."""
    B, Q, Hq, D = q.shape
    layered = k_pages.ndim == 4
    n_pages, ps, HD = k_pages.shape[-3:]
    Hkv = HD // D
    G = Hq // Hkv
    fp8 = k_pages.dtype == jnp.float8_e4m3fn
    # pages per DMA block: ~256-token blocks amortize the loop/issue cost
    PP = max(1, min(256 // ps, page_tables.shape[1]))
    # block-diagonal q [B, Hq, Hkv*D] + one-hot row->kv-head map
    kvh = jnp.arange(Hq, dtype=jnp.int32) // G
    onehot = (kvh[:, None] == jnp.arange(Hkv, dtype=jnp.int32)[None, :])
    qf = q[:, 0].astype(jnp.float32) * scale
    if fp8:
        # static per-(layer, head) dequant scales fold into q (K) and the
        # output (V) — the kernel never touches them
        assert kv_scales is not None, "fp8 KV arena needs (k_scale, v_scale)"
        ksc, vsc = kv_scales  # [Hkv] each (this layer's slice)
        qf = qf * ksc.astype(jnp.float32)[kvh][None, :, None]
    # the SWAR dequant emits bf16, so fp8 mode computes in bf16 throughout
    q2 = qf.astype(jnp.bfloat16 if fp8 else q.dtype)  # [B, Hq, D]
    qbd = (q2[:, :, None, :] * onehot[None, :, :, None].astype(q2.dtype))
    qbd = qbd.reshape(B, Hq, HD)
    oh = jnp.broadcast_to(
        onehot.astype(jnp.float32)[None], (B, Hq, Hkv)
    )
    if layer is None:
        layer_arr = jnp.full((1,), -1, jnp.int32)
    else:
        layer_arr = jnp.asarray(layer, jnp.int32).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(
                (1, Hq, HD), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, Hq, Hkv), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, Hq, D), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, PP * ps, HD), k_pages.dtype),
            pltpu.VMEM((2, PP * ps, HD), v_pages.dtype),
            pltpu.VMEM((Hq, HD), jnp.float32),
            pltpu.VMEM((Hq, 128), jnp.float32),
            pltpu.VMEM((Hq, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2, PP)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _attn_decode_kernel, Hkv=Hkv, ps=ps, D=D, PP=PP, layered=layered,
            fp8=fp8,
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hq, D), q.dtype if not fp8
                                       else jnp.bfloat16),
        grid_spec=grid_spec,
        interpret=interpret,
    )(page_tables, ctx_lens, layer_arr, qbd, oh, k_pages, v_pages)
    if fp8:
        out = (out.astype(jnp.float32)
               * vsc.astype(jnp.float32)[kvh][None, :, None]).astype(q.dtype)
    return out[:, None]  # [B, 1, Hq, D]


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def paged_attention_tok(
    q: jax.Array,  # [B, 1, Hq, D]
    k_pages: jax.Array,  # e4m3 arena, (stacked) [L, n_pages, ps, Hkv*D]
    v_pages: jax.Array,
    ks_pages: jax.Array,  # f32 per-token scales [L, n_pages, ps, 128]
    vs_pages: jax.Array,
    page_tables: jax.Array,
    ctx_lens: jax.Array,
    scale: float,
    interpret: bool = False,
    layer=None,
) -> jax.Array:
    """Decode attention over the dynamic per-token fp8 arena
    (kv_quant='fp8_tok'); numerics match paged_attention_ref with
    per-token scales. Q==1 only (spec verify keeps the jnp path)."""
    assert q.shape[1] == 1, "paged_attention_tok is the decode (Q=1) path"
    return _paged_attention_decode_tok(
        q, k_pages, v_pages, page_tables, ctx_lens, scale, interpret, layer,
        ks_pages, vs_pages,
    )


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def paged_attention(
    q: jax.Array,  # [B, Q, Hq, D]
    k_pages: jax.Array,  # [n_pages, ps, Hkv*D] folded, or stacked [L, ...]
    v_pages: jax.Array,
    page_tables: jax.Array,  # [B, P] int32
    ctx_lens: jax.Array,  # [B] int32 (committed length; in-step writes begin here)
    qmask: jax.Array,  # [B, Q, Q] bool
    scale: float,
    interpret: bool = False,
    layer=None,  # traced scalar layer index when k/v are stacked [L, ...]
    kv_scales=None,  # fp8 arena: ([Hkv], [Hkv]) static dequant scales
) -> jax.Array:
    """Returns [B, Q, Hq, D]; numerics match ops/attention.py's reference.

    The stacked-[L, ...] form with ``layer`` exists so the layer scan can
    pass the whole arena without materializing a per-layer slice (an ANY
    memory-space operand would copy it). An e4m3 arena (reference
    quant_to_fp8_and_update_cache, csrc/quantize/fp8_quant.cu) halves the
    page DMA; the kernels SWAR-dequant in VMEM and the per-(layer, head)
    scales fold into q (K side) and the output (V side) out here."""
    B, Q, Hq, D = q.shape
    if Q == 1:
        return _paged_attention_decode(
            q, k_pages, v_pages, page_tables, ctx_lens, scale, interpret,
            layer, kv_scales,
        )
    layered = k_pages.ndim == 4
    n_pages, ps, HD = k_pages.shape[-3:]
    Hkv = HD // D
    G = Hq // Hkv
    GQ = G * Q
    fp8 = k_pages.dtype == jnp.float8_e4m3fn
    if fp8:
        assert kv_scales is not None, "fp8 KV arena needs (k_scale, v_scale)"
        ksc, vsc = kv_scales  # [Hkv]
        odt = q.dtype
        kvh = jnp.arange(Hq, dtype=jnp.int32) // G
        q = (q.astype(jnp.float32)
             * ksc.astype(jnp.float32)[kvh][None, None, :, None]
             ).astype(jnp.bfloat16)
    # heads per block-diagonal group: start from the lane-alignment minimum
    # (HB*D % 128 == 0), then grow while the row count still fits one MXU
    # M tile (block-diag waste is HBx on the dots, so stop at 128 rows)
    HB = 1
    while (HB * D) % 128 != 0 and HB < Hkv:
        HB *= 2
    while HB * 2 <= Hkv and Hkv % (HB * 2) == 0 and (HB * 2) * GQ <= 128:
        HB *= 2
    assert Hkv % HB == 0 and (HB * D) % 128 == 0 or interpret, (
        f"unsupported head geometry Hkv={Hkv} D={D}"
    )
    NG = Hkv // HB
    RG = HB * GQ
    HBD = HB * D
    # pages per DMA block, bounded so the double-buffered K+V blocks stay
    # within ~8 MB of the ~16 MB VMEM
    PP = max(1, min(256 // ps, page_tables.shape[1],
                    (2 * 1024 * 1024) // max(ps * HD * 2, 1) or 1))
    # rows of group ng: r = j*GQ + (g*Q + t) -> q head (ng*HB + j)*G + g,
    # block-diagonal at lane block j
    qp = (
        q.transpose(0, 2, 1, 3)
        .reshape(B, NG, HB, GQ, D)
    )
    qp = (qp.astype(jnp.float32) * scale).astype(q.dtype)
    eye = jnp.eye(HB, dtype=q.dtype)
    qbd = jnp.einsum("bnjrd,jk->bnjrkd", qp, eye).reshape(B, NG, RG, HBD)
    oh = (
        (jnp.arange(RG, dtype=jnp.int32)[:, None] // GQ)
        == jnp.arange(HB, dtype=jnp.int32)[None, :]
    ).astype(jnp.float32)[None]  # [1, RG, HB]
    if layer is None:
        layer_arr = jnp.full((1,), -1, jnp.int32)
    else:
        layer_arr = jnp.asarray(layer, jnp.int32).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(
                (1, NG, RG, HBD), lambda b, *_: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, RG, HB), lambda b, *_: (0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, Q, Q), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, NG, RG, D), lambda b, *_: (b, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, PP * ps, HD), k_pages.dtype),
            pltpu.VMEM((2, PP * ps, HD), v_pages.dtype),
            pltpu.VMEM((NG, RG, HBD), jnp.float32),
            pltpu.VMEM((NG, RG, 128), jnp.float32),
            pltpu.VMEM((NG, RG, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2, PP)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _attn_verify_kernel, NG=NG, HB=HB, G=G, Q=Q, ps=ps, D=D, PP=PP,
            layered=layered, fp8=fp8,
        ),
        out_shape=jax.ShapeDtypeStruct((B, NG, RG, D), q.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(page_tables, ctx_lens, layer_arr, qbd, oh, qmask, k_pages, v_pages)
    # unpack rows: [B, NG, (HB, G, Q), D] -> [B, Q, Hq, D]
    out = (
        out.reshape(B, NG, HB, G, Q, D)
        .transpose(0, 4, 1, 2, 3, 5)
        .reshape(B, Q, Hq, D)
    )
    if fp8:
        out = (out.astype(jnp.float32)
               * vsc.astype(jnp.float32)[kvh][None, None, :, None]
               ).astype(odt)
    return out


def _attn_prefill_kernel(
    # scalar prefetch
    page_tables_ref,  # [B, P] int32 (SMEM)
    ctx_lens_ref,  # [B] int32 (SMEM)
    layer_ref,  # [1] int32 (SMEM; -1 sentinel when unlayered)
    # inputs
    qbd_ref,  # [1, 1, NG*RG, HBD] VMEM: block-diagonal q rows of this tile
    oh_ref,  # [1, RG, HB] VMEM f32: one-hot lane-block of each row
    k_pages_hbm,  # [(L,) n_pages, ps, H*D] ANY
    v_pages_hbm,
    # output
    o_ref,  # [1, 1, NG*RG, D] VMEM
    # scratch
    k_buf,  # [2, PP*ps, H*D]
    v_buf,
    acc_ref,  # [NG, RG, HBD] f32
    m_ref,  # [NG, RG, 128] f32
    l_ref,  # [NG, RG, 128] f32
    sems,
    *,
    NG: int,
    HB: int,
    QT: int,
    ps: int,
    D: int,
    PP: int,
    layered: bool,
):
    """CAUSAL prefill-chunk attention (Q > 128, tiled by QT query rows).

    The verify kernel keeps per-row softmax state for the whole window in
    VMEM, capping Q at 128; prefill chunks (default 512) fell back to the
    XLA path, which materializes [B, H, Q, L] scores in HBM (~8 Hq Q L
    bytes/layer — the dominant prefill-attention traffic at long context).
    This kernel is the same page-blocked online-softmax walk with the grid
    extended over query tiles: program (b, t) owns rows [t*QT, (t+1)*QT),
    streams only the pages visible to the tile (ctx + t*QT + QT keys), and
    applies the causal rule from iota — no qmask needed (tree windows stay
    on the verify kernel). Rows per group = HB*G*QT may exceed one MXU M
    tile; HB stays at the lane-alignment minimum so the block-diagonal
    waste does not grow with Q (reference analogue: the BLOCK_M sweep of
    seg_attn prefill, flood/ops/seg_attn.py:602-710)."""
    b = pl.program_id(0)
    t = pl.program_id(1)
    ctx = ctx_lens_ref[b]
    t0 = t * QT
    # the last tile's QT-padding rows may reach past the request's pages:
    # clamp to the table width (their keys land on the null page anyway)
    n_used = jnp.minimum(
        (ctx + t0 + QT + ps - 1) // ps, page_tables_ref.shape[1]
    )
    n_blk = (n_used + PP - 1) // PP
    RG = oh_ref.shape[1]
    HBD = HB * D
    T = PP * ps

    acc_ref[:] = jnp.zeros_like(acc_ref)
    m_ref[:] = jnp.full_like(m_ref, NEG_INF)
    l_ref[:] = jnp.zeros_like(l_ref)

    def dma(slot, blk, p, which):
        page = page_tables_ref[b, blk * PP + p]
        src = k_pages_hbm if which == 0 else v_pages_hbm
        dst = k_buf if which == 0 else v_buf
        src_at = src.at[layer_ref[0], page] if layered else src.at[page]
        return pltpu.make_async_copy(
            src_at, dst.at[slot, pl.ds(p * ps, ps)], sems.at[slot, which, p]
        )

    def start_blk(slot, blk):
        for p in range(PP):
            @pl.when(blk * PP + p < n_used)
            def _(p=p):
                dma(slot, blk, p, 0).start()
                dma(slot, blk, p, 1).start()

    def wait_blk(slot, blk):
        for p in range(PP):
            @pl.when(blk * PP + p < n_used)
            def _(p=p):
                dma(slot, blk, p, 0).wait()
                dma(slot, blk, p, 1).wait()

    @pl.when(n_blk > 0)
    def _():
        start_blk(0, 0)

    def body(i, _):
        slot = jax.lax.rem(i, 2)
        nxt = jax.lax.rem(i + 1, 2)

        @pl.when(i + 1 < n_blk)
        def _():
            start_blk(nxt, i + 1)

        wait_blk(slot, i)
        for p in range(PP):  # zero un-DMA'd pages (0 * NaN poisons P@V)
            @pl.when(i * PP + p >= n_used)
            def _(p=p):
                k_buf[slot, pl.ds(p * ps, ps)] = jnp.zeros(
                    (ps, k_buf.shape[-1]), k_buf.dtype
                )
                v_buf[slot, pl.ds(p * ps, ps)] = jnp.zeros(
                    (ps, v_buf.shape[-1]), v_buf.dtype
                )

        # causal visibility: row r (in-tile position r mod QT, global query
        # position ctx + t0 + r mod QT) sees keys at global index <= its own
        jcol = jax.lax.broadcasted_iota(jnp.int32, (RG, T), 1) + i * T
        rpos = jax.lax.rem(
            jax.lax.broadcasted_iota(jnp.int32, (RG, T), 0), QT
        )
        vis_rows = jcol <= ctx + t0 + rpos

        def group(ng, _):
            k_blk = k_buf[slot, :, pl.ds(ng * HBD, HBD)]  # [T, HBD]
            v_blk = v_buf[slot, :, pl.ds(ng * HBD, HBD)]
            s = jax.lax.dot_general(
                qbd_ref[0, 0, pl.ds(ng * RG, RG), :], k_blk,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [RG, T]
            s = jnp.where(vis_rows, s, NEG_INF)
            m_prev = m_ref[ng, :, :1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p_ = jnp.exp(s - m_new)
            l_ref[ng] = jnp.broadcast_to(
                l_ref[ng, :, :1] * alpha + jnp.sum(p_, axis=1, keepdims=True),
                l_ref.shape[1:],
            )
            m_ref[ng] = jnp.broadcast_to(m_new, m_ref.shape[1:])
            pv = jax.lax.dot_general(
                p_.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [RG, HBD]
            acc_ref[ng] = acc_ref[ng] * alpha + pv
            return 0

        jax.lax.fori_loop(0, NG, group, 0)
        return 0

    jax.lax.fori_loop(0, n_blk, body, 0)

    def finish(ng, _):
        l = l_ref[ng, :, :1]
        safe_l = jnp.where(l > 0.0, l, 1.0)
        full = acc_ref[ng] / safe_l  # [RG, HB*D]
        out = full[:, 0:D] * oh_ref[0][:, 0:1]
        for j in range(1, HB):
            out = out + full[:, j * D : (j + 1) * D] * oh_ref[0][:, j : j + 1]
        o_ref[0, 0, pl.ds(ng * RG, RG), :] = out.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, NG, finish, 0)


@functools.partial(jax.jit, static_argnames=("scale", "interpret", "qt"))
def paged_attention_prefill(
    q: jax.Array,  # [B, Q, Hq, D], Q > 128, PURELY CAUSAL window
    k_pages: jax.Array,  # [n_pages, ps, Hkv*D] folded, or stacked [L, ...]
    v_pages: jax.Array,
    page_tables: jax.Array,  # [B, P] int32
    ctx_lens: jax.Array,  # [B] int32 committed lengths
    scale: float,
    interpret: bool = False,
    layer=None,
    qt: int = 128,
) -> jax.Array:
    """Causal chunk attention, query-tiled. The window's K/V must already
    be written to the page arena (positions ctx..ctx+Q-1), exactly as the
    engine's prefill does before attending. Rows past a request's valid
    tokens produce well-defined garbage (their keys exist and are finite);
    callers discard them via the chunk's valid mask, as with the XLA path."""
    B, Q, Hq, D = q.shape
    QT = qt
    NT = -(-Q // QT)
    Qp = NT * QT
    if Qp != Q:
        q = jnp.pad(q, ((0, 0), (0, Qp - Q), (0, 0), (0, 0)))
    layered = k_pages.ndim == 4
    n_pages, ps, HD = k_pages.shape[-3:]
    Hkv = HD // D
    G = Hq // Hkv
    HB = 1
    while (HB * D) % 128 != 0 and HB < Hkv:
        HB *= 2
    assert (Hkv % HB == 0 and (HB * D) % 128 == 0) or interpret, (
        f"unsupported head geometry Hkv={Hkv} D={D}"
    )
    NG = Hkv // HB
    RG = HB * G * QT
    HBD = HB * D
    PP = max(1, min(128 // ps, page_tables.shape[1],
                    (1024 * 1024) // max(ps * HD * 2, 1) or 1))
    # [B, Q, Hq, D] -> [B, NT, NG, HB, G, QT, D] -> block-diagonal rows
    qp = (
        q.reshape(B, NT, QT, NG, HB, G, D)
        .transpose(0, 1, 3, 4, 5, 2, 6)  # [B, NT, NG, HB, G, QT, D]
    )
    qp = (qp.astype(jnp.float32) * scale).astype(q.dtype)
    eye = jnp.eye(HB, dtype=q.dtype)
    qbd = jnp.einsum("bnghqtd,hk->bnghqtkd", qp, eye).reshape(
        B, NT, NG * RG, HBD
    )
    oh = (
        (jnp.arange(RG, dtype=jnp.int32)[:, None] // (G * QT))
        == jnp.arange(HB, dtype=jnp.int32)[None, :]
    ).astype(jnp.float32)[None]  # [1, RG, HB]
    if layer is None:
        layer_arr = jnp.full((1,), -1, jnp.int32)
    else:
        layer_arr = jnp.asarray(layer, jnp.int32).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, NT),
        in_specs=[
            pl.BlockSpec(
                (1, 1, NG * RG, HBD), lambda b, t, *_: (b, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, RG, HB), lambda b, t, *_: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, NG * RG, D), lambda b, t, *_: (b, t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, PP * ps, HD), k_pages.dtype),
            pltpu.VMEM((2, PP * ps, HD), v_pages.dtype),
            pltpu.VMEM((NG, RG, HBD), jnp.float32),
            pltpu.VMEM((NG, RG, 128), jnp.float32),
            pltpu.VMEM((NG, RG, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2, PP)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _attn_prefill_kernel, NG=NG, HB=HB, QT=QT, ps=ps, D=D, PP=PP,
            layered=layered,
        ),
        out_shape=jax.ShapeDtypeStruct((B, NT, NG * RG, D), q.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(page_tables, ctx_lens, layer_arr, qbd, oh, k_pages, v_pages)
    # rows: [B, NT, (NG, HB, G, QT), D] -> [B, Q, Hq, D]
    out = (
        out.reshape(B, NT, NG, HB, G, QT, D)
        .transpose(0, 1, 5, 2, 3, 4, 6)  # [B, NT, QT, NG, HB, G, D]
        .reshape(B, Qp, Hq, D)
    )
    return out[:, :Q]
