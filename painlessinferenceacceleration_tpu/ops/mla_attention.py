"""Pallas MLA attention over the fused ``[latent | roped k_pe]`` page arena.

Reference: flood/flood/ops/seg_mla.py:28-285 (Triton MLA attention on the
fusion cache, flood/utils/cache.py:90). TPU re-design:

MLA latent attention is MQA — every q head attends the SAME single-"head"
[T, r + rope_d] cache — so unlike GQA decode there is no need for
block-diagonal packing: all H*Q rows feed ONE [R, Dk] x [Dk, T] MXU dot per
page block, which is the ideal M-packing (R = 128 rows for DeepSeek-V3's
128 heads at Q=1).

V is not a separate tensor: the value of a token is its latent, i.e. the
first ``v_dim`` lanes of its K row (mla.py writes v_lat = k_lat[..., :r]).
The kernel therefore reads ONLY the K pages and slices the latent for the
P@V dot — halving decode HBM traffic vs the two-arena reference layout.

Supports the in-step tree mask (Q > 1 verify) with the same visibility rule
as ops/paged_attention.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _mla_kernel(
    # scalar prefetch
    page_tables_ref,  # [B, P] int32 (SMEM)
    ctx_lens_ref,  # [B] int32 (SMEM)
    layer_ref,  # [1] int32 (SMEM; -1 sentinel when unlayered)
    # inputs
    q_ref,  # [1, RT, Dk] VMEM (row tile of the Q*H rows, pre-scaled)
    qmask_ref,  # [1, Q, Q] VMEM bool
    k_pages_hbm,  # [(L,) n_pages, ps, Dk] ANY
    # output
    o_ref,  # [1, RT, Dv] VMEM
    # scratch
    k_buf,  # [2, PP*ps, Dk] VMEM
    acc_ref,  # [RT, Dv] f32
    m_ref,  # [RT, 128] f32
    l_ref,  # [RT, 128] f32
    sems,  # DMA sems [2, PP]
    *,
    H: int,
    Q: int,
    ps: int,
    Dv: int,
    PP: int,
    layered: bool,
):
    b = pl.program_id(0)
    rb = pl.program_id(1)  # row-tile index (verify widths: Q*H can be 1000s)
    ctx = ctx_lens_ref[b]
    n_used = (ctx + Q + ps - 1) // ps
    n_blk = (n_used + PP - 1) // PP
    R = q_ref.shape[1]  # row-tile size
    row0 = rb * R
    T = PP * ps

    acc_ref[:] = jnp.zeros_like(acc_ref)
    m_ref[:] = jnp.full_like(m_ref, NEG_INF)
    l_ref[:] = jnp.zeros_like(l_ref)

    def dma(slot, blk, p):
        page = page_tables_ref[b, blk * PP + p]
        src_at = (
            k_pages_hbm.at[layer_ref[0], page] if layered
            else k_pages_hbm.at[page]
        )
        return pltpu.make_async_copy(
            src_at, k_buf.at[slot, pl.ds(p * ps, ps)], sems.at[slot, p]
        )

    def start_blk(slot, blk):
        for p in range(PP):
            @pl.when(blk * PP + p < n_used)
            def _(p=p):
                dma(slot, blk, p).start()

    def wait_blk(slot, blk):
        for p in range(PP):
            @pl.when(blk * PP + p < n_used)
            def _(p=p):
                dma(slot, blk, p).wait()

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

        # visibility: global row row0+r is in-step position t = (row0+r)//H
        jcol = jax.lax.broadcasted_iota(jnp.int32, (R, T), 1) + i * T
        if Q == 1:
            vis = jcol <= ctx
        else:
            srange = jax.lax.broadcasted_iota(jnp.int32, (Q, T), 0)
            kcol = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1) + i * T
            onehot = (srange == (kcol - ctx)).astype(jnp.float32)  # [Q(s), T]
            qm = qmask_ref[0].astype(jnp.float32)  # [Q(t), Q(s)]
            instep_q = jax.lax.dot_general(
                qm, onehot, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [Q, T]
            rr = jax.lax.broadcasted_iota(jnp.int32, (R, Q), 0) + row0
            cc = jax.lax.broadcasted_iota(jnp.int32, (R, Q), 1)
            rows = ((rr // H) == cc).astype(jnp.float32)  # [R, Q]
            instep = (
                jax.lax.dot_general(
                    rows, instep_q, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                > 0.5
            )
            vis = (jcol < ctx) | ((jcol >= ctx) & (jcol < ctx + Q) & instep)

        s = jax.lax.dot_general(
            q_ref[0], k_buf[slot], (((1,), (1,)), ((), ())),
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
            p_.astype(k_buf.dtype), k_buf[slot, :, :Dv],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [R, Dv] — V IS the latent slice of K
        acc_ref[:] = acc_ref[:] * alpha + pv
        return 0

    jax.lax.fori_loop(0, n_blk, body, 0)

    l = l_ref[:, :1]
    safe_l = jnp.where(l > 0.0, l, 1.0)
    o_ref[0] = (acc_ref[:] / safe_l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "v_dim", "interpret"))
def mla_paged_attention(
    q: jax.Array,  # [B, Q, H, Dk] (latent-absorbed q | roped q_pe)
    k_pages: jax.Array,  # [n_pages, ps, Dk] or stacked [L, ...] (1 kv head)
    page_tables: jax.Array,  # [B, P] int32
    ctx_lens: jax.Array,  # [B] int32
    qmask: jax.Array,  # [B, Q, Q] bool
    scale: float,
    v_dim: int,
    interpret: bool = False,
    layer=None,
) -> jax.Array:
    """Returns [B, Q, H, v_dim]; matches paged_attention_ref(..., v_dim=r)
    with v pages equal to k pages' first v_dim lanes."""
    B, Q, H, Dk = q.shape
    layered = k_pages.ndim == 4
    n_pages, ps, _ = k_pages.shape[-3:]
    R = Q * H
    RT = min(R, 256)  # row tile: verify widths re-walk the (tiny) latent pages
    # rows r = t*H + h: all heads of an in-step position are contiguous
    qp = q.reshape(B, R, Dk)
    qp = (qp.astype(jnp.float32) * scale).astype(q.dtype)
    PP = max(1, min(256 // ps, page_tables.shape[1]))
    if layer is None:
        layer_arr = jnp.full((1,), -1, jnp.int32)
    else:
        layer_arr = jnp.asarray(layer, jnp.int32).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, pl.cdiv(R, RT)),
        in_specs=[
            pl.BlockSpec(
                (1, RT, Dk), lambda b, rb, *_: (b, rb, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, Q, Q), lambda b, rb, *_: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, RT, v_dim), lambda b, rb, *_: (b, rb, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, PP * ps, Dk), k_pages.dtype),
            pltpu.VMEM((RT, v_dim), jnp.float32),
            pltpu.VMEM((RT, 128), jnp.float32),
            pltpu.VMEM((RT, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, PP)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _mla_kernel, H=H, Q=Q, ps=ps, Dv=v_dim, PP=PP, layered=layered
        ),
        out_shape=jax.ShapeDtypeStruct((B, R, v_dim), q.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(page_tables, ctx_lens, layer_arr, qp, qmask, k_pages)
    return out.reshape(B, Q, H, v_dim)
