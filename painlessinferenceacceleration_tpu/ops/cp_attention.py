"""Context-parallel (sequence-sharded) paged attention.

SURVEY §2.5 / §7: long-context serving wants the KV cache split across
chips so a single request's context can exceed one chip's HBM and the
attention reads scale with devices. The reference has no equivalent (its
parallelism is layer-pipelining); this is the TPU-native design from the
README note, made real:

- the arena's PAGE axis shards across a mesh axis (each device owns the
  pages `[d*np/n, (d+1)*np/n)`),
- inside ``shard_map`` every device attends ONLY its local pages (non-local
  page-table entries are masked out),
- the per-device partial softmax states (m, l, acc) merge with three cheap
  collectives (pmax + two psums) — the flash-attention combine identity,
  O(B*Q*H*D) bytes over ICI instead of moving any KV.

This is the jnp/GSPMD form (collectives ride ICI via XLA); a Pallas
per-shard kernel drops in unchanged since the merge happens outside the
local attention.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

shard_map = jax.shard_map

NEG_INF = -1e30


def _local_attention_stats(
    q, k_local, v_local, page_tables, ctx_lens, qmask, scale, page_lo, ps,
    v_dim,
):
    """Partial attention over this device's pages.

    Returns (acc [B,Q,H,Dv] unnormalized, m [B,Q,H] row max, l [B,Q,H]
    row sum) with m = -inf where no local key is visible. GQA arenas
    (fewer KV heads than q heads) are repeated to q's head count."""
    B, Q, H, D = q.shape
    n_local = k_local.shape[0]
    Hk = k_local.shape[-1] // D  # arena kv-head count (GQA: Hk <= H)
    # local view of the page table: global page id -> local index or masked
    rel = page_tables - page_lo  # [B, P]
    local_ok = (rel >= 0) & (rel < n_local) & (page_tables > 0)
    rel = jnp.where(local_ok, rel, 0)
    kc = k_local[rel]  # [B, P, ps, Hk*D]
    vc = v_local[rel]
    Pn = page_tables.shape[1]
    L = Pn * ps
    kc = kc.reshape(B, Pn, ps, Hk, D).transpose(0, 3, 1, 2, 4).reshape(B, Hk, L, D)
    vc = vc.reshape(B, Pn, ps, Hk, v_dim).transpose(0, 3, 1, 2, 4).reshape(
        B, Hk, L, v_dim
    )
    if Hk != H:
        kc = jnp.repeat(kc, H // Hk, axis=1)
        vc = jnp.repeat(vc, H // Hk, axis=1)

    # visibility: prefix causal + in-step qmask (ops/attention.py semantics),
    # AND the key's page must be local
    pos = jnp.arange(L, dtype=jnp.int32)[None, :]  # global slot index
    prefix = pos < ctx_lens[:, None]  # [B, L]
    instep_col = (pos >= ctx_lens[:, None]) & (pos < ctx_lens[:, None] + Q)
    col_of = jnp.clip(pos - ctx_lens[:, None], 0, Q - 1)
    qvis = jnp.take_along_axis(
        qmask, col_of[:, None, :].repeat(Q, 1), axis=2
    )  # [B, Q, L]
    vis = prefix[:, None, :] | (instep_col[:, None, :] & qvis)
    page_local = jnp.repeat(local_ok, ps, axis=1)  # [B, L]
    vis = vis & page_local[:, None, :]

    s = jnp.einsum(
        "bqhd,bhld->bhql", q.astype(jnp.float32), kc.astype(jnp.float32)
    ) * scale  # [B, H, Q, L]
    s = jnp.where(vis[:, None], s, NEG_INF)
    m = jnp.max(s, axis=-1)  # [B, H, Q]
    p = jnp.exp(s - m[..., None])
    p = jnp.where(s <= NEG_INF / 2, 0.0, p)  # fully-masked rows stay 0
    l = jnp.sum(p, axis=-1)
    acc = jnp.einsum("bhql,bhld->bhqd", p, vc.astype(jnp.float32))
    return acc, m, l


def cp_paged_attention(
    q: jax.Array,  # [B, Q, H, D] (replicated)
    k_pages: jax.Array,  # [n_pages, ps, H*D] SHARDED on axis 0
    v_pages: jax.Array,
    page_tables: jax.Array,  # [B, P] (replicated)
    ctx_lens: jax.Array,  # [B]
    qmask: jax.Array,  # [B, Q, Q]
    scale: float,
    mesh: Mesh,
    axis: str = "model",
    v_dim: int | None = None,
) -> jax.Array:
    """Returns [B, Q, H, Dv]; numerics match paged_attention_ref with the
    full (unsharded) arena."""
    B, Q, H, D = q.shape
    if v_dim is None:
        v_dim = D
    n = mesh.shape[axis]
    n_pages, ps, HD = k_pages.shape
    assert n_pages % n == 0, (n_pages, n)
    per = n_pages // n

    def local(q, kl, vl, pt, cl, qm):
        d = jax.lax.axis_index(axis)
        acc, m, l = _local_attention_stats(
            q, kl, vl, pt, cl, qm, scale, d * per, ps, v_dim
        )
        # flash combine across shards: three cheap collectives
        gm = jax.lax.pmax(m, axis)
        w = jnp.exp(m - gm)
        w = jnp.where(m <= NEG_INF / 2, 0.0, w)
        gl = jax.lax.psum(l * w, axis)
        gacc = jax.lax.psum(acc * w[..., None], axis)
        safe = jnp.where(gl > 0.0, gl, 1.0)
        out = gacc / safe[..., None]  # [B, H, Q, Dv]
        return out.transpose(0, 2, 1, 3).astype(q.dtype)

    rep = P(*([None]))
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(None, None, None, None),  # q replicated
            P(axis, None, None),  # k pages sharded
            P(axis, None, None),
            P(None, None),
            P(None),
            P(None, None, None),
        ),
        out_specs=P(None, None, None, None),
        check_vma=False,
    )
    return fn(q, k_pages, v_pages, page_tables, ctx_lens, qmask)


def ambient_cp_mesh(axis: str = "model"):
    """The ambient mesh when it can carry a CP shard_map (axis size > 1),
    else None. Engine dispatch gate (models/base.py): DistLLM sets the
    ambient mesh around its scheduler loop."""
    from jax.sharding import get_abstract_mesh

    am = get_abstract_mesh()
    if am is not None and am.shape.get(axis, 1) > 1:
        return am
    return None


def cp_paged_attention_stacked(
    q: jax.Array,  # [B, Q, H, D] (replicated)
    kk: jax.Array,  # [Lyr, n_pages, ps, Hk*D] page-sharded on axis 1
    vv: jax.Array,
    layer: jax.Array,  # traced scalar layer index
    page_tables: jax.Array,  # [B, P]
    ctx_lens: jax.Array,  # [B]
    qmask: jax.Array,  # [B, Q, Q]
    scale: float,
    axis: str = "model",
) -> jax.Array:
    """Engine-path CP attention over the stacked multi-layer arena.

    Same partial-softmax merge as ``cp_paged_attention`` but (a) the layer
    is selected inside the shard_map (the arena stays sharded end-to-end),
    (b) GQA arenas are handled, and (c) the mesh is the AMBIENT one
    (jax.set_mesh — DistLLM wraps its scheduler loop), so the jitted engine
    step needs no mesh plumbing. Reference: no CP equivalent (SURVEY §2.5);
    this is the TPU-native long-context axis."""
    from jax.sharding import get_abstract_mesh

    am = get_abstract_mesh()
    n = am.shape[axis]
    B, Q, H, D = q.shape
    n_pages, ps = kk.shape[1], kk.shape[2]
    assert n_pages % n == 0, (n_pages, n)
    per = n_pages // n
    v_dim = vv.shape[-1] // (kk.shape[-1] // D)

    def local(q, li, kl, vl, pt, cl, qm):
        d = jax.lax.axis_index(axis)
        k_l = jax.lax.dynamic_index_in_dim(kl, li[0], 0, keepdims=False)
        v_l = jax.lax.dynamic_index_in_dim(vl, li[0], 0, keepdims=False)
        acc, m, l = _local_attention_stats(
            q, k_l, v_l, pt, cl, qm, scale, d * per, ps, v_dim
        )
        gm = jax.lax.pmax(m, axis)
        w = jnp.exp(m - gm)
        w = jnp.where(m <= NEG_INF / 2, 0.0, w)
        gl = jax.lax.psum(l * w, axis)
        gacc = jax.lax.psum(acc * w[..., None], axis)
        safe = jnp.where(gl > 0.0, gl, 1.0)
        out = gacc / safe[..., None]  # [B, H, Q, Dv]
        return out.transpose(0, 2, 1, 3).astype(q.dtype)

    fn = jax.shard_map(
        local,
        mesh=am,
        in_specs=(
            P(None, None, None, None),
            P(None),
            P(None, axis, None, None),  # stacked arena: pages sharded
            P(None, axis, None, None),
            P(None, None),
            P(None),
            P(None, None, None),
        ),
        out_specs=P(None, None, None, None),
        check_vma=False,
    )
    li = jnp.asarray(layer, jnp.int32).reshape(1)
    return fn(q, li, kk, vv, page_tables, ctx_lens, qmask)


def shard_kv_pages_cp(kv: dict, mesh: Mesh, axis: str = "model") -> dict:
    """Place a single-layer page arena with the PAGE axis sharded (context
    parallelism). The stacked multi-layer arena shards its axis-1 pages the
    same way."""
    out = {}
    for k, v in kv.items():
        if k in ("k", "v"):
            spec = (
                P(None, axis, None, None) if v.ndim == 4 else P(axis, None, None)
            )
            out[k] = jax.device_put(v, NamedSharding(mesh, spec))
        else:
            out[k] = v
    return out
