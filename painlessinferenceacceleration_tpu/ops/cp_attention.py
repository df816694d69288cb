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
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

NEG_INF = -1e30


def _local_attention_stats(
    q, k_local, v_local, page_tables, ctx_lens, qmask, scale, page_lo, ps,
    v_dim,
):
    """Partial attention over this device's pages.

    Returns (acc [B,Q,H,Dv] unnormalized, m [B,Q,H] row max, l [B,Q,H]
    row sum) with m = -inf where no local key is visible."""
    B, Q, H, D = q.shape
    n_local = k_local.shape[0]
    # local view of the page table: global page id -> local index or masked
    rel = page_tables - page_lo  # [B, P]
    local_ok = (rel >= 0) & (rel < n_local) & (page_tables > 0)
    rel = jnp.where(local_ok, rel, 0)
    kc = k_local[rel]  # [B, P, ps, H*D]
    vc = v_local[rel]
    Pn = page_tables.shape[1]
    L = Pn * ps
    kc = kc.reshape(B, Pn, ps, H, D).transpose(0, 3, 1, 2, 4).reshape(B, H, L, D)
    vc = vc.reshape(B, Pn, ps, H, v_dim).transpose(0, 3, 1, 2, 4).reshape(
        B, H, L, v_dim
    )

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
        check_rep=False,
    )
    return fn(q, k_pages, v_pages, page_tables, ctx_lens, qmask)


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
