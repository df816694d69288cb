"""Device-resident draft tables: hash-bucketed 2-gram -> branch store.

Reference: flood/utils/speculative.py + flood/ops/draft.py — FLOOD keeps
lookahead drafts in two GPU tensors (freq_table + draft_table) hashed by a
2-token prefix (draft.py:116-117), updated with freq increment / decay /
replacement (draft.py:91-165) and retrieved as up-to-retrieve_count branches
with a block-diagonal tree mask (draft.py:277-402).

TPU re-design: the same idea as set-associative tables —

    key0/key1 : int32[buckets, ways]      exact 2-gram tags (-1 = empty)
    freq      : float32[buckets, ways]    branch hit frequency
    branch    : int32[buckets, ways, L]   continuation tokens (-1 = pad)

Everything is jnp gather/scatter with static shapes, so retrieval, update,
verification and KV compaction all live INSIDE one jitted multi-step decode
loop (engine/multistep.py) — zero host round-trips per step. This matters
far more on TPU than on GPU: the host relay costs ~ms per sync, and JAX
async dispatch cannot hide a data-dependent host step.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DraftTableConfig:
    buckets: int = 8192  # power of two
    ways: int = 8  # stored branches per 2-gram bucket
    branch_length: int = 12  # tokens per branch (reference default 12)
    retrieve_count: int = 4  # branches offered per draft (<= ways)
    # Adaptive draft gating (reference: draft size tracks cache confidence —
    # freq-thresholded variable drafts, lookahead_cache.py:65-144 + GPU
    # threshold lowering, flood/ops/draft.py:277-349). When every active row
    # retrieves nothing above gate_min_freq, the verify step drops to a
    # plain width-1 AR step (lax.cond) instead of paying the full
    # Q = 1 + R*L forward.
    #
    # DEFAULT OFF ON TPU: a per-step lax.cond over the donated KV arena is
    # an XLA anti-pattern — the conditional can alias its output buffers to
    # only ONE branch's in-place update chain, so executing the other
    # branch copies the whole arena in AND out (measured 347 ms/verify-step
    # at 7B vs 9.9 without the cond; ~6.4 s of pure `copy` ops in a
    # 16-step chunk). The production mechanism is CHUNK-level adaptivity on
    # the host instead: every spec chunk returns a per-step
    # draft-retrievable probe (wide_mask), and the driver switches between
    # the (static) wide spec program and the plain AR program at chunk
    # boundaries (bench.py run_la, engine/llm.py spec cooldown). The
    # in-scan cond remains available for CPU/debug use.
    adaptive: bool = False
    gate_min_freq: float = 0.0  # a draft engages iff top freq > this

    @property
    def verify_width(self) -> int:
        """Q of the verify step this table feeds: root + R*L draft nodes."""
        return 1 + self.retrieve_count * self.branch_length


def init_draft_tables(tcfg: DraftTableConfig) -> dict:
    B, W, L = tcfg.buckets, tcfg.ways, tcfg.branch_length
    return {
        "key0": jnp.full((B, W), -1, jnp.int32),
        "key1": jnp.full((B, W), -1, jnp.int32),
        "freq": jnp.zeros((B, W), jnp.float32),
        "branch": jnp.full((B, W, L), -1, jnp.int32),
    }


def _bucket_of(p0: jax.Array, p1: jax.Array, buckets: int) -> jax.Array:
    """Cheap 2-gram hash (uint32 wraparound is the modulo)."""
    h = p0.astype(jnp.uint32) * jnp.uint32(2654435761) + p1.astype(
        jnp.uint32
    ) * jnp.uint32(40503)
    return (h % jnp.uint32(buckets)).astype(jnp.int32)


@functools.partial(jax.jit, static_argnums=(1,))
def update_tables_seq(
    tables: dict,
    tcfg: DraftTableConfig,
    tokens: jax.Array,
    n_valid: jax.Array,
    win_lo=None,
    win_hi=None,
) -> dict:
    # jitted: called EAGERLY, the op-by-op dispatch pays one relay round
    # trip per op (~1 s/call measured regardless of length; jitted: ~0.1 ms)
    """Insert windows of ``tokens[:n_valid]``.

    tokens: [T] int32. A window at position i is prefix (t[i], t[i+1]) and
    branch t[i+2 : i+2+L] (cut short by n_valid -> -1 pads), matching the
    reference's insertion of tail n-grams (lookahead_cache.py put loop).

    win_lo/win_hi (optional): streaming mode. ``[win_lo, win_hi)`` is the
    span of NEW token positions this step. A window whose first branch token
    (i + 2) falls in the new span is a *new observation*: inserted with a
    freq bump (exactly once per stream position). A window whose branch
    merely grows into the new span is an *extension*: its stored branch
    content is extended (pads filled) but its freq is NOT bumped, and it
    never evicts a live way. This makes short repeats retrievable
    immediately — a complete-window-only rule would delay retrievability by
    branch_length tokens, killing acceptance on tight cycles (the host trie
    gets this for free by inserting truncated n-grams, trie.py put).

    Sequential fori over positions: in-window bucket collisions are
    read-modify-write dependent (the reference's Triton kernel serializes via
    atomics; a TPU scan is the moral equivalent).
    """
    T = tokens.shape[0]
    L = tcfg.branch_length
    if T < 3:
        return tables

    # gather all windows up-front: [T, L] branch matrix
    idx = jnp.arange(T)[:, None] + 2 + jnp.arange(L)[None, :]
    branches = jnp.where(
        idx < n_valid, tokens[jnp.clip(idx, 0, T - 1)], -1
    )

    def body(i, tb):
        p0, p1 = tokens[i], tokens[i + 1]
        valid = (i + 2 < n_valid) & (p0 >= 0) & (p1 >= 0)
        if win_lo is None:
            is_new = jnp.bool_(True)
        else:
            first_branch_pos = i + 2
            is_new = (first_branch_pos >= win_lo) & (first_branch_pos < win_hi)
            # extension: branch window overlaps the new span but started before
            is_ext = (first_branch_pos < win_lo) & (first_branch_pos + L > win_lo)
            valid = valid & (is_new | is_ext)
        b = _bucket_of(p0, p1, tcfg.buckets)
        nb = branches[i]
        k0, k1 = tb["key0"][b], tb["key1"][b]  # [W]
        fr = tb["freq"][b]
        br = tb["branch"][b]  # [W, L]
        # way match: exact 2-gram tag + same first continuation token
        # (distinct continuations of one prefix occupy distinct ways)
        hit = (k0 == p0) & (k1 == p1) & (br[:, 0] == nb[0])
        any_hit = jnp.any(hit)
        # an extension may only touch its existing way, never evict
        valid = valid & (is_new | any_hit)
        way = jnp.where(any_hit, jnp.argmax(hit), jnp.argmin(fr)).astype(jnp.int32)
        bump = jnp.where(is_new, 1.0, 0.0)
        new_freq = jnp.where(any_hit, fr[way] + bump, bump)
        # on hit, keep existing content, fill pads with new tokens
        old_br = br[way]
        merged = jnp.where(any_hit & (old_br >= 0), old_br, nb)

        def upd(tb):
            return {
                "key0": tb["key0"].at[b, way].set(p0),
                "key1": tb["key1"].at[b, way].set(p1),
                "freq": tb["freq"].at[b, way].set(new_freq),
                "branch": tb["branch"].at[b, way].set(merged),
            }

        return jax.lax.cond(valid, upd, lambda tb: tb, tb)

    return jax.lax.fori_loop(0, T - 2, body, tables)


@functools.partial(jax.jit, static_argnames=("tcfg",))
def update_tables_batch(
    tables: dict,
    tcfg: DraftTableConfig,
    bufs: jax.Array,  # [B, W] int32 (-1 padded)
    n_valid: jax.Array,  # [B]
    win_lo: jax.Array,  # [B]
    win_hi: jax.Array,  # [B]
) -> dict:
    """One jitted update over B row-buffers (fori over rows). The engine
    drains a whole decode burst with ONE dispatch instead of one
    update_tables_seq call per row (measured: per-row dispatch through the
    relay made the 7B spec-serving drain ~0.2 s/row — 230 s over a run)."""

    def body(b, tb):
        return update_tables_seq(
            tb, tcfg, bufs[b], n_valid[b], win_lo=win_lo[b], win_hi=win_hi[b]
        )

    return jax.lax.fori_loop(0, bufs.shape[0], body, tables)


def decay_tables(tables: dict, factor: float = 0.5) -> dict:
    """Freq-halving decay (reference squeeze law, draft.py:91-165 /
    lookahead_cache.py:295)."""
    out = dict(tables)
    out["freq"] = tables["freq"] * factor
    return out


def retrieve_drafts(
    tables: dict, tcfg: DraftTableConfig, p0: jax.Array, p1: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Top retrieve_count branches for 2-gram (p0, p1).

    Returns (branches [R, L] int32 with -1 pads, freqs [R] f32; freq 0 =>
    no branch). Device equivalent of flood retrieve_draft_table
    (draft.py:277-402).
    """
    b = _bucket_of(p0, p1, tcfg.buckets)
    hit = (tables["key0"][b] == p0) & (tables["key1"][b] == p1)  # [W]
    score = jnp.where(hit, tables["freq"][b], 0.0)
    R = tcfg.retrieve_count
    top_scores, top_idx = jax.lax.top_k(score, R)
    branches = tables["branch"][b][top_idx]  # [R, L]
    branches = jnp.where((top_scores > 0.0)[:, None], branches, -1)
    return branches, top_scores


def build_tree_inputs(
    root_token: jax.Array,  # scalar int32
    branches: jax.Array,  # [R, L]
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Lay parallel branches out as verify-step inputs with static width
    Q = 1 + R*L.

    Returns (tokens [Q], parents [Q], qmask [Q, Q], depth [Q]). A -1 branch
    token invalidates its node and everything after it on that branch
    (parents = -2 => the verify walk & KV write ignore it). Mask layout is
    the reference's block-diagonal branch mask (draft.py:374-382).
    """
    R, L = branches.shape
    Q = 1 + R * L
    flat = branches.reshape(-1)  # [R*L]
    node_valid = flat >= 0
    # within a branch, validity must be prefix-closed
    vb = branches >= 0
    vb = jnp.cumprod(vb, axis=1).astype(bool)
    node_valid = vb.reshape(-1)

    tokens = jnp.concatenate([root_token[None], jnp.where(node_valid, flat, 0)])
    j = jnp.arange(R * L)
    first_of_branch = (j % L) == 0
    parents_draft = jnp.where(first_of_branch, 0, j)  # j = previous node id (1-based shift)
    parents_draft = jnp.where(node_valid, parents_draft, -2)
    parents = jnp.concatenate([jnp.array([-1], jnp.int32), parents_draft.astype(jnp.int32)])

    # qmask rows: root row sees root; draft node (r, l) sees root + its
    # branch prefix up to itself
    qi = jnp.arange(Q)
    row_branch = (qi - 1) // L  # branch id of node (undefined for root)
    row_pos = (qi - 1) % L
    col_branch = (qi - 1) // L
    col_pos = (qi - 1) % L
    same_branch = row_branch[:, None] == col_branch[None, :]
    leq = col_pos[None, :] <= row_pos[:, None]
    qmask = same_branch & leq
    qmask = qmask.at[:, 0].set(True)  # root column visible to all
    qmask = qmask.at[0, :].set(False).at[0, 0].set(True)
    valid_full = jnp.concatenate([jnp.array([True]), node_valid])
    qmask = qmask & valid_full[None, :] & valid_full[:, None]
    qmask = qmask.at[0, 0].set(True)

    depth = jnp.concatenate([jnp.zeros((1,), jnp.int32), (row_pos[1:] + 1).astype(jnp.int32)])
    depth = jnp.where(valid_full, depth, 0)
    return tokens.astype(jnp.int32), parents, qmask, depth
