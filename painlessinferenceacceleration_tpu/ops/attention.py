"""Paged attention with prefix + in-step tree masks — jnp reference path.

Reference kernel: flood/ops/seg_attn.py (varlen flash attention over the
segment KV arena with MASK_TYPE 0 full / 1 causal / 2 tree mask —
seg_attn.py:72-131). TPU re-design: a single mask rule covers prefill,
decode and lookahead-verify —

    key j is visible to query (b, t)  iff
        j < start_lens[b]                         (committed prefix)
     or s = j - start_lens[b] in [0, Q) and qmask[b, t, s]   (in-step)

where ``qmask`` is lower-triangular for prefill chunks, all-ones [1,1] for
plain decode, and the draft tree mask (ancestor matrix, the reference's
rank-4 mask semantics — lookahead/common/pretrained_model.py:726-734) for
verification. The in-step tokens are already written into the arena before
attention, so one gather serves both prefix and draft keys.

This module is the correctness oracle; the Pallas fast path lives in
ops/paged_attention.py and is validated against this (like the reference
tests Triton kernels vs torch references, flood/test/test_seg_attn.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30  # large-negative instead of -inf: avoids NaN on all-masked rows


def attention_mask(
    start_lens: jax.Array,  # [B]
    qmask: jax.Array,  # [B, Q, Q] bool in-step visibility
    kv_len_total: int,
) -> jax.Array:
    """Build [B, Q, L] bool visibility mask (L = padded arena view length)."""
    B, Q, _ = qmask.shape
    j = jnp.arange(kv_len_total, dtype=jnp.int32)[None, None, :]  # [1,1,L]
    start = start_lens[:, None, None]  # [B,1,1]
    in_prefix = j < start
    s = j - start  # [B,1,L]
    s_clip = jnp.clip(s, 0, Q - 1)
    # qmask[b, t, s] gathered along the key axis
    instep_vis = jnp.take_along_axis(
        qmask, jnp.broadcast_to(s_clip, (B, Q, kv_len_total)), axis=2
    )
    in_step = (s >= 0) & (s < Q) & instep_vis
    return in_prefix | in_step


def alibi_slopes(n_heads: int) -> jax.Array:
    """Per-head ALiBi slopes (HF bloom ``build_alibi_tensor`` formula; the
    reference serves bloom through its HF fork, lookahead/models/bloom)."""
    import math

    cp2 = 2 ** math.floor(math.log2(n_heads))
    base = 2.0 ** (-(2.0 ** -(math.log2(cp2) - 3)))
    slopes = [base ** i for i in range(1, cp2 + 1)]
    if cp2 != n_heads:
        extra_base = 2.0 ** (-(2.0 ** -(math.log2(2 * cp2) - 3)))
        slopes += [extra_base ** i for i in range(1, 2 * (n_heads - cp2) + 1, 2)]
    return jnp.asarray(slopes, jnp.float32)


def mha_reference(
    q: jax.Array,  # [B, Q, Hq, D]
    k: jax.Array,  # [B, Hkv, L, D]
    v: jax.Array,  # [B, Hkv, L, D]
    mask: jax.Array,  # [B, Q, L] bool
    scale: float,
    alibi: Optional[jax.Array] = None,  # [Hq] slopes
) -> jax.Array:
    """Masked GQA attention, fp32 softmax/accumulation. Returns [B, Q, Hq, D]."""
    B, Qn, Hq, D = q.shape
    Hkv = k.shape[1]
    G = Hq // Hkv
    qg = q.transpose(0, 2, 1, 3).reshape(B, Hkv, G * Qn, D)
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", qg, k, preferred_element_type=jnp.float32
    ) * scale
    scores = scores.reshape(B, Hkv, G, Qn, -1)
    if alibi is not None:
        # per-KEY absolute bias slopes[h] * j — equal to HF's relative form
        # up to a per-row constant, which softmax cancels
        j = jnp.arange(scores.shape[-1], dtype=jnp.float32)
        scores = scores + (
            alibi.reshape(Hkv, G)[None, :, :, None, None] * j[None, None, None, None, :]
        )
    scores = jnp.where(mask[:, None, None], scores, NEG_INF)
    p = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bhgqk,bhkd->bhgqd", p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    Dv = v.shape[-1]  # may differ from the K/Q head dim (MLA)
    out = out.transpose(0, 3, 1, 2, 4).reshape(B, Qn, Hq, Dv)
    return out.astype(q.dtype)


def paged_attention_ref(
    q: jax.Array,  # [B, Q, Hq, D]
    k_pages: jax.Array,  # [n_pages, page_size, Hkv*D] (folded)
    v_pages: jax.Array,
    page_tables: jax.Array,  # [B, P]
    start_lens: jax.Array,  # [B]
    qmask: jax.Array,  # [B, Q, Q]
    scale: float,
    k_scale: Optional[jax.Array] = None,
    v_scale: Optional[jax.Array] = None,
    mask: Optional[jax.Array] = None,  # precomputed [B, Q, L] (layer-invariant)
    v_dim: Optional[int] = None,  # V head dim when it differs (MLA)
    alibi: Optional[jax.Array] = None,  # [Hq] ALiBi slopes (bloom family)
) -> jax.Array:
    """Gather-then-attend reference. In-step tokens must already be written."""
    from painlessinferenceacceleration_tpu.engine.cache import gather_kv_pages

    D = q.shape[-1]
    if v_dim is None:
        v_dim = D
    kc = gather_kv_pages(k_pages, page_tables, D, k_scale, q.dtype)  # [B,H,L,D]
    vc = gather_kv_pages(v_pages, page_tables, v_dim, v_scale, q.dtype)
    if mask is None:
        mask = attention_mask(start_lens, qmask, kc.shape[2])
    return mha_reference(q, kc, vc, mask, scale, alibi)


def causal_qmask(q_len: int) -> jax.Array:
    """Lower-triangular in-step mask (prefill chunks)."""
    i = jnp.arange(q_len)
    return i[:, None] >= i[None, :]
