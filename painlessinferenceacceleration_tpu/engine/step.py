"""Jit-compiled engine steps: chunked prefill and unified decode/verify.

The reference builds three batch modes (prefill / decode / spec —
flood/utils/batch.py:174,382,484) and verifies drafts either on CPU
(lookahead/common/pretrained_model.py:827-875) or in a Triton kernel
(flood/ops/draft.py:405-543 verify_draft + :546-570 update_draft_cache).

TPU re-design:
- one jitted ``prefill_step`` (B requests x chunk tokens, causal mask,
  last-token logits only — mirroring flood's logit_indices cutoff,
  flood/models/scaffold.py:424-427),
- one jitted ``verify_step`` that *is* plain decode when Q=1: forward over
  [B, Q] in-step tokens under a tree mask, greedy acceptance walk along the
  draft trie (lax.while_loop, on device — no host sync), and fused KV
  compaction of accepted branch rows (gather->scatter on tail pages).
- KV buffers are donated: the arena updates in place across steps.

Shapes are static per (B, Q) bucket; the scheduler pads into buckets
(the reference rounds batch sizes the same way — flood/facade/llm.py:1858).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from painlessinferenceacceleration_tpu.config import ModelConfig
from painlessinferenceacceleration_tpu.engine.cache import (
    compact_kv_tail,
    move_kv_rows,
)
from painlessinferenceacceleration_tpu.layers.linear import QuantSpec
from painlessinferenceacceleration_tpu.models.base import (
    logits_from_hidden,
    transformer_hidden,
)


@functools.partial(
    jax.jit, static_argnames=("cfg", "spec"), donate_argnames=("kv",)
)
def prefill_step(
    params: dict,
    kv: dict,
    cfg: ModelConfig,
    tokens: jax.Array,  # [B, C] int32 (padded chunk)
    start_lens: jax.Array,  # [B] committed length before this chunk
    chunk_lens: jax.Array,  # [B] valid tokens in this chunk
    page_tables: jax.Array,  # [B, P]
    spec: Optional[QuantSpec] = None,
    slot_ids: Optional[jax.Array] = None,
    mm_embeds: Optional[jax.Array] = None,  # [B, M, E] multimodal embeddings
    mm_pos: Optional[jax.Array] = None,  # [B, M] prompt positions (-1 pad)
    glm_ids: Optional[jax.Array] = None,  # [B, 2] (prompt_len_eff, mask_pos)
) -> Tuple[dict, jax.Array, jax.Array]:
    """Process one prompt chunk per request; returns (kv, next_tokens [B],
    last_logits [B, V]). next_tokens is meaningful only on the final chunk.

    mm_embeds/mm_pos splice precomputed (image) embeddings over the token
    embeddings at the given prompt positions during chunked prefill —
    reference: flood get_emb llm.py:2033-2040 + emb_idx windows
    scaffold.py:571-578, batch.py:307-327.

    glm_ids enables the AntGLM prefix-LM window (bidirectional attention
    within the prompt — the tokenizer-built mask, tokenization_glm.py:
    310-316) and the 2D position scheme (models/base.py glm_2d)."""
    B, C = tokens.shape
    pos = start_lens[:, None] + jnp.arange(C, dtype=jnp.int32)[None, :]
    i = jnp.arange(C, dtype=jnp.int32)
    qmask = (i[:, None] >= i[None, :])[None].repeat(B, axis=0)
    causal_window = True
    if cfg.prefix_lm and glm_ids is not None:
        # any in-window query also sees window keys inside the prompt
        qmask = qmask | (pos[:, None, :] < glm_ids[:, :1, None])
        causal_window = False  # not pure lower-triangular: no prefill kernel
    valid = i[None, :] < chunk_lens[:, None]
    embed_override = None
    if mm_embeds is not None:
        local = mm_pos - start_lens[:, None]
        ok = (local >= 0) & (local < C) & (mm_pos >= 0)
        local = jnp.where(ok, local, C)  # out of range -> dropped
        embed_override = (local, mm_embeds)
    h, kv = transformer_hidden(
        params, cfg, kv, tokens, pos, page_tables, start_lens, qmask, valid,
        spec, slot_ids, embed_override, causal_window=causal_window,
        glm_ids=glm_ids,
    )
    # logits only for each request's last valid token (logit_indices cutoff)
    last = jnp.clip(chunk_lens - 1, 0, C - 1)
    h_last = jnp.take_along_axis(h, last[:, None, None], axis=1)  # [B,1,E]
    logits = logits_from_hidden(params, cfg, h_last, spec)[:, 0]  # [B,V]
    next_tokens = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return kv, next_tokens, logits


def _accept_walk(greedy: jax.Array, tokens: jax.Array, parents: jax.Array):
    """Greedy acceptance walk along one request's draft tree.

    greedy/tokens/parents: [Q]. Node 0 is the root (last committed token);
    node s>0 is a draft token whose parent is ``parents[s]`` (pad nodes use
    parents=-2 so they never match). Returns (out [Q] emitted tokens,
    n_out scalar, path [Q] accepted in-step node indices).

    Device-side equivalent of the reference's CPU verification loop
    (pretrained_model.py:827-860) / Triton verify_draft (draft.py:405-543).
    Terminates because a matched child index is strictly greater than its
    parent (DFS ravel order), so at most Q iterations.
    """
    Q = greedy.shape[0]
    out0 = jnp.zeros((Q,), jnp.int32)
    path0 = jnp.zeros((Q,), jnp.int32)

    def cond(st):
        return st[0]

    def body(st):
        going, cur, k, out, path = st
        nxt = greedy[cur]
        out = out.at[k].set(nxt)
        match = (parents == cur) & (tokens == nxt)
        found = jnp.any(match)
        s = jnp.argmax(match).astype(jnp.int32)
        path = jnp.where(found, path.at[k].set(s), path)
        return (found, jnp.where(found, s, cur), k + 1, out, path)

    going, cur, k, out, path = jax.lax.while_loop(
        cond, body, (jnp.bool_(True), jnp.int32(0), jnp.int32(0), out0, path0)
    )
    return out, k, path


@functools.partial(
    jax.jit, static_argnames=("cfg", "spec"), donate_argnames=("kv",)
)
def score_step(
    params: dict,
    kv: dict,
    cfg: ModelConfig,
    tokens: jax.Array,  # [B, C] padded chunk (prompt + target tokens)
    start_lens: jax.Array,  # [B]
    chunk_lens: jax.Array,  # [B]
    page_tables: jax.Array,  # [B, P]
    spec: Optional[QuantSpec] = None,
    boundary_next: Optional[jax.Array] = None,  # [B] first token of next chunk
) -> Tuple[dict, jax.Array]:
    """Prefill chunk that also returns per-position next-token logprobs
    ``lp[b, t] = log P(tokens[b, t+1] | ...)`` — the PPL-scoring / option-
    ranking mode (reference: Req.target_ids request.py:57 + sampler.py:92-137
    targeting). The last position scores ``boundary_next`` (the next chunk's
    first token — chunked scoring matches the reference's iterate_target,
    flood request.py:57), or 0 when absent."""
    from painlessinferenceacceleration_tpu.models.base import (
        logits_from_hidden,
        transformer_hidden,
    )

    B, C = tokens.shape
    pos = start_lens[:, None] + jnp.arange(C, dtype=jnp.int32)[None, :]
    i = jnp.arange(C, dtype=jnp.int32)
    qmask = (i[:, None] >= i[None, :])[None].repeat(B, axis=0)
    valid = i[None, :] < chunk_lens[:, None]
    h, kv = transformer_hidden(
        params, cfg, kv, tokens, pos, page_tables, start_lens, qmask, valid, spec
    )
    logits = logits_from_hidden(params, cfg, h, spec)  # [B, C, V]
    logp = jax.nn.log_softmax(logits, axis=-1)
    if boundary_next is None:
        boundary_next = jnp.zeros((B,), jnp.int32)
    nxt = jnp.concatenate([tokens[:, 1:], jnp.zeros((B, 1), jnp.int32)], axis=1)
    last = jnp.clip(chunk_lens - 1, 0, C - 1)
    nxt = nxt.at[jnp.arange(B), last].set(boundary_next)
    tlp = jnp.take_along_axis(logp, nxt[..., None], axis=-1)[..., 0]
    return kv, tlp


def _commit_linear(kv, chain, n_acc, active, slot_ids, Q):
    """Fold accepted-chain features into linear-attn states (in-graph).
    ``chain[:, p]`` = window column of the p-th committed node."""
    from painlessinferenceacceleration_tpu.models.linear_attn import (
        commit_linear_states,
    )

    B = chain.shape[0]
    n_eff = jnp.where(active, n_acc, 0)
    keep = (jnp.arange(chain.shape[1])[None] < n_eff[:, None]).astype(jnp.float32)
    acc = jnp.zeros((B, Q), jnp.float32)
    acc = acc.at[jnp.arange(B)[:, None], chain].max(keep)
    sid = slot_ids if slot_ids is not None else jnp.arange(B, dtype=jnp.int32)
    return commit_linear_states(kv, acc, n_eff, sid)


def verify_core(
    params: dict,
    kv: dict,
    cfg: ModelConfig,
    tokens: jax.Array,  # [B, Q]: col 0 = last committed token, cols 1.. = draft
    positions: jax.Array,  # [B, Q]: ctx + node depth
    qmask: jax.Array,  # [B, Q, Q] bool ancestor matrix (row t = visible nodes)
    parents: jax.Array,  # [B, Q] int32 (-1 root, -2 pad)
    page_tables: jax.Array,  # [B, P]
    ctx_lens: jax.Array,  # [B] committed length (root is written at this slot)
    active: jax.Array,  # [B] bool
    spec: Optional[QuantSpec] = None,
    slot_ids: Optional[jax.Array] = None,  # [B] engine slots (linear-attn state)
    glm_ids: Optional[jax.Array] = None,  # [B, 2] (AntGLM 2D positions)
) -> Tuple[dict, jax.Array, jax.Array]:
    """Forward + verify + KV compaction (un-jitted core; embeddable in
    larger jitted loops like engine/multistep.py). Returns (kv,
    out_tokens [B, Q], n_accepted [B]). Plain decode is Q=1, trivial mask."""
    B, Q = tokens.shape
    node_valid = parents > -2
    valid = node_valid & active[:, None]
    h, kv = transformer_hidden(
        params, cfg, kv, tokens, positions, page_tables, ctx_lens, qmask,
        valid, spec, slot_ids, None, cfg.linear_attention, glm_ids=glm_ids,
    )
    logits = logits_from_hidden(params, cfg, h, spec)  # [B, Q, V]
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    out_tokens, n_acc, path = jax.vmap(_accept_walk)(greedy, tokens, parents)

    if cfg.linear_attention:
        # accepted nodes form the root path: col 0 + path[:, :n_acc-1]
        chain = jnp.concatenate(
            [jnp.zeros((B, 1), jnp.int32), path[:, : Q - 1]], axis=1
        )[:, :Q]
        kv = _commit_linear(kv, chain, n_acc, active, slot_ids, Q)

    if Q > 1:
        # compact accepted branch rows: in-step node path[i] -> slot ctx+1+i
        n_edges = jnp.where(active, n_acc - 1, 0)
        kv["k"] = compact_kv_tail(
            kv["k"], page_tables, ctx_lens, path[:, : Q - 1], n_edges, Q, active
        )
        kv["v"] = compact_kv_tail(
            kv["v"], page_tables, ctx_lens, path[:, : Q - 1], n_edges, Q, active
        )
        for sk in ("k_tok_scale", "v_tok_scale"):  # fp8_tok scales move too
            if sk in kv:
                kv[sk] = compact_kv_tail(
                    kv[sk], page_tables, ctx_lens, path[:, : Q - 1], n_edges,
                    Q, active, force_jnp=True,
                )
    n_acc = jnp.where(active, n_acc, 0)
    return kv, out_tokens, n_acc


@functools.partial(
    jax.jit, static_argnames=("cfg", "spec"), donate_argnames=("kv",)
)
def verify_step(
    params: dict,
    kv: dict,
    cfg: ModelConfig,
    tokens: jax.Array,
    positions: jax.Array,
    qmask: jax.Array,
    parents: jax.Array,
    page_tables: jax.Array,
    ctx_lens: jax.Array,
    active: jax.Array,
    spec: Optional[QuantSpec] = None,
    slot_ids: Optional[jax.Array] = None,
    glm_ids: Optional[jax.Array] = None,
) -> Tuple[dict, jax.Array, jax.Array]:
    """Jitted single verify step (see verify_core)."""
    return verify_core(
        params, kv, cfg, tokens, positions, qmask, parents, page_tables,
        ctx_lens, active, spec, slot_ids, glm_ids,
    )


def verify_parallel_core(
    params: dict,
    kv: dict,
    cfg: ModelConfig,
    tokens: jax.Array,  # [B, Q] (Q = 1 + R*L, block layout from device tables)
    positions: jax.Array,
    qmask: jax.Array,
    parents: jax.Array,
    page_tables: jax.Array,
    ctx_lens: jax.Array,
    active: jax.Array,
    R: int,
    L: int,
    spec: Optional[QuantSpec] = None,
    slot_ids: Optional[jax.Array] = None,
    sampling: Optional[tuple] = None,  # (temperature, top_k, top_p, min_p, seeds)
    glm_ids: Optional[jax.Array] = None,  # [B, 2] (AntGLM 2D positions)
    teacher: Optional[jax.Array] = None,  # [B, W] teacher-forced target stream
) -> Tuple[dict, jax.Array, jax.Array]:
    """verify_core specialised to the parallel-branch draft layout
    (lookahead/device_tables.py build_tree_inputs): acceptance along a
    branch is a cumulative product of per-node matches, so the sequential
    acceptance walk becomes pure vector ops — measurably faster inside the
    multi-step device loop (the general walk is a lax.while_loop of ~Q tiny
    ops per request).

    ``sampling``: per-row (temperature, top_k, top_p, min_p, seeds) arrays.
    The verification target at each node is then the token SAMPLED from the
    filtered distribution with counter-mode randomness keyed on the node's
    stream position — exactly what the AR decode loop would draw there, so
    sampled speculative decoding reproduces the AR stream bit-for-bit
    (reference sampled verification: pretrained_model.py:827-860). Rows with
    temperature 0 verify greedily as before.

    Requires distinct first tokens across branches (the tables guarantee
    this via way-dedup on (prefix, branch[0]) — device_tables.py).
    """
    B, Q = tokens.shape
    assert Q == 1 + R * L, (Q, R, L)
    node_valid = parents > -2
    valid = node_valid & active[:, None]
    h, kv = transformer_hidden(
        params, cfg, kv, tokens, positions, page_tables, ctx_lens, qmask,
        valid, spec, slot_ids, None, cfg.linear_attention, glm_ids=glm_ids,
    )
    logits = logits_from_hidden(params, cfg, h, spec)
    if teacher is not None:
        # Teacher-forced replay (acceptance-honest benchmarking): the target
        # continuation of the node at stream position p is the CORPUS token
        # at p+1, not the model's argmax — the full forward still runs, so
        # the spec-step cost is real while accepted/step reflects how often
        # trie drafts match real text (the reference's measured edls of 2-4
        # on Dolly/GSM-8k, lookahead/README.md:62-81 + perf_check).
        W = teacher.shape[1]
        tgt = jnp.clip(positions + 1, 0, W - 1)
        greedy = jnp.take_along_axis(teacher, tgt, axis=1).astype(jnp.int32)
    elif sampling is None:
        greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [B, Q]
    else:
        from painlessinferenceacceleration_tpu.ops.sample import sample_tokens_at

        temperature, top_k, top_p, min_p, seeds = sampling

        def rep(a):  # [B] -> [B*Q] per-node broadcast
            return jnp.repeat(a, Q, axis=0)

        greedy = sample_tokens_at(
            logits.reshape(B * Q, -1),
            rep(seeds),
            (positions + 1).reshape(B * Q),
            rep(temperature), rep(top_k), rep(top_p),
            rep(min_p) if min_p is not None else None,
        ).reshape(B, Q)

    # match[s] = draft token s equals greedy continuation of its parent
    par = jnp.clip(parents, 0, Q - 1)
    g_par = jnp.take_along_axis(greedy, par, axis=1)
    match = (tokens == g_par) & node_valid  # [B, Q]
    mb = match[:, 1:].reshape(B, R, L)
    acc_prefix = jnp.cumprod(mb, axis=2)  # [B, R, L]
    edges_per_branch = acc_prefix.sum(axis=2)  # [B, R]
    best = jnp.argmax(edges_per_branch, axis=1).astype(jnp.int32)  # [B]
    n_edges = jnp.take_along_axis(edges_per_branch, best[:, None], axis=1)[:, 0]
    n_acc = (n_edges + 1).astype(jnp.int32)

    # emitted tokens: out[0] = greedy[root]; out[i] = greedy[node(best, i-1)]
    node_ids = 1 + best[:, None] * L + jnp.arange(L)[None, :]  # [B, L]
    if cfg.linear_attention:
        chain = jnp.concatenate(
            [jnp.zeros((B, 1), jnp.int32), node_ids], axis=1
        )  # [B, 1+L] committed-node window columns
        kv = _commit_linear(kv, chain, n_acc, active, slot_ids, Q)
    g_nodes = jnp.take_along_axis(greedy, node_ids, axis=1)  # [B, L]
    out_tokens = jnp.concatenate([greedy[:, :1], g_nodes], axis=1)  # [B, L+1]
    if out_tokens.shape[1] < Q:
        out_tokens = jnp.pad(out_tokens, ((0, 0), (0, Q - out_tokens.shape[1])))

    # compact accepted branch rows: node(best, i) sits at slot
    # ctx + 1 + best*L + i -> moves to ctx + 1 + i (page-window rewrite)
    i = jnp.arange(L, dtype=jnp.int32)[None, :]
    path = 1 + best[:, None] * L + i  # in-step offsets of the accepted chain
    eff_edges = jnp.where(active & (best > 0), n_edges, 0)
    kv["k"] = compact_kv_tail(
        kv["k"], page_tables, ctx_lens, path, eff_edges, Q, active
    )
    kv["v"] = compact_kv_tail(
        kv["v"], page_tables, ctx_lens, path, eff_edges, Q, active
    )
    for sk in ("k_tok_scale", "v_tok_scale"):  # fp8_tok scales move too
        if sk in kv:
            kv[sk] = compact_kv_tail(
                kv[sk], page_tables, ctx_lens, path, eff_edges, Q, active,
                force_jnp=True,
            )
    n_acc = jnp.where(active, n_acc, 0)
    return kv, out_tokens, n_acc


def decode_inputs(last_tokens: jax.Array, ctx_lens: jax.Array):
    """Build trivial verify inputs for plain decode (Q=1)."""
    B = last_tokens.shape[0]
    tokens = last_tokens[:, None]
    positions = ctx_lens[:, None]
    qmask = jnp.ones((B, 1, 1), bool)
    parents = jnp.full((B, 1), -1, jnp.int32)
    return tokens, positions, qmask, parents
