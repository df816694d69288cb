"""Linear-attention hybrid decoders (Ring / Bailing-linear class).

Reference: flood/ops/seg_la.py (segment linear attention: prefill kernels
with K/V dim splitting, decode kernel, recurrent state carried in fixed-size
cache slots with per-head decay scales), flood models
modeling_bailing_moe_linear_v2.py:347-401 (rms-groupnorm-sigmoid output
gates), fixed-size state caches keyed by ``layer_group_size``
(flood/facade/llm.py:218-230): every ``layer_group_size``-th layer is full
(softmax) attention, the rest are linear with O(1) recurrent state.

TPU design — chunkwise-parallel linear attention with per-head scalar decay
λ_h (retention-style):

    out_i = Σ_{j<=i, same chunk} λ^(i-j) (q_i·k_j) v_j  +  λ^(i+1) q_i @ S
    S'    = λ^Lb S + Σ_j λ^(Lb-1-j) k_j v_j^T          (Lb = valid tokens)

The intra-chunk term is two MXU matmuls with a decay-mask Hadamard; the
recurrent state lives in the cache pytree as ``s: [n_linear_layers,
max_slots, H, D, D]`` indexed by the request's engine slot (the reference's
fix_size cache slots). Speculative verification over linear layers needs
branch-state replay (reference draft.py:573-660) and is deliberately not
wired yet — the engine gates lookahead off for these models.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from painlessinferenceacceleration_tpu.config import ModelConfig
from painlessinferenceacceleration_tpu.layers.linear import (
    QuantSpec,
    linear,
    make_linear,
)
from painlessinferenceacceleration_tpu.ops.rmsnorm import rms_group_norm_sigmoid


def n_linear_layers(cfg: ModelConfig) -> int:
    g = cfg.layer_group_size
    L = cfg.num_hidden_layers
    if g <= 0:
        return L
    return L - L // g  # every g-th layer (index % g == g-1) is full attention


def is_full_layer(cfg: ModelConfig, li: int) -> bool:
    g = cfg.layer_group_size
    return g > 0 and (li % g) == g - 1


def default_decays(H: int) -> jnp.ndarray:
    """Retention-style per-head decay ladder: λ_h = 1 - 2^(-5-h*3/H)."""
    h = jnp.arange(H, dtype=jnp.float32)
    return 1.0 - jnp.exp2(-5.0 - 3.0 * h / max(H - 1, 1))


def init_linear_layer(cfg: ModelConfig, key, dtype, spec: Optional[QuantSpec]) -> dict:
    E = cfg.hidden_size
    H, D = cfg.num_attention_heads, cfg.head_dim
    I = cfg.intermediate_size
    ks = jax.random.split(key, 5)
    std = 0.02

    def w(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * std).astype(dtype)

    p = {
        "input_ln": jnp.ones((E,), dtype),
        "post_ln": jnp.ones((E,), dtype),
        "wqkv": make_linear(w(ks[0], (E, 3 * H * D)), spec),  # no GQA: Hk = H
        "w_gate": make_linear(w(ks[1], (E, H * D)), spec),
        "out_norm": jnp.ones((H * D,), dtype),
        "decay": default_decays(H),
        "wo": make_linear(w(ks[2], (H * D, E)), spec),
        "wgu": make_linear(w(ks[3], (E, 2 * I)), spec),
        "wdown": make_linear(w(ks[4], (I, E)), spec),
    }
    if cfg.linear_qk_norm:  # bailing query/key_layernorm (per-head)
        p["q_norm"] = jnp.ones((D,), dtype)
        p["k_norm"] = jnp.ones((D,), dtype)
    return p


def linear_attn_block(
    lp: dict,
    cfg: ModelConfig,
    spec: Optional[QuantSpec],
    h: jax.Array,  # [B, C, E]
    state: jax.Array,  # [B, H, D, D] this layer's recurrent state (slot rows)
    chunk_lens: jax.Array,  # [B] valid tokens in this chunk
    depth: Optional[jax.Array] = None,  # [B, C] node depths (tree/draft mode)
    vis: Optional[jax.Array] = None,  # [B, C, C] ancestor-or-self visibility
    cos: Optional[jax.Array] = None,  # rope tables (cfg.linear_rope)
    sin: Optional[jax.Array] = None,
):
    """One linear-attention block.

    Chain mode (``depth`` is None): returns (output [B, C, E], new state,
    None) — the chunkwise-parallel recurrence over ``chunk_lens`` tokens.

    Tree/draft mode (``depth``+``vis`` given, for speculative verification —
    reference branch-state replay, flood/ops/draft.py:573-660): the window
    is a draft TREE; token i attends its ancestor path with decay
    λ^(depth_i - depth_j) plus λ^(depth_i+1) q_i @ S. The state is NOT
    updated (acceptance is unknown until after the forward); the silu'd
    (k, v) features are returned for ``commit_linear_states`` to fold the
    accepted chain into S afterwards — inside the same jit program."""
    B, C, E = h.shape
    H, D = cfg.num_attention_heads, cfg.head_dim
    qkv = linear(lp["wqkv"], h, spec, lp.get("bqkv"))
    xq = qkv[..., : H * D].reshape(B, C, H, D)
    xk = qkv[..., H * D : 2 * H * D].reshape(B, C, H, D)
    xv = qkv[..., 2 * H * D :].reshape(B, C, H, D)
    if cfg.linear_qk_norm:  # bailing query/key_layernorm (per-head)
        from painlessinferenceacceleration_tpu.ops.rmsnorm import rms_norm

        xq = rms_norm(xq, lp["q_norm"], cfg.rms_norm_eps)
        xk = rms_norm(xk, lp["k_norm"], cfg.rms_norm_eps)
    if cfg.linear_rope and cos is not None:
        # rope before the feature map (the reference rotates q/k of linear
        # layers too; the recurrent state then accumulates rotated keys)
        from painlessinferenceacceleration_tpu.ops.rope import apply_rope

        xq = apply_rope(xq, cos, sin, cfg.rope_interleaved)
        xk = apply_rope(xk, cos, sin, cfg.rope_interleaved)
    xq = xq.transpose(0, 2, 1, 3)
    xk = xk.transpose(0, 2, 1, 3)
    xv = xv.transpose(0, 2, 1, 3)
    # silu feature map keeps the kernel positive-ish (common GLA choice;
    # the reference's use_linear_silu)
    xq = jax.nn.silu(xq.astype(jnp.float32))
    xk = jax.nn.silu(xk.astype(jnp.float32))
    xv = xv.astype(jnp.float32)

    lam = jnp.clip(lp["decay"].astype(jnp.float32), 1e-4, 1.0 - 1e-6)  # [H]
    loglam = jnp.log(lam)  # [H]

    from painlessinferenceacceleration_tpu.ops.linear_attention import (
        linear_attention_chunk,
        linear_attention_tree,
        use_pallas_linear_attention,
        use_pallas_linear_tree,
    )

    if depth is None and use_pallas_linear_attention(C, D):
        out, new_state = linear_attention_chunk(
            xq, xk, xv, state.astype(jnp.float32), chunk_lens, loglam
        )
        new_state = new_state.astype(state.dtype)
        feats = None
    elif depth is not None and use_pallas_linear_tree(C, D):
        colmask = jnp.any(vis, axis=1)[:, None, :, None]
        xk = xk * colmask  # dead columns also masked out of the feats
        xv = xv * colmask
        out = linear_attention_tree(
            xq, xk, xv, state.astype(jnp.float32), depth, vis, loglam
        )
        new_state = state
        feats = (xk, xv)
    else:
        if depth is None:
            i = jnp.arange(C, dtype=jnp.float32)
            d_i = jnp.broadcast_to(i[None], (B, C))
            visible = ((i[:, None] >= i[None, :])[None]
                       & (jnp.arange(C)[None] < chunk_lens[:, None])[:, None, :])
        else:
            d_i = depth.astype(jnp.float32)
            visible = vis
        xk = xk * jnp.any(visible, axis=1)[:, None, :, None]  # mask dead cols
        xv = xv * jnp.any(visible, axis=1)[:, None, :, None]

        # in-window: A[b,h,i,j] = (q_i . k_j) * lam^(d_i-d_j) for visible j
        qk = jnp.einsum(
            "bhid,bhjd->bhij", xq, xk, preferred_element_type=jnp.float32
        )
        dmat = jnp.exp(
            loglam[None, :, None, None]
            * (d_i[:, None, :, None] - d_i[:, None, None, :])
        )
        A = qk * jnp.where(visible[:, None], dmat, 0.0)
        out = jnp.einsum(
            "bhij,bhjd->bhid", A, xv, preferred_element_type=jnp.float32
        )

        # carried state: lam^(d_i+1) * q_i @ S_prev
        powi = jnp.exp(loglam[None, :, None] * (d_i[:, None, :] + 1.0))
        inter = jnp.einsum(
            "bhid,bhde->bhie", xq, state.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        out = out + inter * powi[..., None]

        if depth is None:
            # state update: S' = lam^Lb * S + sum_j lam^(Lb-1-j) k_j v_j^T
            Lb = chunk_lens.astype(jnp.float32)  # [B]
            i = jnp.arange(C, dtype=jnp.float32)
            valid = (jnp.arange(C)[None] < chunk_lens[:, None])  # [B, C]
            powd = jnp.exp(
                loglam[None, :, None]
                * (Lb[:, None, None] - 1.0 - i[None, None, :])
            )
            kw = xk * jnp.where(valid[:, None], powd, 0.0)[..., None]
            s_add = jnp.einsum(
                "bhjd,bhje->bhde", kw, xv, preferred_element_type=jnp.float32
            )
            s_decay = jnp.exp(loglam[None, :] * Lb[:, None])[..., None, None]
            new_state = (state.astype(jnp.float32) * s_decay + s_add).astype(
                state.dtype
            )
            feats = None
        else:
            new_state = state
            feats = (xk, xv)

    # gated grouped-norm output (reference RMSGroupNormSigmoid)
    out = out.transpose(0, 2, 1, 3).reshape(B, C, H * D).astype(h.dtype)
    gate = linear(lp["w_gate"], h, spec)
    out = rms_group_norm_sigmoid(out, gate, lp["out_norm"], cfg.rms_norm_eps, H)
    out = linear(lp["wo"], out, spec, lp.get("bo"))
    return out, new_state, feats


def init_hybrid_params(
    cfg: ModelConfig, key, dtype=jnp.bfloat16, quant: Optional[QuantSpec] = None
) -> dict:
    """Random-init a hybrid model: per-layer dicts in a tuple (the irregular
    linear/full interleave doesn't stack into one lax.scan)."""
    from painlessinferenceacceleration_tpu.models.base import _init_layer

    keys = jax.random.split(key, cfg.num_hidden_layers + 2)
    layers = []
    for li in range(cfg.num_hidden_layers):
        if is_full_layer(cfg, li):
            lp = _init_layer(cfg, keys[li], dtype, quant)
        else:
            lp = init_linear_layer(cfg, keys[li], dtype, quant)
        if cfg.is_moe and li >= cfg.moe_layer_start:
            # bailing-linear-v2: MoE mlp on linear AND full layers
            from painlessinferenceacceleration_tpu.models.moe import (
                init_moe_layer,
            )

            lp.pop("wgu")
            lp.pop("wdown")
            lp.update(
                init_moe_layer(cfg, jax.random.fold_in(keys[li], 1), dtype, quant)
            )
        layers.append(lp)
    E = cfg.hidden_size
    params = {
        "embed": (
            jax.random.normal(keys[-1], (cfg.vocab_size, E)) * 0.02
        ).astype(dtype),
        "hybrid_layers": tuple(layers),
        "final_ln": jnp.ones((E,), dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = make_linear(
            (jax.random.normal(keys[-2], (E, cfg.vocab_size)) * 0.02).astype(dtype),
            quant,
        )
    return params


def hybrid_forward(
    params: dict,
    cfg: ModelConfig,
    kv: dict,
    tokens: jax.Array,  # [B, C]
    positions: jax.Array,
    page_tables: jax.Array,
    start_lens: jax.Array,
    qmask: jax.Array,
    valid,
    spec: Optional[QuantSpec],
    slot_ids: Optional[jax.Array],
    defer_state: bool = False,
    causal_window: bool = False,  # prefill: qmask is pure lower-triangular
) -> Tuple[jax.Array, dict]:
    """Forward over the interleaved linear/full layer pattern (python loop —
    per-layer structure is heterogeneous).

    ``defer_state``: speculative-verify mode — the window is a draft tree
    (depth = positions - start_lens, visibility = qmask); linear-layer
    states are NOT written. The per-layer (k, v) features are stashed in
    the returned cache under ``"_win"`` for commit_linear_states to fold
    the accepted chain in after acceptance is computed (in-graph)."""
    from painlessinferenceacceleration_tpu.models.base import _attn_block
    from painlessinferenceacceleration_tpu.ops.attention import attention_mask
    from painlessinferenceacceleration_tpu.ops.rmsnorm import rms_norm
    from painlessinferenceacceleration_tpu.ops.rope import dense_cos_sin

    B, C = tokens.shape
    from painlessinferenceacceleration_tpu.layers.embedding import embed_lookup

    h = embed_lookup(params["embed"], tokens, params["final_ln"].dtype)
    cos, sin = dense_cos_sin(cfg, positions)
    L_view = page_tables.shape[1] * kv["k"].shape[2]
    attn_mask = attention_mask(start_lens, qmask, L_view)
    if slot_ids is None:
        slot_ids = jnp.arange(B, dtype=jnp.int32)
    if valid is not None:
        chunk_lens = valid.sum(axis=1).astype(jnp.int32)
    else:
        chunk_lens = jnp.full((B,), C, jnp.int32)

    depth = vis = None
    if defer_state:
        depth = positions - start_lens[:, None]  # node depth in the tree
        col_ok = valid if valid is not None else jnp.ones((B, C), bool)
        vis = qmask & col_ok[:, None, :]

    kk, vv, s = kv["k"], kv["v"], kv["s"]
    full_idx = 0
    lin_idx = 0
    win_k, win_v, win_lam = [], [], []
    for li, lp in enumerate(params["hybrid_layers"]):
        hn = rms_norm(h, lp["input_ln"], cfg.rms_norm_eps)
        if is_full_layer(cfg, li):
            attn_out, kk, vv = _attn_block(
                lp, cfg, spec, hn, cos, sin, kk, vv,
                jnp.int32(full_idx), page_tables, start_lens, qmask, valid,
                None, attn_mask, causal_window=causal_window,
            )
            full_idx += 1
        else:
            state = s[lin_idx, slot_ids]  # [B, H, D, D]
            attn_out, new_state, feats = linear_attn_block(
                lp, cfg, spec, hn, state, chunk_lens, depth, vis,
                cos if cfg.linear_rope else None,
                sin if cfg.linear_rope else None,
            )
            if defer_state:
                win_k.append(feats[0])
                win_v.append(feats[1])
                win_lam.append(lp["decay"].astype(jnp.float32))
            else:
                # scatter-ADD the delta: padded batch rows alias slot 0 with
                # a no-op update (delta 0); adds commute, so the duplicate
                # index can't clobber the real row's update (a .set would)
                s = s.at[lin_idx, slot_ids].add(
                    (new_state - state).astype(s.dtype)
                )
            lin_idx += 1
        h = h + attn_out
        hn = rms_norm(h, lp["post_ln"], cfg.rms_norm_eps)
        if "moe_wgu" in lp:  # bailing-linear: MoE mlp on hybrid layers
            from painlessinferenceacceleration_tpu.models.moe import moe_block

            h = h + moe_block(lp, cfg, spec, hn)
        else:
            from painlessinferenceacceleration_tpu.models.base import _mlp_block

            h = h + _mlp_block(lp, cfg, spec, hn)
    new_kv = dict(kv)
    new_kv["k"], new_kv["v"], new_kv["s"] = kk, vv, s
    if defer_state:
        new_kv["_win"] = {
            "k": jnp.stack(win_k),  # [n_lin, B, H, C, D] fp32
            "v": jnp.stack(win_v),
            "lam": jnp.stack(win_lam),  # [n_lin, H]
            "depth": depth,
        }
    return h, new_kv


def commit_linear_states(
    kv: dict,
    accept_mask: jax.Array,  # [B, C] committed nodes (root + accepted chain)
    n_commit: jax.Array,  # [B] committed count this step (0 for inactive)
    slot_ids: jax.Array,  # [B]
) -> dict:
    """Fold the accepted chain into the recurrent states after speculative
    verification (reference branch-state replay, flood/ops/draft.py:573-660).

    The accepted nodes form a root path, so their tree depths are exactly
    the chain positions 0..n-1 and the chain update applies directly:
        S' = λ^n S + Σ_{j accepted} λ^(n-1-depth_j) k_j v_j^T
    Pops the ``"_win"`` stash written by ``hybrid_forward(defer_state=True)``."""
    kv = dict(kv)
    win = kv.pop("_win")
    wk, wv = win["k"], win["v"]  # [n_lin, B, H, C, D]
    loglam = jnp.log(jnp.clip(win["lam"], 1e-4, 1.0 - 1e-6))  # [n_lin, H]
    d = win["depth"].astype(jnp.float32)  # [B, C]
    n = n_commit.astype(jnp.float32)  # [B]

    # w[l,b,h,j] = λ_lh^(n_b-1-d_bj) for accepted j, else 0
    expo = (n[:, None] - 1.0 - d)[None, :, None, :]  # [1, B, 1, C]
    w = jnp.exp(loglam[:, None, :, None] * expo)
    w = w * accept_mask[None, :, None, :]
    s_add = jnp.einsum(
        "lbhjd,lbhje->lbhde", wk * w[..., None], wv,
        preferred_element_type=jnp.float32,
    )
    s_decay = jnp.exp(loglam[:, None, :] * n[None, :, None])  # [n_lin, B, H]
    s = kv["s"]
    cur = s[:, slot_ids].astype(jnp.float32)  # [n_lin, B, H, D, D]
    # scatter-ADD the delta (see hybrid_forward): inactive/padded rows have
    # n=0 and an empty accept mask, so their delta is exactly 0
    delta = cur * (s_decay[..., None, None] - 1.0) + s_add
    kv["s"] = s.at[:, slot_ids].add(delta.astype(s.dtype))
    return kv
