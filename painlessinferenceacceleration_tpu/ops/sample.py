"""Token sampling: greedy fast-path + fused temperature/top-k/top-p/min-p.

Reference: flood/ops/sample.py:13-99 (Triton ``sample_from_logit``) and
flood/layers/sampler.py (greedy argmax fast path :31, batched GPU sampling
:76-90, PPL target scoring :92-137). On TPU the whole filter chain is a few
vectorized ops that XLA fuses into the logits epilogue — no custom kernel
needed; what matters is staying inside the jitted step (no host RNG).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG = -1e30


def filtered_logits(
    logits: jax.Array,  # [B, V] fp32
    temperature: jax.Array,  # [B] (0 => greedy; clamped for the scale)
    top_k: jax.Array,  # [B] int32 (0 => off)
    top_p: jax.Array,  # [B] (1.0 => off)
    min_p: Optional[jax.Array] = None,  # [B] (0 => off)
) -> jax.Array:
    """Temperature-scaled logits with the HF warper chain applied
    SEQUENTIALLY (top-k first, then top-p over the renormalized filtered
    distribution, then min-p) — matching HF/reference semantics
    (flood/layers/sampler.py:76-90, flood/ops/sample.py:13-99)."""
    B, V = logits.shape
    t = jnp.maximum(temperature, 1e-6)[:, None]
    x = logits / t

    # top-k: mask everything below the k-th largest
    sorted_x = jnp.sort(x, axis=-1)[:, ::-1]  # descending
    k_eff = jnp.where(top_k > 0, top_k, V)
    k_idx = jnp.clip(k_eff - 1, 0, V - 1)
    kth = jnp.take_along_axis(sorted_x, k_idx[:, None], axis=1)
    x = jnp.where(x < kth, NEG, x)

    # top-p (nucleus) over the top-k-filtered distribution: the sorted order
    # is unchanged by the mask, so mask the sorted copy by column rank
    col = jnp.arange(V, dtype=jnp.int32)[None, :]
    sorted_masked = jnp.where(col < k_eff[:, None], sorted_x, NEG)
    probs_sorted = jax.nn.softmax(sorted_masked, axis=-1)
    cum = jnp.cumsum(probs_sorted, axis=-1)
    # threshold value: smallest logit still inside the nucleus
    inside = cum - probs_sorted < top_p[:, None]
    # keep every logit >= the smallest one still inside the nucleus
    cutoff = jnp.min(jnp.where(inside, sorted_masked, -NEG), axis=-1, keepdims=True)
    x = jnp.where(x < cutoff, NEG, x)

    if min_p is not None:
        p = jax.nn.softmax(x, axis=-1)
        pmax = jnp.max(p, axis=-1, keepdims=True)
        x = jnp.where(p < min_p[:, None] * pmax, NEG, x)
    return x


def sample_tokens(
    logits: jax.Array,  # [B, V] fp32
    key: jax.Array,  # PRNG key
    temperature: jax.Array,  # [B] (0 => greedy)
    top_k: jax.Array,  # [B] int32 (0 => off)
    top_p: jax.Array,  # [B] (1.0 => off)
    min_p: Optional[jax.Array] = None,  # [B] (0 => off)
) -> jax.Array:
    """Per-row parameterized sampling; rows with temperature 0 take greedy.

    All rows are computed with the same vector ops (masks select behavior),
    so one jit serves any mix of greedy/sampled requests in a batch — the
    reference splits the batch into greedy/sampled index sets instead
    (sampler.py:60-90).
    """
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    x = filtered_logits(logits, temperature, top_k, top_p, min_p)
    sampled = jax.random.categorical(key, x, axis=-1).astype(jnp.int32)
    return jnp.where(temperature <= 0.0, greedy, sampled)


def sample_tokens_at(
    logits: jax.Array,  # [B, V] fp32
    seeds: jax.Array,  # [B] int32 per-request seeds
    positions: jax.Array,  # [B] int32 stream position of the sampled token
    temperature: jax.Array,  # [B] (0 => greedy)
    top_k: jax.Array,  # [B]
    top_p: jax.Array,  # [B]
    min_p: Optional[jax.Array] = None,  # [B]
) -> jax.Array:
    """Counter-mode sampling: the randomness for the token at stream
    position ``p`` of a request is ``fold_in(PRNGKey(seed), p)`` — a pure
    function of (seed, position). This is what makes SAMPLED speculative
    decoding lossless: the AR decode loop and the lookahead verify step draw
    the token at a given position from identical randomness, so acceptance
    (draft == sampled target) reproduces the AR stream exactly (the
    reference's sampled verification walk, pretrained_model.py:827-860)."""
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    x = filtered_logits(logits, temperature, top_k, top_p, min_p)

    def draw(row, seed, pos):
        k = jax.random.fold_in(jax.random.PRNGKey(seed), pos)
        return jax.random.categorical(k, row)

    sampled = jax.vmap(draw)(x, seeds, positions).astype(jnp.int32)
    return jnp.where(temperature <= 0.0, greedy, sampled)


def apply_repetition_penalty(
    logits: jax.Array,  # [B, V]
    seen_mask: jax.Array,  # [B, V] bool: token appeared in prompt/output
    penalty: jax.Array,  # [B] (1.0 => off)
) -> jax.Array:
    """HF-semantics repetition penalty: seen tokens' logits are divided by
    the penalty when positive, multiplied when negative (the reference
    applies HF logits processors in its generate fork —
    pretrained_model.py:348-360; BASELINE.json names repetition_penalty)."""
    p = penalty[:, None]
    pen = jnp.where(logits > 0, logits / p, logits * p)
    return jnp.where(seen_mask, pen, logits)


def target_logprobs(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """log P(target | context) per position — PPL-scoring / option-ranking
    mode (reference sampler.py:92-137 with Req.target_ids, request.py:57).

    logits: [T, V] for positions preceding each target; targets: [T].
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    return jnp.take_along_axis(logp, targets[:, None], axis=1)[:, 0]
