"""FP8 embedding table with dequant-on-gather.

Reference: flood/flood/layers/embedding.py:9-109 — ``NativeEmbedding`` plus
``Fp8Embedding`` (the facade's optional FP8 retype of the embedding,
flood/facade/llm.py:318-335) which stores the table in float8 and
dequantizes only the gathered rows.

TPU design: the table is quantized per vocab ROW (each row scaled by its
own amax) — a gather then reads one fp8 row + one fp32 scalar per token and
the dequant is a fused multiply on [tokens, E], never on the whole table.
Row-wise scales also make the tied LM head exact-ish: logits columns each
carry a single scale, applied after the matmul.
"""

from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp

from painlessinferenceacceleration_tpu.layers.linear import FP8_MAX, QuantSpec

Embedding = Union[jax.Array, dict]


def make_embedding(w: jax.Array, quant: Optional[QuantSpec] = None) -> Embedding:
    """Quantize an embedding table [V, E] to fp8 with per-row scales.

    Only fp8-class specs retype the embedding (the reference never int-
    quantizes it); everything else passes the table through unchanged.
    """
    if quant is None or quant.wfmt != "fp8" or isinstance(w, dict):
        return w
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=1)  # [V]
    s = jnp.maximum(amax / FP8_MAX, 1e-8)
    q = (w.astype(jnp.float32) / s[:, None]).astype(jnp.float8_e4m3fn)
    return {"q": q, "s": s}


def embed_lookup(emb: Embedding, tokens: jax.Array, dtype) -> jax.Array:
    """Gather token rows; fp8 tables dequantize only the gathered rows."""
    if isinstance(emb, dict):
        rows = jnp.take(emb["q"], tokens, axis=0).astype(jnp.float32)
        s = jnp.take(emb["s"], tokens, axis=0)
        return (rows * s[..., None]).astype(dtype)
    return jnp.take(emb, tokens, axis=0).astype(dtype)


def embed_logits(emb: Embedding, h: jax.Array) -> jax.Array:
    """Tied LM head: h @ table^T, fp32 logits. The per-row scales become
    per-VOCAB-COLUMN factors applied after the matmul, so the fp8 table is
    never materialized in bf16 beyond the matmul operand stream."""
    if isinstance(emb, dict):
        out = jnp.matmul(
            h, emb["q"].T.astype(h.dtype), preferred_element_type=jnp.float32
        )
        return out * emb["s"][None, None, :]
    return jnp.matmul(h, emb.T.astype(h.dtype), preferred_element_type=jnp.float32)
