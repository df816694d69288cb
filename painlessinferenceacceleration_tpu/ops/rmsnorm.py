"""RMSNorm (+ grouped / gated variants).

Reference: flood/csrc/layernorm/rmsnorm.cu (fused CUDA rmsnorm),
flood/ops/norm.py:14-141 (RMSNorm / RMSGroupNorm / RMSGroupNormSigmoid),
lookahead/csrc/triton/rms_norm.py.

On TPU, XLA fuses the jnp formulation into neighbouring ops already; a Pallas
kernel is provided for benchmark parity and for fusion with quantized matmul
epilogues.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Reference rmsnorm: fp32 accumulation, cast back to x.dtype.

    Matches HF Llama numerics (variance in fp32) so parity tests against
    transformers hold bit-tight in fp32.
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(var + eps)
    return (xf * weight.astype(jnp.float32)).astype(dtype)


def layer_norm(
    x: jax.Array, weight: jax.Array, bias: jax.Array, eps: float = 1e-5
) -> jax.Array:
    """Classic LayerNorm (gpt2/bloom families; the reference inherits HF's
    nn.LayerNorm in those forks). fp32 statistics, cast back to x.dtype."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = xf * weight.astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(dtype)


def rms_group_norm(
    x: jax.Array, weight: jax.Array, eps: float, num_groups: int
) -> jax.Array:
    """Grouped rmsnorm over the last dim split into ``num_groups`` groups.

    Reference: flood/ops/norm.py:32 (RMSGroupNorm, used by linear-attention
    hybrid "Ring" models).
    """
    dtype = x.dtype
    *lead, d = x.shape
    xf = x.astype(jnp.float32).reshape(*lead, num_groups, d // num_groups)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(*lead, d)
    return (xf * weight.astype(jnp.float32)).astype(dtype)


def rms_group_norm_sigmoid(
    x: jax.Array, gate: jax.Array, weight: jax.Array, eps: float, num_groups: int
) -> jax.Array:
    """Gated grouped rmsnorm: ``rms_group_norm(x) * sigmoid(gate)``.

    Reference: flood/ops/norm.py:57-141 (Triton RMSGroupNormSigmoid, the
    output gate of linear-attention layers).
    """
    y = rms_group_norm(x, weight, eps, num_groups)
    return (y.astype(jnp.float32) * jax.nn.sigmoid(gate.astype(jnp.float32))).astype(
        x.dtype
    )


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------


def _rmsnorm_kernel(x_ref, w_ref, o_ref, *, eps: float):
    xf = x_ref[:].astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    o_ref[:] = (xf * jax.lax.rsqrt(var + eps) * w_ref[:].astype(jnp.float32)).astype(
        o_ref.dtype
    )


@functools.partial(jax.jit, static_argnames=("eps", "block_rows"))
def rms_norm_pallas(
    x: jax.Array, weight: jax.Array, eps: float = 1e-5, block_rows: int = 256
) -> jax.Array:
    """Pallas rmsnorm over rows of a [..., d] array (d padded to lanes by Mosaic)."""
    orig_shape = x.shape
    d = orig_shape[-1]
    x2 = x.reshape(-1, d)
    n = x2.shape[0]
    rows = min(block_rows, max(8, n))
    grid = pl.cdiv(n, rows)
    pad = grid * rows - n
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_rmsnorm_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x.dtype),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )(x2, weight)
    if pad:
        out = out[:n]
    return out.reshape(orig_shape)
