"""Timing probes for int4 dequant-GEMM kernel variants (TPU only).

P1: current production kernel (lo/hi split, int8->bf16 converts, s-mul).
P2: magic-OR SWAR probe — builds bf16 (128+v) planes via (p & mask) | 0x4300
    pairs, no int8->bf16 converts. Numerically WRONG column order (no
    pre-permutation); timing probe only.
P3: P2 without the per-element scale mul (per-channel post-scale). Probes the
    cost of the s-mul.
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from benchmarks.bench_kernels import device_ms
from painlessinferenceacceleration_tpu.layers.linear import QuantSpec, quantize
from painlessinferenceacceleration_tpu.ops.quant_matmul import (
    quant_matmul_pallas,
)



def _swar_kernel(xlo_ref, xhi_ref, xsum_ref, q_ref, s_ref, o_ref, *, scale_mul):
    q3 = q_ref[...]  # [groups, half, n] uint8
    p32 = pltpu.bitcast(q3, jnp.uint32)  # [groups, half/4, n]
    # each u32 lane packs 4 K-rows; planes split rows {0,2} and {1,3} of the
    # pack -> bf16 (128+v) pairs, i.e. a K-row permutation (absorbed into x)
    a = pltpu.bitcast((p32 & jnp.uint32(0x000F000F)) | jnp.uint32(0x43004300), jnp.bfloat16)          # [g, half/2, n]
    b = pltpu.bitcast(((p32 >> 8) & jnp.uint32(0x000F000F)) | jnp.uint32(0x43004300), jnp.bfloat16)
    c = pltpu.bitcast(((p32 >> 4) & jnp.uint32(0x000F000F)) | jnp.uint32(0x43004300), jnp.bfloat16)
    d = pltpu.bitcast(((p32 >> 12) & jnp.uint32(0x000F000F)) | jnp.uint32(0x43004300), jnp.bfloat16)
    g, h2, n = a.shape
    kq2 = g * h2  # half the packed rows per plane
    if scale_mul:
        sh = s_ref[...].astype(jnp.bfloat16)[:, None, :]  # [groups,1,n]
        a = a * sh
        b = b * sh
        c = c * sh
        d = d * sh
    xa = xlo_ref[..., :kq2]
    xb = xlo_ref[..., kq2:]
    xc = xhi_ref[..., :kq2]
    xd = xhi_ref[..., kq2:]
    acc = jnp.dot(xa, a.reshape(kq2, n), preferred_element_type=jnp.float32)
    acc += jnp.dot(xb, b.reshape(kq2, n), preferred_element_type=jnp.float32)
    acc += jnp.dot(xc, c.reshape(kq2, n), preferred_element_type=jnp.float32)
    acc += jnp.dot(xd, d.reshape(kq2, n), preferred_element_type=jnp.float32)
    corr = jax.lax.dot_general(
        xsum_ref[...], s_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = (acc - 136.0 * corr).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale_mul",))
def swar_probe(x, q, s, scale_mul):
    M, K = x.shape
    N = q.shape[1]
    groups = s.shape[0]
    group = K // groups
    half = group // 2
    half = group // 2
    xg = x.reshape(M, groups, 2, half)
    xlo = xg[:, :, 0, :].reshape(M, K // 2).astype(jnp.bfloat16)
    xhi = xg[:, :, 1, :].reshape(M, K // 2).astype(jnp.bfloat16)
    xsum = jnp.sum(x.astype(jnp.float32).reshape(M, groups, group), axis=-1)
    q4 = q.reshape(groups, half, N)
    m_tile = 8
    n_tile = min(1024, N)
    grid = (pl.cdiv(M, m_tile), pl.cdiv(N, n_tile))
    return pl.pallas_call(
        functools.partial(_swar_kernel, scale_mul=scale_mul),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        grid=grid,
        in_specs=[
            pl.BlockSpec((m_tile, K // 2), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m_tile, K // 2), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m_tile, groups), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((groups, half, n_tile), lambda i, j: (0, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((groups, n_tile), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m_tile, n_tile), lambda i, j: (i, j), memory_space=pltpu.VMEM),
    )(xlo, xhi, xsum, q4, s)


def main():
    K, N = 4096, 22016
    key = jax.random.PRNGKey(0)
    spec = QuantSpec(bits=4, group=128)
    p = quantize(jax.random.normal(key, (K, N), jnp.float32) * 0.02, spec)
    gb = K * N * 4 / 8 / 1e9
    for M in (8,):
        x = jnp.ones((M, K), jnp.bfloat16)
        ms = device_ms(lambda: quant_matmul_pallas(x, p["q"], p["s"], 4), tag="p1")
        print(f"P1 current    M={M}: {ms:.3f} ms  {gb/ms*1000:.0f} GB/s-eff")
        ms = device_ms(lambda: swar_probe(x, p["q"], p["s"], True), tag="p2")
        print(f"P2 swar+smul  M={M}: {ms:.3f} ms  {gb/ms*1000:.0f} GB/s-eff")
        ms = device_ms(lambda: swar_probe(x, p["q"], p["s"], False), tag="p3")
        print(f"P3 swar nosml M={M}: {ms:.3f} ms  {gb/ms*1000:.0f} GB/s-eff")


if __name__ == "__main__":
    import sys as _sys
    if len(_sys.argv) > 1 and _sys.argv[1] == "sweep":
        pass  # handled at module end (defs live below)
    else:
        main()


# P4: per-group SWAR dots (K=half/2 each), scale applied on the [M, n]
# OUTPUT per group (cheap), fori_loop over groups.
def _swar_group_kernel(xa_ref, xb_ref, xc_ref, xd_ref, xsum_ref, q_ref, s_ref,
                       o_ref, *, groups):
    p32 = pltpu.bitcast(q_ref[...], jnp.uint32)  # [groups, half/4, n]
    m = jnp.uint32(0x000F000F)
    magic = jnp.uint32(0x43004300)
    a = pltpu.bitcast((p32 & m) | magic, jnp.bfloat16)  # [groups, half/2, n]
    b = pltpu.bitcast(((p32 >> 8) & m) | magic, jnp.bfloat16)
    c = pltpu.bitcast(((p32 >> 4) & m) | magic, jnp.bfloat16)
    d = pltpu.bitcast(((p32 >> 12) & m) | magic, jnp.bfloat16)

    acc = jnp.zeros(o_ref.shape, jnp.float32)
    for g in range(groups):  # static unroll: groups is compile-time
        pg = (
            jnp.dot(xa_ref[:, g, :], a[g], preferred_element_type=jnp.float32)
            + jnp.dot(xb_ref[:, g, :], b[g], preferred_element_type=jnp.float32)
            + jnp.dot(xc_ref[:, g, :], c[g], preferred_element_type=jnp.float32)
            + jnp.dot(xd_ref[:, g, :], d[g], preferred_element_type=jnp.float32)
        )
        pg = pg - 136.0 * xsum_ref[:, g][:, None]
        acc = acc + pg * s_ref[g][None, :]
    o_ref[...] = acc.astype(o_ref.dtype)


# P5: batched dot_general over the group dim in one call.
def _swar_batched_kernel(xq_ref, xsum_ref, q_ref, s_ref, o_ref):
    p32 = pltpu.bitcast(q_ref[...], jnp.uint32)
    m = jnp.uint32(0x000F000F)
    magic = jnp.uint32(0x43004300)
    a = pltpu.bitcast((p32 & m) | magic, jnp.bfloat16)  # [groups, half/2, n]
    b = pltpu.bitcast(((p32 >> 8) & m) | magic, jnp.bfloat16)
    c = pltpu.bitcast(((p32 >> 4) & m) | magic, jnp.bfloat16)
    d = pltpu.bitcast(((p32 >> 12) & m) | magic, jnp.bfloat16)
    g_, h2, n = a.shape
    w = jnp.concatenate([a, b, c, d], axis=1)  # [groups, 2*half, n]
    # xq_ref: [M, groups, 2*half] matching w's row order per group
    acc = jax.lax.dot_general(
        xq_ref[...], w,
        (((2,), (1,)), ((1,), (0,))),  # contract k, batch g
        preferred_element_type=jnp.float32,
    )  # [groups, M, n]
    sc = s_ref[...]  # [groups, n]
    out = jnp.sum(acc * sc[:, None, :], axis=0)
    corr = jax.lax.dot_general(
        xsum_ref[...], sc, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = (out - 136.0 * corr).astype(o_ref.dtype)


def _x_swar_planes(x, groups, group):
    M, K = x.shape
    half = group // 2
    xg = x.reshape(M, groups, 2, half // 2, 2).astype(jnp.bfloat16)
    xa = xg[:, :, 0, :, 0]  # [M, groups, half/2] even rows, low half
    xb = xg[:, :, 0, :, 1]
    xc = xg[:, :, 1, :, 0]
    xd = xg[:, :, 1, :, 1]
    xsum = jnp.sum(x.astype(jnp.float32).reshape(M, groups, group), axis=-1)
    return xa, xb, xc, xd, xsum


@jax.jit
def swar_group_probe(x, q, s):
    M, K = x.shape
    N = q.shape[1]
    groups = s.shape[0]
    group = K // groups
    half = group // 2
    xa, xb, xc, xd, xsum = _x_swar_planes(x, groups, group)
    q4 = q.reshape(groups, half, N)
    m_tile = 8
    n_tile = min(1024, N)
    grid = (pl.cdiv(M, m_tile), pl.cdiv(N, n_tile))
    xspec = pl.BlockSpec((m_tile, groups, half // 2), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_swar_group_kernel, groups=groups),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        grid=grid,
        in_specs=[
            xspec, xspec, xspec, xspec,
            pl.BlockSpec((m_tile, groups), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((groups, half, n_tile), lambda i, j: (0, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((groups, n_tile), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m_tile, n_tile), lambda i, j: (i, j), memory_space=pltpu.VMEM),
    )(xa, xb, xc, xd, xsum, q4, s)


@jax.jit
def swar_batched_probe(x, q, s):
    M, K = x.shape
    N = q.shape[1]
    groups = s.shape[0]
    group = K // groups
    half = group // 2
    xa, xb, xc, xd, xsum = _x_swar_planes(x, groups, group)
    xq = jnp.concatenate([xa, xb, xc, xd], axis=2)  # [M, groups, 2*half]
    q4 = q.reshape(groups, half, N)
    m_tile = M
    n_tile = min(512, N)
    grid = (pl.cdiv(M, m_tile), pl.cdiv(N, n_tile))
    return pl.pallas_call(
        _swar_batched_kernel,
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        grid=grid,
        in_specs=[
            pl.BlockSpec((m_tile, groups, 2 * half), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m_tile, groups), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((groups, half, n_tile), lambda i, j: (0, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((groups, n_tile), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m_tile, n_tile), lambda i, j: (i, j), memory_space=pltpu.VMEM),
    )(xq, xsum, q4, s)


def check_and_time():
    from painlessinferenceacceleration_tpu.layers.linear import dequantize
    K, N = 4096, 22016
    key = jax.random.PRNGKey(0)
    spec = QuantSpec(bits=4, group=128)
    w0 = jax.random.normal(key, (K, N), jnp.float32) * 0.02
    p = quantize(w0, spec)
    gb = K * N * 4 / 8 / 1e9
    M = 8
    x = jax.random.normal(jax.random.PRNGKey(1), (M, K), jnp.float32).astype(jnp.bfloat16)
    wref = dequantize(p, spec, jnp.float32)
    ref = jnp.matmul(x.astype(jnp.float32), wref)
    for name, fn in (("P4 group-loop", swar_group_probe), ("P5 batched", swar_batched_probe)):
        try:
            out = fn(x, p["q"], p["s"])
            rel = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref))) / float(jnp.max(jnp.abs(ref)))
            ms = device_ms(lambda: fn(x, p["q"], p["s"]), tag=name)
            print(f"{name}  M={M}: {ms:.3f} ms  {gb/ms*1000:.0f} GB/s-eff  relerr={rel:.4f}")
        except Exception as e:
            print(f"{name} FAILED: {type(e).__name__}: {str(e)[:300]}")


# P6: scale-on-WEIGHTS wide variant — materialize w = dequant*scale once per
# (N-tile) program and do ONE [M, K] x [K, n] dot. VPU cost is M-independent
# (per weight element), so it should win at verify widths (M ~ 49-64) where
# P4's per-group small dots go M-bound.
def _swar_wide_kernel(xq_ref, xsum_ref, q_ref, s_ref, o_ref):
    p32 = pltpu.bitcast(q_ref[...], jnp.uint32)
    m = jnp.uint32(0x000F000F)
    magic = jnp.uint32(0x43004300)
    a = pltpu.bitcast((p32 & m) | magic, jnp.bfloat16)  # [groups, half/2, n]
    b = pltpu.bitcast(((p32 >> 8) & m) | magic, jnp.bfloat16)
    c = pltpu.bitcast(((p32 >> 4) & m) | magic, jnp.bfloat16)
    d = pltpu.bitcast(((p32 >> 12) & m) | magic, jnp.bfloat16)
    g_, h2, n = a.shape
    w = jnp.concatenate([a, b, c, d], axis=1)  # [groups, group, n]
    w = w * s_ref[...][:, None, :].astype(jnp.bfloat16)
    w = w.reshape(g_ * 4 * h2, n)  # [K, n] (row order matches xq)
    acc = jax.lax.dot_general(
        xq_ref[...], w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    corr = jax.lax.dot_general(
        xsum_ref[...], s_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = (acc - 136.0 * corr).astype(o_ref.dtype)


def swar_wide_probe(x, q, s):
    M, K = x.shape
    N = q.shape[1]
    groups = s.shape[0]
    group = K // groups
    half = group // 2
    xa, xb, xc, xd, xsum = _x_swar_planes(x, groups, group)
    xq = jnp.concatenate([xa, xb, xc, xd], axis=2).reshape(M, K)
    q4 = q.reshape(groups, half, N)
    m_tile = M
    n_tile = min(512, N)
    grid = (pl.cdiv(M, m_tile), pl.cdiv(N, n_tile))
    return pl.pallas_call(
        _swar_wide_kernel,
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        grid=grid,
        in_specs=[
            pl.BlockSpec((m_tile, K), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m_tile, groups), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((groups, half, n_tile), lambda i, j: (0, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((groups, n_tile), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m_tile, n_tile), lambda i, j: (i, j), memory_space=pltpu.VMEM),
    )(xq, xsum, q4, s)


def sweep_m():
    """Correctness + timing of P4(current prod shape)/P5/P6 at M=8 and M=64."""
    from painlessinferenceacceleration_tpu.layers.linear import dequantize
    from painlessinferenceacceleration_tpu.ops.quant_matmul import (
        quant_matmul_pallas,
    )

    K, N = 4096, 22016
    key = jax.random.PRNGKey(0)
    spec = QuantSpec(bits=4, group=128)
    w0 = jax.random.normal(key, (K, N), jnp.float32) * 0.02
    p = quantize(w0, spec)
    gb = K * N * 4 / 8 / 1e9
    wref = dequantize(p, spec, jnp.float32)
    for M in (8, 49, 64):
        x = jax.random.normal(jax.random.PRNGKey(1), (M, K), jnp.float32).astype(jnp.bfloat16)
        ref = jnp.matmul(x.astype(jnp.float32), wref)
        probes = [
            ("prod", lambda x=x: quant_matmul_pallas(x, p["q"], p["s"], 4)),
            ("P7 gconcat", lambda x=x: swar_gconcat_probe(x, p["q"], p["s"])),
        ]
        for name, fn in probes:
            try:
                out = fn()
                rel = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref))) / float(
                    jnp.max(jnp.abs(ref))
                )
                ms = device_ms(fn, tag=f"{name}_{M}".replace(" ", ""))
                print(f"{name:10s} M={M:3d}: {ms:7.3f} ms  "
                      f"{gb/ms*1000:4.0f} GB/s-eff  relerr={rel:.4f}", flush=True)
            except Exception as e:
                print(f"{name} M={M} FAILED: {type(e).__name__}: {str(e)[:200]}",
                      flush=True)




# P7: per-group ONE dot over the concatenated planes ([M, group] x [group, n])
# with exact output scaling — 4x fewer dots than P4, same f32 correction.
def _swar_gconcat_kernel(xq_ref, xsum_ref, q_ref, s_ref, o_ref, *, groups):
    p32 = pltpu.bitcast(q_ref[...], jnp.uint32)
    m = jnp.uint32(0x000F000F)
    magic = jnp.uint32(0x43004300)
    a = pltpu.bitcast((p32 & m) | magic, jnp.bfloat16)
    b = pltpu.bitcast(((p32 >> 8) & m) | magic, jnp.bfloat16)
    c = pltpu.bitcast(((p32 >> 4) & m) | magic, jnp.bfloat16)
    d = pltpu.bitcast(((p32 >> 12) & m) | magic, jnp.bfloat16)
    w = jnp.concatenate([a, b, c, d], axis=1)  # [groups, group, n]
    acc = jnp.zeros(o_ref.shape, jnp.float32)
    for g in range(groups):
        pg = jnp.dot(xq_ref[:, g, :], w[g], preferred_element_type=jnp.float32)
        pg = pg - 136.0 * xsum_ref[:, g][:, None]
        acc = acc + pg * s_ref[g][None, :]
    o_ref[...] = acc.astype(o_ref.dtype)


@jax.jit
def swar_gconcat_probe(x, q, s):
    M, K = x.shape
    N = q.shape[1]
    groups = s.shape[0]
    group = K // groups
    half = group // 2
    xa, xb, xc, xd, xsum = _x_swar_planes(x, groups, group)
    xq = jnp.concatenate([xa, xb, xc, xd], axis=2)  # [M, groups, group]
    q4 = q.reshape(groups, half, N)
    m_tile = M
    n_tile = min(512, N)
    grid = (pl.cdiv(M, m_tile), pl.cdiv(N, n_tile))
    return pl.pallas_call(
        functools.partial(_swar_gconcat_kernel, groups=groups),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        grid=grid,
        in_specs=[
            pl.BlockSpec((m_tile, groups, group), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m_tile, groups), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((groups, half, n_tile), lambda i, j: (0, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((groups, n_tile), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m_tile, n_tile), lambda i, j: (i, j), memory_space=pltpu.VMEM),
    )(xq, xsum, q4, s)


if __name__ == "__main__":
    import sys as _sys
    if len(_sys.argv) > 1 and _sys.argv[1] == "sweep":
        sweep_m()
