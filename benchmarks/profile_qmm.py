"""Speed-of-light decomposition of the int4 decode GEMM (round-2 weak #8).

The AR decode step at 7B int4 is dominated by quant_matmul_pallas_stacked
(5.56 ms/step in benchmarks/profile_ar_r2.log) vs a ~4.3 ms weight-read
floor. This script separates the gap into:

  dma      — same grid/BlockSpecs, trivial body: the Pallas pipeline DMAs
             every block regardless of use, so this is the achievable
             weight-streaming floor for this blocking (not the paper roofline)
  unpack   — DMA + SWAR bit-plane unpack, no MXU dots: adds the VPU cost
  full     — the shipping kernel
  variants — bf16 scales (halves scale traffic), n_tile sweep (pipeline
             depth vs block granularity)

Run:  python benchmarks/profile_qmm.py            (TPU)
      QMM_M=8 QMM_ITERS=20 python benchmarks/profile_qmm.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from benchmarks.bench_kernels import device_ms

# llama2-7b per-layer GEMM shapes (E=4096, kv=32 heads full, I=11008),
# qkv and gate/up merged as served (models/base.py:88,72)
SHAPES = {
    "qkv": (4096, 12288),
    "o": (4096, 4096),
    "gateup": (4096, 22016),
    "down": (11008, 4096),
}
N_LAYERS = 32


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from painlessinferenceacceleration_tpu.ops.quant_matmul import (
        _int4_x_planes,
        _qmm4_kernel_v3,
        quant_matmul_pallas,
    )

    M = int(os.environ.get("QMM_M", "8"))
    iters = int(os.environ.get("QMM_ITERS", "20"))
    group = 128
    key = jax.random.PRNGKey(0)
    print(f"# int4 decode GEMM decomposition, M={M}", flush=True)

    def make_operands(K, N):
        ks = jax.random.split(key, 3)
        q = jax.random.randint(ks[0], (K // 2, N), 0, 255, jnp.int32).astype(
            jnp.uint8
        )
        s = jax.random.uniform(ks[1], (K // group, N), jnp.float32)
        x = jax.random.normal(ks[2], (M, K), jnp.bfloat16)
        return x, q, s

    def _touch(xq_ref, xsum_ref, q_ref, s_ref):
        # touch each operand cheaply so Mosaic keeps the refs; the pipeline
        # DMAs the FULL blocks per grid step regardless of in-kernel use.
        # (vector reads + sums: Mosaic v5e rejects non-32-bit scalar
        # extracts, and uint8 goes via int32 — no uint8->bf16 vector cast.)
        return (
            jnp.sum(xq_ref[0, 0, :].astype(jnp.float32))
            + jnp.sum(xsum_ref[0, :])
            + jnp.sum(q_ref[0, 0, :].astype(jnp.int32).astype(jnp.float32))
            + jnp.sum(s_ref[0, :].astype(jnp.float32))
        )

    def dma_kernel(xq_ref, xsum_ref, q_ref, s_ref, o_ref):
        t = _touch(xq_ref, xsum_ref, q_ref, s_ref)
        o_ref[...] = jnp.full(o_ref.shape, t, jnp.float32).astype(jnp.bfloat16)

    def unpack_kernel(xq_ref, xsum_ref, q_ref, s_ref, o_ref):
        p32 = pltpu.bitcast(q_ref[...], jnp.uint32)
        m = jnp.uint32(0x000F000F)
        magic = jnp.uint32(0x43004300)
        a = pltpu.bitcast((p32 & m) | magic, jnp.bfloat16)
        b = pltpu.bitcast(((p32 >> 8) & m) | magic, jnp.bfloat16)
        c = pltpu.bitcast(((p32 >> 4) & m) | magic, jnp.bfloat16)
        d = pltpu.bitcast(((p32 >> 12) & m) | magic, jnp.bfloat16)
        acc = (
            jnp.sum(a, axis=(0, 1)) + jnp.sum(b, axis=(0, 1))
            + jnp.sum(c, axis=(0, 1)) + jnp.sum(d, axis=(0, 1))
        )  # [n_tile]
        t = _touch(xq_ref, xsum_ref, q_ref, s_ref)
        o_ref[...] = jnp.broadcast_to(
            acc[None, :] + t, o_ref.shape
        ).astype(jnp.bfloat16)

    def run_body(kernel_body, x, q, s, K, N, n_tile, s_dtype=jnp.float32):
        groups = s.shape[0]
        half = group // 2
        xq, xsum = _int4_x_planes(x, groups, group)
        q4 = q.reshape(groups, half, N)
        sd = s.astype(s_dtype)
        m_tile = max(8, M)
        grid = (pl.cdiv(M, m_tile), pl.cdiv(N, n_tile))
        f = pl.pallas_call(
            kernel_body,
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
            grid=grid,
            in_specs=[
                pl.BlockSpec((m_tile, groups, group), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((m_tile, groups), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((groups, half, n_tile), lambda i, j: (0, 0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((groups, n_tile), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((m_tile, n_tile), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
        )
        # arrays passed as ARGUMENTS to the jitted fn (never closed over:
        # closures serialize through the remote-compile relay)
        g = jax.jit(f)
        return lambda: g(xq, xsum, q4, sd)

    def run_blocked_dma(x, q, s, K, N, n_tile):
        """DMA floor with the weight PRE-BLOCKED contiguous per grid step:
        q rearranged [N/nt, groups, half, nt] so each block is one
        contiguous HBM extent (the in-place layout slices N per (g,h) row
        into n_tile-byte segments)."""
        groups = s.shape[0]
        half = group // 2
        xq, xsum = _int4_x_planes(x, groups, group)
        nb = N // n_tile
        qb = jnp.asarray(
            np.ascontiguousarray(
                np.asarray(q).reshape(groups, half, nb, n_tile)
                .transpose(2, 0, 1, 3)
            )
        )
        sd = s
        m_tile = max(8, M)

        def body(xq_ref, xsum_ref, q_ref, s_ref, o_ref):
            t = (
                jnp.sum(xq_ref[0, 0, :].astype(jnp.float32))
                + jnp.sum(xsum_ref[0, :])
                + jnp.sum(q_ref[0, 0, 0, :].astype(jnp.int32).astype(jnp.float32))
                + jnp.sum(s_ref[0, :].astype(jnp.float32))
            )
            o_ref[...] = jnp.full(o_ref.shape, t, jnp.float32).astype(
                jnp.bfloat16
            )

        f = pl.pallas_call(
            body,
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
            grid=(pl.cdiv(M, m_tile), nb),
            in_specs=[
                pl.BlockSpec((m_tile, groups, group), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((m_tile, groups), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, groups, half, n_tile),
                             lambda i, j: (j, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((groups, n_tile), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((m_tile, n_tile), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
        )
        g = jax.jit(f)
        return lambda: g(xq, xsum, qb, sd)

    rows = {}
    for name, (K, N) in SHAPES.items():
        x, q, s = make_operands(K, N)
        gb = (K * N / 2 + s.nbytes + x.nbytes) / 1e9
        res = {"gb": gb}
        res["dma"] = device_ms(
            run_body(dma_kernel, x, q, s, K, N, 512), iters, f"dma_{name}"
        )
        res["dma_nt1024"] = device_ms(
            run_body(dma_kernel, x, q, s, K, N, 1024), iters, f"dma1k_{name}"
        )
        res["dma_blocked"] = device_ms(
            run_blocked_dma(x, q, s, K, N, 512), iters, f"dmab_{name}"
        )
        # the unpack probe materializes 4 bf16 planes in VMEM: shrink the
        # tile at large K (down: groups=86) to stay under the 16M scoped limit
        up_nt = 512 if K // group <= 64 else 256
        res["unpack"] = device_ms(
            run_body(unpack_kernel, x, q, s, K, N, up_nt), iters, f"up_{name}"
        )
        res["full"] = device_ms(
            lambda x=x, q=q, s=s: quant_matmul_pallas(x, q, s, 4),
            iters, f"full_{name}",
        )
        res["full_nt1024"] = device_ms(
            run_body(_qmm4_kernel_v3, x, q, s, K, N, 1024),
            iters, f"nt1024_{name}",
        )
        if N % 2048 == 0 and K // group <= 32:  # VMEM: 2x(groups*half*2048)
            res["full_nt2048"] = device_ms(
                run_body(_qmm4_kernel_v3, x, q, s, K, N, 2048),
                iters, f"nt2048_{name}",
            )
        # bf16 scales: same kernel, s cast outside (mul promotes in-kernel)
        res["full_sbf16"] = device_ms(
            run_body(_qmm4_kernel_v3, x, q, s, K, N, 512,
                     s_dtype=jnp.bfloat16),
            iters, f"sbf16_{name}",
        )
        res["full_nt1024_sbf16"] = device_ms(
            run_body(_qmm4_kernel_v3, x, q, s, K, N, 1024,
                     s_dtype=jnp.bfloat16),
            iters, f"nt1024s_{name}",
        )
        rows[name] = res
        bw = lambda ms: gb / ms * 1000.0
        print(
            f"{name:7s} {K}x{N}: dma {res['dma']:.3f} ms ({bw(res['dma']):.0f}"
            f" GB/s)  dma1k {res['dma_nt1024']:.3f} ({bw(res['dma_nt1024']):.0f})"
            f"  dmaB {res['dma_blocked']:.3f} ({bw(res['dma_blocked']):.0f})"
            f"  unpack {res['unpack']:.3f}  full {res['full']:.3f} "
            f"({bw(res['full']):.0f} GB/s)  nt1024 {res['full_nt1024']:.3f}  "
            + (f"nt2048 {res['full_nt2048']:.3f}  " if "full_nt2048" in res else "")
            + f"sbf16 {res['full_sbf16']:.3f}  "
            f"nt1024s {res['full_nt1024_sbf16']:.3f}",
            flush=True,
        )

    tot = {k: sum(r[k] for r in rows.values())
           for k in ("dma", "unpack", "full", "full_nt1024", "full_sbf16",
                     "full_nt1024_sbf16")}
    print(
        f"\nper-step (x{N_LAYERS} layers): dma {tot['dma']*N_LAYERS:.2f} ms  "
        f"unpack {tot['unpack']*N_LAYERS:.2f}  full {tot['full']*N_LAYERS:.2f}"
        f"  nt1024 {tot['full_nt1024']*N_LAYERS:.2f}  "
        f"sbf16 {tot['full_sbf16']*N_LAYERS:.2f}  "
        f"nt1024+sbf16 {tot['full_nt1024_sbf16']*N_LAYERS:.2f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
