"""Kernel microbenchmarks (device time via profiler trace).

Reference: flood/benchmark/ops/bench_{seg_attn,rms_norm,...}.py (TFLOPS/us
tables in flood/README.md:83-105). Device time is parsed from a profiler
trace because through this environment's TPU relay wall-clock timing
measures dispatch, and block_until_ready is unreliable.

Usage: python benchmarks/bench_kernels.py [attn|qmm|rmsnorm|all]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import glob
import gzip
import json
import sys

import numpy as np


def device_ms(fn, iters=10, tag="bench"):
    """Total device ms/call of fn() measured from a profiler trace."""
    import jax

    fn()  # compile+warm
    np.asarray(jax.tree.leaves(fn())[0]).ravel()[:1]
    tdir = f"/tmp/bench_{tag}"
    with jax.profiler.trace(tdir):
        r = None
        for _ in range(iters):
            r = fn()
        np.asarray(jax.tree.leaves(r)[0]).ravel()[:1]
    f = sorted(glob.glob(tdir + "/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(f) as fh:
        tr = json.load(fh)
    tot = sum(
        e["dur"]
        for e in tr["traceEvents"]
        if e.get("ph") == "X" and e.get("name", "").startswith("jit_")
    )
    return tot / iters / 1000.0


def bench_qmm():
    import jax
    import jax.numpy as jnp

    from painlessinferenceacceleration_tpu.layers.linear import (
        QuantSpec,
        dequantize,
        quantize,
    )
    from painlessinferenceacceleration_tpu.ops.quant_matmul import (
        quant_matmul_pallas,
    )

    K, N = 4096, 22016
    key = jax.random.PRNGKey(0)
    for M in (8, 64):
        x = jnp.ones((M, K), jnp.bfloat16)
        for bits in (8, 4):
            spec = QuantSpec(bits=bits, group=128)
            p = quantize(jax.random.normal(key, (K, N), jnp.float32) * 0.02, spec)
            ms = device_ms(
                lambda: quant_matmul_pallas(x, p["q"], p["s"], bits),
                tag=f"qmm{bits}_{M}",
            )
            gb = K * N * bits / 8 / 1e9
            print(
                f"qmm int{bits} M={M} {K}x{N}: {ms:.3f} ms  "
                f"{gb / ms * 1000:.0f} GB/s-effective"
            )
        wbf = dequantize(p, QuantSpec(bits=4, group=128), jnp.bfloat16)
        mm = jax.jit(
            lambda a, w: jnp.matmul(a, w, preferred_element_type=jnp.float32)
        )
        ms = device_ms(lambda: mm(x, wbf), tag=f"bf16_{M}")
        print(f"qmm bf16 M={M} {K}x{N}: {ms:.3f} ms  {K*N*2/1e9/ms*1000:.0f} GB/s")


def bench_attn():
    import jax
    import jax.numpy as jnp

    from painlessinferenceacceleration_tpu.ops.paged_attention import (
        paged_attention,
    )
    from painlessinferenceacceleration_tpu.ops.attention import (
        paged_attention_ref,
    )

    Hq, Hkv, D, ps = 32, 4, 128, 64
    for B, Q, ctx in ((8, 1, 1024), (8, 49, 1024), (1, 1, 2048)):
        P = 4096 // ps
        n_pages = B * P + 1
        k_pages = jnp.zeros((n_pages, ps, Hkv * D), jnp.bfloat16)
        v_pages = jnp.zeros_like(k_pages)
        pt = jnp.arange(1, 1 + B * P, dtype=jnp.int32).reshape(B, P)
        ctxs = jnp.full((B,), ctx, jnp.int32)
        qmask = jnp.ones((B, Q, Q), bool)
        q = jnp.ones((B, Q, Hq, D), jnp.bfloat16)
        scale = D ** -0.5
        ms = device_ms(
            lambda: paged_attention(q, k_pages, v_pages, pt, ctxs, qmask, scale),
            tag=f"pattn_{B}_{Q}_{ctx}",
        )
        ref_ms = device_ms(
            lambda: paged_attention_ref(q, k_pages, v_pages, pt, ctxs, qmask, scale),
            tag=f"rattn_{B}_{Q}_{ctx}",
        )
        kv_gb = B * (ctx + Q) * Hkv * D * 2 * 2 / 1e9
        print(
            f"paged_attn B={B} Q={Q} ctx={ctx}: pallas {ms:.3f} ms "
            f"({kv_gb/ms*1000:.0f} GB/s), jnp-ref {ref_ms:.3f} ms"
        )


def bench_mla():
    """MLA latent MQA attention (seg_mla) at DeepSeek-V3 shapes."""
    import jax
    import jax.numpy as jnp

    from painlessinferenceacceleration_tpu.ops.mla_attention import (
        mla_paged_attention,
    )
    from painlessinferenceacceleration_tpu.ops.attention import (
        paged_attention_ref,
    )

    H, r, rope_d, ps = 128, 512, 64, 64
    Dk = 640  # fused row padded 576 -> 640 for lane alignment (models/mla.py)
    for B, Q, ctx in ((8, 1, 1024), (8, 49, 1024), (1, 1, 2048)):
        P = 4096 // ps
        n_pages = B * P + 1
        k_pages = jnp.zeros((n_pages, ps, Dk), jnp.bfloat16)
        pt = jnp.arange(1, 1 + B * P, dtype=jnp.int32).reshape(B, P)
        ctxs = jnp.full((B,), ctx, jnp.int32)
        qmask = jnp.ones((B, Q, Q), bool)
        q = jnp.ones((B, Q, H, Dk), jnp.bfloat16)
        scale = Dk ** -0.5
        ms = device_ms(
            lambda: mla_paged_attention(
                q, k_pages, pt, ctxs, qmask, scale, v_dim=r
            ),
            tag=f"mla_{B}_{Q}_{ctx}",
        )
        kv_gb = B * (ctx + Q) * Dk * 2 / 1e9
        print(
            f"mla_attn B={B} Q={Q} ctx={ctx}: pallas {ms:.3f} ms "
            f"({kv_gb/ms*1000:.0f} GB/s K-arena)"
        )


def bench_rmsnorm():
    import jax
    import jax.numpy as jnp

    from painlessinferenceacceleration_tpu.ops.rmsnorm import (
        rms_norm,
        rms_norm_pallas,
    )

    x = jnp.ones((8192, 4096), jnp.bfloat16)
    w = jnp.ones((4096,), jnp.bfloat16)
    f1 = jax.jit(lambda a: rms_norm(a, w))
    ms = device_ms(lambda: f1(x), tag="rms_xla")
    ms2 = device_ms(lambda: rms_norm_pallas(x, w), tag="rms_pallas")
    gb = x.size * 2 * 2 / 1e9
    print(f"rmsnorm 8192x4096: xla {ms:.3f} ms ({gb/ms*1000:.0f} GB/s), "
          f"pallas {ms2:.3f} ms ({gb/ms2*1000:.0f} GB/s)")


def bench_la():
    """Chunkwise linear attention (seg_la): Pallas kernel vs jnp einsums."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from painlessinferenceacceleration_tpu.models.linear_attn import (
        default_decays,
        linear_attn_block,
    )
    from painlessinferenceacceleration_tpu.ops.linear_attention import (
        linear_attention_chunk,
    )

    B, H, C, D = 4, 8, 512, 128
    rng = np.random.default_rng(0)
    xq = jnp.asarray(rng.normal(size=(B, H, C, D)).astype(np.float32))
    xk = jnp.asarray(rng.normal(size=(B, H, C, D)).astype(np.float32))
    xv = jnp.asarray(rng.normal(size=(B, H, C, D)).astype(np.float32))
    s0 = jnp.asarray(rng.normal(size=(B, H, D, D)).astype(np.float32))
    lens = jnp.array([512, 300, 512, 128], jnp.int32)
    loglam = jnp.log(jnp.clip(default_decays(H), 1e-4, 1 - 1e-6))

    ms = device_ms(
        lambda: linear_attention_chunk(xq, xk, xv, s0, lens, loglam),
        tag="la_pallas",
    )

    @jax.jit
    def jnp_form(xq, xk, xv, s0, lens):
        i = jnp.arange(C, dtype=jnp.float32)
        valid = jnp.arange(C)[None] < lens[:, None]
        k = xk * valid[:, None, :, None]
        v = xv * valid[:, None, :, None]
        qk = jnp.einsum("bhid,bhjd->bhij", xq, k)
        dm = jnp.exp(loglam[:, None, None] * (i[:, None] - i[None, :]))
        A = qk * jnp.where((i[:, None] >= i[None, :])[None], dm, 0.0)[None]
        out = jnp.einsum("bhij,bhjd->bhid", A, v)
        out += jnp.einsum("bhid,bhde->bhie", xq, s0) * jnp.exp(
            loglam[:, None] * (i[None, :] + 1.0)
        )[None, ..., None]
        return out

    ms2 = device_ms(lambda: jnp_form(xq, xk, xv, s0, lens), tag="la_xla")
    print(f"linear-attn chunk B{B} H{H} C{C} D{D}: "
          f"pallas {ms:.3f} ms, xla {ms2:.3f} ms ({ms2/ms:.2f}x)")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("qmm", "all"):
        bench_qmm()
    if which in ("attn", "all"):
        bench_attn()
    if which in ("mla", "all"):
        bench_mla()
    if which in ("rmsnorm", "all"):
        bench_rmsnorm()
    if which in ("la", "all"):
        bench_la()
