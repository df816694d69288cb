"""Per-op device-time breakdown of one AR decode step (7B INT4, full vocab).

Round-1 review item: "check in a per-op breakdown (profiler trace summary)
of the 7B int4 AR step; fix the dominant costs". Parses a jax.profiler
trace of multistep_decode (K steps in one jit) and aggregates device-lane
op durations by fusion/op name, printing ms/step and a JSON summary to
benchmarks/profile_ar.json.

Usage: python benchmarks/profile_ar.py [K]   (TPU; serialize with other TPU jobs)
"""

import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from painlessinferenceacceleration_tpu.config import EngineConfig, ModelConfig
    from painlessinferenceacceleration_tpu.engine.cache import init_kv_cache
    from painlessinferenceacceleration_tpu.engine.multistep import multistep_decode
    from painlessinferenceacceleration_tpu.engine.step import prefill_step
    from painlessinferenceacceleration_tpu.layers.linear import QuantSpec
    from painlessinferenceacceleration_tpu.models.base import init_params_quantized

    K = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    vocab = int(os.environ.get("BENCH_VOCAB", "32000"))
    bits = int(os.environ.get("BENCH_BITS", "4"))
    qmode = os.environ.get("BENCH_QMODE", "")  # e.g. w8a8_fp8 (review #3)
    import dataclasses

    cfg = dataclasses.replace(ModelConfig.llama2_7b(), vocab_size=vocab)
    spec = (QuantSpec.from_mode(qmode) if qmode
            else QuantSpec(bits=bits, group=128))
    params = init_params_quantized(cfg, jax.random.PRNGKey(0), spec)
    jax.block_until_ready(params)
    ecfg = EngineConfig(page_size=64, max_seq_len=4096, max_concurrency=1)
    kv = init_kv_cache(cfg, ecfg, dtype=jnp.bfloat16)
    P = ecfg.pages_per_req
    pt = jnp.arange(1, 1 + P, dtype=jnp.int32)[None]
    prompt = np.random.default_rng(0).integers(10, vocab - 10, size=512).tolist()
    kv, nxt, _ = prefill_step(
        params, kv, cfg, jnp.array([prompt], jnp.int32),
        jnp.zeros((1,), jnp.int32), jnp.array([len(prompt)], jnp.int32), pt, spec,
    )
    ones = jnp.ones((1,), bool)
    ctx0 = jnp.array([len(prompt)], jnp.int32)

    def run(kv, last, ctx):
        return multistep_decode(
            params, kv, cfg, last, ctx, ones, pt, n_steps=K, spec=spec
        )

    kv2, toks, last, ctx, act = run(kv, nxt, ctx0)  # compile+warm
    np.asarray(toks[0, -1])
    tdir = "/tmp/profile_ar"
    with jax.profiler.trace(tdir):
        kv2, toks, last, ctx, act = run(kv2, last, ctx)
        np.asarray(toks[0, -1])

    f = sorted(glob.glob(tdir + "/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(f) as fh:
        tr = json.load(fh)
    ev = tr["traceEvents"]
    # device lanes: pids whose process name mentions TPU/device XLA ops.
    pid_name = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_name.items() if "TPU" in n or "/device" in n}
    total_jit = 0.0
    lanes = defaultdict(list)
    for e in ev:
        if e.get("ph") != "X":
            continue
        name = e.get("name", "")
        if name.startswith("jit_"):
            total_jit += e["dur"]
            continue
        if e.get("pid") not in dev_pids:
            continue
        lanes[(e["pid"], e.get("tid", 0))].append(e)

    # EXCLUSIVE self-time accounting (round-4 review: the old sum double-
    # counted the lax.scan "while" wrapper, which SPANS its body ops on the
    # same lane — attribution summed to ~3x the measured step time). Within
    # each device lane, nest intervals by (start, -duration) and charge each
    # op its duration minus its direct children; self-times then sum exactly
    # to the lane's busy time.
    by_op = defaultdict(float)
    by_cat = defaultdict(float)
    busy = 0.0
    for evs in lanes.values():
        evs.sort(key=lambda e: (e["ts"], -e["dur"]))
        stack = []  # (end_ts, event, child_dur_accum index)
        child = {}
        for e in evs:
            ts, dur = e["ts"], e["dur"]
            while stack and ts >= stack[-1][0] - 1e-9:
                stack.pop()
            if stack:
                pe = stack[-1][1]
                child[id(pe)] = child.get(id(pe), 0.0) + dur
            else:
                busy += dur
            stack.append((ts + dur, e, None))
        for e in evs:
            self_dur = e["dur"] - child.get(id(e), 0.0)
            if self_dur <= 0:
                continue
            base = re.sub(r"[.\d]+$", "", e.get("name", ""))
            by_op[base] += self_dur
            args = e.get("args", {})
            cat = args.get("tf_op", args.get("hlo_category", ""))
            if cat:
                by_cat[cat] += self_dur

    dev_total = sum(by_op.values())
    # roofline model (stated): one AR step must re-read the weights; at
    # int4 w/ group scales that is ~(7e9 * bits/8 * 1.07) bytes plus the
    # KV window read. v5e HBM ~819 GB/s.
    wbytes = sum(
        x.size * x.dtype.itemsize
        for x in __import__("jax").tree.leaves(params) if hasattr(x, "dtype")
    )
    roof_ms = wbytes / (819e9) * 1e3
    print(f"jit wall (host-span) total: {total_jit/1000:.3f} ms for K={K} steps")
    print(f"device busy total: {busy/1000:.3f} ms -> {busy/1000/K:.4f} ms/step "
          f"(self-time sum {dev_total/1000/K:.4f}; weights-read roofline "
          f"{roof_ms:.3f} ms/step)")
    print(f"\n{'op':60s} {'ms':>9s} {'ms/step':>9s} {'%':>6s}")
    rows = sorted(by_op.items(), key=lambda kv: -kv[1])
    out_rows = []
    for name, dur in rows[:30]:
        pct = 100 * dur / max(dev_total, 1e-9)
        print(f"{name[:60]:60s} {dur/1000:9.3f} {dur/1000/K:9.4f} {pct:6.2f}")
        out_rows.append({"op": name, "ms_total": dur / 1000,
                         "ms_per_step": dur / 1000 / K, "pct": pct})
    if by_cat:
        print("\nby category:")
        for name, dur in sorted(by_cat.items(), key=lambda kv: -kv[1])[:15]:
            print(f"  {name[:55]:55s} {dur/1000:9.3f} ms  {100*dur/dev_total:5.1f}%")
    with open(os.path.join(os.path.dirname(__file__), "profile_ar.json"), "w") as fh:
        json.dump({"K": K, "vocab": vocab, "bits": bits,
                   "qmode": qmode or f"int{bits}",
                   "accounting": "exclusive self-time per device lane "
                                 "(scan wrapper charged only its own gap)",
                   "device_busy_ms_per_step": busy / 1000 / K,
                   "device_ms_per_step": dev_total / 1000 / K,
                   "weight_bytes": int(wbytes),
                   "roofline_model": "ms/step >= weight_bytes / 819e9 "
                                     "(weights re-read every step; KV read "
                                     "adds ctx*kv_bytes_per_token)",
                   "weights_roofline_ms_per_step": roof_ms,
                   "roofline_share": roof_ms / max(busy / 1000 / K, 1e-9),
                   "ops": out_rows,
                   "by_category": {k: v / 1000 for k, v in by_cat.items()}},
                  fh, indent=1)
    print("\nwrote benchmarks/profile_ar.json")


if __name__ == "__main__":
    main()
