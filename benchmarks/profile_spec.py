"""Per-op device-time breakdown of one lookahead SPEC step (7B INT4).

Companion to profile_ar.py for the speculative path: retrieve -> tree
verify (width Q) -> accept/compact -> table update, all inside
multistep_spec_decode. Prints ms/step by op and writes
benchmarks/profile_spec.json.

Usage: python benchmarks/profile_spec.py [K] (TPU; serialize with other TPU jobs)
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
    from painlessinferenceacceleration_tpu.engine.multistep import (
        multistep_spec_decode,
    )
    from painlessinferenceacceleration_tpu.engine.step import prefill_step
    from painlessinferenceacceleration_tpu.layers.linear import QuantSpec
    from painlessinferenceacceleration_tpu.lookahead.device_tables import (
        DraftTableConfig,
        init_draft_tables,
        update_tables_seq,
    )
    from painlessinferenceacceleration_tpu.models.base import init_params_quantized

    K = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    vocab = int(os.environ.get("BENCH_VOCAB", "32000"))
    bits = int(os.environ.get("BENCH_BITS", "4"))
    branch_len = int(os.environ.get("BENCH_BRANCH_LEN", "12"))
    retrieve = int(os.environ.get("BENCH_RETRIEVE", "4"))
    import dataclasses

    cfg = dataclasses.replace(ModelConfig.llama2_7b(), vocab_size=vocab)
    spec = QuantSpec(bits=bits, group=128)
    params = init_params_quantized(cfg, jax.random.PRNGKey(0), spec)
    jax.block_until_ready(params)
    ecfg = EngineConfig(page_size=64, max_seq_len=4096, max_concurrency=1)
    tcfg = DraftTableConfig(
        buckets=16384, ways=8, branch_length=branch_len,
        retrieve_count=retrieve,
    )
    kv = init_kv_cache(cfg, ecfg, dtype=jnp.bfloat16)
    tables = init_draft_tables(tcfg)
    P = ecfg.pages_per_req
    pt = jnp.arange(1, 1 + P, dtype=jnp.int32)[None]
    prompt = np.random.default_rng(0).integers(10, vocab - 10, size=512).tolist()
    kv, nxt, _ = prefill_step(
        params, kv, cfg, jnp.array([prompt], jnp.int32),
        jnp.zeros((1,), jnp.int32), jnp.array([len(prompt)], jnp.int32), pt,
        spec,
    )
    seed = jnp.asarray(np.array(prompt + [int(nxt[0])], np.int32))
    tables = update_tables_seq(tables, tcfg, seed, jnp.int32(len(prompt) + 1))
    TAIL = branch_len + 2
    tail = jnp.asarray(
        np.array(prompt[-TAIL + 1:] + [int(nxt[0])], np.int32)[None]
    )
    ctx0 = jnp.array([len(prompt)], jnp.int32)
    ones = jnp.ones((1,), bool)

    def run(kv, tables, last, ctx, tail):
        return multistep_spec_decode(
            params, kv, tables, cfg, tcfg, last, ctx, ones, tail, pt,
            n_steps=K, spec=spec,
        )

    kv, tables, out, nacc, last, ctx, act, tail, _ = run(kv, tables, nxt, ctx0, tail)
    np.asarray(nacc[0, -1])
    tdir = "/tmp/profile_spec"
    with jax.profiler.trace(tdir):
        kv, tables, out, nacc, last, ctx, act, tail, _ = run(
            kv, tables, last, ctx, tail
        )
        np.asarray(nacc[0, -1])

    f = sorted(glob.glob(tdir + "/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(f) as fh:
        tr = json.load(fh)
    ev = tr["traceEvents"]
    pid_name = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_name.items() if "TPU" in n or "/device" in n}
    total_jit = 0.0
    by_op = defaultdict(float)
    for e in ev:
        if e.get("ph") != "X":
            continue
        name = e.get("name", "")
        if name.startswith("jit_"):
            total_jit += e["dur"]
            continue
        if e.get("pid") not in dev_pids:
            continue
        base = re.sub(r"[.\d]+$", "", name)
        by_op[base] += e["dur"]

    dev_total = sum(by_op.values())
    Q = 1 + retrieve * branch_len
    print(f"spec step: Q={Q} K={K}; jit wall {total_jit/1000:.1f} ms "
          f"-> {total_jit/1000/K:.3f} ms/step")
    print(f"device op total {dev_total/1000:.1f} ms -> {dev_total/1000/K:.3f} ms/step")
    rows = sorted(by_op.items(), key=lambda kv: -kv[1])
    out_rows = []
    print(f"\n{'op':60s} {'ms/step':>9s} {'%':>6s}")
    for name, dur in rows[:30]:
        pct = 100 * dur / max(dev_total, 1e-9)
        print(f"{name[:60]:60s} {dur/1000/K:9.4f} {pct:6.2f}")
        out_rows.append({"op": name, "ms_per_step": dur / 1000 / K, "pct": pct})
    with open(os.path.join(os.path.dirname(__file__), "profile_spec.json"), "w") as fh:
        json.dump({"K": K, "Q": Q, "vocab": vocab, "bits": bits,
                   "jit_ms_per_step": total_jit / 1000 / K,
                   "device_ms_per_step": dev_total / 1000 / K,
                   "ops": out_rows}, fh, indent=1)
    print("\nwrote benchmarks/profile_spec.json")


if __name__ == "__main__":
    main()
