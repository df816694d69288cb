"""FP8-KV capacity benchmark (round-4 review #3b).

The fp8 KV arena halves KV bytes; its purpose is capacity -> concurrency ->
serving throughput (reference: flood/csrc/quantize/fp8_quant.cu — the FP8
cache exists to double resident batch at fixed HBM). This bench fixes a KV
HBM budget, sizes the arena for bf16 vs fp8_tok (dynamic per-token scales,
the lossless-by-test default), reports how many full-length requests each
arena can hold, and serves a long-context workload at each arena's maximum
concurrency.

Usage: python benchmarks/bench_fp8_kv.py
Env: FP8KV_MODEL=7b-int4|tiny, FP8KV_BUDGET_GB (default 7),
     FP8KV_CTX (prompt len, default 1024), FP8KV_NEW (default 128),
     FP8KV_JSON (artifact path), FP8KV_CPU=1 (smoke)
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import dataclasses
import json
import sys
import time

import numpy as np


def main():
    import jax

    if _os.environ.get("FP8KV_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from painlessinferenceacceleration_tpu.config import EngineConfig, ModelConfig
    from painlessinferenceacceleration_tpu.engine.cache import kv_bytes_per_page
    from painlessinferenceacceleration_tpu.engine.llm import LLM
    from painlessinferenceacceleration_tpu.engine.request import SamplingParams
    from painlessinferenceacceleration_tpu.layers.linear import QuantSpec
    from painlessinferenceacceleration_tpu.models.base import (
        init_params,
        init_params_quantized,
    )

    model = _os.environ.get("FP8KV_MODEL", "7b-int4")
    budget = float(_os.environ.get("FP8KV_BUDGET_GB", "7")) * 1e9
    ctx = int(_os.environ.get("FP8KV_CTX", "1024"))
    new = int(_os.environ.get("FP8KV_NEW", "128"))
    if model == "7b-int4":
        cfg = dataclasses.replace(ModelConfig.llama2_7b(), vocab_size=32000)
        params = init_params_quantized(
            cfg, jax.random.PRNGKey(0), QuantSpec(bits=4, group=128)
        )
        quant_kw = dict(quant="int4", quant_group=128)
    else:
        cfg = ModelConfig.tiny()
        params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
        quant_kw = {}
        budget = float(_os.environ.get("FP8KV_BUDGET_GB", "0.001")) * 1e9
        ctx, new = min(ctx, 64), min(new, 16)
    jax.block_until_ready(params)

    msl = ctx + new + 64
    base = EngineConfig(page_size=64, max_seq_len=msl, max_concurrency=1,
                        prefill_chunk=512, eos_token_id=-2,
                        decode_burst=8, decode_burst_idle=32, **quant_kw)

    # long-context workload: corpus text slices (repeated to ctx tokens)
    try:
        from benchmarks.bpe import load_default

        ids = load_default().encode(open(_os.path.join(
            _os.path.dirname(_os.path.abspath(__file__)), "corpus.txt"
        )).read())
        ids = (np.asarray(ids) % (cfg.vocab_size - 2) + 1).tolist()
    except FileNotFoundError:
        ids = np.random.default_rng(0).integers(
            1, cfg.vocab_size - 1, 4096
        ).tolist()
    while len(ids) < ctx + 64:
        ids = ids + ids

    out = {"model": model, "kv_budget_gb": budget / 1e9, "ctx": ctx,
           "max_new": new,
           "note": "fp8 = static per-(layer,head) scales; fp8_tok = "
                   "dynamic per-token scales (no calibration, spec path "
                   "lossless-by-test) — both decode through Pallas SWAR "
                   "kernels (paged_attention / paged_attention_tok)"}
    modes = _os.environ.get("FP8KV_MODES", "none,fp8,fp8_tok").split(",")
    for kvq in modes:
        e1 = dataclasses.replace(base, kv_quant=kvq)
        per_page = kv_bytes_per_page(cfg, e1, jnp.bfloat16)
        n_pages = max(2, int(budget // per_page))
        per_req = e1.pages_per_req
        conc = max(1, (n_pages - 1) // per_req)
        n_req = 2 * conc
        e1 = dataclasses.replace(
            e1, num_pages=n_pages, max_concurrency=conc,
        )
        llm = LLM(cfg=cfg, params=params, ecfg=e1, dtype=jnp.bfloat16)
        rng = np.random.default_rng(3)
        prompts = [
            [int(x) for x in
             np.roll(ids[: ctx], int(rng.integers(0, 512)))[:ctx]]
            for _ in range(n_req)
        ]
        # warm compiles
        w = [llm.add_request(p[:ctx], SamplingParams(max_new_tokens=8))
             for p in prompts[: min(4, conc)]]
        while any(r.state != "finished" for r in w):
            llm.step()
        llm.metrics = type(llm.metrics)()
        reqs = [llm.add_request(p, SamplingParams(max_new_tokens=new))
                for p in prompts]
        t0 = time.perf_counter()
        while any(r.state != "finished" for r in reqs):
            llm.step()
        dt = time.perf_counter() - t0
        total = sum(len(r.output_ids) for r in reqs)
        m = llm.metrics
        out[kvq] = {
            "kv_bytes_per_page": int(per_page),
            "arena_pages": int(n_pages),
            "max_resident_requests": int(conc),
            "requests": n_req,
            "generated_tokens": int(total),
            "wall_s": round(dt, 2),
            "tok_per_s": round(total / dt, 1),
            "prefill_s": round(m.prefill_time, 2),
            "decode_s": round(m.decode_time, 2),
            "preempted": int(m.preempted),
        }
        print(f"[{kvq}] pages={n_pages} residents={conc} "
              f"-> {total/dt:.1f} tok/s ({n_req} reqs, {dt:.1f}s)",
              file=sys.stderr)
        del llm
    for fm in ("fp8", "fp8_tok"):
        if "none" in out and fm in out:
            out[f"{fm}_capacity_ratio"] = round(
                out[fm]["max_resident_requests"]
                / max(out["none"]["max_resident_requests"], 1), 2,
            )
            out[f"{fm}_throughput_ratio"] = round(
                out[fm]["tok_per_s"] / max(out["none"]["tok_per_s"], 1e-9),
                3,
            )
    path = _os.environ.get("FP8KV_JSON", _os.path.join(
        _os.path.dirname(_os.path.abspath(__file__)), "fp8_kv_capacity.json"
    ))
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
