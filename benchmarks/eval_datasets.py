"""CLI: dataset perf_check (reference lookahead/benchmarks/benchmark.py:243).

  python benchmarks/eval_datasets.py dolly [gsm8k humaneval ...]

Env:
  DATA_DIR   — directory holding <name>/test.jsonl + <name>/train.jsonl
               (produced by benchmarks.datasets.preprocess_*). When unset or
               missing, the synthetic stand-in corpus is used (see
               benchmarks/datasets.py module docstring for why that is
               statistically honest for acceptance rates).
  EVAL_MODEL — tiny (default, CPU-friendly) | 1b-bf16 | 7b-int4
  EVAL_CPU=1 — force the CPU backend
  EVAL_NEW   — max_new_tokens (default 64)
  EVAL_N     — number of test prompts (default 24)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.datasets import eval_lookahead, load_jsonl, stand_in


def main():
    names = sys.argv[1:] or ["dolly"]
    import jax

    if os.environ.get("EVAL_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
    import dataclasses

    import jax.numpy as jnp

    from painlessinferenceacceleration_tpu.config import (
        EngineConfig,
        ModelConfig,
    )
    from painlessinferenceacceleration_tpu.layers.linear import QuantSpec
    from painlessinferenceacceleration_tpu.lookahead.generate import (
        LookaheadGenerator,
    )
    from painlessinferenceacceleration_tpu.models.base import (
        init_params,
        init_params_quantized,
    )

    model = os.environ.get("EVAL_MODEL", "tiny")
    if model == "tiny":
        cfg, spec, dtype = ModelConfig.tiny(), None, jnp.float32
        cfg = dataclasses.replace(cfg, vocab_size=2048)
    elif model == "1b-bf16":
        cfg, spec, dtype = ModelConfig.tinyllama_1b(), None, jnp.bfloat16
    elif model == "7b-int4":
        cfg = ModelConfig.llama2_7b()
        spec, dtype = QuantSpec(bits=4, group=128), jnp.bfloat16
    else:
        raise SystemExit(f"unknown EVAL_MODEL {model}")
    if spec is None:
        params = init_params(cfg, jax.random.PRNGKey(0), dtype=dtype)
    else:
        params = init_params_quantized(cfg, jax.random.PRNGKey(0), spec)

    n = int(os.environ.get("EVAL_N", "24"))
    new = int(os.environ.get("EVAL_NEW", "64"))
    data_dir = os.environ.get("DATA_DIR", "")
    results = {}
    for name in names:
        tpath = os.path.join(data_dir, name, "test.jsonl") if data_dir else ""
        if tpath and os.path.exists(tpath):
            test = load_jsonl(tpath, limit=n)
            train = load_jsonl(
                os.path.join(data_dir, name, "train.jsonl"), limit=4 * n
            )
            source = "real"
        else:
            test, train = stand_in(name, n_test=n, n_train=4 * n)
            source = "stand-in"
        ecfg = EngineConfig(
            page_size=64, max_seq_len=2048, max_concurrency=1,
            eos_token_id=-2,
        )
        gen = LookaheadGenerator(params, cfg, ecfg=ecfg, quant=spec,
                                 dtype=dtype)
        r = eval_lookahead(gen, test, train, cfg.vocab_size,
                           max_new_tokens=new)
        r["source"] = source
        results[name] = r
        print(f"{name} ({source}): x{r['speedup']:.2f} "
              f"({r['lookahead_tps']:.1f} vs {r['ar_tps']:.1f} tok/s), "
              f"edl {r['mean_edl']:.2f}, exact {r['exact_match']:.2f}, "
              f"rouge-L {r['rouge_l']:.4f}", flush=True)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
