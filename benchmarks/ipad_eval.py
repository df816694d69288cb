"""IPAD end-to-end quality artifact (round-4 review #7).

Runs the reference's full pipeline shape on a tiny fixture: teacher ->
staged prune(40% mlp)+distill with train_model finetune alternation
(block/upper/lower/full, distill_worker.py:344-430) -> exact reparam ->
SERVE the pruned student through the unmodified engine, and commits the
quality numbers:

- teacher ppl vs pruned+distilled student ppl on held-out text
  (reference batch_chat-style eval, distill_worker.py:1230-1332, replaced
  by a tokenizer-free ppl + greedy-agreement probe),
- engine-served greedy generations: teacher vs student token agreement.

Writes benchmarks/ipad_eval.json. CPU-runnable (tiny fixture; the same
pipeline scales by config).
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json

import numpy as np


def corpus_batches(vocab, bs=4, T=32, seed=0):
    """Real-text token stream (BPE corpus ids folded into the tiny vocab):
    structured data so distillation has something to preserve."""
    from benchmarks.bpe import load_default

    ids = load_default().encode(open(_os.path.join(
        _os.path.dirname(_os.path.abspath(__file__)), "corpus.txt"
    )).read())
    ids = np.asarray(ids) % (vocab - 2) + 1
    rng = np.random.default_rng(seed)
    n = len(ids) - T
    while True:
        offs = rng.integers(0, n, bs)
        yield np.stack([ids[o : o + T] for o in offs]).astype(np.int32)


def main():
    import jax

    if _os.environ.get("IPAD_CPU", "1") == "1":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp

    from painlessinferenceacceleration_tpu.config import EngineConfig, ModelConfig
    from painlessinferenceacceleration_tpu.engine.llm import LLM
    from painlessinferenceacceleration_tpu.engine.request import SamplingParams
    from painlessinferenceacceleration_tpu.ipad import (
        DistillPipe,
        DistillStage,
        Distiller,
        DistillConfig,
    )
    from painlessinferenceacceleration_tpu.models.base import init_params

    cfg = ModelConfig.tiny(num_hidden_layers=2, intermediate_size=64)
    teacher = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    steps = int(_os.environ.get("IPAD_STEPS", "60"))

    # pre-train the teacher on the corpus so it has real structure to
    # preserve (a random-weight teacher is near-uniform: ppl/agreement
    # deltas would be meaningless)
    import optax

    from painlessinferenceacceleration_tpu.ipad.train_forward import (
        forward_logits,
    )

    topt = optax.adamw(3e-3)
    tstate = topt.init(teacher)

    @jax.jit
    def tt_step(p, s, toks):
        def loss_fn(p):
            lg = forward_logits(p, cfg, toks)
            lp = jax.nn.log_softmax(lg[:, :-1], -1)
            return -jnp.mean(jnp.take_along_axis(
                lp, toks[:, 1:, None], axis=-1
            ))

        loss, g = jax.value_and_grad(loss_fn)(p)
        up, s = topt.update(g, s, p)
        return optax.apply_updates(p, up), s, loss

    tdata = corpus_batches(cfg.vocab_size, seed=1)
    tsteps = int(_os.environ.get("IPAD_TEACHER_STEPS", "300"))
    for _ in range(tsteps):
        teacher, tstate, tl = tt_step(
            teacher, tstate, jnp.asarray(next(tdata), jnp.int32)
        )
    print(f"# teacher pre-trained {tsteps} steps, final CE {float(tl):.3f}")

    pipe = DistillPipe(cfg, teacher, [
        DistillStage(mode="mlp", sparsity=0.4, steps=steps,
                     prune_steps=steps * 2 // 3),
        DistillStage(mode="finetune", steps=steps // 4,
                     finetune_mode="block", layer_indices=(0,)),
        DistillStage(mode="finetune", steps=steps // 4,
                     finetune_mode="upper"),
        DistillStage(mode="finetune", steps=steps // 4,
                     finetune_mode="lower"),
        DistillStage(mode="finetune", steps=steps // 2,
                     finetune_mode="full"),
    ])
    train = corpus_batches(cfg.vocab_size, seed=0)
    new_cfg, new_params, hist = pipe.run(train)
    d = pipe.distiller

    # quality probe on HELD-OUT text (different offsets)
    ev = d.evaluate(corpus_batches(cfg.vocab_size, seed=99), batches=8)
    sparsity = 1.0 - new_cfg.intermediate_size / cfg.intermediate_size

    # serve the pruned student through the unmodified engine, compare with
    # the teacher served the same way (greedy agreement over generations)
    ecfg = EngineConfig(page_size=16, max_seq_len=128, max_concurrency=4,
                        eos_token_id=-2)
    prompts = [next(corpus_batches(cfg.vocab_size, bs=1, T=16, seed=7))[0]
               .tolist() for _ in range(4)]
    sp = SamplingParams(max_new_tokens=24)
    t_out = [r.output_ids for r in LLM(
        cfg=cfg, params=teacher, ecfg=ecfg, dtype=jnp.float32
    ).generate(prompts, sp)]
    s_out = [r.output_ids for r in LLM(
        cfg=new_cfg, params=new_params, ecfg=ecfg, dtype=jnp.float32
    ).generate(prompts, sp)]
    agree = float(np.mean([
        np.mean([a == b for a, b in zip(t, s)]) for t, s in zip(t_out, s_out)
    ]))

    out = {
        "mlp_sparsity": round(sparsity, 3),
        "stages": ["mlp:0.4", "finetune:block[0]", "finetune:upper",
                   "finetune:lower", "finetune:full"],
        "train_steps": len(hist),
        "final_loss": round(hist[-1]["loss"], 4),
        "teacher_ppl": round(ev["teacher_ppl"], 3),
        "student_ppl": round(ev["student_ppl"], 3),
        "ppl_ratio": round(ev["student_ppl"] / ev["teacher_ppl"], 4),
        "top1_agreement": round(ev["top1_agreement"], 4),
        "engine_served": True,
        "engine_generation_agreement": round(agree, 4),
        "student_config": {
            "intermediate_size": new_cfg.intermediate_size,
            "hidden_size": new_cfg.hidden_size,
            "num_hidden_layers": new_cfg.num_hidden_layers,
        },
    }
    path = _os.environ.get("IPAD_JSON", _os.path.join(
        _os.path.dirname(_os.path.abspath(__file__)), "ipad_eval.json"
    ))
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
