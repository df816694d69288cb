"""IPAD prune+distill: loss decreases, masks prune, reparam is faithful."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from painlessinferenceacceleration_tpu.config import ModelConfig
from painlessinferenceacceleration_tpu.ipad import DistillConfig, Distiller
from painlessinferenceacceleration_tpu.ipad.train_forward import forward_logits
from painlessinferenceacceleration_tpu.models.base import init_params


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig.tiny(num_hidden_layers=2, intermediate_size=64)
    teacher = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    return cfg, teacher


def batches(cfg, bs=4, T=16, seed=0):
    rng = np.random.default_rng(seed)
    while True:
        yield rng.integers(1, cfg.vocab_size - 1, size=(bs, T)).astype(np.int32)


def test_distill_loss_decreases(setup):
    cfg, teacher = setup
    # student starts perturbed
    student = jax.tree.map(
        lambda x: x + 0.02 * jax.random.normal(jax.random.PRNGKey(9), x.shape),
        teacher,
    )
    d = Distiller(
        cfg, teacher,
        DistillConfig(lr=3e-4, target_mlp_sparsity=0.0, total_steps=30),
        student_params=student,
    )
    hist = d.fit(batches(cfg), steps=30)
    first = np.mean([h["loss"] for h in hist[:5]])
    last = np.mean([h["loss"] for h in hist[-5:]])
    assert last < first, (first, last)


def test_progressive_pruning_and_reparam(setup):
    cfg, teacher = setup
    d = Distiller(
        cfg, teacher,
        DistillConfig(lr=1e-4, target_mlp_sparsity=0.5, prune_steps=10,
                      total_steps=20),
    )
    d.fit(batches(cfg), steps=20)
    mask = np.asarray(d.masks["mlp"])
    assert (mask.sum(axis=1) == cfg.intermediate_size // 2).all()

    new_cfg, new_params = d.reparam()
    assert new_cfg.intermediate_size == cfg.intermediate_size // 2
    # reparam'd model == masked model, exactly
    toks = jnp.asarray(next(batches(cfg, seed=3)), jnp.int32)
    masked = forward_logits(d.student, cfg, toks, d.masks)
    dense = forward_logits(new_params, new_cfg, toks)
    np.testing.assert_allclose(
        np.asarray(masked), np.asarray(dense), rtol=2e-4, atol=2e-4
    )


def test_head_and_depth_pruning_and_reparam():
    """Head (kv-group) + depth pruning: masks reach target, reparam'd dense
    model matches the masked model exactly (reference clip_layer :725,
    SparseAttn sparse_module.py)."""
    cfg = ModelConfig.tiny(
        num_hidden_layers=4, intermediate_size=64,
        num_attention_heads=8, num_key_value_heads=4,
    )
    teacher = init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    d = Distiller(
        cfg, teacher,
        DistillConfig(lr=1e-4, target_mlp_sparsity=0.25,
                      target_head_sparsity=0.5, target_depth_sparsity=0.25,
                      prune_steps=8, total_steps=12),
    )
    d.fit(batches(cfg), steps=12)
    hm = np.asarray(d.masks["head"]).reshape(cfg.num_hidden_layers, 4, 2)
    assert (hm.max(-1).sum(1) == 2).all()  # 2 of 4 kv groups kept, per layer
    assert np.asarray(d.masks["layer"]).sum() == 3  # 1 of 4 layers dropped

    new_cfg, new_params = d.reparam()
    assert new_cfg.num_hidden_layers == 3
    assert new_cfg.num_key_value_heads == 2
    assert new_cfg.num_attention_heads == 4
    assert new_cfg.intermediate_size == 48
    toks = jnp.asarray(next(batches(cfg, seed=7)), jnp.int32)
    masked = forward_logits(d.student, cfg, toks, d.masks)
    dense = forward_logits(new_params, new_cfg, toks)
    np.testing.assert_allclose(
        np.asarray(masked), np.asarray(dense), rtol=2e-4, atol=2e-4
    )

    # and the pruned model serves in the unmodified engine
    from painlessinferenceacceleration_tpu.config import EngineConfig
    from painlessinferenceacceleration_tpu.engine.llm import LLM
    from painlessinferenceacceleration_tpu.engine.request import SamplingParams

    ecfg = EngineConfig(page_size=16, max_seq_len=128, max_concurrency=2,
                        eos_token_id=-2)
    llm = LLM(cfg=new_cfg, params=new_params, ecfg=ecfg, dtype=jnp.float32)
    out = llm.generate([[5, 6, 7]], SamplingParams(max_new_tokens=6))[0]
    assert len(out.output_ids) == 6


def test_dim_pruning_and_reparam():
    """Hidden-dim (residual width) pruning: the masked student matches the
    E-sliced model EXACTLY thanks to the kept-dim RMSNorm (reference dim
    mode, distill_worker.py:243-342)."""
    cfg = ModelConfig.tiny(num_hidden_layers=2, intermediate_size=64)
    teacher = init_params(cfg, jax.random.PRNGKey(2), dtype=jnp.float32)
    d = Distiller(
        cfg, teacher,
        DistillConfig(lr=1e-4, target_mlp_sparsity=0.0,
                      target_dim_sparsity=0.25, prune_steps=6, total_steps=8),
    )
    d.fit(batches(cfg), steps=8)
    dm = np.asarray(d.masks["dim"])
    assert dm.sum() == cfg.hidden_size - cfg.hidden_size // 4

    new_cfg, new_params = d.reparam()
    assert new_cfg.hidden_size == cfg.hidden_size - cfg.hidden_size // 4
    assert new_cfg.head_dim == cfg.head_dim  # heads keep their width
    toks = jnp.asarray(next(batches(cfg, seed=11)), jnp.int32)
    masked = forward_logits(d.student, cfg, toks, d.masks)
    dense = forward_logits(new_params, new_cfg, toks)
    np.testing.assert_allclose(
        np.asarray(masked), np.asarray(dense), rtol=2e-4, atol=2e-4
    )


def test_hidden_loss_checkpoint_eval(tmp_path, setup):
    """Hidden-state loss trains, save/load round-trips exactly, evaluate
    reports sane ppl/agreement (reference _calc_loss :583, ckpt :1341,
    chat eval :1230-1332)."""
    cfg, teacher = setup
    d = Distiller(
        cfg, teacher,
        DistillConfig(lr=1e-4, hidden_weight=0.5, target_mlp_sparsity=0.25,
                      prune_steps=4, total_steps=8),
    )
    d.fit(batches(cfg), steps=4)
    assert all("hidden" in h for h in d.history)
    ckpt = str(tmp_path / "distill.ckpt")
    d.save(ckpt)

    d2 = Distiller(
        cfg, teacher,
        DistillConfig(lr=1e-4, hidden_weight=0.5, target_mlp_sparsity=0.25,
                      prune_steps=4, total_steps=8),
    )
    d2.load(ckpt)
    assert d2.step_idx == d.step_idx
    # resumed run == continued run (same data stream), bit-for-bit params
    ds = batches(cfg, seed=21)
    ds2 = batches(cfg, seed=21)
    d.fit(ds, steps=2)
    d2.fit(ds2, steps=2)
    for a, b in zip(jax.tree.leaves(d.student), jax.tree.leaves(d2.student)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    ev = d.evaluate(batches(cfg, seed=33), batches=2)
    assert ev["teacher_ppl"] > 0 and ev["student_ppl"] > 0
    assert 0.0 <= ev["top1_agreement"] <= 1.0


def test_pruned_model_runs_in_engine(setup):
    cfg, teacher = setup
    from painlessinferenceacceleration_tpu.config import EngineConfig
    from painlessinferenceacceleration_tpu.engine.llm import LLM
    from painlessinferenceacceleration_tpu.engine.request import SamplingParams

    d = Distiller(
        cfg, teacher,
        DistillConfig(lr=1e-4, target_mlp_sparsity=0.5, prune_steps=5, total_steps=6),
    )
    d.fit(batches(cfg), steps=6)
    new_cfg, new_params = d.reparam()
    ecfg = EngineConfig(page_size=16, max_seq_len=128, max_concurrency=2, eos_token_id=-2)
    llm = LLM(cfg=new_cfg, params=new_params, ecfg=ecfg, dtype=jnp.float32)
    out = llm.generate([[5, 6, 7]], SamplingParams(max_new_tokens=6))[0]
    assert len(out.output_ids) == 6


def test_teacher_logit_disk_cache(tmp_path, setup):
    """Disk-cached teacher logits (reference calc_logit/load_logit
    :1080-1170): cache files appear, a second epoch reuses them, training
    trajectory is identical with and without the cache."""
    import os

    cfg, teacher = setup
    cache = str(tmp_path / "tcache")
    d1 = Distiller(cfg, teacher,
                   DistillConfig(lr=1e-4, target_mlp_sparsity=0.0,
                                 total_steps=4))
    d1.fit(batches(cfg, seed=5), steps=2, cache_dir=cache)
    files = os.listdir(cache)
    assert len(files) == 2
    d1.fit(batches(cfg, seed=5), steps=2, cache_dir=cache)  # same stream
    assert len(os.listdir(cache)) == 2  # reused, not re-added

    d2 = Distiller(cfg, teacher,
                   DistillConfig(lr=1e-4, target_mlp_sparsity=0.0,
                                 total_steps=4))
    d2.fit(batches(cfg, seed=5), steps=2)
    d2.fit(batches(cfg, seed=5), steps=2)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(d1.student)[0]),
        np.asarray(jax.tree.leaves(d2.student)[0]), rtol=2e-6, atol=2e-6,
    )


def test_distill_pipe_stages(setup):
    """DistillPipe (reference distill_worker.py:1447): mlp-prune stage, then
    head-prune stage, then finetune; masks accumulate and the final reparam
    carries both prunings."""
    from painlessinferenceacceleration_tpu.ipad.distill import (
        DistillPipe,
        DistillStage,
    )

    cfg = ModelConfig.tiny(
        num_hidden_layers=2, intermediate_size=64,
        num_attention_heads=8, num_key_value_heads=4,
    )
    teacher = init_params(cfg, jax.random.PRNGKey(3), dtype=jnp.float32)
    pipe = DistillPipe(cfg, teacher, [
        DistillStage(mode="mlp", sparsity=0.5, steps=6, prune_steps=4),
        DistillStage(mode="head", sparsity=0.5, steps=6, prune_steps=4),
        DistillStage(mode="finetune", steps=4, lr=5e-5),
    ])
    new_cfg, new_params, hist = pipe.run(batches(cfg, seed=9))
    assert len(hist) == 16
    assert new_cfg.intermediate_size == 32  # mlp stage survived head stage
    assert new_cfg.num_key_value_heads == 2
    # the pipelined model serves
    from painlessinferenceacceleration_tpu.config import EngineConfig
    from painlessinferenceacceleration_tpu.engine.llm import LLM
    from painlessinferenceacceleration_tpu.engine.request import SamplingParams

    ecfg = EngineConfig(page_size=16, max_seq_len=128, max_concurrency=2,
                        eos_token_id=-2)
    llm = LLM(cfg=new_cfg, params=new_params, ecfg=ecfg, dtype=jnp.float32)
    out = llm.generate([[5, 6, 7]], SamplingParams(max_new_tokens=6))[0]
    assert len(out.output_ids) == 6


def test_finetune_modes_freeze_correct_sets(setup):
    """Reference train_model trainable sets (distill_worker.py:344-430):
    block freezes head/norm/embed; upper freezes embed; lower freezes
    head/norm; layer_indices freeze the other layers. Frozen leaves must be
    bit-identical after training (grads AND weight decay masked)."""
    cfg, teacher = setup
    d = Distiller(
        cfg, teacher,
        DistillConfig(lr=3e-3, target_mlp_sparsity=0.0, total_steps=4),
    )

    def snap():
        return jax.tree.map(np.asarray, d.student)

    def diff(a, b):
        return jax.tree.map(
            lambda x, y: float(np.abs(x - y).max()), a, b
        )

    # block mode on layer 0 only: embed, final_ln, lm_head and layer 1 frozen
    d.set_finetune("block", layer_indices=(0,))
    before = snap()
    d.fit(batches(cfg), steps=4)
    after = snap()
    dd = diff(before, after)
    assert dd["embed"] == 0.0 and dd["final_ln"] == 0.0
    for k, delta in dd["layers"].items():
        pass  # per-leaf deltas are max over layers; check per-layer below
    for k in before["layers"]:
        per_layer = np.abs(
            before["layers"][k] - after["layers"][k]
        ).reshape(cfg.num_hidden_layers, -1).max(axis=1)
        assert per_layer[1] == 0.0, (k, per_layer)  # layer 1 frozen
    moved = sum(
        np.abs(before["layers"][k] - after["layers"][k]).max()
        for k in before["layers"]
    )
    assert moved > 0.0  # layer 0 actually trained

    # upper mode: head+norm train, embed frozen
    d.set_finetune("upper")
    before = snap()
    d.fit(batches(cfg), steps=4)
    after = snap()
    dd = diff(before, after)
    assert dd["embed"] == 0.0
    assert dd["final_ln"] > 0.0 or dd.get("lm_head", 0.0) > 0.0

    # lower mode: embed trains, head/norm frozen
    d.set_finetune("lower")
    before = snap()
    d.fit(batches(cfg), steps=4)
    after = snap()
    dd = diff(before, after)
    assert dd["embed"] > 0.0
    assert dd["final_ln"] == 0.0


def test_staged_pipeline_prune_then_finetune_alternation(setup):
    """DistillPipe with the reference's prune -> finetune alternation
    (full/block/upper/lower staging around a 40% mlp prune); the reparam'd
    student must serve and match the masked student exactly."""
    from painlessinferenceacceleration_tpu.ipad import DistillPipe, DistillStage

    cfg, teacher = setup
    pipe = DistillPipe(cfg, teacher, [
        DistillStage(mode="mlp", sparsity=0.4, steps=8, prune_steps=6),
        DistillStage(mode="finetune", steps=3, finetune_mode="block",
                     layer_indices=(0,)),
        DistillStage(mode="finetune", steps=3, finetune_mode="upper"),
        DistillStage(mode="finetune", steps=3, finetune_mode="lower"),
        DistillStage(mode="finetune", steps=3, finetune_mode="full"),
    ])
    new_cfg, new_params, hist = pipe.run(batches(cfg))
    kept = cfg.intermediate_size - int(cfg.intermediate_size * 0.4)
    assert new_cfg.intermediate_size == kept, new_cfg.intermediate_size
    assert len(hist) == 8 + 3 * 4
    toks = jnp.asarray(next(batches(cfg, seed=5)), jnp.int32)
    d = pipe.distiller
    masked = forward_logits(d.student, cfg, toks, d.masks)
    dense = forward_logits(new_params, new_cfg, toks)
    np.testing.assert_allclose(
        np.asarray(masked), np.asarray(dense), rtol=2e-4, atol=2e-4
    )
