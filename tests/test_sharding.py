"""Multi-device sharding on the 8-device virtual CPU mesh.

The reference has no automated distributed test at all (SURVEY.md §4 —
only a manual 2-node example). Here: full prefill+verify steps over a
(data, model) mesh, outputs must match the single-device run exactly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from painlessinferenceacceleration_tpu.config import EngineConfig, ModelConfig
from painlessinferenceacceleration_tpu.engine.cache import init_kv_cache
from painlessinferenceacceleration_tpu.engine.step import (
    decode_inputs,
    prefill_step,
    verify_step,
)
from painlessinferenceacceleration_tpu.models.base import init_params
from painlessinferenceacceleration_tpu.parallel import (
    make_mesh,
    shard_kv,
    shard_params,
)


@pytest.fixture(scope="module")
def setup():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = ModelConfig.tiny(num_key_value_heads=4, num_attention_heads=8)
    ecfg = EngineConfig(page_size=16, max_seq_len=128, max_concurrency=8)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    return cfg, ecfg, params


def _run(cfg, ecfg, params, kv, B):
    P = ecfg.pages_per_req
    pt = jnp.arange(1, 1 + B * P, dtype=jnp.int32).reshape(B, P)
    toks = jnp.tile(jnp.arange(5, 5 + 6, dtype=jnp.int32)[None], (B, 1))
    kv, nxt, logits = prefill_step(
        params, kv, cfg, toks, jnp.zeros((B,), jnp.int32),
        jnp.full((B,), 6, jnp.int32), pt,
    )
    ctx = jnp.full((B,), 6, jnp.int32)
    t, p, qm, par = decode_inputs(nxt, ctx)
    kv, ot, na = verify_step(
        params, kv, cfg, t, p, qm, par, pt, ctx, jnp.ones((B,), bool)
    )
    return np.asarray(nxt), np.asarray(ot[:, 0]), np.asarray(logits)


def test_tp_dp_matches_single_device(setup):
    cfg, ecfg, params = setup
    B = 4
    kv = init_kv_cache(cfg, ecfg, dtype=jnp.float32)
    ref_nxt, ref_dec, ref_logits = _run(cfg, ecfg, params, kv, B)

    mesh = make_mesh((2, 4))
    sp = shard_params(params, cfg, mesh)
    skv = shard_kv(init_kv_cache(cfg, ecfg, dtype=jnp.float32), cfg, mesh)
    got_nxt, got_dec, got_logits = _run(cfg, ecfg, sp, skv, B)

    np.testing.assert_array_equal(ref_nxt, got_nxt)
    np.testing.assert_array_equal(ref_dec, got_dec)
    np.testing.assert_allclose(ref_logits, got_logits, rtol=1e-4, atol=1e-4)


def test_pure_tp_mesh(setup):
    cfg, ecfg, params = setup
    B = 2
    kv = init_kv_cache(cfg, ecfg, dtype=jnp.float32)
    ref_nxt, ref_dec, _ = _run(cfg, ecfg, params, kv, B)
    mesh = make_mesh((1, 8))
    sp = shard_params(params, cfg, mesh)
    skv = shard_kv(init_kv_cache(cfg, ecfg, dtype=jnp.float32), cfg, mesh)
    got_nxt, got_dec, _ = _run(cfg, ecfg, sp, skv, B)
    np.testing.assert_array_equal(ref_nxt, got_nxt)
    np.testing.assert_array_equal(ref_dec, got_dec)


# --- non-dense model families over the mesh (round-1 review Weak #4:
# param_shardings used to crash on anything that wasn't the dense llama
# class; every family must now shard AND run bit-identically) ---

MOE_CFG = dict(
    model_type="qwen3_moe", vocab_size=128, hidden_size=64,
    intermediate_size=96, moe_intermediate_size=64, num_hidden_layers=2,
    num_attention_heads=8, num_key_value_heads=4, num_experts=4,
    num_experts_per_tok=2, moe_layer_start=0,
)
MLA_CFG = dict(
    model_type="deepseek_v3", vocab_size=128, hidden_size=64,
    intermediate_size=96, moe_intermediate_size=48, num_hidden_layers=2,
    num_attention_heads=4, num_key_value_heads=4, kv_lora_rank=32,
    qk_nope_head_dim=16, qk_rope_head_dim=8, v_head_dim=16,
    moe_layer_start=1, num_experts=4, num_experts_per_tok=2,
    num_shared_experts=1, scoring_func="sigmoid", mla_latent_cache=True,
)


def _family_roundtrip(cfg):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    ecfg = EngineConfig(page_size=16, max_seq_len=128, max_concurrency=8)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    B = 2
    kv = init_kv_cache(cfg, ecfg, dtype=jnp.float32)
    ref_nxt, ref_dec, _ = _run(cfg, ecfg, params, kv, B)

    mesh = make_mesh((2, 4))
    sp = shard_params(params, cfg, mesh)
    skv = shard_kv(init_kv_cache(cfg, ecfg, dtype=jnp.float32), cfg, mesh)
    got_nxt, got_dec, _ = _run(cfg, ecfg, sp, skv, B)
    np.testing.assert_array_equal(ref_nxt, got_nxt)
    np.testing.assert_array_equal(ref_dec, got_dec)


def test_moe_tp_matches_single_device():
    _family_roundtrip(ModelConfig(**MOE_CFG))


def test_mla_latent_tp_matches_single_device():
    _family_roundtrip(ModelConfig(**MLA_CFG))


def test_hybrid_linear_attn_tp_matches_single_device():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from painlessinferenceacceleration_tpu.engine.llm import LLM
    from painlessinferenceacceleration_tpu.engine.request import SamplingParams

    cfg = ModelConfig(
        model_type="bailing_moe_linear", vocab_size=128, hidden_size=64,
        intermediate_size=96, num_hidden_layers=4, num_attention_heads=8,
        num_key_value_heads=8, layer_group_size=4, linear_attention=True,
    )
    from painlessinferenceacceleration_tpu.models.linear_attn import (
        init_hybrid_params,
    )

    params = init_hybrid_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    ecfg = EngineConfig(page_size=16, max_seq_len=128, max_concurrency=4,
                        eos_token_id=-2)
    prompts = [[5, 6, 7], [9, 10, 11, 12]]
    expect = [
        o.output_ids
        for o in LLM(cfg=cfg, params=params, ecfg=ecfg, dtype=jnp.float32)
        .generate(prompts, SamplingParams(max_new_tokens=8))
    ]

    mesh = make_mesh((1, 8))
    sp = shard_params(params, cfg, mesh)
    llm = LLM(cfg=cfg, params=sp, ecfg=ecfg, dtype=jnp.float32)
    llm.kv = shard_kv(llm.kv, cfg, mesh)
    got = [o.output_ids
           for o in llm.generate(prompts, SamplingParams(max_new_tokens=8))]
    assert got == expect


def test_expert_parallel_matches_replicated():
    """EP (SURVEY §2.5): expert axis sharded over 'model', dense
    all-experts einsum + psum (models/moe.py). Outputs must match the
    unsharded scan-over-experts path closely (reduction order differs)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import dataclasses

    base = ModelConfig(**MOE_CFG)
    base = dataclasses.replace(base, mla_latent_cache=False)
    # drop MLA bits: plain qwen3-moe-style dense attention + moe mlp
    cfg_rep = dataclasses.replace(
        base, q_lora_rank=0, kv_lora_rank=0, qk_nope_head_dim=0,
        qk_rope_head_dim=0, model_type="qwen3_moe",
    )
    ecfg = EngineConfig(page_size=16, max_seq_len=128, max_concurrency=8)
    params = init_params(cfg_rep, jax.random.PRNGKey(0), dtype=jnp.float32)
    B = 2
    kv = init_kv_cache(cfg_rep, ecfg, dtype=jnp.float32)
    ref_nxt, ref_dec, ref_logits = _run(cfg_rep, ecfg, params, kv, B)

    cfg_ep = dataclasses.replace(cfg_rep, expert_parallel=True)
    mesh = make_mesh((2, 4))
    sp = shard_params(params, cfg_ep, mesh)
    # expert axis is sharded 4-way
    X = cfg_ep.num_experts
    leaf = sp["moe_layers"]["moe_wgu"]
    assert leaf.sharding.shard_shape(leaf.shape)[1] == X // 4
    skv = shard_kv(init_kv_cache(cfg_ep, ecfg, dtype=jnp.float32), cfg_ep, mesh)
    got_nxt, got_dec, got_logits = _run(cfg_ep, ecfg, sp, skv, B)
    np.testing.assert_allclose(ref_logits, got_logits, rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(ref_nxt, got_nxt)
    np.testing.assert_array_equal(ref_dec, got_dec)


def _ep_cfg(n_experts, k, model_type="qwen3_moe"):
    import dataclasses

    base = ModelConfig(**MOE_CFG)
    base = dataclasses.replace(base, mla_latent_cache=False)
    return dataclasses.replace(
        base, q_lora_rank=0, kv_lora_rank=0, qk_nope_head_dim=0,
        qk_rope_head_dim=0, model_type=model_type, num_experts=n_experts,
        num_experts_per_tok=k,
    )


def test_expert_parallel_routed_matches_replicated():
    """Routed EP (VERDICT r2 #4; reference fused_experts,
    flood/layers/moe.py:675): with an ambient mesh set, the EP path runs
    the shard_map routed grouped-GEMM (each shard computes ONLY the rows
    top-k-routed to its local experts; remote rows dropped into the
    moe_align overflow bin) + one psum. Token- and logit-parity vs the
    unsharded scan-over-experts path at X=64."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg_rep = _ep_cfg(n_experts=64, k=4)
    ecfg = EngineConfig(page_size=16, max_seq_len=128, max_concurrency=8)
    params = init_params(cfg_rep, jax.random.PRNGKey(0), dtype=jnp.float32)
    B = 2
    kv = init_kv_cache(cfg_rep, ecfg, dtype=jnp.float32)
    ref_nxt, ref_dec, ref_logits = _run(cfg_rep, ecfg, params, kv, B)

    import dataclasses

    cfg_ep = dataclasses.replace(cfg_rep, expert_parallel=True)
    mesh = make_mesh((2, 4))
    sp = shard_params(params, cfg_ep, mesh)
    skv = shard_kv(init_kv_cache(cfg_ep, ecfg, dtype=jnp.float32), cfg_ep, mesh)
    with jax.set_mesh(mesh):  # ambient mesh -> routed shard_map path
        got_nxt, got_dec, got_logits = _run(cfg_ep, ecfg, sp, skv, B)
    np.testing.assert_allclose(ref_logits, got_logits, rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(ref_nxt, got_nxt)
    np.testing.assert_array_equal(ref_dec, got_dec)


def test_expert_parallel_routed_quantized_experts():
    """Routed EP over weight-only INT8 experts (grouped_quant_matmul):
    parity vs the unsharded scan path over the SAME quantized params
    (reference quantized fused_experts, flood/layers/moe.py:675)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import dataclasses

    from painlessinferenceacceleration_tpu.layers.linear import QuantSpec
    from painlessinferenceacceleration_tpu.models.moe import _make_expert

    cfg_rep = _ep_cfg(n_experts=16, k=2)
    spec = QuantSpec(bits=8, group=32)
    ecfg = EngineConfig(page_size=16, max_seq_len=128, max_concurrency=8)
    params = init_params(cfg_rep, jax.random.PRNGKey(0), dtype=jnp.float32)
    # quantize ONLY the stacked expert leaves (per-layer vmap)
    ml = dict(params["moe_layers"])
    for name in ("moe_wgu", "moe_wdown"):
        ml[name] = jax.vmap(lambda w: _make_expert(w, spec))(ml[name])
    params = {**params, "moe_layers": ml}

    B = 2
    kv = init_kv_cache(cfg_rep, ecfg, dtype=jnp.float32)

    def run(cfg, p, kv):
        P = ecfg.pages_per_req
        pt = jnp.arange(1, 1 + B * P, dtype=jnp.int32).reshape(B, P)
        toks = jnp.tile(jnp.arange(5, 5 + 6, dtype=jnp.int32)[None], (B, 1))
        kv, nxt, logits = prefill_step(
            p, kv, cfg, toks, jnp.zeros((B,), jnp.int32),
            jnp.full((B,), 6, jnp.int32), pt, spec,
        )
        return np.asarray(nxt), np.asarray(logits)

    ref_nxt, ref_logits = run(cfg_rep, params, kv)

    cfg_ep = dataclasses.replace(cfg_rep, expert_parallel=True)
    mesh = make_mesh((2, 4))
    sp = shard_params(params, cfg_ep, mesh)
    q_leaf = sp["moe_layers"]["moe_wgu"]["q"]
    assert q_leaf.sharding.shard_shape(q_leaf.shape)[1] == 16 // 4
    skv = shard_kv(init_kv_cache(cfg_ep, ecfg, dtype=jnp.float32), cfg_ep, mesh)
    with jax.set_mesh(mesh):
        got_nxt, got_logits = run(cfg_ep, sp, skv)
    np.testing.assert_allclose(ref_logits, got_logits, rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(ref_nxt, got_nxt)


def test_routed_ep_drops_remote_rows():
    """The routed path must not compute remote-expert rows: moe_align with
    the dropped sentinel parks them past n_used, and the grouped kernels
    zero those blocks (FLOPs scale with LOCAL routed rows, the X/k x cut
    vs the dense all-experts einsum — VERDICT r2 weak #4)."""
    from painlessinferenceacceleration_tpu.ops.moe_matmul import (
        BLOCK_M,
        moe_align,
    )

    T, k, X = 8, 2, 4
    topi = jnp.array([[0, 1]] * 4 + [[2, X]] * 4, jnp.int32)  # 4 dropped
    topv = jnp.ones((T, k), jnp.float32)
    dest_tok, row_w, block_expert, n_used = moe_align(topi, topv, X, T)
    # experts 0,1,2 occupy one block each; dropped rows live past n_used
    assert int(n_used[0]) == 3
    used_rows = np.asarray(dest_tok[: 3 * BLOCK_M])
    assert (np.asarray(row_w)[3 * BLOCK_M:] == 0).all()
    # every kept (token, expert) pair appears exactly once
    kept = [t for t in used_rows if t < T]
    assert sorted(kept) == sorted([0, 1, 2, 3] * 2 + [4, 5, 6, 7])


def test_context_parallel_attention_matches_ref():
    """Sequence/context parallelism (SURVEY §2.5/§7): the arena's PAGE axis
    shards across 'model'; each device attends its local pages and partial
    softmax states merge with pmax/psum (ops/cp_attention.py). Must match
    the unsharded reference bitwise-close for decode AND tree-verify."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from painlessinferenceacceleration_tpu.engine.cache import write_kv_pages
    from painlessinferenceacceleration_tpu.ops.attention import (
        paged_attention_ref,
    )
    from painlessinferenceacceleration_tpu.ops.cp_attention import (
        cp_paged_attention,
        shard_kv_pages_cp,
    )

    rng = np.random.default_rng(0)
    H, D, ps = 4, 16, 16
    B, P = 2, 8
    n_pages = 24  # divisible by the 8-way axis
    mesh = make_mesh((1, 8))
    for Q, ctxs in ((1, [37, 90]), (5, [21, 64])):
        k_pages = jnp.zeros((n_pages, ps, H * D), jnp.float32)
        v_pages = jnp.zeros((n_pages, ps, H * D), jnp.float32)
        # distinct pages 1..16 spread across all 8 shards (3 pages/shard)
        pt = jnp.arange(1, 1 + B * P, dtype=jnp.int32).reshape(B, P)
        ctx = jnp.asarray(np.array(ctxs, np.int32))
        maxc = max(ctxs) + Q
        kn = jnp.asarray(rng.normal(size=(B, maxc, H, D)).astype(np.float32))
        vn = jnp.asarray(rng.normal(size=(B, maxc, H, D)).astype(np.float32))
        valid = jnp.asarray(
            np.arange(maxc)[None] < (np.array(ctxs) + Q)[:, None]
        )
        k_pages, v_pages = write_kv_pages(
            k_pages, v_pages, kn, vn, pt, jnp.zeros((B,), jnp.int32), valid
        )
        if Q == 1:
            qm = jnp.ones((B, 1, 1), bool)
        else:
            i = jnp.arange(Q)
            qm = jnp.tile((i[:, None] >= i[None, :])[None], (B, 1, 1))
        q = jnp.asarray(rng.normal(size=(B, Q, H, D)).astype(np.float32))
        scale = D ** -0.5
        ref = paged_attention_ref(q, k_pages, v_pages, pt, ctx, qm, scale)
        kv = shard_kv_pages_cp({"k": k_pages, "v": v_pages}, mesh)
        got = cp_paged_attention(
            q, kv["k"], kv["v"], pt, ctx, qm, scale, mesh
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=3e-5, atol=3e-5
        )


def test_dist_llm_facade_matches_llm():
    """DistLLM (reference facade/dist_llm.py capability): params+KV sharded
    at construction, scheduler unchanged, tokens identical to single-device
    LLM — incl. lookahead spec decode over the mesh."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from painlessinferenceacceleration_tpu.engine.dist_llm import DistLLM
    from painlessinferenceacceleration_tpu.engine.llm import LLM
    from painlessinferenceacceleration_tpu.engine.request import SamplingParams

    cfg = ModelConfig.tiny(num_key_value_heads=4, num_attention_heads=8)
    ecfg = EngineConfig(page_size=16, max_seq_len=256, max_concurrency=4,
                        eos_token_id=-2, use_lookahead=True,
                        decoding_length=13, branch_length=4)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    prompts = [[11, 22, 33, 44, 55] * 3, [7, 8, 9] * 4]
    want = [r.output_ids for r in
            LLM(cfg=cfg, params=params, ecfg=ecfg, dtype=jnp.float32)
            .generate(prompts, SamplingParams(max_new_tokens=24))]
    dl = DistLLM(cfg=cfg, params=params, ecfg=ecfg, dtype=jnp.float32,
                 mesh_shape=(2, 4))
    got = [r.output_ids for r in
           dl.generate(prompts, SamplingParams(max_new_tokens=24))]
    assert got == want


def test_context_parallel_engine_token_identity():
    """EngineConfig.context_parallel serves requests whose KV pages are
    mesh-sharded (round-3 review #5): DistLLM + context_parallel routes
    models/base.py attention to cp_paged_attention_stacked (pages on
    'model', params replicated) and the generated tokens — incl. lookahead
    spec decode — must equal the unsharded LLM exactly."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from painlessinferenceacceleration_tpu.engine.dist_llm import DistLLM
    from painlessinferenceacceleration_tpu.engine.llm import LLM
    from painlessinferenceacceleration_tpu.engine.request import SamplingParams

    cfg = ModelConfig.tiny(num_key_value_heads=4, num_attention_heads=8)
    base = dict(page_size=16, max_seq_len=256, max_concurrency=4,
                eos_token_id=-2, use_lookahead=True, decoding_length=13,
                branch_length=4)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    prompts = [[11, 22, 33, 44, 55] * 3, [7, 8, 9] * 4]
    want = [r.output_ids for r in
            LLM(cfg=cfg, params=params, ecfg=EngineConfig(**base),
                dtype=jnp.float32)
            .generate(prompts, SamplingParams(max_new_tokens=24))]
    dl = DistLLM(cfg=cfg, params=params,
                 ecfg=EngineConfig(context_parallel=True, **base),
                 dtype=jnp.float32, mesh_shape=(1, 8))
    # pages must actually be sharded across the model axis
    assert dl.kv["k"].sharding.spec[1] == "model"
    assert dl.cfg.context_parallel
    got = [r.output_ids for r in
           dl.generate(prompts, SamplingParams(max_new_tokens=24))]
    assert got == want


def test_context_parallel_attention_gqa():
    """CP attention with grouped-query heads (Hq=8, Hkv... the op is
    MHA-per-head over [B,Q,H,D] with the arena holding the same H — GQA
    reaches it post-repeat; here: more heads + bf16 dtype tolerance."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from painlessinferenceacceleration_tpu.engine.cache import write_kv_pages
    from painlessinferenceacceleration_tpu.ops.attention import (
        paged_attention_ref,
    )
    from painlessinferenceacceleration_tpu.ops.cp_attention import (
        cp_paged_attention,
        shard_kv_pages_cp,
    )

    rng = np.random.default_rng(2)
    H, D, ps = 8, 32, 16
    B, P = 2, 8
    n_pages = 24
    mesh = make_mesh((1, 8))
    k_pages = jnp.zeros((n_pages, ps, H * D), jnp.bfloat16)
    v_pages = jnp.zeros((n_pages, ps, H * D), jnp.bfloat16)
    pt = jnp.arange(1, 1 + B * P, dtype=jnp.int32).reshape(B, P)
    ctxs = [45, 101]
    Q = 3
    ctx = jnp.asarray(np.array(ctxs, np.int32))
    maxc = max(ctxs) + Q
    kn = jnp.asarray(rng.normal(size=(B, maxc, H, D)).astype(np.float32))
    vn = jnp.asarray(rng.normal(size=(B, maxc, H, D)).astype(np.float32))
    valid = jnp.asarray(np.arange(maxc)[None] < (np.array(ctxs) + Q)[:, None])
    k_pages, v_pages = write_kv_pages(
        k_pages, v_pages, kn, vn, pt, jnp.zeros((B,), jnp.int32), valid
    )
    i = jnp.arange(Q)
    qm = jnp.tile((i[:, None] >= i[None, :])[None], (B, 1, 1))
    q = jnp.asarray(rng.normal(size=(B, Q, H, D)).astype(np.float32)).astype(jnp.bfloat16)
    scale = D ** -0.5
    ref = paged_attention_ref(q, k_pages, v_pages, pt, ctx, qm, scale)
    kv = shard_kv_pages_cp({"k": k_pages, "v": v_pages}, mesh)
    got = cp_paged_attention(q, kv["k"], kv["v"], pt, ctx, qm, scale, mesh)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=3e-2, atol=3e-2,
    )
