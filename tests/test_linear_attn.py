"""Linear-attention hybrid models: recurrence correctness + engine decode.

No public HF oracle exists for the Ring/Bailing-linear class (the reference
validates its kernels against its own torch formulas, flood/test/
test_seg_la.py); the bar here is exact self-consistency: chunked prefill
followed by decode must equal one-token-at-a-time processing.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from painlessinferenceacceleration_tpu.config import EngineConfig, ModelConfig
from painlessinferenceacceleration_tpu.engine.cache import init_kv_cache
from painlessinferenceacceleration_tpu.engine.llm import LLM
from painlessinferenceacceleration_tpu.engine.request import SamplingParams
from painlessinferenceacceleration_tpu.engine.step import prefill_step
from painlessinferenceacceleration_tpu.models.linear_attn import (
    init_hybrid_params,
    is_full_layer,
    linear_attn_block,
    n_linear_layers,
)


def lin_cfg(**over):
    kw = dict(
        model_type="ring_linear",
        vocab_size=256,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=4,
        num_attention_heads=4,
        num_key_value_heads=4,
        linear_attention=True,
        layer_group_size=2,  # layers 1, 3 are full attention
        max_position_embeddings=256,
    )
    kw.update(over)
    return ModelConfig(**kw)


def test_layer_pattern():
    cfg = lin_cfg()
    assert [is_full_layer(cfg, i) for i in range(4)] == [False, True, False, True]
    assert n_linear_layers(cfg) == 2
    cfg2 = lin_cfg(layer_group_size=0)
    assert n_linear_layers(cfg2) == 4


def test_chunked_recurrence_matches_tokenwise():
    """linear_attn_block: one 8-token chunk == 8 single-token steps."""
    cfg = lin_cfg()
    params = init_hybrid_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    lp = params["hybrid_layers"][0]  # a linear layer
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.normal(size=(1, 8, cfg.hidden_size)).astype(np.float32))
    H, D = cfg.num_attention_heads, cfg.head_dim
    s0 = jnp.zeros((1, H, D, D), jnp.float32)

    out_chunk, s_chunk, _ = linear_attn_block(
        lp, cfg, None, h, s0, jnp.array([8], jnp.int32)
    )

    s = s0
    outs = []
    for t in range(8):
        o, s, _ = linear_attn_block(
            lp, cfg, None, h[:, t : t + 1], s, jnp.array([1], jnp.int32)
        )
        outs.append(o)
    out_seq = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(
        np.asarray(out_chunk), np.asarray(out_seq), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(s_chunk), np.asarray(s), rtol=2e-4, atol=2e-4
    )


def test_padded_chunk_state_invariant():
    """Padding tokens must not perturb the carried state."""
    cfg = lin_cfg()
    params = init_hybrid_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    lp = params["hybrid_layers"][0]
    rng = np.random.default_rng(1)
    h5 = jnp.asarray(rng.normal(size=(1, 5, cfg.hidden_size)).astype(np.float32))
    h8 = jnp.concatenate([h5, jnp.ones((1, 3, cfg.hidden_size))], axis=1)
    H, D = cfg.num_attention_heads, cfg.head_dim
    s0 = jnp.zeros((1, H, D, D), jnp.float32)
    _, s_a, _ = linear_attn_block(lp, cfg, None, h5, s0, jnp.array([5], jnp.int32))
    out_b, s_b, _ = linear_attn_block(lp, cfg, None, h8, s0, jnp.array([5], jnp.int32))
    np.testing.assert_allclose(np.asarray(s_a), np.asarray(s_b), rtol=1e-5, atol=1e-5)


def test_hybrid_prefill_decode_consistency():
    """Engine-level: chunked prefill + decode == tokenwise prefill + decode."""
    cfg = lin_cfg()
    params = init_hybrid_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    ecfg = EngineConfig(page_size=16, max_seq_len=128, max_concurrency=4,
                        prefill_chunk=8, eos_token_id=-2)
    llm = LLM(cfg=cfg, params=params, ecfg=ecfg, dtype=jnp.float32)
    out = llm.generate([[5, 6, 7, 8, 9, 10]], SamplingParams(max_new_tokens=10))[0]
    assert len(out.output_ids) == 10

    # tiny chunks force multiple prefill steps; results must match
    ecfg2 = EngineConfig(page_size=16, max_seq_len=128, max_concurrency=4,
                         prefill_chunk=2, eos_token_id=-2)
    llm2 = LLM(cfg=cfg, params=params, ecfg=ecfg2, dtype=jnp.float32)
    out2 = llm2.generate([[5, 6, 7, 8, 9, 10]], SamplingParams(max_new_tokens=10))[0]
    assert out.output_ids == out2.output_ids


def test_hybrid_batch_slots_isolated():
    """Two concurrent requests must not cross-contaminate recurrent state."""
    cfg = lin_cfg()
    params = init_hybrid_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    ecfg = EngineConfig(page_size=16, max_seq_len=128, max_concurrency=4,
                        prefill_chunk=8, eos_token_id=-2)
    llm = LLM(cfg=cfg, params=params, ecfg=ecfg, dtype=jnp.float32)
    outs = llm.generate(
        [[5, 6, 7], [100, 101, 102]], SamplingParams(max_new_tokens=8)
    )
    solo0 = LLM(cfg=cfg, params=params, ecfg=ecfg, dtype=jnp.float32).generate(
        [[5, 6, 7]], SamplingParams(max_new_tokens=8)
    )[0]
    solo1 = LLM(cfg=cfg, params=params, ecfg=ecfg, dtype=jnp.float32).generate(
        [[100, 101, 102]], SamplingParams(max_new_tokens=8)
    )[0]
    assert outs[0].output_ids == solo0.output_ids
    assert outs[1].output_ids == solo1.output_ids


def test_hybrid_spec_decode_lossless():
    """Speculative decode over linear state (deferred commit of the accepted
    chain — reference branch-state replay draft.py:573-660) must emit the
    exact greedy stream, with >0 spec steps taken."""
    cfg = lin_cfg()
    params = init_hybrid_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    base = EngineConfig(page_size=16, max_seq_len=512, max_concurrency=4,
                        prefill_chunk=8, eos_token_id=-2)
    import dataclasses
    spec_ecfg = dataclasses.replace(
        base, use_lookahead=True, decoding_length=12, branch_length=6,
        use_spec_min_batch_size=4,
    )
    prompt = [3, 4, 5, 3, 4, 5, 3, 4, 5]
    ref = LLM(cfg=cfg, params=params, ecfg=base, dtype=jnp.float32).generate(
        [prompt], SamplingParams(max_new_tokens=120)
    )[0]
    llm = LLM(cfg=cfg, params=params, ecfg=spec_ecfg, dtype=jnp.float32)
    out = llm.generate([prompt], SamplingParams(max_new_tokens=120))[0]
    assert out.output_ids == ref.output_ids
    assert llm.metrics.spec_steps > 0


def test_pallas_chunk_kernel_matches_jnp_oracle():
    """ops/linear_attention.py (seg_la chunk kernel, interpret mode) vs the
    jnp chunkwise formulation, incl. padded rows and carried state."""
    from painlessinferenceacceleration_tpu.models.linear_attn import (
        default_decays,
    )
    from painlessinferenceacceleration_tpu.ops.linear_attention import (
        linear_attention_chunk,
    )

    B, H, C, D = 2, 3, 16, 8
    rng = np.random.default_rng(0)
    xq = jnp.asarray(rng.normal(size=(B, H, C, D)).astype(np.float32))
    xk = jnp.asarray(rng.normal(size=(B, H, C, D)).astype(np.float32))
    xv = jnp.asarray(rng.normal(size=(B, H, C, D)).astype(np.float32))
    s0 = jnp.asarray(rng.normal(size=(B, H, D, D)).astype(np.float32))
    lens = jnp.array([16, 11], jnp.int32)  # row 1 padded
    loglam = jnp.log(jnp.clip(default_decays(H), 1e-4, 1 - 1e-6))

    out, s1 = linear_attention_chunk(xq, xk, xv, s0, lens, loglam,
                                     interpret=True)

    # jnp oracle (same formulas as models/linear_attn.py chain mode)
    i = jnp.arange(C, dtype=jnp.float32)
    valid = (jnp.arange(C)[None] < lens[:, None])
    xk_m = xk * valid[:, None, :, None]
    xv_m = xv * valid[:, None, :, None]
    qk = jnp.einsum("bhid,bhjd->bhij", xq, xk_m)
    dmat = jnp.exp(loglam[:, None, None] * (i[:, None] - i[None, :]))
    causal = (i[:, None] >= i[None, :])[None]
    A = qk * jnp.where(causal, dmat, 0.0)[None]
    ref = jnp.einsum("bhij,bhjd->bhid", A, xv_m)
    powi = jnp.exp(loglam[:, None] * (i[None, :] + 1.0))
    ref = ref + jnp.einsum("bhid,bhde->bhie", xq, s0) * powi[None, ..., None]
    Lb = lens.astype(jnp.float32)
    powd = jnp.exp(loglam[None, :, None] * (Lb[:, None, None] - 1.0 - i[None, None, :]))
    kw = xk_m * jnp.where(valid[:, None], powd, 0.0)[..., None]
    s_ref = s0 * jnp.exp(loglam[None, :] * Lb[:, None])[..., None, None] \
        + jnp.einsum("bhjd,bhje->bhde", kw, xv_m)

    # rows beyond lens are don't-care in out
    m = valid[:, None, :, None]
    np.testing.assert_allclose(np.asarray(out * m), np.asarray(ref * m),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s_ref),
                               rtol=2e-5, atol=2e-5)


def test_bailing_linear_hf_loader():
    """Synthetic bailing-linear-v2 checkpoint loads and serves.

    Builds a state dict with the reference's exact key scheme
    (modeling_bailing_moe_linear_v2.py: attention.query_key_value/dense/
    g_proj/g_norm/query_layernorm, mlp.gate(+expert_bias)/experts.{x}/
    shared_experts, model.word_embeddings) and checks weight placement
    (transposes), the per-layer decay law (flood_patch_func :345-350), and
    that the loaded model generates through the engine. No public
    checkpoint exists in this environment, so this synthetic golden stands
    in for HF parity."""
    import math

    from painlessinferenceacceleration_tpu.models.hf_loader import (
        params_from_state_dict,
    )

    E, H, D, I, X, L = 32, 4, 8, 48, 4, 4
    moe_I = 16
    conf = dict(
        model_type="bailing_moe_linear_v2",
        vocab_size=128,
        hidden_size=E,
        intermediate_size=I,
        num_hidden_layers=L,
        num_attention_heads=H,
        num_key_value_heads=H,
        head_dim=D,
        layer_group_size=2,
        use_qk_norm=True,
        use_qkv_bias=False,
        use_bias=True,
        num_experts=X,
        num_experts_per_tok=2,
        num_shared_experts=1,
        moe_intermediate_size=moe_I,
        first_k_dense_replace=2,
        rms_norm_eps=1e-5,
        max_position_embeddings=256,
        tie_word_embeddings=False,
    )
    cfg = ModelConfig.from_hf(conf)
    assert cfg.linear_attention and cfg.layer_group_size == 2
    assert cfg.linear_rope and cfg.linear_qk_norm
    assert cfg.scoring_func == "sigmoid"

    rng = np.random.default_rng(0)

    def t(*shape):
        return (rng.normal(size=shape) * 0.05).astype(np.float32)

    sd = {
        "model.word_embeddings.weight": t(128, E),
        "model.norm.weight": np.ones(E, np.float32),
        "lm_head.weight": t(128, E),
    }
    for i in range(L):
        p = f"model.layers.{i}."
        a = p + "attention."
        sd[p + "input_layernorm.weight"] = np.ones(E, np.float32)
        sd[p + "post_attention_layernorm.weight"] = np.ones(E, np.float32)
        sd[a + "query_key_value.weight"] = t(3 * H * D, E)
        sd[a + "dense.weight"] = t(E, H * D)
        sd[a + "dense.bias"] = t(E)
        sd[a + "query_layernorm.weight"] = np.ones(D, np.float32)
        sd[a + "key_layernorm.weight"] = np.ones(D, np.float32)
        if (i + 1) % 2 != 0:  # linear layer extras
            sd[a + "g_proj.weight"] = t(H * D, E)
            sd[a + "g_norm.weight"] = np.ones(H * D, np.float32)
        if i >= 2:  # MoE mlp
            sd[p + "mlp.gate.weight"] = t(X, E)
            sd[p + "mlp.gate.expert_bias"] = np.zeros(X, np.float32)
            for x in range(X):
                e = p + f"mlp.experts.{x}."
                sd[e + "gate_proj.weight"] = t(moe_I, E)
                sd[e + "up_proj.weight"] = t(moe_I, E)
                sd[e + "down_proj.weight"] = t(E, moe_I)
            sh = p + "mlp.shared_experts."
            sd[sh + "gate_proj.weight"] = t(moe_I, E)
            sd[sh + "up_proj.weight"] = t(moe_I, E)
            sd[sh + "down_proj.weight"] = t(E, moe_I)
        else:
            sd[p + "mlp.gate_proj.weight"] = t(I, E)
            sd[p + "mlp.up_proj.weight"] = t(I, E)
            sd[p + "mlp.down_proj.weight"] = t(E, I)

    params = params_from_state_dict(sd, cfg, dtype=jnp.float32)
    layers = params["hybrid_layers"]
    assert len(layers) == L
    # placement: transposed qkv, gate only on linear layers, moe from li>=2
    np.testing.assert_array_equal(
        np.asarray(layers[0]["wqkv"]),
        sd["model.layers.0.attention.query_key_value.weight"].T,
    )
    assert "w_gate" in layers[0] and "w_gate" not in layers[1]
    assert "moe_wgu" in layers[2] and "wgu" in layers[0]
    assert layers[2]["moe_wgu"].shape == (X, E, 2 * moe_I)
    assert "shared_wgu" in layers[2]
    # decay law (flood_patch_func :345-350)
    start = 2.0 ** (-(2.0 ** -(math.log2(H) - 3.0)))
    want = np.power(start, np.arange(1, H + 1)) * (1.0 - 0 / (L - 1) + 1e-5)
    np.testing.assert_allclose(np.asarray(layers[0]["decay"]), want, rtol=1e-6)

    from painlessinferenceacceleration_tpu.engine.llm import LLM
    from painlessinferenceacceleration_tpu.engine.request import SamplingParams

    ecfg = EngineConfig(page_size=16, max_seq_len=128, max_concurrency=2,
                        eos_token_id=-2)
    llm = LLM(cfg=cfg, params=params, ecfg=ecfg, dtype=jnp.float32)
    out = llm.generate([[5, 6, 7, 8]], SamplingParams(max_new_tokens=8))[0]
    assert len(out.output_ids) == 8


def test_pallas_tree_kernel_matches_jnp_oracle():
    """ops/linear_attention.py tree kernel (seg_la_s, interpret mode) vs the
    jnp tree formulation from linear_attn_block's defer-state branch —
    random ancestor trees, dead columns, and a nonzero root depth (the
    wrapper folds the residual lam^depth_0 into the carried state)."""
    from painlessinferenceacceleration_tpu.models.linear_attn import (
        default_decays,
    )
    from painlessinferenceacceleration_tpu.ops.linear_attention import (
        linear_attention_tree,
    )

    B, H, C, D = 2, 3, 12, 8
    rng = np.random.default_rng(1)
    xq = jnp.asarray(rng.normal(size=(B, H, C, D)).astype(np.float32))
    xk = jnp.asarray(rng.normal(size=(B, H, C, D)).astype(np.float32))
    xv = jnp.asarray(rng.normal(size=(B, H, C, D)).astype(np.float32))
    s0 = jnp.asarray(rng.normal(size=(B, H, D, D)).astype(np.float32))
    loglam = jnp.log(jnp.clip(default_decays(H), 1e-4, 1 - 1e-6))

    # random draft trees: parent[i] < i, node 0 = root; row 1's root sits
    # at depth 2 (mid-stream window) and its last 3 columns are dead
    parents = np.zeros((B, C), np.int32)
    for b in range(B):
        for i_ in range(1, C):
            parents[b, i_] = rng.integers(0, i_)
    root_d = np.array([0, 2], np.float32)
    depth = np.zeros((B, C), np.float32)
    vis = np.zeros((B, C, C), bool)
    for b in range(B):
        depth[b, 0] = root_d[b]
        vis[b, 0, 0] = True
        for i_ in range(1, C):
            depth[b, i_] = depth[b, parents[b, i_]] + 1
            vis[b, i_] = vis[b, parents[b, i_]]
            vis[b, i_, i_] = True
    vis[1, :, C - 3:] = False
    vis[1, C - 3:, :] = False
    depth_j = jnp.asarray(depth)
    vis_j = jnp.asarray(vis)

    colmask = jnp.any(vis_j, axis=1)[:, None, :, None]
    xk_m = xk * colmask
    xv_m = xv * colmask
    out = linear_attention_tree(xq, xk_m, xv_m, s0, depth_j, vis_j, loglam,
                                interpret=True)

    # jnp oracle (tree branch of models/linear_attn.py linear_attn_block)
    qk = jnp.einsum("bhid,bhjd->bhij", xq, xk_m)
    dmat = jnp.exp(
        loglam[None, :, None, None]
        * (depth_j[:, None, :, None] - depth_j[:, None, None, :])
    )
    A = qk * jnp.where(vis_j[:, None], dmat, 0.0)
    ref = jnp.einsum("bhij,bhjd->bhid", A, xv_m)
    powi = jnp.exp(loglam[None, :, None] * (depth_j[:, None, :] + 1.0))
    ref = ref + jnp.einsum("bhid,bhde->bhie", xq, s0) * powi[..., None]

    rowmask = jnp.any(vis_j, axis=2)[:, None, :, None]  # dead rows dont-care
    np.testing.assert_allclose(
        np.asarray(out * rowmask), np.asarray(ref * rowmask),
        rtol=2e-5, atol=2e-5,
    )


def test_hybrid_spec_lossless_with_tree_kernel_path():
    """End-to-end spec decode with the tree kernel FORCED through the jnp
    gate boundary: run linear_attention_tree in interpret mode inside the
    verify window via monkeypatched gate, stream must stay lossless."""
    import dataclasses
    from unittest import mock

    from painlessinferenceacceleration_tpu.ops import linear_attention as la

    cfg = lin_cfg()
    params = init_hybrid_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    base = EngineConfig(page_size=16, max_seq_len=512, max_concurrency=4,
                        prefill_chunk=8, eos_token_id=-2)
    spec_ecfg = dataclasses.replace(
        base, use_lookahead=True, decoding_length=12, branch_length=6,
        use_spec_min_batch_size=4,
    )
    prompt = [3, 4, 5, 3, 4, 5, 3, 4, 5]

    tree_fn = la.linear_attention_tree
    calls = []

    def tree_interp(xq, xk, xv, state, depth, vis, loglam):
        calls.append(tuple(xq.shape))
        return tree_fn(xq, xk, xv, state, depth, vis, loglam, interpret=True)

    # patched engine FIRST (an earlier unpatched run would leave a compiled
    # verify_step in the jit cache and the patch would never trace)
    jax.clear_caches()
    with mock.patch.object(la, "use_pallas_linear_tree", lambda C, D: True), \
         mock.patch.object(la, "linear_attention_tree", tree_interp):
        llm = LLM(cfg=cfg, params=params, ecfg=spec_ecfg, dtype=jnp.float32)
        out = llm.generate([prompt], SamplingParams(max_new_tokens=80))[0]
    assert calls, "tree kernel never engaged"

    jax.clear_caches()
    ref = LLM(cfg=cfg, params=params, ecfg=base, dtype=jnp.float32).generate(
        [prompt], SamplingParams(max_new_tokens=80)
    )[0]
    assert out.output_ids == ref.output_ids
    assert llm.metrics.spec_steps > 0
