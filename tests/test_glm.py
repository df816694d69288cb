"""AntGLM (glm proper) family: 2D positions + prefix-LM attention.

Reference: lookahead/lookahead/models/glm/modeling_glm.py (GLMStack with
position + block-position embedding tables :276-277, LayerNorm blocks,
GELU MLP, fused query_key_value) and tokenization_glm.py
build_inputs_for_generation (:277-330 — prompt tokens get positions
(p, 0) with bidirectional attention; <sop> and generated tokens get
(mask_pos, 1..) with causal attention, all attending the full prompt).
This was the reference's highest-speedup lookahead class
(lookahead/README.md:107-111, AntGLM-10b x5.36).

The oracle below is an independent torch implementation of those semantics
(full recompute each step, explicit rank-4 mask) — not a copy of the
reference file.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from painlessinferenceacceleration_tpu.config import EngineConfig, ModelConfig
from painlessinferenceacceleration_tpu.engine.cache import init_kv_cache
from painlessinferenceacceleration_tpu.engine.step import (
    decode_inputs,
    prefill_step,
    verify_step,
)
from painlessinferenceacceleration_tpu.models.base import init_params

MASK_ID = 9  # designated [gMASK] token id in the tiny vocab
SOP_ID = 8

GLM_CFG = dict(
    model_type="glm", vocab_size=64, hidden_size=32, intermediate_size=128,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
    max_position_embeddings=64, position_embedding_type="glm_2d",
    norm_type="layernorm", gated_mlp=False, hidden_act="gelu",
    attention_bias=True, attention_out_bias=True, mlp_bias=True,
    prefix_lm=True, tie_word_embeddings=True, mask_token_ids=(MASK_ID,),
)


def _torch_glm_forward(params, cfg, ids, prompt_len_eff, mask_pos):
    """Independent torch oracle: full forward over the whole stream with the
    tokenizer-built 2D positions and prefix-LM mask."""
    def T(x):
        return torch.tensor(np.asarray(x, np.float64))

    L = len(ids)
    S = prompt_len_eff
    E = cfg.hidden_size
    H = cfg.num_attention_heads
    D = cfg.head_dim
    item = [p if p < S else mask_pos for p in range(L)]
    block = [0 if p < S else p - S + 1 for p in range(L)]
    wte = T(params["embed"])
    h = wte[list(ids)]
    h = h + T(params["pos_embed"])[item] + T(params["block_pos_embed"])[block]

    # visibility: key in prompt OR key <= query (causal)
    q = torch.arange(L)[:, None]
    k = torch.arange(L)[None, :]
    vis = (k < S) | (k <= q)

    st = params["layers"]
    for i in range(cfg.num_hidden_layers):
        ln = torch.nn.functional.layer_norm(
            h, (E,), T(st["input_ln"][i]), T(st["input_ln_b"][i]),
            eps=cfg.rms_norm_eps,
        )
        qkv = ln @ T(st["wqkv"][i]) + T(st["bqkv"][i])
        xq, xk, xv = qkv.split(H * D, dim=-1)
        xq = xq.view(L, H, D).transpose(0, 1)
        xk = xk.view(L, H, D).transpose(0, 1)
        xv = xv.view(L, H, D).transpose(0, 1)
        att = (xq @ xk.transpose(-1, -2)) * (D ** -0.5)
        att = att.masked_fill(~vis[None], float("-inf"))
        att = torch.softmax(att, dim=-1)
        out = (att @ xv).transpose(0, 1).reshape(L, H * D)
        h = h + out @ T(st["wo"][i]) + T(st["bo"][i])
        ln = torch.nn.functional.layer_norm(
            h, (E,), T(st["post_ln"][i]), T(st["post_ln_b"][i]),
            eps=cfg.rms_norm_eps,
        )
        up = ln @ T(st["wgu"][i]) + T(st["bgu"][i])
        act = torch.nn.functional.gelu(up, approximate="none")
        h = h + act @ T(st["wdown"][i]) + T(st["bdown"][i])
    h = torch.nn.functional.layer_norm(
        h, (E,), T(params["final_ln"]), T(params["final_ln_b"]),
        eps=cfg.rms_norm_eps,
    )
    return (h @ wte.T).numpy()


@pytest.fixture(scope="module")
def glm_setup():
    cfg = ModelConfig(**GLM_CFG)
    params = init_params(cfg, jax.random.PRNGKey(3), dtype=jnp.float32)
    return cfg, params


def test_glm_matches_torch_oracle(glm_setup):
    """Prefill + greedy decode through the engine steps must match the
    torch full-recompute oracle (logits + tokens)."""
    cfg, params = glm_setup
    ecfg = EngineConfig(page_size=16, max_seq_len=64, max_concurrency=2)
    prompt = [5, 6, 7, 11, 12, MASK_ID, SOP_ID]  # ctx + [gMASK] + <sop>
    S = len(prompt) - 1  # <sop> starts the generated block
    mpos = prompt.index(MASK_ID)
    glm_ids = jnp.asarray([[S, mpos]], jnp.int32)

    kv = init_kv_cache(cfg, ecfg, dtype=jnp.float32)
    P = ecfg.pages_per_req
    pt = jnp.arange(1, 1 + P, dtype=jnp.int32)[None]
    kv, nxt, logits = prefill_step(
        params, kv, cfg, jnp.asarray([prompt], jnp.int32),
        jnp.zeros((1,), jnp.int32), jnp.asarray([len(prompt)], jnp.int32),
        pt, None, glm_ids=glm_ids,
    )
    ref = _torch_glm_forward(params, cfg, prompt, S, mpos)
    np.testing.assert_allclose(
        np.asarray(logits[0]), ref[-1], rtol=2e-4, atol=2e-4
    )

    stream = list(prompt) + [int(nxt[0])]
    ctx = len(prompt)
    for _ in range(6):
        t, p, qm, par = decode_inputs(
            jnp.asarray([stream[-1]], jnp.int32), jnp.asarray([ctx], jnp.int32)
        )
        kv, ot, _ = verify_step(
            params, kv, cfg, t, p, qm, par, pt,
            jnp.asarray([ctx], jnp.int32), jnp.ones((1,), bool),
            glm_ids=glm_ids,
        )
        stream.append(int(ot[0, 0]))
        ctx += 1

    # oracle greedy walk over the same stream
    cur = list(prompt)
    for _ in range(7):
        ref = _torch_glm_forward(params, cfg, cur, S, mpos)
        cur.append(int(np.argmax(ref[-1])))
    assert stream == cur


def test_glm_engine_lookahead_lossless(glm_setup):
    """Full engine serving for the glm family: lookahead == plain greedy
    (the lossless contract on the reference's highest-speedup class)."""
    import dataclasses

    from painlessinferenceacceleration_tpu.engine.llm import LLM
    from painlessinferenceacceleration_tpu.engine.request import SamplingParams

    cfg, params = glm_setup
    e = EngineConfig(page_size=16, max_seq_len=64, max_concurrency=4,
                     eos_token_id=-2)
    prompts = [
        [5, 6, 7, 5, 6, MASK_ID, SOP_ID],
        [11, 12, 11, 12, MASK_ID, SOP_ID],
    ]
    sp = SamplingParams(max_new_tokens=16)
    ar = [o.output_ids for o in
          LLM(cfg=cfg, params=params, ecfg=e, dtype=jnp.float32)
          .generate(prompts, sp)]
    e_la = dataclasses.replace(e, use_lookahead=True, decoding_length=8,
                               branch_length=4)
    llm = LLM(cfg=cfg, params=params, ecfg=e_la, dtype=jnp.float32)
    la = [o.output_ids for o in llm.generate(prompts, sp)]
    assert la == ar
    assert llm.metrics.spec_steps > 0


def test_glm_from_hf_and_loader(glm_setup):
    """ModelConfig.from_hf on an AntGLM-style config dict + checkpoint key
    mapping (glm.transformer.* naming) round-trips through the loader."""
    cfg, params = glm_setup
    hf = ModelConfig.from_hf({
        "model_type": "glm", "vocab_size": 64, "hidden_size": 32,
        "num_layers": 2, "num_attention_heads": 4,
        "max_sequence_length": 63, "block_position_encoding": True,
        "bottleneck_size": 128, "mask_token_ids": [MASK_ID],
    })
    assert hf.position_embedding_type == "glm_2d"
    assert hf.prefix_lm and hf.tie_word_embeddings
    assert hf.norm_type == "layernorm" and not hf.gated_mlp
    assert hf.mask_token_ids == (MASK_ID,)
    assert hf.intermediate_size == 128
    assert hf.max_position_embeddings == 64

    from painlessinferenceacceleration_tpu.models.hf_loader import (
        params_from_state_dict,
    )

    st = params["layers"]
    sd = {
        "glm.word_embeddings.weight": np.asarray(params["embed"]),
        "glm.transformer.position_embeddings.weight":
            np.asarray(params["pos_embed"]),
        "glm.transformer.block_position_embeddings.weight":
            np.asarray(params["block_pos_embed"]),
        "glm.transformer.final_layernorm.weight":
            np.asarray(params["final_ln"]),
        "glm.transformer.final_layernorm.bias":
            np.asarray(params["final_ln_b"]),
    }
    for i in range(cfg.num_hidden_layers):
        p = f"glm.transformer.layers.{i}."
        sd[p + "input_layernorm.weight"] = np.asarray(st["input_ln"][i])
        sd[p + "input_layernorm.bias"] = np.asarray(st["input_ln_b"][i])
        sd[p + "post_attention_layernorm.weight"] = np.asarray(st["post_ln"][i])
        sd[p + "post_attention_layernorm.bias"] = np.asarray(st["post_ln_b"][i])
        sd[p + "attention.query_key_value.weight"] = np.asarray(st["wqkv"][i]).T
        sd[p + "attention.query_key_value.bias"] = np.asarray(st["bqkv"][i])
        sd[p + "attention.dense.weight"] = np.asarray(st["wo"][i]).T
        sd[p + "attention.dense.bias"] = np.asarray(st["bo"][i])
        sd[p + "mlp.dense_h_to_4h.weight"] = np.asarray(st["wgu"][i]).T
        sd[p + "mlp.dense_h_to_4h.bias"] = np.asarray(st["bgu"][i])
        sd[p + "mlp.dense_4h_to_h.weight"] = np.asarray(st["wdown"][i]).T
        sd[p + "mlp.dense_4h_to_h.bias"] = np.asarray(st["bdown"][i])
    loaded = params_from_state_dict(sd, hf, dtype=jnp.float32)
    for a, b in zip(jax.tree.leaves(loaded), jax.tree.leaves(params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
