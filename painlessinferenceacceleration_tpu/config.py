"""Model / engine configuration.

The reference has no config files — its config surface is HF ``config.json``
(parsed by flood/flood/utils/reader.py:125 ``get_conf``) plus constructor
kwargs (the 37-param ``LLM.__init__``, flood/facade/llm.py:60-163). We keep
that shape: ``ModelConfig.from_hf`` parses an HF config dict/path, and
``EngineConfig`` is the (documented) kwargs surface of the serving engine.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Optional, Tuple


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Architecture description for a decoder-only transformer.

    Field names follow HF config.json keys so ``from_hf`` is a direct map
    (reference reads the same keys in flood/utils/reader.py:125-177).
    """

    model_type: str = "llama"
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: int = 32
    head_dim: int = 0  # 0 -> hidden_size // num_attention_heads
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    max_position_embeddings: int = 4096
    tie_word_embeddings: bool = False
    attention_bias: bool = False
    mlp_bias: bool = False
    hidden_act: str = "silu"
    # qwen3-style QK-RMSNorm (reference fuses it with rope: flood/ops/rope.py)
    qk_norm: bool = False
    # legacy-family knobs (reference model zoo: lookahead/models/bloom,
    # gpt2, chatglm — learned-pos / alibi / LayerNorm / non-gated-MLP lines)
    # "glm_2d" = AntGLM two-table scheme: learned position + block-position
    # embeddings (reference lookahead/models/glm/modeling_glm.py:276-277,
    # GLMStack position_embeddings + block_position_embeddings)
    position_embedding_type: str = "rope"  # rope | learned | alibi | glm_2d
    norm_type: str = "rmsnorm"  # rmsnorm | layernorm
    # prefix-LM attention (AntGLM): prompt tokens attend bidirectionally
    # within the prompt; generated tokens are causal (the tokenizer-built
    # rank-4 mask, tokenization_glm.py build_inputs_for_generation)
    prefix_lm: bool = False
    # mask token ids ([MASK]/[sMASK]/[gMASK]) — the host scheduler locates
    # the first one in the prompt to anchor generated-token position ids
    # (tokenization_glm.py:300-307 mask_positions)
    mask_token_ids: Tuple[int, ...] = ()
    gated_mlp: bool = True  # False -> single up-proj + activation (gpt2/bloom)
    attention_out_bias: bool = False  # bias on o-proj (gpt2/bloom/chatglm=False)
    embed_layernorm: bool = False  # bloom word_embeddings_layernorm
    # gptj/neox-style parallel residual: one pre-LN feeds BOTH attention and
    # mlp, h += attn(ln(h)) + mlp(ln(h)); post_ln is unused
    parallel_residual: bool = False
    partial_rotary_factor: float = 1.0  # chatglm rotates only half the head dim
    rope_interleaved: bool = False  # GPT-J/chatglm pair layout
    # rope scaling: None or dict like HF ("rope_type": "yarn"/"llama3"/...)
    rope_scaling: Optional[dict] = None
    # MoE (mixtral/qwen3_moe/deepseek class; reference: flood/layers/moe.py)
    num_experts: int = 0
    num_experts_per_tok: int = 0
    moe_intermediate_size: int = 0
    num_shared_experts: int = 0
    moe_layer_start: int = 0  # dense layers before MoE layers (deepseek style)
    norm_topk_prob: bool = True
    routed_scaling_factor: float = 1.0
    # deepseek-v3 routing: sigmoid scoring + group-limited top-k
    scoring_func: str = "softmax"  # softmax | sigmoid
    n_group: int = 0
    topk_group: int = 0
    # expert parallelism: shard the EXPERT axis of stacked expert weights
    # over the mesh 'model' axis (dense all-experts einsum + psum; see
    # models/moe.py + parallel/mesh.py). SURVEY §2.5 optional EP.
    expert_parallel: bool = False
    # context parallelism (SURVEY §2.5 SP/CP): the KV arena's PAGE axis
    # shards over 'model' (params replicate there) and attention runs the
    # shard_map partial-softmax merge (ops/cp_attention.py) — a request's
    # context can exceed one chip's HBM. Set via EngineConfig.context_parallel
    # (LLM maps it onto the model config at construction).
    context_parallel: bool = False
    # linear-attention hybrids (Ring/Bailing-linear; reference:
    # flood/ops/seg_la.py + llm.py:218-230 layer_group_size): every
    # layer_group_size-th layer is full attention, others linear (0 = none)
    linear_attention: bool = False
    layer_group_size: int = 0
    # bailing-linear-v2 linear layers apply per-head q/k RMSNorm and rope
    # before the feature map (modeling_bailing_moe_linear_v2.py:302-389)
    linear_qk_norm: bool = False
    linear_rope: bool = False
    # MLA (deepseek v2/v3; reference: flood/ops/seg_mla.py) — 0 disables
    q_lora_rank: int = 0
    kv_lora_rank: int = 0
    qk_nope_head_dim: int = 0
    qk_rope_head_dim: int = 0
    v_head_dim: int = 0
    # cache the compressed latent (kv_lora + rope, shared across heads) and
    # run weight-absorbed MQA attention in latent space, instead of caching
    # expanded per-head K/V (the reference's fusion cache, cache.py:90) —
    # cache bytes/token drop from H*(nope+rope+v_d) to (r+rope)+r
    mla_latent_cache: bool = False

    def __post_init__(self):
        if self.head_dim == 0:
            object.__setattr__(
                self, "head_dim", self.hidden_size // self.num_attention_heads
            )
        # keep the config hashable (it is a static jit argument): dict fields
        # are canonicalized to sorted item tuples
        if isinstance(self.rope_scaling, dict):
            object.__setattr__(
                self, "rope_scaling", tuple(sorted(self.rope_scaling.items()))
            )
        if isinstance(self.mask_token_ids, list):
            object.__setattr__(self, "mask_token_ids", tuple(self.mask_token_ids))

    def rope_scaling_dict(self) -> Optional[dict]:
        if not self.rope_scaling:
            return None
        if isinstance(self.rope_scaling, tuple):
            return dict(self.rope_scaling)
        return dict(self.rope_scaling)

    @property
    def is_moe(self) -> bool:
        return self.num_experts > 0

    @property
    def is_mla(self) -> bool:
        return self.kv_lora_rank > 0

    @property
    def num_kv_groups(self) -> int:
        return self.num_attention_heads // self.num_key_value_heads

    @classmethod
    def from_hf(cls, conf: "dict | str") -> "ModelConfig":
        """Build from an HF config dict, or a path to a model dir/config.json.

        Mirrors what the reference extracts in flood/utils/reader.py:125-177
        (model_type, layer counts, kv heads, head_dim, quantization_config).
        """
        if isinstance(conf, str):
            path = conf
            if os.path.isdir(path):
                path = os.path.join(path, "config.json")
            with open(path) as f:
                conf = json.load(f)
        mt = conf.get("model_type", "llama")
        known = {f.name for f in dataclasses.fields(cls)}
        kwargs: dict = {k: v for k, v in conf.items() if k in known}
        kwargs["model_type"] = mt
        # model-family aliases
        if mt in ("qwen3", "qwen3_moe"):
            kwargs["qk_norm"] = True
        if mt in ("mixtral",):
            kwargs["num_experts"] = conf.get("num_local_experts", 0)
        if "num_experts_per_tok" in conf and "num_experts" not in kwargs:
            kwargs["num_experts"] = conf.get("num_experts", 0)
        if mt in ("deepseek_v2", "deepseek_v3"):
            kwargs["moe_layer_start"] = conf.get("first_k_dense_replace", 1)
            kwargs["num_shared_experts"] = conf.get("n_shared_experts", 0) or 0
            kwargs["num_experts"] = conf.get("n_routed_experts", 0) or 0
            kwargs["q_lora_rank"] = conf.get("q_lora_rank", 0) or 0
            kwargs["kv_lora_rank"] = conf.get("kv_lora_rank", 0) or 0
            kwargs["scoring_func"] = conf.get("scoring_func", "sigmoid" if mt == "deepseek_v3" else "softmax")
            kwargs["routed_scaling_factor"] = conf.get("routed_scaling_factor", 1.0)
        if mt == "opt":
            kwargs.update(
                intermediate_size=conf.get("ffn_dim", 4 * conf.get("hidden_size", 768)),
                rms_norm_eps=1e-5,
                position_embedding_type="learned",
                norm_type="layernorm",
                gated_mlp=False,
                hidden_act=conf.get("activation_function", "relu"),
                attention_bias=True,
                attention_out_bias=True,
                mlp_bias=True,
                tie_word_embeddings=bool(conf.get("tie_word_embeddings", True)),
            )
        if mt == "gptj":
            kwargs.update(
                hidden_size=conf.get("n_embd", 4096),
                num_hidden_layers=conf.get("n_layer", 28),
                num_attention_heads=conf.get("n_head", 16),
                num_key_value_heads=conf.get("n_head", 16),
                intermediate_size=conf.get("n_inner") or 4 * conf.get("n_embd", 4096),
                max_position_embeddings=conf.get("n_positions", 2048),
                rms_norm_eps=conf.get("layer_norm_epsilon", 1e-5),
                norm_type="layernorm",
                gated_mlp=False,
                hidden_act=conf.get("activation_function", "gelu_new"),
                parallel_residual=True,
                rope_interleaved=True,
                partial_rotary_factor=(
                    conf.get("rotary_dim", 64)
                    / (conf.get("n_embd", 4096) // conf.get("n_head", 16))
                ),
                mlp_bias=True,
                tie_word_embeddings=False,
            )
        if mt == "internlm":  # llama arch + qkv/o biases (conf["bias"])
            kwargs["attention_bias"] = bool(conf.get("bias", True))
            kwargs["attention_out_bias"] = bool(conf.get("bias", True))
        if mt == "baichuan":
            # 7B/Base rope; 13B (40 heads, E=5120) uses ALiBi — the HF config
            # carries no flag, the modeling file keys off model size
            if conf.get("num_attention_heads", 32) >= 40:
                kwargs["position_embedding_type"] = "alibi"
            kwargs["tie_word_embeddings"] = False
        if mt == "qwen":  # qwen1: fused c_attn + halved ff width (w1/w2)
            kwargs.update(
                intermediate_size=conf.get("intermediate_size", 22016) // 2,
                rms_norm_eps=conf.get("layer_norm_epsilon", 1e-6),
                attention_bias=True,
                attention_out_bias=False,
                rope_theta=conf.get("rotary_emb_base", 10000.0),
                tie_word_embeddings=False,
            )
        if mt in ("bailing_moe_linear_v2", "bailing_moe_linear"):
            # ring/bailing linear-attention hybrid (reference
            # modeling_bailing_moe_linear_v2.py + its configuration file)
            kwargs["linear_attention"] = True
            kwargs["layer_group_size"] = conf.get("layer_group_size", 1)
            kwargs["linear_qk_norm"] = True
            kwargs["linear_rope"] = True
            kwargs["qk_norm"] = bool(conf.get("use_qk_norm", False))
            kwargs["moe_layer_start"] = conf.get("first_k_dense_replace", 0)
            kwargs["num_experts"] = conf.get("num_experts", 0) or 0
            kwargs["num_shared_experts"] = conf.get("num_shared_experts", 0) or 0
            if conf.get("moe_intermediate_size"):
                kwargs["moe_intermediate_size"] = conf["moe_intermediate_size"]
            # AutoExperts is constructed with scoring_func="sigmoid" +
            # gate.expert_bias (modeling_bailing_moe_linear_v2.py:97-110)
            kwargs["scoring_func"] = "sigmoid"
            kwargs["n_group"] = conf.get("n_group", 0) or 0
            kwargs["topk_group"] = conf.get("topk_group", 0) or 0
            kwargs["routed_scaling_factor"] = conf.get("routed_scaling_factor", 1.0)
            kwargs["norm_topk_prob"] = bool(conf.get("norm_topk_prob", True))
            kwargs["linear_rope"] = bool(conf.get("linear_rope", True))
            kwargs["attention_bias"] = bool(conf.get("use_qkv_bias", False))
            kwargs["attention_out_bias"] = bool(conf.get("use_bias", False))
            if conf.get("use_linear_gqa"):
                raise NotImplementedError(
                    "bailing use_linear_gqa checkpoints are not supported "
                    "(linear layers here are MHA; see models/linear_attn.py)"
                )
        if mt == "gpt2":
            kwargs.update(
                vocab_size=conf.get("vocab_size", 50257),
                hidden_size=conf.get("n_embd", 768),
                num_hidden_layers=conf.get("n_layer", 12),
                num_attention_heads=conf.get("n_head", 12),
                num_key_value_heads=conf.get("n_head", 12),
                intermediate_size=conf.get("n_inner") or 4 * conf.get("n_embd", 768),
                max_position_embeddings=conf.get("n_positions", 1024),
                rms_norm_eps=conf.get("layer_norm_epsilon", 1e-5),
                position_embedding_type="learned",
                norm_type="layernorm",
                gated_mlp=False,
                hidden_act=conf.get("activation_function", "gelu_new"),
                attention_bias=True,
                attention_out_bias=True,
                mlp_bias=True,
                tie_word_embeddings=True,
            )
        if mt == "bloom":
            E = conf.get("hidden_size", conf.get("n_embed", 1024))
            kwargs.update(
                hidden_size=E,
                num_hidden_layers=conf.get("n_layer", 24),
                num_attention_heads=conf.get("n_head", 16),
                num_key_value_heads=conf.get("n_head", 16),
                intermediate_size=4 * E,
                rms_norm_eps=conf.get("layer_norm_epsilon", 1e-5),
                position_embedding_type="alibi",
                norm_type="layernorm",
                gated_mlp=False,
                hidden_act="gelu_new",  # BloomGelu == tanh-approx gelu
                attention_bias=True,
                attention_out_bias=True,
                mlp_bias=True,
                embed_layernorm=True,
                tie_word_embeddings=True,
            )
        if mt == "glm" and (
            "block_position_encoding" in conf or "max_sequence_length" in conf
        ):
            # AntGLM / GLM-10B proper (reference lookahead/models/glm/
            # configuration_glm.py + modeling_glm.py): LayerNorm blocks,
            # un-gated GELU MLP, biases everywhere, TWO learned position
            # tables (position + block position), prefix-LM attention,
            # tied LM head. The reference's highest-speedup lookahead class
            # (lookahead/README.md:107-111).
            E = conf.get("hidden_size", 1024)
            kwargs.update(
                vocab_size=conf.get("vocab_size", 30592),
                hidden_size=E,
                num_hidden_layers=conf.get("num_layers", 24),
                num_attention_heads=conf.get("num_attention_heads", 16),
                num_key_value_heads=conf.get("num_attention_heads", 16),
                intermediate_size=conf.get("bottleneck_size") or 4 * E,
                max_position_embeddings=conf.get("max_sequence_length", 512) + 1,
                rms_norm_eps=1e-5,  # nn.LayerNorm default (modeling_glm.py:227)
                position_embedding_type="glm_2d",
                norm_type="layernorm",
                gated_mlp=False,
                hidden_act="gelu",  # F.gelu exact (modeling_glm.py:26)
                attention_bias=True,
                attention_out_bias=True,
                mlp_bias=True,
                prefix_lm=True,
                tie_word_embeddings=True,
                mask_token_ids=tuple(conf.get("mask_token_ids", ())),
            )
        elif mt in ("chatglm", "glm"):
            # chatglm2/3: MQA + RMSNorm + swiglu + rope on half the head dim,
            # interleaved pairs (lookahead/models/chatglm fork's arch)
            kwargs.update(
                vocab_size=conf.get("padded_vocab_size", conf.get("vocab_size", 65024)),
                num_hidden_layers=conf.get("num_layers", 28),
                num_key_value_heads=conf.get(
                    "multi_query_group_num", conf.get("num_attention_heads", 32)
                ),
                intermediate_size=conf.get("ffn_hidden_size", 13696),
                rms_norm_eps=conf.get("layernorm_epsilon", 1e-5),
                max_position_embeddings=conf.get("seq_length", 8192),
                rope_theta=10000.0 * conf.get("rope_ratio", 1.0),
                attention_bias=bool(conf.get("add_qkv_bias", True)),
                partial_rotary_factor=0.5,
                rope_interleaved=True,
                tie_word_embeddings=False,
            )
        if "num_key_value_heads" not in kwargs:
            kwargs["num_key_value_heads"] = kwargs.get(
                "num_attention_heads", cls.num_attention_heads
            )
        if conf.get("head_dim") is None:
            kwargs.pop("head_dim", None)
        return cls(**kwargs)

    # ---- presets -----------------------------------------------------------

    @classmethod
    def tiny(cls, **over) -> "ModelConfig":
        """A tiny random-weight llama for hermetic CPU tests (the reference has
        no such fixture — SURVEY.md §4 calls this gap out)."""
        kw = dict(
            vocab_size=512,
            hidden_size=64,
            intermediate_size=128,
            num_hidden_layers=3,
            num_attention_heads=4,
            num_key_value_heads=2,
            max_position_embeddings=512,
        )
        kw.update(over)
        return cls(**kw)

    @classmethod
    def tiny_gpt2(cls, **over) -> "ModelConfig":
        kw = dict(
            model_type="gpt2",
            vocab_size=512,
            hidden_size=64,
            intermediate_size=256,
            num_hidden_layers=3,
            num_attention_heads=4,
            num_key_value_heads=4,
            max_position_embeddings=512,
            position_embedding_type="learned",
            norm_type="layernorm",
            gated_mlp=False,
            hidden_act="gelu_new",
            attention_bias=True,
            attention_out_bias=True,
            mlp_bias=True,
            tie_word_embeddings=True,
        )
        kw.update(over)
        return cls(**kw)

    @classmethod
    def tiny_bloom(cls, **over) -> "ModelConfig":
        kw = dict(
            model_type="bloom",
            vocab_size=512,
            hidden_size=64,
            intermediate_size=256,
            num_hidden_layers=3,
            num_attention_heads=4,
            num_key_value_heads=4,
            max_position_embeddings=512,
            position_embedding_type="alibi",
            norm_type="layernorm",
            gated_mlp=False,
            hidden_act="gelu_new",
            attention_bias=True,
            attention_out_bias=True,
            mlp_bias=True,
            embed_layernorm=True,
            tie_word_embeddings=True,
        )
        kw.update(over)
        return cls(**kw)

    @classmethod
    def tiny_chatglm(cls, **over) -> "ModelConfig":
        kw = dict(
            model_type="chatglm",
            vocab_size=512,
            hidden_size=64,
            intermediate_size=128,
            num_hidden_layers=3,
            num_attention_heads=4,
            num_key_value_heads=2,
            max_position_embeddings=512,
            attention_bias=True,
            partial_rotary_factor=0.5,
            rope_interleaved=True,
        )
        kw.update(over)
        return cls(**kw)

    @classmethod
    def llama2_7b(cls) -> "ModelConfig":
        return cls()

    @classmethod
    def llama3_8b(cls) -> "ModelConfig":
        return cls(
            vocab_size=128256,
            intermediate_size=14336,
            num_key_value_heads=8,
            rope_theta=500000.0,
            max_position_embeddings=8192,
        )

    @classmethod
    def mla_3b(cls) -> "ModelConfig":
        """DeepSeek-V2-Lite-shaped DENSE-mlp MLA model (~3B): exercises the
        latent fusion cache + Pallas MLA attention end to end at real head
        geometry (r=512, rope 64) while fitting one v5e's HBM in bf16."""
        return cls(
            model_type="deepseek_v2",
            hidden_size=2048,
            intermediate_size=8192,
            num_hidden_layers=24,
            num_attention_heads=16,
            num_key_value_heads=16,
            q_lora_rank=0,
            kv_lora_rank=512,
            qk_nope_head_dim=128,
            qk_rope_head_dim=64,
            v_head_dim=128,
            mla_latent_cache=True,
            rope_interleaved=True,
            max_position_embeddings=4096,
        )

    @classmethod
    def tinyllama_1b(cls) -> "ModelConfig":
        return cls(
            hidden_size=2048,
            intermediate_size=5632,
            num_hidden_layers=22,
            num_attention_heads=32,
            num_key_value_heads=4,
            max_position_embeddings=2048,
        )


# Decode-batch buckets: jit specializes on shapes, so the dynamic batch sizes
# of the reference (flood/facade/llm.py:1858 ``opt_batch_size`` rounds batch
# sizes already) become a fixed bucket ladder here.
DEFAULT_DECODE_BUCKETS: Tuple[int, ...] = (1, 2, 4, 8, 16, 32, 64, 128, 256)


@dataclasses.dataclass
class EngineConfig:
    """Serving-engine configuration.

    The reference's equivalents are noted per field (flood/facade/llm.py:98-163
    documents its kwargs).
    """

    # --- KV arena (reference: segment cache, flood/utils/cache.py +
    # Slot arena flood/utils/batch.py:35-48; pages instead of segments) ---
    page_size: int = 64  # tokens per KV page
    num_pages: int = 0  # 0 -> sized from max_concurrency * max_seq_len
    # > 0: size num_pages from this fraction of FREE device HBM at engine
    # construction (after params are resident) — the reference's VRAM-based
    # cache sizing (flood llm.py sizes segments from free CUDA memory)
    cache_memory_fraction: float = 0.0
    max_seq_len: int = 2048  # max context per request
    max_concurrency: int = 64  # max resident requests (reference: min_batch_size/max bs)

    # --- batching (reference: chunk_size llm.py:132, batch_size llm.py) ---
    prefill_chunk: int = 512  # chunked prefill budget per step (llm.py:666-759)
    decode_buckets: Tuple[int, ...] = DEFAULT_DECODE_BUCKETS
    max_batch_size: int = 256
    # on-device decode steps per scheduler iteration; the idle variant is
    # used when no prefill work is queued (host-sync amortization — each
    # burst costs one D2H fetch, ~1-10ms through the TPU relay)
    decode_burst: int = 8
    decode_burst_idle: int = 32
    # scheduling policy (reference: pingpong llm.py:587 / mix llm.py:1060 /
    # timely llm.py:1298). pingpong: prefill phase then decode burst.
    # mix: decode rows ride in the prefill forward as width-1 rows (one
    # weights read serves both — mode-10 mix batches, batch.py:605).
    # timely: decode-first ordering (ITL over TTFT).
    schedule_policy: str = "pingpong"
    # admit queued requests only once this many slots are free (1 = admit
    # per finish). Larger values keep pipelined decode bursts chaining
    # (each admission drains the in-flight burst = one host RTT) at a
    # bounded TTFT cost — see llm.py _prefill_phase.
    admit_min_free: int = 1

    # --- lookahead / speculative (reference: decoding_length=63,
    # branch_length=12, decoding_mode='hier' —
    # lookahead/common/lookahead_generation_utils.py:19-29; flood spec knobs
    # llm.py:277-288) ---
    use_lookahead: bool = False
    decoding_length: int = 63  # total draft-token budget per step
    branch_length: int = 12  # max tokens per draft branch
    decoding_mode: str = "hier"  # hier | par | one
    use_spec_min_batch_size: int = 4  # spec only when batch is hungry (llm.py:648)
    # chunk-level adaptive gating (reference: confidence-gated draft size,
    # flood/ops/draft.py:277-349): when a spec burst's draft-retrievable
    # probe falls below spec_gate_threshold, decode runs plain AR bursts
    # for this many bursts before retrying spec (0 disables)
    spec_cooldown_bursts: int = 4
    spec_gate_threshold: float = 0.25

    # --- prefix caching (reference: share=1 shared-prefix slots,
    # flood/utils/batch.py:35-48, allocate :900-952) ---
    prefix_cache: bool = True  # page-granular shared-prefix KV reuse

    # --- quantization (reference: 7 linear variants flood/layers/linear.py;
    # int4/int8 weight-only lookahead quantizers; fp8 KV cache csrc/quantize) ---
    quant: str = "none"  # none | int8 | int4 (weight-only)
    kv_quant: str = "none"  # none | fp8
    quant_group: int = 128  # group size for grouped weight quant scales
    # retype the embedding table to fp8 with per-row scales, dequantizing
    # only gathered rows (reference Fp8Embedding, flood/layers/embedding.py
    # :82 + facade retype flood/facade/llm.py:318-335)
    quant_embed: bool = False
    # initial per-head scale for the fp8 KV arena (e4m3 resolves ~2^-6..448;
    # pick near the expected K/V magnitude — amax calibration is the
    # follow-up, mirroring the reference's static-scale FP8 path)
    kv_scale_init: float = 1.0

    # --- dtype / parallelism ---
    dtype: str = "bfloat16"
    mesh_shape: Optional[Tuple[int, ...]] = None  # (data, model); None -> all model
    mesh_axes: Tuple[str, ...] = ("data", "model")
    # context parallelism: shard the KV arena's PAGE axis over 'model'
    # (ops/cp_attention.py shard_map merge; params replicate on 'model').
    # Serve contexts larger than one chip's HBM. LLM maps this onto
    # ModelConfig.context_parallel at construction; DistLLM supplies the
    # ambient mesh. SURVEY §2.5 SP/CP (the reference has no equivalent).
    context_parallel: bool = False

    # --- sampling defaults ---
    temperature: float = 0.0  # 0 -> greedy
    top_k: int = 0
    top_p: float = 1.0

    # --- misc (reference: debug llm.py:1034, eos handling) ---
    eos_token_id: int = 2
    max_new_tokens: int = 256
    debug: bool = False

    def __post_init__(self):
        if self.num_pages == 0:
            per_req = -(-self.max_seq_len // self.page_size)
            # +1: page 0 is a reserved null page (padding page-table entries)
            self.num_pages = self.max_concurrency * per_req + 1
        if self.context_parallel and self.num_pages % 16:
            # CP shards the page axis over 'model': a 16-multiple covers the
            # POWER-OF-TWO axis sizes <= 16 (1/2/4/8/16); non-power-of-two
            # axes (3, 6, 24, ...) are rounded exactly by DistLLM once the
            # mesh is known (engine/dist_llm.py) — spare pages are capacity
            self.num_pages += 16 - self.num_pages % 16

    @property
    def pages_per_req(self) -> int:
        return -(-self.max_seq_len // self.page_size)

    @property
    def verify_width(self) -> int:
        """Query width of the verify step: current token + draft budget."""
        return 1 + self.decoding_length


def as_tuple(x: Any) -> tuple:
    return tuple(x) if isinstance(x, (list, tuple)) else (x,)
