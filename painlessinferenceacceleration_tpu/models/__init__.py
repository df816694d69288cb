"""Model zoo.

The reference maintains 17 forked HF model files (lookahead/models/**) and a
codegen scaffold emitting 12 classes (flood/models/scaffold.py). TPU
re-design: one *generic, functional* decoder (models/base.py) parameterized
by ModelConfig covers the dense llama-class families (llama 1/2/3, tinyllama,
mistral, qwen2, qwen3, internlm, baichuan-class); MoE (mixtral/qwen3-moe/
bailing) and MLA (deepseek) extend it. No per-model forks: the rank-4 mask
adaptation the reference patches into every fork is native here (the step
functions take a tree mask by construction).
"""

from painlessinferenceacceleration_tpu.models import base  # noqa: F401

MODEL_FAMILIES = {
    # HF model_type -> handled-by
    "llama": "base",
    "mistral": "base",
    "qwen2": "base",
    "qwen3": "base",  # qk_norm=True
    "internlm": "base",
    "baichuan": "base",
    "mixtral": "moe",
    "qwen3_moe": "moe",
    "bailing_moe": "moe",
    "deepseek_v2": "mla",
    "deepseek_v3": "mla",
}
