"""Lookahead speculative decoding: host trie draft cache + device verify.

Reference: lookahead/common/lookahead_cache.py (CPU trie),
lookahead/common/pretrained_model.py (generation loop),
flood/utils/speculative.py + flood/ops/draft.py (GPU hash-table variant).

TPU split: the rich trie lives on host (its queries overlap with device
execution thanks to JAX async dispatch — SURVEY §7 hard part 6); the verify
+ KV-compaction runs fully on device inside the jitted step (engine/step.py).
"""

from painlessinferenceacceleration_tpu.lookahead.trie import (  # noqa: F401
    DraftCache,
    TokenTrie,
)
