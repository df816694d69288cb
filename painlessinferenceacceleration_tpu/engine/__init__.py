"""Serving engine: paged KV arena, step functions, scheduler, LLM facade.

TPU-native re-design of the reference FLOOD engine (flood/facade/llm.py,
flood/utils/batch.py, flood/utils/cache.py): one Python control thread drives
jit-compiled prefill/decode/verify steps (JAX async dispatch overlaps host
scheduling with device compute — replacing the reference's scheduler-process
fan-out), and the segment KV cache becomes a static paged arena (XLA needs
static shapes).
"""
