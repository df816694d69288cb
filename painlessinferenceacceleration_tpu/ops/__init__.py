"""Compute ops: jnp reference implementations + Pallas TPU kernels.

TPU-native replacements for the reference's Triton/CUDA kernels
(flood/ops/*.py, flood/csrc/**). Each module exposes a jnp reference (the
correctness oracle, used on CPU and in tests — mirroring how the reference
tests kernels against torch references, flood/test/*) and, where the op is
hot, a Pallas kernel selected on TPU.
"""
