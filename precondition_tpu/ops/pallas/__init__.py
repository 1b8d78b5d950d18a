"""Pallas TPU kernels for the hot numerics paths.

Each kernel has a jnp reference implementation in `precondition_tpu.ops`;
the kernels are drop-in substitutes validated against it in tests.
"""
