"""Compute ops: jnp reference implementations + Pallas TPU kernels."""
