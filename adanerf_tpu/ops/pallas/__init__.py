"""Pallas TPU kernels for the hot ops: the fused shading-MLP kernel (the MXU
centerpiece) and supporting utilities. Every kernel has a pure-jnp reference
twin and equivalence tests (mirroring the reference's CUDA-vs-PyTorch
duality, SURVEY.md §4)."""
