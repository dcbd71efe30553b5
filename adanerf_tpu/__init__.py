"""adanerf_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of AdaNeRF (ECCV 2022): joint training of a per-ray sampling
oracle and a shading NeRF, adaptive sample-count rendering, and the full
training / evaluation / export toolchain.

This is a from-scratch TPU-first rebuild of the reference PyTorch+CUDA
implementation (see /root/reference). The compute path is pure JAX (jit,
Pallas kernels, shard_map over device meshes); the host-side runtime
(data loading, R-sequence sampling, windowed depth features) has native C
implementations with numpy fallbacks.
"""

__version__ = "0.1.0"
