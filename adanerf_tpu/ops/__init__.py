"""Pure-functional math kernels: depth transforms, encodings, ray generation,
volume rendering, z-samplers and the adaptive-sampling select/compaction ops.
All functions are jnp-based, shape-static and jit/vmap/grad-safe.
"""
