"""Backend selection helper.

The axon TPU plugin ignores the standard ``JAX_PLATFORMS`` environment
variable, so scripts that must run on CPU (tests, CI, subprocess tools) set
``ADANERF_PLATFORM=cpu`` instead; every CLI entry point calls
``apply_platform_env()`` before touching jax.
"""

import os


def apply_platform_env():
    plat = os.environ.get("ADANERF_PLATFORM")
    if plat:
        import jax
        try:
            jax.config.update("jax_platforms", plat)
        except RuntimeError:
            pass  # backend already initialized
