"""Platform pinning + compilation-cache setup shared by bench.py and tools.

The axon boot hook re-registers `jax_platforms='axon,cpu'` at interpreter
start, overriding a shell-level `JAX_PLATFORMS`; while the TPU tunnel is
wedged the axon init hangs ~25 min before falling back to CPU, so env-pinned
runs appear frozen (NOTES_ROUND3.md findings 16/17). The only reliable pin is
the config layer, applied before the first backend lookup.
"""

from __future__ import annotations

import os


def pin_and_cache(cache_dir: str = "~/.rtvm_jaxcache") -> None:
    """Apply the RTVM_PLATFORM config-layer pin (if set) and enable the
    persistent compilation cache. Call before any jax computation.

    The cache directory is suffixed per pinned platform: XLA:CPU AOT results
    compiled by the axon terminal's remote compiler carry machine features
    (+prefer-no-scatter etc.) the local host lacks, and loading them from a
    shared cache warns about potential SIGILL on every entry."""
    import jax

    plat = os.environ.get("RTVM_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
        cache_dir = f"{cache_dir}_{plat}"
    try:
        jax.config.update("jax_compilation_cache_dir", os.path.expanduser(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
