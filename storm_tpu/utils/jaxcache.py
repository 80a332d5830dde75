"""Persistent XLA compile cache used by all CLIs."""
from __future__ import annotations

import os


def enable_jax_compilation_cache():
    """Persistent XLA compile cache: reruns of the CLIs skip the 20-40 s
    cold compiles (safe to share across sessions; keyed by HLO+flags).
    Override the location with STORM_TPU_JAX_CACHE; set it to 0 to disable.
    """
    import jax

    cache = os.environ.get(
        "STORM_TPU_JAX_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "storm_tpu_jax"),
    )
    if cache and cache != "0":
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
