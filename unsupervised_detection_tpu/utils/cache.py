"""Persistent XLA compilation cache.

PWCNet-sized programs take minutes to compile on TPU; enabling JAX's
persistent cache amortizes that across processes (train, eval, bench, the
driver's compile checks). Called by every CLI entry point.
"""

from __future__ import annotations

import os

DEFAULT_CACHE_DIR = os.path.expanduser("~/.cache/jax_compilation")


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    import jax

    # The installed TPU plugin overrides JAX_PLATFORMS at import time;
    # re-apply the user's env choice so JAX_PLATFORMS=cpu works for CLIs.
    env_platforms = os.environ.get("JAX_PLATFORMS_FORCE") or None
    if env_platforms:
        jax.config.update("jax_platforms", env_platforms)

    path = cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR", DEFAULT_CACHE_DIR)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
