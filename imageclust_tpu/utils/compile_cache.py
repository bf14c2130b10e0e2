"""Persistent XLA compile cache — compile once per program shape, ever.

First compiles of the big programs can take minutes (especially through
remote-compile transports); every entry point (CLI, service, bench) enables
this so repeat processes start hot. Opt out with IMAGECLUST_JAX_CACHE=off.
"""

from __future__ import annotations

import os

__all__ = ["enable_compile_cache"]


def enable_compile_cache(default_dir: str | None = None) -> str | None:
    setting = os.environ.get("IMAGECLUST_JAX_CACHE", "")
    if setting.lower() in ("off", "0", "false"):
        return None
    cache_dir = setting or default_dir or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))),
        ".jax_cache",
    )
    import jax

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
