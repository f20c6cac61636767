"""Persistent XLA compilation cache setup.

The full 50-step pipeline compiles in ~17 min cold on the remote TPU
compiler and ~2.7 min warm; every entry point (bench, CLI, server,
trainer) should share one on-disk cache.  Controlled by
$GLIGEN_TPU_COMPILE_CACHE (default: <repo>/.jax_cache; "0" disables).
"""

from __future__ import annotations

import os


def enable_compilation_cache() -> None:
    import jax

    path = os.environ.get("GLIGEN_TPU_COMPILE_CACHE")
    if path == "0":
        return
    if not path:
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
            ".jax_cache",
        )
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass  # older jax or read-only fs: cache is an optimization only
