"""Persistent XLA compilation cache.

First compiles of the flagship pipeline through the TPU tunnel take minutes;
enabling JAX's on-disk executable cache makes every later process start
warm. Call early (before the first jit execution).
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/audio_calm_jax_cache"),
    )
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax; cache is an optimization only
