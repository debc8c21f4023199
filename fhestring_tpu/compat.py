"""Runtime configuration helpers."""

from __future__ import annotations

import os


def enable_compile_cache(path: str | None = None) -> None:
    """Enable JAX's persistent compilation cache.

    The PBS pipeline is one big traced loop; cold compiles dominate small
    runs (~20-80s each on CPU). The persistent cache makes repeat runs of
    the CLI, tests, and bench near-instant to warm up.
    """
    import jax

    path = path or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_comp"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
