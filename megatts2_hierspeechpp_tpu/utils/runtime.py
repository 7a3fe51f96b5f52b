"""Runtime conveniences shared by CLIs: persistent compilation cache."""
from __future__ import annotations

import os


def enable_compile_cache(path: str | None = None) -> None:
    """Persistent XLA compilation cache (restart-friendly trainers: resume
    skips the multi-minute recompile of the train step)."""
    import jax

    # default to the repo-local cache (it outlives containers that reset
    # $HOME; bench/CLI runs then share warm Mosaic entries across sessions)
    repo_cache = os.path.join(os.path.dirname(__file__), "..", "..",
                              ".jax_cache")
    cache_dir = path or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", os.path.abspath(repo_cache))
    try:
        jax.config.update("jax_enable_compilation_cache", True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
