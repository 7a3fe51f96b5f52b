"""Pytest config: run JAX on CPU with 8 virtual devices so multi-chip sharding
paths (pjit over a Mesh) are testable without a pod
(XLA host-platform device-count emulation; replaces the reference's untested
multi-node path, see SURVEY.md §4)."""
import os
import sys

# The image exports JAX_PLATFORMS=axon (TPU tunnel) and pre-imports jax at
# interpreter startup, so plain env vars are too late; reconfigure via
# jax.config before any backend is initialized. Tests must run on host CPU
# with 8 virtual devices unless a TPU test run is explicitly requested.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
if os.environ.get("MEGATTS_TEST_TPU", "0") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the trainer smoke tests compile large GAN
# graphs; repeated suite runs hit the cache and finish in seconds.
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_cache_dir = os.environ.get(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(_REPO, ".jax_cache")
)
try:
    import jax

    jax.config.update("jax_enable_compilation_cache", True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
except Exception:
    pass

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)
