"""Device-platform selection for CLI entry points.

The TPU analog of the reference's ``setup_gpu`` [ref: utils/generic_utils.py]
(which pinned TF to a GPU id).  Some environments pre-register a TPU PJRT
plugin at interpreter startup and pin ``JAX_PLATFORMS`` in the process env,
so an env-var override from the shell is ignored; updating the jax config
directly still works as long as no backend has been initialized yet.
"""

from __future__ import annotations

from typing import Optional


def setup_compilation_cache(directory: Optional[str] = None) -> None:
    """Enable jax's persistent compilation cache (big CLI-latency win: the
    scan-heavy programs here take minutes to compile on first run)."""
    import os

    import jax

    directory = directory or os.path.join(
        os.path.expanduser("~"), ".cache", "asr_study_tpu", "jax"
    )
    try:
        os.makedirs(directory, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", directory)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # cache is an optimization; never fail a CLI over it


def select_platform(platform: Optional[str]) -> None:
    """Force jax onto ``platform`` ('cpu' | 'tpu' | ...); None = env default.

    Must be called before the first jax computation in the process.
    """
    if not platform:
        return
    import jax

    try:
        jax.config.update("jax_platforms", platform)
    except RuntimeError as e:  # backend already initialized
        raise RuntimeError(
            f"cannot select platform {platform!r}: a jax backend is already "
            "initialized; call select_platform before any jax computation"
        ) from e
