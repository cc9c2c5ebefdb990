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


# Dense matmul peak by device generation (FLOP/s, bf16 MXU; f32 runs as
# bf16 MXU passes on TPU, so MFU reported against this is a conservative
# floor).  Shared by bench.py and benchmarks/ so every MFU number in
# BENCHMARKS.md is computed against the same device-aware peak.
_PEAK_FLOPS = {
    "v4": 275e12,
    "v5 lite": 197e12, "v5e": 197e12,
    "v5p": 459e12, "v5": 459e12,
    "v6 lite": 918e12, "v6e": 918e12,
}


def peak_flops(default: float = 197e12) -> float:
    """Best-effort bf16 MXU peak of device 0 (fallback: v5e)."""
    import jax

    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return default
    for key, val in _PEAK_FLOPS.items():
        if key in kind:
            return val
    return default


def select_platform(platform: Optional[str]) -> None:
    """Force jax onto ``platform`` ('cpu' | 'tpu' | ...); None = env default.

    Must be called before the first jax computation in the process.
    """
    if not platform:
        return
    import jax

    # Fail LOUDLY if some backend is already up: jax.config.update no
    # longer raises in that case, it just silently leaves the existing
    # client (and its device placement) in place.  This bit hard here
    # once: an eager module-level jnp constant initialized the pinned
    # remote-TPU backend at import, so every "--platform cpu" CLI run
    # claimed (and could block on) the exclusive TPU chip.
    try:
        from jax._src import xla_bridge as _xb

        started = set(getattr(_xb, "_backends", {}) or {})
    except Exception:  # private API moved — skip the guard, keep working
        started = set()
    if started and platform not in started:
        raise RuntimeError(
            f"cannot select platform {platform!r}: backend(s) "
            f"{sorted(started)} already initialized; call select_platform "
            "before any jax computation (check for module-level eager "
            "jnp/jax calls at import time)"
        )
    jax.config.update("jax_platforms", platform)
