"""Featurizer preference policy, shared by every on-device consumer.

One place encodes "prefer the fused Pallas kernel, fall back to the XLA
matmul-DFT path": the predict CLI's --on_device serving path, the dataset
builder's DeviceFeatureExtractor, and bench.py all used to carry their own
copy of this try/except, so a policy change (e.g. narrowing the caught
exception types) had to be made three times.
"""

from __future__ import annotations

from typing import Iterator


def featurizer_candidates(kind: str, use_pallas: bool = True,
                          **kw) -> Iterator:
    """Yield constructed featurizers in preference order.

    Pallas first (skipped when construction itself fails — e.g. an
    unsupported option combination — or ``use_pallas=False``), then the
    XLA device path.  Callers that need a runtime probe (Mosaic can also
    reject at compile time) iterate and keep the first candidate whose
    probe succeeds; callers that only need construction take ``next()``.
    """
    if use_pallas:
        try:
            from asr_study_tpu.features.pallas_fbank import PallasFeaturizer

            yield PallasFeaturizer(kind=kind, **kw)
        except Exception:
            pass
    from asr_study_tpu.features.device import DeviceFeaturizer

    yield DeviceFeaturizer(kind=kind, **kw)


def probed_featurizer(kind: str, probe_shape, use_pallas: bool = True,
                      **kw):
    """First candidate whose jitted ``_transform`` compiles AND runs at
    ``probe_shape`` = (batch, n_samples) — the caller's real padded batch
    shape, since Mosaic can accept one shape and reject another.  The
    LAST candidate is returned unprobed (there is nothing to fall back
    to, and skipping its standalone probe compile saves the cost on the
    common CPU/XLA path).  Used by train/eval's on-device-features mode;
    the predict CLI probes inside its own fused serving program instead.
    """
    import jax
    import numpy as np

    cands = list(featurizer_candidates(kind, use_pallas=use_pallas, **kw))
    for n_left, cand in enumerate(cands, 1):
        if n_left == len(cands):
            return cand
        try:
            b, n = probe_shape
            wavs = np.zeros((b, n), np.float32)
            lens = np.full((b,), n, np.int32)
            _feats, fl = jax.jit(cand._transform)(wavs, lens)
            np.asarray(fl)   # force compile + execute
            return cand
        except Exception as e:
            import sys

            # carry the MESSAGE, not just the type: a genuine bug in the
            # Pallas featurizer otherwise degrades silently to the slower
            # XLA path with nothing actionable on stderr (ADVICE r3)
            msg = str(e).splitlines()[0][:300] if str(e) else ""
            print(
                f"{type(cand).__name__} unavailable "
                f"({type(e).__name__}: {msg}); falling back to the XLA "
                "feature path",
                file=sys.stderr,
            )
    raise AssertionError("unreachable: candidates is never empty")
