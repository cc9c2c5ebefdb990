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
