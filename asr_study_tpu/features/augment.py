"""SpecAugment (Park et al. 2019) — on-device training augmentation.

The reference predates SpecAugment and ships no augmentation; it is the
standard training-time regularizer for exactly this model family
(log-mel/MFCC + BLSTM + CTC), so the rebuild supplies it as a first-class
extension.  TPU-native shape: the masks are built with broadcasted
comparisons from a handful of per-(row, mask) uniform draws — static
shapes, no dynamic slices, fully jit/vmap/shard_map-clean — and applied
INSIDE the jitted train step (zero host work, composes with DP/TP because
each device draws from its own folded key).

Semantics per utterance:
- ``freq_masks`` frequency bands, each of width ~ U{0..freq_width},
  start uniform over the valid range — masked to 0 across all frames.
- ``time_masks`` frame spans, each of width ~ U{0..floor(time_ratio *
  length)} (per-utterance adaptive cap, the "adaptive" variant of the
  paper), start uniform within the utterance's VALID frames — padding is
  never counted or masked.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class SpecAugment:
    """Callable ``(rng, inputs [B,T,F], input_lengths [B]) -> inputs``."""

    def __init__(self, freq_masks: int = 2, freq_width: int = 8,
                 time_masks: int = 2, time_ratio: float = 0.05):
        if freq_masks < 0 or time_masks < 0:
            raise ValueError("mask counts must be >= 0")
        if freq_width < 0:
            raise ValueError(f"freq_width must be >= 0, got {freq_width}")
        if not 0.0 <= time_ratio <= 1.0:
            raise ValueError(
                f"time_ratio must be in [0, 1], got {time_ratio}"
            )
        self.freq_masks = int(freq_masks)
        self.freq_width = int(freq_width)
        self.time_masks = int(time_masks)
        self.time_ratio = float(time_ratio)

    def __repr__(self) -> str:
        return (
            f"SpecAugment(freq_masks={self.freq_masks}, "
            f"freq_width={self.freq_width}, time_masks={self.time_masks}, "
            f"time_ratio={self.time_ratio})"
        )

    def __call__(self, rng, inputs, input_lengths):
        b, t, f = inputs.shape
        keep = jnp.ones((b, t, f), bool)
        k_f, k_t = jax.random.split(rng)

        if self.freq_masks and self.freq_width:
            # widths U{0..W}, starts U{0..F-w} per (row, mask)
            u = jax.random.uniform(k_f, (b, self.freq_masks, 2))
            w_cap = min(self.freq_width, f)
            w = jnp.floor(u[..., 0] * (w_cap + 1)).astype(jnp.int32)
            start = jnp.floor(u[..., 1] * (f - w + 1)).astype(jnp.int32)
            idx = jnp.arange(f)[None, None, :]                 # [1,1,F]
            band = (idx >= start[..., None]) & (
                idx < (start + w)[..., None]
            )                                                  # [B,M,F]
            keep &= ~jnp.any(band, axis=1)[:, None, :]

        if self.time_masks and self.time_ratio > 0:
            lengths = input_lengths.astype(jnp.int32)          # [B]
            u = jax.random.uniform(k_t, (b, self.time_masks, 2))
            w_cap = jnp.floor(
                self.time_ratio * lengths.astype(jnp.float32)
            ).astype(jnp.int32)[:, None]                       # [B,1]
            w = jnp.floor(u[..., 0] * (w_cap + 1)).astype(jnp.int32)
            start = jnp.floor(
                u[..., 1] * (lengths[:, None] - w + 1)
            ).astype(jnp.int32)
            idx = jnp.arange(t)[None, None, :]                 # [1,1,T]
            span = (idx >= start[..., None]) & (
                idx < (start + w)[..., None]
            )                                                  # [B,M,T]
            keep &= ~jnp.any(span, axis=1)[:, :, None]

        return jnp.where(keep, inputs, jnp.zeros((), inputs.dtype))


def parse_spec_augment(spec: str) -> SpecAugment:
    """Build from the CLI's ``"k=v,..."`` string (empty string -> defaults).

    Keys: freq_masks, freq_width, time_masks, time_ratio.
    """
    kw = {}
    for part in filter(None, (spec or "").split(",")):
        if "=" not in part:
            raise ValueError(
                f"--spec_augment expects 'k=v,...', got {part!r}"
            )
        k, v = part.split("=", 1)
        k = k.strip()
        if k not in ("freq_masks", "freq_width", "time_masks",
                     "time_ratio"):
            raise ValueError(
                f"unknown --spec_augment key {k!r}; have freq_masks, "
                "freq_width, time_masks, time_ratio"
            )
        kw[k] = float(v) if k == "time_ratio" else int(v)
    return SpecAugment(**kw)
