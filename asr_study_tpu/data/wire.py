"""One-transfer ragged wire format for batches of variable-length audio.

TPU-first replacement for the reference's feed-dict of host-padded numpy
[ref: predict.py, core/dataset_generator.py]: on a remote-attached
accelerator every host->device send pays a setup round trip (~30 ms on a
tunnelled PJRT backend) and rectangular padding wastes wire bytes, so a
batch of utterances crosses the link as ONE flat int16 buffer —

    [ 2*B-word length header | utt0 samples | utt1 samples | ... ]

- header word 2i   = lengths[i] & 0x7fff      (15-bit low half)
- header word 2i+1 = lengths[i] >> 15         (high half; < 2^30 samples)
- offsets are NOT transmitted: they are the exclusive cumsum of the
  lengths, recomputed on device.

``unpack_audio`` runs inside jit and materializes the padded [B, T]
float32 waveform with per-row contiguous ``dynamic_slice`` copies
(a [B, T]-indexed gather lowers ~8x slower on TPU v5e — BENCHMARKS.md).

Bit-exactness vs host-side padding is tested in tests/test_wire.py.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_LOW_BITS = 15
_LOW_MASK = (1 << _LOW_BITS) - 1


def wire_cap(batch: int, total_samples: int, align: int = 2048) -> int:
    """Buffer length for ``batch`` utterances totalling ``total_samples``
    samples, rounded up so one compiled program serves many batches."""
    cap = 2 * batch + total_samples
    return -(-cap // align) * align


def pack_audio(
    wavs: Sequence[np.ndarray], cap: int, batch: int | None = None
) -> np.ndarray:
    """Pack int16/float waveforms into one flat int16 wire buffer.

    Float inputs are quantized to PCM16 (x * 32767); int16 pass through.
    ``batch`` pads the header to a fixed batch size (missing rows get
    length 0), so a partially-filled final batch reuses the compiled
    program.
    """
    b = batch if batch is not None else len(wavs)
    if len(wavs) > b:
        raise ValueError(f"{len(wavs)} wavs > batch {b}")
    flat = np.zeros((cap,), np.int16)
    pos = 2 * b
    for i, w in enumerate(wavs):
        w = np.asarray(w)
        if w.dtype != np.int16:
            w = (w.astype(np.float64) * 32767.0).astype(np.int16)
        n = w.shape[0]
        if n >= 1 << 30:
            raise ValueError(f"utterance {i} too long for wire: {n}")
        if pos + n > cap:
            raise ValueError(
                f"wire overflow: need {pos + n}, cap {cap} "
                "(recompute wire_cap for this batch)"
            )
        flat[2 * i] = n & _LOW_MASK
        flat[2 * i + 1] = n >> _LOW_BITS
        flat[pos: pos + n] = w
        pos += n
    return flat


def unpack_audio(
    flat: jax.Array, batch: int, n_pad: int
) -> Tuple[jax.Array, jax.Array]:
    """flat int16 wire -> (float32 [batch, n_pad] padded wavs, lengths).

    Jittable; ``batch`` and ``n_pad`` are static. Rows are materialized
    by scanned contiguous dynamic-slices (DMA-friendly; see module doc).
    """
    hdr = 2 * batch
    lo = flat[0:hdr:2].astype(jnp.int32)
    hi = flat[1:hdr:2].astype(jnp.int32)
    lengths = lo + (hi << _LOW_BITS)
    offsets = (hdr + jnp.cumsum(lengths) - lengths).astype(jnp.int32)
    padded_flat = jnp.pad(flat, (0, n_pad))
    t = jnp.arange(n_pad, dtype=jnp.int32)

    def row(carry, off_len):
        off, ln = off_len
        seg = jax.lax.dynamic_slice_in_dim(padded_flat, off, n_pad)
        wav = jnp.where(
            t < ln, seg.astype(jnp.float32) * (1.0 / 32768.0), 0.0
        )
        return carry, wav

    _, wavs = jax.lax.scan(row, 0, (offsets, lengths))
    return wavs, lengths


def pack_batches(
    wavs: Sequence[np.ndarray], batch: int, align: int = 2048
) -> Tuple[List[np.ndarray], int]:
    """Split ``wavs`` into wire buffers of ``batch`` rows sharing ONE cap
    (= one compiled program). Returns (buffers, cap)."""
    groups = [list(wavs[i: i + batch]) for i in range(0, len(wavs), batch)]
    if not groups:
        return [], wire_cap(batch, 0, align)
    cap = max(
        wire_cap(batch, sum(len(np.asarray(w)) for w in g), align)
        for g in groups
    )
    return [pack_audio(g, cap, batch=batch) for g in groups], cap
