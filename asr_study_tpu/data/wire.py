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

Two codecs (static; both ends must agree):
- ``pcm16`` (default): one 16-bit sample per word, lossless for PCM16.
- ``mulaw``: 8-bit mu-law companding (mu=255, the G.711-style telephony
  curve, ~38 dB SNR), two codes per word — HALF the wire bytes for
  bandwidth-bound serving links; decode happens on device.

Bit-exactness vs host-side padding is tested in tests/test_wire.py.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_LOW_BITS = 15
_LOW_MASK = (1 << _LOW_BITS) - 1

_MU = 255.0
_LOG1P_MU = float(np.log1p(_MU))


def mulaw_encode(x: np.ndarray) -> np.ndarray:
    """float waveform [-1, 1] -> int8 mu-law codes [-127, 127] (mu=255,
    the telephony companding curve; ~38 dB SNR on speech)."""
    x = np.clip(np.asarray(x, np.float64), -1.0, 1.0)
    y = np.sign(x) * np.log1p(_MU * np.abs(x)) / _LOG1P_MU
    return np.round(y * 127.0).astype(np.int8)


def mulaw_decode_device(codes: jax.Array) -> jax.Array:
    """int mu-law codes -> float32 waveform (jittable; inverse of
    mulaw_encode up to the 8-bit quantization)."""
    y = codes.astype(jnp.float32) * (1.0 / 127.0)
    return jnp.sign(y) * (jnp.expm1(jnp.abs(y) * _LOG1P_MU) / _MU)


def _codec_words(n_samples: int, codec: str) -> int:
    """int16 words occupied by one utterance's samples."""
    if codec == "pcm16":
        return n_samples
    if codec == "mulaw":
        return (n_samples + 1) // 2      # two 8-bit codes per word
    raise ValueError(f"unknown wire codec {codec!r}")


def wire_cap(batch: int, total_samples: int, align: int = 2048,
             codec: str = "pcm16") -> int:
    """Buffer length for ``batch`` utterances totalling ``total_samples``
    samples, rounded up so one compiled program serves many batches."""
    if codec == "mulaw":
        # each utterance rounds up to a word boundary independently
        total_words = (total_samples + batch) // 2 + batch % 2
    else:
        total_words = _codec_words(total_samples, codec)
    cap = 2 * batch + total_words
    return -(-cap // align) * align


def pack_audio(
    wavs: Sequence[np.ndarray], cap: int, batch: int | None = None,
    codec: str = "pcm16",
) -> np.ndarray:
    """Pack int16/float waveforms into one flat int16 wire buffer.

    codec='pcm16': float inputs are quantized with round(x * 32768)
    saturated to [-32768, 32767] — the EXACT inverse of the read_wav /
    unpack_audio normalization k -> k/32768, so audio that lived on disk
    as 16-bit wavs crosses the wire bit-exactly; int16 passes through.  codec='mulaw': samples are companded to 8-bit mu-law and
    packed two per int16 word (low byte first; each utterance starts on a
    word boundary) — HALF the wire bytes, for links where bandwidth is the
    serving bottleneck.  ``batch`` pads the header to a fixed batch size
    (missing rows get length 0), so a partially-filled final batch reuses
    the compiled program.  The codec is static: pass the same value to
    ``unpack_audio``.
    """
    b = batch if batch is not None else len(wavs)
    if len(wavs) > b:
        raise ValueError(f"{len(wavs)} wavs > batch {b}")
    flat = np.zeros((cap,), np.int16)
    pos = 2 * b
    for i, w in enumerate(wavs):
        w = np.asarray(w)
        n = w.shape[0]
        if n >= 1 << 30:
            raise ValueError(f"utterance {i} too long for wire: {n}")
        n_words = _codec_words(n, codec)
        if pos + n_words > cap:
            raise ValueError(
                f"wire overflow: need {pos + n_words}, cap {cap} "
                "(recompute wire_cap for this batch)"
            )
        flat[2 * i] = n & _LOW_MASK
        flat[2 * i + 1] = n >> _LOW_BITS
        if codec == "pcm16":
            if w.dtype != np.int16:
                # round(x * 32768): the exact inverse of k/32768 — the
                # truncating x*32767 variant shifted every disk sample
                # 1 LSB toward zero.  Saturate, don't wrap: samples at or
                # beyond +1.0 must clip (int16 overflow is UB-grade
                # distortion).
                w = np.clip(
                    np.round(w.astype(np.float64) * 32768.0),
                    -32768, 32767,
                ).astype(np.int16)
            flat[pos: pos + n] = w
        else:  # mulaw
            if w.dtype == np.int16:
                w = w.astype(np.float64) / 32768.0
            codes = mulaw_encode(w).astype(np.uint8)
            if n % 2:
                codes = np.concatenate([codes, np.zeros(1, np.uint8)])
            lo = codes[0::2].astype(np.uint16)
            hi = codes[1::2].astype(np.uint16)
            flat[pos: pos + n_words] = (lo | (hi << 8)).astype(np.int16)
        pos += n_words
    return flat


def unpack_audio(
    flat: jax.Array, batch: int, n_pad: int, codec: str = "pcm16"
) -> Tuple[jax.Array, jax.Array]:
    """flat int16 wire -> (float32 [batch, n_pad] padded wavs, lengths).

    Jittable; ``batch``, ``n_pad`` and ``codec`` are static. Rows are
    materialized by scanned contiguous dynamic-slices (DMA-friendly; see
    module doc).
    """
    if codec not in ("pcm16", "mulaw"):
        raise ValueError(f"unknown wire codec {codec!r}")
    hdr = 2 * batch
    lo = flat[0:hdr:2].astype(jnp.int32)
    hi = flat[1:hdr:2].astype(jnp.int32)
    lengths = lo + (hi << _LOW_BITS)
    t = jnp.arange(n_pad, dtype=jnp.int32)

    if codec == "pcm16":
        offsets = (hdr + jnp.cumsum(lengths) - lengths).astype(jnp.int32)
        padded_flat = jnp.pad(flat, (0, n_pad))

        def row(carry, off_len):
            off, ln = off_len
            seg = jax.lax.dynamic_slice_in_dim(padded_flat, off, n_pad)
            wav = jnp.where(
                t < ln, seg.astype(jnp.float32) * (1.0 / 32768.0), 0.0
            )
            return carry, wav

        _, wavs = jax.lax.scan(row, 0, (offsets, lengths))
        return wavs, lengths

    # mulaw: two 8-bit codes per word, utterances word-aligned
    n_pad_words = (n_pad + 1) // 2
    words = (lengths + 1) >> 1
    offsets = (hdr + jnp.cumsum(words) - words).astype(jnp.int32)
    padded_flat = jnp.pad(flat, (0, n_pad_words))

    def row_mulaw(carry, off_len):
        off, ln = off_len
        seg = jax.lax.dynamic_slice_in_dim(
            padded_flat, off, n_pad_words
        ).astype(jnp.int32)
        lo_b = ((seg & 0xFF) + 128) % 256 - 128          # sign-extend int8
        hi_b = (((seg >> 8) & 0xFF) + 128) % 256 - 128
        codes = jnp.stack([lo_b, hi_b], axis=-1).reshape(2 * n_pad_words)
        wav = mulaw_decode_device(codes[:n_pad])
        return carry, jnp.where(t < ln, wav, 0.0)

    _, wavs = jax.lax.scan(row_mulaw, 0, (offsets, lengths))
    return wavs, lengths


def pack_batches(
    wavs: Sequence[np.ndarray], batch: int, align: int = 2048,
    codec: str = "pcm16",
) -> Tuple[List[np.ndarray], int]:
    """Split ``wavs`` into wire buffers of ``batch`` rows sharing ONE cap
    (= one compiled program). Returns (buffers, cap)."""
    groups = [list(wavs[i: i + batch]) for i in range(0, len(wavs), batch)]
    if not groups:
        return [], wire_cap(batch, 0, align, codec)
    cap = max(
        wire_cap(batch, sum(len(np.asarray(w)) for w in g), align, codec)
        for g in groups
    )
    return [pack_audio(g, cap, batch=batch, codec=codec) for g in groups], cap
