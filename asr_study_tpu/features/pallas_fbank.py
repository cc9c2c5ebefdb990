"""Fused Pallas TPU kernel: wav -> framing -> window -> DFT -> mel -> log
(-> DCT/lifter for MFCC), one kernel launch per batch.

The BASELINE north-star feature path: instead of materializing the
[B, T, frame_len] frame tensor in HBM (as the XLA path in device.py does),
each grid step receives a 128-frame block of hop-rows and runs the whole
per-frame chain as three back-to-back MXU matmuls (DFT-real, DFT-imag,
mel), writing only the final [128, F] feature block to HBM.

Framing without gathers, reshapes, or unaligned dynamic slices (all of
which Mosaic rejects): the wav is laid out as hop-rows [B, M, hop] and the
kernel takes ``ceil(frame_len/hop)`` *shifted views* of that array, each
delivered as a [1, TT, hop] block by its own BlockSpec index map.  Frame t
is the lane-axis concatenation of row t from each view, zero-padded to
``n_parts*hop`` samples; the window (zero beyond frame_len) kills the
overhang, so the DFT matrices just carry zero rows there.

Deltas / per-utterance masking stay outside (XLA): they are elementwise,
cheap, and need cross-tile halos.  Pre-emphasis + tail-zeroing also happen
outside (one fused elementwise pass), keeping the kernel shape-static.

Parity: golden-tested against the NumPy oracle (audio.py) via
``interpret=True`` on CPU and compiled on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from asr_study_tpu.features import audio
from asr_study_tpu.features.device import DeviceFeaturizer, _delta_device

_TT = 128            # frames per grid step

# In-kernel DFT-matmul precision.  On TPU an f32 matmul is emulated as
# bf16 MXU passes: DEFAULT=1, HIGHEST=6 — and Mosaic does not lower the
# 3-pass HIGH, so "high" here is a manual error-compensated split
# (x_hi@w_hi + x_hi@w_lo + x_lo@w_hi).  The two DFT dots carry ~85% of
# the kernel's FLOPs; measured on v5e (B=32, 8 s utterances):
# highest 2.06 -> high 1.75 -> default 1.50 ms/batch.  Parity cost of
# "high": worst-case 1.3e-3 absolute in log domain — inside the 2e-3
# vs-oracle contract but NOT the default build's 1e-4, because the bf16
# hi/lo split representation itself carries ~2^-18 relative error that
# near-silent mel channels amplify under log (keeping the lo@lo term
# too was measured to not help).  Default stays "highest" = f32-exact;
# set ASR_FEAT_MM_PRECISION=high for serving paths that prefer the
# speed.  "default" is the raw 1-pass bf16 matmul (~2e-3 relative: NOT
# parity-safe, measurement/ablation use only).
from asr_study_tpu.utils.env import choice_env

_FEAT_MM_PRECISION = choice_env(
    "ASR_FEAT_MM_PRECISION", "highest", ("highest", "high", "default")
)

# Mel-projection precision (r5).  The r5 probe ladder found the mel
# matmul carries ~0.5 ms of the kernel's 1.8 (issue/dependency-bound:
# 1-pass bf16 and 3-pass hi/lo both land ~1.73-1.74 vs HIGHEST's 1.84,
# so only ~0.1 ms is precision-reducible — BENCHMARKS.md r5 ladder).
# Unlike the DFT dots, pspec and the mel weights are both NONNEGATIVE:
# the dot has no cancellation, and the hi/lo split's measured log-domain
# error is 1.5e-5 on speech-like inputs (vs the DFT "high" tier's
# 1.3e-3) — inside the 1e-4 default-build contract, so "high" is the
# default here.  Set ASR_FEAT_MEL_PRECISION=highest for f32-exact.
_FEAT_MEL_PRECISION = choice_env(
    "ASR_FEAT_MEL_PRECISION", "high", ("highest", "high")
)


def _mel_dot(x, w):
    """Nonnegative-data matmul at the configured mel precision."""
    if _FEAT_MEL_PRECISION == "highest":
        return jnp.dot(x, w, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    x_hi = x.astype(jnp.bfloat16)
    x_lo = (x - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    w_hi = w.astype(jnp.bfloat16)
    w_lo = (w - w_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    acc = jnp.dot(x_hi, w_lo, preferred_element_type=jnp.float32)
    acc += jnp.dot(x_lo, w_hi, preferred_element_type=jnp.float32)
    acc += jnp.dot(x_hi, w_hi, preferred_element_type=jnp.float32)
    return acc


def _dft_dot(x, w):
    """f32 matmul with f32 accumulation at the configured MXU precision."""
    if _FEAT_MM_PRECISION == "highest":
        return jnp.dot(x, w, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    if _FEAT_MM_PRECISION == "default":
        return jnp.dot(x, w, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.DEFAULT)
    x_hi = x.astype(jnp.bfloat16)
    x_lo = (x - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    w_hi = w.astype(jnp.bfloat16)
    w_lo = (w - w_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    acc = jnp.dot(x_hi, w_lo, preferred_element_type=jnp.float32)
    acc += jnp.dot(x_lo, w_hi, preferred_element_type=jnp.float32)
    acc += jnp.dot(x_hi, w_hi, preferred_element_type=jnp.float32)
    return acc


def _fbank_kernel(
    *refs,
    n_parts: int,
    nfft: int,
    mfcc: bool,
    append_energy: bool,
    logfbank_energy: bool,
    log_floor: float,
):
    # refs: view_0..view_{n_parts-1} [1, TT, hop], cos [L, K], sin [L, K],
    #       win [1, L], mel [K, nfilt], dct [nfilt, ncep], lift [1, ncep],
    #       out [1, TT, F_out]
    views = refs[:n_parts]
    cos_ref, sin_ref, win_ref, mel_ref, dct_ref, lift_ref = refs[
        n_parts : n_parts + 6
    ]
    out_ref = refs[n_parts + 6]

    frames = jnp.concatenate(
        [v[0, :, :] for v in views], axis=-1
    )                                            # [TT, n_parts*hop]
    frames = frames * win_ref[0, :]              # window zeroes the overhang

    re = _dft_dot(frames, cos_ref[...])
    im = _dft_dot(frames, sin_ref[...])
    pspec = (re * re + im * im) * (1.0 / nfft)   # [TT, K]

    feat = _mel_dot(pspec, mel_ref[...])
    feat = jnp.log(jnp.maximum(feat, log_floor))
    if mfcc:
        cep = jnp.dot(feat, dct_ref[...], preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
        cep = cep * lift_ref[0, :]
        if append_energy:
            energy = jnp.sum(pspec, axis=-1, keepdims=True)
            log_e = jnp.log(jnp.maximum(energy, log_floor))
            col = jax.lax.broadcasted_iota(jnp.int32, cep.shape, 1)
            cep = jnp.where(col == 0, log_e, cep)
        feat = cep
    elif logfbank_energy:
        # appended log-energy column (audio.LogFbank append_energy=True);
        # lane-axis concat is Mosaic-legal (the framing above relies on it)
        energy = jnp.sum(pspec, axis=-1, keepdims=True)
        log_e = jnp.log(jnp.maximum(energy, log_floor))
        feat = jnp.concatenate([feat, log_e], axis=-1)
    if feat.shape[-1] < out_ref.shape[-1]:
        # the output block is lane-padded to a full 128-lane tile: a
        # [TT, 13] sub-tile store masks every lane write (measured
        # +0.12 ms/batch, BENCHMARKS.md r4 ladder extension); the host
        # slices the dead lanes off after the call
        feat = jnp.pad(
            feat, ((0, 0), (0, out_ref.shape[-1] - feat.shape[-1]))
        )
    out_ref[0, :, :] = feat


class PallasFeaturizer(DeviceFeaturizer):
    """Drop-in DeviceFeaturizer whose core chain runs as one fused Pallas
    kernel.  ``interpret=True`` runs the kernel in interpreter mode (CPU
    testing).  Deltas and masking reuse the XLA implementations.
    """

    def __init__(self, *args, interpret: bool = False, **kw):
        self._interpret = interpret
        super().__init__(*args, **kw)
        if self.kind != "raw" and self.frame_len <= self.frame_step:
            raise ValueError(
                "PallasFeaturizer requires overlapping frames "
                "(frame_len > frame_step; default 400/160 works)"
            )

    def _transform(self, wavs: jax.Array, wav_lengths: jax.Array):
        if self.kind == "raw":
            # no spectral chain to fuse; the XLA raw path is optimal
            return super()._transform(wavs, wav_lengths)
        batch, n_samples = wavs.shape
        wavs = wavs.astype(self.dtype)
        wav_lengths = wav_lengths.astype(jnp.int32)

        # shared prep (preemph + zeroing + optional librosa centering);
        # framing below reads `pre` at t*hop in both conventions
        pre, t_out, feat_lengths = self._prep(wavs, wav_lengths)

        hop = self.frame_step
        t_pad = ((t_out + _TT - 1) // _TT) * _TT
        n_tiles = t_pad // _TT
        n_parts = -(-self.frame_len // hop)      # ceil
        l_pad = n_parts * hop                    # padded frame length
        n_rows = t_pad + n_parts
        need = n_rows * hop
        if need > pre.shape[1]:
            pre = jnp.pad(pre, ((0, 0), (0, need - pre.shape[1])))
        rows = pre[:, :need].reshape(batch, n_rows, hop)
        # hop-shifted views; view j's row t holds samples [t*hop + j*hop)
        views = [rows[:, j : j + t_pad, :] for j in range(n_parts)]

        # operator tables padded to the window-zeroed frame length
        cos = self._cos
        sin = self._sin
        win = self._window
        if l_pad > self.frame_len:
            z = l_pad - self.frame_len
            cos = jnp.pad(cos, ((0, z), (0, 0)))
            sin = jnp.pad(sin, ((0, z), (0, 0)))
            win = jnp.pad(win, ((0, z),))

        mfcc = self.kind == "mfcc"
        logfbank_energy = self.kind == "logfbank" and self.append_energy
        f_core = self.num_cep if mfcc else (
            self.nfilt + (1 if logfbank_energy else 0)
        )
        # lane-pad the output block to a full 128-lane tile (sub-tile
        # stores mask per-lane; measured 1.86 -> 1.74 ms/batch at MFCC's
        # f_core=13).  The kernel zero-fills the dead lanes; the slice
        # below drops them before anything downstream sees the array.
        f_blk = -(-f_core // 128) * 128
        k_bins = self.nfft // 2 + 1

        kernel = functools.partial(
            _fbank_kernel,
            n_parts=n_parts,
            nfft=self.nfft,
            mfcc=mfcc,
            append_energy=self.append_energy and mfcc,
            logfbank_energy=logfbank_energy,
            # linear fbank exponentiates the kernel's log back: keep the
            # eps-only floor there so log_floor never alters linear values
            log_floor=(
                float(jnp.finfo(jnp.float32).eps)
                if self.kind == "fbank" else self.log_floor
            ),
        )
        view_specs = [
            pl.BlockSpec(
                (1, _TT, hop), lambda b, t: (b, t, 0),
                memory_space=pltpu.VMEM,
            )
            for _ in range(n_parts)
        ]
        const_specs = [
            pl.BlockSpec(
                (l_pad, k_bins), lambda b, t: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (l_pad, k_bins), lambda b, t: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, l_pad), lambda b, t: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (k_bins, self.nfilt), lambda b, t: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (self.nfilt, self.num_cep), lambda b, t: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, self.num_cep), lambda b, t: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        base = pl.pallas_call(
            kernel,
            grid=(batch, n_tiles),
            in_specs=view_specs + const_specs,
            out_specs=pl.BlockSpec(
                (1, _TT, f_blk), lambda b, t: (b, t, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (batch, t_pad, f_blk), self.dtype
            ),
            interpret=self._interpret,
        )(
            *views,
            cos,
            sin,
            win[None, :],
            self._fbank,
            self._dct,
            self._lift[None, :],
        )
        base = base[:, :t_out, :f_core]

        if self.kind == "fbank":
            # kernel emits log-mel; undo the log for linear fbank parity
            out = jnp.exp(base)
        else:
            outs = [base]
            if self.d:
                outs.append(_delta_device(outs[-1], feat_lengths))
            if self.dd:
                outs.append(_delta_device(outs[-1], feat_lengths))
            out = jnp.concatenate(outs, axis=-1)
        return self._finalize(out, feat_lengths)
