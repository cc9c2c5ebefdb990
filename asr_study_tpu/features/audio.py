"""NumPy feature-extraction oracle (reference-parity CPU path).

This is the spec for every on-device feature implementation in this repo
(jax/ and pallas_fbank.py are golden-tested against it).  It mirrors the
reference's preprocessing chain [ref: preprocessing/audio.py] — wav -> framing
-> (pre-emphasis) -> windowed STFT -> mel filterbank -> log-energies / MFCC
(+ delta / delta-delta) — in the python_speech_features-style formulation the
reference uses, with the mel-scale convention (HTK vs. Slaney) configurable
(SURVEY.md §7 "hard parts" #1).

Defaults follow SURVEY.md §2.1: fs=16 kHz, 25 ms window / 10 ms hop, 40 mel
filters, 13 cepstra, Hamming window, HTK mel.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import numpy as np

from asr_study_tpu.features.wav import read_wav
from asr_study_tpu.utils.registry import register

EPS = 1e-10


# ---------------------------------------------------------------------------
# framing / spectra
# ---------------------------------------------------------------------------

def num_frames(signal_len: int, frame_len: int, frame_step: int) -> int:
    """Frame count with tail zero-padding: 1 frame if the signal is shorter
    than a window, else one per hop with a final padded frame."""
    if signal_len <= frame_len:
        return 1
    return 1 + int(math.ceil((signal_len - frame_len) / float(frame_step)))


def preemphasis(signal: np.ndarray, coeff: float = 0.97) -> np.ndarray:
    if coeff == 0.0:
        return signal.astype(np.float64)
    return np.append(signal[0], signal[1:] - coeff * signal[:-1])


def frame_signal(
    signal: np.ndarray,
    frame_len: int,
    frame_step: int,
    window: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Slice a 1-D signal into overlapping (zero-padded) frames [T, frame_len]."""
    signal = np.asarray(signal)
    nf = num_frames(len(signal), frame_len, frame_step)
    pad_len = (nf - 1) * frame_step + frame_len
    padded = np.concatenate(
        [signal, np.zeros(pad_len - len(signal), dtype=signal.dtype)]
    )
    idx = np.arange(frame_len)[None, :] + frame_step * np.arange(nf)[:, None]
    frames = padded[idx]
    if window is not None:
        frames = frames * window[None, :]
    return frames


def power_spectrum(frames: np.ndarray, nfft: int) -> np.ndarray:
    """Per-frame power spectrum: (1/NFFT) * |rfft|^2 -> [T, nfft//2 + 1]."""
    mag = np.abs(np.fft.rfft(frames, nfft))
    return (1.0 / nfft) * np.square(mag)


# ---------------------------------------------------------------------------
# mel scale
# ---------------------------------------------------------------------------

def hz_to_mel(hz, htk: bool = True):
    hz = np.asarray(hz, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + hz / 700.0)
    # Slaney: linear below 1 kHz, logarithmic above.
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (hz - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(
        hz >= min_log_hz,
        min_log_mel + np.log(np.maximum(hz, min_log_hz) / min_log_hz) / logstep,
        mels,
    )


def mel_to_hz(mel, htk: bool = True):
    mel = np.asarray(mel, dtype=np.float64)
    if htk:
        return 700.0 * (10.0 ** (mel / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * mel
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(
        mel >= min_log_mel,
        min_log_hz * np.exp(logstep * (mel - min_log_mel)),
        freqs,
    )


def mel_filterbank(
    nfilt: int,
    nfft: int,
    sr: int,
    low_freq: float = 0.0,
    high_freq: Optional[float] = None,
    htk: bool = True,
) -> np.ndarray:
    """Triangular mel filterbank on FFT-bin centres -> [nfilt, nfft//2 + 1].

    Uses the bin-quantized construction (``floor((nfft+1) * hz / sr)``) the
    reference's chain uses, so filter shapes match it exactly.
    """
    high_freq = high_freq or sr / 2.0
    mel_pts = np.linspace(
        hz_to_mel(low_freq, htk), hz_to_mel(high_freq, htk), nfilt + 2
    )
    bins = np.floor((nfft + 1) * mel_to_hz(mel_pts, htk) / sr).astype(int)
    fbank = np.zeros((nfilt, nfft // 2 + 1))
    for j in range(nfilt):
        lo, mid, hi = bins[j], bins[j + 1], bins[j + 2]
        for i in range(lo, mid):
            fbank[j, i] = (i - lo) / max(mid - lo, 1)
        for i in range(mid, hi):
            fbank[j, i] = (hi - i) / max(hi - mid, 1)
    return fbank


# ---------------------------------------------------------------------------
# deltas / lifter / dct
# ---------------------------------------------------------------------------

def delta(feat: np.ndarray, n: int = 2) -> np.ndarray:
    """Regression delta over a +-n frame window with edge replication."""
    if n < 1:
        raise ValueError("delta window must be >= 1")
    denom = 2.0 * sum(i * i for i in range(1, n + 1))
    padded = np.pad(feat, ((n, n), (0, 0)), mode="edge")
    out = np.zeros_like(feat, dtype=np.float64)
    for t in range(feat.shape[0]):
        window = padded[t : t + 2 * n + 1]
        out[t] = np.dot(np.arange(-n, n + 1), window) / denom
    return out


def lifter(cepstra: np.ndarray, l: int = 22) -> np.ndarray:
    if l <= 0:
        return cepstra
    ncoeff = cepstra.shape[1]
    lift = 1.0 + (l / 2.0) * np.sin(np.pi * np.arange(ncoeff) / l)
    return cepstra * lift[None, :]


def dct2_ortho_matrix(n_in: int, n_out: int) -> np.ndarray:
    """Orthonormal DCT-II matrix [n_out, n_in] (scipy.fftpack.dct norm='ortho')."""
    k = np.arange(n_out)[:, None]
    n = np.arange(n_in)[None, :]
    mat = np.cos(np.pi * k * (2 * n + 1) / (2.0 * n_in))
    mat *= np.sqrt(2.0 / n_in)
    mat[0] *= 1.0 / np.sqrt(2.0)
    return mat


# ---------------------------------------------------------------------------
# full chains (functional)
# ---------------------------------------------------------------------------

def fbank_features(
    signal: np.ndarray,
    sr: int = 16000,
    win_len: float = 0.025,
    win_step: float = 0.01,
    nfilt: int = 40,
    nfft: int = 512,
    low_freq: float = 0.0,
    high_freq: Optional[float] = None,
    preemph: float = 0.97,
    win_fun: Callable[[int], np.ndarray] = np.hamming,
    htk: bool = True,
):
    """-> (mel-filterbank energies [T, nfilt], total frame energy [T])."""
    frame_len = int(round(win_len * sr))
    frame_step = int(round(win_step * sr))
    sig = preemphasis(signal, preemph)
    frames = frame_signal(sig, frame_len, frame_step, win_fun(frame_len))
    pspec = power_spectrum(frames, nfft)
    energy = np.sum(pspec, axis=1)
    energy = np.where(energy == 0, np.finfo(np.float64).eps, energy)
    fb = mel_filterbank(nfilt, nfft, sr, low_freq, high_freq, htk)
    feat = pspec @ fb.T
    feat = np.where(feat == 0, np.finfo(np.float64).eps, feat)
    return feat, energy


# ---------------------------------------------------------------------------
# Feature classes (reference API shape: Feature()(wav_path) -> [T, F])
# ---------------------------------------------------------------------------

class Feature:
    """Base feature extractor [ref: preprocessing/audio.py::Feature].

    Callable on a wav path or a raw signal array; subclasses implement
    ``_transform(signal) -> [T, F]``.  ``mean_norm``/``var_norm`` apply
    per-utterance CMVN.
    """

    def __init__(
        self,
        fs: int = 16000,
        mean_norm: bool = False,
        var_norm: bool = False,
        eps: float = EPS,
    ):
        self.fs = int(fs)
        self.mean_norm = mean_norm
        self.var_norm = var_norm
        self.eps = eps

    @property
    def num_feats(self) -> int:
        raise NotImplementedError

    def _transform(self, signal: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    def _load(self, audio) -> np.ndarray:
        if isinstance(audio, (str, bytes)):
            signal, _ = read_wav(audio, sr=self.fs)
            return signal
        return np.asarray(audio)

    def __call__(self, audio) -> np.ndarray:
        feats = self._transform(self._load(audio))
        if self.mean_norm:
            feats = feats - feats.mean(axis=0, keepdims=True)
        if self.var_norm:
            feats = feats / (feats.std(axis=0, keepdims=True) + self.eps)
        return np.ascontiguousarray(feats, dtype=np.float32)

    def __str__(self) -> str:
        return type(self).__name__.lower()


@register("feature")
class Raw(Feature):
    """Raw waveform as a [T, 1] feature [ref: preprocessing/audio.py::Raw]."""

    @property
    def num_feats(self) -> int:
        return 1

    def _transform(self, signal: np.ndarray) -> np.ndarray:
        return signal.reshape(-1, 1)


class _SpectralFeature(Feature):
    def __init__(
        self,
        fs: int = 16000,
        win_len: float = 0.025,
        win_step: float = 0.01,
        nfilt: int = 40,
        nfft: int = 512,
        low_freq: float = 0.0,
        high_freq: Optional[float] = None,
        preemph: float = 0.97,
        htk: bool = True,
        log_floor: float = 0.0,
        **kw,
    ):
        super().__init__(fs=fs, **kw)
        self.win_len = win_len
        self.win_step = win_step
        self.nfilt = nfilt
        self.nfft = nfft
        self.low_freq = low_freq
        self.high_freq = high_freq
        self.preemph = preemph
        self.htk = htk
        # Optional ABSOLUTE power-domain floor applied to mel energies and
        # total frame energy before any log.  0.0 = reference behavior
        # (only exact zeros floored at eps).  A floor ~60-80 dB below
        # typical frame power bounds the log-domain divergence between this
        # f64 oracle and the f32 device/Pallas paths on near-silent
        # channels (where log amplifies eps-level DFT differences) —
        # VERDICT r1 "device-feature parity tolerance".  Applied
        # identically in all three implementations.
        self.log_floor = float(log_floor)

    def _floor(self, arr: np.ndarray) -> np.ndarray:
        return np.maximum(arr, self.log_floor) if self.log_floor > 0 else arr

    def _fbank(self, signal):
        return fbank_features(
            signal,
            sr=self.fs,
            win_len=self.win_len,
            win_step=self.win_step,
            nfilt=self.nfilt,
            nfft=self.nfft,
            low_freq=self.low_freq,
            high_freq=self.high_freq,
            preemph=self.preemph,
            htk=self.htk,
        )


@register("feature")
class FBank(_SpectralFeature):
    """Linear mel-filterbank energies [T, nfilt]
    [ref: preprocessing/audio.py::FBank]."""

    @property
    def num_feats(self) -> int:
        return self.nfilt

    def _transform(self, signal: np.ndarray) -> np.ndarray:
        feat, _ = self._fbank(signal)
        return feat


@register("feature")
class LogFbank(_SpectralFeature):
    """Log mel-filterbank energies, optionally with appended log-energy and
    deltas [ref: preprocessing/audio.py::LogFbank]."""

    def __init__(self, d: bool = False, dd: bool = False, append_energy: bool = False, **kw):
        super().__init__(**kw)
        self.d = d
        self.dd = dd or False
        self.append_energy = append_energy

    @property
    def num_feats(self) -> int:
        base = self.nfilt + (1 if self.append_energy else 0)
        return base * (1 + int(self.d) + int(self.dd))

    def _transform(self, signal: np.ndarray) -> np.ndarray:
        feat, energy = self._fbank(signal)
        feat = np.log(self._floor(feat))
        if self.append_energy:
            feat = np.hstack([feat, np.log(self._floor(energy))[:, None]])
        out = [feat]
        if self.d:
            out.append(delta(feat, 2))
        if self.dd:
            out.append(delta(out[-1], 2))
        return np.hstack(out)


@register("feature")
class MFCC(_SpectralFeature):
    """Mel-frequency cepstral coefficients with liftering, optional energy
    replacement of c0, and delta / delta-delta appends
    [ref: preprocessing/audio.py::MFCC].
    """

    def __init__(
        self,
        num_cep: int = 13,
        cep_lifter: int = 22,
        append_energy: bool = True,
        d: bool = True,
        dd: bool = True,
        **kw,
    ):
        super().__init__(**kw)
        self.num_cep = num_cep
        self.cep_lifter = cep_lifter
        self.append_energy = append_energy
        self.d = d
        self.dd = dd

    @property
    def num_feats(self) -> int:
        return self.num_cep * (1 + int(self.d) + int(self.dd))

    def _transform(self, signal: np.ndarray) -> np.ndarray:
        feat, energy = self._fbank(signal)
        logfeat = np.log(self._floor(feat))
        dct = dct2_ortho_matrix(self.nfilt, self.num_cep)
        cep = logfeat @ dct.T
        cep = lifter(cep, self.cep_lifter)
        if self.append_energy:
            cep[:, 0] = np.log(self._floor(energy))
        out = [cep]
        if self.d:
            out.append(delta(cep, 2))
        if self.dd:
            out.append(delta(out[-1], 2))
        return np.hstack(out)
