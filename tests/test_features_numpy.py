"""Golden tests for the NumPy feature oracle (BASELINE config 1).

The oracle is the parity spec (SURVEY.md §6): each DSP stage is verified
against an independent formulation (scipy FFT/DCT, hand-rolled framing,
closed-form mel breakpoints) so that silent convention drift is caught.
"""

import numpy as np
import pytest
import scipy.fft

from asr_study_tpu.features import audio as A
from asr_study_tpu.features import audio


def _sig(n=4000, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(n).astype(np.float32) * 0.1


# -- framing ---------------------------------------------------------------

def test_num_frames():
    assert A.num_frames(100, 400, 160) == 1
    assert A.num_frames(400, 400, 160) == 1
    assert A.num_frames(401, 400, 160) == 2
    assert A.num_frames(560, 400, 160) == 2
    assert A.num_frames(561, 400, 160) == 3


def test_frame_signal_values():
    sig = np.arange(1000, dtype=np.float64)
    frames = A.frame_signal(sig, 400, 160)
    assert frames.shape == (A.num_frames(1000, 400, 160), 400)
    np.testing.assert_array_equal(frames[0], sig[:400])
    np.testing.assert_array_equal(frames[1], sig[160:560])
    # last frame zero-padded
    last_start = (frames.shape[0] - 1) * 160
    tail = sig[last_start:]
    np.testing.assert_array_equal(frames[-1][: len(tail)], tail)
    np.testing.assert_array_equal(frames[-1][len(tail):], 0)


def test_preemphasis():
    sig = np.array([1.0, 2.0, 3.0])
    out = A.preemphasis(sig, 0.5)
    np.testing.assert_allclose(out, [1.0, 1.5, 2.0])


# -- spectra ----------------------------------------------------------------

def test_power_spectrum_parseval():
    frames = A.frame_signal(_sig(), 400, 160, np.hamming(400))
    ps = A.power_spectrum(frames, 512)
    assert ps.shape == (frames.shape[0], 257)
    # cross-check against scipy rfft
    ref = (1.0 / 512) * np.abs(scipy.fft.rfft(frames, 512)) ** 2
    np.testing.assert_allclose(ps, ref, rtol=1e-10, atol=1e-12)


# -- mel scale --------------------------------------------------------------

def test_mel_roundtrip_htk():
    hz = np.linspace(0, 8000, 100)
    np.testing.assert_allclose(A.mel_to_hz(A.hz_to_mel(hz, True), True), hz, atol=1e-6)


def test_mel_roundtrip_slaney():
    hz = np.linspace(0, 8000, 100)
    np.testing.assert_allclose(A.mel_to_hz(A.hz_to_mel(hz, False), False), hz, atol=1e-6)


def test_mel_htk_known_values():
    # 2595*log10(1 + 1000/700) = 999.9855...
    np.testing.assert_allclose(A.hz_to_mel(1000.0, True), 999.98553, atol=1e-4)
    np.testing.assert_allclose(A.hz_to_mel(0.0, True), 0.0)


def test_mel_slaney_linear_below_1k():
    np.testing.assert_allclose(A.hz_to_mel(500.0, False), 500.0 / (200.0 / 3))


def test_filterbank_shape_and_coverage():
    fb = A.mel_filterbank(40, 512, 16000)
    assert fb.shape == (40, 257)
    assert (fb >= 0).all()
    # every filter is non-empty
    assert (fb.sum(axis=1) > 0).all()
    # triangles peak at 1 in the quantized construction
    assert fb.max() <= 1.0 + 1e-12


# -- dct / lifter / delta ----------------------------------------------------

def test_dct_matches_scipy():
    x = np.random.default_rng(1).standard_normal((7, 40))
    mat = A.dct2_ortho_matrix(40, 13)
    ours = x @ mat.T
    ref = scipy.fft.dct(x, type=2, axis=1, norm="ortho")[:, :13]
    np.testing.assert_allclose(ours, ref, rtol=1e-9, atol=1e-10)


def test_lifter_identity_when_zero():
    x = np.random.default_rng(2).standard_normal((5, 13))
    np.testing.assert_array_equal(A.lifter(x, 0), x)


def test_delta_constant_is_zero():
    x = np.ones((10, 4))
    np.testing.assert_allclose(A.delta(x, 2), 0.0, atol=1e-12)


def test_delta_linear_ramp():
    # f(t) = t  ->  delta == 1 in the interior (regression slope)
    x = np.arange(20, dtype=np.float64)[:, None] * np.ones((1, 3))
    d = A.delta(x, 2)
    np.testing.assert_allclose(d[2:-2], 1.0, atol=1e-12)


# -- feature classes ---------------------------------------------------------

def test_mfcc_shape():
    m = A.MFCC()
    feats = m(_sig())
    t = A.num_frames(4000, 400, 160)
    assert feats.shape == (t, 39)  # 13 * (1 + d + dd)
    assert feats.dtype == np.float32


def test_mfcc_energy_replaces_c0():
    sig = _sig()
    with_e = A.MFCC(append_energy=True, d=False, dd=False)(sig)
    no_e = A.MFCC(append_energy=False, d=False, dd=False)(sig)
    assert not np.allclose(with_e[:, 0], no_e[:, 0])
    np.testing.assert_allclose(with_e[:, 1:], no_e[:, 1:], rtol=1e-5)


def test_logfbank_shapes():
    f = A.LogFbank(nfilt=40)
    assert f(_sig()).shape[1] == 40
    f2 = A.LogFbank(nfilt=40, d=True, dd=True, append_energy=True)
    assert f2(_sig()).shape[1] == 41 * 3
    assert f2.num_feats == 41 * 3


def test_fbank_positive():
    f = A.FBank(nfilt=40)
    assert (f(_sig()) > 0).all()


def test_raw():
    r = A.Raw()
    sig = _sig()
    out = r(sig)
    assert out.shape == (len(sig), 1)


def test_cmvn():
    m = A.MFCC(mean_norm=True, var_norm=True)
    feats = m(_sig())
    np.testing.assert_allclose(feats.mean(axis=0), 0.0, atol=1e-4)
    np.testing.assert_allclose(feats.std(axis=0), 1.0, atol=1e-2)


def test_feature_from_path(tmp_path):
    from asr_study_tpu.features.wav import write_wav

    sig = _sig()
    path = str(tmp_path / "x.wav")
    write_wav(path, sig, 16000)
    feats = A.MFCC()(path)
    assert feats.shape[1] == 39


def test_registry():
    from asr_study_tpu.utils import get_from_module

    cls = get_from_module("feature", "mfcc")
    assert cls is A.MFCC
    with pytest.raises(KeyError):
        get_from_module("feature", "nope")


# ---------------------------------------------------------------------------
# librosa-convention mode (VERDICT r2 #3)
# ---------------------------------------------------------------------------

class TestLibrosaConvention:
    def test_center_framing_matches_torch_stft(self):
        """Independent oracle: our center=True power spectrum must equal
        torch.stft(center=True, pad_mode='reflect') with a 400-sample
        periodic-hann window padded to nfft=512 — torch places the window
        centered in the n_fft frame, which shifts ours by a pure phase
        that |.|^2 kills."""
        import torch

        rng = np.random.RandomState(0)
        sig = (0.3 * np.sin(2 * np.pi * 317 * np.arange(7000) / 16000.0)
               + 0.05 * rng.randn(7000)).astype(np.float64)
        fl, hop, nfft = 400, 160, 512
        win = audio.periodic_hann(fl)

        padded = audio.center_pad(sig, fl // 2, "reflect")
        nf = audio.num_frames(len(sig), fl, hop, center=True)
        frames = audio.frame_signal(padded, fl, hop, win, n_frames=nf)
        pspec = audio.power_spectrum(frames, nfft)

        t = torch.stft(
            torch.from_numpy(sig), n_fft=nfft, hop_length=hop,
            win_length=fl, window=torch.from_numpy(win),
            center=True, pad_mode="reflect", return_complex=True,
        )
        want = (t.abs().numpy() ** 2).T / nfft      # [T, K]
        assert want.shape[0] == nf
        np.testing.assert_allclose(pspec, want, rtol=1e-7, atol=1e-10)

    def test_librosa_filterbank_shape(self):
        """Continuous-triangle construction: peak at the centre frequency,
        support exactly (hz[j], hz[j+2]), linear flanks, and the Slaney
        area norm scales each triangle by 2/bandwidth."""
        nfilt, nfft, sr = 40, 512, 16000
        fb = audio.mel_filterbank(nfilt, nfft, sr, htk=False,
                                  construction="librosa")
        fbn = audio.mel_filterbank(nfilt, nfft, sr, htk=False,
                                   construction="librosa", norm="slaney")
        mel_pts = np.linspace(audio.hz_to_mel(0.0, False),
                              audio.hz_to_mel(sr / 2.0, False), nfilt + 2)
        hz = audio.mel_to_hz(mel_pts, False)
        freqs = np.arange(nfft // 2 + 1) * sr / nfft
        for j in (0, 7, 20, 39):
            inside = (freqs > hz[j]) & (freqs < hz[j + 2])
            assert np.all(fb[j][~inside] == 0.0)
            # linear flanks evaluated in continuous frequency space
            up = (freqs - hz[j]) / (hz[j + 1] - hz[j])
            down = (hz[j + 2] - freqs) / (hz[j + 2] - hz[j + 1])
            want = np.maximum(0.0, np.minimum(up, down))
            np.testing.assert_allclose(fb[j], want, atol=1e-12)
            np.testing.assert_allclose(
                fbn[j], want * 2.0 / (hz[j + 2] - hz[j]), atol=1e-12
            )
        # quantized construction differs (bin-snapped breakpoints)
        fq = audio.mel_filterbank(nfilt, nfft, sr, htk=False)
        assert np.abs(fb - fq).max() > 0.01

    def test_convention_resolution(self):
        m = audio.MFCC(convention="librosa")
        assert (m.htk, m.window, m.center) == (False, "hann", True)
        assert (m.filterbank, m.fb_norm) == ("librosa", "slaney")
        # explicit knobs beat the convention defaults
        m2 = audio.MFCC(convention="librosa", htk=True, center=False)
        assert m2.htk is True and m2.center is False
        assert m2.filterbank == "librosa"
        d = audio.MFCC()
        assert (d.htk, d.window, d.center) == (True, "hamming", False)
        assert (d.filterbank, d.fb_norm) == ("quantized", None)
        with pytest.raises(ValueError, match="convention"):
            audio.MFCC(convention="nope")
        with pytest.raises(ValueError, match="window"):
            audio.MFCC(window="blackman")

    def test_center_num_frames(self):
        for ln in (1, 159, 160, 400, 401, 7000):
            assert audio.num_frames(ln, 400, 160, center=True) \
                == 1 + ln // 160

    def test_librosa_mfcc_runs_end_to_end(self):
        rng = np.random.RandomState(1)
        sig = rng.randn(5000).astype(np.float32) * 0.2
        m = audio.MFCC(convention="librosa")
        out = m(sig)
        assert out.shape == (audio.num_frames(5000, 400, 160, center=True),
                             m.num_feats)
        assert np.all(np.isfinite(out))
