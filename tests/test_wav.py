import numpy as np
import pytest

from asr_study_tpu.features.wav import read_wav, write_wav


def _sine(sr=16000, dur=0.25, freq=440.0):
    t = np.arange(int(sr * dur)) / sr
    return (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_pcm16_roundtrip(tmp_path):
    sig = _sine()
    path = str(tmp_path / "a.wav")
    write_wav(path, sig, 16000)
    out, sr = read_wav(path, sr=16000)
    assert sr == 16000
    assert out.dtype == np.float32
    assert out.shape == sig.shape
    # write scales by 32767, read divides by 32768 (librosa convention):
    # roundtrip error <= quantization step + scale mismatch
    np.testing.assert_allclose(out, sig, atol=2.0 / 32768)


def test_resample(tmp_path):
    sig = _sine(sr=8000)
    path = str(tmp_path / "b.wav")
    write_wav(path, sig, 8000)
    out, sr = read_wav(path, sr=16000)
    assert sr == 16000
    # 2x upsample: length doubles
    assert abs(len(out) - 2 * len(sig)) <= 2


def test_native_rate(tmp_path):
    sig = _sine(sr=8000)
    path = str(tmp_path / "c.wav")
    write_wav(path, sig, 8000)
    out, sr = read_wav(path, sr=None)
    assert sr == 8000
    assert len(out) == len(sig)


def test_bad_file(tmp_path):
    path = tmp_path / "bad.wav"
    path.write_bytes(b"not a wav file at all")
    with pytest.raises(ValueError):
        read_wav(str(path))
