"""Native C++ host runtime (wav decode, batch pack, levenshtein) vs. the
Python fallbacks."""

import numpy as np
import pytest

from asr_study_tpu.features.wav import read_wav, write_wav
from asr_study_tpu.utils import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no compiler?)"
)


def test_wav_roundtrip_matches_python(tmp_path):
    sig = (0.4 * np.sin(np.arange(8000) / 20.0)).astype(np.float32)
    path = str(tmp_path / "t.wav")
    write_wav(path, sig, 16000)
    out = native.read_wav(path)
    assert out is not None
    got, sr = out
    assert sr == 16000
    # python reader on the same file
    want, sr2 = read_wav(path, sr=None)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_pack_batch():
    rows = [
        np.arange(6, dtype=np.float32).reshape(2, 3),
        np.arange(9, dtype=np.float32).reshape(3, 3) + 100,
    ]
    out = native.pack_batch(rows, t_pad=4)
    assert out is not None
    assert out.shape == (2, 4, 3)
    np.testing.assert_array_equal(out[0, :2], rows[0])
    np.testing.assert_array_equal(out[0, 2:], 0)
    np.testing.assert_array_equal(out[1, :3], rows[1])


@pytest.mark.parametrize("seed", range(5))
def test_levenshtein_matches_python(seed):
    rng = np.random.RandomState(seed)
    a = rng.randint(0, 5, size=rng.randint(0, 20)).tolist()
    b = rng.randint(0, 5, size=rng.randint(1, 20)).tolist()

    def py(a, b):
        prev = list(range(len(b) + 1))
        for i, x in enumerate(a):
            cur = [i + 1]
            for j, y in enumerate(b):
                cur.append(
                    min(prev[j + 1] + 1, cur[j] + 1, prev[j] + (x != y))
                )
            prev = cur
        return prev[-1]

    assert native.levenshtein(a, b) == py(a, b)
