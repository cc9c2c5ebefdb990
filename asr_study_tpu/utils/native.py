"""ctypes loader for the native C++ host runtime (native/asr_native.cc).

Builds the shared library on first use (``make -C native``) and degrades
gracefully: every caller falls back to the NumPy/Python implementation when
the library is unavailable (no compiler, read-only checkout, ...).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libasrnative.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True, capture_output=True, timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _stale() -> bool:
    """Library missing or older than its source — rebuild BEFORE dlopen.

    Staleness is decided by mtime, never by loading and probing symbols:
    dlopen caches handles by path, so the old load->rebuild->reload dance
    handed back the SAME stale handle after `make` relinked the .so in
    place under it (and left the live mapping's backing file rewritten —
    UB).  The mtime check needs no handle at all (r5 review)."""
    if not os.path.exists(_LIB_PATH):
        return True
    lib_m = os.path.getmtime(_LIB_PATH)
    for f in ("asr_native.cc", "Makefile"):
        p = os.path.join(_NATIVE_DIR, f)
        if os.path.exists(p) and os.path.getmtime(p) > lib_m:
            return True
    return False


def load() -> Optional[ctypes.CDLL]:
    """Returns the native library, building it if needed; None if impossible."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if _stale() and not _build() and not os.path.exists(_LIB_PATH):
            return None
        # a failed rebuild with an existing (old) library still loads:
        # newer entry points are hasattr-guarded here and in the
        # wrappers, so callers fall back per function
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.asr_read_wav.restype = ctypes.c_long
        lib.asr_read_wav.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.asr_pack_batch.restype = None
        lib.asr_pack_batch.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
        ]
        if hasattr(lib, "asr_pack_batch_full"):
            lib.asr_pack_batch_full.restype = None
            lib.asr_pack_batch_full.argtypes = [
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float),
            ]
        if hasattr(lib, "asr_dpack_encode_v2"):
            lib.asr_dpack_encode_v2.restype = ctypes.c_long
            lib.asr_dpack_encode_v2.argtypes = [
                ctypes.POINTER(ctypes.c_int16), ctypes.c_long,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_uint16),
            ]
        lib.asr_levenshtein.restype = ctypes.c_long
        lib.asr_levenshtein.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_long,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_long,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return load() is not None


# ---------------------------------------------------------------------------
# typed wrappers (None / fallback-raising on unavailability handled by caller)
# ---------------------------------------------------------------------------

def read_wav(path: str, max_seconds: float = 600.0):
    """-> (float32 signal [N], sample_rate) or None if native unavailable /
    file unsupported (caller falls back to the Python reader)."""
    lib = load()
    if lib is None:
        return None
    max_samples = int(max_seconds * 48000)
    buf = np.empty((max_samples,), np.float32)
    sr = ctypes.c_int(0)
    n = lib.asr_read_wav(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_samples, ctypes.byref(sr),
    )
    if n < 0:
        return None
    return buf[:n].copy(), int(sr.value)


def pack_batch(rows, t_pad: int) -> Optional[np.ndarray]:
    """Pack a list of float32 [T_i, F] arrays into [B, t_pad, F] (zeros
    beyond each row).  Returns None if native unavailable."""
    lib = load()
    if lib is None or not rows:
        return None
    feat_dim = rows[0].shape[1]
    lens = np.array([r.shape[0] for r in rows], np.int64)
    offsets = np.zeros((len(rows),), np.int64)
    np.cumsum(lens[:-1], out=offsets[1:])
    src = np.ascontiguousarray(
        np.concatenate([r.reshape(-1, feat_dim) for r in rows], axis=0),
        np.float32,
    )
    out = np.zeros((len(rows), t_pad, feat_dim), np.float32)
    lib.asr_pack_batch(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(rows), t_pad, feat_dim,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


def pack_batch_into(src: np.ndarray, offsets: np.ndarray, lens: np.ndarray,
                    out: np.ndarray) -> bool:
    """Pack rows straight from a flat [sum_T, F] float32 buffer into the
    caller's [B, t_pad, F] buffer — row i of the batch spans
    ``src[offsets[i]:offsets[i]+lens[i]]``.  Fully defines ``out`` (padded
    tails and rows beyond len(offsets) are zeroed), so ``out`` may be
    uninitialized.  Returns False when the native library (or the symbol,
    on a stale build) is unavailable."""
    lib = load()
    if lib is None or not hasattr(lib, "asr_pack_batch_full"):
        return False
    if not (out.flags.c_contiguous and out.dtype == np.float32):
        return False
    src = np.ascontiguousarray(src, np.float32)
    offsets = np.ascontiguousarray(offsets, np.int64)
    lens = np.ascontiguousarray(lens, np.int64)
    lib.asr_pack_batch_full(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(offsets), out.shape[0], out.shape[1], out.shape[2],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return True


def dpack_encode(samples: np.ndarray) -> Optional[tuple]:
    """dpack-encode a concatenated int16 sample stream (data/wire.py's
    per-4096-block delta + bit-packing).  Returns (widths uint8 [nb],
    payload int16 [out_words]) or None if native unavailable."""
    lib = load()
    if lib is None or not hasattr(lib, "asr_dpack_encode_v2"):
        return None
    s = np.ascontiguousarray(samples, np.int16)
    n = s.shape[0]
    nb = -(-n // 4096)
    widths = np.zeros((max(nb, 1),), np.uint8)
    # a partial final block still emits 256*w (<= 4096) words, so the
    # worst case is nb*4096 words, NOT n
    payload = np.empty((max(nb * 4096, 1),), np.uint16)
    out = lib.asr_dpack_encode_v2(
        s.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), n,
        widths.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        payload.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
    )
    return widths[:nb], payload[:out].view(np.int16)


def levenshtein(a, b) -> Optional[int]:
    """Distance between two int sequences; None if native unavailable."""
    lib = load()
    if lib is None:
        return None
    a = np.ascontiguousarray(a, np.int32)
    b = np.ascontiguousarray(b, np.int32)
    return int(lib.asr_levenshtein(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(a),
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(b),
    ))
