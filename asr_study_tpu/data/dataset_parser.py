"""Corpus ingestion base class + on-disk dataset format.

Mirrors the reference's ``DatasetParser`` ABC [ref: datasets/dataset_parser.py]:
subclasses implement ``_iter()`` yielding utterance dicts
``{audio, label, speaker, duration, split?}``; the base class serializes to a
JSON manifest and/or an HDF5 dataset with per-split groups holding
variable-length feature rows — the format the batch generator streams.

HDF5 layout (one group per split: train/valid/test):
    inputs     vlen float32   flattened [T*F] feature rows
    shapes     int32 [N, 2]   (T, F) per row
    labels     vlen int32     label id sequences
    texts      vlen utf-8     normalized transcripts
    durations  float32 [N]    seconds
  group attrs: num_feats, feature (repr), vocab

Packed layout (``layout="packed"``): the per-row vlen ``inputs`` dataset is
replaced by ONE contiguous feature matrix — rows written back to back in
duration-sorted order:
    inputs_flat  float32 [sum_T, F]   all rows, frame-contiguous
    offsets      int64  [N + 1]       row i spans inputs_flat[offsets[i]:offsets[i+1]]
(shapes/labels/texts/durations as above, in the same duration-sorted order.)
Why: h5py vlen rows cost a heap indirection per element; with the packed
layout a duration-sorted batch is a handful of contiguous hyperslab reads
(usually ONE — the generator's stable length sort reproduces file order),
which is what larger-than-memory streaming is bound by.
"""

from __future__ import annotations

import json
import logging
import os
import threading
from typing import Callable, Dict, Iterator, List, Optional

import h5py
import numpy as np

from asr_study_tpu.features.audio import Feature
from asr_study_tpu.features.wav import read_wav
from asr_study_tpu.text.parser import CharParser

log = logging.getLogger(__name__)

SPLITS = ("train", "valid", "test")


class DatasetParser:
    """Walks a corpus directory and yields utterance dicts.

    Subclasses set ``name`` and implement ``_iter()``.  An utterance dict has
    keys: ``audio`` (wav path), ``label`` (transcript string), ``speaker``
    (id string), and optionally ``duration`` (seconds) and ``split``.
    """

    name = "base"
    default_split: Optional[Callable[[dict], str]] = None

    def __init__(self, dataset_dir: str):
        self.dataset_dir = dataset_dir

    def _iter(self) -> Iterator[dict]:
        raise NotImplementedError

    # -- helpers -------------------------------------------------------------

    @staticmethod
    def _duration(wav_path: str) -> float:
        sig, sr = read_wav(wav_path, sr=None)
        return len(sig) / float(sr)

    def iter_utterances(self, with_duration: bool = True) -> Iterator[dict]:
        for utt in self._iter():
            if with_duration and "duration" not in utt:
                try:
                    utt["duration"] = self._duration(utt["audio"])
                except Exception as exc:  # unreadable file: skip, don't die
                    log.warning("skipping %s: %s", utt.get("audio"), exc)
                    continue
            yield utt

    # -- export --------------------------------------------------------------

    def to_json(self, json_path: str) -> int:
        """Write a JSON-lines manifest; returns the utterance count."""
        os.makedirs(os.path.dirname(os.path.abspath(json_path)), exist_ok=True)
        n = 0
        with open(json_path, "w") as f:
            for utt in self.iter_utterances():
                f.write(json.dumps(utt) + "\n")
                n += 1
        return n

    def to_h5(
        self,
        h5_path: str,
        input_parser: Feature,
        label_parser: Optional[CharParser] = None,
        split_fn: Optional[Callable[[dict], str]] = None,
        min_duration: float = 0.0,
        max_duration: float = float("inf"),
        layout: str = "vlen",
    ) -> Dict[str, int]:
        """Extract features for every utterance and write the HDF5 dataset.

        ``split_fn(utt) -> 'train'|'valid'|'test'`` assigns splits; defaults to
        the utterance's own ``split`` key, the subclass's ``default_split``,
        then 'train'.
        """
        label_parser = label_parser or CharParser()
        rows: Dict[str, List[dict]] = {s: [] for s in SPLITS}
        for utt in self.iter_utterances():
            dur = utt.get("duration", 0.0)
            if not (min_duration <= dur <= max_duration):
                continue
            if not label_parser.is_valid(utt["label"]):
                log.warning("invalid transcript, skipping: %r", utt["label"])
                continue
            split = utt.get("split")
            if split is None and split_fn is not None:
                split = split_fn(utt)
            if split is None and self.default_split is not None:
                split = self.default_split(utt)
            rows[split or "train"].append(utt)

        counts = {}
        with h5py.File(h5_path, "w") as f:
            for split, utts in rows.items():
                if not utts:
                    continue
                grp = f.create_group(split)
                write_split(grp, utts, input_parser, label_parser,
                            layout=layout)
                counts[split] = len(utts)
        return counts

    def __str__(self) -> str:
        return self.name


class _VlenInputWriter:
    """Reference-compatible layout: one vlen float32 row per utterance."""

    def __init__(self, grp, n: int):
        vlen_f32 = h5py.special_dtype(vlen=np.dtype("float32"))
        self._dset = grp.create_dataset("inputs", (n,), dtype=vlen_f32)

    def add(self, i: int, feats: np.ndarray) -> None:
        self._dset[i] = feats.reshape(-1)

    def finish(self) -> None:
        pass


class _PackedInputWriter:
    """Packed layout: rows appended back to back into ``inputs_flat`` with
    an ``offsets`` index.  The flat dataset is resizable (total frames are
    unknown until every feature is extracted) with row-aligned chunks, so
    a write never rewrites earlier frames."""

    def __init__(self, grp, n: int, chunk_frames: int = 8192):
        self._grp = grp
        self._chunk_frames = chunk_frames
        self._dset = None
        self._offsets = np.zeros((n + 1,), np.int64)
        self._count = 0

    def add(self, i: int, feats: np.ndarray) -> None:
        assert i == self._count, "packed layout requires sequential writes"
        t, f_dim = feats.shape
        if self._dset is None:
            self._dset = self._grp.create_dataset(
                "inputs_flat", (0, f_dim), maxshape=(None, f_dim),
                dtype=np.float32, chunks=(self._chunk_frames, f_dim),
            )
        end = self._offsets[i] + t
        self._dset.resize((end, f_dim))
        self._dset[self._offsets[i]: end] = feats
        self._offsets[i + 1] = end
        self._count += 1

    def finish(self) -> None:
        self._grp.create_dataset(
            "offsets", data=self._offsets[: self._count + 1]
        )


def write_split(grp, utts, input_parser, label_parser,
                chunk: int = 256, layout: str = "vlen") -> None:
    if layout not in ("vlen", "packed"):
        raise ValueError(f"layout must be 'vlen' or 'packed', got {layout!r}")
    if layout == "packed":
        # duration order makes the generator's stable length sort the
        # identity permutation -> every batch is one contiguous read
        utts = sorted(utts, key=lambda u: float(u.get("duration", 0.0)))
    vlen_i32 = h5py.special_dtype(vlen=np.dtype("int32"))
    str_dt = h5py.string_dtype(encoding="utf-8")
    n = len(utts)
    d_inputs = (
        _PackedInputWriter(grp, n) if layout == "packed"
        else _VlenInputWriter(grp, n)
    )
    d_shapes = grp.create_dataset("shapes", (n, 2), dtype=np.int32)
    d_labels = grp.create_dataset("labels", (n,), dtype=vlen_i32)
    d_texts = grp.create_dataset("texts", (n,), dtype=str_dt)
    d_durs = grp.create_dataset("durations", (n,), dtype=np.float32)
    num_feats = None
    # batched accelerator extraction (features/batch_extract.py) goes
    # ``chunk`` utterances at a time, bounding host RAM on big corpora;
    # host Feature parsers keep the one-at-a-time reference flow
    batched = hasattr(input_parser, "extract_batch")
    for c0 in range(0, n, chunk if batched else n or 1):
        group = utts[c0: c0 + chunk] if batched else utts
        if batched:
            feats_list = input_parser.extract_batch(
                [u["audio"] for u in group]
            )
        else:
            feats_list = None
        for j, utt in enumerate(group):
            i = c0 + j if batched else j
            feats = (
                feats_list[j] if feats_list is not None
                else input_parser(utt["audio"])
            )
            num_feats = feats.shape[1]
            text = label_parser._clean(utt["label"])
            d_inputs.add(i, np.asarray(feats, np.float32))
            d_shapes[i] = feats.shape
            d_labels[i] = label_parser.map(text)
            d_texts[i] = text
            d_durs[i] = utt.get("duration", 0.0)
        if not batched:
            break
    d_inputs.finish()
    grp.attrs["num_feats"] = num_feats or 0
    grp.attrs["feature"] = str(input_parser)
    grp.attrs["vocab"] = label_parser.vocab
    grp.attrs["layout"] = layout


def write_h5(h5_path, split_rows, input_parser, label_parser,
             layout: str = "vlen") -> None:
    """Write pre-collected ``{split: [utt, ...]}`` rows (used by tests/tools)."""
    with h5py.File(h5_path, "w") as f:
        for split, utts in split_rows.items():
            if utts:
                write_split(f.create_group(split), utts, input_parser,
                            label_parser, layout=layout)


def _read_inputs(grp, shapes):
    """Materialize every feature row of an open split group (either layout)
    as a list of [T, F] float32 arrays."""
    if "inputs_flat" in grp:
        flat = grp["inputs_flat"][:]
        offs = grp["offsets"][:]
        return [flat[offs[i]: offs[i + 1]] for i in range(len(shapes))]
    return [x.reshape(tuple(s)) for x, s in zip(grp["inputs"][:], shapes)]


def read_h5(h5_path: str, split: str):
    """Load one split into memory:
    -> (list[np.ndarray [T,F]], list[np.ndarray [L]], list[str], np.ndarray [N])."""
    with h5py.File(h5_path, "r") as f:
        grp = _split_group(f, h5_path, split)
        shapes = grp["shapes"][:]
        inputs = _read_inputs(grp, shapes)
        labels, texts, durations = _read_meta(grp)
    return inputs, labels, texts, durations


def _split_group(f, h5_path: str, split: str):
    if split not in f:
        raise KeyError(f"{h5_path} has no split {split!r}; has {list(f)}")
    return f[split]


def _read_meta(grp):
    labels = [np.asarray(l, dtype=np.int32) for l in grp["labels"][:]]
    texts = [
        t.decode("utf-8") if isinstance(t, bytes) else str(t)
        for t in grp["texts"][:]
    ]
    durations = grp["durations"][:]
    return labels, texts, durations


def read_h5_inputs(h5_path: str, split: str, shapes):
    """Load only the feature rows of a split (the metadata came from
    ``read_h5_meta``) — avoids decoding every vlen label/text twice when
    the generator has already read them to size the split."""
    with h5py.File(h5_path, "r") as f:
        grp = _split_group(f, h5_path, split)
        return _read_inputs(grp, shapes)


def read_h5_meta(h5_path: str, split: str):
    """Load only the small per-utterance metadata of a split (labels,
    texts, durations, shapes) — the lazy-streaming fast path that leaves
    the feature payload on disk."""
    with h5py.File(h5_path, "r") as f:
        grp = _split_group(f, h5_path, split)
        shapes = grp["shapes"][:]
        labels, texts, durations = _read_meta(grp)
    return shapes, labels, texts, durations


class H5FeatureRows:
    """Lazy per-row access to one split's vlen feature rows.

    Streams corpora larger than host memory: only the [N, 2] shapes table
    lives in RAM; feature rows are read per batch (one ascending-index
    h5py read) and packed via the C++ ``asr_pack_batch`` when the native
    lib is available.  The VERDICT-r1 gap this closes: ``read_h5`` loads
    whole splits into Python lists, which breaks on the BRSD-combined
    full corpus (BASELINE config 5).

    Thread-safe: the prefetch worker thread and the main thread may both
    read; a lock serializes access to the shared h5py handle (h5py is not
    concurrency-safe on one handle).
    """

    def __init__(self, h5_path: str, split: str, shapes=None):
        self.h5_path = h5_path
        self.split = split
        self._offsets = None  # packed layout: int64 [N+1] frame offsets
        with h5py.File(h5_path, "r") as f:
            grp = _split_group(f, h5_path, split)
            if shapes is None:
                shapes = grp["shapes"][:]
            if "inputs_flat" in grp:
                self._offsets = grp["offsets"][:]
        self.shapes = shapes
        self._lock = threading.Lock()
        self._file = None
        self._dset = None

    def __len__(self) -> int:
        return len(self.shapes)

    def row_length(self, i: int) -> int:
        return int(self.shapes[i, 0])

    @property
    def num_feats(self) -> int:
        return int(self.shapes[0, 1]) if len(self.shapes) else 0

    @property
    def nbytes(self) -> int:
        """Total feature payload (float32 bytes) if fully materialized."""
        return int(np.sum(self.shapes[:, 0].astype(np.int64)
                          * self.shapes[:, 1]) * 4)

    def _rows(self):
        if self._dset is None:
            self._file = h5py.File(self.h5_path, "r")
            grp = self._file[self.split]
            self._dset = grp[
                "inputs_flat" if self._offsets is not None else "inputs"
            ]
        return self._dset

    def __getitem__(self, i: int) -> np.ndarray:
        i = int(i)
        with self._lock:
            dset = self._rows()
            if self._offsets is not None:
                return dset[self._offsets[i]: self._offsets[i + 1]]
            row = dset[i]
        return row.reshape(tuple(self.shapes[i]))

    def _read_rows(self, sidx: np.ndarray):
        """Read rows at ascending indices ``sidx`` -> list of [T, F] arrays.
        Caller holds the lock.  Packed layout coalesces consecutive indices
        into single contiguous hyperslab reads (the common case — the
        generator's duration-sorted batches — is ONE read per batch)."""
        dset = self._rows()
        if self._offsets is None:
            f_dim = int(self.shapes[0, 1])
            return [r.reshape(-1, f_dim) for r in dset[sidx.tolist()]]
        offs = self._offsets
        rows = []
        start = 0
        while start < len(sidx):
            end = start
            while end + 1 < len(sidx) and sidx[end + 1] == sidx[end] + 1:
                end += 1
            a, b = int(sidx[start]), int(sidx[end])
            run = dset[offs[a]: offs[b + 1]]
            base = offs[a]
            for k in range(start, end + 1):
                i = int(sidx[k])
                rows.append(run[offs[i] - base: offs[i + 1] - base])
            start = end + 1
        return rows

    def pack_into(self, idx, out: np.ndarray) -> None:
        """Read rows ``idx`` and pack them into ``out`` [B, t_pad, F] with
        one disk read for the whole batch (a few for a multi-run packed
        batch).  Fully defines ``out`` — padded tails and rows beyond
        ``len(idx)`` are zeroed, so callers may pass an uninitialized
        buffer.  Uses the native C++ packer when available."""
        idx = np.asarray(idx, np.int64)
        lens = self.shapes[idx, 0].astype(np.int64)
        t_pad = out.shape[1]
        from asr_study_tpu.utils import native

        # packed layout, one contiguous index run (the duration-sorted
        # generator's common case): ONE hyperslab read, packed straight
        # into ``out`` with no intermediate concatenate/copy
        sidx = np.sort(idx)
        if (
            self._offsets is not None and len(idx)
            and sidx[-1] - sidx[0] == len(sidx) - 1
            and len(np.unique(sidx)) == len(sidx)
        ):
            offs = self._offsets
            base = offs[int(sidx[0])]
            with self._lock:
                src = self._rows()[base: offs[int(sidx[-1]) + 1]]
            if native.pack_batch_into(src, offs[idx] - base, lens, out):
                return
            out[:] = 0  # native unavailable: row views from the one read
            for j, i in enumerate(idx):
                t = min(int(lens[j]), t_pad)
                o = offs[i] - base
                out[j, :t] = src[o: o + t]
            return

        order = np.argsort(idx, kind="stable")   # h5py wants ascending
        with self._lock:
            rows = self._read_rows(idx[order])
        flat = [None] * len(idx)
        for pos, row in zip(order, rows):
            flat[pos] = row
        packed = native.pack_batch(flat, t_pad)
        if packed is not None:
            out[: len(idx)] = packed
            out[len(idx):] = 0
        else:
            out[:] = 0
            for j, row in enumerate(flat):
                t = min(int(lens[j]), t_pad)
                out[j, :t] = row[:t]

    def close(self):
        with self._lock:
            if self._file is not None:
                self._file.close()
                self._file = self._dset = None

    def __del__(self):
        # iterators never close their row source explicitly; release the
        # h5py handle when the last reference drops
        try:
            self.close()
        except Exception:
            pass
