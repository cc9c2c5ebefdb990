"""Corpus parsers for the Brazilian-Portuguese datasets the reference targets
(SURVEY.md §2.1): LapsBM, VoxForge, Sid, CSLU Spoltech, the BRSD combination,
and a synthetic Dummy corpus for smoke tests.

Directory layouts follow the public corpus distributions as described in the
reference [ref: datasets/lapsbm.py, datasets/voxforge.py, datasets/sid.py,
datasets/cslu.py, datasets/brsd.py]; parsers are written tolerantly (transcript
file variants, nested dirs) since layouts drift between corpus versions.
"""

from __future__ import annotations

import hashlib
import os
import re
from typing import Dict, Iterator

import numpy as np

from asr_study_tpu.data.dataset_parser import DatasetParser
from asr_study_tpu.features.wav import write_wav
from asr_study_tpu.utils.registry import register


def _hash_split(key: str, valid_frac: float = 0.05, test_frac: float = 0.05) -> str:
    """Deterministic speaker-level split by hash."""
    h = int(hashlib.md5(key.encode()).hexdigest(), 16) % 1000 / 1000.0
    if h < test_frac:
        return "test"
    if h < test_frac + valid_frac:
        return "valid"
    return "train"


def _read_decoded(path: str) -> str:
    """Read a transcript/prompt file, tolerating the encodings found in
    the real corpus distributions: UTF-8 first, ISO-8859-1 (Latin-1)
    fallback — VoxForge/Sid PT-BR prompt files are frequently Latin-1,
    and a replacement-char decode would silently fail ``is_valid`` and
    DROP the utterance at dataset build."""
    with open(path, "rb") as f:
        raw = f.read()
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError:
        return raw.decode("latin-1")


def _read_text(path: str) -> str:
    return _read_decoded(path).strip()


def _read_lines(path: str):
    return _read_decoded(path).splitlines()


@register("corpus")
class LapsBM(DatasetParser):
    """LapsBM 1.4 (UFPA FalaBrasil): ~700 utterances, 35 speakers; the
    benchmark corpus (BASELINE metric: RTF on LapsBM) [ref: datasets/lapsbm.py].

    Layout: ``<root>/LapsBM-F004/LapsBM_0001.wav`` + same-basename ``.txt``.
    Speaker = subdirectory name.  ``split`` selects the standalone behaviour:
    'test' (reference BRSD role: LapsBM is the held-out test set) or
    'by_speaker' (hash speakers into train/valid/test).
    """

    name = "lapsbm"

    def __init__(self, dataset_dir: str, split: str = "test"):
        super().__init__(dataset_dir)
        self.split = split

    def _iter(self) -> Iterator[dict]:
        for root, _dirs, files in sorted(os.walk(self.dataset_dir)):
            speaker = os.path.basename(root)
            for fname in sorted(files):
                if not fname.lower().endswith(".wav"):
                    continue
                wav = os.path.join(root, fname)
                txt = os.path.splitext(wav)[0] + ".txt"
                if not os.path.exists(txt):
                    continue
                split = (
                    _hash_split(speaker) if self.split == "by_speaker" else self.split
                )
                yield {
                    "audio": wav,
                    "label": _read_text(txt),
                    "speaker": speaker,
                    "split": split,
                }


@register("corpus")
class VoxForge(DatasetParser):
    """Brazilian-Portuguese VoxForge submissions [ref: datasets/voxforge.py].

    Layout: ``<root>/<submission>/etc/PROMPTS`` (or ``prompts-original``) with
    lines ``<path-or-id> <transcript...>``; audio at
    ``<submission>/wav/<id>.wav``.  Speaker = submission prefix before the
    first '-'.
    """

    name = "voxforge"

    def _iter(self) -> Iterator[dict]:
        for sub in sorted(os.listdir(self.dataset_dir)):
            sub_dir = os.path.join(self.dataset_dir, sub)
            if not os.path.isdir(sub_dir):
                continue
            prompts = None
            for cand in ("PROMPTS", "prompts-original", "prompts.txt", "PROMPTS.txt"):
                p = os.path.join(sub_dir, "etc", cand)
                if os.path.exists(p):
                    prompts = p
                    break
            if prompts is None:
                continue
            speaker = sub.split("-")[0]
            for line in _read_lines(prompts):
                parts = line.strip().split(None, 1)
                if len(parts) != 2:
                    continue
                utt_id = parts[0].rsplit("/", 1)[-1]
                wav = os.path.join(sub_dir, "wav", utt_id + ".wav")
                if not os.path.exists(wav):
                    continue
                yield {
                    "audio": wav,
                    "label": parts[1],
                    "speaker": speaker,
                    "split": "train",
                }


@register("corpus")
class Sid(DatasetParser):
    """Sid PT-BR corpus [ref: datasets/sid.py].

    Layout: per-speaker directories containing ``*.wav`` plus a prompt file
    (``prompts.txt``/``PROMPTS``) with lines ``<idx>=<text>`` or
    ``<idx> <text>``; wavs are matched by their trailing utterance number.
    """

    name = "sid"
    _IDX_RE = re.compile(r"(\d+)\s*[=:\s]\s*(.+)")

    def _iter(self) -> Iterator[dict]:
        for spk in sorted(os.listdir(self.dataset_dir)):
            spk_dir = os.path.join(self.dataset_dir, spk)
            if not os.path.isdir(spk_dir):
                continue
            prompts: Dict[int, str] = {}
            for cand in ("prompts.txt", "PROMPTS", "prompts"):
                p = os.path.join(spk_dir, cand)
                if os.path.exists(p):
                    for line in _read_lines(p):
                        m = self._IDX_RE.match(line.strip())
                        if m:
                            prompts[int(m.group(1))] = m.group(2)
                    break
            for fname in sorted(os.listdir(spk_dir)):
                if not fname.lower().endswith(".wav"):
                    continue
                m = re.search(r"(\d+)\.wav$", fname, re.IGNORECASE)
                if not m or int(m.group(1)) not in prompts:
                    continue
                yield {
                    "audio": os.path.join(spk_dir, fname),
                    "label": prompts[int(m.group(1))],
                    "speaker": spk,
                    "split": _hash_split(spk),
                }


@register("corpus")
class CSLU(DatasetParser):
    """CSLU Spoltech Port (LDC2006S16) PT-BR corpus [ref: datasets/cslu.py].

    Layout: ``speech/**/<utt>.wav`` with the transcript at the parallel
    ``trans/**/<utt>.txt`` path (or a sibling ``.txt``).
    """

    name = "cslu"

    def _iter(self) -> Iterator[dict]:
        speech_root = os.path.join(self.dataset_dir, "speech")
        walk_root = speech_root if os.path.isdir(speech_root) else self.dataset_dir
        for root, _dirs, files in sorted(os.walk(walk_root)):
            for fname in sorted(files):
                if not fname.lower().endswith(".wav"):
                    continue
                wav = os.path.join(root, fname)
                txt = os.path.splitext(wav)[0] + ".txt"
                if not os.path.exists(txt) and os.path.isdir(speech_root):
                    txt = os.path.splitext(
                        wav.replace(os.sep + "speech" + os.sep, os.sep + "trans" + os.sep)
                    )[0] + ".txt"
                if not os.path.exists(txt):
                    continue
                speaker = os.path.basename(root)
                yield {
                    "audio": wav,
                    "label": _read_text(txt),
                    "speaker": speaker,
                    "split": _hash_split(speaker),
                }


@register("corpus")
class BRSD(DatasetParser):
    """Brazilian Speech Dataset: the reference's combined training corpus
    [ref: datasets/brsd.py] — VoxForge + Sid + CSLU for train/valid, LapsBM
    as the held-out test set.

    ``dataset_dir`` is a root containing subdirectories named ``lapsbm``,
    ``voxforge``, ``sid``, ``cslu`` (any subset; missing ones are skipped).
    """

    name = "brsd"
    _PARTS = {"voxforge": VoxForge, "sid": Sid, "cslu": CSLU}

    def _iter(self) -> Iterator[dict]:
        laps_dir = os.path.join(self.dataset_dir, "lapsbm")
        if os.path.isdir(laps_dir):
            yield from LapsBM(laps_dir, split="test")._iter()
        for name, cls in self._PARTS.items():
            part_dir = os.path.join(self.dataset_dir, name)
            if os.path.isdir(part_dir):
                for utt in cls(part_dir)._iter():
                    # LapsBM owns 'test'; everything else trains/validates
                    if utt["split"] == "test":
                        utt["split"] = "valid"
                    yield utt


@register("corpus")
class Dummy(DatasetParser):
    """Synthetic miniature corpus for smoke-testing the full pipeline without
    real data [ref: datasets/dummy.py].

    ``generate()`` writes ``n`` short sine-mixture wavs (deterministic per
    seed) whose transcripts come from a small PT-BR word list; utterances are
    assigned round-robin to train/valid/test.
    """

    name = "dummy"
    _WORDS = (
        "ola mundo fala brasil teste um dois tres quatro casa bola gato "
        "dia noite agua terra fogo vento sol lua mar rio"
    ).split()

    def __init__(self, dataset_dir: str, n: int = 16, seed: int = 0, sr: int = 16000):
        super().__init__(dataset_dir)
        self.n = n
        self.seed = seed
        self.sr = sr

    def generate(self) -> "List[dict]":
        os.makedirs(self.dataset_dir, exist_ok=True)
        rng = np.random.default_rng(self.seed)
        utts = []
        splits = ("train",) * 3 + ("valid",) + ("test",)
        for i in range(self.n):
            n_words = int(rng.integers(2, 5))
            text = " ".join(rng.choice(self._WORDS, size=n_words))
            dur = 0.3 + 0.1 * n_words
            t = np.arange(int(self.sr * dur)) / self.sr
            sig = np.zeros_like(t, dtype=np.float64)
            for f in rng.uniform(80, 4000, size=4):
                sig += rng.uniform(0.05, 0.2) * np.sin(2 * np.pi * f * t)
            sig += 0.01 * rng.standard_normal(len(t))
            sig /= max(1.0, np.abs(sig).max() * 1.1)
            wav = os.path.join(self.dataset_dir, f"dummy_{i:04d}.wav")
            write_wav(wav, sig.astype(np.float32), self.sr)
            with open(os.path.splitext(wav)[0] + ".txt", "w") as f:
                f.write(text)
            utts.append(
                {
                    "audio": wav,
                    "label": text,
                    "speaker": f"spk{i % 4}",
                    "split": splits[i % len(splits)],
                    "duration": dur,
                }
            )
        return utts

    def _iter(self) -> Iterator[dict]:
        if not os.path.isdir(self.dataset_dir) or not any(
            f.endswith(".wav") for f in os.listdir(self.dataset_dir)
        ):
            self.generate()
        files = sorted(
            f for f in os.listdir(self.dataset_dir) if f.endswith(".wav")
        )
        splits = ("train",) * 3 + ("valid",) + ("test",)
        for i, fname in enumerate(files):
            wav = os.path.join(self.dataset_dir, fname)
            yield {
                "audio": wav,
                "label": _read_text(os.path.splitext(wav)[0] + ".txt"),
                "speaker": f"spk{i % 4}",
                "split": splits[i % len(splits)],
            }
