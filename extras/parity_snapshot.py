#!/usr/bin/env python
"""Parity snapshot: freeze a pinned sample set + oracle outputs into one
versioned artifact, and re-verify it with one command.

The reference mount has been empty every round (SURVEY.md §0), so the
NumPy oracle is the recorded spec for the "bit-for-bit within float
tolerance" north-star clause (BASELINE.md).  This tool makes that spec a
REGRESSION ARTIFACT instead of a moving target:

    python extras/parity_snapshot.py create --out parity_v1.npz \
        [--wav extra1.wav ...] [--save runs/exp1]
    python extras/parity_snapshot.py verify parity_v1.npz [--save runs/exp1]

``create`` pins: deterministic dummy-corpus audio (exact PCM16 samples are
stored IN the artifact) plus any --wav files, the oracle feature matrices
for the canonical configs (MFCC+Δ+ΔΔ and LogFbank, both conventions), and
— when --save points at a trained run — greedy and beam-8 transcripts with
CER/WER against the dummy references.

``verify`` recomputes everything from the stored samples with the CURRENT
code and fails loudly on drift (features: exact same-platform contract,
1e-5 cross-platform tolerance; transcripts: string equality).

**When /root/reference appears** (SURVEY.md §0 refresh): feed the stored
wavs (``--dump_wavs DIR`` writes them back out as .wav files) through the
reference's preprocessing/eval and compare against this artifact — that
closes the one north-star clause with no evidence path today.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FORMAT_VERSION = 1

# the pinned oracle feature configs: name -> (kind, kwargs)
CONFIGS = {
    "mfcc_ref": ("mfcc", {}),
    "logfbank_ref": ("logfbank", {"d": True, "dd": True}),
    "mfcc_librosa": ("mfcc", {"convention": "librosa"}),
    "logfbank_librosa": ("logfbank", {"convention": "librosa"}),
}


def _pinned_utts(extra_wavs):
    """Deterministic sample set: the dummy corpus (seed 0) + extras."""
    from asr_study_tpu.data.corpora import Dummy
    from asr_study_tpu.data.wire import quantize_pcm16
    from asr_study_tpu.features.wav import read_wav

    utts = []
    with tempfile.TemporaryDirectory() as td:
        corpus = Dummy(os.path.join(td, "corpus"), n=8, seed=0)
        for u in sorted(corpus.generate(), key=lambda u: u["audio"]):
            sig, sr = read_wav(u["audio"], sr=16000)
            utts.append((os.path.basename(u["audio"]),
                         quantize_pcm16(sig), sr, u["label"]))
    for p in extra_wavs or ():
        sig, sr = read_wav(p, sr=16000)
        utts.append((os.path.basename(p), quantize_pcm16(sig), sr, ""))
    return utts


def _oracle_features(utts):
    from asr_study_tpu.utils.registry import get_from_module

    feats = {}
    for cname, (kind, kw) in CONFIGS.items():
        f = get_from_module("feature", kind)(**kw)
        for name, pcm, sr, _ in utts:
            sig = pcm.astype(np.float32) / 32768.0
            feats[f"feat/{cname}/{name}"] = f(sig)
    return feats


def _run_transcripts(utts, save_dir):
    """Greedy + beam-8 transcripts for the pinned set from a run dir."""
    import jax

    from asr_study_tpu.cli.data_flow import parser_from_run
    from asr_study_tpu.cli.eval import load_run
    from asr_study_tpu.ops import beam_search_decode, greedy_decode
    from asr_study_tpu.ops.metrics import cer, wer
    from asr_study_tpu.utils.registry import get_from_module

    label_parser = parser_from_run(save_dir)
    model, state, hp = load_run(save_dir, label_parser)
    feature = get_from_module("feature", "mfcc")()
    out = {}
    refs, greedy_hyps, beam_hyps = [], [], []
    for name, pcm, sr, ref in utts:
        sig = pcm.astype(np.float32) / 32768.0
        x = feature(sig)[None]
        lens = np.array([x.shape[1]], np.int32)
        logits = model.apply(state.params, x, lens, train=False)
        dec, dl = greedy_decode(logits, lens, blank_id=model.blank_id)
        g = label_parser.imap(np.asarray(dec)[0, : int(dl[0])])
        bdec, blens, _ = beam_search_decode(
            logits, lens, beam_width=8, blank_id=model.blank_id
        )
        b = label_parser.imap(np.asarray(bdec)[0, 0, : int(blens[0, 0])])
        out[f"transcript/greedy/{name}"] = g
        out[f"transcript/beam8/{name}"] = b
        if ref:
            refs.append(ref)
            greedy_hyps.append(g)
            beam_hyps.append(b)
    metrics = {}
    if refs:
        metrics = {
            "greedy_cer": cer(greedy_hyps, refs),
            "greedy_wer": wer(greedy_hyps, refs),
            "beam8_cer": cer(beam_hyps, refs),
            "beam8_wer": wer(beam_hyps, refs),
        }
    return out, metrics


def create(args) -> int:
    utts = _pinned_utts(args.wav)
    arrays = {}
    manifest = {
        "format_version": FORMAT_VERSION,
        "configs": {k: [v[0], v[1]] for k, v in CONFIGS.items()},
        "utts": [
            {"name": n, "sr": sr, "ref": ref} for n, _, sr, ref in utts
        ],
        "versions": {
            "numpy": np.__version__,
        },
    }
    for name, pcm, sr, _ in utts:
        arrays[f"pcm16/{name}"] = pcm
    arrays.update(_oracle_features(utts))
    if args.save:
        transcripts, metrics = _run_transcripts(utts, args.save)
        manifest["transcripts"] = {
            k.split("/", 1)[1]: v for k, v in transcripts.items()
        }
        manifest["metrics"] = metrics
        manifest["source_run"] = args.save
    np.savez_compressed(args.out, __manifest__=json.dumps(manifest),
                        **arrays)
    n_feat = sum(1 for k in arrays if k.startswith("feat/"))
    print(f"wrote {args.out}: {len(utts)} utterances, {n_feat} feature "
          f"matrices" + (", transcripts + CER/WER" if args.save else ""))
    return 0


def verify(args) -> int:
    with np.load(args.artifact, allow_pickle=False) as z:
        manifest = json.loads(str(z["__manifest__"]))
        arrays = {k: z[k] for k in z.files if k != "__manifest__"}
    if manifest["format_version"] != FORMAT_VERSION:
        raise SystemExit(
            f"artifact format {manifest['format_version']} != "
            f"{FORMAT_VERSION} (this tool)"
        )
    utts = [
        (u["name"], arrays[f"pcm16/{u['name']}"], u["sr"], u["ref"])
        for u in manifest["utts"]
    ]
    if args.dump_wavs:
        from asr_study_tpu.features.wav import write_wav

        os.makedirs(args.dump_wavs, exist_ok=True)
        for name, pcm, sr, _ in utts:
            write_wav(os.path.join(args.dump_wavs, name),
                      pcm.astype(np.float32) / 32768.0, sr)
        print(f"dumped {len(utts)} pinned wavs to {args.dump_wavs}")

    failures = []
    got = _oracle_features(utts)
    for key, want in arrays.items():
        if not key.startswith("feat/"):
            continue
        cur = got[key]
        if cur.shape != want.shape:
            failures.append(f"{key}: shape {cur.shape} != {want.shape}")
            continue
        err = float(np.max(np.abs(cur - want))) if want.size else 0.0
        if err > args.tol:
            failures.append(f"{key}: max |Δ| {err:.3e} > {args.tol:.0e}")
    n_feat = sum(1 for k in arrays if k.startswith("feat/"))

    n_tr = 0
    if args.save and manifest.get("transcripts"):
        transcripts, metrics = _run_transcripts(utts, args.save)
        for k, v in transcripts.items():
            short = k.split("/", 1)[1]
            want = manifest["transcripts"].get(short)
            n_tr += 1
            if v != want:
                failures.append(f"transcript {short}: {v!r} != {want!r}")
        for k, v in metrics.items():
            w = manifest["metrics"].get(k)
            if w is not None and abs(v - w) > 1e-9:
                failures.append(f"metric {k}: {v} != {w}")
    elif manifest.get("transcripts") and not args.save:
        print("note: artifact has transcripts; pass --save RUN_DIR to "
              "verify them", file=sys.stderr)
    elif args.save and not manifest.get("transcripts"):
        # the user asked for transcript verification, but the artifact
        # has none pinned — an unqualified OK here would report success
        # for a check that never ran (r5 review)
        failures.append(
            "--save given but the artifact pins no transcripts "
            "(recreate it with --save to pin them)"
        )

    if failures:
        for f in failures:
            print(f"FAIL {f}", file=sys.stderr)
        return 1
    print(f"OK: {n_feat} feature matrices"
          + (f", {n_tr} transcripts" if n_tr else "")
          + f" match {args.artifact}")
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    sub = p.add_subparsers(dest="cmd", required=True)
    c = sub.add_parser("create", help="freeze a new artifact")
    c.add_argument("--out", required=True, help="output .npz path")
    c.add_argument("--wav", nargs="*", default=None,
                   help="extra wav files to pin alongside the dummy set")
    c.add_argument("--save", default=None,
                   help="run dir: also pin greedy/beam transcripts + "
                        "CER/WER from this checkpoint")
    v = sub.add_parser("verify", help="replay an artifact against the "
                                      "current code")
    v.add_argument("artifact")
    v.add_argument("--tol", type=float, default=1e-5,
                   help="feature tolerance (same-platform runs are exact; "
                        "default covers cross-platform BLAS differences)")
    v.add_argument("--save", default=None,
                   help="run dir to verify pinned transcripts against")
    v.add_argument("--dump_wavs", default=None,
                   help="also write the pinned wavs to this dir (for "
                        "feeding the reference implementation)")
    args = p.parse_args(argv)
    if args.cmd == "create":
        return create(args)
    return verify(args)


if __name__ == "__main__":
    from asr_study_tpu.utils.platform import select_platform

    select_platform(os.environ.get("ASR_PLATFORM", "cpu"))
    raise SystemExit(main())
