"""Prediction CLI [ref: predict.py]: wav file(s) -> transcript.

Example::

    python predict.py --save runs/exp1 --input_parser mfcc audio1.wav ...
"""

from __future__ import annotations

import argparse
import json

import jax
import numpy as np

from asr_study_tpu.ops import beam_search_decode, greedy_decode
from asr_study_tpu.text.parser import CharParser
from asr_study_tpu.utils.registry import get_from_module


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Transcribe wav files")
    p.add_argument("wavs", nargs="+", help="wav file paths")
    p.add_argument("--save", required=True, help="training run directory")
    p.add_argument("--input_parser", default="mfcc",
                   help="feature extractor name (raw|fbank|logfbank|mfcc)")
    p.add_argument("--input_params", default=None,
                   help='feature kwargs as JSON, e.g. \'{"d": true}\'')
    p.add_argument("--beam_width", type=int, default=0)
    p.add_argument("--best", action="store_true")
    p.add_argument("--platform", default=None,
                   help="force a jax platform (cpu|tpu); default = env")
    return p


def main(argv=None) -> int:
    from asr_study_tpu.cli.eval import load_run  # avoids an import cycle
    from asr_study_tpu.utils.platform import (
        select_platform, setup_compilation_cache,
    )

    args = build_argparser().parse_args(argv)
    select_platform(args.platform)
    setup_compilation_cache()
    label_parser = CharParser()
    model, state, _ = load_run(args.save, label_parser, best=args.best)

    feat_kw = json.loads(args.input_params) if args.input_params else {}
    feature = get_from_module("feature", args.input_parser)(**feat_kw)

    feats = [feature(w).astype(np.float32) for w in args.wavs]
    t_max = max(f.shape[0] for f in feats)
    batch = np.zeros((len(feats), t_max, feats[0].shape[1]), np.float32)
    lengths = np.zeros((len(feats),), np.int32)
    for i, f in enumerate(feats):
        batch[i, : f.shape[0]] = f
        lengths[i] = f.shape[0]

    logits = jax.jit(
        lambda p, x, l: model.apply(p, x, l, train=False)
    )(state.params, batch, lengths)
    if args.beam_width > 0:
        dec, lens, _ = beam_search_decode(
            logits, lengths, beam_width=args.beam_width,
            blank_id=model.blank_id,
        )
        dec, lens = dec[:, 0], lens[:, 0]
    else:
        dec, lens = greedy_decode(logits, lengths, blank_id=model.blank_id)
    dec, lens = np.asarray(dec), np.asarray(lens)
    for path, i in zip(args.wavs, range(len(feats))):
        print(json.dumps(
            {"file": path, "transcript": label_parser.imap(dec[i, : lens[i]])}
        ))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
