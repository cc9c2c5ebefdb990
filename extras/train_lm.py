#!/usr/bin/env python
"""Char n-gram LM build entry point (for eval/predict --lm), alongside
the reference-style extras/make_dataset.py."""
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
from asr_study_tpu.cli.train_lm import main  # noqa: E402

if __name__ == "__main__":
    raise SystemExit(main())
