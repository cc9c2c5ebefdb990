#!/usr/bin/env python
"""Repo-root predict entry point, same position as the reference's predict.py."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from asr_study_tpu.cli.predict import main  # noqa: E402

if __name__ == "__main__":
    raise SystemExit(main())
