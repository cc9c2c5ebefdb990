#!/usr/bin/env python
"""Repo-root training entry point, same position as the reference's train.py."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from asr_study_tpu.cli.train import main  # noqa: E402

if __name__ == "__main__":
    raise SystemExit(main())
