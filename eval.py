#!/usr/bin/env python
"""Repo-root eval entry point, same position as the reference's eval.py."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from asr_study_tpu.cli.eval import main  # noqa: E402

if __name__ == "__main__":
    raise SystemExit(main())
