#!/usr/bin/env python
"""Dataset build entry point, same position as the reference's
extras/make_dataset.py."""
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
from asr_study_tpu.cli.make_dataset import main  # noqa: E402

if __name__ == "__main__":
    raise SystemExit(main())
