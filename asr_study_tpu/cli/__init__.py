"""CLI entry points mirroring the reference's scripts
[ref: train.py, eval.py, predict.py, extras/make_dataset.py]."""
