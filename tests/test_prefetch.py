"""Async device prefetch pipeline."""

import numpy as np
import pytest

from asr_study_tpu.data.generator import Batch
from asr_study_tpu.data.prefetch import device_prefetch


def _mk_batch(i, n=4, t=8, f=3):
    return Batch(
        inputs=np.full((n, t, f), float(i), np.float32),
        input_lengths=np.full((n,), t, np.int32),
        labels=np.zeros((n, 2), np.int32),
        label_lengths=np.full((n,), 2, np.int32),
        weights=np.ones((n,), np.float32),
        texts=[f"utt{i}"] * n,
    )


def test_order_and_content_preserved():
    batches = [_mk_batch(i) for i in range(5)]
    out = list(device_prefetch(iter(batches), depth=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        assert float(np.asarray(b.inputs)[0, 0, 0]) == float(i)
        assert b.texts == [f"utt{i}"] * 4
        # device-bound fields became jax arrays
        assert hasattr(b.inputs, "devices")


def test_worker_exception_propagates():
    def gen():
        yield _mk_batch(0)
        raise RuntimeError("boom")

    it = device_prefetch(gen(), depth=1)
    next(it)
    with pytest.raises(RuntimeError, match="boom"):
        next(it)


def test_transform_applied():
    def double(b):
        return Batch(
            inputs=b.inputs * 2, input_lengths=b.input_lengths,
            labels=b.labels, label_lengths=b.label_lengths,
            weights=b.weights, texts=b.texts,
        )

    out = list(device_prefetch(iter([_mk_batch(3)]), transform=double))
    assert float(np.asarray(out[0].inputs)[0, 0, 0]) == 6.0
