"""Fused bidirectional LN-LSTM kernel (interpret mode on CPU): forward +
gradient parity vs the per-direction scan reference, padded hidden widths,
and the RNNLayer integration path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from asr_study_tpu.models import rnn as rnn_mod
from asr_study_tpu.models.rnn import RNNLayer
from asr_study_tpu.ops import pallas_lstm as base_mod


def _layer_setup(seed, hidden, t=11, b=3, f=5):
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    layer = RNNLayer("ln_lstm", hidden, bidirectional=True)
    params = layer.init(k1, f)
    x = jax.random.normal(k2, (t, b, f))
    lengths = jax.random.randint(k3, (b,), t // 2, t + 1)
    mask = (
        jnp.arange(t)[:, None] < lengths[None, :]
    ).astype(jnp.float32)[..., None]
    return layer, params, x, mask


@pytest.mark.parametrize("hidden", [8, 12])  # 12: non-128-aligned padding
def test_fused_matches_scan_layer(monkeypatch, hidden):
    layer, params, x, mask = _layer_setup(31, hidden)
    monkeypatch.setattr(rnn_mod, "RNN_BACKEND", "scan")
    want = layer.apply(params, x, mask)
    monkeypatch.setattr(rnn_mod, "RNN_BACKEND", "pallas")
    monkeypatch.setenv("ASR_RNN_FUSED", "1")
    got = layer.apply(params, x, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fused_matches_unfused_kernel(monkeypatch):
    """Fused path vs the single-direction LN kernels (both pallas)."""
    layer, params, x, mask = _layer_setup(37, 8)
    monkeypatch.setattr(rnn_mod, "RNN_BACKEND", "pallas")
    monkeypatch.setenv("ASR_RNN_FUSED", "0")
    want = layer.apply(params, x, mask)
    monkeypatch.setenv("ASR_RNN_FUSED", "1")
    got = layer.apply(params, x, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("chunk", [32, 4])  # 4: multi-chunk padded tail
def test_grad_parity(monkeypatch, chunk):
    monkeypatch.setattr(base_mod, "_CHUNK", chunk)
    monkeypatch.setattr(base_mod, "_CHUNK_BWD", max(2, chunk // 2))
    layer, params, x, mask = _layer_setup(41, 8)

    def loss(p):
        out = layer.apply(p, x, mask)
        return jnp.sum(out ** 2) + jnp.sum(jnp.sin(out))

    monkeypatch.setattr(rnn_mod, "RNN_BACKEND", "scan")
    g_want = jax.grad(loss)(params)
    monkeypatch.setattr(rnn_mod, "RNN_BACKEND", "pallas")
    monkeypatch.setenv("ASR_RNN_FUSED", "1")
    g_got = jax.grad(loss)(params)
    flat_got, tree = jax.tree.flatten(g_got)
    flat_want, _ = jax.tree.flatten(g_want)
    for got, want in zip(flat_got, flat_want):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=3e-4, atol=3e-4
        )
