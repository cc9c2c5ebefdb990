"""Pallas layer-norm LSTM kernel vs. the lax.scan LN cell (interpret mode):
forward parity, full-parameter gradient parity, unaligned hidden widths,
multi-chunk padded tails."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from asr_study_tpu.models import rnn as rnn_mod
from asr_study_tpu.models.rnn import StackedRNN


def _net_and_data(hidden=8, t=11, b=3, f=5, layers=1, seed=0,
                  bidirectional=True):
    net = StackedRNN(cell_kind="ln_lstm", hidden=hidden, num_layers=layers,
                     bidirectional=bidirectional)
    params = net.init(jax.random.PRNGKey(seed), f)
    x = jax.random.normal(jax.random.PRNGKey(seed + 1), (t, b, f))
    lengths = jax.random.randint(
        jax.random.PRNGKey(seed + 2), (b,), t // 2, t + 1
    )
    mask = (jnp.arange(t)[:, None] < lengths[None, :]).astype(
        jnp.float32
    )[..., None]
    return net, params, x, mask


def _run_both(net, params, x, mask, monkeypatch):
    monkeypatch.setattr(rnn_mod, "RNN_BACKEND", "scan")
    out_scan = net.apply(params, x, mask)
    g_scan = jax.grad(lambda p: jnp.sum(net.apply(p, x, mask) ** 2))(params)
    monkeypatch.setattr(rnn_mod, "RNN_BACKEND", "pallas")
    out_pal = net.apply(params, x, mask)
    g_pal = jax.grad(lambda p: jnp.sum(net.apply(p, x, mask) ** 2))(params)
    return out_scan, g_scan, out_pal, g_pal


def _assert_close(out_scan, g_scan, out_pal, g_pal):
    np.testing.assert_allclose(
        np.asarray(out_pal), np.asarray(out_scan), rtol=1e-4, atol=1e-5
    )
    flat_s, tdef = jax.tree_util.tree_flatten(g_scan)
    flat_p, _ = jax.tree_util.tree_flatten(g_pal)
    for a, c in zip(flat_s, flat_p):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(c), rtol=2e-4, atol=2e-4
        )


def test_forward_and_grads_match_scan(monkeypatch):
    """Bidirectional LN-LSTM: outputs and EVERY parameter gradient
    (wx, wh, b, ln_x, ln_h, ln_c of both directions) match the scan cell."""
    net, params, x, mask = _net_and_data(hidden=8)
    _assert_close(*_run_both(net, params, x, mask, monkeypatch))


def test_unaligned_hidden(monkeypatch):
    """H=100 (graves2006 width): lane padding + masked LN statistics must
    keep parity — LN over padded lanes was the failure mode to guard."""
    net, params, x, mask = _net_and_data(hidden=100, t=6, b=2)
    _assert_close(*_run_both(net, params, x, mask, monkeypatch))


def test_multi_chunk_with_padding(monkeypatch):
    """T not a multiple of the chunk: reversed-chunk backward walk."""
    from asr_study_tpu.ops import pallas_lstm as lstm_mod

    monkeypatch.setattr(lstm_mod, "_CHUNK", 4)     # T=11 -> 4+4+4 pad
    monkeypatch.setattr(lstm_mod, "_CHUNK_BWD", 4)
    net, params, x, mask = _net_and_data(hidden=8, t=11)
    _assert_close(*_run_both(net, params, x, mask, monkeypatch))


def test_stacked_two_layers(monkeypatch):
    net, params, x, mask = _net_and_data(hidden=8, layers=2, t=7)
    _assert_close(*_run_both(net, params, x, mask, monkeypatch))


def test_zoo_ln_blstm_runs_pallas(monkeypatch):
    """The model-zoo ln_blstm constructor engages the kernel end to end."""
    from asr_study_tpu.models.zoo import build_model

    model = build_model(
        "ln_blstm", {"num_hiddens": 8, "num_layers": 1}, num_classes=5
    )
    params = model.init(jax.random.PRNGKey(0), 7)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 9, 7))
    lengths = jnp.array([9, 6])
    monkeypatch.setattr(rnn_mod, "RNN_BACKEND", "scan")
    out_scan = model.apply(params, x, lengths)
    monkeypatch.setattr(rnn_mod, "RNN_BACKEND", "pallas")
    out_pal = model.apply(params, x, lengths)
    np.testing.assert_allclose(
        np.asarray(out_pal), np.asarray(out_scan), rtol=1e-4, atol=1e-5
    )
