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


def test_unmasked_loss_grads_match_held_scan():
    """Held-frame cotangents at the KERNEL level (the model paths mask
    outputs, so only direct consumers see this): a loss reading frames
    past each row's length must back-propagate like autodiff through a
    hold-state scan of the LN cell's step.  Regression for the r5
    review find (dc_prev leaked the output-path term on masked frames;
    see test_pallas_lstm.py)."""
    from asr_study_tpu.models.cells import LayerNormLSTMCell
    from asr_study_tpu.ops.pallas_ln_lstm import pallas_ln_lstm

    h, t, b, f = 8, 11, 3, 5
    cell = LayerNormLSTMCell(h)
    params = cell.init(jax.random.PRNGKey(0), f)
    params["b"] = 0.3 * jax.random.normal(
        jax.random.PRNGKey(9), params["b"].shape
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (t, b, f))
    mask = (jnp.arange(t)[:, None] < jnp.array([11, 7, 5])[None, :]
            ).astype(jnp.float32)[..., None]
    xp = cell.input_proj(params, x)

    def pal(xp_in, wh):
        # the scan_cell LN prep (models/rnn.py), no padding at h=8
        xpn = (LayerNormLSTMCell._blockwise_ln(params["ln_x"], xp_in)
               + params["b"] + params["ln_h"]["b"])
        return pallas_ln_lstm(
            xpn, mask, wh, params["ln_h"]["g"], params["ln_c"]["g"],
            params["ln_c"]["b"], h, h, interpret=True,
        )

    def ref(xp_in, wh):
        p = dict(params, wh=wh)

        def body(carry, inp):
            xp_t, m_t = inp
            carry, out = cell.step(p, carry, xp_t, m_t)
            return carry, out

        _, outs = jax.lax.scan(
            body, cell.init_carry(xp_in.shape[1]), (xp_in, mask)
        )
        return outs

    np.testing.assert_allclose(
        np.asarray(pal(xp, params["wh"])),
        np.asarray(ref(xp, params["wh"])), rtol=1e-4, atol=1e-5,
    )
    g_pal = jax.grad(lambda a, w: jnp.sum(pal(a, w) ** 2),
                     argnums=(0, 1))(xp, params["wh"])
    g_ref = jax.grad(lambda a, w: jnp.sum(ref(a, w) ** 2),
                     argnums=(0, 1))(xp, params["wh"])
    for a, c in zip(g_pal, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(c), rtol=2e-4, atol=2e-4
        )


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
