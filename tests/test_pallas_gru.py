"""Pallas GRU scan kernel vs. the lax.scan GRU cell (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from asr_study_tpu.models.cells import GRUCell
from asr_study_tpu.models.rnn import scan_cell
from asr_study_tpu.ops.pallas_gru import pallas_gru


def _setup(seed=0, t=11, b=4, f=6, h=8):
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    cell = GRUCell(h)
    params = cell.init(k1, f)
    # nonzero biases to exercise the bias-folding equivalence
    params["b"] = jax.random.normal(jax.random.PRNGKey(9), params["b"].shape)
    x = jax.random.normal(k2, (t, b, f))
    lengths = jax.random.randint(k3, (b,), t // 2, t + 1)
    mask = (jnp.arange(t)[:, None] < lengths[None, :]).astype(jnp.float32)
    return cell, params, x, mask


def test_forward_matches_scan():
    cell, params, x, mask = _setup()
    xp = cell.input_proj(params, x)
    h_ref = scan_cell(cell, params, xp, mask[..., None], backend="scan")
    h_pal = pallas_gru(
        xp + params["b"], mask[..., None], params["wh"], cell.hidden,
        interpret=True,
    ) * mask[..., None]
    np.testing.assert_allclose(
        np.asarray(h_pal), np.asarray(h_ref), rtol=1e-5, atol=1e-5
    )


def test_grads_match_scan():
    cell, params, x, mask = _setup(seed=1)
    xp = cell.input_proj(params, x)

    def loss_pal(xp_in, wh):
        h = pallas_gru(
            xp_in + params["b"], mask[..., None], wh, cell.hidden,
            interpret=True,
        )
        return jnp.sum((h * mask[..., None]) ** 2)

    def loss_ref(xp_in, wh):
        p = dict(params, wh=wh)
        h = scan_cell(cell, p, xp_in, mask[..., None], backend="scan")
        return jnp.sum(h ** 2)

    g_pal = jax.grad(loss_pal, argnums=(0, 1))(xp, params["wh"])
    g_ref = jax.grad(loss_ref, argnums=(0, 1))(xp, params["wh"])
    np.testing.assert_allclose(
        np.asarray(g_pal[0]), np.asarray(g_ref[0]), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(g_pal[1]), np.asarray(g_ref[1]), rtol=1e-4, atol=1e-5
    )


def test_multi_chunk_with_padding_grads(monkeypatch):
    """T not a multiple of the chunk: padded tail + reversed-chunk backward
    walk must still match the scan path (the bug class lives exactly in the
    bwd chunk-reversal logic — mirror of the LSTM regression test)."""
    from asr_study_tpu.ops import pallas_lstm as lstm_mod

    # GRU's _fwd_call/_bwd_call import the chunk helpers from pallas_lstm
    monkeypatch.setattr(lstm_mod, "_CHUNK", 5)       # T=11 -> 5+5+pad
    monkeypatch.setattr(lstm_mod, "_CHUNK_BWD", 5)
    cell, params, x, mask = _setup(seed=3, t=11)
    xp = cell.input_proj(params, x)

    def loss_pal(xp_in, wh):
        h = pallas_gru(
            xp_in + params["b"], mask[..., None], wh, cell.hidden,
            interpret=True,
        )
        return jnp.sum((h * mask[..., None]) ** 2)

    def loss_ref(xp_in, wh):
        p = dict(params, wh=wh)
        h = scan_cell(cell, p, xp_in, mask[..., None], backend="scan")
        return jnp.sum(h ** 2)

    v_pal, g_pal = jax.value_and_grad(loss_pal, argnums=(0, 1))(
        xp, params["wh"]
    )
    v_ref, g_ref = jax.value_and_grad(loss_ref, argnums=(0, 1))(
        xp, params["wh"]
    )
    np.testing.assert_allclose(float(v_pal), float(v_ref), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(g_pal[0]), np.asarray(g_ref[0]), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(g_pal[1]), np.asarray(g_ref[1]), rtol=1e-4, atol=1e-5
    )


def test_deep_gru_backend_integration(monkeypatch):
    from asr_study_tpu.models import rnn as rnn_mod
    from asr_study_tpu.models.zoo import build_model

    model = build_model(
        "deep_gru", {"num_hiddens": 128, "num_layers": 1}, num_classes=5
    )
    params = model.init(jax.random.PRNGKey(0), 7)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 9, 7))
    lengths = jnp.array([9, 6])
    monkeypatch.setattr(rnn_mod, "RNN_BACKEND", "scan")
    out_scan = model.apply(params, x, lengths)
    monkeypatch.setattr(rnn_mod, "RNN_BACKEND", "pallas")
    out_pal = model.apply(params, x, lengths)
    np.testing.assert_allclose(
        np.asarray(out_pal), np.asarray(out_scan), rtol=1e-5, atol=1e-5
    )
