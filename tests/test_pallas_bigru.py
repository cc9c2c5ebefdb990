"""Fused bidirectional Pallas GRU kernel (interpret mode on CPU): forward
and gradient parity vs the per-direction scan reference, multi-chunk
padded tails, and the RNNLayer integration path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from asr_study_tpu.models.cells import GRUCell
from asr_study_tpu.models import rnn as rnn_mod
from asr_study_tpu.models.rnn import RNNLayer, scan_cell
from asr_study_tpu.ops import pallas_lstm as base_mod
from asr_study_tpu.ops.pallas_bigru import pallas_bigru


def _setup(seed=0, t=12, b=4, f=6, h=8):
    key = jax.random.PRNGKey(seed)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    cell = GRUCell(h)
    p_f = cell.init(k1, f)
    p_b = cell.init(k4, f)
    x = jax.random.normal(k2, (t, b, f))
    lengths = jax.random.randint(k3, (b,), t // 2, t + 1)
    mask = (jnp.arange(t)[:, None] < lengths[None, :]).astype(jnp.float32)
    xp_f = cell.input_proj(p_f, x) + p_f["b"]
    xp_b = cell.input_proj(p_b, x) + p_b["b"]
    return cell, p_f, p_b, x, xp_f, xp_b, mask


def _ref_bidi(cell, p_f, p_b, x, mask):
    out_f = scan_cell(cell, p_f, cell.input_proj(p_f, x), mask[..., None],
                      backend="scan")
    out_b = scan_cell(cell, p_b, cell.input_proj(p_b, x), mask[..., None],
                      backend="scan", reverse=True)
    return out_f, out_b


@pytest.mark.parametrize("t,chunk", [(12, 32), (13, 5)])
def test_forward_parity(monkeypatch, t, chunk):
    monkeypatch.setattr(base_mod, "_CHUNK", chunk)
    cell, p_f, p_b, x, xp_f, xp_b, mask = _setup(seed=2, t=t)
    h_f, h_b = pallas_bigru(
        xp_f, xp_b, mask[..., None], p_f["wh"], p_b["wh"], cell.hidden,
        interpret=True,
    )
    r_f, r_b = _ref_bidi(cell, p_f, p_b, x, mask)
    m = mask[..., None]
    np.testing.assert_allclose(np.asarray(h_f * m), np.asarray(r_f),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_b * m), np.asarray(r_b),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("t,chunk", [(12, 32), (13, 5)])
def test_grad_parity(monkeypatch, t, chunk):
    """Includes the multi-chunk padded-tail case for BOTH cotangent walk
    directions (the bug class VERDICT r1 flagged for the GRU backward)."""
    monkeypatch.setattr(base_mod, "_CHUNK", chunk)
    monkeypatch.setattr(base_mod, "_CHUNK_BWD", max(2, chunk // 2))
    cell, p_f, p_b, x, xp_f, xp_b, mask = _setup(seed=9, t=t)

    def loss_fused(xp_f, xp_b, wh_f, wh_b):
        h_f, h_b = pallas_bigru(
            xp_f, xp_b, mask[..., None], wh_f, wh_b, cell.hidden,
            interpret=True,
        )
        m = mask[..., None]
        return jnp.sum((h_f * m) ** 2) + jnp.sum(jnp.sin(h_b * m))

    def loss_ref(xp_f, xp_b, wh_f, wh_b):
        q_f = dict(p_f, wh=wh_f)
        q_b = dict(p_b, wh=wh_b)
        out_f = scan_cell(cell, q_f, xp_f - p_f["b"], mask[..., None],
                          backend="scan")
        out_b = scan_cell(cell, q_b, xp_b - p_b["b"], mask[..., None],
                          backend="scan", reverse=True)
        return jnp.sum(out_f ** 2) + jnp.sum(jnp.sin(out_b))

    args = (xp_f, xp_b, p_f["wh"], p_b["wh"])
    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(*args)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(*args)
    for got, want in zip(g_fused, g_ref):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4
        )


def test_rnn_layer_integration(monkeypatch):
    """RNNLayer('gru') with the fused path engaged matches scan, values
    and gradients."""
    key = jax.random.PRNGKey(21)
    k1, k2, k3 = jax.random.split(key, 3)
    layer = RNNLayer("gru", 8, bidirectional=True)
    params = layer.init(k1, 5)
    t, b = 10, 3
    x = jax.random.normal(k2, (t, b, 5))
    lengths = jax.random.randint(k3, (b,), t // 2, t + 1)
    mask = (
        jnp.arange(t)[:, None] < lengths[None, :]
    ).astype(jnp.float32)[..., None]

    def loss(p):
        return jnp.sum(layer.apply(p, x, mask) ** 2)

    monkeypatch.setattr(rnn_mod, "RNN_BACKEND", "scan")
    want = layer.apply(params, x, mask)
    g_want = jax.grad(loss)(params)
    monkeypatch.setattr(rnn_mod, "RNN_BACKEND", "pallas")
    monkeypatch.setenv("ASR_RNN_FUSED", "1")
    got = layer.apply(params, x, mask)
    g_got = jax.grad(loss)(params)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    for a, b_ in zip(jax.tree.leaves(g_got), jax.tree.leaves(g_want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-4)
