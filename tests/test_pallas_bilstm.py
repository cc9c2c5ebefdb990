"""Fused bidirectional Pallas LSTM kernel (interpret mode on CPU):
forward + gradient parity vs the per-direction scan reference, mask
semantics, multi-chunk padded tails, and the RNNLayer integration path
(including non-128-aligned hidden sizes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from asr_study_tpu.models.cells import LSTMCell
from asr_study_tpu.models import rnn as rnn_mod
from asr_study_tpu.models.rnn import RNNLayer, scan_cell
from asr_study_tpu.ops import pallas_lstm as base_mod
from asr_study_tpu.ops.pallas_bilstm import pallas_bilstm


def _setup(seed=0, t=12, b=4, f=6, h=8):
    key = jax.random.PRNGKey(seed)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    cell = LSTMCell(h)
    p_f = cell.init(k1, f)
    p_b = cell.init(k4, f)
    x = jax.random.normal(k2, (t, b, f))
    lengths = jax.random.randint(k3, (b,), t // 2, t + 1)
    mask = (jnp.arange(t)[:, None] < lengths[None, :]).astype(jnp.float32)
    xp_f = cell.input_proj(p_f, x) + p_f["b"]
    xp_b = cell.input_proj(p_b, x) + p_b["b"]
    return cell, p_f, p_b, x, xp_f, xp_b, mask


def _ref_bidi(cell, p_f, p_b, x, mask):
    """Per-direction lax.scan reference (the semantics contract)."""
    out_f = scan_cell(cell, p_f, cell.input_proj(p_f, x), mask[..., None],
                      backend="scan")
    out_b = scan_cell(cell, p_b, cell.input_proj(p_b, x), mask[..., None],
                      backend="scan", reverse=True)
    return out_f, out_b


class TestForward:
    def test_matches_per_direction_scan(self):
        cell, p_f, p_b, x, xp_f, xp_b, mask = _setup()
        h_f, h_b = pallas_bilstm(
            xp_f, xp_b, mask[..., None], p_f["wh"], p_b["wh"], cell.hidden,
            interpret=True,
        )
        r_f, r_b = _ref_bidi(cell, p_f, p_b, x, mask)
        m = mask[..., None]
        np.testing.assert_allclose(
            np.asarray(h_f * m), np.asarray(r_f), rtol=1e-5, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(h_b * m), np.asarray(r_b), rtol=1e-5, atol=1e-5
        )

    def test_full_mask(self):
        cell, p_f, p_b, x, xp_f, xp_b, _ = _setup(seed=3)
        mask = jnp.ones(x.shape[:2], jnp.float32)
        h_f, h_b = pallas_bilstm(
            xp_f, xp_b, mask[..., None], p_f["wh"], p_b["wh"], cell.hidden,
            interpret=True,
        )
        r_f, r_b = _ref_bidi(cell, p_f, p_b, x, mask)
        np.testing.assert_allclose(np.asarray(h_f), np.asarray(r_f),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(h_b), np.asarray(r_b),
                                   rtol=1e-5, atol=1e-5)

    def test_multi_chunk_padded_tail(self, monkeypatch):
        """T=13 with chunk 5 -> t_pad=15: both lanes cross chunk borders
        and the reversed lane consumes the zero-padded tail FIRST."""
        monkeypatch.setattr(base_mod, "_CHUNK", 5)
        cell, p_f, p_b, x, xp_f, xp_b, mask = _setup(seed=5, t=13)
        h_f, h_b = pallas_bilstm(
            xp_f, xp_b, mask[..., None], p_f["wh"], p_b["wh"], cell.hidden,
            interpret=True,
        )
        r_f, r_b = _ref_bidi(cell, p_f, p_b, x, mask)
        m = mask[..., None]
        np.testing.assert_allclose(np.asarray(h_f * m), np.asarray(r_f),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(h_b * m), np.asarray(r_b),
                                   rtol=1e-5, atol=1e-5)


class TestGradients:
    def _loss_fused(self, cell, mask):
        def loss(xp_f, xp_b, wh_f, wh_b):
            h_f, h_b = pallas_bilstm(
                xp_f, xp_b, mask[..., None], wh_f, wh_b, cell.hidden,
                interpret=True,
            )
            m = mask[..., None]
            return jnp.sum((h_f * m) ** 2) + jnp.sum(jnp.sin(h_b * m))
        return loss

    def _loss_ref(self, cell, p_f, p_b, x, mask):
        def loss(xp_f, xp_b, wh_f, wh_b):
            q_f = dict(p_f, wh=wh_f)
            q_b = dict(p_b, wh=wh_b)
            # scan path adds b inside the cell: strip the folded bias
            out_f = scan_cell(cell, q_f, xp_f - p_f["b"], mask[..., None],
                              backend="scan")
            out_b = scan_cell(cell, q_b, xp_b - p_b["b"], mask[..., None],
                              backend="scan", reverse=True)
            return jnp.sum(out_f ** 2) + jnp.sum(jnp.sin(out_b))
        return loss

    @pytest.mark.parametrize("t,chunk", [(12, 32), (13, 5)])
    def test_grad_parity(self, monkeypatch, t, chunk):
        monkeypatch.setattr(base_mod, "_CHUNK", chunk)
        monkeypatch.setattr(base_mod, "_CHUNK_BWD", max(2, chunk // 2))
        cell, p_f, p_b, x, xp_f, xp_b, mask = _setup(seed=7, t=t)
        g_fused = jax.grad(self._loss_fused(cell, mask), argnums=(0, 1, 2, 3))(
            xp_f, xp_b, p_f["wh"], p_b["wh"]
        )
        g_ref = jax.grad(
            self._loss_ref(cell, p_f, p_b, x, mask), argnums=(0, 1, 2, 3)
        )(xp_f, xp_b, p_f["wh"], p_b["wh"])
        for got, want in zip(g_fused, g_ref):
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4
            )


class TestRNNLayerIntegration:
    @pytest.mark.parametrize("hidden", [8, 100])
    def test_fused_matches_scan_layer(self, monkeypatch, hidden):
        """RNNLayer with the fused path engaged (pallas backend, interpret)
        matches the scan backend — including H=100 (128-pad eligibility,
        the reference's graves2006 width)."""
        key = jax.random.PRNGKey(11)
        k1, k2, k3 = jax.random.split(key, 3)
        layer = RNNLayer("lstm", hidden, bidirectional=True)
        params = layer.init(k1, 6)
        t, b = 9, 3
        x = jax.random.normal(k2, (t, b, 6))
        lengths = jax.random.randint(k3, (b,), t // 2, t + 1)
        mask = (
            jnp.arange(t)[:, None] < lengths[None, :]
        ).astype(jnp.float32)[..., None]

        monkeypatch.setattr(rnn_mod, "RNN_BACKEND", "scan")
        want = layer.apply(params, x, mask)
        monkeypatch.setattr(rnn_mod, "RNN_BACKEND", "pallas")
        monkeypatch.setenv("ASR_RNN_FUSED", "1")
        got = layer.apply(params, x, mask)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
        )

    def test_fused_disable_env(self, monkeypatch):
        """ASR_RNN_FUSED=0 falls back to the per-direction kernels and
        still matches."""
        key = jax.random.PRNGKey(13)
        k1, k2 = jax.random.split(key)
        layer = RNNLayer("lstm", 8, bidirectional=True)
        params = layer.init(k1, 4)
        x = jax.random.normal(k2, (7, 2, 4))
        mask = jnp.ones((7, 2, 1), jnp.float32)
        monkeypatch.setattr(rnn_mod, "RNN_BACKEND", "pallas")
        monkeypatch.setenv("ASR_RNN_FUSED", "1")
        a = layer.apply(params, x, mask)
        monkeypatch.setenv("ASR_RNN_FUSED", "0")
        b = layer.apply(params, x, mask)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)

    def test_grad_through_layer(self, monkeypatch):
        """End-to-end gradient through the fused layer matches scan."""
        key = jax.random.PRNGKey(17)
        k1, k2 = jax.random.split(key)
        layer = RNNLayer("lstm", 8, bidirectional=True)
        params = layer.init(k1, 4)
        t, b = 11, 2
        x = jax.random.normal(k2, (t, b, 4))
        mask = (
            jnp.arange(t)[:, None] < jnp.array([7, 11])[None, :]
        ).astype(jnp.float32)[..., None]

        def loss(p):
            return jnp.sum(layer.apply(p, x, mask) ** 2)

        monkeypatch.setattr(rnn_mod, "RNN_BACKEND", "scan")
        g_want = jax.grad(loss)(params)
        monkeypatch.setattr(rnn_mod, "RNN_BACKEND", "pallas")
        monkeypatch.setenv("ASR_RNN_FUSED", "1")
        g_got = jax.grad(loss)(params)
        for got, want in zip(jax.tree.leaves(g_got), jax.tree.leaves(g_want)):
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
            )
