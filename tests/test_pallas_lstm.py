"""Pallas LSTM scan kernel vs. the lax.scan cell (interpret mode on CPU):
forward parity, gradient parity through custom_vjp, mask semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from asr_study_tpu.models.cells import LSTMCell
from asr_study_tpu.models.rnn import scan_cell
from asr_study_tpu.ops.pallas_lstm import pallas_lstm


def _setup(seed=0, t=12, b=4, f=6, h=8):
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    cell = LSTMCell(h)
    params = cell.init(k1, f)
    x = jax.random.normal(k2, (t, b, f))
    lengths = jax.random.randint(k3, (b,), t // 2, t + 1)
    mask = (jnp.arange(t)[:, None] < lengths[None, :]).astype(jnp.float32)
    xp = cell.input_proj(params, x) + params["b"]
    return cell, params, x, xp, mask


def _scan_ref(cell, params, xp, mask):
    # scan path: xp WITHOUT bias (cell adds b in _gates)
    return scan_cell(cell, params, xp, mask[..., None])


class TestForward:
    def test_matches_scan(self):
        cell, params, x, xp, mask = _setup()
        h_pal = pallas_lstm(xp, mask[..., None], params["wh"], cell.hidden,
                            interpret=True)
        h_ref = _scan_ref(cell, params, cell.input_proj(params, x), mask)
        # scan_cell zeroes padded outputs; pallas holds state there — mask
        h_pal = h_pal * mask[..., None]
        np.testing.assert_allclose(
            np.asarray(h_pal), np.asarray(h_ref), rtol=1e-5, atol=1e-5
        )

    def test_mask_holds_state(self):
        cell, params, x, xp, mask = _setup(seed=1)
        h_pal = pallas_lstm(xp, mask[..., None], params["wh"], cell.hidden,
                            interpret=True)
        # for a sequence with length < T, h after the end must equal h at
        # the last real frame (state held)
        lengths = mask.sum(axis=0).astype(int)
        h = np.asarray(h_pal)
        for b_i in range(h.shape[1]):
            ln = int(lengths[b_i])
            if ln < h.shape[0]:
                np.testing.assert_allclose(
                    h[ln:, b_i], np.broadcast_to(h[ln - 1, b_i],
                                                 h[ln:, b_i].shape),
                    rtol=1e-6,
                )


class TestGradients:
    def test_grads_match_scan(self):
        cell, params, x, xp, mask = _setup(seed=2)

        def loss_pal(xp, wh):
            h = pallas_lstm(xp, mask[..., None], wh, cell.hidden,
                            interpret=True)
            return jnp.sum((h * mask[..., None]) ** 2)

        def loss_ref(xp_nobias, wh):
            p = dict(params, wh=wh)
            h = scan_cell(cell, p, xp_nobias, mask[..., None])
            return jnp.sum(h ** 2)

        xp_nobias = cell.input_proj(params, x)
        g_pal = jax.grad(loss_pal, argnums=(0, 1))(xp, params["wh"])
        g_ref = jax.grad(loss_ref, argnums=(0, 1))(xp_nobias, params["wh"])
        # d/dxp identical whether bias folded or not (additive constant)
        np.testing.assert_allclose(
            np.asarray(g_pal[0]), np.asarray(g_ref[0]), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(g_pal[1]), np.asarray(g_ref[1]), rtol=1e-4, atol=1e-5
        )

    def test_unmasked_loss_grads_match_held_scan(self):
        """Cotangents arriving at HELD (padded) frames: the kernel holds
        h/c past each row's length, so a loss that reads those frames
        must back-propagate exactly like autodiff through a hold-state
        scan of cell.step.  Regression for the r5 review find: the
        backward leaked the dh*o*(1-tanh^2 c) term into dc_prev on
        masked frames (it must pass dc_next through untouched)."""
        cell, params, x, xp, mask = _setup(seed=5)
        m = mask[..., None]

        def ref_outs(xp_nobias, wh):
            p = dict(params, wh=wh)

            def body(carry, inp):
                xp_t, m_t = inp
                carry, out = cell.step(p, carry, xp_t, m_t)
                return carry, out

            _, outs = jax.lax.scan(
                body, cell.init_carry(xp_nobias.shape[1]), (xp_nobias, m)
            )
            return outs

        xp_nobias = cell.input_proj(params, x)
        h_pal = pallas_lstm(xp, m, params["wh"], cell.hidden,
                            interpret=True)
        np.testing.assert_allclose(
            np.asarray(h_pal), np.asarray(ref_outs(xp_nobias, params["wh"])),
            rtol=1e-5, atol=1e-5,
        )
        g_pal = jax.grad(
            lambda xp, wh: jnp.sum(
                pallas_lstm(xp, m, wh, cell.hidden, interpret=True) ** 2
            ),
            argnums=(0, 1),
        )(xp, params["wh"])
        g_ref = jax.grad(
            lambda xpn, wh: jnp.sum(ref_outs(xpn, wh) ** 2),
            argnums=(0, 1),
        )(xp_nobias, params["wh"])
        np.testing.assert_allclose(
            np.asarray(g_pal[0]), np.asarray(g_ref[0]), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(g_pal[1]), np.asarray(g_ref[1]), rtol=1e-4, atol=1e-5
        )

    def test_rnn_layer_backend_integration(self, monkeypatch):
        """StackedRNN with the pallas backend (interpret mode) matches the
        scan backend, forward and backward, bidirectional."""
        from asr_study_tpu.models import rnn as rnn_mod
        from asr_study_tpu.models.rnn import StackedRNN

        t, b, f = 10, 2, 5
        key = jax.random.PRNGKey(0)
        net = StackedRNN(cell_kind="lstm", hidden=128, num_layers=2,
                         bidirectional=True)
        params = net.init(key, f)
        x = jax.random.normal(jax.random.PRNGKey(1), (t, b, f))
        lengths = jnp.array([10, 7])
        mask = (jnp.arange(t)[:, None] < lengths[None, :]).astype(
            jnp.float32
        )[..., None]

        monkeypatch.setattr(rnn_mod, "RNN_BACKEND", "scan")
        out_scan = net.apply(params, x, mask)
        g_scan = jax.grad(
            lambda p: jnp.sum(net.apply(p, x, mask) ** 2)
        )(params)
        monkeypatch.setattr(rnn_mod, "RNN_BACKEND", "pallas")
        out_pal = net.apply(params, x, mask)
        g_pal = jax.grad(
            lambda p: jnp.sum(net.apply(p, x, mask) ** 2)
        )(params)
        np.testing.assert_allclose(
            np.asarray(out_pal), np.asarray(out_scan), rtol=1e-5, atol=1e-5
        )
        for a, c in zip(
            jax.tree_util.tree_leaves(g_scan),
            jax.tree_util.tree_leaves(g_pal),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(c), rtol=1e-4, atol=1e-4
            )

    def test_multi_chunk_with_padding(self, monkeypatch):
        """T not a multiple of the chunk: padded tail + reversed-chunk
        backward walk must still match the scan path."""
        from asr_study_tpu.ops import pallas_lstm as mod

        monkeypatch.setattr(mod, "_CHUNK", 5)      # T=12 -> chunks of 5, pad
        cell, params, x, xp, mask = _setup(seed=4, t=12)

        def loss_pal(xp, wh):
            h = mod.pallas_lstm(xp, mask[..., None], wh, cell.hidden,
                                interpret=True)
            return jnp.sum((h * mask[..., None]) ** 2)

        def loss_ref(xp_nobias, wh):
            p = dict(params, wh=wh)
            h = scan_cell(cell, p, xp_nobias, mask[..., None],
                          backend="scan")
            return jnp.sum(h ** 2)

        xp_nobias = cell.input_proj(params, x)
        v_pal, g_pal = jax.value_and_grad(loss_pal, argnums=(0, 1))(
            xp, params["wh"]
        )
        v_ref, g_ref = jax.value_and_grad(loss_ref, argnums=(0, 1))(
            xp_nobias, params["wh"]
        )
        np.testing.assert_allclose(float(v_pal), float(v_ref), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(g_pal[0]), np.asarray(g_ref[0]), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(g_pal[1]), np.asarray(g_ref[1]), rtol=1e-4, atol=1e-5
        )

    @pytest.mark.parametrize("cell_kind,hidden", [
        ("lstm", 100),   # graves2006's width — the VERDICT-r1 fallback case
        ("gru", 50),
    ])
    def test_unaligned_hidden_takes_kernel(self, monkeypatch, cell_kind,
                                           hidden):
        """H % 128 != 0 engages the kernel via per-gate zero padding and
        matches the scan backend forward AND backward."""
        from asr_study_tpu.models import rnn as rnn_mod
        from asr_study_tpu.models.rnn import StackedRNN

        t, b, f = 9, 2, 5
        net = StackedRNN(cell_kind=cell_kind, hidden=hidden, num_layers=1,
                         bidirectional=True)
        params = net.init(jax.random.PRNGKey(0), f)
        x = jax.random.normal(jax.random.PRNGKey(1), (t, b, f))
        mask = (jnp.arange(t)[:, None] < jnp.array([9, 6])[None, :]).astype(
            jnp.float32
        )[..., None]

        monkeypatch.setattr(rnn_mod, "RNN_BACKEND", "scan")
        out_scan = net.apply(params, x, mask)
        g_scan = jax.grad(
            lambda p: jnp.sum(net.apply(p, x, mask) ** 2)
        )(params)
        monkeypatch.setattr(rnn_mod, "RNN_BACKEND", "pallas")
        out_pal = net.apply(params, x, mask)
        g_pal = jax.grad(
            lambda p: jnp.sum(net.apply(p, x, mask) ** 2)
        )(params)
        np.testing.assert_allclose(
            np.asarray(out_pal), np.asarray(out_scan), rtol=1e-5, atol=1e-5
        )
        for a, c in zip(
            jax.tree_util.tree_leaves(g_scan),
            jax.tree_util.tree_leaves(g_pal),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(c), rtol=1e-4, atol=1e-4
            )

    def test_bf16_weights(self):
        """Mixed precision: bf16 wh with f32 xp/state (the Trainer's
        compute_dtype path) must run and produce finite grads matching the
        scan path's bf16 numerics."""
        cell, params, x, xp, mask = _setup(seed=5)
        wh16 = params["wh"].astype(jnp.bfloat16)

        def loss_pal(xp, wh):
            h = pallas_lstm(xp, mask[..., None], wh, cell.hidden,
                            interpret=True)
            return jnp.sum((h * mask[..., None]) ** 2)

        v, g = jax.value_and_grad(loss_pal, argnums=(0, 1))(xp, wh16)
        assert np.isfinite(float(v))
        assert g[1].dtype == jnp.bfloat16
        for arr in g:
            assert np.all(np.isfinite(np.asarray(arr, np.float32)))

    def test_full_length_grads(self):
        cell, params, x, _, _ = _setup(seed=3)
        t, b = x.shape[0], x.shape[1]
        mask = jnp.ones((t, b), jnp.float32)
        xp = cell.input_proj(params, x) + params["b"]

        def loss(xp, wh):
            return jnp.sum(
                pallas_lstm(xp, mask[..., None], wh, cell.hidden,
                            interpret=True)
            )

        g = jax.grad(loss, argnums=(0, 1))(xp, params["wh"])
        for arr in g:
            assert np.all(np.isfinite(np.asarray(arr)))
