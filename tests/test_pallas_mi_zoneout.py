"""Pallas MI-LSTM and zoneout-LSTM kernels vs. the lax.scan cells
(interpret mode) — the last two signature cells of the reference's custom
layer family [ref: core/layers.py] to get fused kernels."""

import jax
import jax.numpy as jnp
import numpy as np

from asr_study_tpu.models.cells import MILSTMCell, ZoneoutLSTMCell
from asr_study_tpu.models.rnn import scan_cell
from asr_study_tpu.ops.pallas_mi_lstm import pallas_mi_lstm
from asr_study_tpu.ops.pallas_zoneout_lstm import pallas_zoneout_lstm


def _setup(cell_cls, seed=0, t=11, b=4, f=6, h=8, **cell_kw):
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    cell = cell_cls(h, **cell_kw)
    params = cell.init(k1, f)
    params["b"] = 0.3 * jax.random.normal(
        jax.random.PRNGKey(9), params["b"].shape
    )
    if cell_cls is MILSTMCell:
        # non-trivial MI vectors so alpha/beta grads are exercised
        for i, k in enumerate(("alpha", "beta1", "beta2")):
            params[k] = 1.0 + 0.2 * jax.random.normal(
                jax.random.PRNGKey(20 + i), params[k].shape
            )
    x = jax.random.normal(k2, (t, b, f))
    lengths = jax.random.randint(k3, (b,), t // 2, t + 1)
    mask = (jnp.arange(t)[:, None] < lengths[None, :]).astype(jnp.float32)
    return cell, params, x, mask[..., None]


# ---------------------------------------------------------------- MI-LSTM

def test_mi_forward_matches_scan():
    cell, params, x, mask = _setup(MILSTMCell)
    xp = cell.input_proj(params, x)
    h_ref = scan_cell(cell, params, xp, mask, backend="scan")
    h_pal = pallas_mi_lstm(
        xp, mask, params["wh"], params["alpha"], params["beta1"],
        params["beta2"], params["b"], cell.hidden, interpret=True,
    ) * mask
    np.testing.assert_allclose(
        np.asarray(h_pal), np.asarray(h_ref), rtol=1e-5, atol=1e-5
    )


def test_mi_grads_match_scan(monkeypatch):
    from asr_study_tpu.ops import pallas_lstm as lstm_mod

    # multi-chunk + padded tail: T=11 -> 5+5+pad (bwd reversal bug class)
    monkeypatch.setattr(lstm_mod, "_CHUNK", 5)
    monkeypatch.setattr(lstm_mod, "_CHUNK_BWD", 5)
    cell, params, x, mask = _setup(MILSTMCell, seed=1)
    xp = cell.input_proj(params, x)
    names = ("alpha", "beta1", "beta2", "b")

    def loss_pal(xp_in, wh, vecs):
        h = pallas_mi_lstm(
            xp_in, mask, wh, *[vecs[k] for k in names], cell.hidden,
            interpret=True,
        )
        return jnp.sum((h * mask) ** 2)

    def loss_ref(xp_in, wh, vecs):
        p = dict(params, wh=wh, **vecs)
        h = scan_cell(cell, p, xp_in, mask, backend="scan")
        return jnp.sum(h ** 2)

    vecs = {k: params[k] for k in names}
    v_pal, g_pal = jax.value_and_grad(loss_pal, argnums=(0, 1, 2))(
        xp, params["wh"], vecs
    )
    v_ref, g_ref = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(
        xp, params["wh"], vecs
    )
    np.testing.assert_allclose(float(v_pal), float(v_ref), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(g_pal[0]), np.asarray(g_ref[0]), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(g_pal[1]), np.asarray(g_ref[1]), rtol=1e-4, atol=1e-5
    )
    for k in names:
        np.testing.assert_allclose(
            np.asarray(g_pal[2][k]), np.asarray(g_ref[2][k]),
            rtol=1e-4, atol=1e-5, err_msg=k,
        )


def test_mi_unmasked_loss_grads_match_held_scan():
    """Held-frame cotangents at the kernel level (see
    test_pallas_lstm.py): regression for the r5 review find that the
    MI backward leaked the output-path dc term on masked frames."""
    cell, params, x, mask = _setup(MILSTMCell, seed=3)
    xp = cell.input_proj(params, x)
    names = ("alpha", "beta1", "beta2", "b")

    def pal(xp_in, wh):
        return pallas_mi_lstm(
            xp_in, mask, wh, *[params[k] for k in names], cell.hidden,
            interpret=True,
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
        np.asarray(ref(xp, params["wh"])), rtol=1e-5, atol=1e-5,
    )
    g_pal = jax.grad(lambda a, w: jnp.sum(pal(a, w) ** 2),
                     argnums=(0, 1))(xp, params["wh"])
    g_ref = jax.grad(lambda a, w: jnp.sum(ref(a, w) ** 2),
                     argnums=(0, 1))(xp, params["wh"])
    for a, c in zip(g_pal, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(c), rtol=1e-4, atol=1e-5
        )


def test_mi_backend_integration_padded_width(monkeypatch):
    """mi_blstm with H=100 (non-128-aligned) through the model zoo: the
    pallas backend pads gate blocks internally and must match scan."""
    from asr_study_tpu.models import rnn as rnn_mod
    from asr_study_tpu.models.zoo import build_model

    model = build_model(
        "mi_blstm", {"num_hiddens": 100, "num_layers": 1}, num_classes=5
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


# ----------------------------------------------------------- zoneout-LSTM

def test_zoneout_eval_matches_scan():
    """Deterministic (eval) zoneout: constant interpolation weights."""
    cell, params, x, mask = _setup(
        ZoneoutLSTMCell, zoneout_h=0.2, zoneout_c=0.1
    )
    t, b = x.shape[0], x.shape[1]
    xp = cell.input_proj(params, x)
    h_ref = scan_cell(cell, params, xp, mask, backend="scan")
    zh = jnp.full((t, b, cell.hidden), 1.0 - cell.zoneout_h, jnp.float32)
    zc = jnp.full((t, b, cell.hidden), 1.0 - cell.zoneout_c, jnp.float32)
    h_pal = pallas_zoneout_lstm(
        xp + params["b"], mask, zh, zc, params["wh"], cell.hidden,
        interpret=True,
    ) * mask
    np.testing.assert_allclose(
        np.asarray(h_pal), np.asarray(h_ref), rtol=1e-5, atol=1e-5
    )


def test_zoneout_train_bit_identical_masks():
    """Stochastic zoneout through scan_cell: the pallas path draws its
    bernoulli mix with the scan path's exact key-split schedule, so under
    one PRNG key the two backends must agree to float tolerance."""
    cell, params, x, mask = _setup(
        ZoneoutLSTMCell, seed=2, zoneout_h=0.3, zoneout_c=0.2
    )
    xp = cell.input_proj(params, x)
    key = jax.random.PRNGKey(42)
    h_ref = scan_cell(
        cell, params, xp, mask, key=key, train=True, backend="scan"
    )
    h_pal = scan_cell(
        cell, params, xp, mask, key=key, train=True, backend="pallas"
    )
    np.testing.assert_allclose(
        np.asarray(h_pal), np.asarray(h_ref), rtol=1e-5, atol=1e-5
    )
    # reversed direction draws the same keys over the flipped sequence
    h_ref_r = scan_cell(
        cell, params, xp, mask, key=key, train=True, backend="scan",
        reverse=True,
    )
    h_pal_r = scan_cell(
        cell, params, xp, mask, key=key, train=True, backend="pallas",
        reverse=True,
    )
    np.testing.assert_allclose(
        np.asarray(h_pal_r), np.asarray(h_ref_r), rtol=1e-5, atol=1e-5
    )


def test_zoneout_train_grads_match_scan(monkeypatch):
    from asr_study_tpu.ops import pallas_lstm as lstm_mod

    monkeypatch.setattr(lstm_mod, "_CHUNK", 5)
    monkeypatch.setattr(lstm_mod, "_CHUNK_BWD", 5)
    cell, params, x, mask = _setup(
        ZoneoutLSTMCell, seed=3, zoneout_h=0.25, zoneout_c=0.15
    )
    xp = cell.input_proj(params, x)
    key = jax.random.PRNGKey(7)

    def loss(backend):
        def f(xp_in, wh):
            p = dict(params, wh=wh)
            h = scan_cell(
                cell, p, xp_in, mask, key=key, train=True, backend=backend
            )
            return jnp.sum(h ** 2)
        return f

    v_pal, g_pal = jax.value_and_grad(loss("pallas"), argnums=(0, 1))(
        xp, params["wh"]
    )
    v_ref, g_ref = jax.value_and_grad(loss("scan"), argnums=(0, 1))(
        xp, params["wh"]
    )
    np.testing.assert_allclose(float(v_pal), float(v_ref), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(g_pal[0]), np.asarray(g_ref[0]), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(g_pal[1]), np.asarray(g_ref[1]), rtol=1e-4, atol=1e-5
    )


def test_zoneout_model_integration(monkeypatch):
    """zoneout_blstm zoo model, eval mode, through both backends."""
    from asr_study_tpu.models import rnn as rnn_mod
    from asr_study_tpu.models.zoo import build_model

    model = build_model(
        "zoneout_blstm", {"num_hiddens": 8, "num_layers": 1}, num_classes=5
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


def test_zoneout_fused_bidi_train_parity(monkeypatch):
    """Bidirectional zoneout layer, train mode, via the FUSED bidi kernel
    (ops/pallas_bi_zoneout_lstm.py): must match the scan path bit-for-bit
    under one PRNG key (forward lane keys forward, backward lane keys on
    the reversed-scan schedule realigned to forward order)."""
    from asr_study_tpu.models import rnn as rnn_mod

    layer = rnn_mod.RNNLayer(
        "zoneout_lstm", 8, bidirectional=True,
        zoneout_h=0.3, zoneout_c=0.2,
    )
    params = layer.init(jax.random.PRNGKey(0), 6)
    t, b = 11, 4
    x = jax.random.normal(jax.random.PRNGKey(1), (t, b, 6))
    lengths = jnp.array([11, 7, 9, 5])
    mask = (jnp.arange(t)[:, None] < lengths[None, :]).astype(
        jnp.float32
    )[..., None]
    key = jax.random.PRNGKey(5)

    monkeypatch.setattr(rnn_mod, "RNN_BACKEND", "scan")
    out_scan = layer.apply(params, x, mask, key=key, train=True)
    monkeypatch.setattr(rnn_mod, "RNN_BACKEND", "pallas")
    monkeypatch.setenv("ASR_RNN_FUSED", "1")
    out_fused = layer.apply(params, x, mask, key=key, train=True)
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_scan), rtol=1e-5, atol=1e-5
    )
    # and the per-direction (unfused) kernels agree too
    monkeypatch.setenv("ASR_RNN_FUSED", "0")
    out_unfused = layer.apply(params, x, mask, key=key, train=True)
    np.testing.assert_allclose(
        np.asarray(out_unfused), np.asarray(out_scan), rtol=1e-5, atol=1e-5
    )


def test_zoneout_fused_bidi_grads(monkeypatch):
    from asr_study_tpu.models import rnn as rnn_mod

    layer = rnn_mod.RNNLayer(
        "zoneout_lstm", 8, bidirectional=True,
        zoneout_h=0.25, zoneout_c=0.15,
    )
    params = layer.init(jax.random.PRNGKey(2), 6)
    t, b = 9, 3
    x = jax.random.normal(jax.random.PRNGKey(3), (t, b, 6))
    lengths = jnp.array([9, 6, 4])
    mask = (jnp.arange(t)[:, None] < lengths[None, :]).astype(
        jnp.float32
    )[..., None]
    key = jax.random.PRNGKey(8)

    def loss(p):
        return jnp.sum(layer.apply(p, x, mask, key=key, train=True) ** 2)

    monkeypatch.setattr(rnn_mod, "RNN_BACKEND", "scan")
    g_scan = jax.grad(loss)(params)
    monkeypatch.setattr(rnn_mod, "RNN_BACKEND", "pallas")
    g_pal = jax.grad(loss)(params)
    flat_s, _ = jax.tree_util.tree_flatten(g_scan)
    flat_p, _ = jax.tree_util.tree_flatten(g_pal)
    for a, b_ in zip(flat_s, flat_p):
        np.testing.assert_allclose(
            np.asarray(b_), np.asarray(a), rtol=1e-4, atol=1e-5
        )


def test_mi_fused_bidi_grads(monkeypatch):
    """Fused bidi MI kernel gradients (incl. alpha/beta vectors) vs scan,
    at a non-128-aligned width so the gate-block padding is exercised."""
    from asr_study_tpu.models import rnn as rnn_mod

    layer = rnn_mod.RNNLayer("mi_lstm", 8, bidirectional=True)
    params = layer.init(jax.random.PRNGKey(4), 6)
    for d in ("fw", "bw"):
        for i, k in enumerate(("alpha", "beta1", "beta2")):
            params[d][k] = 1.0 + 0.2 * jax.random.normal(
                jax.random.PRNGKey(30 + i), params[d][k].shape
            )
    t, b = 9, 3
    x = jax.random.normal(jax.random.PRNGKey(5), (t, b, 6))
    lengths = jnp.array([9, 6, 4])
    mask = (jnp.arange(t)[:, None] < lengths[None, :]).astype(
        jnp.float32
    )[..., None]

    def loss(p):
        return jnp.sum(layer.apply(p, x, mask) ** 2)

    monkeypatch.setattr(rnn_mod, "RNN_BACKEND", "scan")
    v_scan, g_scan = jax.value_and_grad(loss)(params)
    monkeypatch.setattr(rnn_mod, "RNN_BACKEND", "pallas")
    v_pal, g_pal = jax.value_and_grad(loss)(params)
    np.testing.assert_allclose(float(v_pal), float(v_scan), rtol=1e-5)
    flat_s, _ = jax.tree_util.tree_flatten(g_scan)
    flat_p, _ = jax.tree_util.tree_flatten(g_pal)
    for a, b_ in zip(flat_s, flat_p):
        np.testing.assert_allclose(
            np.asarray(b_), np.asarray(a), rtol=1e-4, atol=1e-5
        )


def test_mi_zoneout_bf16_weights(monkeypatch):
    """Mixed precision (bf16 wh, f32 everything else — the Trainer's
    compute_dtype path) must run through both new kernel families with
    finite grads and bf16 weight cotangents, matching scan numerics
    loosely."""
    from asr_study_tpu.models import rnn as rnn_mod

    for kind in ("mi_lstm", "zoneout_lstm"):
        layer = rnn_mod.RNNLayer(kind, 8, bidirectional=True)
        params = layer.init(jax.random.PRNGKey(0), 6)
        for d in ("fw", "bw"):
            params[d]["wh"] = params[d]["wh"].astype(jnp.bfloat16)
        t, b = 9, 3
        x = jax.random.normal(jax.random.PRNGKey(1), (t, b, 6))
        lengths = jnp.array([9, 6, 4])
        mask = (jnp.arange(t)[:, None] < lengths[None, :]).astype(
            jnp.float32
        )[..., None]

        def loss(p):
            return jnp.sum(layer.apply(p, x, mask) ** 2)

        monkeypatch.setattr(rnn_mod, "RNN_BACKEND", "pallas")
        for fused in ("1", "0"):
            monkeypatch.setenv("ASR_RNN_FUSED", fused)
            v, g = jax.value_and_grad(loss)(params)
            assert np.isfinite(float(v)), (kind, fused)
            assert g["fw"]["wh"].dtype == jnp.bfloat16
            for leaf in jax.tree_util.tree_leaves(g):
                assert np.all(
                    np.isfinite(np.asarray(leaf, np.float32))
                ), (kind, fused)
