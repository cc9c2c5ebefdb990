"""Model-layer tests. The load-bearing one is padding invariance: logits
inside the true length must not depend on padded-tail content or on the
padded length — this is what makes BLSTM-over-padded-batches exact
(SURVEY.md §7 hard-part 3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from asr_study_tpu.models import build_model
from asr_study_tpu.models.cells import make_cell
from asr_study_tpu.models.rnn import RNNLayer, StackedRNN
from asr_study_tpu.utils.registry import ls_registry

ZOO = [
    "graves2006",
    "deep_blstm",
    "deep_gru",
    "ln_blstm",
    "zoneout_blstm",
    "mi_blstm",
    "highway_blstm",
    "residual_blstm",
    "deep_speech",
]
SMALL = "num_hiddens=16,num_layers=2"


def _batch(b=2, t=12, f=8, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((b, t, f)).astype(np.float32)
    lengths = np.array([t, t - 5][:b], dtype=np.int32)
    return jnp.asarray(x), jnp.asarray(lengths)


def test_zoo_registry_complete():
    assert set(ZOO) <= set(ls_registry("model"))


@pytest.mark.parametrize("name", ZOO)
def test_zoo_shapes(name):
    model = build_model(name, SMALL, num_classes=27)
    x, lengths = _batch()
    params = model.init(jax.random.PRNGKey(0), x.shape[-1])
    logits = model.apply(params, x, lengths)
    assert logits.shape == (2, 12, 28)
    assert jnp.isfinite(logits).all()


@pytest.mark.parametrize("name", ["deep_blstm", "deep_gru", "ln_blstm",
                                  "highway_blstm", "mi_blstm"])
def test_padding_invariance(name):
    """Same utterance, different pad lengths / pad garbage -> same logits."""
    model = build_model(name, SMALL, num_classes=27)
    rng = np.random.default_rng(3)
    t_true, f = 9, 8
    x_core = rng.standard_normal((1, t_true, f)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(1), f)

    def run(pad_to, pad_fill):
        x = np.full((1, pad_to, f), pad_fill, dtype=np.float32)
        x[:, :t_true] = x_core
        return model.apply(params, jnp.asarray(x), jnp.asarray([t_true]))

    a = run(16, 0.0)[0, :t_true]
    b = run(24, 123.0)[0, :t_true]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5)


def test_unidirectional_causality():
    layer = RNNLayer("lstm", 16, bidirectional=False)
    params = layer.init(jax.random.PRNGKey(0), 8)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((20, 1, 8)).astype(np.float32)
    mask = np.ones((20, 1, 1), np.float32)
    out1 = layer.apply(params, jnp.asarray(x), jnp.asarray(mask))
    x2 = x.copy()
    x2[10:] += 5.0  # change the future
    out2 = layer.apply(params, jnp.asarray(x2), jnp.asarray(mask))
    np.testing.assert_allclose(out1[:10], out2[:10], atol=1e-6)
    assert not np.allclose(out1[10:], out2[10:])


def test_bidirectional_uses_future():
    layer = RNNLayer("lstm", 16, bidirectional=True)
    params = layer.init(jax.random.PRNGKey(0), 8)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((20, 1, 8)).astype(np.float32)
    mask = np.ones((20, 1, 1), np.float32)
    out1 = layer.apply(params, jnp.asarray(x), jnp.asarray(mask))
    x2 = x.copy()
    x2[15:] += 5.0
    out2 = layer.apply(params, jnp.asarray(x2), jnp.asarray(mask))
    # early outputs DO change (backward direction saw the future)
    assert not np.allclose(out1[:5], out2[:5])


@pytest.mark.parametrize("kind", ["lstm", "gru", "ln_lstm", "mi_lstm"])
def test_cell_step_shapes(kind):
    cell = make_cell(kind, 16)
    params = cell.init(jax.random.PRNGKey(0), 8)
    carry = cell.init_carry(4)
    x = jnp.ones((4, 8))
    xp = cell.input_proj(params, x)
    assert xp.shape == (4, cell.num_gates * 16)
    carry2, out = cell.step(params, carry, xp, jnp.ones((4, 1)))
    assert out.shape == (4, 16)
    for c1, c2 in zip(carry, carry2):
        assert c1.shape == c2.shape


def test_carry_hold_on_mask():
    cell = make_cell("lstm", 8)
    params = cell.init(jax.random.PRNGKey(0), 4)
    carry = cell.init_carry(2)
    xp = cell.input_proj(params, jnp.ones((2, 4)))
    carry2, out = cell.step(params, carry, xp, jnp.asarray([[1.0], [0.0]]))
    # row 1 masked: carry unchanged, output = previous h (zeros)
    assert not np.allclose(carry2[0][0], 0.0)
    np.testing.assert_array_equal(np.asarray(carry2[0][1]), 0.0)
    np.testing.assert_array_equal(np.asarray(carry2[1][1]), 0.0)


def test_zoneout_train_vs_eval():
    model = build_model("zoneout_blstm", SMALL, num_classes=27)
    x, lengths = _batch()
    params = model.init(jax.random.PRNGKey(0), x.shape[-1])
    e1 = model.apply(params, x, lengths, train=False)
    e2 = model.apply(params, x, lengths, train=False)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))  # eval deterministic
    t1 = model.apply(params, x, lengths, train=True, rng=jax.random.PRNGKey(1))
    t2 = model.apply(params, x, lengths, train=True, rng=jax.random.PRNGKey(2))
    assert not np.allclose(t1, t2)  # train stochastic


def test_dropout_train_only():
    model = build_model("deep_blstm", SMALL + ",dropout=0.5", num_classes=27)
    x, lengths = _batch()
    params = model.init(jax.random.PRNGKey(0), x.shape[-1])
    t1 = model.apply(params, x, lengths, train=True, rng=jax.random.PRNGKey(1))
    t2 = model.apply(params, x, lengths, train=True, rng=jax.random.PRNGKey(2))
    assert not np.allclose(t1, t2)


@pytest.mark.parametrize("skip", ["residual", "highway"])
def test_skip_connections_init_shapes(skip):
    stack = StackedRNN("lstm", hidden=8, num_layers=3, skip=skip)
    params = stack.init(jax.random.PRNGKey(0), 5)
    # first layer needs a projection (5 -> 16), later layers don't
    assert "proj" in params["layers"][0]
    assert "proj" not in params["layers"][1]
    x = jnp.ones((6, 2, 5))
    mask = jnp.ones((6, 2, 1))
    out = stack.apply(params, x, mask)
    assert out.shape == (6, 2, 16)


def test_grads_finite():
    model = build_model("deep_blstm", SMALL, num_classes=27)
    x, lengths = _batch()
    params = model.init(jax.random.PRNGKey(0), x.shape[-1])

    def loss_fn(p):
        return jnp.sum(model.apply(p, x, lengths) ** 2)

    grads = jax.grad(loss_fn)(params)
    for leaf in jax.tree_util.tree_leaves(grads):
        assert jnp.isfinite(leaf).all()


def test_jit_compiles():
    model = build_model("graves2006", "num_hiddens=16", num_classes=27)
    x, lengths = _batch()
    params = model.init(jax.random.PRNGKey(0), x.shape[-1])
    fn = jax.jit(lambda p, a, b: model.apply(p, a, b))
    out = fn(params, x, lengths)
    assert out.shape == (2, 12, 28)


def test_model_summary_counts():
    """summary() lists every leaf and its exact total (the reference
    printed keras model.summary() at train start)."""
    import jax

    from asr_study_tpu.models.zoo import build_model

    model = build_model(
        "graves2006", {"num_hiddens": 16}, num_classes=27
    )
    params = model.init(jax.random.PRNGKey(0), 13)
    s = model.summary(params)
    total = sum(x.size for x in jax.tree_util.tree_leaves(params))
    assert f"{total:,}" in s
    assert "graves2006" in s and "blank=27" in s
    assert len(s.splitlines()) == 2 + len(jax.tree_util.tree_leaves(params))
