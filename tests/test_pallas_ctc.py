"""Pallas CTC kernels (interpret mode) vs the lax.scan CTC.

The scan path is itself validated against optax and brute-force path
enumeration (tests/test_ctc.py), so scan-parity here chains to the
ground-truth oracle.  The backward pass is the analytic beta recursion —
NOT autodiff of the forward — so gradient parity is the critical check.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from asr_study_tpu.ops import ctc


def _rand_case(seed, b=4, t=14, v=6, l_max=4, min_len=None):
    rng = np.random.default_rng(seed)
    logits = jnp.asarray(rng.normal(size=(b, t, v)).astype(np.float32))
    lengths = jnp.asarray(
        rng.integers(min_len or t // 2, t + 1, size=(b,)).astype(np.int32)
    )
    # repeated labels included (exercises the skip rule)
    labels = jnp.asarray(
        rng.integers(0, v - 1, size=(b, l_max)).astype(np.int32)
    )
    lab_lens = jnp.asarray(
        rng.integers(1, l_max + 1, size=(b,)).astype(np.int32)
    )
    return logits, lengths, labels, lab_lens


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_loss_matches_scan(seed):
    logits, lengths, labels, lab_lens = _rand_case(seed)
    ref = ctc.ctc_loss(logits, lengths, labels, lab_lens, backend="scan")
    pal = ctc.ctc_loss(logits, lengths, labels, lab_lens,
                       backend="pallas")
    np.testing.assert_allclose(
        np.asarray(pal), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("seed", [3, 4])
def test_grads_match_scan(seed):
    logits, lengths, labels, lab_lens = _rand_case(seed)

    def loss(backend):
        def f(lg):
            return jnp.sum(
                ctc.ctc_loss(lg, lengths, labels, lab_lens,
                             backend=backend)
            )
        return f

    g_ref = jax.grad(loss("scan"))(logits)
    g_pal = jax.grad(loss("pallas"))(logits)
    np.testing.assert_allclose(
        np.asarray(g_pal), np.asarray(g_ref), rtol=1e-4, atol=1e-5
    )


def test_grads_weighted_mean_and_repeats():
    """ctc_loss_mean with zero-weight padding rows + heavy label repeats
    (the skip-rule-off path) through the pallas backend."""
    rng = np.random.default_rng(7)
    b, t, v, l_max = 4, 16, 5, 5
    logits = jnp.asarray(rng.normal(size=(b, t, v)).astype(np.float32))
    lengths = jnp.asarray([16, 12, 14, 9], jnp.int32)
    labels = jnp.asarray(
        [[1, 1, 1, 2, 2], [0, 0, 3, 3, 0], [2, 2, 2, 2, 2],
         [1, 2, 3, 0, 1]], jnp.int32
    )
    lab_lens = jnp.asarray([5, 5, 5, 4], jnp.int32)
    weights = jnp.asarray([1.0, 1.0, 0.0, 1.0], jnp.float32)

    def mean_loss(backend):
        def f(lg):
            per = ctc.ctc_loss(lg, lengths, labels, lab_lens,
                               backend=backend)
            return jnp.sum(per * weights) / jnp.sum(weights)
        return f

    v_ref, g_ref = jax.value_and_grad(mean_loss("scan"))(logits)
    v_pal, g_pal = jax.value_and_grad(mean_loss("pallas"))(logits)
    np.testing.assert_allclose(float(v_pal), float(v_ref), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(g_pal), np.asarray(g_ref), rtol=1e-4, atol=1e-5
    )
    # the zero-weight row's grad must be exactly zero through both paths
    assert np.abs(np.asarray(g_pal[2])).max() == 0.0


def test_empty_and_infeasible_labels():
    """L=0 rows and infeasible rows (2L+1 > T after repeats): loss parity
    and finite (clamp-zeroed) grads."""
    rng = np.random.default_rng(9)
    b, t, v = 3, 6, 4
    logits = jnp.asarray(rng.normal(size=(b, t, v)).astype(np.float32))
    lengths = jnp.asarray([6, 6, 4], jnp.int32)
    labels = jnp.asarray(
        [[0, 0, 0], [1, 2, 1], [2, 2, 2]], jnp.int32
    )
    # row 0: L=0; row 2: repeats need 2L+1 + repeat-gaps > T -> infeasible
    lab_lens = jnp.asarray([0, 3, 3], jnp.int32)

    ref = ctc.ctc_loss(logits, lengths, labels, lab_lens, backend="scan")
    pal = ctc.ctc_loss(logits, lengths, labels, lab_lens,
                       backend="pallas")
    np.testing.assert_allclose(
        np.asarray(pal), np.asarray(ref), rtol=1e-5, atol=1e-2
    )

    g = jax.grad(
        lambda lg: jnp.sum(
            ctc.ctc_loss(lg, lengths, labels, lab_lens, backend="pallas")
        )
    )(logits)
    assert np.all(np.isfinite(np.asarray(g)))
    # infeasible row: grads zeroed (the scan path zeroes via its clamp)
    assert np.abs(np.asarray(g[2])).max() == 0.0


def test_full_length_no_padding():
    """All frames valid, max labels — exercises t_pad == T and the last
    lattice state landing exactly at s_real - 1."""
    rng = np.random.default_rng(11)
    b, t, v, l_max = 2, 8, 4, 3
    logits = jnp.asarray(rng.normal(size=(b, t, v)).astype(np.float32))
    lengths = jnp.full((b,), t, jnp.int32)
    labels = jnp.asarray([[0, 1, 2], [2, 1, 0]], jnp.int32)
    lab_lens = jnp.full((b,), l_max, jnp.int32)

    for fn in (
        lambda lg, bk: jnp.sum(
            ctc.ctc_loss(lg, lengths, labels, lab_lens, backend=bk)
        ),
    ):
        v_ref, g_ref = jax.value_and_grad(lambda lg: fn(lg, "scan"))(logits)
        v_pal, g_pal = jax.value_and_grad(lambda lg: fn(lg, "pallas"))(
            logits
        )
        np.testing.assert_allclose(float(v_pal), float(v_ref), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(g_pal), np.asarray(g_ref), rtol=1e-4, atol=1e-5
        )


def test_multi_chunk_time(monkeypatch):
    """T spanning several grid chunks with a padded tail (the reverse-walk
    chunk-boundary carry is the bug class)."""
    from asr_study_tpu.ops import pallas_ctc as pc

    monkeypatch.setattr(pc, "_CHUNK", 5)     # T=14 -> 5+5+5(pad 1)
    logits, lengths, labels, lab_lens = _rand_case(13, t=14)

    def loss(backend):
        def f(lg):
            return jnp.sum(
                ctc.ctc_loss(lg, lengths, labels, lab_lens,
                             backend=backend)
            )
        return f

    v_ref, g_ref = jax.value_and_grad(loss("scan"))(logits)
    v_pal, g_pal = jax.value_and_grad(loss("pallas"))(logits)
    np.testing.assert_allclose(float(v_pal), float(v_ref), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(g_pal), np.asarray(g_ref), rtol=1e-4, atol=1e-5
    )
