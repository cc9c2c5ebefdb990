"""Pallas TPU layer-norm LSTM scan: the reference's signature LN cell
[ref: core/layers.py LN variant] as a fused kernel, fwd + custom-VJP bwd.

Same architecture as ops/pallas_lstm.py (chunked grid, state + weights
resident in VMEM, xp streamed), with the LN math arranged so the kernel
only does what is truly sequential:

- ``ln_x`` (LN of the input projections) has no recurrent dependence, so it
  is applied OUTSIDE over the whole [T, B, 4H] tensor in one fused XLA pass;
  the streamed ``xpn`` is ``blockwise_ln_x(xp) + b + ln_h.b`` (every additive
  constant folded in).
- In-kernel per frame: ``hp = h_prev @ wh``; per-gate masked LN of ``hp``
  times the ``ln_h`` gain; gate nonlinearities; cell update; LN of ``c``
  (gain+bias) before the output tanh — i.e. exactly
  models/cells.py::LayerNormLSTMCell.step.
- Backward: the kernel recomputes activations (cheaper than storing
  [T, B, 4H]) and streams out ``dpre`` (gate pre-activation cotangents) and
  ``dcn`` (cell-LN cotangents); every parameter gradient (wh, LN gains and
  biases) is then ONE big batched XLA contraction/reduction outside the
  kernel over the stored sequences.

Hidden widths that are not 128-lane aligned are zero-padded by the caller
(models/rnn.py); ``h_real`` carries the true width so LN statistics are
computed over real lanes only (padded lanes have zero gains/biases and
provably stay zero through the recurrence).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from asr_study_tpu.ops.pallas_lstm import (
    _CHUNK,
    _budget_chunk,
    _bwd_chunk,
    _mm,
    _pad_time,
    _unroll_rows,
)

_PREC = jax.lax.Precision.HIGHEST
_LN_EPS = 1e-5  # matches models/nn.py::layer_norm_apply


def _ln_stats(x, h_real: int, hidden: int):
    """Masked LN statistics over the last dim of ``x`` [..., hidden]:
    -> (xhat, rstd) using only the first ``h_real`` lanes (padded lanes
    contribute zero and receive xhat = 0 at lanes >= h_real... they receive
    (0 - mu) * rstd actually — callers multiply by zero-padded gains, so
    the value at padded lanes never matters downstream)."""
    if h_real == hidden:
        mu = jnp.mean(x, axis=-1, keepdims=True)
        d = x - mu
        var = jnp.mean(d * d, axis=-1, keepdims=True)
        rstd = jax.lax.rsqrt(var + _LN_EPS)
        return d * rstd, d, rstd
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    valid = lane < h_real
    xm = jnp.where(valid, x, 0.0)
    mu = jnp.sum(xm, axis=-1, keepdims=True) * (1.0 / h_real)
    d = jnp.where(valid, x - mu, 0.0)
    var = jnp.sum(d * d, axis=-1, keepdims=True) * (1.0 / h_real)
    rstd = jax.lax.rsqrt(var + _LN_EPS)
    return d * rstd, d, rstd


def _ln_bwd(dy_g, xhat, rstd, h_real: int):
    """Backward of ``y = xhat * g`` w.r.t. the pre-LN input given
    ``dy_g = dy * g``: dx = rstd * (dy_g - mean(dy_g) - xhat * mean(dy_g * xhat)),
    means over the ``h_real`` real lanes (dy_g and xhat are zero on padded
    lanes, so plain sums with a 1/h_real factor are exact)."""
    m1 = jnp.sum(dy_g, axis=-1, keepdims=True) * (1.0 / h_real)
    m2 = jnp.sum(dy_g * xhat, axis=-1, keepdims=True) * (1.0 / h_real)
    return rstd * (dy_g - m1 - xhat * m2)


def _gate_slices(hidden: int):
    return [slice(k * hidden, (k + 1) * hidden) for k in range(4)]


def _ln_cell_fwd_math(xpn_t, h_prev, c_prev, m, wh_ref, gh_ref, gc_ref,
                      bc_ref, hidden: int, h_real: int):
    hp = _mm(h_prev, wh_ref)                         # [B, 4H]
    gh = gh_ref[0, :]
    pre_parts = []
    for sl in _gate_slices(hidden):
        xhat, _, _ = _ln_stats(hp[:, sl], h_real, hidden)
        pre_parts.append(xpn_t[:, sl] + xhat * gh[sl])
    i = jax.nn.sigmoid(pre_parts[0])
    f = jax.nn.sigmoid(pre_parts[1])
    g = jnp.tanh(pre_parts[2])
    o = jax.nn.sigmoid(pre_parts[3])
    c = f * c_prev + i * g
    chat, _, _ = _ln_stats(c, h_real, hidden)
    h = o * jnp.tanh(chat * gc_ref[0, :] + bc_ref[0, :])
    h = jnp.where(m > 0, h, h_prev)
    c = jnp.where(m > 0, c, c_prev)
    return h, c


def _ln_fwd_kernel(xpn_ref, mask_ref, wh_ref, gh_ref, gc_ref, bc_ref,
                   h_out_ref, c_out_ref, h_scr, c_scr,
                   *, hidden: int, h_real: int, chunk: int):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_scr[...] = jnp.zeros_like(h_scr)
        c_scr[...] = jnp.zeros_like(c_scr)

    def body(i, carry):
        h_prev, c_prev = carry
        h, c = _ln_cell_fwd_math(
            xpn_ref[i], h_prev, c_prev, mask_ref[i],
            wh_ref, gh_ref, gc_ref, bc_ref, hidden, h_real,
        )
        h_out_ref[i] = h
        c_out_ref[i] = c
        return (h, c)

    h, c = jax.lax.fori_loop(0, chunk, body, (h_scr[...], c_scr[...]))
    h_scr[...] = h
    c_scr[...] = c


def _ln_row_bwd(i, dh_next, dc_next, xpn_ref, mask_ref, hprev_ref,
                cprev_ref, c_ref, dh_out_ref, wh_ref, wht_ref,
                gh_ref, gc_ref, bc_ref, dpre_ref, dcn_ref,
                hidden: int, h_real: int):
    """Reverse-mode LN-cell math for ONE row ``i`` of the current block
    (shared by the uni- and bidirectional backward kernels)."""
    h_prev = hprev_ref[i]
    c_prev = cprev_ref[i]
    c_t = c_ref[i]
    m = mask_ref[i]                               # [B, 1]
    gh = gh_ref[0, :]
    gc = gc_ref[0, :]

    # ---- recompute forward intermediates -------------------------
    hp = _mm(h_prev, wh_ref)
    xpn_t = xpn_ref[i]
    xhats = []
    rstds = []
    pre_parts = []
    for sl in _gate_slices(hidden):
        xhat, _, rstd = _ln_stats(hp[:, sl], h_real, hidden)
        xhats.append(xhat)
        rstds.append(rstd)
        pre_parts.append(xpn_t[:, sl] + xhat * gh[sl])
    ii = jax.nn.sigmoid(pre_parts[0])
    f = jax.nn.sigmoid(pre_parts[1])
    g = jnp.tanh(pre_parts[2])
    o = jax.nn.sigmoid(pre_parts[3])
    chat, _, rstd_c = _ln_stats(c_t, h_real, hidden)
    cn = chat * gc + bc_ref[0, :]
    tc = jnp.tanh(cn)

    # ---- backward -------------------------------------------------
    dh = dh_out_ref[i] + dh_next
    do = dh * tc
    dcn = dh * o * (1.0 - tc * tc)
    dc = dc_next + _ln_bwd(dcn * gc, chat, rstd_c, h_real)
    di = dc * g
    df = dc * c_prev
    dg = dc * ii
    dpre = jnp.concatenate(
        [
            di * ii * (1.0 - ii),
            df * f * (1.0 - f),
            dg * (1.0 - g * g),
            do * o * (1.0 - o),
        ],
        axis=-1,
    )                                             # [B, 4H]
    dpre = jnp.where(m > 0, dpre, 0.0)
    dcn = jnp.where(m > 0, dcn, 0.0)

    # recurrent path: LN backward per gate, then @ wh^T
    dhp_parts = [
        _ln_bwd(dpre[:, sl] * gh[sl], xhats[k2], rstds[k2], h_real)
        for k2, sl in enumerate(_gate_slices(hidden))
    ]
    dhp = jnp.concatenate(dhp_parts, axis=-1)
    dh_rec = _mm(dhp, wht_ref)
    dh_prev = dh_rec + jnp.where(m > 0, 0.0, dh)
    # held frames: pass dc_next through, not dc (see pallas_lstm.py)
    dc_prev = jnp.where(m > 0, dc * f, dc_next)
    dpre_ref[i] = dpre
    dcn_ref[i] = dcn
    return (dh_prev, dc_prev)


def _ln_bwd_kernel(xpn_ref, mask_ref, hprev_ref, cprev_ref, c_ref,
                   dh_out_ref, wh_ref, wht_ref, gh_ref, gc_ref, bc_ref,
                   dpre_ref, dcn_ref, dh_scr, dc_scr,
                   *, hidden: int, h_real: int, chunk: int):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        dh_scr[...] = jnp.zeros_like(dh_scr)
        dc_scr[...] = jnp.zeros_like(dc_scr)

    def body(k, carry):
        dh_next, dc_next = carry
        return _ln_row_bwd(
            chunk - 1 - k, dh_next, dc_next, xpn_ref, mask_ref, hprev_ref,
            cprev_ref, c_ref, dh_out_ref, wh_ref, wht_ref,
            gh_ref, gc_ref, bc_ref, dpre_ref, dcn_ref, hidden, h_real,
        )

    dh, dc = _unroll_rows(chunk, body, (dh_scr[...], dc_scr[...]))
    dh_scr[...] = dh
    dc_scr[...] = dc


def _vec_specs(hidden: int):
    """BlockSpecs for the resident [1, D] parameter vectors."""
    return [
        pl.BlockSpec((1, 4 * hidden), lambda t: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hidden), lambda t: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hidden), lambda t: (0, 0),
                     memory_space=pltpu.VMEM),
    ]


def _ln_fwd_call(xpn, mask, wh, gh, gc, bc, hidden, h_real, interpret):
    t_steps, batch, gh4 = xpn.shape
    chunk = _budget_chunk(_CHUNK, t_steps, batch * (gh4 + 2 * hidden) * 4)
    t_pad = -(-t_steps // chunk) * chunk
    xpn_p = _pad_time(xpn, t_pad)
    mask_p = _pad_time(mask, t_pad)

    kernel = functools.partial(
        _ln_fwd_kernel, hidden=hidden, h_real=h_real, chunk=chunk
    )
    h_seq, c_seq = pl.pallas_call(
        kernel,
        grid=(t_pad // chunk,),
        in_specs=[
            pl.BlockSpec((chunk, batch, gh4), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, batch, 1), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, gh4), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ] + _vec_specs(hidden),
        out_specs=(
            pl.BlockSpec((chunk, batch, hidden), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, batch, hidden), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t_pad, batch, hidden), jnp.float32),
            jax.ShapeDtypeStruct((t_pad, batch, hidden), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((batch, hidden), jnp.float32),
            pltpu.VMEM((batch, hidden), jnp.float32),
        ],
        interpret=interpret,
    )(xpn_p, mask_p, wh, gh[None, :], gc[None, :], bc[None, :])
    return h_seq, c_seq


def _ln_bwd_call(xpn, mask, h_seq, c_seq, dh_out, wh, gh, gc, bc,
                 hidden, h_real, interpret):
    t_steps, batch, gh4 = xpn.shape
    t_pad = h_seq.shape[0]
    chunk = _bwd_chunk(t_pad, batch * (2 * gh4 + 5 * hidden) * 4)
    n_chunks = t_pad // chunk
    wht = wh.T
    xpn_p = _pad_time(xpn, t_pad)
    mask_p = _pad_time(mask, t_pad)
    dh_out_p = _pad_time(dh_out, t_pad)

    rev = lambda t: (n_chunks - 1 - t, 0, 0)         # noqa: E731

    zero = jnp.zeros((1, batch, hidden), jnp.float32)
    h_prev_seq = jnp.concatenate([zero, h_seq[:-1]], axis=0)
    c_prev_seq = jnp.concatenate([zero, c_seq[:-1]], axis=0)

    kernel = functools.partial(
        _ln_bwd_kernel, hidden=hidden, h_real=h_real, chunk=chunk
    )
    dpre, dcn = pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((chunk, batch, gh4), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, batch, 1), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, batch, hidden), rev,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, batch, hidden), rev,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, batch, hidden), rev,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, batch, hidden), rev,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, gh4), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gh4, hidden), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ] + _vec_specs(hidden),
        out_specs=(
            pl.BlockSpec((chunk, batch, gh4), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, batch, hidden), rev,
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t_pad, batch, gh4), jnp.float32),
            jax.ShapeDtypeStruct((t_pad, batch, hidden), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((batch, hidden), jnp.float32),
            pltpu.VMEM((batch, hidden), jnp.float32),
        ],
        interpret=interpret,
    )(
        xpn_p, mask_p, h_prev_seq, c_prev_seq, c_seq, dh_out_p,
        wh, wht, gh[None, :], gc[None, :], bc[None, :],
    )
    return dpre[:t_steps], dcn[:t_steps], h_prev_seq


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def pallas_ln_lstm(xpn, mask, wh, gh, gc, bc, hidden: int, h_real: int,
                   interpret: bool = False):
    """Layer-norm LSTM scan over time.

    xpn:  [T, B, 4H] f32 — blockwise ln_x(x @ Wx) + b + ln_h.b (all
          additive constants folded; LN of the input side has no recurrent
          dependence so it runs outside as one fused XLA pass)
    mask: [T, B, 1]  f32 — 1.0 on real frames
    wh:   [H, 4H]    f32 — recurrent weights (H may be lane-padded;
          ``h_real`` is the true width for LN statistics)
    gh:   [4H] ln_h gain;  gc, bc: [H] ln_c gain/bias
    ->    h_seq [T, B, H]
    """
    h_seq, _ = _ln_fwd_call(
        xpn, mask, wh, gh, gc, bc, hidden, h_real, interpret
    )
    return h_seq[: xpn.shape[0]]


def _pallas_ln_lstm_fwd(xpn, mask, wh, gh, gc, bc, hidden, h_real,
                        interpret):
    h_seq, c_seq = _ln_fwd_call(
        xpn, mask, wh, gh, gc, bc, hidden, h_real, interpret
    )
    res = (xpn, mask, wh, gh, gc, bc, h_seq, c_seq)
    return h_seq[: xpn.shape[0]], res


def _ln_param_grads(dpre, dcn, h_prev_t, c_t, wh, gh, hidden, h_real):
    """Parameter grads as one batched XLA pass over the sequences (the
    kernel streams only dpre/dcn; everything else is recomputable with big
    MXU-friendly contractions out here).  -> (dwh, dgh, dgc, dbc)."""
    t_steps = dpre.shape[0]
    hp = jnp.einsum(
        "tbh,hg->tbg", h_prev_t, wh, precision=_PREC,
        preferred_element_type=jnp.float32,
    )
    gh4 = hp.shape[-1]
    hp_g = hp.reshape(t_steps, -1, 4, hidden)
    xhat_h, _, rstd_h = _ln_stats(hp_g, h_real, hidden)
    dpre_g = dpre.reshape(t_steps, -1, 4, hidden)
    dgh = jnp.sum(dpre_g * xhat_h, axis=(0, 1)).reshape(gh4)
    dhp = _ln_bwd(
        dpre_g * gh.reshape(4, hidden), xhat_h, rstd_h, h_real
    ).reshape(t_steps, -1, gh4)
    dwh = jnp.einsum(
        "tbh,tbg->hg", h_prev_t, dhp, precision=_PREC,
        preferred_element_type=jnp.float32,
    ).astype(wh.dtype)
    xhat_c, _, _ = _ln_stats(c_t, h_real, hidden)
    dgc = jnp.sum(dcn * xhat_c, axis=(0, 1))
    dbc = jnp.sum(dcn, axis=(0, 1))
    return dwh, dgh, dgc, dbc


def _pallas_ln_lstm_bwd(hidden, h_real, interpret, res, dh_out):
    xpn, mask, wh, gh, gc, bc, h_seq, c_seq = res
    t_steps = xpn.shape[0]
    dpre, dcn, h_prev_seq = _ln_bwd_call(
        xpn, mask, h_seq, c_seq, dh_out, wh, gh, gc, bc,
        hidden, h_real, interpret,
    )
    dwh, dgh, dgc, dbc = _ln_param_grads(
        dpre, dcn, h_prev_seq[:t_steps], c_seq[:t_steps], wh, gh,
        hidden, h_real,
    )
    dmask = jnp.zeros_like(mask)
    return (
        dpre.astype(xpn.dtype), dmask, dwh,
        dgh.astype(gh.dtype), dgc.astype(gc.dtype), dbc.astype(bc.dtype),
    )


pallas_ln_lstm.defvjp(_pallas_ln_lstm_fwd, _pallas_ln_lstm_bwd)
