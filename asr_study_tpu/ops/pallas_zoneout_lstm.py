"""Pallas TPU zoneout-LSTM scan (fwd + custom-VJP bwd).

The reference's zoneout variant [ref: core/layers.py] (Krueger et al.
2017) keeps each h/c unit at its previous value with probability z.  RNG
inside a Pallas kernel would diverge from the ``lax.scan`` oracle, so the
zoneout decisions are made OUTSIDE and streamed in as per-frame mix
coefficients ``zh, zc`` in [0, 1] ("weight of the new state"):

    train: bernoulli(1 - rate) samples in {0, 1} — drawn with the exact
           key-split schedule of the scan path (models/rnn.py), so the two
           backends are bit-identical under the same PRNG key;
    eval:  constant (1 - rate) — the deterministic interpolation.

Cell math is the plain LSTM (gate order i, f, g, o; bias folded into the
streamed xp) followed by ``h = zh*h_new + (1-zh)*h_prev`` (same for c),
then the frame-mask hold.  Streaming/chunking scheme and helpers are
shared with ops/pallas_lstm.py.  Mix coefficients are non-differentiable
inputs (bernoulli samples / constants): their cotangents are zero.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from asr_study_tpu.ops.pallas_lstm import (
    _CHUNK,
    _PREC,
    _budget_chunk,
    _bwd_chunk,
    _mm,
    _pad_time,
    _unroll_rows,
)


def _zo_cell_math(xp_t, zh_t, zc_t, h_prev, c_prev, m, wh_ref, hidden):
    gates = xp_t + _mm(h_prev, wh_ref)                  # [B, 4H]
    i = jax.nn.sigmoid(gates[:, 0 * hidden : 1 * hidden])
    f = jax.nn.sigmoid(gates[:, 1 * hidden : 2 * hidden])
    g = jnp.tanh(gates[:, 2 * hidden : 3 * hidden])
    o = jax.nn.sigmoid(gates[:, 3 * hidden : 4 * hidden])
    c_new = f * c_prev + i * g
    h_new = o * jnp.tanh(c_new)
    h = zh_t * h_new + (1.0 - zh_t) * h_prev
    c = zc_t * c_new + (1.0 - zc_t) * c_prev
    h = jnp.where(m > 0, h, h_prev)
    c = jnp.where(m > 0, c, c_prev)
    return h, c


def _fwd_kernel(xp_ref, mask_ref, zh_ref, zc_ref, wh_ref,
                h_out_ref, c_out_ref, h_scr, c_scr,
                *, hidden: int, chunk: int):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_scr[...] = jnp.zeros_like(h_scr)
        c_scr[...] = jnp.zeros_like(c_scr)

    def body(i, carry):
        h_prev, c_prev = carry
        h, c = _zo_cell_math(
            xp_ref[i], zh_ref[i], zc_ref[i], h_prev, c_prev,
            mask_ref[i], wh_ref, hidden,
        )
        h_out_ref[i] = h
        c_out_ref[i] = c
        return (h, c)

    h, c = jax.lax.fori_loop(0, chunk, body, (h_scr[...], c_scr[...]))
    h_scr[...] = h
    c_scr[...] = c


def _zo_row_bwd(i_row, dh_next, dc_next, xp_ref, mask_ref, zh_ref, zc_ref,
                hprev_ref, cprev_ref, dh_out_ref, wh_ref, wht_ref,
                dxp_ref, hidden: int):
    """Reverse-mode cell math for ONE row of the current block (shared by
    the uni- and bidirectional backward kernels).  The zoneout mix splits
    each incoming cotangent between the new state (through the gates) and
    a direct pass-through to the previous state; c_new/tanh(c_new) are
    recomputed from (xp, h_prev, c_prev) — the stored c sequence is
    post-mix and only feeds the c_prev chain."""
    h_prev = hprev_ref[i_row]
    c_prev = cprev_ref[i_row]
    m = mask_ref[i_row]
    zh = zh_ref[i_row]
    zc = zc_ref[i_row]

    gates = xp_ref[i_row] + _mm(h_prev, wh_ref)
    ii = jax.nn.sigmoid(gates[:, 0 * hidden : 1 * hidden])
    f = jax.nn.sigmoid(gates[:, 1 * hidden : 2 * hidden])
    g = jnp.tanh(gates[:, 2 * hidden : 3 * hidden])
    o = jax.nn.sigmoid(gates[:, 3 * hidden : 4 * hidden])
    c_new = f * c_prev + ii * g
    tc = jnp.tanh(c_new)

    dh = dh_out_ref[i_row] + dh_next
    # mix: h = zh*h_new + (1-zh)*h_prev (only on real frames)
    dh_new = dh * zh
    dh_pass = dh * (1.0 - zh)
    dc_new_mix = dc_next * zc
    dc_pass = dc_next * (1.0 - zc)

    do = dh_new * tc
    dc_new = dc_new_mix + dh_new * o * (1.0 - tc * tc)
    di = dc_new * g
    df = dc_new * c_prev
    dg = dc_new * ii
    dpre = jnp.concatenate(
        [
            di * ii * (1.0 - ii),
            df * f * (1.0 - f),
            dg * (1.0 - g * g),
            do * o * (1.0 - o),
        ],
        axis=-1,
    )
    dpre = jnp.where(m > 0, dpre, 0.0)
    dh_rec = _mm(dpre, wht_ref)
    dh_prev = jnp.where(m > 0, dh_rec + dh_pass, dh)
    dc_prev = jnp.where(m > 0, dc_new * f + dc_pass, dc_next)
    dxp_ref[i_row] = dpre
    return (dh_prev, dc_prev)


def _bwd_kernel(xp_ref, mask_ref, zh_ref, zc_ref, hprev_ref, cprev_ref,
                dh_out_ref, wh_ref, wht_ref, dxp_ref, dh_scr, dc_scr,
                *, hidden: int, chunk: int):
    """Time-reversed walk; rows descending inside each reversed block."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        dh_scr[...] = jnp.zeros_like(dh_scr)
        dc_scr[...] = jnp.zeros_like(dc_scr)

    def body(k, carry):
        dh_next, dc_next = carry
        return _zo_row_bwd(
            chunk - 1 - k, dh_next, dc_next, xp_ref, mask_ref, zh_ref,
            zc_ref, hprev_ref, cprev_ref, dh_out_ref, wh_ref, wht_ref,
            dxp_ref, hidden,
        )

    dh, dc = _unroll_rows(chunk, body, (dh_scr[...], dc_scr[...]))
    dh_scr[...] = dh
    dc_scr[...] = dc


def _fwd_call(xp, mask, zh, zc, wh, hidden: int, interpret: bool):
    t_steps, batch, gh = xp.shape
    # streamed per frame: xp [4H] + zh,zc [H] in; h,c [H] out
    chunk = _budget_chunk(
        _CHUNK, t_steps, batch * (gh + 4 * hidden) * 4
    )
    t_pad = -(-t_steps // chunk) * chunk
    xp_p = _pad_time(xp, t_pad)
    mask_p = _pad_time(mask, t_pad)
    zh_p = _pad_time(zh, t_pad)
    zc_p = _pad_time(zc, t_pad)

    blk_h = pl.BlockSpec((chunk, batch, hidden), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM)
    kernel = functools.partial(_fwd_kernel, hidden=hidden, chunk=chunk)
    h_seq, c_seq = pl.pallas_call(
        kernel,
        grid=(t_pad // chunk,),
        in_specs=[
            pl.BlockSpec((chunk, batch, gh), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, batch, 1), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            blk_h, blk_h,
            pl.BlockSpec((hidden, gh), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(blk_h, blk_h),
        out_shape=(
            jax.ShapeDtypeStruct((t_pad, batch, hidden), jnp.float32),
            jax.ShapeDtypeStruct((t_pad, batch, hidden), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((batch, hidden), jnp.float32),
            pltpu.VMEM((batch, hidden), jnp.float32),
        ],
        interpret=interpret,
    )(xp_p, mask_p, zh_p, zc_p, wh)
    return h_seq, c_seq


def _bwd_call(xp, mask, zh, zc, h_seq, c_seq, dh_out, wh, hidden: int,
              interpret: bool):
    t_steps, batch, gh = xp.shape
    t_pad = h_seq.shape[0]
    # streamed per frame: xp+dxp [4H ea] + zh/zc/hprev/cprev/dh_out [H ea]
    chunk = _bwd_chunk(t_pad, batch * (2 * gh + 5 * hidden) * 4)
    n_chunks = t_pad // chunk
    wht = wh.T
    xp_p = _pad_time(xp, t_pad)
    mask_p = _pad_time(mask, t_pad)
    zh_p = _pad_time(zh, t_pad)
    zc_p = _pad_time(zc, t_pad)
    dh_out_p = _pad_time(dh_out, t_pad)

    rev = lambda t: (n_chunks - 1 - t, 0, 0)         # noqa: E731
    blk_h = pl.BlockSpec((chunk, batch, hidden), rev,
                         memory_space=pltpu.VMEM)
    kernel = functools.partial(_bwd_kernel, hidden=hidden, chunk=chunk)
    zero = jnp.zeros((1, batch, hidden), jnp.float32)
    h_prev_seq = jnp.concatenate([zero, h_seq[:-1]], axis=0)
    c_prev_seq = jnp.concatenate([zero, c_seq[:-1]], axis=0)

    dxp = pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((chunk, batch, gh), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, batch, 1), rev, memory_space=pltpu.VMEM),
            blk_h, blk_h, blk_h, blk_h, blk_h,
            pl.BlockSpec((hidden, gh), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gh, hidden), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk, batch, gh), rev,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_pad, batch, gh), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((batch, hidden), jnp.float32),
            pltpu.VMEM((batch, hidden), jnp.float32),
        ],
        interpret=interpret,
    )(xp_p, mask_p, zh_p, zc_p, h_prev_seq, c_prev_seq, dh_out_p, wh, wht)
    return dxp[:t_steps], h_prev_seq[:t_steps]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def pallas_zoneout_lstm(xp, mask, zh, zc, wh, hidden: int,
                        interpret: bool = False):
    """Zoneout-LSTM scan over time.

    xp:     [T, B, 4H] float32 — x @ Wx + b, bias folded in
    mask:   [T, B, 1]  float32 — 1.0 on real frames
    zh, zc: [T, B, H]  float32 — "take new state" mix weights
            ({0,1} bernoulli at train, constant 1-rate at eval)
    wh:     [H, 4H]    recurrent weights
    ->      h_seq [T, B, H]
    """
    h_seq, _ = _fwd_call(xp, mask, zh, zc, wh, hidden, interpret)
    return h_seq[: xp.shape[0]]


def _zo_fwd(xp, mask, zh, zc, wh, hidden, interpret):
    h_seq, c_seq = _fwd_call(xp, mask, zh, zc, wh, hidden, interpret)
    return h_seq[: xp.shape[0]], (xp, mask, zh, zc, wh, h_seq, c_seq)


def _zo_bwd(hidden, interpret, res, dh_out):
    xp, mask, zh, zc, wh, h_seq, c_seq = res
    dxp, h_prev_seq = _bwd_call(
        xp, mask, zh, zc, h_seq, c_seq, dh_out, wh, hidden, interpret
    )
    dwh = jnp.einsum(
        "tbh,tbg->hg", h_prev_seq, dxp, precision=_PREC,
        preferred_element_type=jnp.float32,
    ).astype(wh.dtype)
    return (dxp.astype(xp.dtype), jnp.zeros_like(mask),
            jnp.zeros_like(zh), jnp.zeros_like(zc), dwh)


pallas_zoneout_lstm.defvjp(_zo_fwd, _zo_bwd)
