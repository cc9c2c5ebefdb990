"""Pallas TPU multiplicative-integration LSTM scan (fwd + custom-VJP bwd).

The reference's MI variant [ref: core/layers.py] (Wu et al. 2016) computes
gate preactivations ``alpha * (Wx x) * (Wh h) + beta1 * (Wx x) +
beta2 * (Wh h) + b`` — the Hadamard term couples the input and recurrent
projections, so unlike the plain LSTM the bias/scale vectors CANNOT be
folded into the streamed input projection.  They ride along as resident
[1, 4H] rows in VMEM instead; the kernel's per-frame work stays one
[B, H] x [H, 4H] matmul plus VPU elementwise math.

Same streaming/chunking scheme as ops/pallas_lstm.py (whose helpers this
module reuses): xp blocks ride the BlockSpec pipeline, (h, c) and the
recurrent weights stay resident across the whole sequence.

Gate order i, f, g, o; masked frames hold state (models/cells.py
MILSTMCell is the parity oracle, tests/test_pallas_mi_lstm.py).
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


def _mi_pre(xp_t, hp, al_ref, b1_ref, b2_ref, b_ref):
    al = al_ref[0]
    return al * xp_t * hp + b1_ref[0] * xp_t + b2_ref[0] * hp + b_ref[0]


def _mi_cell_math(xp_t, h_prev, c_prev, m, wh_ref, al_ref, b1_ref, b2_ref,
                  b_ref, hidden):
    hp = _mm(h_prev, wh_ref)                            # [B, 4H]
    gates = _mi_pre(xp_t, hp, al_ref, b1_ref, b2_ref, b_ref)
    i = jax.nn.sigmoid(gates[:, 0 * hidden : 1 * hidden])
    f = jax.nn.sigmoid(gates[:, 1 * hidden : 2 * hidden])
    g = jnp.tanh(gates[:, 2 * hidden : 3 * hidden])
    o = jax.nn.sigmoid(gates[:, 3 * hidden : 4 * hidden])
    c = f * c_prev + i * g
    h = o * jnp.tanh(c)
    h = jnp.where(m > 0, h, h_prev)
    c = jnp.where(m > 0, c, c_prev)
    return h, c


def _fwd_kernel(xp_ref, mask_ref, wh_ref, al_ref, b1_ref, b2_ref, b_ref,
                h_out_ref, c_out_ref, h_scr, c_scr,
                *, hidden: int, chunk: int):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_scr[...] = jnp.zeros_like(h_scr)
        c_scr[...] = jnp.zeros_like(c_scr)

    def body(i, carry):
        h_prev, c_prev = carry
        h, c = _mi_cell_math(
            xp_ref[i], h_prev, c_prev, mask_ref[i], wh_ref,
            al_ref, b1_ref, b2_ref, b_ref, hidden,
        )
        h_out_ref[i] = h
        c_out_ref[i] = c
        return (h, c)

    h, c = jax.lax.fori_loop(0, chunk, body, (h_scr[...], c_scr[...]))
    h_scr[...] = h
    c_scr[...] = c


def _mi_row_bwd(i_row, dh_next, dc_next, xp_ref, mask_ref, hprev_ref,
                cprev_ref, c_ref, dh_out_ref, wh_ref, wht_ref,
                al_ref, b1_ref, b2_ref, b_ref, dpre_ref, hidden: int):
    """Reverse-mode cell math for ONE row of the current block (shared by
    the uni- and bidirectional backward kernels).  Emits dpre = dL/d(gate
    preactivations) — every parameter/input grad is a big contraction of
    dpre outside the kernel, except the sequential dh_prev chain handled
    here: dh_prev = (dpre * (alpha*xp + beta2)) @ Wh^T (the hp-side chain)
    plus the masked pass-through."""
    h_prev = hprev_ref[i_row]
    c_prev = cprev_ref[i_row]
    c_t = c_ref[i_row]
    m = mask_ref[i_row]
    xp_t = xp_ref[i_row]

    hp = _mm(h_prev, wh_ref)
    gates = _mi_pre(xp_t, hp, al_ref, b1_ref, b2_ref, b_ref)
    ii = jax.nn.sigmoid(gates[:, 0 * hidden : 1 * hidden])
    f = jax.nn.sigmoid(gates[:, 1 * hidden : 2 * hidden])
    g = jnp.tanh(gates[:, 2 * hidden : 3 * hidden])
    o = jax.nn.sigmoid(gates[:, 3 * hidden : 4 * hidden])

    dh = dh_out_ref[i_row] + dh_next
    tc = jnp.tanh(c_t)
    do = dh * tc
    dc = dc_next + dh * o * (1.0 - tc * tc)
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
    )
    dpre = jnp.where(m > 0, dpre, 0.0)
    dhp = dpre * (al_ref[0] * xp_t + b2_ref[0])         # d(gates)/d(hp)
    dh_rec = _mm(dhp, wht_ref)
    dh_prev = dh_rec + jnp.where(m > 0, 0.0, dh)
    # held frames: pass dc_next through, not dc (see pallas_lstm.py)
    dc_prev = jnp.where(m > 0, dc * f, dc_next)
    dpre_ref[i_row] = dpre
    return (dh_prev, dc_prev)


def _bwd_kernel(xp_ref, mask_ref, hprev_ref, cprev_ref, c_ref, dh_out_ref,
                wh_ref, wht_ref, al_ref, b1_ref, b2_ref, b_ref,
                dpre_ref, dh_scr, dc_scr, *, hidden: int, chunk: int):
    """Walks time backward (rows descending inside each reversed block)."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        dh_scr[...] = jnp.zeros_like(dh_scr)
        dc_scr[...] = jnp.zeros_like(dc_scr)

    def body(k, carry):
        dh_next, dc_next = carry
        return _mi_row_bwd(
            chunk - 1 - k, dh_next, dc_next, xp_ref, mask_ref, hprev_ref,
            cprev_ref, c_ref, dh_out_ref, wh_ref, wht_ref,
            al_ref, b1_ref, b2_ref, b_ref, dpre_ref, hidden,
        )

    dh, dc = _unroll_rows(chunk, body, (dh_scr[...], dc_scr[...]))
    dh_scr[...] = dh
    dc_scr[...] = dc


def _row(v):
    return v.reshape(1, -1).astype(jnp.float32)


def _fwd_call(xp, mask, wh, alpha, beta1, beta2, b, hidden: int,
              interpret: bool):
    t_steps, batch, gh = xp.shape
    chunk = _budget_chunk(_CHUNK, t_steps, batch * (gh + 2 * hidden) * 4)
    t_pad = -(-t_steps // chunk) * chunk
    xp_p = _pad_time(xp, t_pad)
    mask_p = _pad_time(mask, t_pad)

    vec = pl.BlockSpec((1, gh), lambda t: (0, 0), memory_space=pltpu.VMEM)
    kernel = functools.partial(_fwd_kernel, hidden=hidden, chunk=chunk)
    h_seq, c_seq = pl.pallas_call(
        kernel,
        grid=(t_pad // chunk,),
        in_specs=[
            pl.BlockSpec((chunk, batch, gh), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, batch, 1), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, gh), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            vec, vec, vec, vec,
        ],
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
    )(xp_p, mask_p, wh, _row(alpha), _row(beta1), _row(beta2), _row(b))
    return h_seq, c_seq


def _bwd_call(xp, mask, h_seq, c_seq, dh_out, wh, alpha, beta1, beta2, b,
              hidden: int, interpret: bool):
    t_steps, batch, gh = xp.shape
    t_pad = h_seq.shape[0]
    chunk = _bwd_chunk(t_pad, batch * (2 * gh + 4 * hidden) * 4)
    n_chunks = t_pad // chunk
    wht = wh.T
    xp_p = _pad_time(xp, t_pad)
    mask_p = _pad_time(mask, t_pad)
    dh_out_p = _pad_time(dh_out, t_pad)

    rev = lambda t: (n_chunks - 1 - t, 0, 0)         # noqa: E731
    vec = pl.BlockSpec((1, gh), lambda t: (0, 0), memory_space=pltpu.VMEM)
    kernel = functools.partial(_bwd_kernel, hidden=hidden, chunk=chunk)
    zero = jnp.zeros((1, batch, hidden), jnp.float32)
    h_prev_seq = jnp.concatenate([zero, h_seq[:-1]], axis=0)
    c_prev_seq = jnp.concatenate([zero, c_seq[:-1]], axis=0)

    dpre = pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((chunk, batch, gh), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, batch, 1), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, batch, hidden), rev,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, batch, hidden), rev,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, batch, hidden), rev,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, batch, hidden), rev,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, gh), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gh, hidden), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            vec, vec, vec, vec,
        ],
        out_specs=pl.BlockSpec((chunk, batch, gh), rev,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_pad, batch, gh), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((batch, hidden), jnp.float32),
            pltpu.VMEM((batch, hidden), jnp.float32),
        ],
        interpret=interpret,
    )(xp_p, mask_p, h_prev_seq, c_prev_seq, c_seq, dh_out_p, wh, wht,
      _row(alpha), _row(beta1), _row(beta2), _row(b))
    return dpre[:t_steps], h_prev_seq[:t_steps]


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def pallas_mi_lstm(xp, mask, wh, alpha, beta1, beta2, b, hidden: int,
                   interpret: bool = False):
    """MI-LSTM scan over time.

    xp:    [T, B, 4H] float32 — x @ Wx (NO bias folded: the MI Hadamard
           term needs the raw input projection)
    mask:  [T, B, 1]  float32 — 1.0 on real frames
    wh:    [H, 4H]    recurrent weights
    alpha, beta1, beta2, b: [4H] MI scale/bias vectors
    ->     h_seq [T, B, H]
    """
    h_seq, _ = _fwd_call(
        xp, mask, wh, alpha, beta1, beta2, b, hidden, interpret
    )
    return h_seq[: xp.shape[0]]


def _mi_fwd(xp, mask, wh, alpha, beta1, beta2, b, hidden, interpret):
    h_seq, c_seq = _fwd_call(
        xp, mask, wh, alpha, beta1, beta2, b, hidden, interpret
    )
    return h_seq[: xp.shape[0]], (xp, mask, wh, alpha, beta1, beta2, b,
                                  h_seq, c_seq)


def dir_grads(dpre, xp, h_prev_seq, wh, alpha, beta1, beta2):
    """Input/parameter grads from the kernel-emitted dpre, as big MXU/VPU
    contractions over the stored sequences (dpre is zero on masked frames,
    so the sums are mask-correct).  Shared by the uni- and bidirectional
    VJPs -> (dxp, dwh, dalpha, dbeta1, dbeta2, db [f32])."""
    hp_seq = jnp.einsum(
        "tbh,hg->tbg", h_prev_seq, wh, precision=_PREC,
        preferred_element_type=jnp.float32,
    )
    al = alpha.astype(jnp.float32)
    dxp = dpre * (al * hp_seq + beta1.astype(jnp.float32))
    dhp = dpre * (al * xp.astype(jnp.float32) + beta2.astype(jnp.float32))
    dwh = jnp.einsum(
        "tbh,tbg->hg", h_prev_seq, dhp, precision=_PREC,
        preferred_element_type=jnp.float32,
    ).astype(wh.dtype)
    xph = dpre * xp.astype(jnp.float32)
    dalpha = jnp.sum(xph * hp_seq, axis=(0, 1)).astype(alpha.dtype)
    dbeta1 = jnp.sum(xph, axis=(0, 1)).astype(beta1.dtype)
    dbeta2 = jnp.sum(dpre * hp_seq, axis=(0, 1)).astype(beta2.dtype)
    db = jnp.sum(dpre, axis=(0, 1))
    return dxp, dwh, dalpha, dbeta1, dbeta2, db


def _mi_bwd(hidden, interpret, res, dh_out):
    xp, mask, wh, alpha, beta1, beta2, b, h_seq, c_seq = res
    dpre, h_prev_seq = _bwd_call(
        xp, mask, h_seq, c_seq, dh_out, wh, alpha, beta1, beta2, b,
        hidden, interpret,
    )
    dxp, dwh, dalpha, dbeta1, dbeta2, db = dir_grads(
        dpre, xp, h_prev_seq, wh, alpha, beta1, beta2
    )
    return (dxp.astype(xp.dtype), jnp.zeros_like(mask), dwh,
            dalpha, dbeta1, dbeta2, db.astype(b.dtype))


pallas_mi_lstm.defvjp(_mi_fwd, _mi_bwd)
