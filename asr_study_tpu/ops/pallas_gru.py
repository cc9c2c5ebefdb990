"""Pallas TPU GRU scan with custom-VJP backward — companion to
pallas_lstm.py (same design: state + W_hh resident in VMEM, xp streamed by
the BlockSpec pipeline, backward recomputes gates and emits per-step
pre-activation gradients; the weight gradient is one big XLA contraction).

Gate order r, z, n with ALL biases folded into xp (valid because
``n = tanh((xn + bn) + r * hn)`` — bn is additive inside the tanh).
Matches models/cells.py::GRUCell semantics including mask state-hold.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from asr_study_tpu.ops.pallas_lstm import (
    _CHUNK, _budget_chunk, _bwd_chunk, _mm, _pad_time, _unroll_rows,
)

_PREC = jax.lax.Precision.HIGHEST


def _gru_gates(xp_t, h_prev, wh_ref, hidden):
    hp = _mm(h_prev, wh_ref)
    xr = xp_t[:, 0 * hidden : 1 * hidden]
    xz = xp_t[:, 1 * hidden : 2 * hidden]
    xn = xp_t[:, 2 * hidden : 3 * hidden]
    hr = hp[:, 0 * hidden : 1 * hidden]
    hz = hp[:, 1 * hidden : 2 * hidden]
    hn = hp[:, 2 * hidden : 3 * hidden]
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    return r, z, n, hn


def _fwd_kernel(xp_ref, mask_ref, wh_ref, h_out_ref, h_scr,
                *, hidden: int, chunk: int):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_scr[...] = jnp.zeros_like(h_scr)

    def body(i, h_prev):
        r, z, n, _ = _gru_gates(xp_ref[i], h_prev, wh_ref, hidden)
        h = (1.0 - z) * n + z * h_prev
        m = mask_ref[i]
        h = jnp.where(m > 0, h, h_prev)
        h_out_ref[i] = h
        return h

    h_scr[...] = jax.lax.fori_loop(0, chunk, body, h_scr[...])


def _bwd_kernel(xp_ref, mask_ref, hprev_ref, dh_out_ref, wh_ref, wht_ref,
                dxp_ref, dhp_ref, dh_scr, *, hidden: int, chunk: int):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        dh_scr[...] = jnp.zeros_like(dh_scr)

    def body(k, dh_next):
        i = chunk - 1 - k
        h_prev = hprev_ref[i]
        m = mask_ref[i]
        r, z, n, hn = _gru_gates(xp_ref[i], h_prev, wh_ref, hidden)

        dh = dh_out_ref[i] + dh_next
        dz = dh * (h_prev - n)
        dn = dh * (1.0 - z)
        dpre_n = dn * (1.0 - n * n)
        dr = dpre_n * hn
        dpre_r = dr * r * (1.0 - r)
        dpre_z = dz * z * (1.0 - z)
        dxp = jnp.concatenate([dpre_r, dpre_z, dpre_n], axis=-1)
        dhp = jnp.concatenate([dpre_r, dpre_z, dpre_n * r], axis=-1)
        dxp = jnp.where(m > 0, dxp, 0.0)
        dhp = jnp.where(m > 0, dhp, 0.0)
        dh_rec = _mm(dhp, wht_ref)
        dh_prev = dh_rec + jnp.where(m > 0, dh * z, dh)
        dxp_ref[i] = dxp
        dhp_ref[i] = dhp
        return dh_prev

    dh_scr[...] = _unroll_rows(chunk, body, dh_scr[...])


def _fwd_call(xp, mask, wh, hidden: int, interpret: bool):
    t_steps, batch, gh = xp.shape
    chunk = _budget_chunk(_CHUNK, t_steps, batch * (gh + hidden) * 4)
    t_pad = -(-t_steps // chunk) * chunk
    xp_p = _pad_time(xp, t_pad)
    mask_p = _pad_time(mask, t_pad)
    kernel = functools.partial(_fwd_kernel, hidden=hidden, chunk=chunk)
    return pl.pallas_call(
        kernel,
        grid=(t_pad // chunk,),
        in_specs=[
            pl.BlockSpec((chunk, batch, gh), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, batch, 1), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, gh), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk, batch, hidden), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_pad, batch, hidden), jnp.float32),
        scratch_shapes=[pltpu.VMEM((batch, hidden), jnp.float32)],
        interpret=interpret,
    )(xp_p, mask_p, wh)


def _bwd_call(xp, mask, h_seq, dh_out, wh, hidden: int, interpret: bool):
    t_steps, batch, gh = xp.shape
    t_pad = h_seq.shape[0]
    # streamed per frame: xp+dxp+dhp [B, 3H] + hprev/dh_out [B, H]
    chunk = _bwd_chunk(t_pad, batch * (3 * gh + 2 * hidden) * 4)
    n_chunks = t_pad // chunk
    wht = wh.T
    xp_p = _pad_time(xp, t_pad)
    mask_p = _pad_time(mask, t_pad)
    dh_out_p = _pad_time(dh_out, t_pad)
    rev = lambda t: (n_chunks - 1 - t, 0, 0)         # noqa: E731
    kernel = functools.partial(_bwd_kernel, hidden=hidden, chunk=chunk)
    zero = jnp.zeros((1, batch, hidden), jnp.float32)
    h_prev_seq = jnp.concatenate([zero, h_seq[:-1]], axis=0)
    dxp, dhp = pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((chunk, batch, gh), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, batch, 1), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, batch, hidden), rev,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, batch, hidden), rev,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, gh), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gh, hidden), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((chunk, batch, gh), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, batch, gh), rev, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t_pad, batch, gh), jnp.float32),
            jax.ShapeDtypeStruct((t_pad, batch, gh), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((batch, hidden), jnp.float32)],
        interpret=interpret,
    )(xp_p, mask_p, h_prev_seq, dh_out_p, wh, wht)
    return dxp[:t_steps], dhp[:t_steps], h_prev_seq[:t_steps]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def pallas_gru(xp, mask, wh, hidden: int, interpret: bool = False):
    """GRU scan over time.

    xp:   [T, B, 3H] float32 — x @ Wx + b (all biases folded)
    mask: [T, B, 1]  float32 — 1.0 on real frames
    wh:   [H, 3H]    float32
    ->    h_seq [T, B, H]
    """
    return _fwd_call(xp, mask, wh, hidden, interpret)[: xp.shape[0]]


def _pallas_gru_fwd(xp, mask, wh, hidden, interpret):
    h_seq = _fwd_call(xp, mask, wh, hidden, interpret)
    # residuals stay time-padded for the chunked backward kernel
    return h_seq[: xp.shape[0]], (xp, mask, wh, h_seq)


def _pallas_gru_bwd(hidden, interpret, res, dh_out):
    xp, mask, wh, h_seq = res
    dxp, dhp, h_prev_seq = _bwd_call(
        xp, mask, h_seq, dh_out, wh, hidden, interpret
    )
    dwh = jnp.einsum(
        "tbh,tbg->hg", h_prev_seq, dhp, precision=_PREC,
        preferred_element_type=jnp.float32,
    ).astype(wh.dtype)
    return dxp.astype(xp.dtype), jnp.zeros_like(mask), dwh


pallas_gru.defvjp(_pallas_gru_fwd, _pallas_gru_bwd)
