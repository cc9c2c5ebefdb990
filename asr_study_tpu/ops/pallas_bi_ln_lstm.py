"""Fused bidirectional Pallas TPU layer-norm LSTM — companion to
pallas_bilstm.py / pallas_bigru.py, covering the reference's signature LN
cell [ref: core/layers.py LN variant]: both directions of an LN-BLSTM
layer in one kernel launch (reversed lane via BlockSpec index maps), with
a fused custom-VJP backward walking the two cotangent chains in opposite
time directions in one grid.

The LN math splits exactly as in pallas_ln_lstm.py: ``ln_x`` runs outside
(no recurrent dependence); the kernel does the per-frame recurrent matmul,
per-gate masked LN, gate nonlinearities and cell LN; parameter gradients
(wh, LN gains/biases) are big batched XLA contractions outside the kernel,
per direction (`_ln_param_grads`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from asr_study_tpu.ops import pallas_lstm as _base
from asr_study_tpu.ops.pallas_lstm import (
    _budget_chunk,
    _divisor_chunk,
    _pad_time,
    _unroll_rows,
)
from asr_study_tpu.ops.pallas_bilstm import _compiler_params, _fused_budget
from asr_study_tpu.ops.pallas_ln_lstm import (
    _ln_cell_fwd_math,
    _ln_param_grads,
    _ln_row_bwd,
)


def _bifwd_kernel(xpnf_ref, xpnb_ref, mf_ref, mb_ref,
                  whf_ref, whb_ref, ghf_ref, ghb_ref,
                  gcf_ref, gcb_ref, bcf_ref, bcb_ref,
                  hf_out, cf_out, hb_out, cb_out,
                  hf_scr, cf_scr, hb_scr, cb_scr,
                  *, hidden: int, h_real: int, chunk: int):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        hf_scr[...] = jnp.zeros_like(hf_scr)
        cf_scr[...] = jnp.zeros_like(cf_scr)
        hb_scr[...] = jnp.zeros_like(hb_scr)
        cb_scr[...] = jnp.zeros_like(cb_scr)

    def body(i, carry):
        hf, cf, hb, cb = carry
        hf, cf = _ln_cell_fwd_math(
            xpnf_ref[i], hf, cf, mf_ref[i],
            whf_ref, ghf_ref, gcf_ref, bcf_ref, hidden, h_real,
        )
        hf_out[i] = hf
        cf_out[i] = cf
        j = chunk - 1 - i
        hb, cb = _ln_cell_fwd_math(
            xpnb_ref[j], hb, cb, mb_ref[j],
            whb_ref, ghb_ref, gcb_ref, bcb_ref, hidden, h_real,
        )
        hb_out[j] = hb
        cb_out[j] = cb
        return (hf, cf, hb, cb)

    hf, cf, hb, cb = jax.lax.fori_loop(
        0, chunk, body,
        (hf_scr[...], cf_scr[...], hb_scr[...], cb_scr[...]),
    )
    hf_scr[...] = hf
    cf_scr[...] = cf
    hb_scr[...] = hb
    cb_scr[...] = cb


def _bibwd_kernel(xpnf_ref, xpnb_ref, mf_ref, mb_ref,
                  hprevf_ref, cprevf_ref, cf_ref, dhf_out_ref,
                  hprevb_ref, cprevb_ref, cb_ref, dhb_out_ref,
                  whf_ref, whft_ref, whb_ref, whbt_ref,
                  ghf_ref, ghb_ref, gcf_ref, gcb_ref, bcf_ref, bcb_ref,
                  dpref_ref, dcnf_ref, dpreb_ref, dcnb_ref,
                  dhf_scr, dcf_scr, dhb_scr, dcb_scr,
                  *, hidden: int, h_real: int, chunk: int):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        dhf_scr[...] = jnp.zeros_like(dhf_scr)
        dcf_scr[...] = jnp.zeros_like(dcf_scr)
        dhb_scr[...] = jnp.zeros_like(dhb_scr)
        dcb_scr[...] = jnp.zeros_like(dcb_scr)

    def body(k, carry):
        dhf, dcf, dhb, dcb = carry
        dhf, dcf = _ln_row_bwd(
            chunk - 1 - k, dhf, dcf, xpnf_ref, mf_ref, hprevf_ref,
            cprevf_ref, cf_ref, dhf_out_ref, whf_ref, whft_ref,
            ghf_ref, gcf_ref, bcf_ref, dpref_ref, dcnf_ref, hidden, h_real,
        )
        dhb, dcb = _ln_row_bwd(
            k, dhb, dcb, xpnb_ref, mb_ref, hprevb_ref,
            cprevb_ref, cb_ref, dhb_out_ref, whb_ref, whbt_ref,
            ghb_ref, gcb_ref, bcb_ref, dpreb_ref, dcnb_ref, hidden, h_real,
        )
        return (dhf, dcf, dhb, dcb)

    dhf, dcf, dhb, dcb = _unroll_rows(
        chunk, body,
        (dhf_scr[...], dcf_scr[...], dhb_scr[...], dcb_scr[...]),
    )
    dhf_scr[...] = dhf
    dcf_scr[...] = dcf
    dhb_scr[...] = dhb
    dcb_scr[...] = dcb


def _vec_spec(d: int):
    return pl.BlockSpec((1, d), lambda t: (0, 0), memory_space=pltpu.VMEM)


def _bifwd_call(xpn_f, xpn_b, mask, wh_f, wh_b, gh_f, gh_b, gc_f, gc_b,
                bc_f, bc_b, hidden, h_real, interpret):
    t_steps, batch, gh4 = xpn_f.shape
    chunk = _budget_chunk(
        _base._CHUNK, t_steps, 2 * batch * (gh4 + 2 * hidden) * 4,
        budget=_fused_budget(),
    )
    t_pad = -(-t_steps // chunk) * chunk
    n_chunks = t_pad // chunk
    xpnf_p = _pad_time(xpn_f, t_pad)
    xpnb_p = _pad_time(xpn_b, t_pad)
    mask_p = _pad_time(mask, t_pad)

    fwd = lambda t: (t, 0, 0)                        # noqa: E731
    rev = lambda t: (n_chunks - 1 - t, 0, 0)         # noqa: E731
    whm = lambda t: (0, 0)                           # noqa: E731

    kernel = functools.partial(
        _bifwd_kernel, hidden=hidden, h_real=h_real, chunk=chunk
    )
    return pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((chunk, batch, gh4), fwd, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, batch, gh4), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, batch, 1), fwd, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, batch, 1), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, gh4), whm, memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, gh4), whm, memory_space=pltpu.VMEM),
            _vec_spec(gh4), _vec_spec(gh4),
            _vec_spec(hidden), _vec_spec(hidden),
            _vec_spec(hidden), _vec_spec(hidden),
        ],
        out_specs=(
            pl.BlockSpec((chunk, batch, hidden), fwd,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, batch, hidden), fwd,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, batch, hidden), rev,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, batch, hidden), rev,
                         memory_space=pltpu.VMEM),
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((t_pad, batch, hidden), jnp.float32)
            for _ in range(4)
        ),
        scratch_shapes=[
            pltpu.VMEM((batch, hidden), jnp.float32) for _ in range(4)
        ],
        compiler_params=_compiler_params(interpret),
        interpret=interpret,
    )(
        xpnf_p, xpnb_p, mask_p, mask_p, wh_f, wh_b,
        gh_f[None, :], gh_b[None, :], gc_f[None, :], gc_b[None, :],
        bc_f[None, :], bc_b[None, :],
    )


def _bibwd_call(xpn_f, xpn_b, mask, h_f, c_f, h_b, c_b, dh_f, dh_b,
                wh_f, wh_b, gh_f, gh_b, gc_f, gc_b, bc_f, bc_b,
                hidden, h_real, interpret):
    t_steps, batch, gh4 = xpn_f.shape
    t_pad = h_f.shape[0]
    per_frame = 2 * batch * (2 * gh4 + 5 * hidden) * 4
    chunk = _divisor_chunk(t_pad, per_frame, 2 * _base._CHUNK_BWD,
                           budget=_fused_budget())
    n_chunks = t_pad // chunk

    xpnf_p = _pad_time(xpn_f, t_pad)
    xpnb_p = _pad_time(xpn_b, t_pad)
    mask_p = _pad_time(mask, t_pad)
    dhf_p = _pad_time(dh_f, t_pad)
    dhb_p = _pad_time(dh_b, t_pad)

    zero = jnp.zeros((1, batch, hidden), jnp.float32)
    h_prev_f = jnp.concatenate([zero, h_f[:-1]], axis=0)
    c_prev_f = jnp.concatenate([zero, c_f[:-1]], axis=0)
    h_prev_b = jnp.concatenate([h_b[1:], zero], axis=0)
    c_prev_b = jnp.concatenate([c_b[1:], zero], axis=0)

    fwd = lambda t: (t, 0, 0)                        # noqa: E731
    rev = lambda t: (n_chunks - 1 - t, 0, 0)         # noqa: E731
    whm = lambda t: (0, 0)                           # noqa: E731
    seq = lambda m: pl.BlockSpec(                    # noqa: E731
        (chunk, batch, hidden), m, memory_space=pltpu.VMEM
    )

    kernel = functools.partial(
        _bibwd_kernel, hidden=hidden, h_real=h_real, chunk=chunk
    )
    dpre_f, dcn_f, dpre_b, dcn_b = pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((chunk, batch, gh4), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, batch, gh4), fwd, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, batch, 1), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, batch, 1), fwd, memory_space=pltpu.VMEM),
            seq(rev), seq(rev), seq(rev), seq(rev),
            seq(fwd), seq(fwd), seq(fwd), seq(fwd),
            pl.BlockSpec((hidden, gh4), whm, memory_space=pltpu.VMEM),
            pl.BlockSpec((gh4, hidden), whm, memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, gh4), whm, memory_space=pltpu.VMEM),
            pl.BlockSpec((gh4, hidden), whm, memory_space=pltpu.VMEM),
            _vec_spec(gh4), _vec_spec(gh4),
            _vec_spec(hidden), _vec_spec(hidden),
            _vec_spec(hidden), _vec_spec(hidden),
        ],
        out_specs=(
            pl.BlockSpec((chunk, batch, gh4), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, batch, hidden), rev,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, batch, gh4), fwd, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, batch, hidden), fwd,
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t_pad, batch, gh4), jnp.float32),
            jax.ShapeDtypeStruct((t_pad, batch, hidden), jnp.float32),
            jax.ShapeDtypeStruct((t_pad, batch, gh4), jnp.float32),
            jax.ShapeDtypeStruct((t_pad, batch, hidden), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((batch, hidden), jnp.float32) for _ in range(4)
        ],
        compiler_params=_compiler_params(interpret),
        interpret=interpret,
    )(
        xpnf_p, xpnb_p, mask_p, mask_p,
        h_prev_f, c_prev_f, c_f, dhf_p,
        h_prev_b, c_prev_b, c_b, dhb_p,
        wh_f, wh_f.T, wh_b, wh_b.T,
        gh_f[None, :], gh_b[None, :], gc_f[None, :], gc_b[None, :],
        bc_f[None, :], bc_b[None, :],
    )
    return (
        dpre_f[:t_steps], dcn_f[:t_steps],
        dpre_b[:t_steps], dcn_b[:t_steps],
        h_prev_f[:t_steps], h_prev_b[:t_steps],
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12, 13))
def pallas_bi_ln_lstm(xpn_f, xpn_b, mask, wh_f, wh_b, gh_f, gh_b,
                      gc_f, gc_b, bc_f, bc_b,
                      hidden: int, h_real: int, interpret: bool = False):
    """Both directions of an LN-BLSTM layer in one fused kernel.

    Per-direction arguments follow pallas_ln_lstm.pallas_ln_lstm (xpn with
    ln_x applied and all additive constants folded; wh recurrent weights;
    gh/gc/bc the ln_h gain and ln_c gain/bias), both directions' xpn in
    FORWARD time order.  -> (h_f, h_b), each [T, B, H].
    """
    h_f, _, h_b, _ = _bifwd_call(
        xpn_f, xpn_b, mask, wh_f, wh_b, gh_f, gh_b, gc_f, gc_b,
        bc_f, bc_b, hidden, h_real, interpret,
    )
    t = xpn_f.shape[0]
    return h_f[:t], h_b[:t]


def _fwd(xpn_f, xpn_b, mask, wh_f, wh_b, gh_f, gh_b, gc_f, gc_b,
         bc_f, bc_b, hidden, h_real, interpret):
    h_f, c_f, h_b, c_b = _bifwd_call(
        xpn_f, xpn_b, mask, wh_f, wh_b, gh_f, gh_b, gc_f, gc_b,
        bc_f, bc_b, hidden, h_real, interpret,
    )
    t = xpn_f.shape[0]
    res = (xpn_f, xpn_b, mask, wh_f, wh_b, gh_f, gh_b, gc_f, gc_b,
           bc_f, bc_b, h_f, c_f, h_b, c_b)
    return (h_f[:t], h_b[:t]), res


def _bwd(hidden, h_real, interpret, res, cot):
    (xpn_f, xpn_b, mask, wh_f, wh_b, gh_f, gh_b, gc_f, gc_b,
     bc_f, bc_b, h_f, c_f, h_b, c_b) = res
    dh_f, dh_b = cot
    t_steps = xpn_f.shape[0]
    (dpre_f, dcn_f, dpre_b, dcn_b, h_prev_f, h_prev_b) = _bibwd_call(
        xpn_f, xpn_b, mask, h_f, c_f, h_b, c_b, dh_f, dh_b,
        wh_f, wh_b, gh_f, gh_b, gc_f, gc_b, bc_f, bc_b,
        hidden, h_real, interpret,
    )
    dwh_f, dgh_f, dgc_f, dbc_f = _ln_param_grads(
        dpre_f, dcn_f, h_prev_f, c_f[:t_steps], wh_f, gh_f, hidden, h_real
    )
    dwh_b, dgh_b, dgc_b, dbc_b = _ln_param_grads(
        dpre_b, dcn_b, h_prev_b, c_b[:t_steps], wh_b, gh_b, hidden, h_real
    )
    return (
        dpre_f.astype(xpn_f.dtype), dpre_b.astype(xpn_b.dtype),
        jnp.zeros_like(mask),
        dwh_f, dwh_b,
        dgh_f.astype(gh_f.dtype), dgh_b.astype(gh_b.dtype),
        dgc_f.astype(gc_f.dtype), dgc_b.astype(gc_b.dtype),
        dbc_f.astype(bc_f.dtype), dbc_b.astype(bc_b.dtype),
    )


pallas_bi_ln_lstm.defvjp(_fwd, _bwd)
