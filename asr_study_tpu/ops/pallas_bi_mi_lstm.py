"""Fused bidirectional Pallas TPU MI-LSTM: both directions of a
multiplicative-integration BLSTM layer in one kernel launch (fwd + fused
custom-VJP bwd).

Same fusion rationale and block-index-map scheme as ops/pallas_bilstm.py
(whose docstring has the full argument); the MI cell math and row-level
backward are shared with ops/pallas_mi_lstm.py.  Each direction carries
its own alpha/beta1/beta2/b vectors, resident in VMEM as [1, 4H] rows.

[ref: core/layers.py — the reference's MI variant inside Keras
Bidirectional wrappers.]
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from asr_study_tpu.ops import pallas_lstm as _base
from asr_study_tpu.ops.pallas_bilstm import _compiler_params, _fused_budget
from asr_study_tpu.ops.pallas_lstm import (
    _budget_chunk,
    _divisor_chunk,
    _pad_time,
    _unroll_rows,
)
from asr_study_tpu.ops.pallas_mi_lstm import (
    _mi_cell_math,
    _mi_row_bwd,
    _row,
    dir_grads,
)


def _bifwd_kernel(xpf_ref, xpb_ref, mf_ref, mb_ref, whf_ref, whb_ref,
                  alf_ref, b1f_ref, b2f_ref, bf_ref,
                  alb_ref, b1b_ref, b2b_ref, bb_ref,
                  hf_out, cf_out, hb_out, cb_out,
                  hf_scr, cf_scr, hb_scr, cb_scr,
                  *, hidden: int, chunk: int):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        hf_scr[...] = jnp.zeros_like(hf_scr)
        cf_scr[...] = jnp.zeros_like(cf_scr)
        hb_scr[...] = jnp.zeros_like(hb_scr)
        cb_scr[...] = jnp.zeros_like(cb_scr)

    def body(i, carry):
        hf, cf, hb, cb = carry
        hf, cf = _mi_cell_math(
            xpf_ref[i], hf, cf, mf_ref[i], whf_ref,
            alf_ref, b1f_ref, b2f_ref, bf_ref, hidden,
        )
        hf_out[i] = hf
        cf_out[i] = cf
        j = chunk - 1 - i
        hb, cb = _mi_cell_math(
            xpb_ref[j], hb, cb, mb_ref[j], whb_ref,
            alb_ref, b1b_ref, b2b_ref, bb_ref, hidden,
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


def _bibwd_kernel(xpf_ref, xpb_ref, mf_ref, mb_ref,
                  hprevf_ref, cprevf_ref, cf_ref, dhf_out_ref,
                  hprevb_ref, cprevb_ref, cb_ref, dhb_out_ref,
                  whf_ref, whft_ref, whb_ref, whbt_ref,
                  alf_ref, b1f_ref, b2f_ref, bf_ref,
                  alb_ref, b1b_ref, b2b_ref, bb_ref,
                  dpref_ref, dpreb_ref,
                  dhf_scr, dcf_scr, dhb_scr, dcb_scr,
                  *, hidden: int, chunk: int):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        dhf_scr[...] = jnp.zeros_like(dhf_scr)
        dcf_scr[...] = jnp.zeros_like(dcf_scr)
        dhb_scr[...] = jnp.zeros_like(dhb_scr)
        dcb_scr[...] = jnp.zeros_like(dcb_scr)

    def body(k, carry):
        dhf, dcf, dhb, dcb = carry
        dhf, dcf = _mi_row_bwd(
            chunk - 1 - k, dhf, dcf, xpf_ref, mf_ref, hprevf_ref,
            cprevf_ref, cf_ref, dhf_out_ref, whf_ref, whft_ref,
            alf_ref, b1f_ref, b2f_ref, bf_ref, dpref_ref, hidden,
        )
        dhb, dcb = _mi_row_bwd(
            k, dhb, dcb, xpb_ref, mb_ref, hprevb_ref,
            cprevb_ref, cb_ref, dhb_out_ref, whb_ref, whbt_ref,
            alb_ref, b1b_ref, b2b_ref, bb_ref, dpreb_ref, hidden,
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


def _bifwd_call(xp_f, xp_b, mask, wh_f, wh_b, vecs_f, vecs_b,
                hidden: int, interpret: bool):
    t_steps, batch, gh = xp_f.shape
    chunk = _budget_chunk(
        _base._CHUNK, t_steps, 2 * batch * (gh + 2 * hidden) * 4,
        budget=_fused_budget(),
    )
    t_pad = -(-t_steps // chunk) * chunk
    n_chunks = t_pad // chunk
    xpf_p = _pad_time(xp_f, t_pad)
    xpb_p = _pad_time(xp_b, t_pad)
    mask_p = _pad_time(mask, t_pad)

    fwd = lambda t: (t, 0, 0)                        # noqa: E731
    rev = lambda t: (n_chunks - 1 - t, 0, 0)         # noqa: E731
    whm = lambda t: (0, 0)                           # noqa: E731
    vec = pl.BlockSpec((1, gh), whm, memory_space=pltpu.VMEM)

    kernel = functools.partial(_bifwd_kernel, hidden=hidden, chunk=chunk)
    outs = pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((chunk, batch, gh), fwd, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, batch, gh), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, batch, 1), fwd, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, batch, 1), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, gh), whm, memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, gh), whm, memory_space=pltpu.VMEM),
            vec, vec, vec, vec, vec, vec, vec, vec,
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
    )(xpf_p, xpb_p, mask_p, mask_p, wh_f, wh_b,
      *[_row(v) for v in vecs_f], *[_row(v) for v in vecs_b])
    return outs


def _bibwd_call(xp_f, xp_b, mask, h_f, c_f, h_b, c_b, dh_f, dh_b,
                wh_f, wh_b, vecs_f, vecs_b, hidden: int, interpret: bool):
    t_steps, batch, gh = xp_f.shape
    t_pad = h_f.shape[0]
    per_frame = 2 * batch * (2 * gh + 4 * hidden) * 4
    chunk = _divisor_chunk(t_pad, per_frame, 2 * _base._CHUNK_BWD,
                           budget=_fused_budget())
    n_chunks = t_pad // chunk

    xpf_p = _pad_time(xp_f, t_pad)
    xpb_p = _pad_time(xp_b, t_pad)
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
    vec = pl.BlockSpec((1, gh), whm, memory_space=pltpu.VMEM)
    seq_spec = lambda m: pl.BlockSpec(               # noqa: E731
        (chunk, batch, hidden), m, memory_space=pltpu.VMEM
    )

    kernel = functools.partial(_bibwd_kernel, hidden=hidden, chunk=chunk)
    dpre_f, dpre_b = pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((chunk, batch, gh), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, batch, gh), fwd, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, batch, 1), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, batch, 1), fwd, memory_space=pltpu.VMEM),
            seq_spec(rev), seq_spec(rev), seq_spec(rev), seq_spec(rev),
            seq_spec(fwd), seq_spec(fwd), seq_spec(fwd), seq_spec(fwd),
            pl.BlockSpec((hidden, gh), whm, memory_space=pltpu.VMEM),
            pl.BlockSpec((gh, hidden), whm, memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, gh), whm, memory_space=pltpu.VMEM),
            pl.BlockSpec((gh, hidden), whm, memory_space=pltpu.VMEM),
            vec, vec, vec, vec, vec, vec, vec, vec,
        ],
        out_specs=(
            pl.BlockSpec((chunk, batch, gh), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, batch, gh), fwd, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t_pad, batch, gh), jnp.float32),
            jax.ShapeDtypeStruct((t_pad, batch, gh), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((batch, hidden), jnp.float32) for _ in range(4)
        ],
        compiler_params=_compiler_params(interpret),
        interpret=interpret,
    )(
        xpf_p, xpb_p, mask_p, mask_p,
        h_prev_f, c_prev_f, c_f, dhf_p,
        h_prev_b, c_prev_b, c_b, dhb_p,
        wh_f, wh_f.T, wh_b, wh_b.T,
        *[_row(v) for v in vecs_f], *[_row(v) for v in vecs_b],
    )
    return (
        dpre_f[:t_steps], dpre_b[:t_steps],
        h_prev_f[:t_steps], h_prev_b[:t_steps],
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14))
def pallas_bi_mi_lstm(xp_f, xp_b, mask, wh_f, wh_b,
                      alpha_f, beta1_f, beta2_f, b_f,
                      alpha_b, beta1_b, beta2_b, b_b,
                      hidden: int, interpret: bool = False):
    """Both directions of an MI-BLSTM layer in one fused kernel.

    xp_f/xp_b: [T, B, 4H] float32 — per-direction RAW input projections
               (no bias folded; both in forward time order)
    mask:      [T, B, 1]  float32 — 1.0 on real frames (padding trails)
    wh_f/wh_b: [H, 4H]    per-direction recurrent weights
    alpha_*/beta1_*/beta2_*/b_*: [4H] per-direction MI vectors
    ->         (h_f, h_b), each [T, B, H] in forward time order
    """
    vecs_f = (alpha_f, beta1_f, beta2_f, b_f)
    vecs_b = (alpha_b, beta1_b, beta2_b, b_b)
    h_f, _, h_b, _ = _bifwd_call(
        xp_f, xp_b, mask, wh_f, wh_b, vecs_f, vecs_b, hidden, interpret
    )
    t = xp_f.shape[0]
    return h_f[:t], h_b[:t]


def _bi_mi_fwd(xp_f, xp_b, mask, wh_f, wh_b,
               alpha_f, beta1_f, beta2_f, b_f,
               alpha_b, beta1_b, beta2_b, b_b, hidden, interpret):
    vecs_f = (alpha_f, beta1_f, beta2_f, b_f)
    vecs_b = (alpha_b, beta1_b, beta2_b, b_b)
    h_f, c_f, h_b, c_b = _bifwd_call(
        xp_f, xp_b, mask, wh_f, wh_b, vecs_f, vecs_b, hidden, interpret
    )
    t = xp_f.shape[0]
    return (h_f[:t], h_b[:t]), (xp_f, xp_b, mask, wh_f, wh_b,
                                vecs_f, vecs_b, h_f, c_f, h_b, c_b)


def _bi_mi_bwd(hidden, interpret, res, cot):
    (xp_f, xp_b, mask, wh_f, wh_b, vecs_f, vecs_b,
     h_f, c_f, h_b, c_b) = res
    dh_f, dh_b = cot
    dpre_f, dpre_b, h_prev_f, h_prev_b = _bibwd_call(
        xp_f, xp_b, mask, h_f, c_f, h_b, c_b, dh_f, dh_b,
        wh_f, wh_b, vecs_f, vecs_b, hidden, interpret,
    )
    dxp_f, dwh_f, dal_f, db1_f, db2_f, db_f = dir_grads(
        dpre_f, xp_f, h_prev_f, wh_f, *vecs_f[:3]
    )
    dxp_b, dwh_b, dal_b, db1_b, db2_b, db_b = dir_grads(
        dpre_b, xp_b, h_prev_b, wh_b, *vecs_b[:3]
    )
    return (
        dxp_f.astype(xp_f.dtype), dxp_b.astype(xp_b.dtype),
        jnp.zeros_like(mask), dwh_f, dwh_b,
        dal_f, db1_f, db2_f, db_f.astype(vecs_f[3].dtype),
        dal_b, db1_b, db2_b, db_b.astype(vecs_b[3].dtype),
    )


pallas_bi_mi_lstm.defvjp(_bi_mi_fwd, _bi_mi_bwd)
