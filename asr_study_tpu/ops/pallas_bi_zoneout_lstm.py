"""Fused bidirectional Pallas TPU zoneout-LSTM: both directions of a
zoneout BLSTM layer in one kernel launch (fwd + fused custom-VJP bwd).

Same fusion rationale and block-index-map scheme as ops/pallas_bilstm.py;
cell math and row-level backward shared with ops/pallas_zoneout_lstm.py.
Zoneout mix coefficients (``zh``/``zc`` per direction) arrive in FORWARD
time order for both lanes — the backward lane's reversal happens through
its BlockSpec index maps, exactly like its xp (models/rnn.py draws the
backward lane's bernoulli masks with the reversed-scan key schedule and
flips the KEY array, not the [T, B, H] masks, to keep them forward-
ordered without an HBM copy).

[ref: core/layers.py — the reference's zoneout variant inside Keras
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
    _PREC,
    _budget_chunk,
    _divisor_chunk,
    _pad_time,
    _unroll_rows,
)
from asr_study_tpu.ops.pallas_zoneout_lstm import (
    _zo_cell_math,
    _zo_row_bwd,
)


def _bifwd_kernel(xpf_ref, xpb_ref, mf_ref, mb_ref,
                  zhf_ref, zcf_ref, zhb_ref, zcb_ref,
                  whf_ref, whb_ref,
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
        hf, cf = _zo_cell_math(
            xpf_ref[i], zhf_ref[i], zcf_ref[i], hf, cf, mf_ref[i],
            whf_ref, hidden,
        )
        hf_out[i] = hf
        cf_out[i] = cf
        j = chunk - 1 - i
        hb, cb = _zo_cell_math(
            xpb_ref[j], zhb_ref[j], zcb_ref[j], hb, cb, mb_ref[j],
            whb_ref, hidden,
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
                  zhf_ref, zcf_ref, zhb_ref, zcb_ref,
                  hprevf_ref, cprevf_ref, dhf_out_ref,
                  hprevb_ref, cprevb_ref, dhb_out_ref,
                  whf_ref, whft_ref, whb_ref, whbt_ref,
                  dxpf_ref, dxpb_ref,
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
        dhf, dcf = _zo_row_bwd(
            chunk - 1 - k, dhf, dcf, xpf_ref, mf_ref, zhf_ref, zcf_ref,
            hprevf_ref, cprevf_ref, dhf_out_ref, whf_ref, whft_ref,
            dxpf_ref, hidden,
        )
        dhb, dcb = _zo_row_bwd(
            k, dhb, dcb, xpb_ref, mb_ref, zhb_ref, zcb_ref,
            hprevb_ref, cprevb_ref, dhb_out_ref, whb_ref, whbt_ref,
            dxpb_ref, hidden,
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


def _bifwd_call(xp_f, xp_b, mask, zh_f, zc_f, zh_b, zc_b, wh_f, wh_b,
                hidden: int, interpret: bool):
    t_steps, batch, gh = xp_f.shape
    # streamed per frame, both lanes: xp [4H] + zh,zc [H ea] in; h,c out
    chunk = _budget_chunk(
        _base._CHUNK, t_steps, 2 * batch * (gh + 4 * hidden) * 4,
        budget=_fused_budget(),
    )
    t_pad = -(-t_steps // chunk) * chunk
    n_chunks = t_pad // chunk
    xpf_p = _pad_time(xp_f, t_pad)
    xpb_p = _pad_time(xp_b, t_pad)
    mask_p = _pad_time(mask, t_pad)
    zhf_p = _pad_time(zh_f, t_pad)
    zcf_p = _pad_time(zc_f, t_pad)
    zhb_p = _pad_time(zh_b, t_pad)
    zcb_p = _pad_time(zc_b, t_pad)

    fwd = lambda t: (t, 0, 0)                        # noqa: E731
    rev = lambda t: (n_chunks - 1 - t, 0, 0)         # noqa: E731
    whm = lambda t: (0, 0)                           # noqa: E731
    seq_spec = lambda m: pl.BlockSpec(               # noqa: E731
        (chunk, batch, hidden), m, memory_space=pltpu.VMEM
    )

    kernel = functools.partial(_bifwd_kernel, hidden=hidden, chunk=chunk)
    outs = pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((chunk, batch, gh), fwd, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, batch, gh), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, batch, 1), fwd, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, batch, 1), rev, memory_space=pltpu.VMEM),
            seq_spec(fwd), seq_spec(fwd), seq_spec(rev), seq_spec(rev),
            pl.BlockSpec((hidden, gh), whm, memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, gh), whm, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            seq_spec(fwd), seq_spec(fwd), seq_spec(rev), seq_spec(rev),
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
    )(xpf_p, xpb_p, mask_p, mask_p, zhf_p, zcf_p, zhb_p, zcb_p,
      wh_f, wh_b)
    return outs


def _bibwd_call(xp_f, xp_b, mask, zh_f, zc_f, zh_b, zc_b,
                h_f, c_f, h_b, c_b, dh_f, dh_b, wh_f, wh_b,
                hidden: int, interpret: bool):
    t_steps, batch, gh = xp_f.shape
    t_pad = h_f.shape[0]
    per_frame = 2 * batch * (2 * gh + 5 * hidden) * 4
    chunk = _divisor_chunk(t_pad, per_frame, 2 * _base._CHUNK_BWD,
                           budget=_fused_budget())
    n_chunks = t_pad // chunk

    xpf_p = _pad_time(xp_f, t_pad)
    xpb_p = _pad_time(xp_b, t_pad)
    mask_p = _pad_time(mask, t_pad)
    zhf_p = _pad_time(zh_f, t_pad)
    zcf_p = _pad_time(zc_f, t_pad)
    zhb_p = _pad_time(zh_b, t_pad)
    zcb_p = _pad_time(zc_b, t_pad)
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
    seq_spec = lambda m: pl.BlockSpec(               # noqa: E731
        (chunk, batch, hidden), m, memory_space=pltpu.VMEM
    )

    kernel = functools.partial(_bibwd_kernel, hidden=hidden, chunk=chunk)
    dxp_f, dxp_b = pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((chunk, batch, gh), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, batch, gh), fwd, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, batch, 1), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, batch, 1), fwd, memory_space=pltpu.VMEM),
            seq_spec(rev), seq_spec(rev), seq_spec(fwd), seq_spec(fwd),
            seq_spec(rev), seq_spec(rev), seq_spec(rev),
            seq_spec(fwd), seq_spec(fwd), seq_spec(fwd),
            pl.BlockSpec((hidden, gh), whm, memory_space=pltpu.VMEM),
            pl.BlockSpec((gh, hidden), whm, memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, gh), whm, memory_space=pltpu.VMEM),
            pl.BlockSpec((gh, hidden), whm, memory_space=pltpu.VMEM),
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
        zhf_p, zcf_p, zhb_p, zcb_p,
        h_prev_f, c_prev_f, dhf_p,
        h_prev_b, c_prev_b, dhb_p,
        wh_f, wh_f.T, wh_b, wh_b.T,
    )
    return (
        dxp_f[:t_steps], dxp_b[:t_steps],
        h_prev_f[:t_steps], h_prev_b[:t_steps],
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def pallas_bi_zoneout_lstm(xp_f, xp_b, mask, zh_f, zc_f, zh_b, zc_b,
                           wh_f, wh_b, hidden: int,
                           interpret: bool = False):
    """Both directions of a zoneout BLSTM layer in one fused kernel.

    xp_f/xp_b:   [T, B, 4H] float32 — per-direction x @ Wx + b (bias
                 folded; both in forward time order)
    mask:        [T, B, 1]  float32 — 1.0 on real frames (padding trails)
    zh_*/zc_*:   [T, B, H]  float32 — per-direction 'take new state' mix
                 weights, in FORWARD time order for both lanes
    wh_f/wh_b:   [H, 4H]    per-direction recurrent weights
    ->           (h_f, h_b), each [T, B, H] in forward time order
    """
    h_f, _, h_b, _ = _bifwd_call(
        xp_f, xp_b, mask, zh_f, zc_f, zh_b, zc_b, wh_f, wh_b,
        hidden, interpret,
    )
    t = xp_f.shape[0]
    return h_f[:t], h_b[:t]


def _bi_zo_fwd(xp_f, xp_b, mask, zh_f, zc_f, zh_b, zc_b, wh_f, wh_b,
               hidden, interpret):
    h_f, c_f, h_b, c_b = _bifwd_call(
        xp_f, xp_b, mask, zh_f, zc_f, zh_b, zc_b, wh_f, wh_b,
        hidden, interpret,
    )
    t = xp_f.shape[0]
    return (h_f[:t], h_b[:t]), (xp_f, xp_b, mask, zh_f, zc_f, zh_b, zc_b,
                                wh_f, wh_b, h_f, c_f, h_b, c_b)


def _bi_zo_bwd(hidden, interpret, res, cot):
    (xp_f, xp_b, mask, zh_f, zc_f, zh_b, zc_b, wh_f, wh_b,
     h_f, c_f, h_b, c_b) = res
    dh_f, dh_b = cot
    dxp_f, dxp_b, h_prev_f, h_prev_b = _bibwd_call(
        xp_f, xp_b, mask, zh_f, zc_f, zh_b, zc_b,
        h_f, c_f, h_b, c_b, dh_f, dh_b, wh_f, wh_b, hidden, interpret,
    )
    dwh_f = jnp.einsum(
        "tbh,tbg->hg", h_prev_f, dxp_f, precision=_PREC,
        preferred_element_type=jnp.float32,
    ).astype(wh_f.dtype)
    dwh_b = jnp.einsum(
        "tbh,tbg->hg", h_prev_b, dxp_b, precision=_PREC,
        preferred_element_type=jnp.float32,
    ).astype(wh_b.dtype)
    return (
        dxp_f.astype(xp_f.dtype), dxp_b.astype(xp_b.dtype),
        jnp.zeros_like(mask),
        jnp.zeros_like(zh_f), jnp.zeros_like(zc_f),
        jnp.zeros_like(zh_b), jnp.zeros_like(zc_b),
        dwh_f, dwh_b,
    )


pallas_bi_zoneout_lstm.defvjp(_bi_zo_fwd, _bi_zo_bwd)
