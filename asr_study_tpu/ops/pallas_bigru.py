"""Fused bidirectional Pallas TPU GRU — companion to pallas_bilstm.py
(same design: both directions of a bidirectional GRU layer in one kernel
launch, the reversed lane reading time-reversed blocks via its BlockSpec
index map; fused custom-VJP backward walking the two cotangent chains in
opposite time directions in one grid).

Gate order r, z, n with ALL biases folded into xp (pallas_gru.py);
semantics match running ``pallas_gru`` forward on ``xp_f`` and reversed on
``xp_b``, including mask state-hold and zero initial state at both ends.

[ref: core/layers.py — the reference's Keras Bidirectional(GRU) layers.]
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from asr_study_tpu.ops import pallas_lstm as _base
from asr_study_tpu.ops.pallas_lstm import (
    _PREC,
    _budget_chunk,
    _divisor_chunk,
    _pad_time,
    _unroll_rows,
)
from asr_study_tpu.ops.pallas_bilstm import _compiler_params, _fused_budget
from asr_study_tpu.ops.pallas_gru import _gru_gates


def _gru_row_fwd(i, h_prev, xp_ref, mask_ref, wh_ref, h_out_ref, hidden):
    r, z, n, _ = _gru_gates(xp_ref[i], h_prev, wh_ref, hidden)
    h = (1.0 - z) * n + z * h_prev
    h = jnp.where(mask_ref[i] > 0, h, h_prev)
    h_out_ref[i] = h
    return h


def _gru_row_bwd(i, dh_next, xp_ref, mask_ref, hprev_ref, dh_out_ref,
                 wh_ref, wht_ref, dxp_ref, dhp_ref, hidden):
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
    from asr_study_tpu.ops.pallas_lstm import _mm

    dh_rec = _mm(dhp, wht_ref)
    dh_prev = dh_rec + jnp.where(m > 0, dh * z, dh)
    dxp_ref[i] = dxp
    dhp_ref[i] = dhp
    return dh_prev


def _bifwd_kernel(xpf_ref, xpb_ref, mf_ref, mb_ref, whf_ref, whb_ref,
                  hf_out, hb_out, hf_scr, hb_scr,
                  *, hidden: int, chunk: int):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        hf_scr[...] = jnp.zeros_like(hf_scr)
        hb_scr[...] = jnp.zeros_like(hb_scr)

    def body(i, carry):
        hf, hb = carry
        hf = _gru_row_fwd(i, hf, xpf_ref, mf_ref, whf_ref, hf_out, hidden)
        hb = _gru_row_fwd(
            chunk - 1 - i, hb, xpb_ref, mb_ref, whb_ref, hb_out, hidden
        )
        return (hf, hb)

    hf, hb = jax.lax.fori_loop(0, chunk, body, (hf_scr[...], hb_scr[...]))
    hf_scr[...] = hf
    hb_scr[...] = hb


def _bibwd_kernel(xpf_ref, xpb_ref, mf_ref, mb_ref,
                  hprevf_ref, dhf_out_ref, hprevb_ref, dhb_out_ref,
                  whf_ref, whft_ref, whb_ref, whbt_ref,
                  dxpf_ref, dhpf_ref, dxpb_ref, dhpb_ref,
                  dhf_scr, dhb_scr, *, hidden: int, chunk: int):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        dhf_scr[...] = jnp.zeros_like(dhf_scr)
        dhb_scr[...] = jnp.zeros_like(dhb_scr)

    def body(k, carry):
        dhf, dhb = carry
        dhf = _gru_row_bwd(
            chunk - 1 - k, dhf, xpf_ref, mf_ref, hprevf_ref, dhf_out_ref,
            whf_ref, whft_ref, dxpf_ref, dhpf_ref, hidden,
        )
        dhb = _gru_row_bwd(
            k, dhb, xpb_ref, mb_ref, hprevb_ref, dhb_out_ref,
            whb_ref, whbt_ref, dxpb_ref, dhpb_ref, hidden,
        )
        return (dhf, dhb)

    dhf, dhb = _unroll_rows(
        chunk, body,
                                 (dhf_scr[...], dhb_scr[...]))
    dhf_scr[...] = dhf
    dhb_scr[...] = dhb


def _bifwd_call(xp_f, xp_b, mask, wh_f, wh_b, hidden: int, interpret: bool):
    t_steps, batch, gh = xp_f.shape
    chunk = _budget_chunk(
        _base._CHUNK, t_steps, 2 * batch * (gh + hidden) * 4,
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

    kernel = functools.partial(_bifwd_kernel, hidden=hidden, chunk=chunk)
    return pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((chunk, batch, gh), fwd, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, batch, gh), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, batch, 1), fwd, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, batch, 1), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, gh), whm, memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, gh), whm, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((chunk, batch, hidden), fwd,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, batch, hidden), rev,
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t_pad, batch, hidden), jnp.float32),
            jax.ShapeDtypeStruct((t_pad, batch, hidden), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((batch, hidden), jnp.float32) for _ in range(2)
        ],
        compiler_params=_compiler_params(interpret),
        interpret=interpret,
    )(xpf_p, xpb_p, mask_p, mask_p, wh_f, wh_b)


def _bibwd_call(xp_f, xp_b, mask, h_f, h_b, dh_f, dh_b, wh_f, wh_b,
                hidden: int, interpret: bool):
    t_steps, batch, gh = xp_f.shape
    t_pad = h_f.shape[0]
    per_frame = 2 * batch * (3 * gh + 2 * hidden) * 4
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
    h_prev_b = jnp.concatenate([h_b[1:], zero], axis=0)

    fwd = lambda t: (t, 0, 0)                        # noqa: E731
    rev = lambda t: (n_chunks - 1 - t, 0, 0)         # noqa: E731
    whm = lambda t: (0, 0)                           # noqa: E731
    seq = lambda m: pl.BlockSpec(                    # noqa: E731
        (chunk, batch, hidden), m, memory_space=pltpu.VMEM
    )

    kernel = functools.partial(_bibwd_kernel, hidden=hidden, chunk=chunk)
    dxp_f, dhp_f, dxp_b, dhp_b = pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((chunk, batch, gh), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, batch, gh), fwd, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, batch, 1), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, batch, 1), fwd, memory_space=pltpu.VMEM),
            seq(rev), seq(rev),
            seq(fwd), seq(fwd),
            pl.BlockSpec((hidden, gh), whm, memory_space=pltpu.VMEM),
            pl.BlockSpec((gh, hidden), whm, memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, gh), whm, memory_space=pltpu.VMEM),
            pl.BlockSpec((gh, hidden), whm, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((chunk, batch, gh), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, batch, gh), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, batch, gh), fwd, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, batch, gh), fwd, memory_space=pltpu.VMEM),
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((t_pad, batch, gh), jnp.float32)
            for _ in range(4)
        ),
        scratch_shapes=[
            pltpu.VMEM((batch, hidden), jnp.float32) for _ in range(2)
        ],
        compiler_params=_compiler_params(interpret),
        interpret=interpret,
    )(
        xpf_p, xpb_p, mask_p, mask_p,
        h_prev_f, dhf_p, h_prev_b, dhb_p,
        wh_f, wh_f.T, wh_b, wh_b.T,
    )
    return (
        dxp_f[:t_steps], dhp_f[:t_steps], dxp_b[:t_steps], dhp_b[:t_steps],
        h_prev_f[:t_steps], h_prev_b[:t_steps],
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def pallas_bigru(xp_f, xp_b, mask, wh_f, wh_b, hidden: int,
                 interpret: bool = False):
    """Both directions of a bidirectional GRU layer in one fused kernel.

    xp_f/xp_b: [T, B, 3H] float32 — per-direction x @ Wx + b (biases
               folded), both in FORWARD time order
    mask:      [T, B, 1]  float32 — 1.0 on real frames (padding trails)
    wh_f/wh_b: [H, 3H]    float32
    ->         (h_f, h_b), each [T, B, H] in forward time order
    """
    h_f, h_b = _bifwd_call(xp_f, xp_b, mask, wh_f, wh_b, hidden, interpret)
    t = xp_f.shape[0]
    return h_f[:t], h_b[:t]


def _pallas_bigru_fwd(xp_f, xp_b, mask, wh_f, wh_b, hidden, interpret):
    h_f, h_b = _bifwd_call(xp_f, xp_b, mask, wh_f, wh_b, hidden, interpret)
    t = xp_f.shape[0]
    return (h_f[:t], h_b[:t]), (xp_f, xp_b, mask, wh_f, wh_b, h_f, h_b)


def _pallas_bigru_bwd(hidden, interpret, res, cot):
    xp_f, xp_b, mask, wh_f, wh_b, h_f, h_b = res
    dh_f, dh_b = cot
    dxp_f, dhp_f, dxp_b, dhp_b, h_prev_f, h_prev_b = _bibwd_call(
        xp_f, xp_b, mask, h_f, h_b, dh_f, dh_b, wh_f, wh_b, hidden,
        interpret,
    )
    dwh_f = jnp.einsum(
        "tbh,tbg->hg", h_prev_f, dhp_f, precision=_PREC,
        preferred_element_type=jnp.float32,
    ).astype(wh_f.dtype)
    dwh_b = jnp.einsum(
        "tbh,tbg->hg", h_prev_b, dhp_b, precision=_PREC,
        preferred_element_type=jnp.float32,
    ).astype(wh_b.dtype)
    return (
        dxp_f.astype(xp_f.dtype), dxp_b.astype(xp_b.dtype),
        jnp.zeros_like(mask), dwh_f, dwh_b,
    )


pallas_bigru.defvjp(_pallas_bigru_fwd, _pallas_bigru_bwd)
