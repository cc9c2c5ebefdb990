"""Fused bidirectional Pallas TPU LSTM: BOTH directions of a BLSTM layer in
ONE kernel launch, with a fused custom-VJP backward kernel.

Why (vs two ``pallas_lstm`` calls): the recurrence is latency-bound — per
frame each direction issues one small [B, H] x [H, 4H] matmul, so fixed
per-launch and per-grid-step costs dominate the MXU time.  Running the two
directions in the same grid step

- halves the kernel launches and grid steps per layer,
- amortizes the inner-loop control overhead across two cells' work, and
- eliminates the four full-sequence ``[::-1]`` HBM copies per layer that
  the reverse-scan formulation materializes (xp flip in, h flip out): the
  backward direction instead reads time-REVERSED blocks via its BlockSpec
  index map and walks rows in reverse inside the block, the same pattern as
  ``pallas_lstm._bwd_call``.

Semantics are identical to running ``pallas_lstm`` forward on ``xp_f`` and
reversed on ``xp_b``: zero initial state at both ends, masked frames hold
state (the reversed direction consumes trailing padding FIRST, where the
zero mask keeps its state at exactly 0 until real frames begin — the same
padding-exactness argument as models/rnn.py).

The VJP kernel fuses the two directions' gradient scans the same way: the
forward direction's cotangent chain walks time backward while the reversed
direction's walks time forward, so at grid step s one lane reads block
K-1-s descending and the other block s ascending — both lanes stay fully
pipelined with no extra pass over memory.

[ref: core/layers.py — the reference's Keras Bidirectional(LSTM) layers;
this kernel is the TPU-native replacement for their CUDA RNN kernels.]
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
    _lstm_cell_math,
    _lstm_row_bwd,
    _pad_time,
    _unroll_rows,
)


def _fused_budget() -> int:
    """The fused kernel streams BOTH directions' blocks, so it gets a
    multiple of the single-direction budget — paired with an explicitly
    raised Mosaic VMEM ceiling (below) so the chunk size does not halve vs
    the per-direction kernels (halved chunks double the grid steps and
    erase the fusion win).  3x (not 2x) where the ceiling is raised: at
    B=32, H=256 the two lanes' fwd blocks need 25.2 MB double-buffered
    for a 32-frame chunk, just over 2x12 MB — 3x keeps the full chunk
    (and lets the bwd chunk double to 16), comfortably inside the 64 MB
    ceiling.  On 16 MiB-VMEM generations (no raised ceiling) stay at 2x
    of the already-scaled-down budget."""
    factor = 3 if _compiler_params(False) is not None else 2
    return factor * _base._vmem_budget()


def _compiler_params(interpret: bool):
    """Raise the Mosaic VMEM limit on generations with 128 MiB VMEM; the
    conservative default (~16 MiB of streamed blocks) rejects the fused
    kernel's doubled double-buffered blocks at compile time."""
    if interpret:
        return None
    try:
        kind = jax.local_devices()[0].device_kind.lower()
    except Exception:
        return None
    if "v2" in kind or "v3" in kind:   # 16 MiB VMEM generations
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20)


def _bifwd_kernel(xpf_ref, xpb_ref, mf_ref, mb_ref, whf_ref, whb_ref,
                  hf_out, cf_out, hb_out, cb_out,
                  hf_scr, cf_scr, hb_scr, cb_scr,
                  *, hidden: int, chunk: int):
    """One grid step advances ``chunk`` frames of BOTH directions: the
    forward lane reads block t rows ascending; the backward lane reads
    block K-1-t rows descending (true reversed-time order globally)."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        hf_scr[...] = jnp.zeros_like(hf_scr)
        cf_scr[...] = jnp.zeros_like(cf_scr)
        hb_scr[...] = jnp.zeros_like(hb_scr)
        cb_scr[...] = jnp.zeros_like(cb_scr)

    def body(i, carry):
        hf, cf, hb, cb = carry
        hf, cf = _lstm_cell_math(
            xpf_ref[i], hf, cf, mf_ref[i], whf_ref, hidden
        )
        hf_out[i] = hf
        cf_out[i] = cf
        j = chunk - 1 - i
        hb, cb = _lstm_cell_math(
            xpb_ref[j], hb, cb, mb_ref[j], whb_ref, hidden
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
                  dxpf_ref, dxpb_ref,
                  dhf_scr, dcf_scr, dhb_scr, dcb_scr,
                  *, hidden: int, chunk: int):
    """Fused gradient scans: the forward direction's lane walks time
    backward (block K-1-s, rows descending); the reversed direction's lane
    walks time forward (block s, rows ascending)."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        dhf_scr[...] = jnp.zeros_like(dhf_scr)
        dcf_scr[...] = jnp.zeros_like(dcf_scr)
        dhb_scr[...] = jnp.zeros_like(dhb_scr)
        dcb_scr[...] = jnp.zeros_like(dcb_scr)

    def body(k, carry):
        dhf, dcf, dhb, dcb = carry
        dhf, dcf = _lstm_row_bwd(
            chunk - 1 - k, dhf, dcf, xpf_ref, mf_ref, hprevf_ref,
            cprevf_ref, cf_ref, dhf_out_ref, whf_ref, whft_ref, dxpf_ref,
            hidden,
        )
        dhb, dcb = _lstm_row_bwd(
            k, dhb, dcb, xpb_ref, mb_ref, hprevb_ref,
            cprevb_ref, cb_ref, dhb_out_ref, whb_ref, whbt_ref, dxpb_ref,
            hidden,
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


def _bifwd_call(xp_f, xp_b, mask, wh_f, wh_b, hidden: int, interpret: bool):
    t_steps, batch, gh = xp_f.shape
    # streamed per frame: TWO directions of xp [B, 4H] in + h,c [B, H] out
    chunk = _budget_chunk(
        _base._CHUNK, t_steps, 2 * batch * (gh + 2 * hidden) * 4,
        budget=_fused_budget(),
    )
    t_pad = -(-t_steps // chunk) * chunk
    n_chunks = t_pad // chunk
    xpf_p = _pad_time(xp_f, t_pad)
    xpb_p = _pad_time(xp_b, t_pad)
    mask_p = _pad_time(mask, t_pad)  # zero mask on padding: state holds

    fwd = lambda t: (t, 0, 0)                        # noqa: E731
    rev = lambda t: (n_chunks - 1 - t, 0, 0)         # noqa: E731
    whm = lambda t: (0, 0)                           # noqa: E731

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
    )(xpf_p, xpb_p, mask_p, mask_p, wh_f, wh_b)
    return outs  # (h_f, c_f, h_b, c_b), each padded to t_pad


def _bibwd_call(xp_f, xp_b, mask, h_f, c_f, h_b, c_b, dh_f, dh_b,
                wh_f, wh_b, hidden: int, interpret: bool):
    t_steps, batch, gh = xp_f.shape
    t_pad = h_f.shape[0]
    # streamed per frame, both lanes: xp+dxp [B, 4H] + 4 x [B, H] each.
    # Cap at 2x the per-direction bwd chunk: the raised fused budget fits
    # 16-frame blocks, halving the grid-step count (and its per-block
    # overhead) for the same VMEM-residency argument as the fwd kernel.
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
    # forward lane: scan-previous state is time t-1
    h_prev_f = jnp.concatenate([zero, h_f[:-1]], axis=0)
    c_prev_f = jnp.concatenate([zero, c_f[:-1]], axis=0)
    # reversed lane: scan-previous state is time t+1
    h_prev_b = jnp.concatenate([h_b[1:], zero], axis=0)
    c_prev_b = jnp.concatenate([c_b[1:], zero], axis=0)

    fwd = lambda t: (t, 0, 0)                        # noqa: E731
    rev = lambda t: (n_chunks - 1 - t, 0, 0)         # noqa: E731
    whm = lambda t: (0, 0)                           # noqa: E731

    kernel = functools.partial(_bibwd_kernel, hidden=hidden, chunk=chunk)
    seq_spec = lambda m: pl.BlockSpec(               # noqa: E731
        (chunk, batch, hidden), m, memory_space=pltpu.VMEM
    )
    dxp_f, dxp_b = pl.pallas_call(
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
    )
    return (
        dxp_f[:t_steps], dxp_b[:t_steps],
        h_prev_f[:t_steps], h_prev_b[:t_steps],
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def pallas_bilstm(xp_f, xp_b, mask, wh_f, wh_b, hidden: int,
                  interpret: bool = False):
    """Both directions of a BLSTM layer in one fused kernel.

    xp_f: [T, B, 4H] float32 — forward-direction x @ Wx + b (bias folded)
    xp_b: [T, B, 4H] float32 — backward-direction projections, in FORWARD
          time order (the kernel reverses via its block index maps)
    mask: [T, B, 1]  float32 — 1.0 on real frames (shared; padding trails)
    wh_f/wh_b: [H, 4H] float32 — per-direction recurrent weights
    ->    (h_f, h_b), each [T, B, H] in forward time order
    """
    h_f, _, h_b, _ = _bifwd_call(
        xp_f, xp_b, mask, wh_f, wh_b, hidden, interpret
    )
    t = xp_f.shape[0]
    return h_f[:t], h_b[:t]


def _pallas_bilstm_fwd(xp_f, xp_b, mask, wh_f, wh_b, hidden, interpret):
    h_f, c_f, h_b, c_b = _bifwd_call(
        xp_f, xp_b, mask, wh_f, wh_b, hidden, interpret
    )
    t = xp_f.shape[0]
    # residuals stay time-padded for the chunked backward kernel
    return (h_f[:t], h_b[:t]), (xp_f, xp_b, mask, wh_f, wh_b,
                                h_f, c_f, h_b, c_b)


def _pallas_bilstm_bwd(hidden, interpret, res, cot):
    xp_f, xp_b, mask, wh_f, wh_b, h_f, c_f, h_b, c_b = res
    dh_f, dh_b = cot
    dxp_f, dxp_b, h_prev_f, h_prev_b = _bibwd_call(
        xp_f, xp_b, mask, h_f, c_f, h_b, c_b, dh_f, dh_b,
        wh_f, wh_b, hidden, interpret,
    )
    # weight gradients as two big MXU contractions outside the kernel
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
        jnp.zeros_like(mask), dwh_f, dwh_b,
    )


pallas_bilstm.defvjp(_pallas_bilstm_fwd, _pallas_bilstm_bwd)
