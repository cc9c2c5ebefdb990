"""Pallas TPU CTC loss: alpha recursion forward + analytic beta-recursion
backward as chunked kernels.

Why: the ``lax.scan`` CTC (ops/ctc.py) costs ~30 ms of a 42 ms BLSTM train
step on v5e (B=32, T=512, L=48) — 512 XLA while-loop iterations over tiny
[B, 2L+1] arrays are pure per-op overhead, and autodiff doubles it with a
second scan.  Here the whole recursion runs register/VMEM-resident inside
one kernel: per frame a handful of VPU ops on a [B, S] tile, lattice
shifts as lane rolls, emission rows streamed through the BlockSpec
pipeline.  The backward pass is the textbook beta recursion (NOT autodiff
of the forward): gamma_t = alpha_t + beta_t gives the state posteriors,
and d(-logP)/d lp_ext = -exp(gamma - logP) in one fused elementwise op
outside the kernel.

Layout: lattice states on the 128-lane axis (S = 2L+1 zero-padded to a
lane multiple with LOG_EPS emissions so padded states stay at the log
floor), batch on sublanes, time chunked through the grid exactly like
ops/pallas_lstm.py.

The custom-VJP boundary is ``lp_ext`` (the per-state emission log-probs):
log-softmax and the label gather/scatter stay ordinary XLA ops outside,
so the chain through logits is untouched autodiff.

Semantics match ops/ctc.py bit-for-bit in structure: virtual pre-start
init, per-frame validity pass-through (padded frames carry alpha/beta
unchanged), LOG_EPS floor clamps, Graves-2006 skip rule.  Parity tested
against the scan path AND its brute-force oracle in
tests/test_pallas_ctc.py.  [ref: core/ctc_utils.py — K.ctc_batch_cost /
TF CTCLoss, the reference's provider of this op.]
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from asr_study_tpu.ops.ctc import LOG_EPS, _logadd, _logadd3
from asr_study_tpu.ops.pallas_lstm import (
    _budget_chunk,
    _divisor_chunk,
    _pad_time,
)

_CHUNK = 128      # frames per grid step (tiny rows; DMA amortization)


def _rev_chunk(t_pad: int, per_frame_bytes: int) -> int:
    """Largest divisor of the padded length within the VMEM budget (the
    reverse walk needs t_pad % chunk == 0 for its block index maps)."""
    return _divisor_chunk(t_pad, per_frame_bytes, _CHUNK)


def _roll_r(x, n, ids, interpret):
    """Shift lattice states right by ``n`` lanes, filling LOG_EPS."""
    if interpret:
        r = jnp.roll(x, n, axis=1)
    else:
        r = pltpu.roll(x, n, 1)
    return jnp.where(ids >= n, r, LOG_EPS)


def _roll_l(x, n, s_real, ids, interpret):
    """Shift lattice states left by ``n`` lanes, filling LOG_EPS.
    (pltpu.roll rejects negative shifts: left-by-n == right-by-(S-n).)"""
    if interpret:
        r = jnp.roll(x, -n, axis=1)
    else:
        r = pltpu.roll(x, x.shape[1] - n, 1)
    return jnp.where(ids < s_real - n, r, LOG_EPS)


def _fwd_kernel(lp_ref, valid_ref, skip_ref, alpha_out_ref, alpha_scr,
                *, chunk: int, s_pad: int, interpret: bool):
    t = pl.program_id(0)
    batch = alpha_scr.shape[0]
    ids = jax.lax.broadcasted_iota(jnp.int32, (batch, s_pad), 1)

    @pl.when(t == 0)
    def _():
        # virtual pre-start: log 1 at s=0 (one step reproduces t=0 init)
        alpha_scr[...] = jnp.where(ids == 0, 0.0, LOG_EPS)

    skip = skip_ref[...]

    def body(i, alpha):
        a1 = _roll_r(alpha, 1, ids, interpret)
        a2 = _roll_r(alpha, 2, ids, interpret) + skip
        nxt = _logadd3(alpha, a1, a2) + lp_ref[i]
        nxt = jnp.maximum(nxt, LOG_EPS)
        alpha = jnp.where(valid_ref[i] > 0, nxt, alpha)
        alpha_out_ref[i] = alpha
        return alpha

    alpha_scr[...] = jax.lax.fori_loop(0, chunk, body, alpha_scr[...])


def _bwd_kernel(lp_ref, valid_ref, alpha_ref, skip2_ref, end_ref,
                gamma_ref, beta_scr, lpn_scr, vn_scr,
                *, chunk: int, s_pad: int, s_real: int, interpret: bool):
    """Reverse time walk.  The carry is beta_t (completion log-prob from
    each state AFTER frame t's emission); the scratch holds frame t+1's
    emissions/validity across the chunk boundary.  Emits
    gamma_t = alpha_t + beta_t on valid frames (LOG_EPS elsewhere —
    padded frames contributed no emission, their dlp must be 0)."""
    t = pl.program_id(0)
    batch = beta_scr.shape[0]
    ids = jax.lax.broadcasted_iota(jnp.int32, (batch, s_pad), 1)

    @pl.when(t == 0)
    def _():
        beta_scr[...] = end_ref[...]     # indicator of the end states
        lpn_scr[...] = jnp.zeros_like(lpn_scr)
        vn_scr[...] = jnp.zeros_like(vn_scr)   # t+1 = T_max: invalid

    skip2 = skip2_ref[...]

    def body(k, carry):
        i = chunk - 1 - k
        beta, lp_next, v_next = carry
        be = beta + lp_next
        b1 = _roll_l(be, 1, s_real, ids, interpret)
        b2 = _roll_l(be, 2, s_real, ids, interpret) + skip2
        upd = jnp.maximum(_logadd3(be, b1, b2), LOG_EPS)
        beta = jnp.where(v_next > 0, upd, beta)
        gamma_ref[i] = jnp.where(
            valid_ref[i] > 0, alpha_ref[i] + beta, LOG_EPS
        )
        return (beta, lp_ref[i], valid_ref[i])

    beta, lpn, vn = jax.lax.fori_loop(
        0, chunk, body, (beta_scr[...], lpn_scr[...], vn_scr[...])
    )
    beta_scr[...] = beta
    lpn_scr[...] = lpn
    vn_scr[...] = vn


def _fwd_call(lp_ext, valid, skip_mask, interpret: bool):
    t_steps, batch, s_pad = lp_ext.shape
    chunk = _budget_chunk(_CHUNK, t_steps, batch * (2 * s_pad + 1) * 4)
    t_pad = -(-t_steps // chunk) * chunk
    lp_p = _pad_time(lp_ext, t_pad)
    valid_p = _pad_time(valid, t_pad)   # zero: alpha passes through

    kernel = functools.partial(
        _fwd_kernel, chunk=chunk, s_pad=s_pad, interpret=interpret
    )
    alpha_seq = pl.pallas_call(
        kernel,
        grid=(t_pad // chunk,),
        in_specs=[
            pl.BlockSpec((chunk, batch, s_pad), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, batch, 1), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, s_pad), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk, batch, s_pad), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (t_pad, batch, s_pad), jnp.float32
        ),
        scratch_shapes=[pltpu.VMEM((batch, s_pad), jnp.float32)],
        interpret=interpret,
    )(lp_p, valid_p, skip_mask)
    return alpha_seq


def _bwd_call(lp_ext, valid, alpha_seq, skip2_mask, end_ind, s_real: int,
              interpret: bool):
    t_steps, batch, s_pad = lp_ext.shape
    t_pad = alpha_seq.shape[0]
    chunk = _rev_chunk(t_pad, batch * (3 * s_pad + 1) * 4)
    n_chunks = t_pad // chunk
    lp_p = _pad_time(lp_ext, t_pad)
    valid_p = _pad_time(valid, t_pad)

    rev = lambda t: (n_chunks - 1 - t, 0, 0)         # noqa: E731
    res = lambda t: (0, 0)                           # noqa: E731
    kernel = functools.partial(
        _bwd_kernel, chunk=chunk, s_pad=s_pad, s_real=s_real,
        interpret=interpret,
    )
    gamma = pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((chunk, batch, s_pad), rev,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, batch, 1), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, batch, s_pad), rev,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, s_pad), res, memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, s_pad), res, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk, batch, s_pad), rev,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (t_pad, batch, s_pad), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM((batch, s_pad), jnp.float32),
            pltpu.VMEM((batch, s_pad), jnp.float32),
            pltpu.VMEM((batch, 1), jnp.float32),
        ],
        interpret=interpret,
    )(lp_p, valid_p, alpha_seq, skip2_mask, end_ind)
    return gamma[:t_steps]


def _final_logp(alpha_last, end, label_lengths):
    """logP from the last alpha row (validity pass-through makes row T-1
    equal the per-sequence final row)."""
    a_end = jnp.take_along_axis(alpha_last, end[:, None], axis=1)[:, 0]
    a_pre = jnp.take_along_axis(
        alpha_last, jnp.maximum(end - 1, 0)[:, None], axis=1
    )[:, 0]
    a_pre = jnp.where(label_lengths > 0, a_pre, LOG_EPS)
    return _logadd(a_end, a_pre)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def ctc_nll(lp_ext, valid, skip_mask, end, label_lengths,
            s_real: int, interpret: bool = False):
    """Per-sequence CTC negative log-likelihood from lattice emissions.

    lp_ext:   [T, B, S_pad] f32 — per-state emission log-probs (padded
              states at LOG_EPS), S_pad a multiple of 128
    valid:    [T, B, 1] f32 — 1.0 on real frames
    skip_mask:[B, S_pad] f32 — 0 where the s-2 -> s skip is allowed,
              LOG_EPS elsewhere
    end:      [B] int32 — final-blank lattice index (2*label_len)
    label_lengths: [B] int32
    ->        nll [B] (unclamped; caller applies the infeasibility clamp)
    """
    alpha_seq = _fwd_call(lp_ext, valid, skip_mask, interpret)
    logp = _final_logp(alpha_seq[lp_ext.shape[0] - 1], end, label_lengths)
    return -logp


def _nll_fwd(lp_ext, valid, skip_mask, end, label_lengths, s_real,
             interpret):
    alpha_seq = _fwd_call(lp_ext, valid, skip_mask, interpret)
    logp = _final_logp(alpha_seq[lp_ext.shape[0] - 1], end, label_lengths)
    return -logp, (lp_ext, valid, skip_mask, end, label_lengths,
                   alpha_seq, logp)


def _nll_bwd(s_real, interpret, res, cot):
    lp_ext, valid, skip_mask, end, label_lengths, alpha_seq, logp = res
    batch, s_pad = skip_mask.shape
    ids = jnp.arange(s_pad)[None, :]
    # skip gate seen from the SOURCE state: allowed into s+2 (plain XLA
    # op — this runs outside the kernel)
    skip2 = jnp.where(
        ids < s_real - 2, jnp.roll(skip_mask, -2, axis=1), LOG_EPS
    )
    end_ind = jnp.where(
        (ids == end[:, None])
        | ((ids == end[:, None] - 1) & (label_lengths[:, None] > 0)),
        0.0, LOG_EPS,
    ).astype(jnp.float32)

    gamma = _bwd_call(
        lp_ext, valid, alpha_seq, skip2, end_ind, s_real, interpret
    )
    # posterior gamma_hat = exp(alpha+beta-logP) <= 1; clamp the exponent
    # so infeasible sequences (logP at the floor) cannot overflow, and
    # zero their grads entirely (matching the scan path's loss clamp).
    expo = jnp.minimum(gamma - logp[None, :, None], 0.0)
    feasible = (logp > 0.5 * LOG_EPS).astype(jnp.float32)
    dlp = -jnp.exp(expo) * feasible[None, :, None] * cot[None, :, None]
    return (dlp.astype(lp_ext.dtype), jnp.zeros_like(valid),
            jnp.zeros_like(skip_mask), None, None)


ctc_nll.defvjp(_nll_fwd, _nll_bwd)
