"""Pallas TPU LSTM scan: the recurrent hot loop as a single kernel, with a
custom-VJP backward kernel so training runs through it too.

Why: ``lax.scan`` emits one XLA while-loop iteration per frame — each a
small [B, H] x [H, 4H] matmul plus loop bookkeeping.  This kernel keeps the
(h, c) state and the recurrent weights resident in VMEM across the whole
sequence and streams the (pre-computed, bias-folded) input projections
``xp`` through the BlockSpec pipeline, so the only HBM traffic per frame is
xp-in / h-out (SURVEY.md §7 hard-part 5; pallas_guide double-buffering
pattern — the pipeline does the double buffering for us).

Work split:
- outside (XLA, MXU-friendly big matmuls): input projection x @ Wx + b for
  all T at once; for backward, dW_hh / db / dx as single big contractions
  over the stored sequences.
- inside (this kernel): the sequential recurrence only — per frame one
  [B, H] x [H, 4H] matmul (forward) or one [B, 4H] x [4H, H] (backward).

Gate order i, f, g, o (matches models/cells.py).  Masked frames hold state
exactly like the scan cells (padding-correct for reversed scans).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PREC = jax.lax.Precision.HIGHEST

# In-kernel recurrent-matmul precision for f32 weights.  On TPU, f32
# matmuls are emulated as bf16 MXU passes: DEFAULT=1 pass, HIGHEST=6
# (Mosaic does not lower HIGH).  The recurrence is the pipeline's serial
# critical path, so this knob trades MXU passes directly for wall time
# (v5e, 2x256 BLSTM fwd: 6.96 -> 5.41 ms/batch).  DEFAULT matches the
# precision the lax.scan backend's un-annotated dots already get on TPU
# (cells._dot), and cross-precision training parity was measured at 0.1
# loss after 21 steps — so DEFAULT is the default; set
# ASR_RNN_MM_PRECISION=highest for f32-exact gate matmuls.
from asr_study_tpu.utils.env import choice_env

_MM_PRECISION = {
    "default": jax.lax.Precision.DEFAULT,
    "highest": jax.lax.Precision.HIGHEST,
}[choice_env("ASR_RNN_MM_PRECISION", "default", ("default", "highest"))]


def _mm(x, w_ref):
    """Recurrent matmul in the weights' dtype with f32 accumulation.
    The precision knob only applies to f32 weights — Mosaic rejects
    fp32-contract-precision on bf16 operands."""
    w = w_ref[...]
    prec = _MM_PRECISION if w.dtype == jnp.float32 else None
    return jnp.dot(
        x.astype(w.dtype), w,
        preferred_element_type=jnp.float32, precision=prec,
    )


def _lstm_gates_apply(gates, h_prev, c_prev, m, hidden):
    """Nonlinearity + state update from precomputed gate pre-activations."""
    i = jax.nn.sigmoid(gates[:, 0 * hidden : 1 * hidden])
    f = jax.nn.sigmoid(gates[:, 1 * hidden : 2 * hidden])
    g = jnp.tanh(gates[:, 2 * hidden : 3 * hidden])
    o = jax.nn.sigmoid(gates[:, 3 * hidden : 4 * hidden])
    c = f * c_prev + i * g
    h = o * jnp.tanh(c)
    h = jnp.where(m > 0, h, h_prev)
    c = jnp.where(m > 0, c, c_prev)
    return h, c


def _lstm_cell_math(xp_t, h_prev, c_prev, m, wh_ref, hidden):
    # cast to the weights' dtype: Mosaic rejects mixed f32 x bf16 matmuls,
    # and this is exactly the bf16-mixed-precision semantics of cells._dot
    gates = xp_t + _mm(h_prev, wh_ref)                  # [B, 4H]
    return _lstm_gates_apply(gates, h_prev, c_prev, m, hidden)


def _fwd_kernel(xp_ref, mask_ref, wh_ref, h_out_ref, c_out_ref,
                h_scr, c_scr, *, hidden: int, chunk: int):
    """One grid step advances ``chunk`` frames: the [chunk, B, 4H] xp block
    is DMA'd once (pipelined with the previous step's compute) and the
    inner fori_loop runs the recurrence register-resident."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_scr[...] = jnp.zeros_like(h_scr)
        c_scr[...] = jnp.zeros_like(c_scr)

    def body(i, carry):
        h_prev, c_prev = carry
        h, c = _lstm_cell_math(
            xp_ref[i], h_prev, c_prev, mask_ref[i], wh_ref, hidden
        )
        h_out_ref[i] = h
        c_out_ref[i] = c
        return (h, c)

    h, c = jax.lax.fori_loop(
        0, chunk, body, (h_scr[...], c_scr[...])
    )
    h_scr[...] = h
    c_scr[...] = c


def _lstm_row_bwd(i, dh_next, dc_next, xp_ref, mask_ref, hprev_ref,
                  cprev_ref, c_ref, dh_out_ref, wh_ref, wht_ref, dxp_ref,
                  hidden: int):
    """Reverse-mode cell math for ONE row ``i`` of the current block.
    Shared by the uni- and bidirectional backward kernels; the caller
    chooses the row walk order (descending for a forward-time scan,
    ascending for a reversed one)."""
    h_prev = hprev_ref[i]
    c_prev = cprev_ref[i]
    c_t = c_ref[i]
    m = mask_ref[i]                                     # [B, 1]

    # recompute gate activations (cheaper than storing [T, B, 4H])
    gates = xp_ref[i] + _mm(h_prev, wh_ref)
    ii = jax.nn.sigmoid(gates[:, 0 * hidden : 1 * hidden])
    f = jax.nn.sigmoid(gates[:, 1 * hidden : 2 * hidden])
    g = jnp.tanh(gates[:, 2 * hidden : 3 * hidden])
    o = jax.nn.sigmoid(gates[:, 3 * hidden : 4 * hidden])

    dh = dh_out_ref[i] + dh_next
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
    )                                                    # [B, 4H]
    dpre = jnp.where(m > 0, dpre, 0.0)
    dh_rec = _mm(dpre, wht_ref)
    # masked frames pass state (and its cotangent) straight through:
    # dc_next, NOT dc — a held frame's output is h_prev, so the
    # dh*o*(1-tanh^2 c) term folded into dc must not leak into the
    # chain there (r5 review; verified vs the scan cell's autodiff on
    # losses that read padded outputs)
    dh_prev = dh_rec + jnp.where(m > 0, 0.0, dh)
    dc_prev = jnp.where(m > 0, dc * f, dc_next)
    dxp_ref[i] = dpre
    return (dh_prev, dc_prev)


def _unroll_rows(chunk, body, carry):
    """Static-index replacement for ``fori_loop(0, chunk, body, carry)``
    in the backward kernels' inner row walk: identical math and order,
    but Mosaic sees constant ref indices.  Measured 1.733 -> 1.645
    ms/scan at T512/B32/H256 (bench_bwd_probe.py, r4) — the backward
    premium lives in per-iteration loop/issue structure, not arithmetic
    (stubbing ALL cotangent VPU math saved only 1%).  chunk is
    VMEM-budgeted small (<= 8 rows uni, <= 16 fused-bidi), so the
    unroll stays compact."""
    for k in range(chunk):
        carry = body(k, carry)
    return carry


def _bwd_kernel(xp_ref, mask_ref, hprev_ref, cprev_ref, c_ref, dh_out_ref,
                wh_ref, wht_ref, dxp_ref, dh_scr, dc_scr,
                *, hidden: int, chunk: int):
    """Grid walks time backward, ``chunk`` frames per step; block index
    maps deliver time-reversed chunks whose ROWS are still forward-ordered,
    so the inner loop runs i = chunk-1 .. 0."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        dh_scr[...] = jnp.zeros_like(dh_scr)
        dc_scr[...] = jnp.zeros_like(dc_scr)

    def body(k, carry):
        dh_next, dc_next = carry
        return _lstm_row_bwd(
            chunk - 1 - k, dh_next, dc_next, xp_ref, mask_ref, hprev_ref,
            cprev_ref, c_ref, dh_out_ref, wh_ref, wht_ref, dxp_ref, hidden,
        )

    dh, dc = _unroll_rows(chunk, body, (dh_scr[...], dc_scr[...]))
    dh_scr[...] = dh
    dc_scr[...] = dc


# frames per grid step: amortizes per-block DMA latency over the chunk
# (one-frame steps measured 8x slower end-to-end on v5e).  The chunk is
# budgeted against VMEM: streamed blocks are double-buffered, and the
# per-frame footprint scales with batch (observed OOMs: bwd at B=32/c=32
# by 64KB; fwd at B=64/c=32 by 8MB).
_CHUNK = 32
_CHUNK_BWD = 8


@functools.lru_cache(maxsize=1)
def _vmem_budget() -> int:
    """Streamed-block VMEM budget, derived per device generation.

    Calibrated anchor: v5e (128 MiB VMEM) safely streams 12 MiB of
    double-buffered blocks alongside the resident weights/scratch (12.58 MiB
    ran fine; see OOM notes above).  Older generations with 16 MiB VMEM get
    a proportionally smaller budget; unknown kinds inherit the v5e value
    (too-large budgets fail loudly at compile, they don't corrupt).
    Override with ASR_VMEM_BUDGET_MB.
    """
    import os

    env = os.environ.get("ASR_VMEM_BUDGET_MB")
    if env:
        try:
            mb = float(env)
        except ValueError:
            raise ValueError(
                f"ASR_VMEM_BUDGET_MB={env!r} is not a number"
            ) from None
        if mb <= 0:
            raise ValueError(f"ASR_VMEM_BUDGET_MB={env!r} must be > 0")
        return int(mb * 2**20)
    try:
        kind = jax.local_devices()[0].device_kind.lower()
    except Exception:
        return 12 * 2**20
    if "v2" in kind or "v3" in kind:      # 16 MiB VMEM generations
        return 6 * 2**20
    return 12 * 2**20


def _budget_chunk(cap: int, t_steps: int, per_frame_bytes: int,
                  budget: int | None = None) -> int:
    budget = budget or _vmem_budget()
    c = min(cap, t_steps)
    while c > 1 and c * per_frame_bytes * 2 > budget:
        c //= 2
    return max(c, 1)


def _divisor_chunk(t_pad: int, per_frame_bytes: int, cap: int,
                   budget: int | None = None) -> int:
    """Largest divisor of the padded length within the VMEM budget.
    Shared by every backward/reverse kernel whose grid must tile ``t_pad``
    exactly (the forward kernels pad up instead)."""
    cap = _budget_chunk(cap, t_pad, per_frame_bytes, budget=budget)
    for c in range(cap, 0, -1):
        if t_pad % c == 0:
            return c
    return 1


def _bwd_chunk(t_pad: int, per_frame_bytes: int) -> int:
    return _divisor_chunk(t_pad, per_frame_bytes, _CHUNK_BWD)


def _pad_time(x, t_pad):
    t = x.shape[0]
    if t == t_pad:
        return x
    return jnp.pad(x, ((0, t_pad - t),) + ((0, 0),) * (x.ndim - 1))


def _fwd_call(xp, mask, wh, hidden: int, interpret: bool):
    t_steps, batch, gh = xp.shape
    # streamed per frame: xp [B, 4H] in + h,c [B, H] out each
    chunk = _budget_chunk(
        _CHUNK, t_steps, batch * (gh + 2 * hidden) * 4
    )
    t_pad = -(-t_steps // chunk) * chunk
    xp_p = _pad_time(xp, t_pad)
    mask_p = _pad_time(mask, t_pad)  # zero mask on padding: state holds

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
    )(xp_p, mask_p, wh)
    return h_seq, c_seq  # padded to t_pad; callers slice


def _bwd_call(xp, mask, h_seq, c_seq, dh_out, wh, hidden: int,
              interpret: bool):
    t_steps, batch, gh = xp.shape            # original (unpadded) length
    t_pad = h_seq.shape[0]                   # fwd residuals are padded
    # streamed per frame: xp+dxp [B, 4H] + hprev/cprev/c/dh_out [B, H]
    chunk = _bwd_chunk(t_pad, batch * (2 * gh + 4 * hidden) * 4)
    n_chunks = t_pad // chunk
    wht = wh.T
    xp_p = _pad_time(xp, t_pad)
    mask_p = _pad_time(mask, t_pad)
    dh_out_p = _pad_time(dh_out, t_pad)

    rev = lambda t: (n_chunks - 1 - t, 0, 0)         # noqa: E731

    kernel = functools.partial(_bwd_kernel, hidden=hidden, chunk=chunk)
    # h_prev/c_prev as explicitly shifted sequences (zero initial state),
    # so every grid step reads plain time-reversed blocks.
    zero = jnp.zeros((1, batch, hidden), jnp.float32)
    h_prev_seq = jnp.concatenate([zero, h_seq[:-1]], axis=0)
    c_prev_seq = jnp.concatenate([zero, c_seq[:-1]], axis=0)

    dxp = pl.pallas_call(
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
        ],
        out_specs=pl.BlockSpec((chunk, batch, gh), rev,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_pad, batch, gh), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((batch, hidden), jnp.float32),
            pltpu.VMEM((batch, hidden), jnp.float32),
        ],
        interpret=interpret,
    )(xp_p, mask_p, h_prev_seq, c_prev_seq, c_seq, dh_out_p, wh, wht)
    return dxp[:t_steps], h_prev_seq[:t_steps]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def pallas_lstm(xp, mask, wh, hidden: int, interpret: bool = False):
    """LSTM scan over time.

    xp:   [T, B, 4H] float32 — x @ Wx + b, bias folded in
    mask: [T, B, 1]  float32 — 1.0 on real frames
    wh:   [H, 4H]    float32 — recurrent weights
    ->    h_seq [T, B, H] (zero initial state; masked frames hold state)
    """
    h_seq, _ = _fwd_call(xp, mask, wh, hidden, interpret)
    return h_seq[: xp.shape[0]]


def _pallas_lstm_fwd(xp, mask, wh, hidden, interpret):
    h_seq, c_seq = _fwd_call(xp, mask, wh, hidden, interpret)
    # residuals stay time-padded for the chunked backward kernel
    return h_seq[: xp.shape[0]], (xp, mask, wh, h_seq, c_seq)


def _pallas_lstm_bwd(hidden, interpret, res, dh_out):
    xp, mask, wh, h_seq, c_seq = res
    dxp, h_prev_seq = _bwd_call(
        xp, mask, h_seq, c_seq, dh_out, wh, hidden, interpret
    )
    # weight gradient as one big MXU contraction outside the kernel
    dwh = jnp.einsum(
        "tbh,tbg->hg", h_prev_seq, dxp, precision=_PREC,
        preferred_element_type=jnp.float32,
    ).astype(wh.dtype)
    dmask = jnp.zeros_like(mask)
    return dxp.astype(xp.dtype), dmask, dwh


pallas_lstm.defvjp(_pallas_lstm_fwd, _pallas_lstm_bwd)
