"""Pallas TPU dpack wire decode: payload bit planes -> float32 samples.

Why: the XLA dpack decode (data/wire.py) costs ~3.5 ms/batch on v5e —
half of it an 89-step assembly scan whose only job is moving each
block's variable-offset payload window into a dense [nbcap, 16, 256]
tensor, the rest a 16-pass HBM-materialized plane expansion plus a
log-step cumsum over the whole sample stream.  All three collapse into
ONE kernel here: each grid step's g blocks occupy a CONTIGUOUS payload
row range (row_start is the width cumsum), so ONE DMA descriptor per
step moves them from the payload's HBM residence into VMEM (the dynamic
offset rides the descriptor, not an XLA slice; r5 — the earlier
per-block descriptors cost ~1.5 µs EACH in issue overhead, 757/batch),
the bit-plane expansion happens on VMEM-resident [16, 256] tiles sliced
at each block's dynamic in-step offset, and the delta reconstruction is
a lane-wise Hillis-Steele cumsum + a sublane-scan row prefix with the
running carry held in SMEM across the (sequential) grid.  Nothing but
the payload is read from HBM and nothing but the samples is written.

Layout contract (v2, data/wire.py): block j owns plane rows
[row_start[j], row_start[j] + widths[j]) of the payload viewed as
[*, 256] int16 words; plane p, word m, bit i = bit p of block sample
256*i + m.  The expanded [16, 256] tile is therefore the block's 4096
samples in flat row-major order — no transpose anywhere.

The payload ref stays in HBM (memory_space=ANY) and every per-block
copy indexes only the LEADING dim of a [rows, 1, 256] view — the form
Mosaic accepts at arbitrary dynamic offsets (sublane-dim dynamic slices
must be 8-aligned, which payload offsets are not; see the repo's Mosaic
notes).  Blocks whose width is 0 (all-zero deltas, or tail padding past
nbcap) still copy 16 rows of neighbouring payload — harmless, the
(p < width) mask zeroes every plane before expansion.

Bit-exactness vs the pcm16 wire path is tested in tests/test_wire.py
(interpret mode on CPU; the TPU build is exercised by bench.py and
predict --on_device --wire_codec dpack).

[ref: predict.py — the reference's serving path feeds raw host numpy;
this kernel is the decode half of the TPU-native compressed transport.]
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK = 4096     # samples per dpack block
_GROUP = 16       # bits per word == plane count == sample rows per block
_GPB = 256        # payload words per plane
_G = 8            # blocks decoded per grid step (DMA/issue amortization)


def _kernel(rs_ref, w_ref, pay_ref, out_ref, scr, carry_ref, sems, *,
            g: int, nsteps: int, interpret: bool):
    j = pl.program_id(0)
    slot = jax.lax.rem(j, 2)
    rows_cap = g * _GROUP + _GROUP

    # Cross-step double buffering: the grid is SEQUENTIAL (the sample
    # carry chains through SMEM), so without prefetch every step stalls
    # on its plane copy.  Step j issues step j+1's copy into the other
    # scratch slot before doing its own compute; step 0 issues its own
    # first.
    #
    # ONE contiguous copy per step (r5): the step's g blocks occupy a
    # contiguous payload row range (row_start is the width cumsum), so a
    # single rows_cap-row descriptor replaces g per-block copies.  The r5
    # stub probe measured the old per-block form's DMA floor at ~1.5 µs
    # PER DESCRIPTOR (757/batch — issue cost, not bandwidth); the single
    # copy is a bit-identical 1.66 -> 1.11 ms/batch win (BENCHMARKS.md).
    # rows_cap over-reads up to 16+slack rows past the step's real widths
    # — in bounds by construction (r_pad pads the payload by rows_cap)
    # and masked off below.  Each block's rows are then sliced from VMEM
    # at its dynamic in-step offset; legal because the sliced dim is the
    # untiled leading dim (the same property the per-block descriptors
    # relied on).
    def _issue(step, into_slot):
        pltpu.make_async_copy(
            pay_ref.at[pl.ds(rs_ref[step * g], rows_cap)],
            scr.at[into_slot],
            sems.at[into_slot, 0],
        ).start()

    @pl.when(j == 0)
    def _():
        carry_ref[0, 0] = 0
        _issue(j, slot)

    @pl.when(j + 1 < nsteps)
    def _():
        _issue(j + 1, 1 - slot)

    def _wait():
        # reconstruct the descriptor (same src/dst/sem) to wait on it
        pltpu.make_async_copy(
            pay_ref.at[pl.ds(rs_ref[j * g], rows_cap)],
            scr.at[slot],
            sems.at[slot, 0],
        ).wait()

    def _rows(b):
        off = rs_ref[j * g + b] - rs_ref[j * g]
        return scr[slot, pl.ds(off, _GROUP), 0, :]

    ii = jax.lax.broadcasted_iota(jnp.int32, (_GROUP, _GPB), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (_GROUP, _GPB), 1)
    # running carry kept LANE-REPLICATED [1, 256]: a [1, 1] carry forces
    # Mosaic to broadcast in both sublanes and lanes at the `rows` add
    # below, which it refuses ("Not implemented"); a scalar SMEM read
    # splats fine, and the block-total update (row 15 of the prefix
    # tile) is already lane-uniform, so no [1, 1] value ever exists.
    acc = jnp.zeros((1, _GPB), jnp.int32) + carry_ref[0, 0]

    _wait()
    for b in range(g):
        w = w_ref[j * g + b]
        # [16, 256] plane words; planes >= width are over-read garbage
        planes = jnp.where(ii < w, _rows(b), 0)

        # bit-plane expansion: u[i, m] = sum_p ((planes[p, m] >> i) & 1)
        # << p — each plane row broadcasts over the 16 sample rows with
        # a per-row shift; 16 uniform VPU passes, no control flow.
        # (A 4-level butterfly bit-transpose — nominally half the vreg
        # passes — measured SLOWER: 2.02 vs 1.85 ms/batch, r4; the
        # cross-sublane rolls cost more than the broadcast shifts.)
        u = jnp.zeros((_GROUP, _GPB), jnp.int32)
        for p in range(_GROUP):
            u = u | (((planes[p: p + 1, :] >> ii) & 1) << p)
        d = (u >> 1) ^ -(u & 1)                        # un-zigzag

        # lane-wise inclusive cumsum (Hillis-Steele over the 256 lanes);
        # int32 wraps are fine — deltas are mod-2^16 residuals and only
        # the low 16 bits of the running sum are meaningful.
        x = d
        s = 1
        while s < _GPB:
            r = jnp.roll(x, s, axis=1) if interpret else pltpu.roll(
                x, s, 1
            )
            x = x + jnp.where(col >= s, r, 0)
            s *= 2

        # row prefixes: the block's 16 sample rows chain through each
        # other, but the chain is just an exclusive cumsum of the 16 row
        # TOTALS (each row's last lane).  r3 walked the rows with 16
        # sequential [1, 256] updates — ~11k dependent VPU ops per batch,
        # the kernel's dominant serial term (BENCHMARKS.md r4).  Instead:
        # one sublane-axis Hillis-Steele over the totals (4 rolls), one
        # [16, 256] add, ONE block-wide write.
        totb = x[:, _GPB - 1: _GPB] + jnp.zeros((_GROUP, _GPB), jnp.int32)
        inc = totb
        s = 1
        while s < _GROUP:
            r = jnp.roll(inc, s, axis=0) if interpret else pltpu.roll(
                inc, s, 0
            )
            inc = inc + jnp.where(ii >= s, r, 0)
            s *= 2
        rows = x + (inc - totb) + acc
        wrapped = ((rows + 32768) & 0xFFFF) - 32768
        out_ref[b * _GROUP: (b + 1) * _GROUP, :] = (
            wrapped.astype(jnp.float32) * (1.0 / 32768.0)
        )
        # block total = row 15's inclusive prefix (lane-uniform by
        # construction, so the carry stays [1, 256] with no broadcast)
        acc = acc + inc[_GROUP - 1: _GROUP, :]

    carry_ref[0, 0] = acc[0, 0]


def dpack_decode(payload: jax.Array, row_start: jax.Array,
                 widths: jax.Array, scap: int, *,
                 g: int | None = None,
                 interpret: bool = False) -> jax.Array:
    """Decode a dpack payload region to float32 samples (k / 32768).

    ``payload``: int16 [P], the wire words after the length header and
    widths region (trailing words past the last block's payload are
    never interpreted).  ``row_start``/``widths``: int32 [scap // 4096],
    each block's first plane row (exclusive width cumsum) and bit width.
    ``g``: blocks decoded per grid step (default ``_G``; a tuning knob
    for benchmarks/bench_dpack_decode.py --g).  Returns float32 [scap]
    in flat sample order, bit-identical to the pcm16 path's
    normalization.
    """
    if scap % _BLOCK:
        raise ValueError(f"scap must be a multiple of {_BLOCK}")
    nbcap = scap // _BLOCK
    g = min(_G if g is None else g, nbcap)
    nb_pad = -(-nbcap // g) * g

    # plane-row view with rows_cap rows of over-read room: every step's
    # single rows_cap-row copy stays in bounds even when the step's
    # total width is small.  int32, not int16: the copy slices a size-1
    # middle dim, and int16's (2, 1)-packed VMEM tiling rejects size-1
    # second-minor slices (Mosaic: "must be aligned to tiling (2)") —
    # int32's packing is 1.  The unsigned-word conversion rides the same
    # XLA pass.
    rows_cap = g * _GROUP + _GROUP
    n_planes = -(-payload.shape[0] // _GPB)
    r_pad = n_planes + rows_cap
    pay = jnp.pad(payload, (0, r_pad * _GPB - payload.shape[0]))
    pay = (pay.astype(jnp.int32) & 0xFFFF).reshape(r_pad, 1, _GPB)

    # tail blocks edge-pad row_start (NOT zero): each block's in-step
    # VMEM offset is rs[b] - rs[step*g], which must stay >= 0 inside a
    # partially padded final step
    rs = jnp.pad(row_start.astype(jnp.int32), (0, nb_pad - nbcap),
                 mode="edge")
    ws = jnp.pad(widths.astype(jnp.int32), (0, nb_pad - nbcap))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb_pad // g,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (g * _GROUP, _GPB), lambda j, *_: (j, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, rows_cap, 1, _GPB), jnp.int32),
            pltpu.SMEM((1, 1), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 1)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, g=g, nsteps=nb_pad // g,
                          interpret=interpret),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb_pad * _GROUP, _GPB),
                                       jnp.float32),
        interpret=interpret,
    )(rs, ws, pay)
    return out.reshape(-1)[:scap]
