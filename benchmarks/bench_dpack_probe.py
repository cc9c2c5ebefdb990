#!/usr/bin/env python
"""dpack decode stub probe: decompose the kernel's ms/batch into its
DMA-wait, bit-plane-expansion, and cumsum-chain terms (VERDICT r4 #3 —
close the dpack book the way the featurizer/backward books were closed).

    python benchmarks/bench_dpack_probe.py [--platform cpu] [--small]

The shipped kernel (ops/pallas_dpack.py) per block: DMA 16 plane rows
from the payload's HBM residence into VMEM (double-buffered across the
sequential grid), a 16-pass masked-shift bit-plane expansion to [16,256]
deltas, a lane-axis Hillis-Steele cumsum (8 rolls), a sublane-axis
row-prefix Hillis-Steele (4 rolls), and the SMEM-carried cross-block
sample carry.  This probe times the REAL kernel against stripped
variants with IDENTICAL grid, scratch, DMA issue/wait structure, output
writes, and serial carry chain:

- real:     ops/pallas_dpack.dpack_decode as shipped
- dma:      DMA + wait + output write only; expansion and both cumsums
            replaced by a cast of the fetched rows (the floor any
            compute attack converges to)
- noexpand: the 16-pass expansion replaced by one mask (planes used as
            deltas directly); both cumsums + carry kept (ceiling for
            attacking the expansion passes)
- nocumsum: expansion kept; lane cumsum + row prefixes replaced by one
            add of the running carry; carry updated from one row
            (ceiling for attacking the Hillis-Steele chains)

Stubs break parity by construction — they bound, they don't ship.
MIN over rounds; scanned reps inside one program (tunnel-amortized).
"""

import argparse
import functools
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from asr_study_tpu.data import wire                    # noqa: E402
from asr_study_tpu.ops import pallas_dpack as PD       # noqa: E402
from asr_study_tpu.utils.platform import (             # noqa: E402
    setup_compilation_cache,
)

SR = 16000
_GROUP, _GPB = PD._GROUP, PD._GPB


def _stub_kernel(rs_ref, w_ref, pay_ref, out_ref, scr, carry_ref, sems, *,
                 g: int, nsteps: int, interpret: bool, variant: str):
    """ops/pallas_dpack._kernel with one stage stubbed per ``variant``.
    The DMA double-buffering, grid sequencing, SMEM carry, and output
    writes are identical to the shipped kernel.

    ``onecopy`` is an ATTACK variant, not a stub (bit-identical compute):
    the g blocks of one step occupy a CONTIGUOUS payload row range
    (row_start is the width cumsum), so ONE big copy per step replaces
    the g per-block copies — the probe showed the DMA floor is per-copy
    issue cost (~1.5 us x 757 copies/batch), not bandwidth — and each
    block's rows are then sliced from VMEM at its dynamic in-step offset
    (legal: the sliced dim is the untiled leading dim, the same property
    the per-block DMA descriptors rely on)."""
    j = pl.program_id(0)
    slot = jax.lax.rem(j, 2)
    onecopy = variant == "onecopy"
    rows_cap = g * _GROUP + _GROUP

    def _issue(step, into_slot):
        if onecopy:
            pltpu.make_async_copy(
                pay_ref.at[pl.ds(rs_ref[step * g], rows_cap)],
                scr.at[into_slot],
                sems.at[into_slot, 0],
            ).start()
            return
        for b in range(g):
            pltpu.make_async_copy(
                pay_ref.at[pl.ds(rs_ref[step * g + b], _GROUP)],
                scr.at[into_slot, b],
                sems.at[into_slot, b],
            ).start()

    @pl.when(j == 0)
    def _():
        carry_ref[0, 0] = 0
        _issue(j, slot)

    @pl.when(j + 1 < nsteps)
    def _():
        _issue(j + 1, 1 - slot)

    def _wait(b):
        if onecopy:
            if b == 0:
                pltpu.make_async_copy(
                    pay_ref.at[pl.ds(rs_ref[j * g], rows_cap)],
                    scr.at[slot],
                    sems.at[slot, 0],
                ).wait()
            return
        pltpu.make_async_copy(
            pay_ref.at[pl.ds(rs_ref[j * g + b], _GROUP)],
            scr.at[slot, b],
            sems.at[slot, b],
        ).wait()

    def _rows(b):
        if onecopy:
            off = rs_ref[j * g + b] - rs_ref[j * g]
            return scr[slot, pl.ds(off, _GROUP), 0, :]
        return scr[slot, b, :, 0, :]

    ii = jax.lax.broadcasted_iota(jnp.int32, (_GROUP, _GPB), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (_GROUP, _GPB), 1)
    acc = jnp.zeros((1, _GPB), jnp.int32) + carry_ref[0, 0]

    for b in range(g):
        _wait(b)
        if variant == "dma":
            # consume the fetched rows so the copies can't be elided;
            # no expansion, no cumsums, no carry math
            out_ref[b * _GROUP: (b + 1) * _GROUP, :] = (
                _rows(b).astype(jnp.float32) * (1.0 / 32768.0)
            )
            continue
        w = w_ref[j * g + b]
        planes = jnp.where(ii < w, _rows(b), 0)

        if variant == "noexpand":
            d = (planes >> 1) ^ -(planes & 1)      # un-zigzag only
        else:
            u = jnp.zeros((_GROUP, _GPB), jnp.int32)
            for p in range(_GROUP):
                u = u | (((planes[p: p + 1, :] >> ii) & 1) << p)
            d = (u >> 1) ^ -(u & 1)

        if variant == "nocumsum":
            # keep the serial cross-block dependence (one row add) but
            # drop both Hillis-Steele chains and the row-prefix combine
            rows = d + acc
            wrapped = ((rows + 32768) & 0xFFFF) - 32768
            out_ref[b * _GROUP: (b + 1) * _GROUP, :] = (
                wrapped.astype(jnp.float32) * (1.0 / 32768.0)
            )
            acc = acc + d[_GROUP - 1: _GROUP, :]
            continue

        x = d
        s = 1
        while s < _GPB:
            r = jnp.roll(x, s, axis=1) if interpret else pltpu.roll(
                x, s, 1
            )
            x = x + jnp.where(col >= s, r, 0)
            s *= 2
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
        acc = acc + inc[_GROUP - 1: _GROUP, :]

    if variant != "dma":
        carry_ref[0, 0] = acc[0, 0]


def stub_decode(payload, row_start, widths, scap, variant, interpret):
    """dpack_decode's pallas_call wrapping ``_stub_kernel``."""
    nbcap = scap // PD._BLOCK
    g = min(PD._G, nbcap)
    nb_pad = -(-nbcap // g) * g
    rows_cap = g * _GROUP + _GROUP
    onecopy = variant == "onecopy"
    n_planes = -(-payload.shape[0] // _GPB)
    r_pad = n_planes + (rows_cap if onecopy else _GROUP)
    pay = jnp.pad(payload, (0, r_pad * _GPB - payload.shape[0]))
    pay = (pay.astype(jnp.int32) & 0xFFFF).reshape(r_pad, 1, _GPB)
    rs = jnp.pad(row_start.astype(jnp.int32), (0, nb_pad - nbcap),
                 mode="edge" if onecopy and nbcap else "constant")
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
            pltpu.VMEM(
                (2, rows_cap, 1, _GPB) if onecopy
                else (2, g, _GROUP, 1, _GPB),
                jnp.int32,
            ),
            pltpu.SMEM((1, 1), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 1) if onecopy else (2, g)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_stub_kernel, g=g, nsteps=nb_pad // g,
                          interpret=interpret, variant=variant),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb_pad * _GROUP, _GPB),
                                       jnp.float32),
        interpret=interpret,
    )(rs, ws, pay)
    return out.reshape(-1)[:scap]


def synth_batches(rng, n_batches, batch, seconds):
    batches = []
    for _ in range(n_batches):
        wavs = []
        for d in rng.uniform(*seconds, size=batch):
            n = int(d * SR)
            t = np.arange(n) / SR
            f0 = rng.uniform(80, 250)
            sig = sum(np.sin(2 * np.pi * f0 * (k + 1) * t) / (k + 1)
                      for k in range(4))
            sig += 0.1 * rng.randn(n)
            wavs.append((sig / np.abs(sig).max() * 0.5).astype(np.float32))
        batches.append(wavs)
    return batches


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="")
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--variants", nargs="*",
                    default=["real", "dma", "noexpand", "nocumsum"])
    args = ap.parse_args()
    if args.platform:
        from asr_study_tpu.utils.platform import select_platform

        select_platform(args.platform)
    setup_compilation_cache()
    interpret = jax.default_backend() != "tpu"

    batch = 4 if args.small else 32
    n_batches = 2 if args.small else 8
    seconds = (0.5, 1.0) if args.small else (3.0, 8.0)
    rng = np.random.RandomState(0)
    batches = synth_batches(rng, n_batches, batch, seconds)

    # the same wire regions dpack_unpack carves out of the flat buffer
    cap, scap = wire.dpack_measure(batches, batch)
    d_stack = jnp.asarray(np.stack([
        wire.pack_audio(w, cap, batch=batch, codec="dpack", scap=scap)
        for w in batches
    ]))
    nbcap = scap // PD._BLOCK
    hdr = 2 * batch

    def decode_with(flat, variant):
        widths = flat[hdr: hdr + nbcap].astype(jnp.int32)
        csum = jnp.cumsum(widths)
        payload = flat[hdr + nbcap:]
        rs = (csum - widths).astype(jnp.int32)
        if variant == "real":
            return PD.dpack_decode(payload, rs, widths, scap,
                                   interpret=interpret)
        return stub_decode(payload, rs, widths, scap, variant, interpret)

    def timed(variant):
        @jax.jit
        def loop(stack):
            def body(acc, flat):
                s = decode_with(flat, variant)
                return acc + s.sum(), None
            reps = jnp.concatenate([stack] * args.reps)
            acc, _ = jax.lax.scan(body, jnp.float32(0), reps)
            return acc

        ref = float(loop(d_stack))                   # compile + warm
        best = float("inf")
        for _ in range(args.rounds):
            t0 = time.perf_counter()
            got = float(loop(d_stack))               # fetch = the sync
            best = min(best, time.perf_counter() - t0)
        assert got == ref
        ms = best * 1000.0 / (n_batches * args.reps)
        print(f"{variant:10s} {ms:8.3f} ms/batch")
        return ms

    res = {v: timed(v) for v in args.variants}
    if "onecopy" in args.variants:
        # onecopy is an attack, not a stub: must be bit-identical
        a = jax.jit(lambda f: decode_with(f, "real"))(d_stack[0])
        b = jax.jit(lambda f: decode_with(f, "onecopy"))(d_stack[0])
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        print("onecopy: bit-identical to real", flush=True)
    out = {"metric": "dpack_decode_stub_probe_ms", "unit": "ms/batch",
           "scap": scap, **res}
    if "real" in res:
        for v in ("dma", "noexpand", "nocumsum"):
            if v in res:
                out[f"headroom_{v}"] = round(res["real"] - res[v], 4)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
