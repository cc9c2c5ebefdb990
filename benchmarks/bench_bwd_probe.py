#!/usr/bin/env python
"""Backward-scan stub probe: bound what any cotangent-chain VPU
optimization could buy (VERDICT r3 #5).

    python benchmarks/bench_bwd_probe.py [--platform cpu] [--small]

The train step at the flagship 3x256 is the backward scan (ablation:
fwd+loss 2.71 ms, +grad 9.43 ms).  Per directional layer the backward
kernel runs, per frame: a gate-recompute matmul [B,H]x[H,4H], ~20 VPU
ops of gate/cotangent math, a concat, and the cotangent matmul
[B,4H]x[4H,H] — all on the serial carry chain.  This probe times the
REAL backward kernel against stripped variants with identical grid,
BlockSpecs, chunking, and serial data dependences:

- real:    ops/pallas_lstm._bwd_call as shipped
- novpu:   both matmuls + concat kept; ALL gate/cotangent VPU math
           replaced by two adds (the ceiling for any elementwise-math
           attack — bf16 chains, fused forms, refactored algebra)
- nomm2:   VPU math kept; the cotangent matmul replaced by a slice
           (the ceiling for attacking the second matmul)
- norecomp: VPU math + cotangent matmul kept; the gate-recompute
           matmul replaced by a slice of xp (the ceiling for storing
           gates instead of recomputing — at [T,B,4H] extra residency)
- fwd:     the forward kernel, for scale

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

from asr_study_tpu.ops import pallas_lstm as PL        # noqa: E402
from asr_study_tpu.utils.platform import (             # noqa: E402
    setup_compilation_cache,
)


def _stub_row_bwd(i, dh_next, dc_next, xp_ref, mask_ref, hprev_ref,
                  cprev_ref, c_ref, dh_out_ref, wh_ref, wht_ref, dxp_ref,
                  hidden: int, variant: str):
    h_prev = hprev_ref[i]
    dh = dh_out_ref[i] + dh_next

    if variant == "norecomp":
        gates = xp_ref[i]
    else:
        gates = xp_ref[i] + PL._mm(h_prev, wh_ref)

    if variant == "novpu":
        # serial deps + shapes preserved; gate/cotangent math dropped.
        # The 1e-3 damping keeps the unbounded linear chain finite over
        # T frames (NaN would break the determinism checksum); it is one
        # extra VPU op, so the stub still lower-bounds the real math.
        dpre = (gates + jnp.concatenate([dh, dh, dh, dh], axis=-1)) * 1e-3
        dc_prev = (dc_next + dh) * 0.25
    else:
        c_prev = cprev_ref[i]
        c_t = c_ref[i]
        m = mask_ref[i]
        ii = jax.nn.sigmoid(gates[:, 0 * hidden: 1 * hidden])
        f = jax.nn.sigmoid(gates[:, 1 * hidden: 2 * hidden])
        g = jnp.tanh(gates[:, 2 * hidden: 3 * hidden])
        o = jax.nn.sigmoid(gates[:, 3 * hidden: 4 * hidden])
        tc = jnp.tanh(c_t)
        do = dh * tc
        dc = dc_next + dh * o * (1.0 - tc * tc)
        di = dc * g
        df = dc * c_prev
        dg = dc * ii
        dpre = jnp.concatenate(
            [di * ii * (1.0 - ii), df * f * (1.0 - f),
             dg * (1.0 - g * g), do * o * (1.0 - o)], axis=-1)
        dpre = jnp.where(m > 0, dpre, 0.0)
        dc_prev = jnp.where(m > 0, dc * f, dc)

    if variant == "nomm2":
        dh_prev = dpre[:, :hidden] + dh
    else:
        dh_prev = PL._mm(dpre, wht_ref) + (
            0.0 if variant == "novpu" else jnp.where(mask_ref[i] > 0,
                                                     0.0, dh))
    dxp_ref[i] = dpre
    return (dh_prev, dc_prev)


def _stub_bwd_kernel(xp_ref, mask_ref, hprev_ref, cprev_ref, c_ref,
                     dh_out_ref, wh_ref, wht_ref, dxp_ref, dh_scr, dc_scr,
                     *, hidden: int, chunk: int, variant: str):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        dh_scr[...] = jnp.zeros_like(dh_scr)
        dc_scr[...] = jnp.zeros_like(dc_scr)

    def body(k, carry):
        dh_next, dc_next = carry
        return _stub_row_bwd(
            chunk - 1 - k, dh_next, dc_next, xp_ref, mask_ref, hprev_ref,
            cprev_ref, c_ref, dh_out_ref, wh_ref, wht_ref, dxp_ref,
            hidden, variant,
        )

    dh, dc = jax.lax.fori_loop(0, chunk, body, (dh_scr[...], dc_scr[...]))
    dh_scr[...] = dh
    dc_scr[...] = dc


def stub_bwd_call(xp, mask, h_seq, c_seq, dh_out, wh, hidden, interpret,
                  variant):
    """PL._bwd_call with the kernel swapped; setup mirrors it exactly."""
    t_steps, batch, gh = xp.shape
    t_pad = h_seq.shape[0]
    chunk = PL._bwd_chunk(t_pad, batch * (2 * gh + 4 * hidden) * 4)
    n_chunks = t_pad // chunk
    wht = wh.T
    xp_p = PL._pad_time(xp, t_pad)
    mask_p = PL._pad_time(mask, t_pad)
    dh_out_p = PL._pad_time(dh_out, t_pad)
    rev = lambda t: (n_chunks - 1 - t, 0, 0)             # noqa: E731
    kernel = functools.partial(_stub_bwd_kernel, hidden=hidden,
                               chunk=chunk, variant=variant)
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
    return dxp


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument(
        "--variants", nargs="*",
        default=["fwd", "real", "novpu", "nomm2", "norecomp"],
        help="also: real_c16 (backward chunk 16), real_unroll "
             "(python-unrolled inner loop, static ref indices)",
    )
    args = ap.parse_args()
    if args.platform:
        from asr_study_tpu.utils.platform import select_platform

        select_platform(args.platform)
    setup_compilation_cache()
    interpret = jax.default_backend() != "tpu"

    T, B, H = (32, 4, 64) if args.small else (512, 32, 256)
    rng = np.random.RandomState(0)
    n_sets = 2 if args.small else 4
    xp = jnp.asarray(rng.randn(n_sets, T, B, 4 * H).astype(np.float32) * .1)
    mask = jnp.ones((n_sets, T, B, 1), jnp.float32)
    dh_out = jnp.asarray(rng.randn(n_sets, T, B, H).astype(np.float32) * .1)
    wh = jnp.asarray(rng.randn(H, 4 * H).astype(np.float32) * 0.05)

    # forward residuals once (shared by all backward variants)
    fwd = jax.jit(lambda x, m: PL._fwd_call(x, m, wh, H, interpret))
    hs, cs = [], []
    for s in range(n_sets):
        h, c = fwd(xp[s], mask[s])
        hs.append(h)
        cs.append(c)
    h_seq = jnp.stack(hs)
    c_seq = jnp.stack(cs)

    def timed(label, fn):
        @jax.jit
        def loop(*stacks):
            def body(acc, xs):
                return acc + fn(*xs).sum(), None
            reps = [jnp.concatenate([s] * args.reps) for s in stacks]
            acc, _ = jax.lax.scan(body, jnp.float32(0), tuple(reps))
            return acc

        stacks = (xp, mask, h_seq, c_seq, dh_out)
        ref = float(loop(*stacks))
        best = float("inf")
        for _ in range(args.rounds):
            t0 = time.perf_counter()
            got = float(loop(*stacks))
            best = min(best, time.perf_counter() - t0)
        assert got == ref
        ms = best * 1000.0 / (n_sets * args.reps)
        print(f"{label:10s} {ms:8.3f} ms/scan", flush=True)
        return ms

    res = {}
    for v in args.variants:
        if v == "fwd":
            res[v] = timed(v, lambda x, m, h, c, d: PL._fwd_call(
                x, m, wh, H, interpret)[0])
        elif v == "real":
            res[v] = timed(v, lambda x, m, h, c, d: PL._bwd_call(
                x, m, h, c, d, wh, H, interpret)[0])
        elif v == "real_c16":
            old = PL._CHUNK_BWD
            PL._CHUNK_BWD = 16
            try:
                res[v] = timed(v, lambda x, m, h, c, d: PL._bwd_call(
                    x, m, h, c, d, wh, H, interpret)[0])
            finally:
                PL._CHUNK_BWD = old
        elif v == "real_unroll":
            import jax.experimental.pallas as _pl

            def _unrolled_kernel(xp_ref, mask_ref, hprev_ref, cprev_ref,
                                 c_ref, dh_out_ref, wh_ref, wht_ref,
                                 dxp_ref, dh_scr, dc_scr, *, hidden, chunk):
                t = _pl.program_id(0)

                @_pl.when(t == 0)
                def _():
                    dh_scr[...] = jnp.zeros_like(dh_scr)
                    dc_scr[...] = jnp.zeros_like(dc_scr)

                carry = (dh_scr[...], dc_scr[...])
                for k in range(chunk):       # static indices
                    carry = PL._lstm_row_bwd(
                        chunk - 1 - k, carry[0], carry[1], xp_ref,
                        mask_ref, hprev_ref, cprev_ref, c_ref,
                        dh_out_ref, wh_ref, wht_ref, dxp_ref, hidden,
                    )
                dh_scr[...] = carry[0]
                dc_scr[...] = carry[1]

            orig = PL._bwd_kernel
            PL._bwd_kernel = _unrolled_kernel
            try:
                res[v] = timed(v, lambda x, m, h, c, d: PL._bwd_call(
                    x, m, h, c, d, wh, H, interpret)[0])
            finally:
                PL._bwd_kernel = orig
        else:
            res[v] = timed(v, lambda x, m, h, c, d, v=v: stub_bwd_call(
                x, m, h, c, d, wh, H, interpret, v))
    print(json.dumps({
        "metric": "bwd_scan_stub_probe_ms", "unit": "ms/scan",
        "shape": f"T{T}xB{B}xH{H}", **res,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
