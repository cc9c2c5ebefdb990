#!/usr/bin/env python
"""CTC-kernel stub probe: decompose the 1.5 ms loss+grad and bound every
attack class (the last un-probed book — featurizer, backward scan, and
dpack all have measured ceilings; CTC's "~0.5 ms floor, cause: logadd
transcendentals" was asserted, never measured).

    python benchmarks/bench_ctc_probe.py [--platform cpu] [--small]

The train-step CTC cost at the flagship shape (B=32, T=512, L=48 ->
S=97, s_pad=128) is ~1.5 ms for loss+grad (BENCHMARKS.md stage table).
That splits into: XLA ops outside the kernels (log_softmax, one-hot
emission einsum + its scatter transpose, dlp elementwise) and two Pallas
kernels (alpha forward, beta/gamma backward), each T serial frames of:
2 lattice lane-rolls, a 3-way logadd, the emission add, a floor clamp,
and the validity select.

Ladder (identical grid/BlockSpecs/chunking/serial deps as the real
kernels; stubs break parity by construction — they bound, don't ship):

- fwd/bwd real:     ops/pallas_ctc._fwd_call/_bwd_call as SHIPPED —
                    which, since the r5 probe's finding landed, means
                    the fused one-shot 3-way logadd
                    (m + log(e^(a-m)+e^(b-m)+e^(c-m)); serial
                    transcendental depth 2)
- fwd/bwd chained3: the r4-era baseline arm the fused form replaced:
                    two chained stable logadds (exp->log1p, depth 4).
- fwd/bwd fused3:   the shipped fused form IN THE SAME STUB HARNESS as
                    chained3 — the controlled A/B for the shipped win
                    (recorded: -3.4% fwd / -3.3% bwd).  Compare
                    chained3 vs fused3, NOT vs real: the stub wrapper
                    itself measures ~0.9 us/batch faster than the real
                    PC._fwd_call/_bwd_call path with IDENTICAL math
                    (program-identity-keyed scheduling; measured both
                    directions, form-independent), so cross-path
                    deltas at this scale are artifacts.
- fwd/bwd max3:     _logadd3 -> 3-way max (ceiling for ANY transcendental
                    attack: fused forms, polynomial log/exp, bf16)
- fwd/bwd noroll:   logadd kept, lane rolls -> identity (ceiling for any
                    shift/permute attack)
- fwd/bwd empty:    one max + select per frame (loop-structure floor;
                    keeps per-frame loads/stores)
- full:             loss+grad through ops/ctc.ctc_loss (pallas backend)
                    — the number the stage table tracks; outside-kernel
                    XLA cost = full - fwd - bwd.

MIN over rounds; scanned reps inside one jitted program (tunnel-
amortized); values fetched inside the timed region (block_until_ready is
a no-op on the tunnel backend).  [ref: core/ctc_utils.py — the
reference's TF C++ CTCLoss, whose cost this book closes.]
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

from asr_study_tpu.ops import pallas_ctc as PC          # noqa: E402
from asr_study_tpu.ops.ctc import (                     # noqa: E402
    LOG_EPS,
    _logadd,
    ctc_loss,
    extend_labels,
)
from asr_study_tpu.utils.platform import (              # noqa: E402
    setup_compilation_cache,
)


def _combine(variant, a, b, c):
    if variant == "max3":
        return jnp.maximum(jnp.maximum(a, b), c)
    if variant == "chained3":
        return _logadd(_logadd(a, b), c)     # the pre-r5 shipped form
    return PC._logadd3(a, b, c)              # shipped (fused since r5)


def _stub_fwd_kernel(lp_ref, valid_ref, skip_ref, alpha_out_ref, alpha_scr,
                     *, chunk, s_pad, variant, interpret):
    t = pl.program_id(0)
    batch = alpha_scr.shape[0]
    ids = jax.lax.broadcasted_iota(jnp.int32, (batch, s_pad), 1)

    @pl.when(t == 0)
    def _():
        alpha_scr[...] = jnp.where(ids == 0, 0.0, LOG_EPS)

    skip = skip_ref[...]

    def body(i, alpha):
        if variant == "empty":
            nxt = jnp.maximum(alpha, lp_ref[i])
        else:
            if variant == "noroll":
                a1, a2 = alpha, alpha + skip
            else:
                a1 = PC._roll_r(alpha, 1, ids, interpret)
                a2 = PC._roll_r(alpha, 2, ids, interpret) + skip
            nxt = _combine(variant, alpha, a1, a2) + lp_ref[i]
            nxt = jnp.maximum(nxt, LOG_EPS)
        alpha = jnp.where(valid_ref[i] > 0, nxt, alpha)
        alpha_out_ref[i] = alpha
        return alpha

    alpha_scr[...] = jax.lax.fori_loop(0, chunk, body, alpha_scr[...])


def _stub_bwd_kernel(lp_ref, valid_ref, alpha_ref, skip2_ref, end_ref,
                     gamma_ref, beta_scr, lpn_scr, vn_scr,
                     *, chunk, s_pad, s_real, variant, interpret):
    t = pl.program_id(0)
    batch = beta_scr.shape[0]
    ids = jax.lax.broadcasted_iota(jnp.int32, (batch, s_pad), 1)

    @pl.when(t == 0)
    def _():
        beta_scr[...] = end_ref[...]
        lpn_scr[...] = jnp.zeros_like(lpn_scr)
        vn_scr[...] = jnp.zeros_like(vn_scr)

    skip2 = skip2_ref[...]

    def body(k, carry):
        i = chunk - 1 - k
        beta, lp_next, v_next = carry
        be = beta + lp_next
        if variant == "empty":
            upd = jnp.maximum(be, LOG_EPS)
        else:
            if variant == "noroll":
                b1, b2 = be, be + skip2
            else:
                b1 = PC._roll_l(be, 1, s_real, ids, interpret)
                b2 = PC._roll_l(be, 2, s_real, ids, interpret) + skip2
            upd = jnp.maximum(_combine(variant, be, b1, b2), LOG_EPS)
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


def stub_fwd_call(lp_ext, valid, skip_mask, interpret, variant):
    """PC._fwd_call with the kernel swapped; setup mirrors it exactly."""
    t_steps, batch, s_pad = lp_ext.shape
    chunk = PC._budget_chunk(PC._CHUNK, t_steps, batch * (2 * s_pad + 1) * 4)
    t_pad = -(-t_steps // chunk) * chunk
    lp_p = PC._pad_time(lp_ext, t_pad)
    valid_p = PC._pad_time(valid, t_pad)
    kernel = functools.partial(
        _stub_fwd_kernel, chunk=chunk, s_pad=s_pad, variant=variant,
        interpret=interpret,
    )
    return pl.pallas_call(
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
        out_shape=jax.ShapeDtypeStruct((t_pad, batch, s_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((batch, s_pad), jnp.float32)],
        interpret=interpret,
    )(lp_p, valid_p, skip_mask)


def stub_bwd_call(lp_ext, valid, alpha_seq, skip2, end_ind, s_real,
                  interpret, variant):
    t_steps, batch, s_pad = lp_ext.shape
    t_pad = alpha_seq.shape[0]
    chunk = PC._rev_chunk(t_pad, batch * (3 * s_pad + 1) * 4)
    n_chunks = t_pad // chunk
    lp_p = PC._pad_time(lp_ext, t_pad)
    valid_p = PC._pad_time(valid, t_pad)
    rev = lambda t: (n_chunks - 1 - t, 0, 0)         # noqa: E731
    res = lambda t: (0, 0)                           # noqa: E731
    kernel = functools.partial(
        _stub_bwd_kernel, chunk=chunk, s_pad=s_pad, s_real=s_real,
        variant=variant, interpret=interpret,
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
        out_shape=jax.ShapeDtypeStruct((t_pad, batch, s_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((batch, s_pad), jnp.float32),
            pltpu.VMEM((batch, s_pad), jnp.float32),
            pltpu.VMEM((batch, 1), jnp.float32),
        ],
        interpret=interpret,
    )(lp_p, valid_p, alpha_seq, skip2, end_ind)
    return gamma[:t_steps]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--reps", type=int, default=64)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument(
        "--variants", nargs="*",
        default=["full", "fwd", "bwd", "fwd_chained3", "bwd_chained3",
                 "fwd_fused3", "bwd_fused3", "fwd_max3", "bwd_max3",
                 "fwd_noroll", "bwd_noroll", "fwd_empty", "bwd_empty"],
    )
    args = ap.parse_args()
    if args.platform:
        from asr_study_tpu.utils.platform import select_platform

        select_platform(args.platform)
    setup_compilation_cache()
    interpret = jax.default_backend() != "tpu"

    T, B, L, V = (32, 4, 6, 29) if args.small else (512, 32, 48, 29)
    s_len = 2 * L + 1
    s_pad = -(-s_len // 128) * 128
    n_sets = 2 if args.small else 4
    rng = np.random.RandomState(0)

    # lattice inputs exactly as ops/ctc.py assembles them
    logits = rng.randn(n_sets, B, T, V).astype(np.float32)
    labels = rng.randint(0, V - 1, size=(n_sets, B, L)).astype(np.int32)
    lab_len = np.full((n_sets, B), L, np.int32)
    log_len = np.full((n_sets, B), T, np.int32)

    lps, skips, ends = [], [], []
    for s in range(n_sets):
        ext = extend_labels(jnp.asarray(labels[s]), V - 1)
        ext_m2 = jnp.pad(ext, ((0, 0), (2, 0)),
                         constant_values=-1)[:, :s_len]
        can_skip = (ext != V - 1) & (ext != ext_m2)
        skip = jnp.where(can_skip, 0.0, LOG_EPS).astype(jnp.float32)
        lp = jax.nn.log_softmax(jnp.asarray(logits[s]), axis=-1)
        sel = jax.nn.one_hot(ext, V, dtype=lp.dtype)
        lp_ext = jnp.einsum("bsv,btv->tbs", sel, lp,
                            precision=jax.lax.Precision.HIGHEST)
        lps.append(jnp.pad(lp_ext, ((0, 0), (0, 0), (0, s_pad - s_len)),
                           constant_values=LOG_EPS))
        skips.append(jnp.pad(skip, ((0, 0), (0, s_pad - s_len)),
                             constant_values=LOG_EPS))
        ends.append(2 * jnp.asarray(lab_len[s]))
    lp_ext = jnp.stack(lps)                       # [n, T, B, s_pad]
    skip_mask = jnp.stack(skips)
    end = jnp.stack(ends).astype(jnp.int32)
    valid = jnp.ones((n_sets, T, B, 1), jnp.float32)
    lab_len_j = jnp.asarray(lab_len)

    # backward residuals/operands once (shared by all bwd variants)
    fwd = jax.jit(lambda lp, v, sk: PC._fwd_call(lp, v, sk, interpret))
    alpha_seq = jnp.stack([fwd(lp_ext[s], valid[s], skip_mask[s])
                           for s in range(n_sets)])
    ids = jnp.arange(s_pad)[None, :]
    skip2 = jnp.where(ids < s_len - 2, jnp.roll(skip_mask, -2, axis=2),
                      LOG_EPS)
    end_ind = jnp.where(
        (ids[None] == end[:, :, None])
        | ((ids[None] == end[:, :, None] - 1)
           & (lab_len_j[:, :, None] > 0)),
        0.0, LOG_EPS,
    ).astype(jnp.float32)

    def timed(label, fn, stacks):
        # Nested scan: reps passes over the same n_sets stack inside ONE
        # program (no materialized concatenation).  The per-call tunnel
        # round trip is ~28 ms; at the kernels' ~0.5 ms/batch scale the
        # amortization needs n_sets*reps >> 56 to resolve on-chip time.
        @jax.jit
        def loop(*st):
            def one_pass(acc, _):
                def body(a, xs):
                    return a + fn(*xs), None
                acc, _ = jax.lax.scan(body, acc, st)
                return acc, None
            acc, _ = jax.lax.scan(
                one_pass, jnp.float32(0), None, length=args.reps
            )
            return acc

        ref = float(loop(*stacks))
        best = float("inf")
        for _ in range(args.rounds):
            t0 = time.perf_counter()
            got = float(loop(*stacks))
            best = min(best, time.perf_counter() - t0)
        assert got == ref
        ms = best * 1000.0 / (n_sets * args.reps)
        print(f"{label:12s} {ms:8.3f} ms/batch", flush=True)
        return ms

    fwd_stacks = (lp_ext, valid, skip_mask)
    bwd_stacks = (lp_ext, valid, alpha_seq, skip2, end_ind)
    full_stacks = (jnp.asarray(logits), jnp.asarray(log_len),
                   jnp.asarray(labels), lab_len_j)

    def full_fn(lg, ll, lb, bl):
        def loss(lg):
            return ctc_loss(lg, ll, lb, bl, backend="pallas").sum()
        val, g = jax.value_and_grad(loss)(lg)
        return val + g.sum()

    res = {}
    for v in args.variants:
        if v == "full":
            res[v] = timed(v, full_fn, full_stacks)
        elif v == "fwd":
            res[v] = timed(v, lambda lp, va, sk: PC._fwd_call(
                lp, va, sk, interpret).sum(), fwd_stacks)
        elif v == "bwd":
            res[v] = timed(v, lambda lp, va, al, s2, ei: PC._bwd_call(
                lp, va, al, s2, ei, s_len, interpret).sum(), bwd_stacks)
        elif v.startswith("fwd_"):
            res[v] = timed(v, lambda lp, va, sk, v=v: stub_fwd_call(
                lp, va, sk, interpret, v[4:]).sum(), fwd_stacks)
        else:
            res[v] = timed(v, lambda lp, va, al, s2, ei, v=v: stub_bwd_call(
                lp, va, al, s2, ei, s_len, interpret, v[4:]).sum(),
                bwd_stacks)

    if "full" in res and "fwd" in res and "bwd" in res:
        res["outside_derived"] = res["full"] - res["fwd"] - res["bwd"]
    print(json.dumps({
        "metric": "ctc_stub_probe_ms", "unit": "ms/batch",
        "shape": f"T{T}xB{B}xL{L}xV{V}", **res,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
