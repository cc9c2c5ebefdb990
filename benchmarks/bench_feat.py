#!/usr/bin/env python
"""Featurizer stub-probe benchmark: where do the fused kernel's ms live?

    python benchmarks/bench_feat.py [--platform cpu] [--small]
        [--stages empty framing dft pspec_mel full_kernel full]

VERDICT r3 #3 asks for a factorized (Cooley-Tukey) DFT to attack the
featurizer's 1.5 ms vs its 0.17 ms FLOP floor.  Before building it, this
probe measures a LADDER of stripped kernel variants — identical grid,
BlockSpecs, and input pipeline to features/pallas_fbank.py, with later
stages of the compute chain removed — so each stage's marginal cost is a
subtraction of two measured numbers (the method the LN-LSTM stats probe
used).  If the DFT matmuls are NOT the dominant term, an 8x FLOP cut
cannot reach the target and the honest outcome is the recorded ceiling.

Stages (each includes all previous):
- empty:       read the input views, write one of them (pipeline + IO)
- framing:     + lane-concat the hop views and window-multiply
- dft:         + the two [L, K] DFT matmuls (re/im), write re
- pspec_mel:   + power spectrum, mel projection, log
- full_kernel: + DCT, lifter, energy column (mfcc) — the production kernel
- full:        the real PallasFeaturizer._transform (adds XLA deltas +
               finalize OUTSIDE the kernel; cross-checks the ladder's top)

Methodology matches bench.py's chip loop: distinct batches scanned inside
one jitted program, reduced to a checksum; one dispatch + one scalar
fetch per timing round; MIN over rounds.
"""

import argparse
import functools
import json
import re
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from asr_study_tpu.features.pallas_fbank import (     # noqa: E402
    PallasFeaturizer, _TT, _dft_dot,
)
from asr_study_tpu.utils.platform import (            # noqa: E402
    setup_compilation_cache,
)

SR = 16000


def _probe_kernel(*refs, n_parts, nfft, log_floor, stage, bb=1):
    """pallas_fbank._fbank_kernel with the chain truncated at ``stage``.
    The mfcc branch mirrors the production kernel exactly at
    stage='full_kernel' (cross-checked against PallasFeaturizer output
    by the 'full' run's checksum being close).  ``bb`` > 1 processes a
    batch-blocked [bb, TT, ...] block per grid step (static row loop)."""
    if stage.startswith("empty_noin"):
        # no view inputs at all: pure grid + const-residency + output cost
        out_ref = refs[6]
        for i in range(bb):
            out_ref[i, :, :] = jnp.zeros_like(out_ref[i, :, :])
        return
    views = refs[:n_parts]
    cos_ref, sin_ref, win_ref, mel_ref, dct_ref, lift_ref = refs[
        n_parts: n_parts + 6
    ]
    out_ref = refs[n_parts + 6]
    ncep = out_ref.shape[-1]

    for i in range(bb):
        if stage.startswith(("empty", "empty_al")):
            out_ref[i, :, :] = views[0][i, :, :ncep]
            continue
        frames = jnp.concatenate([v[i, :, :] for v in views], axis=-1)
        frames = frames * win_ref[0, :]
        if stage.startswith("framing"):
            out_ref[i, :, :] = frames[:, :ncep]
            continue
        re = _dft_dot(frames, cos_ref[...])
        im = _dft_dot(frames, sin_ref[...])
        if stage.startswith("dft"):
            out_ref[i, :, :] = (re + im)[:, :ncep]
            continue
        if stage.startswith("fold"):
            # ATTACK variant (r5): 1/nfft folded into the mel table
            # (exact: nfft is a power of two) and the energy column rides
            # the same matmul as an appended all-(1/nfft) mel column — no
            # [TT, K] scale pass, no [TT, K] sum reduction.
            pspec = re * re + im * im
            both = jnp.dot(pspec, mel_ref[...],
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
            nfilt = both.shape[-1] - 1
            feat = jnp.log(jnp.maximum(both[:, :nfilt], log_floor))
            log_e = jnp.log(
                jnp.maximum(both[:, nfilt: nfilt + 1], log_floor)
            )
            cep = jnp.dot(feat, dct_ref[...],
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
            cep = cep * lift_ref[0, :]
            col = jax.lax.broadcasted_iota(jnp.int32, cep.shape, 1)
            cep = jnp.where(col == 0, log_e, cep)
            if cep.shape[-1] < ncep:
                cep = jnp.pad(cep, ((0, 0), (0, ncep - cep.shape[-1])))
            out_ref[i, :, :] = cep
            continue
        pspec = (re * re + im * im) * (1.0 / nfft)
        if stage.startswith("ps_only"):
            out_ref[i, :, :] = pspec[:, :ncep]
            continue
        if stage.startswith("ps_melhl"):
            # ATTACK: 3-pass hi/lo error-compensated mel matmul (vs
            # HIGHEST's 6 passes).  Unlike the DFT dots — where hi/lo
            # error is amplified by near-silent mel channels — pspec and
            # the mel weights are both NONNEGATIVE, so the dot has no
            # cancellation and the relative error stays ~2^-17.
            x_hi = pspec.astype(jnp.bfloat16)
            x_lo = (pspec - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            w = mel_ref[...]
            w_hi = w.astype(jnp.bfloat16)
            w_lo = (w - w_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            feat = jnp.dot(x_hi, w_lo, preferred_element_type=jnp.float32)
            feat += jnp.dot(x_lo, w_hi, preferred_element_type=jnp.float32)
            feat += jnp.dot(x_hi, w_hi, preferred_element_type=jnp.float32)
            feat = jnp.log(jnp.maximum(feat, log_floor))
            out_ref[i, :, :] = feat[:, :ncep]
            continue
        if stage.startswith("ps_meldef"):
            # bound: raw 1-pass bf16 mel matmul (NOT parity-safe)
            feat = jnp.dot(pspec, mel_ref[...],
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.DEFAULT)
            feat = jnp.log(jnp.maximum(feat, log_floor))
            out_ref[i, :, :] = feat[:, :ncep]
            continue
        feat = jnp.dot(pspec, mel_ref[...],
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        if stage.startswith("ps_melmm"):        # mel matmul, no log
            out_ref[i, :, :] = feat[:, :ncep]
            continue
        feat = jnp.log(jnp.maximum(feat, log_floor))
        if stage.startswith("pspec_mel"):
            out_ref[i, :, :] = feat[:, :ncep]
            continue
        cep = jnp.dot(feat, dct_ref[...],
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
        cep = cep * lift_ref[0, :]
        energy = jnp.sum(pspec, axis=-1, keepdims=True)
        log_e = jnp.log(jnp.maximum(energy, log_floor))
        col = jax.lax.broadcasted_iota(jnp.int32, cep.shape, 1)
        cep = jnp.where(col == 0, log_e, cep)
        if cep.shape[-1] < ncep:    # *_fpad: lane-padded output block
            cep = jnp.pad(cep, ((0, 0), (0, ncep - cep.shape[-1])))
        out_ref[i, :, :] = cep


def probe_transform(f: PallasFeaturizer, stage: str, interpret: bool):
    """A _transform clone that runs the probe kernel.  Setup (prep, hop
    views, operator tables, BlockSpecs) mirrors pallas_fbank.py line for
    line so only the in-kernel chain differs between stages."""

    def _transform(wavs, wav_lengths):
        m = re.search(r"_b(\d+)$", stage)
        bb = int(m.group(1)) if m else 1
        batch, _ = wavs.shape
        assert batch % bb == 0, (batch, bb)
        wavs = wavs.astype(f.dtype)
        wav_lengths = wav_lengths.astype(jnp.int32)
        pre, t_out, feat_lengths = f._prep(wavs, wav_lengths)
        hop = f.frame_step
        t_pad = ((t_out + _TT - 1) // _TT) * _TT
        n_tiles = t_pad // _TT
        n_parts = -(-f.frame_len // hop)
        l_pad = n_parts * hop
        n_rows = t_pad + n_parts
        need = n_rows * hop
        if need > pre.shape[1]:
            pre = jnp.pad(pre, ((0, 0), (0, need - pre.shape[1])))
        rows = pre[:, :need].reshape(batch, n_rows, hop)
        aligned = stage.endswith("_al")
        hop_blk = -(-hop // 128) * 128 if aligned else hop
        if aligned:
            # lane-aligned hop rows: each view row padded to a multiple of
            # 128 lanes so every HBM->VMEM block copy is tile-contiguous;
            # the operator tables are scattered to the alive positions so
            # the chain's math is unchanged (dead lanes are zero and hit
            # zero window / zero DFT rows).
            views = [
                jnp.pad(rows[:, j: j + t_pad, :],
                        ((0, 0), (0, 0), (0, hop_blk - hop)))
                for j in range(n_parts)
            ]
        else:
            views = [rows[:, j: j + t_pad, :] for j in range(n_parts)]
        cos, sin, win = f._cos, f._sin, f._window
        if l_pad > f.frame_len:
            z = l_pad - f.frame_len
            cos = jnp.pad(cos, ((0, z), (0, 0)))
            sin = jnp.pad(sin, ((0, z), (0, 0)))
            win = jnp.pad(win, ((0, z),))
        if aligned:
            alive = np.concatenate(
                [np.arange(j * hop_blk, j * hop_blk + hop)
                 for j in range(n_parts)]
            )
            l_al = n_parts * hop_blk
            cos = jnp.zeros((l_al, cos.shape[1]), cos.dtype).at[alive].set(cos)
            sin = jnp.zeros((l_al, sin.shape[1]), sin.dtype).at[alive].set(sin)
            win = jnp.zeros((l_al,), win.dtype).at[alive].set(win)
            l_pad = l_al
        k_bins = f.nfft // 2 + 1
        mel = f._fbank
        if stage.startswith("fold"):
            # scale fold is EXACT (1/nfft is a power of two); the energy
            # column makes the sum ride the MXU instead of the VPU
            mel = jnp.concatenate(
                [mel, jnp.ones((mel.shape[0], 1), mel.dtype)], axis=1
            ) * (1.0 / f.nfft)
        if "_kpad" in stage:
            # lane-pad the INTERNAL spectral dim: K=257 (2 tiles + 1 lane)
            # makes every elementwise op on re/im/pspec mask its last
            # partial vreg; zero DFT columns + zero mel rows keep the
            # math bit-exact (dead bins contribute 0 to mel and energy)
            k_pad = -(-k_bins // 128) * 128
            cos = jnp.pad(cos, ((0, 0), (0, k_pad - k_bins)))
            sin = jnp.pad(sin, ((0, 0), (0, k_pad - k_bins)))
            mel = jnp.pad(mel, ((0, k_pad - k_bins), (0, 0)))
            k_bins = k_pad
        kernel = functools.partial(
            _probe_kernel, n_parts=n_parts, nfft=f.nfft,
            log_floor=f.log_floor, stage=stage, bb=bb,
        )
        view_specs = [
            pl.BlockSpec((bb, _TT, hop_blk), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(n_parts)
        ]
        if stage.startswith("empty_noin"):
            views, view_specs = [], []
        f_out = (128 if ("_fpad" in stage or bb > 1 or
                         stage.startswith("empty_noin"))
                 else f.num_cep)
        const_specs = [
            pl.BlockSpec((l_pad, k_bins), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((l_pad, k_bins), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l_pad), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_bins, mel.shape[1]), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f.nfilt, f.num_cep), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f.num_cep), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        base = pl.pallas_call(
            kernel,
            grid=(batch // bb, n_tiles),
            in_specs=view_specs + const_specs,
            out_specs=pl.BlockSpec((bb, _TT, f_out),
                                   lambda b, t: (b, t, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((batch, t_pad, f_out),
                                           f.dtype),
            interpret=interpret,
        )(*views, cos, sin, win[None, :], mel, f._dct,
          f._lift[None, :])
        # *_fpad pays its un-pad slice here, inside the timed region
        return base[:, :t_out, : f.num_cep], feat_lengths

    return _transform


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument(
        "--stages", nargs="*",
        default=["empty", "framing", "dft", "pspec_mel", "full_kernel",
                 "full"],
        help="also: empty_noin (no view inputs: grid+const+output cost), "
             "empty_al / full_al (lane-aligned hop rows, 160->256), "
             "ps_only / ps_melmm (finer cuts of the pspec->mel->log "
             "chain), fold_fpad (ATTACK: 1/nfft folded into the mel "
             "table + energy as an appended mel column — compare vs "
             "full_kernel_fpad)",
    )
    args = ap.parse_args()
    if args.platform:
        from asr_study_tpu.utils.platform import select_platform

        select_platform(args.platform)
    setup_compilation_cache()
    interpret = jax.default_backend() != "tpu"

    batch = 4 if args.small else 32
    n_batches = 2 if args.small else 4
    n_pad = (int((1.0 if args.small else 8.0) * SR) + 2048) // 2048 * 2048
    rng = np.random.RandomState(0)
    wav_stack = jnp.asarray(
        rng.randn(n_batches, batch, n_pad).astype(np.float32) * 0.1
    )
    lens = jnp.full((n_batches, batch), n_pad, jnp.int32)

    f = PallasFeaturizer(kind="mfcc", d=True, dd=True, interpret=interpret)

    def timed(label, transform):
        @jax.jit
        def loop(stack, lens):
            def body(acc, wl):
                wavs, ln = wl
                feats, fl = transform(wavs, ln)
                return acc + feats.sum() + fl.sum().astype(jnp.float32), None
            reps_w = jnp.concatenate([stack] * args.reps)
            reps_l = jnp.concatenate([lens] * args.reps)
            acc, _ = jax.lax.scan(body, jnp.float32(0), (reps_w, reps_l))
            return acc

        ref = float(loop(wav_stack, lens))
        best = float("inf")
        for _ in range(args.rounds):
            t0 = time.perf_counter()
            got = float(loop(wav_stack, lens))
            best = min(best, time.perf_counter() - t0)
        assert got == ref
        ms = best * 1000.0 / (n_batches * args.reps)
        print(f"{label:12s} {ms:8.3f} ms/batch", flush=True)
        return ms

    res = {}
    for stage in args.stages:
        tr = (f._transform if stage == "full"
              else probe_transform(f, stage, interpret))
        res[stage] = timed(stage, tr)
    print(json.dumps({
        "metric": "featurizer_stage_ms_per_batch", "unit": "ms",
        "precision_env": "ASR_FEAT_MM_PRECISION",
        **res,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
