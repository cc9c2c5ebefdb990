#!/usr/bin/env python
"""Headline benchmark: RTF (audio-sec / wall-sec / chip) for the full
inference pipeline — feature extraction + BLSTM + CTC greedy decode — on
LapsBM-shaped utterances (BASELINE.json config 2; target > 50x real time
per chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is value / 50 (the driver's north-star target; the reference
itself has no published numbers — BASELINE.md).

LapsBM audio is not shipped in this image, so the benchmark synthesizes a
batch with LapsBM-like durations (~3-8 s at 16 kHz, ~700-utterance corpus
scale is irrelevant for steady-state RTF).  Shapes are padded to one static
bucket so a single compiled program serves the whole batch.
"""

import json
import os
import sys
import time

import numpy as np

# Run on whatever the environment provides (TPU under the driver; CPU works
# too, just slower). Do NOT force a platform here.
import jax
import jax.numpy as jnp

from asr_study_tpu.features.device import DeviceFeaturizer
from asr_study_tpu.models.zoo import build_model
from asr_study_tpu.ops.ctc import greedy_decode

SR = 16000
BATCH = 32
SECONDS = (3.0, 8.0)          # LapsBM-like utterance durations
TARGET_RTF = 50.0


def synth_batch(rng: np.random.RandomState):
    """Synthetic speech-like wavs (mixed tones + noise), LapsBM durations."""
    durs = rng.uniform(*SECONDS, size=BATCH)
    wavs = []
    for d in durs:
        n = int(d * SR)
        t = np.arange(n) / SR
        f0 = rng.uniform(80, 250)
        sig = sum(
            np.sin(2 * np.pi * f0 * (k + 1) * t) / (k + 1) for k in range(4)
        )
        sig += 0.1 * rng.randn(n)
        wavs.append((sig / np.abs(sig).max() * 0.5).astype(np.float32))
    return wavs, float(durs.sum())


def main() -> int:
    rng = np.random.RandomState(0)
    wavs, audio_seconds = synth_batch(rng)

    # the whole pipeline — MFCC+deltas featurization, 2-layer BLSTM, greedy
    # CTC decode — is ONE jitted on-device program; the host only pads wavs
    featurizer = DeviceFeaturizer(kind="mfcc", d=True, dd=True)
    model = build_model(
        "deep_blstm", {"num_hiddens": 256, "num_layers": 2, "dropout": 0.0},
        num_classes=27,
    )
    params = model.init(jax.random.PRNGKey(0), featurizer.num_feats)

    n_max = max(len(w) for w in wavs)
    n_pad = ((n_max + 2047) // 2048) * 2048
    wav_buf = np.zeros((BATCH, n_pad), np.float32)
    wav_lengths = np.zeros((BATCH,), np.int32)
    for i, w in enumerate(wavs):
        wav_buf[i, : len(w)] = w
        wav_lengths[i] = len(w)

    @jax.jit
    def infer(params, wavs_d, wav_lengths_d):
        feats, feat_lengths = featurizer._transform(wavs_d, wav_lengths_d)
        logits = model.apply(params, feats, feat_lengths, train=False)
        return greedy_decode(logits, feat_lengths, blank_id=model.blank_id)

    def run_once():
        # host->device wav transfer is counted: it is part of the pipeline
        dec, lens = infer(
            params, jnp.asarray(wav_buf), jnp.asarray(wav_lengths)
        )
        jax.block_until_ready((dec, lens))
        return dec

    run_once()  # warmup + compile
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run_once()
        times.append(time.perf_counter() - t0)
    wall = min(times)
    rtf = audio_seconds / wall
    print(json.dumps({
        "metric": "rtf_feature_blstm_greedy_lapsbm_like",
        "value": round(rtf, 2),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(rtf / TARGET_RTF, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
