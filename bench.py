#!/usr/bin/env python
"""Headline benchmark: RTF (audio-sec / wall-sec / chip) for the full
inference pipeline — feature extraction + BLSTM + CTC greedy decode — on
LapsBM-shaped utterances (BASELINE.json config 2; target > 50x real time
per chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is value / 50 (the driver's north-star target; the reference
itself has no published numbers — BASELINE.md).

Methodology:
- LapsBM audio is not shipped in this image, so the benchmark synthesizes
  batches with LapsBM-like durations (~3-8 s at 16 kHz), padded to one
  static bucket so a single compiled program serves every batch.
- Wavs cross host->device as int16 (they are PCM16 on disk anyway) and are
  converted to float inside the jitted program — halves transfer bytes,
  which profiling showed dominates wall time in this environment.
- The featurizer is the fused Pallas kernel (features/pallas_fbank.py),
  falling back to the XLA matmul-DFT path if Pallas lowering fails.
- Steady-state throughput over several in-flight batches (async dispatch
  pipelines H2D with compute), wall-clocked end to end.
"""

import json
import sys
import time

import numpy as np

# Run on whatever the environment provides (TPU under the driver; CPU works
# too, just slower). Do NOT force a platform here.
import jax
import jax.numpy as jnp

from asr_study_tpu.models.zoo import build_model
from asr_study_tpu.ops.ctc import greedy_decode

SR = 16000
BATCH = 32
N_BATCHES = 4
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


def make_featurizer():
    try:
        from asr_study_tpu.features.pallas_fbank import PallasFeaturizer

        return PallasFeaturizer(kind="mfcc", d=True, dd=True), "pallas"
    except Exception:
        from asr_study_tpu.features.device import DeviceFeaturizer

        return DeviceFeaturizer(kind="mfcc", d=True, dd=True), "xla"


def main() -> int:
    rng = np.random.RandomState(0)
    batches = []
    total_audio = 0.0
    n_pad = int(SECONDS[1] * SR + 2048) // 2048 * 2048
    for _ in range(N_BATCHES):
        wavs, audio_s = synth_batch(rng)
        total_audio += audio_s
        buf = np.zeros((BATCH, n_pad), np.int16)
        lens = np.zeros((BATCH,), np.int32)
        for i, w in enumerate(wavs):
            buf[i, : len(w)] = (w * 32767.0).astype(np.int16)
            lens[i] = len(w)
        batches.append((buf, lens))

    featurizer, feat_kind = make_featurizer()
    model = build_model(
        "deep_blstm", {"num_hiddens": 256, "num_layers": 2, "dropout": 0.0},
        num_classes=27,
    )
    params = model.init(jax.random.PRNGKey(0), featurizer.num_feats)

    @jax.jit
    def infer(params, wav_i16, wav_lengths):
        wavs_f = wav_i16.astype(jnp.float32) * (1.0 / 32768.0)
        feats, feat_lengths = featurizer._transform(wavs_f, wav_lengths)
        logits = model.apply(params, feats, feat_lengths, train=False)
        return greedy_decode(logits, feat_lengths, blank_id=model.blank_id)

    def run(buf, lens):
        return infer(params, jnp.asarray(buf), jnp.asarray(lens))

    def fetch(outs):
        # On some backends block_until_ready is effectively a no-op (the
        # wait happens at value fetch), so HONEST timing must materialize
        # the outputs on the host — which the user needs anyway.
        return [(np.asarray(d), np.asarray(l)) for d, l in outs]

    # warmup + compile (try pallas; fall back to XLA features on failure)
    try:
        fetch([run(*batches[0])])
    except Exception:
        if feat_kind == "pallas":
            from asr_study_tpu.features.device import DeviceFeaturizer

            featurizer = DeviceFeaturizer(kind="mfcc", d=True, dd=True)
            feat_kind = "xla"
            infer._clear_cache()
            fetch([run(*batches[0])])
        else:
            raise

    # steady state: dispatch all batches (queue overlaps H2D with compute),
    # then fetch every decoded output
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [run(*b) for b in batches]
        fetch(outs)
        times.append(time.perf_counter() - t0)
    wall = min(times)
    rtf = total_audio / wall
    print(json.dumps({
        "metric": "rtf_feature_blstm_greedy_lapsbm_like",
        "value": round(rtf, 2),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(rtf / TARGET_RTF, 3),
        "featurizer": feat_kind,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
