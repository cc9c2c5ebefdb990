#!/usr/bin/env python
"""Internal benchmark: streaming-inference latency and throughput.

Measures the serving-latency story the batch RTF number cannot show:
with `predict --stream`, the first words arrive while audio is still
playing.  Reports, for a synthetic long utterance decoded in
``--chunk_seconds`` chunks:

- ``first_chunk_latency_ms``: wall time from the first audio chunk to
  its decoded ids (featurizer warm; the jit compile is excluded by a
  warmup pass — persistent cache makes real CLI runs match).
- ``rtf_stream``: audio-seconds per wall-second over the whole stream.
- ``rtf_batch``: the same model+features run whole-utterance (the
  non-streaming predict path) for comparison.

    python benchmarks/bench_stream.py [--platform cpu] [--seconds 60]
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=60.0)
    ap.add_argument("--chunk_seconds", type=float, default=1.0)
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--chunk_frames", type=int, default=128)
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu)")
    args = ap.parse_args()
    if args.platform:
        from asr_study_tpu.utils.platform import select_platform

        select_platform(args.platform)
    from asr_study_tpu.utils.platform import setup_compilation_cache

    setup_compilation_cache()
    import jax
    import jax.numpy as jnp

    from asr_study_tpu.features.audio import MFCC
    from asr_study_tpu.models.zoo import build_model
    from asr_study_tpu.ops.ctc import greedy_decode
    from asr_study_tpu.streaming import StreamingRecognizer

    feature = MFCC(d=True, dd=True)
    model = build_model(
        "deep_gru",
        {"num_hiddens": args.hidden, "num_layers": args.layers,
         "bidirectional": False, "dropout": 0.0},
        num_classes=27,
    )
    params = model.init(jax.random.PRNGKey(0), feature.num_feats)

    sr = feature.fs
    rng = np.random.default_rng(0)
    t = np.arange(int(args.seconds * sr)) / sr
    wav = (0.4 * np.sin(2 * np.pi * 180 * t)
           + 0.05 * rng.standard_normal(len(t))).astype(np.float32)
    step = int(args.chunk_seconds * sr)

    # warm the jitted chunk program (compile excluded from latency)
    warm = StreamingRecognizer(model, params, feature,
                               chunk_frames=args.chunk_frames)
    warm.push(wav[: args.chunk_frames * 160 + 400])
    warm.finish()

    rec = StreamingRecognizer(model, params, feature,
                              chunk_frames=args.chunk_frames)
    t0 = time.perf_counter()
    rec.push(wav[:step])
    first_latency = time.perf_counter() - t0
    for lo in range(step, len(wav), step):
        rec.push(wav[lo: lo + step])
    ids = rec.finish()
    stream_wall = time.perf_counter() - t0

    # batch path: one whole-utterance program (compile excluded)
    feats = feature(wav)
    x = jnp.asarray(feats)[None]
    ln = jnp.asarray([len(feats)], jnp.int32)

    @jax.jit
    def batch_infer(p, x, ln):
        return greedy_decode(
            model.apply(p, x, ln, train=False), ln,
            blank_id=model.blank_id,
        )

    np.asarray(batch_infer(params, x, ln)[0])
    t0 = time.perf_counter()
    feats = feature(wav)
    dec, lens = batch_infer(params, jnp.asarray(feats)[None], ln)
    np.asarray(dec), np.asarray(lens)
    batch_wall = time.perf_counter() - t0

    print(json.dumps({
        "metric": "streaming_inference",
        "audio_s": args.seconds,
        "chunk_seconds": args.chunk_seconds,
        "first_chunk_latency_ms": round(first_latency * 1e3, 1),
        "rtf_stream": round(args.seconds / stream_wall, 1),
        "rtf_batch": round(args.seconds / batch_wall, 1),
        "decoded_ids": len(ids),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
