"""Streaming inference (asr_study_tpu/streaming.py): chunked features,
carried recurrent state, and cross-chunk greedy decode must reproduce the
full-utterance pipeline exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from asr_study_tpu.features.audio import FBank, LogFbank, MFCC, Raw
from asr_study_tpu.models.zoo import build_model
from asr_study_tpu.streaming import (
    GreedyStream,
    StreamingFeaturizer,
    StreamingRecognizer,
)


def _wav(seconds=1.7, seed=0, sr=16000):
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * sr)) / sr
    sig = 0.4 * np.sin(2 * np.pi * 220 * t) + 0.05 * rng.standard_normal(
        len(t)
    )
    return sig.astype(np.float32)


def _chunks(x, sizes):
    out, i = [], 0
    k = 0
    while i < len(x):
        n = sizes[k % len(sizes)]
        out.append(x[i: i + n])
        i += n
        k += 1
    return out


@pytest.mark.parametrize("feature", [
    MFCC(d=True, dd=True),
    MFCC(d=False, dd=False),
    MFCC(d=False, dd=True),          # dd chains off the base column
    LogFbank(d=True, dd=True, append_energy=True),
    LogFbank(),
    FBank(),
    # non-default conventions stream too (only centering needs lookahead)
    MFCC(window="hann"),
    LogFbank(filterbank="librosa", fb_norm="slaney", htk=False),
])
@pytest.mark.parametrize("sizes", [
    (100,),                          # shorter than one frame (400)
    (1600,),                         # aligned to the hop
    (333, 7000, 1),                  # pathological mix
])
def test_streaming_featurizer_matches_oracle(feature, sizes):
    wav = _wav()
    ref = feature(wav)
    sf = StreamingFeaturizer(feature)
    got = [sf.push(c) for c in _chunks(wav, sizes)]
    got.append(sf.finish())
    got = np.vstack([g for g in got if len(g)])
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-10, atol=1e-10)


def test_streaming_featurizer_short_utterance():
    """A signal shorter than one frame still yields the oracle's single
    padded frame."""
    feature = MFCC(d=True, dd=True)
    wav = _wav()[:150]
    sf = StreamingFeaturizer(feature)
    out = [sf.push(wav), sf.finish()]
    got = np.vstack([g for g in out if len(g)])
    np.testing.assert_allclose(got, feature(wav), rtol=1e-10, atol=1e-10)


def test_streaming_featurizer_rejects_center_framing():
    """librosa centering reads future samples and reflects at the stream
    end — structurally incompatible with chunked streaming."""
    with pytest.raises(ValueError, match="center"):
        StreamingFeaturizer(MFCC(convention="librosa"))


def test_streaming_featurizer_rejects_cmvn_and_raw():
    with pytest.raises(ValueError, match="CMVN"):
        StreamingFeaturizer(MFCC(mean_norm=True))
    with pytest.raises(ValueError, match="unsupported"):
        StreamingFeaturizer(Raw())


@pytest.mark.parametrize("model_name", [
    "deep_gru", "deep_blstm", "ln_blstm", "mi_blstm", "zoneout_blstm",
    "highway_blstm",
])
def test_apply_streaming_matches_apply(model_name):
    """Chunked model forward with carried state == one-shot forward, for
    every signature cell (unidirectional configs) incl. skip stacking."""
    model = build_model(
        model_name,
        {"num_hiddens": 16, "num_layers": 2, "bidirectional": False,
         "dropout": 0.0},
        num_classes=5,
    )
    params = model.init(jax.random.PRNGKey(0), 7)
    t = 37
    x = jax.random.normal(jax.random.PRNGKey(1), (1, t, 7))
    ref = model.apply(params, x, jnp.asarray([t], jnp.int32), train=False)

    carries = model.init_stream_carries(1)
    outs = []
    for lo in range(0, t, 10):
        chunk = x[:, lo: lo + 10]
        n = chunk.shape[1]
        if n < 10:
            chunk = jnp.pad(chunk, ((0, 0), (0, 10 - n), (0, 0)))
        logits, carries = model.apply_streaming(
            params, chunk, jnp.asarray([n], jnp.int32), carries
        )
        outs.append(np.asarray(logits)[:, :n])
    got = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(got, np.asarray(ref), atol=1e-5)


def test_apply_streaming_rejects_bidirectional():
    model = build_model("graves2006", {"num_hiddens": 8}, num_classes=5)
    params = model.init(jax.random.PRNGKey(0), 7)
    with pytest.raises(ValueError, match="unidirectional"):
        model.apply_streaming(
            params, jnp.zeros((1, 4, 7)), jnp.asarray([4], jnp.int32),
            model.init_stream_carries(1),
        )


def test_greedy_stream_matches_batch_decode():
    from asr_study_tpu.ops.ctc import greedy_decode

    rng = np.random.default_rng(0)
    t, v = 50, 6
    logits = rng.standard_normal((1, t, v)).astype(np.float32)
    dec, lens = greedy_decode(
        jnp.asarray(logits), jnp.asarray([t], jnp.int32), blank_id=v - 1
    )
    ref = list(np.asarray(dec)[0, : int(np.asarray(lens)[0])])

    gs = GreedyStream(blank_id=v - 1)
    for lo in range(0, t, 7):
        gs.push(logits[0, lo: lo + 7])
    assert gs.ids == ref


@pytest.mark.parametrize("chunk", [7, 16, 50])
def test_beam_stream_matches_batch_beam(chunk):
    """Chunked prefix beam search == the batch decoder's best path, for
    chunk sizes below/at/above the utterance length."""
    from asr_study_tpu.ops.beam import beam_search_decode
    from asr_study_tpu.streaming import BeamStream

    rng = np.random.default_rng(4)
    t, v, w = 50, 8, 8
    logits = (2.0 * rng.standard_normal((1, t, v))).astype(np.float32)
    dec, lens, scores = beam_search_decode(
        jnp.asarray(logits), jnp.asarray([t], jnp.int32),
        beam_width=w, blank_id=v - 1,
    )
    ref = list(np.asarray(dec)[0, 0, : int(np.asarray(lens)[0, 0])])

    bs = BeamStream(blank_id=v - 1, beam_width=w)
    for lo in range(0, t, chunk):
        bs.push(logits[0, lo: lo + chunk])
    assert bs.ids == ref


def test_beam_stream_respects_valid_mask():
    """Padded tail frames must not advance the beam."""
    from asr_study_tpu.streaming import BeamStream

    rng = np.random.default_rng(5)
    t, v, w = 20, 6, 4
    logits = (2.0 * rng.standard_normal((t, v))).astype(np.float32)
    a = BeamStream(blank_id=v - 1, beam_width=w)
    a.push(logits)
    b = BeamStream(blank_id=v - 1, beam_width=w)
    b.push(np.vstack([logits, rng.standard_normal((9, v)).astype(
        np.float32)]), n_valid=t)
    assert a.ids == b.ids


def test_streaming_recognizer_beam_matches_batch():
    from asr_study_tpu.ops.beam import beam_search_decode

    feature = MFCC(d=True, dd=True)
    model = build_model(
        "deep_gru",
        {"num_hiddens": 16, "num_layers": 1, "bidirectional": False,
         "dropout": 0.0},
        num_classes=5,
    )
    params = model.init(jax.random.PRNGKey(0), feature.num_feats)
    wav = _wav(seconds=1.1, seed=7)
    feats = feature(wav)
    logits = model.apply(
        params, jnp.asarray(feats)[None],
        jnp.asarray([len(feats)], jnp.int32), train=False,
    )
    dec, lens, _ = beam_search_decode(
        logits, jnp.asarray([len(feats)], jnp.int32),
        beam_width=4, blank_id=model.blank_id,
    )
    ref = list(np.asarray(dec)[0, 0, : int(np.asarray(lens)[0, 0])])

    rec = StreamingRecognizer(model, params, feature, chunk_frames=32,
                              beam_width=4)
    for c in _chunks(wav, (5000,)):
        rec.push(c)
    assert rec.finish() == ref


def test_multi_stream_recognizer_matches_independent_streams():
    """Three interleaved concurrent streams (different lengths) must each
    decode exactly as an independent single-stream recognizer — idle
    streams hold their state through the masked batch step."""
    from asr_study_tpu.streaming import MultiStreamRecognizer

    feature = MFCC(d=True, dd=True)
    model = build_model(
        "deep_gru",
        {"num_hiddens": 16, "num_layers": 2, "bidirectional": False,
         "dropout": 0.0},
        num_classes=5,
    )
    params = model.init(jax.random.PRNGKey(0), feature.num_feats)
    wavs = [_wav(seconds=s, seed=i) for i, s in enumerate((0.9, 1.4, 0.6))]

    refs = []
    for w in wavs:
        rec = StreamingRecognizer(model, params, feature, chunk_frames=16)
        rec.push(w)
        refs.append(rec.finish())

    multi = MultiStreamRecognizer(model, params, feature, n_streams=3,
                                  chunk_frames=16)
    # interleave pushes of different sizes; tick between them
    offs = [0, 0, 0]
    sizes = (3000, 5000, 2000)
    while any(offs[i] < len(wavs[i]) for i in range(3)):
        for i in range(3):
            if offs[i] < len(wavs[i]):
                multi.push(i, wavs[i][offs[i]: offs[i] + sizes[i]])
                offs[i] += sizes[i]
        multi.tick()
    got = [None, None, None]
    got[2] = multi.finish(2)    # finish out of order: others keep running
    got[0] = multi.finish(0)
    got[1] = multi.finish(1)
    assert got == refs


def test_streaming_recognizer_matches_batch_pipeline():
    """Whole streaming stack == featurize-then-decode, chunk size chosen
    to force several jitted steps plus a ragged tail."""
    from asr_study_tpu.ops.ctc import greedy_decode

    feature = MFCC(d=True, dd=True)
    model = build_model(
        "deep_gru",
        {"num_hiddens": 16, "num_layers": 1, "bidirectional": False,
         "dropout": 0.0},
        num_classes=5,
    )
    params = model.init(jax.random.PRNGKey(0), feature.num_feats)
    wav = _wav(seconds=1.3, seed=3)

    feats = feature(wav)
    logits = model.apply(
        params, jnp.asarray(feats)[None],
        jnp.asarray([len(feats)], jnp.int32), train=False,
    )
    dec, lens = greedy_decode(
        logits, jnp.asarray([len(feats)], jnp.int32),
        blank_id=model.blank_id,
    )
    ref = list(np.asarray(dec)[0, : int(np.asarray(lens)[0])])

    rec = StreamingRecognizer(model, params, feature, chunk_frames=32)
    for chunk in _chunks(wav, (4000,)):
        rec.push(chunk)
    assert rec.finish() == ref
