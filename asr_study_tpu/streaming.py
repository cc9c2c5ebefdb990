"""Streaming (chunked) inference: unbounded-length transcription at
bounded memory and bounded latency.

The reference's predict path (and this repo's batch path) pads the WHOLE
utterance before the model sees it — a one-hour recording would need the
full [T, F] feature tensor and a T-frame scan in one program.  Streaming
splits the pipeline into carried state instead:

- ``StreamingFeaturizer`` wraps the NumPy oracle (features/audio.py) with
  carried state: preemphasis carries one raw sample, framing carries the
  window overlap (in the preemphasized domain, so the oracle's zero
  tail-padding is reproduced exactly), and each Δ pass is a
  ``_DeltaStream`` that emits a row once its +2-frame future context
  exists (true edge replication at utterance start/end only).  Chunked
  output is IDENTICAL to the full-utterance oracle for every chunking
  (tested to 1e-12).
- ``AcousticModel.apply_streaming`` carries the recurrent state across
  chunks (unidirectional models only — train with
  ``--params "bidirectional=false"``).
- ``GreedyStream`` carries the previous argmax across chunks so CTC
  collapse-repeats works over chunk boundaries.

``StreamingRecognizer`` glues the three together behind push()/finish();
one jitted program serves every chunk (fixed chunk length, ragged tail
handled by the length mask).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from asr_study_tpu.features import audio


class _DeltaStream:
    """Streaming regression delta (audio.delta semantics: ±n window with
    edge replication at the TRUE sequence boundaries).  push(rows, final)
    emits the delta rows whose windows are complete."""

    def __init__(self, n: int = 2):
        self.n = n
        self.denom = 2.0 * sum(i * i for i in range(1, n + 1))
        self.weights = np.arange(-n, n + 1, dtype=np.float64)
        self._hist: Optional[np.ndarray] = None  # rows [start, total)
        self._start = 0
        self._emitted = 0
        self._total = 0

    def push(self, rows: np.ndarray, final: bool) -> np.ndarray:
        if len(rows):
            rows = np.asarray(rows, np.float64)
            self._hist = (
                rows if self._hist is None or not len(self._hist)
                else np.vstack([self._hist, rows])
            )
            self._total += len(rows)
        n, total = self.n, self._total
        last_ready = total - 1 - (0 if final else n)
        count = last_ready - self._emitted + 1
        if count <= 0 or self._hist is None:
            return np.zeros((0, self._hist.shape[1] if self._hist is not
                             None else 0), np.float64)
        t = np.arange(self._emitted, last_ready + 1)[:, None]
        idx = np.clip(t + np.arange(-n, n + 1)[None, :], 0, total - 1)
        window = self._hist[idx - self._start]      # [count, 2n+1, F]
        out = np.einsum("k,tkf->tf", self.weights, window) / self.denom
        self._emitted = last_ready + 1
        keep_from = max(self._emitted - n, 0)
        self._hist = self._hist[keep_from - self._start:]
        self._start = keep_from
        return out


class StreamingFeaturizer:
    """Chunked drop-in for the FBank/LogFbank/MFCC oracles.

    push(samples) -> newly-complete [t, F] feature rows (possibly empty);
    finish() -> the final rows (tail-padded frame + delta flush).
    Per-utterance CMVN (mean_norm/var_norm) is rejected: it needs global
    statistics and has no streaming form.
    """

    def __init__(self, feature: audio.Feature):
        if feature.mean_norm or feature.var_norm:
            raise ValueError(
                "per-utterance CMVN cannot stream (global statistics); "
                "build the feature without mean_norm/var_norm"
            )
        if not isinstance(feature, (audio.MFCC, audio.LogFbank,
                                    audio.FBank)):
            raise ValueError(
                f"unsupported feature type {type(feature).__name__}"
            )
        if getattr(feature, "center", False):
            raise ValueError(
                "streaming does not support center=True (librosa) framing:"
                " centered frames need future samples and an end-of-stream"
                " reflection; use convention='reference'"
            )
        self.feature = feature
        self.frame_len = int(round(feature.win_len * feature.fs))
        self.frame_step = int(round(feature.win_step * feature.fs))
        self._window = audio.get_window(feature.window)(self.frame_len)
        f = feature
        self._fb = audio.mel_filterbank(
            f.nfilt, f.nfft, f.fs, f.low_freq, f.high_freq, f.htk,
            construction=f.filterbank, norm=f.fb_norm,
        )
        if isinstance(f, audio.MFCC):
            self._dct = audio.dct2_ortho_matrix(f.nfilt, f.num_cep)
        # The oracles CHAIN delta passes off the previous column
        # (``out.append(delta(out[-1], 2))``), so d/dd reduce to a count
        # of chained passes: d-only and dd-only are one pass, d+dd two.
        n_passes = int(getattr(f, "d", False)) + int(getattr(f, "dd", False))
        self._deltas = [_DeltaStream(2) for _ in range(n_passes)]
        self._pre = np.zeros((0,), np.float64)  # preemphasized, unframed
        self._prev_raw: Optional[float] = None
        self._frames_done = 0
        self._samples_seen = 0
        # per-column queues of ready rows: base, then one per delta pass
        self._q: List[List[np.ndarray]] = [
            [] for _ in range(1 + n_passes)
        ]
        self._finished = False

    @property
    def num_feats(self) -> int:
        return self.feature.num_feats

    # -- per-frame (streaming-safe) part of the oracle chain ---------------
    def _base_rows(self, frames: np.ndarray) -> np.ndarray:
        f = self.feature
        pspec = audio.power_spectrum(frames * self._window[None, :], f.nfft)
        energy = np.sum(pspec, axis=1)
        energy = np.where(energy == 0, np.finfo(np.float64).eps, energy)
        feat = pspec @ self._fb.T
        feat = np.where(feat == 0, np.finfo(np.float64).eps, feat)
        feat = f._floor(feat)
        energy = f._floor(energy)
        if isinstance(f, audio.MFCC):
            cep = audio.lifter(np.log(feat) @ self._dct.T, f.cep_lifter)
            if f.append_energy:
                cep[:, 0] = np.log(energy)
            return cep
        if isinstance(f, audio.LogFbank):
            out = np.log(feat)
            if f.append_energy:
                out = np.hstack([out, np.log(energy)[:, None]])
            return out
        return feat  # FBank (linear)

    def push(self, samples: np.ndarray) -> np.ndarray:
        assert not self._finished, "push() after finish()"
        samples = np.asarray(samples).reshape(-1)
        self._samples_seen += len(samples)
        if len(samples):
            # causal preemphasis with a one-sample carry, in the INPUT
            # dtype (the oracle computes x[1:] - c*x[:-1] without
            # promoting, so f32 wavs must round identically here)
            if self._prev_raw is None:
                pre = np.append(
                    samples[0], samples[1:] - self.feature.preemph
                    * samples[:-1]
                )
            else:
                shifted = np.concatenate(
                    [np.asarray([self._prev_raw], samples.dtype),
                     samples[:-1]]
                )
                pre = samples - np.asarray(
                    self.feature.preemph, samples.dtype
                ) * shifted
            self._pre = np.concatenate([self._pre.astype(pre.dtype), pre])
            self._prev_raw = samples[-1]
        n_ready = (
            0 if len(self._pre) < self.frame_len
            else 1 + (len(self._pre) - self.frame_len) // self.frame_step
        )
        return self._advance(n_ready, final=False)

    def finish(self) -> np.ndarray:
        assert not self._finished
        self._finished = True
        if self._samples_seen == 0:
            return np.zeros((0, self.num_feats), np.float32)
        nf = audio.num_frames(
            self._samples_seen, self.frame_len, self.frame_step
        )
        rest = nf - self._frames_done
        if rest > 0:
            # zero-pad in the PREEMPHASIZED domain: the oracle
            # preemphasizes first, then pads frames with zeros
            need = (rest - 1) * self.frame_step + self.frame_len
            if need > len(self._pre):
                self._pre = np.concatenate(
                    [self._pre, np.zeros(need - len(self._pre))]
                )
        return self._advance(rest, final=True)

    def _advance(self, n_new: int, final: bool) -> np.ndarray:
        if n_new > 0:
            idx = (
                np.arange(self.frame_len)[None, :]
                + self.frame_step * np.arange(n_new)[:, None]
            )
            base = self._base_rows(self._pre[idx])
            self._pre = self._pre[n_new * self.frame_step:]
            self._frames_done += n_new
        else:
            base = np.zeros((0, 0), np.float64)
        cols = 1 + len(self._deltas)
        if len(base):
            self._q[0].append(base)
        rows = base
        for i, stream in enumerate(self._deltas):
            rows = stream.push(rows, final)
            if len(rows):
                self._q[i + 1].append(rows)
        ready = [
            np.vstack(q) if q else np.zeros((0, 1), np.float64)
            for q in self._q[:cols]
        ]
        k = min(len(r) for r in ready)
        if k == 0:
            return np.zeros((0, self.num_feats), np.float32)
        out = np.hstack([r[:k] for r in ready])
        for i in range(cols):
            rest = ready[i][k:]
            self._q[i] = [rest] if len(rest) else []
        return np.ascontiguousarray(out, np.float32)


class GreedyStream:
    """CTC greedy decoding with carried collapse state: argmax per frame,
    emit on change, drop blanks — across chunk boundaries."""

    def __init__(self, blank_id: int):
        self.blank_id = blank_id
        self._prev = blank_id
        self.ids: List[int] = []

    def push(self, logits: np.ndarray) -> None:
        """logits [t, V+1] for the new frames (batch row already selected)."""
        for tok in np.argmax(logits, axis=-1):
            tok = int(tok)
            if tok != self._prev and tok != self.blank_id:
                self.ids.append(tok)
            self._prev = tok


class BeamStream:
    """Streaming CTC prefix beam search: the dense beam state
    (ops/beam.py) carries across chunks; decoded prefixes are spliced on
    the host from each chunk's backpointer reconstruction."""

    def __init__(self, blank_id: int, beam_width: int = 16,
                 prune: int = 0, lm=None, lm_alpha: float = 1.0,
                 lm_beta: float = 0.0):
        import jax
        import jax.numpy as jnp

        from asr_study_tpu.ops import beam as beam_ops

        self.blank_id = blank_id
        self.beam_width = beam_width
        self._state = beam_ops.beam_stream_init(
            beam_width, 0 if lm is None else lm.init_state()
        )
        self._prefixes: List[List[int]] = [[] for _ in range(beam_width)]

        import functools

        @functools.partial(jax.jit, static_argnums=())
        def chunk(log_its, valid, state):
            lp = jax.nn.log_softmax(log_its, axis=-1)
            return beam_ops.beam_stream_chunk(
                lp, valid, state, beam_width, blank_id, prune,
                lm=lm, lm_alpha=lm_alpha, lm_beta=lm_beta,
            )

        self._chunk = chunk
        self._jnp = jnp

    def push(self, logits: np.ndarray, n_valid: Optional[int] = None
             ) -> None:
        """logits [t, V+1] for the new frames (blank = last id)."""
        t = len(logits)
        if t == 0:
            return
        valid = np.arange(t) < (t if n_valid is None else n_valid)
        self._state, pref, emits, slots, _ = self._chunk(
            self._jnp.asarray(logits), self._jnp.asarray(valid),
            self._state,
        )
        pref = np.asarray(pref)
        emits = np.asarray(emits)
        slots = np.asarray(slots)
        self._prefixes = [
            self._prefixes[slots[w]] + pref[w, : emits[w]].tolist()
            for w in range(self.beam_width)
        ]

    @property
    def ids(self) -> List[int]:
        scores = np.asarray(
            np.logaddexp(np.asarray(self._state[2]),
                         np.asarray(self._state[3]))
        )
        return self._prefixes[int(np.argmax(scores))]


class MultiStreamRecognizer:
    """N concurrent audio streams decoded by ONE jitted program per tick —
    the production-serving shape: the batch dimension carries independent
    callers, per-stream recurrent state rides the same carries, and a
    stream with no ready frames this tick passes a zero length (the
    masked scan holds its state exactly).

    push(stream, samples) buffers audio per stream; tick() runs one
    [N, chunk_frames, F] model step over whatever is ready; finish(stream)
    flushes that stream and returns its ids.  Greedy decoding per stream.
    """

    def __init__(self, model, params, feature: audio.Feature,
                 n_streams: int, chunk_frames: int = 128):
        import jax
        import jax.numpy as jnp

        if any(l.bidirectional for l in model.rnn.layers):
            raise ValueError(
                "streaming needs a unidirectional model; train with "
                '--params "bidirectional=false"'
            )
        self.model = model
        self.params = params
        self.n = n_streams
        self.chunk_frames = chunk_frames
        self.feature = feature
        self.feats = [StreamingFeaturizer(feature) for _ in range(n_streams)]
        self.carries = model.init_stream_carries(n_streams)
        self.decoders = [GreedyStream(model.blank_id)
                         for _ in range(n_streams)]
        self._pending = [
            np.zeros((0, feature.num_feats), np.float32)
            for _ in range(n_streams)
        ]
        self._done = [False] * n_streams

        @jax.jit
        def step(params, feats, n_valid, carries):
            return model.apply_streaming(params, feats, n_valid, carries)

        self._step = step
        self._jnp = jnp

    def push(self, stream: int, samples: np.ndarray) -> None:
        assert not self._done[stream], "push() after finish()"
        rows = self.feats[stream].push(samples)
        if len(rows):
            self._pending[stream] = (
                np.vstack([self._pending[stream], rows])
                if len(self._pending[stream]) else rows
            )

    def tick(self) -> None:
        """One jitted step over every stream's ready frames (up to
        chunk_frames each; streams with nothing ready hold state)."""
        cf = self.chunk_frames
        f_dim = self.feature.num_feats
        batch = np.zeros((self.n, cf, f_dim), np.float32)
        n_valid = np.zeros((self.n,), np.int32)
        for s in range(self.n):
            k = min(cf, len(self._pending[s]))
            if k:
                batch[s, :k] = self._pending[s][:k]
                self._pending[s] = self._pending[s][k:]
                n_valid[s] = k
        if not n_valid.any():
            return
        logits, self.carries = self._step(
            self.params, self._jnp.asarray(batch),
            self._jnp.asarray(n_valid), self.carries,
        )
        logits = np.asarray(logits)
        for s in range(self.n):
            if n_valid[s]:
                self.decoders[s].push(logits[s, : n_valid[s]])

    def finish(self, stream: int) -> List[int]:
        """Flush one stream (others keep running) and return its ids."""
        assert not self._done[stream]
        rows = self.feats[stream].finish()
        if len(rows):
            self._pending[stream] = (
                np.vstack([self._pending[stream], rows])
                if len(self._pending[stream]) else rows
            )
        while len(self._pending[stream]):
            self.tick()
        self._done[stream] = True
        return self.decoders[stream].ids


class StreamingRecognizer:
    """wav chunks in, transcript ids out — bounded memory at any length.

    Glues StreamingFeaturizer -> AcousticModel.apply_streaming (carried
    recurrent state) -> GreedyStream.  ``chunk_frames`` fixes the jitted
    program's shape; ragged feature chunks are padded and masked.
    """

    def __init__(self, model, params, feature: audio.Feature,
                 chunk_frames: int = 512, beam_width: int = 0,
                 prune: int = 0, lm=None, lm_alpha: float = 1.0,
                 lm_beta: float = 0.0):
        import jax
        import jax.numpy as jnp

        bidi = any(l.bidirectional for l in model.rnn.layers)
        if bidi:
            raise ValueError(
                "streaming needs a unidirectional model (the backward "
                "direction reads the future); train with "
                '--params "bidirectional=false"'
            )
        self.model = model
        self.params = params
        self.feat = StreamingFeaturizer(feature)
        self.chunk_frames = chunk_frames
        self.carries = model.init_stream_carries(1)
        self.decoder = (
            BeamStream(model.blank_id, beam_width, prune,
                       lm=lm, lm_alpha=lm_alpha, lm_beta=lm_beta)
            if beam_width > 0 else GreedyStream(model.blank_id)
        )
        self._pending = np.zeros((0, feature.num_feats), np.float32)

        @jax.jit
        def step(params, feats, n_valid, carries):
            logits, carries = model.apply_streaming(
                params, feats, jnp.asarray([n_valid], jnp.int32), carries
            )
            return logits, carries

        self._step = step
        self._jnp = jnp

    def push(self, samples: np.ndarray) -> None:
        self._consume(self.feat.push(samples), final=False)

    def finish(self) -> List[int]:
        self._consume(self.feat.finish(), final=True)
        return self.decoder.ids

    def _consume(self, rows: np.ndarray, final: bool) -> None:
        if len(rows):
            self._pending = (
                np.vstack([self._pending, rows]) if len(self._pending)
                else rows
            )
        cf = self.chunk_frames
        while len(self._pending) >= cf or (final and len(self._pending)):
            n = min(cf, len(self._pending))
            chunk = self._pending[:n]
            self._pending = self._pending[n:]
            if n < cf:
                chunk = np.pad(chunk, ((0, cf - n), (0, 0)))
            logits, self.carries = self._step(
                self.params, chunk[None], n, self.carries
            )
            self.decoder.push(np.asarray(logits)[0, :n])
