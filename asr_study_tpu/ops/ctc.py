"""CTC loss + greedy decoding, on-device.

TPU redesign of the reference's CTC glue [ref: core/ctc_utils.py], which
wrapped TF's C++ ops (``K.ctc_batch_cost``, ``tf.nn.ctc_greedy_decoder``).
Here the forward-backward recursion is a batched log-semiring ``lax.scan``
over time; gradients come from reverse-mode autodiff through the scan (the
beta recursion implicitly), so the op is differentiable, jittable, and
shard_map-compatible with no host round trips.

Conventions (match models/zoo.py): logits [B, T, V] with blank = V - 1 by
default; labels [B, L] hold class ids < blank, padded with anything (padding
beyond ``label_lengths`` never influences the loss).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

# Large-negative stand-in for log(0): keeps -inf out of the scan so that
# (-inf) - (-inf) NaNs can never appear in autodiff.
LOG_EPS = -1e30


def _logadd(a: jax.Array, b: jax.Array) -> jax.Array:
    """Numerically-stable log(exp(a) + exp(b)) without -inf hazards."""
    mx = jnp.maximum(a, b)
    mx = jnp.maximum(mx, LOG_EPS)  # both operands at floor -> result at floor
    return mx + jnp.log1p(jnp.exp(jnp.minimum(a, b) - mx))


def _logadd3(a: jax.Array, b: jax.Array, c: jax.Array) -> jax.Array:
    """One-shot stable log(e^a + e^b + e^c).

    3 parallel exps + 1 log instead of two chained ``_logadd``s (serial
    transcendental depth 2 vs 4) — on the serial per-frame critical path
    of both CTC recursions this measures −3.4% fwd / −3.3% bwd in the
    controlled same-harness A/B (r5, benchmarks/bench_ctc_probe.py
    fwd/bwd_chained3 vs fwd/bwd_fused3; ~3e-5 drift vs the chained
    form, same math).  Safety: both recursions keep their
    carry ≥ LOG_EPS, so ``mx`` is one of the args and s ≥ 1 — autodiff
    through log(s) cannot NaN; all-below-floor corner values (padded
    lattice states in the beta walk) yield −inf which every caller
    clamps straight back to LOG_EPS, exactly as the chained form did.
    """
    mx = jnp.maximum(jnp.maximum(a, b), c)
    mx = jnp.maximum(mx, LOG_EPS)
    s = jnp.exp(a - mx) + jnp.exp(b - mx) + jnp.exp(c - mx)
    return mx + jnp.log(s)


def extend_labels(labels: jax.Array, blank_id: int) -> jax.Array:
    """[B, L] -> [B, 2L+1] blank-interleaved: (b, l1, b, l2, ..., lL, b)."""
    batch, max_len = labels.shape
    ext = jnp.full((batch, 2 * max_len + 1), blank_id, dtype=labels.dtype)
    return ext.at[:, 1::2].set(labels)


def ctc_loss(
    logits: jax.Array,          # [B, T, V] unnormalized
    logit_lengths: jax.Array,   # [B] int, true frame counts
    labels: jax.Array,          # [B, L] int class ids (no blanks)
    label_lengths: jax.Array,   # [B] int, true label counts
    blank_id: Optional[int] = None,
    unroll: Optional[int] = None,
    backend: Optional[str] = None,
) -> jax.Array:
    """Per-sequence CTC negative log-likelihood, shape [B].

    The alpha recursion over the 2L+1 lattice [ref: core/ctc_utils.py via
    TF CTCLoss]: time-major scan; each step is a vectorized [B, S] update
    (shift + masked skip transition + per-state emission log-prob).

    ``backend``: 'scan' | 'pallas' | 'auto' (default, from
    ASR_CTC_BACKEND).  'auto' takes the fused Pallas kernels
    (ops/pallas_ctc.py — alpha forward + analytic beta backward) on TPU:
    the scan path's 2*T while-loop iterations over tiny [B, 2L+1] arrays
    are pure dispatch overhead there (~30 ms of a 42 ms BLSTM train step
    at B=32 T=512 L=48).  Both backends share this function's lattice
    setup, so they agree to float tolerance (tests/test_pallas_ctc.py).

    ``unroll`` fuses that many scan steps per XLA while-loop iteration
    (scan backend only; default from ASR_CTC_UNROLL, 8).
    """
    batch, t_max, vocab = logits.shape
    if blank_id is None:
        blank_id = vocab - 1
    labels = labels.astype(jnp.int32)
    ext = extend_labels(labels, blank_id)                  # [B, S]
    s_len = ext.shape[1]

    # Skip transition s-2 -> s allowed iff ext[s] is a real label differing
    # from ext[s-2] (Graves 2006 eq. 6).
    ext_m2 = jnp.pad(ext, ((0, 0), (2, 0)), constant_values=-1)[:, :s_len]
    can_skip = (ext != blank_id) & (ext != ext_m2)         # [B, S]
    skip_mask = jnp.where(can_skip, 0.0, LOG_EPS).astype(logits.dtype)

    log_probs = jax.nn.log_softmax(logits, axis=-1)        # [B, T, V]
    # Per-frame emission log-prob of every lattice state, as a one-hot
    # MXU contraction rather than take_along_axis: a per-element gather
    # along the minor (lane) axis costs ~18 ms on TPU at B=32 T=512 L=48
    # (and its scatter transpose again in backward); the [B,S,V] one-hot
    # matmul is microseconds, and autodiff turns it into the matching
    # scatter matmul.  HIGHEST precision keeps the selection exact (a
    # default-precision pass would round log-probs through bf16).
    sel = jax.nn.one_hot(ext, vocab, dtype=log_probs.dtype)  # [B, S, V]
    lp_ext = jnp.einsum(
        "bsv,btv->tbs", sel, log_probs,
        precision=jax.lax.Precision.HIGHEST,
    )
    frame_valid = (
        jnp.arange(t_max)[:, None] < logit_lengths[None, :]
    )                                                       # [T, B]

    from asr_study_tpu.utils.env import choice_env

    _BACKENDS = ("auto", "scan", "pallas")
    if backend is None:
        backend = choice_env("ASR_CTC_BACKEND", "auto", _BACKENDS)
    elif backend not in _BACKENDS:
        raise ValueError(
            f"ctc_loss backend={backend!r}: choose one of {_BACKENDS}"
        )
    if backend != "scan":
        on_tpu = jax.default_backend() == "tpu"
        if backend == "pallas" or on_tpu:
            from asr_study_tpu.ops import pallas_ctc

            s_pad = -(-s_len // 128) * 128
            lp_p = jnp.pad(
                lp_ext.astype(jnp.float32),
                ((0, 0), (0, 0), (0, s_pad - s_len)),
                constant_values=LOG_EPS,
            )
            skip_p = jnp.pad(
                skip_mask.astype(jnp.float32),
                ((0, 0), (0, s_pad - s_len)),
                constant_values=LOG_EPS,
            )
            nll = pallas_ctc.ctc_nll(
                lp_p,
                frame_valid.astype(jnp.float32)[..., None],
                skip_p,
                (2 * label_lengths).astype(jnp.int32),
                label_lengths.astype(jnp.int32),
                s_len,
                interpret=not on_tpu,
            )
            return jnp.minimum(nll, -LOG_EPS).astype(logits.dtype)

    # alpha_0: log 1 at the virtual pre-start state s=0, log 0 elsewhere;
    # one recurrence step then reproduces the textbook t=1 init.
    alpha0 = jnp.full((batch, s_len), LOG_EPS, logits.dtype).at[:, 0].set(0.0)

    def step(alpha, inp):
        lp_t, valid_t = inp                                 # [B, S], [B]
        a1 = jnp.pad(alpha, ((0, 0), (1, 0)), constant_values=LOG_EPS)[:, :s_len]
        a2 = jnp.pad(alpha, ((0, 0), (2, 0)), constant_values=LOG_EPS)[:, :s_len]
        nxt = _logadd3(alpha, a1, a2 + skip_mask) + lp_t
        nxt = jnp.maximum(nxt, LOG_EPS)
        # Padded frames carry alpha through unchanged.
        alpha = jnp.where(valid_t[:, None], nxt, alpha)
        return alpha, None

    if unroll is None:
        import os

        unroll = int(os.environ.get("ASR_CTC_UNROLL", "8"))
    alpha, _ = jax.lax.scan(
        step, alpha0, (lp_ext, frame_valid), unroll=max(unroll, 1)
    )

    # P(labels | x) = alpha[2L] + alpha[2L-1] (final blank / final label).
    end = (2 * label_lengths).astype(jnp.int32)             # [B]
    a_end = jnp.take_along_axis(alpha, end[:, None], axis=1)[:, 0]
    a_pre = jnp.take_along_axis(
        alpha, jnp.maximum(end - 1, 0)[:, None], axis=1
    )[:, 0]
    a_pre = jnp.where(label_lengths > 0, a_pre, LOG_EPS)
    loss = -_logadd(a_end, a_pre)
    # Infeasible sequences (2L+1 > T after repeats) surface as huge losses;
    # clamp to keep grads finite, matching TF's behavior of a finite cost.
    return jnp.minimum(loss, -LOG_EPS)


def ctc_loss_mean(
    logits, logit_lengths, labels, label_lengths,
    blank_id: Optional[int] = None,
    weights: Optional[jax.Array] = None,
) -> jax.Array:
    """Batch-mean CTC loss; ``weights`` zeroes padded rows (see data layer)."""
    per_seq = ctc_loss(logits, logit_lengths, labels, label_lengths, blank_id)
    if weights is None:
        return jnp.mean(per_seq)
    denom = jnp.maximum(jnp.sum(weights), 1.0)
    return jnp.sum(per_seq * weights) / denom


def blank_collapse(
    logits: jax.Array,          # [B, T, V]
    logit_lengths: jax.Array,   # [B]
    blank_id: Optional[int] = None,
    threshold: float = 0.99,
    keep_ratio: float = 0.6,
) -> Tuple[jax.Array, jax.Array]:
    """Compress CTC emissions by collapsing runs of blank-dominated frames
    to a single frame (Blank Collapse, arXiv:2210.17017 — near-lossless:
    consecutive frames where the blank posterior dominates only carry
    repeat-separator information, so one survivor per run suffices).

    TPU adaptation: static output shape ``T2 = ceil(T * keep_ratio)``.
    Kept frames are left-packed; in the rare case an utterance keeps more
    than T2 frames, the EARLIEST frames win and the overflow is dropped
    (choose keep_ratio with headroom; trained acoustic models emit 60-80%%
    blanks).  Returns (packed logits [B, T2, V], new lengths [B],
    dropped [B] — frames lost to the static T2 budget; nonzero values mean
    keep_ratio is too small for this model and the caller should warn).
    Apply before ``beam_search_decode`` to cut decode cost by ~1/keep_ratio.
    """
    batch, t_max, vocab = logits.shape
    if blank_id is None:
        blank_id = vocab - 1
    t2 = max(1, int(-(-t_max * keep_ratio // 1)))
    probs = jax.nn.softmax(logits, axis=-1)
    valid = jnp.arange(t_max)[None, :] < logit_lengths[:, None]
    blankish = probs[:, :, blank_id] >= threshold            # [B, T]
    prev_blankish = jnp.pad(
        blankish, ((0, 0), (1, 0)), constant_values=False
    )[:, :t_max]
    # keep every non-blank frame + the first frame of each blank run
    keep = valid & (~blankish | ~prev_blankish)              # [B, T]
    key = jnp.where(keep, jnp.arange(t_max)[None, :], t_max)
    order = jnp.argsort(key, axis=1, stable=True)[:, :t2]    # [B, T2]
    packed = jnp.take_along_axis(logits, order[..., None], axis=1)
    num_keep = jnp.sum(keep, axis=1).astype(jnp.int32)
    new_lengths = jnp.minimum(num_keep, t2)
    dropped = num_keep - new_lengths
    return packed, new_lengths, dropped


def greedy_decode(
    logits: jax.Array,          # [B, T, V]
    logit_lengths: jax.Array,   # [B]
    blank_id: Optional[int] = None,
    pad_id: int = -1,
) -> Tuple[jax.Array, jax.Array]:
    """Best-path decode: argmax -> collapse repeats -> drop blanks.

    Fully on-device replacement for ``tf.nn.ctc_greedy_decoder``
    [ref: core/ctc_utils.py::decode].  Returns (decoded [B, T] left-packed
    and padded with ``pad_id``, lengths [B]).
    """
    batch, t_max, vocab = logits.shape
    if blank_id is None:
        blank_id = vocab - 1
    preds = jnp.argmax(logits, axis=-1).astype(jnp.int32)   # [B, T]
    valid = jnp.arange(t_max)[None, :] < logit_lengths[:, None]
    prev = jnp.pad(preds, ((0, 0), (1, 0)), constant_values=-1)[:, :t_max]
    keep = valid & (preds != blank_id) & (preds != prev)

    # Left-pack kept symbols with a stable key sort (device-friendly compact).
    key = jnp.where(keep, jnp.arange(t_max)[None, :], t_max)
    order = jnp.argsort(key, axis=1, stable=True)
    packed = jnp.take_along_axis(preds, order, axis=1)
    lengths = jnp.sum(keep, axis=1).astype(jnp.int32)
    packed = jnp.where(
        jnp.arange(t_max)[None, :] < lengths[:, None], packed, pad_id
    )
    return packed, lengths
