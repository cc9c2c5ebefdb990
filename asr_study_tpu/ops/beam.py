"""Vectorized CTC prefix beam search, fully on-device.

Replaces the reference's ``tf.nn.ctc_beam_search_decoder`` (C++ op)
[ref: core/ctc_utils.py::decode] with a dense fixed-width formulation that
jits and vmaps (SURVEY.md §7 hard-part 4):

- Beam state is dense arrays: prefixes [W, T], lengths, last-char, and the
  classic (p_blank, p_nonblank) log-prob split per prefix.
- Each frame expands W beams into W*(1+C) candidates (stay / extend-with-c),
  merges candidates that denote the same prefix, and keeps the top W.
- Prefix identity for merging is a rolling 64-bit hash carried as TWO
  independent 32-bit lanes (different multiplicative constants — uint64 is
  unavailable without jax_enable_x64); candidates are lexsorted by
  (lane1, lane2) and merged via segment-logsumexp only when BOTH lanes
  match (the "top-k + segment merges" pattern).  A spurious merge needs a
  simultaneous collision in both lanes: ~N^2/2^65 per step, negligible even
  over T=512 x B=32 x W=64 decodes (the single-lane version's ~N^2/2^33
  budget eroded at that scale — VERDICT r1).

No dynamic shapes anywhere: one lexsort + one top_k per frame, scanned over
time with ``lax.scan``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from asr_study_tpu.ops.ctc import LOG_EPS, _logadd

_HASH_MULT = jnp.uint32(0x9E3779B1)   # golden-ratio multiplier (lane 1)
_HASH_MULT2 = jnp.uint32(0x85EBCA77)  # murmur3 fmix constant (lane 2)
_HASH_INIT = jnp.uint32(1)


def _seg_logsumexp(sorted_vals, seg_ids, num_segments):
    """Log-sum-exp of ``sorted_vals`` within segments, broadcast back."""
    mx = jax.ops.segment_max(
        sorted_vals, seg_ids, num_segments=num_segments
    )
    mx = jnp.maximum(mx, LOG_EPS)
    mx_b = mx[seg_ids]
    s = jax.ops.segment_sum(
        jnp.exp(sorted_vals - mx_b), seg_ids, num_segments=num_segments
    )
    return jnp.log(jnp.maximum(s, 1e-30))[seg_ids] + mx_b


def _decode_single(
    log_probs: jax.Array,   # [T, V] log-softmax, blank = V-1
    length: jax.Array,      # scalar int
    beam_width: int,
    blank_id: int,
    pad_id: int,
    prune: int = 0,         # 0 = exact; else expand only the per-frame
                            # top-`prune` characters (standard pruning)
):
    t_max, vocab = log_probs.shape
    n_char = vocab - 1                      # extensions exclude the blank
    n_ext = n_char if prune <= 0 else min(prune, n_char)
    n_cand = beam_width * (1 + n_ext)
    w_idx = jnp.arange(beam_width)

    prefixes0 = jnp.full((beam_width, t_max), pad_id, jnp.int32)
    lengths0 = jnp.zeros((beam_width,), jnp.int32)
    last0 = jnp.full((beam_width,), -1, jnp.int32)
    # Beam 0 = the empty prefix; the rest are dead placeholders with distinct
    # hashes so they never merge with anything live.
    p_b0 = jnp.full((beam_width,), LOG_EPS).at[0].set(0.0)
    p_nb0 = jnp.full((beam_width,), LOG_EPS)
    hash0 = (jnp.uint32(0xDEAD0000) + w_idx.astype(jnp.uint32)).at[0].set(
        _HASH_INIT
    )
    hash0b = (jnp.uint32(0xBEEF0000) + w_idx.astype(jnp.uint32)).at[0].set(
        _HASH_INIT
    )

    def step(state, inp):
        prefixes, lengths, last, p_b, p_nb, hashes, hashes2 = state
        lp, valid = inp                                      # [V], scalar
        lp_blank = lp[blank_id]
        if n_ext < n_char:
            lp_c_1d, chars = jax.lax.top_k(lp[:n_char], n_ext)
            chars = chars.astype(jnp.int32)
        else:
            chars = jnp.arange(n_char, dtype=jnp.int32)
            lp_c_1d = lp[:n_char]

        # --- candidate scores -------------------------------------------
        p_tot = _logadd(p_b, p_nb)                           # [W]
        # stay (emit blank, or repeat last char without a blank between)
        stay_pb = p_tot + lp_blank                           # [W]
        lp_last = jnp.where(
            last >= 0, lp[jnp.maximum(last, 0)], LOG_EPS
        )
        stay_pnb = p_nb + lp_last                            # [W]
        # extend with char c: via-blank only if c == last, else from both
        lp_c = lp_c_1d[None, :]                              # [1, E]
        is_last = chars[None, :] == last[:, None]            # [W, E]
        ext_pnb = jnp.where(is_last, p_b[:, None], p_tot[:, None]) + lp_c
        ext_pb = jnp.full_like(ext_pnb, LOG_EPS)

        # candidate layout: n = w*(1+C) + a; a=0 stay, a>=1 extend char a-1
        cand_pb = jnp.concatenate(
            [stay_pb[:, None], ext_pb], axis=1
        ).reshape(n_cand)
        cand_pnb = jnp.concatenate(
            [stay_pnb[:, None], ext_pnb], axis=1
        ).reshape(n_cand)
        ext_hash = (
            hashes[:, None] * _HASH_MULT
            + (chars[None, :] + 1).astype(jnp.uint32)
        )
        cand_hash = jnp.concatenate(
            [hashes[:, None], ext_hash], axis=1
        ).reshape(n_cand)
        ext_hash2 = (
            hashes2[:, None] * _HASH_MULT2
            + (chars[None, :] + 1).astype(jnp.uint32)
        )
        cand_hash2 = jnp.concatenate(
            [hashes2[:, None], ext_hash2], axis=1
        ).reshape(n_cand)

        # --- merge equal prefixes (lexsort both lanes + segment
        # logsumexp); equal prefixes have equal (lane1, lane2) pairs, so
        # they land adjacent and merge iff BOTH lanes match -------------
        perm = jnp.lexsort((cand_hash2, cand_hash))
        sh = cand_hash[perm]
        sh2 = cand_hash2[perm]
        seg_start = jnp.concatenate(
            [jnp.ones((1,), bool),
             (sh[1:] != sh[:-1]) | (sh2[1:] != sh2[:-1])]
        )
        seg_ids = jnp.cumsum(seg_start) - 1
        m_pb = _seg_logsumexp(cand_pb[perm], seg_ids, n_cand)
        m_pnb = _seg_logsumexp(cand_pnb[perm], seg_ids, n_cand)
        score = jnp.where(seg_start, _logadd(m_pb, m_pnb), LOG_EPS)

        # --- keep top W -------------------------------------------------
        top_score, top_pos = jax.lax.top_k(score, beam_width)
        sel = perm[top_pos]                                  # candidate ids
        parent = sel // (1 + n_ext)
        action = sel % (1 + n_ext)               # 0=stay, else chars[a-1]

        new_prefixes = prefixes[parent]
        new_lengths = lengths[parent]
        new_last = last[parent]
        par_len = new_lengths
        ext_char = chars[jnp.maximum(action - 1, 0)].astype(jnp.int32)
        is_ext = action > 0
        onehot_pos = (
            jnp.arange(t_max)[None, :] == par_len[:, None]
        ) & is_ext[:, None]
        new_prefixes = jnp.where(
            onehot_pos, ext_char[:, None], new_prefixes
        )
        new_lengths = par_len + is_ext.astype(jnp.int32)
        new_last = jnp.where(is_ext, ext_char, new_last)
        new_hash = cand_hash[sel]
        new_hash2 = cand_hash2[sel]
        new_pb = m_pb[top_pos]
        new_pnb = m_pnb[top_pos]

        new_state = (
            new_prefixes, new_lengths, new_last, new_pb, new_pnb,
            new_hash, new_hash2,
        )
        # padded frames: carry state through unchanged
        state = jax.tree_util.tree_map(
            lambda n, o: jnp.where(
                jnp.reshape(valid, (1,) * n.ndim), n, o
            ),
            new_state, state,
        )
        return state, None

    frame_valid = jnp.arange(t_max) < length
    state, _ = jax.lax.scan(
        step,
        (prefixes0, lengths0, last0, p_b0, p_nb0, hash0, hash0b),
        (log_probs, frame_valid),
    )
    prefixes, lengths, last, p_b, p_nb, _, _ = state
    scores = _logadd(p_b, p_nb)
    order = jnp.argsort(-scores)
    return prefixes[order], lengths[order], scores[order]


def beam_search_decode(
    logits: jax.Array,          # [B, T, V]
    logit_lengths: jax.Array,   # [B]
    beam_width: int = 16,
    blank_id: Optional[int] = None,
    pad_id: int = -1,
    top_paths: int = 1,
    prune: int = 0,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """CTC prefix beam search over a batch.

    Returns (decoded [B, P, T], lengths [B, P], log_scores [B, P]) with
    ``P = top_paths`` beams ordered best-first — the shape of the reference's
    ``decode(..., beam_width=..., top_paths=...)`` API.

    ``prune > 0`` expands only the per-frame top-``prune`` characters
    (standard prefix-beam pruning): candidate count drops from
    W*(1+|V|-1) to W*(1+prune), a large speedup at negligible accuracy
    cost when the acoustic posteriors are peaked.
    """
    vocab = logits.shape[-1]
    if blank_id is None:
        blank_id = vocab - 1
    if blank_id != vocab - 1:
        raise ValueError("beam_search_decode requires blank as the last id")
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    log_probs = jnp.transpose(log_probs, (1, 0, 2))          # time-major

    def one(lp_t, ln):
        return _decode_single(
            lp_t, ln, beam_width, blank_id, pad_id, prune=prune
        )

    prefixes, lengths, scores = jax.vmap(one, in_axes=(1, 0))(
        log_probs, logit_lengths.astype(jnp.int32)
    )
    # mask tails beyond each prefix length to pad_id
    t_max = prefixes.shape[-1]
    mask = jnp.arange(t_max)[None, None, :] < lengths[..., None]
    prefixes = jnp.where(mask, prefixes, pad_id)
    return (
        prefixes[:, :top_paths],
        lengths[:, :top_paths],
        scores[:, :top_paths],
    )
