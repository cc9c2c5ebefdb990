"""Char n-gram LM (text/lm.py) + beam-search shallow fusion (ops/beam.py).

The dict-based Hannun-style reference here extends tests/test_ctc.py's
``_py_prefix_beam`` with LM scoring: every prefix-extension candidate
gains ``alpha * log p_lm(c | last order-1 chars) + beta``, contexts
space-padded at the start — the spec the vectorized decoder must match
exactly (prefixes AND combined scores).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from asr_study_tpu.ops.beam import beam_search_decode
from asr_study_tpu.text.lm import CharNGramLM, fit_ngram_lm


def _rand_lm(key, order, n_char, space_id=0):
    """A random (but proper) dense LM for parity tests."""
    s = n_char ** (order - 1)
    p = np.asarray(jax.random.uniform(key, (s, n_char))) + 0.1
    p /= p.sum(axis=1, keepdims=True)
    return CharNGramLM(np.log(p).astype(np.float32), order, space_id)


def _py_prefix_beam_lm(log_probs, length, beam_width, blank,
                       lm=None, alpha=1.0, beta=0.0):
    """Dict-based reference prefix beam search with shallow fusion."""

    def lm_state(prefix):
        s = lm.init_state()
        for c in prefix:
            s = lm.next_state(s, c)
        return s

    beams = {(): (0.0, -np.inf)}
    for t in range(length):
        lp = log_probs[t]
        new = {}

        def add(prefix, pb, pnb):
            opb, opnb = new.get(prefix, (-np.inf, -np.inf))
            new[prefix] = (np.logaddexp(opb, pb), np.logaddexp(opnb, pnb))

        for prefix, (pb, pnb) in beams.items():
            ptot = np.logaddexp(pb, pnb)
            add(prefix, ptot + lp[blank], -np.inf)
            if prefix:
                add(prefix, -np.inf, pnb + lp[prefix[-1]])
            for c in range(len(lp)):
                if c == blank:
                    continue
                bonus = 0.0
                if lm is not None:
                    bonus = alpha * float(lm.logp[lm_state(prefix), c]) \
                        + beta
                if prefix and c == prefix[-1]:
                    add(prefix + (c,), -np.inf, pb + lp[c] + bonus)
                else:
                    add(prefix + (c,), -np.inf, ptot + lp[c] + bonus)
        beams = dict(
            sorted(new.items(), key=lambda kv: -np.logaddexp(*kv[1]))
            [:beam_width]
        )
    ranked = sorted(beams.items(), key=lambda kv: -np.logaddexp(*kv[1]))
    return [(list(p), float(np.logaddexp(*v))) for p, v in ranked]


class TestFit:
    def test_rows_are_distributions(self):
        seqs = [[0, 1, 2, 1, 0], [2, 2, 1], [0, 0, 0, 1]]
        for order in (1, 2, 3):
            lm = fit_ngram_lm(seqs, order, n_char=3, space_id=2, delta=0.5)
            rows = np.exp(lm.logp).sum(axis=1)
            np.testing.assert_allclose(rows, 1.0, rtol=1e-6)
            assert lm.logp.shape == (3 ** (order - 1), 3)

    def test_bigram_hand_computed(self):
        # corpus "a b" (ids 0,1) once; C=3, space=2, delta=1
        lm = fit_ngram_lm([[0, 1]], order=2, n_char=3, space_id=2,
                          delta=1.0)
        # unigram (add-one): counts a=1, b=1, sp=0 -> p1 = [2/5, 2/5, 1/5]
        p1 = np.array([2, 2, 1]) / 5.0
        # context 'space' (start pad): count(space->a)=1, tot=1
        want_sp = (np.array([1, 0, 0]) + p1) / 2.0
        np.testing.assert_allclose(np.exp(lm.logp[2]), want_sp, rtol=1e-6)
        # context 'a': count(a->b)=1, tot=1
        want_a = (np.array([0, 1, 0]) + p1) / 2.0
        np.testing.assert_allclose(np.exp(lm.logp[0]), want_a, rtol=1e-6)
        # unseen context 'b': pure backoff
        np.testing.assert_allclose(np.exp(lm.logp[1]), p1, rtol=1e-6)

    def test_state_arithmetic(self):
        lm = _rand_lm(jax.random.PRNGKey(0), order=3, n_char=4, space_id=3)
        assert lm.init_state() == 3 * 4 + 3
        # appending c: newest char occupies digit 0
        s = lm.next_state(lm.init_state(), 2)   # context now [2, space]
        assert s == 3 * 4 + 2
        assert lm.next_state(s, 1) == 2 * 4 + 1  # context [1, 2]

    def test_score_ids_matches_chain(self):
        lm = _rand_lm(jax.random.PRNGKey(1), order=2, n_char=3, space_id=2)
        ids = [0, 1, 1, 2, 0]
        want, s = 0.0, lm.init_state()
        for c in ids:
            want += float(lm.logp[s, c])
            s = lm.next_state(s, c)
        assert abs(lm.score_ids(ids) - want) < 1e-6

    def test_save_load_roundtrip(self, tmp_path):
        lm = fit_ngram_lm([[0, 1, 2]], order=3, n_char=3, space_id=2,
                          vocab="ab ")
        path = str(tmp_path / "lm.npz")
        lm.save(path)
        lm2 = CharNGramLM.load(path)
        np.testing.assert_array_equal(lm.logp, lm2.logp)
        assert (lm2.order, lm2.space_id, lm2.vocab) == (3, 2, "ab ")

    def test_fit_rejects_bad_ids(self):
        with pytest.raises(ValueError):
            fit_ngram_lm([[0, 5]], order=2, n_char=3, space_id=2)

    def test_perplexity_prefers_matching_text(self):
        train = [[0, 1, 2, 0, 1, 2] * 3] * 4
        lm = fit_ngram_lm(train, order=3, n_char=3, space_id=2, delta=0.1)
        assert lm.perplexity([[0, 1, 2, 0, 1]]) \
            < lm.perplexity([[2, 1, 0, 2, 1]])


class TestBeamFusion:
    @pytest.mark.parametrize("seed,order", [(0, 2), (1, 2), (2, 3), (3, 1)])
    def test_matches_python_reference(self, seed, order):
        key = jax.random.PRNGKey(seed)
        k1, k2 = jax.random.split(key)
        t_max, vocab, width = 7, 4, 8
        lm = _rand_lm(k2, order, n_char=vocab - 1, space_id=vocab - 2)
        logits = jax.random.normal(k1, (1, t_max, vocab)) * 1.5
        lp = np.array(jax.nn.log_softmax(logits, axis=-1))[0]
        want = _py_prefix_beam_lm(
            lp, t_max, width, blank=vocab - 1, lm=lm, alpha=0.7, beta=0.4
        )
        dec, lens, scores = beam_search_decode(
            logits, jnp.array([t_max]), beam_width=width, top_paths=3,
            lm=lm, lm_alpha=0.7, lm_beta=0.4,
        )
        for p in range(3):
            got = dec[0, p, : int(lens[0, p])].tolist()
            assert got == want[p][0]
            np.testing.assert_allclose(
                float(scores[0, p]), want[p][1], rtol=1e-4, atol=1e-4
            )

    def test_alpha_zero_beta_zero_is_acoustic_only(self):
        key = jax.random.PRNGKey(4)
        k1, k2 = jax.random.split(key)
        logits = jax.random.normal(k1, (2, 8, 5)) * 2.0
        lens = jnp.array([8, 6])
        lm = _rand_lm(k2, 2, n_char=4, space_id=3)
        base = beam_search_decode(logits, lens, beam_width=6, top_paths=2)
        fused = beam_search_decode(
            logits, lens, beam_width=6, top_paths=2,
            lm=lm, lm_alpha=0.0, lm_beta=0.0,
        )
        for a, b in zip(base, fused):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-5)

    def test_lm_breaks_acoustic_tie(self):
        # two chars exactly tied acoustically; the LM must pick its favorite
        lp_frame = np.log(np.array([0.45, 0.45, 0.10], np.float32))
        logits = jnp.asarray(np.tile(lp_frame, (1, 3, 1)))
        logp = np.log(np.array(
            [[0.9, 0.1], [0.9, 0.1]], np.float32
        ))
        lm = CharNGramLM(logp, order=2, space_id=1)
        dec, lens, _ = beam_search_decode(
            logits, jnp.array([3]), beam_width=4,
            lm=lm, lm_alpha=1.0,
        )
        ids = dec[0, 0, : int(lens[0, 0])].tolist()
        assert ids and all(c == 0 for c in ids)

    def test_fusion_composes_with_prune(self):
        key = jax.random.PRNGKey(5)
        k1, k2 = jax.random.split(key)
        logits = jax.random.normal(k1, (1, 8, 5)) * 2.0
        lens = jnp.array([8])
        lm = _rand_lm(k2, 2, n_char=4, space_id=3)
        exact = beam_search_decode(
            logits, lens, beam_width=6, lm=lm, lm_alpha=0.6
        )
        full_prune = beam_search_decode(
            logits, lens, beam_width=6, prune=4, lm=lm, lm_alpha=0.6
        )
        for a, b in zip(exact, full_prune):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_vocab_mismatch_fails_loudly(self):
        lm = _rand_lm(jax.random.PRNGKey(6), 2, n_char=7, space_id=6)
        logits = jnp.zeros((1, 4, 5))
        with pytest.raises(ValueError, match="alphabet"):
            beam_search_decode(
                logits, jnp.array([4]), beam_width=4, lm=lm
            )

    def test_streaming_beam_matches_batch_with_lm(self):
        from asr_study_tpu.streaming import BeamStream

        key = jax.random.PRNGKey(7)
        k1, k2 = jax.random.split(key)
        t_max, vocab = 12, 4
        lm = _rand_lm(k2, 3, n_char=vocab - 1, space_id=vocab - 2)
        logits = np.asarray(jax.random.normal(k1, (t_max, vocab)) * 1.5)
        dec, lens, _ = beam_search_decode(
            jnp.asarray(logits)[None], jnp.array([t_max]), beam_width=8,
            lm=lm, lm_alpha=0.7, lm_beta=0.3,
        )
        want = dec[0, 0, : int(lens[0, 0])].tolist()
        for chunk in (3, 5, 12):
            bs = BeamStream(blank_id=vocab - 1, beam_width=8,
                            lm=lm, lm_alpha=0.7, lm_beta=0.3)
            for t0 in range(0, t_max, chunk):
                bs.push(logits[t0: t0 + chunk])
            assert bs.ids == want, f"chunk={chunk}"
