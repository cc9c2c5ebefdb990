"""SpecAugment: mask semantics, train-step integration, CLI wiring.

The reference ships no augmentation (predates SpecAugment); this is the
rebuild's first-class extension — see features/augment.py's module doc.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np

from asr_study_tpu.features.augment import SpecAugment, parse_spec_augment
from asr_study_tpu.train.trainer import Trainer, make_mesh, make_optimizer
from asr_study_tpu.models.zoo import build_model

from tests.test_train import _toy_batch, _toy_trainer


class TestSpecAugmentSemantics:
    def test_masks_zero_bands_and_spans(self):
        aug = SpecAugment(freq_masks=2, freq_width=4,
                          time_masks=2, time_ratio=0.2)
        b, t, f = 4, 50, 13
        x = jnp.ones((b, t, f))
        lengths = jnp.array([50, 40, 30, 20], jnp.int32)
        y = aug(jax.random.PRNGKey(0), x, lengths)
        y = np.asarray(y)
        assert y.shape == (b, t, f)
        # masked entries are exactly 0, everything else untouched
        assert set(np.unique(y)).issubset({0.0, 1.0})
        assert (y == 0).any(), "with these params some mask should land"
        # a zeroed time frame is zero across ALL features; a zeroed
        # freq channel across ALL frames — so unmasked entries where
        # neither the row's time mask nor freq mask hit are 1
        for i in range(b):
            t_masked = (y[i] == 0).all(axis=1)          # [T]
            f_masked = (y[i] == 0).all(axis=0)          # [F]
            expect = np.ones((t, f))
            expect[t_masked, :] = 0
            expect[:, f_masked] = 0
            np.testing.assert_array_equal(y[i], expect)

    def test_time_masks_never_touch_padding(self):
        aug = SpecAugment(freq_masks=0, time_masks=4, time_ratio=0.5)
        b, t, f = 8, 64, 5
        x = jnp.ones((b, t, f))
        lengths = jnp.full((b,), 16, jnp.int32)
        for seed in range(5):
            y = np.asarray(aug(jax.random.PRNGKey(seed), x, lengths))
            # frames >= length must remain 1 (mask start+width stay within
            # the valid range by construction)
            assert (y[:, 16:, :] == 1).all()

    def test_noop_config_is_identity(self):
        aug = SpecAugment(freq_masks=0, freq_width=0,
                          time_masks=0, time_ratio=0.0)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 4))
        y = aug(jax.random.PRNGKey(1), x, jnp.full((2,), 10, jnp.int32))
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x))

    def test_parse(self):
        aug = parse_spec_augment("freq_masks=3,freq_width=5,"
                                 "time_masks=1,time_ratio=0.1")
        assert (aug.freq_masks, aug.freq_width) == (3, 5)
        assert (aug.time_masks, aug.time_ratio) == (1, 0.1)
        assert parse_spec_augment("").freq_masks == 2  # defaults
        import pytest
        with pytest.raises(ValueError):
            parse_spec_augment("nope=1")
        with pytest.raises(ValueError):
            parse_spec_augment("freq_masks")


class TestTrainerIntegration:
    def _trainer(self, augment, mesh=None):
        model = build_model(
            "graves2006", {"num_hiddens": 8}, num_classes=4
        )
        tx = make_optimizer("adam", 5e-3, clipnorm=10.0)
        return Trainer(model, tx, mesh=mesh, donate_state=False,
                       augment=augment)

    def test_train_step_runs_under_jit(self):
        aug = SpecAugment(freq_masks=1, freq_width=2,
                          time_masks=1, time_ratio=0.2)
        trainer = self._trainer(aug)
        state = trainer.init_state(jax.random.PRNGKey(0), input_dim=5)
        b = _toy_batch(jax.random.PRNGKey(1))
        state, m = trainer.train_step(
            state, b["inputs"], b["input_lengths"], b["labels"],
            b["label_lengths"], b["weights"], jax.random.PRNGKey(2),
        )
        assert np.isfinite(float(m["loss"]))
        assert int(state.step) == 1

    def test_train_step_runs_under_mesh(self):
        aug = SpecAugment(freq_masks=1, freq_width=2,
                          time_masks=1, time_ratio=0.2)
        mesh = make_mesh(4)
        trainer = self._trainer(aug, mesh=mesh)
        state = trainer.init_state(jax.random.PRNGKey(0), input_dim=5)
        b = _toy_batch(jax.random.PRNGKey(1))
        state, m = trainer.train_step(
            state, b["inputs"], b["input_lengths"], b["labels"],
            b["label_lengths"], b["weights"], jax.random.PRNGKey(2),
        )
        assert np.isfinite(float(m["loss"]))

    def test_noop_augment_matches_no_augment_bitwise(self):
        """The augment hook draws from a forked rng stream (fold_in 0x5A),
        so a no-op SpecAugment must leave the training trajectory
        bit-identical to augment=None — guards the rng schedule."""
        b = _toy_batch(jax.random.PRNGKey(1))
        args = (
            b["inputs"], b["input_lengths"], b["labels"],
            b["label_lengths"], b["weights"], jax.random.PRNGKey(2),
        )

        def run(augment):
            trainer = self._trainer(augment)
            state = trainer.init_state(jax.random.PRNGKey(0), input_dim=5)
            out = []
            for _ in range(3):
                state, m = trainer.train_step(state, *args)
                out.append(float(m["loss"]))
            return out

        noop = SpecAugment(freq_masks=0, time_masks=0)
        assert run(None) == run(noop)

    def test_augment_changes_loss(self):
        """A real augmentation must actually alter the forward pass."""
        b = _toy_batch(jax.random.PRNGKey(1), t=24)
        args = (
            b["inputs"], b["input_lengths"], b["labels"],
            b["label_lengths"], b["weights"], jax.random.PRNGKey(2),
        )
        t0 = self._trainer(None)
        t1 = self._trainer(SpecAugment(freq_masks=2, freq_width=3,
                                       time_masks=2, time_ratio=0.3))
        s = t0.init_state(jax.random.PRNGKey(0), input_dim=5)
        _, m0 = t0.train_step(s, *args)
        _, m1 = t1.train_step(s, *args)
        assert float(m0["loss"]) != float(m1["loss"])


def test_train_cli_wires_spec_augment(tmp_path, capsys):
    """--spec_augment must reach the Trainer (ADVICE r2 high finding: the
    flag used to parse but silently train without augmentation)."""
    from asr_study_tpu.cli.train import main as train_main
    from asr_study_tpu.data.corpora import Dummy
    from asr_study_tpu.features.audio import MFCC
    from asr_study_tpu.text.parser import CharParser

    corpus = Dummy(str(tmp_path / "corpus"), n=6)
    h5 = str(tmp_path / "data.h5")
    corpus.to_h5(h5, MFCC(), CharParser())
    rc = train_main([
        "--platform", "cpu", "--dataset", h5,
        "--model", "graves2006", "--params", "num_hiddens=8",
        "--epochs", "1", "--batch_size", "4", "--num_devices", "1",
        "--spec_augment", "freq_masks=1,freq_width=2",
        "--save", str(tmp_path / "run"), "--log_every", "1",
    ])
    assert rc == 0
    err = capsys.readouterr().err
    assert "training with SpecAugment(freq_masks=1" in err
    meta = json.load(open(tmp_path / "run" / "meta.json"))
    assert meta["hparams"]["spec_augment"] == "freq_masks=1,freq_width=2"
