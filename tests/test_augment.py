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


class TestWavAugment:
    """Raw-domain augmentation for the --device_features training mode."""

    def _wavs(self, b=3, n=2048):
        wavs = jax.random.normal(jax.random.PRNGKey(0), (b, n)) * 0.1
        # every row keeps >= 3 feature frames (the CTC tests use 3-char
        # labels; a shorter row would make the batch loss an inf sentinel)
        lens = jnp.asarray(([n, n - 700, n - 1024] * b)[:b], jnp.int32)
        t = jnp.arange(n)
        return jnp.where(t[None, :] < lens[:, None], wavs, 0.0), lens

    def test_padding_stays_exactly_zero(self):
        from asr_study_tpu.features.augment import WavAugment

        wavs, lens = self._wavs()
        aug = WavAugment(gain_db=6.0, noise_snr_min=5.0,
                         noise_snr_max=10.0)
        out = np.asarray(aug(jax.random.PRNGKey(1), wavs, lens))
        t = np.arange(wavs.shape[1])
        pad = t[None, :] >= np.asarray(lens)[:, None]
        assert np.all(out[pad] == 0.0)
        # and the real samples actually changed (noise at <=10 dB SNR)
        real = ~pad
        assert np.any(out[real] != np.asarray(wavs)[real])

    def test_gain_only_is_per_row_constant_scale(self):
        from asr_study_tpu.features.augment import WavAugment

        wavs, lens = self._wavs()
        aug = WavAugment(gain_db=6.0)
        out = np.asarray(aug(jax.random.PRNGKey(2), wavs, lens))
        w = np.asarray(wavs)
        for i in range(w.shape[0]):
            nz = np.abs(w[i]) > 1e-6
            ratios = out[i][nz] / w[i][nz]
            np.testing.assert_allclose(ratios, ratios[0], rtol=1e-5)
            assert 10 ** (-6 / 20) - 1e-3 <= ratios[0] <= 10 ** (6 / 20) + 1e-3

    def test_deterministic_under_key(self):
        from asr_study_tpu.features.augment import WavAugment

        wavs, lens = self._wavs()
        aug = WavAugment(gain_db=3.0, noise_snr_min=20.0,
                         noise_snr_max=30.0)
        a = np.asarray(aug(jax.random.PRNGKey(3), wavs, lens))
        b = np.asarray(aug(jax.random.PRNGKey(3), wavs, lens))
        np.testing.assert_array_equal(a, b)

    def test_parse_and_validation(self):
        import pytest

        from asr_study_tpu.features.augment import (
            WavAugment, parse_wav_augment,
        )

        aug = parse_wav_augment("gain_db=2,noise_snr_min=10,"
                                "noise_snr_max=20")
        assert (aug.gain_db, aug.noise_snr_min, aug.noise_snr_max) == \
            (2.0, 10.0, 20.0)
        assert parse_wav_augment("").gain_db == 3.0    # defaults
        with pytest.raises(ValueError):
            parse_wav_augment("nope=1")
        with pytest.raises(ValueError):
            WavAugment(noise_snr_min=30.0, noise_snr_max=10.0)

    def test_parse_merges_defaults_per_group(self):
        # ADVICE r3: 'gain_db=6' must NOT silently disable the default
        # noise; touching any noise key takes over the whole noise group
        from asr_study_tpu.features.augment import parse_wav_augment

        aug = parse_wav_augment("gain_db=6")
        assert (aug.gain_db, aug.noise_snr_min, aug.noise_snr_max) == \
            (6.0, 20.0, 50.0)
        aug = parse_wav_augment("noise_snr_max=0")   # noise off, gain kept
        assert (aug.gain_db, aug.noise_snr_min, aug.noise_snr_max) == \
            (3.0, 0.0, 0.0)
        aug = parse_wav_augment("noise_snr_min=25,noise_snr_max=40")
        assert (aug.gain_db, aug.noise_snr_min, aug.noise_snr_max) == \
            (3.0, 25.0, 40.0)

    def test_trainer_requires_featurizer(self):
        import pytest

        from asr_study_tpu.features.augment import WavAugment

        model = build_model("graves2006", {"num_hiddens": 8},
                            num_classes=4)
        with pytest.raises(ValueError, match="featurizer"):
            Trainer(model, make_optimizer("adam", 5e-3, 10.0),
                    wav_augment=WavAugment(gain_db=3.0))

    def test_train_step_and_rng_trajectory_parity(self):
        """wav_augment draws from its own forked stream, so a run WITHOUT
        it must be bit-identical to the pre-change schedule (here: the
        featurizer-only trainer); with it, the loss must change."""
        from asr_study_tpu.features.augment import WavAugment
        from asr_study_tpu.features.device import DeviceFeaturizer

        feat = DeviceFeaturizer(kind="mfcc", d=False, dd=False)
        wavs, lens = self._wavs(b=4, n=4096)
        labels = jax.random.randint(jax.random.PRNGKey(5), (4, 3), 0, 4)
        llens = jnp.full((4,), 3, jnp.int32)
        weights = jnp.ones((4,), jnp.float32)
        args = (wavs[..., None], lens, labels, llens, weights,
                jax.random.PRNGKey(6))

        def run(wav_augment):
            model = build_model("graves2006", {"num_hiddens": 8},
                                num_classes=4)
            tr = Trainer(model, make_optimizer("adam", 5e-3, 10.0),
                         donate_state=False, featurizer=feat,
                         wav_augment=wav_augment)
            state = tr.init_state(jax.random.PRNGKey(0),
                                  input_dim=feat.num_feats)
            out = []
            for _ in range(2):
                state, m = tr.train_step(state, *args)
                out.append(float(m["loss"]))
            return out

        base = run(None)
        assert base == run(None)                        # deterministic
        augd = run(WavAugment(gain_db=6.0, noise_snr_min=5.0,
                              noise_snr_max=10.0))
        assert base != augd


def test_train_cli_wires_wav_augment(tmp_path, capsys):
    """--wav_augment needs --device_features and must reach the Trainer."""
    import pytest

    from asr_study_tpu.cli.make_dataset import main as make_main
    from asr_study_tpu.cli.train import main as train_main

    h5 = str(tmp_path / "raw.h5")
    rc = make_main([
        "--parser", "dummy", "--dataset_dir", str(tmp_path / "corpus"),
        "--output", h5, "--input_parser", "raw",
    ])
    assert rc == 0
    rc = train_main([
        "--platform", "cpu", "--dataset", h5,
        "--model", "graves2006", "--params", "num_hiddens=8",
        "--epochs", "1", "--batch_size", "4", "--num_devices", "1",
        "--device_features", "mfcc",
        "--device_feature_params", '{"d": false, "dd": false}',
        "--wav_augment", "gain_db=2",
        "--save", str(tmp_path / "run"), "--log_every", "1",
    ])
    assert rc == 0
    err = capsys.readouterr().err
    assert "training with WavAugment(gain_db=2" in err
    meta = json.load(open(tmp_path / "run" / "meta.json"))
    assert meta["hparams"]["wav_augment"] == "gain_db=2"
    # without --device_features it must refuse
    with pytest.raises(SystemExit, match="device_features"):
        train_main([
            "--platform", "cpu", "--dataset", h5,
            "--epochs", "1", "--batch_size", "4", "--num_devices", "1",
            "--wav_augment", "", "--save", str(tmp_path / "run2"),
        ])


def test_wav_augment_min_without_max_is_loud():
    """noise_snr_min alone would silently disable noise (it is gated on
    noise_snr_max) — must refuse at construction."""
    import pytest

    from asr_study_tpu.features.augment import (
        WavAugment, parse_wav_augment,
    )

    with pytest.raises(ValueError, match="noise_snr_max"):
        WavAugment(noise_snr_min=25.0)
    with pytest.raises(ValueError, match="noise_snr_max"):
        parse_wav_augment("noise_snr_min=25")
