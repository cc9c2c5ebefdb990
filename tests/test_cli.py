"""CLI plumbing: arg parsing, make_dataset main, registry error UX."""

import json

import h5py
import pytest

from asr_study_tpu.cli.eval import build_argparser as eval_parser
from asr_study_tpu.cli.make_dataset import main as make_dataset_main
from asr_study_tpu.cli.predict import build_argparser as predict_parser
from asr_study_tpu.cli.train import build_argparser as train_parser
from asr_study_tpu.utils.registry import get_from_module


def test_train_argparser_defaults():
    args = train_parser().parse_args(["--dataset", "d.h5"])
    assert args.model == "graves2006"
    assert args.opt == "adam"
    assert args.batch_size == 32
    assert not args.resume


def test_eval_predict_argparsers():
    a = eval_parser().parse_args(["--dataset", "d.h5", "--save", "r"])
    assert a.split == "test" and a.beam_width == 0
    p = predict_parser().parse_args(["--save", "r", "x.wav", "y.wav"])
    assert p.wavs == ["x.wav", "y.wav"]


def test_make_dataset_main(tmp_path, capsys):
    out = str(tmp_path / "d.h5")
    rc = make_dataset_main([
        "--parser", "dummy",
        "--dataset_dir", str(tmp_path / "corpus"),
        "--output", out,
        "--input_parser", "mfcc",
        "--to_json", str(tmp_path / "m.json"),
    ])
    assert rc == 0
    with h5py.File(out) as f:
        assert "train" in f
    manifest = [
        json.loads(line) for line in open(tmp_path / "m.json")
    ]
    assert len(manifest) == 16
    assert all("label" in u and "audio" in u for u in manifest)


def test_json_manifest_flow(tmp_path):
    """to_json manifest -> flow_from_json with on-the-fly features."""
    from asr_study_tpu.cli.data_flow import flow_from_arg
    from asr_study_tpu.data.corpora import Dummy
    from asr_study_tpu.data.generator import DatasetGenerator
    from asr_study_tpu.text.parser import CharParser

    corpus = Dummy(str(tmp_path / "corpus"), n=6)
    manifest = str(tmp_path / "m.json")
    corpus.to_json(manifest)
    gen = DatasetGenerator(batch_size=4)
    it = flow_from_arg(
        gen, manifest, None, CharParser(), "mfcc", None
    )
    assert it.num_samples == 6
    batch = next(iter(it.epoch(0)))
    assert batch.inputs.shape[-1] == 39  # mfcc + deltas
    assert batch.texts is not None and batch.texts[0]


def test_registry_error_lists_names():
    with pytest.raises(KeyError) as e:
        get_from_module("model", "definitely_not_a_model")
    assert "graves2006" in str(e.value)
    with pytest.raises(KeyError) as e:
        get_from_module("corpus", "nope")
    assert "lapsbm" in str(e.value)
