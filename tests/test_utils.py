import pytest

from asr_study_tpu.utils import HParams


def test_hparams_defaults():
    hp = HParams(num_hiddens=256, num_layers=3, dropout=0.2, bidirectional=True)
    assert hp.num_hiddens == 256
    assert hp.get("missing", 7) == 7
    with pytest.raises(AttributeError):
        _ = hp.missing


def test_hparams_parse_kv():
    hp = HParams(num_hiddens=256, dropout=0.2, name="blstm", bi=True)
    hp.parse("num_hiddens=512,dropout=0.5,name=gru,bi=false")
    assert hp.num_hiddens == 512
    assert hp.dropout == 0.5
    assert hp.name == "gru"
    assert hp.bi is False


def test_hparams_parse_json():
    hp = HParams(a=1).parse('{"a": 2, "b": "x"}')
    assert hp.a == 2
    assert hp.b == "x"


def test_hparams_roundtrip():
    hp = HParams(a=1, b="x")
    assert HParams.from_dict(hp.to_dict()).a == 1
