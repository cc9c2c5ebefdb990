import numpy as np

from asr_study_tpu.text import CharParser, normalize_text


def test_normalize_ptbr():
    assert normalize_text("NÃO") == "nao"
    assert normalize_text("coração") == "coracao"
    assert normalize_text("você é") == "voce e"
    assert normalize_text("línguas açúcar") == "linguas acucar"


def test_roundtrip():
    p = CharParser()
    ids = p("ola mundo")
    assert ids.dtype == np.int32
    assert p.imap(ids) == "ola mundo"


def test_accent_map():
    p = CharParser()
    assert p.imap(p("não")) == "nao"


def test_is_valid():
    p = CharParser()
    assert p.is_valid("tudo bem")
    assert p.is_valid("Ação!") is False  # '!' out of vocab
    assert p.is_valid("") is False
    assert p.is_valid("   ") is False


def test_whitespace_collapse():
    p = CharParser()
    assert p.imap(p("a   b\tc")) == "a b c"


def test_blank_is_last():
    p = CharParser()
    assert p.blank_id == p.num_classes == len(p.vocab)
