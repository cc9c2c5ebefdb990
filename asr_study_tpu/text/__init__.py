from asr_study_tpu.text.parser import CharParser, normalize_text

__all__ = ["CharParser", "normalize_text"]
