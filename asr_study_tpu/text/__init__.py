from asr_study_tpu.text.lm import CharNGramLM, fit_ngram_lm
from asr_study_tpu.text.parser import CharParser, normalize_text

__all__ = ["CharParser", "normalize_text", "CharNGramLM", "fit_ngram_lm"]
