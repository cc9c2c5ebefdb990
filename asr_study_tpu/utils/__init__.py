from asr_study_tpu.utils.hparams import HParams
from asr_study_tpu.utils.registry import get_from_module, ls_registry, register

__all__ = ["HParams", "get_from_module", "ls_registry", "register"]
