"""String -> callable registries.

The reference glues its CLIs to models/corpora/features by string dispatch
(``get_from_module('core.models', args.model)``, cf. SURVEY.md §1 and
[ref: utils/generic_utils.py]).  We keep the same UX — ``--model graves2006``
resolves by name — but back it with explicit registries so lookup errors list
the valid names instead of raising AttributeError.
"""

from __future__ import annotations

import importlib
from typing import Any, Callable, Dict

_REGISTRIES: Dict[str, Dict[str, Any]] = {}


def register(kind: str, name: str | None = None) -> Callable:
    """Decorator: register ``fn`` under ``kind`` (e.g. 'model', 'corpus')."""

    def deco(fn):
        key = (name or fn.__name__).lower()
        _REGISTRIES.setdefault(kind, {})[key] = fn
        return fn

    return deco


def ls_registry(kind: str) -> list[str]:
    return sorted(_REGISTRIES.get(kind, {}))


# Modules whose import populates each registry kind.
_KIND_MODULES = {
    "model": "asr_study_tpu.models.zoo",
    "corpus": "asr_study_tpu.data.corpora",
    "feature": "asr_study_tpu.features.audio",
}


def get_from_module(kind: str, name: str) -> Any:
    """Resolve a registered callable by name, mirroring the reference's
    ``get_from_module`` [ref: utils/generic_utils.py]."""
    mod = _KIND_MODULES.get(kind)
    if mod is not None:
        importlib.import_module(mod)
    reg = _REGISTRIES.get(kind, {})
    key = name.lower()
    if key not in reg:
        raise KeyError(
            f"unknown {kind} {name!r}; available: {', '.join(sorted(reg)) or '(none)'}"
        )
    return reg[key]
