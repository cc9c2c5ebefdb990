"""Shared CLI helper: resolve --dataset into a DatasetIterator.

Supports both on-disk formats of the data layer: prebuilt HDF5 (fast path,
the make_dataset output) and JSON-lines manifests (DatasetParser.to_json)
with on-the-fly feature extraction.
"""

from __future__ import annotations

import json
from typing import Optional

from asr_study_tpu.data.generator import DatasetGenerator, DatasetIterator
from asr_study_tpu.utils.registry import get_from_module


def flow_from_arg(
    gen: DatasetGenerator,
    dataset: str,
    split: str,
    label_parser,
    input_parser_name: str = "mfcc",
    input_params: Optional[str] = None,
) -> DatasetIterator:
    if dataset.endswith(".json") or dataset.endswith(".jsonl"):
        kw = json.loads(input_params) if input_params else {}
        feature = get_from_module("feature", input_parser_name)(**kw)
        return gen.flow_from_json(
            dataset, feature, label_parser, split=split
        )
    return gen.flow_from_h5(dataset, split)
