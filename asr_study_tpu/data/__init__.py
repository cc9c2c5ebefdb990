from asr_study_tpu.data.dataset_parser import DatasetParser, read_h5, write_h5
from asr_study_tpu.data.generator import Batch, DatasetGenerator
from asr_study_tpu.data.corpora import BRSD, CSLU, Dummy, LapsBM, Sid, VoxForge

__all__ = [
    "DatasetParser",
    "read_h5",
    "write_h5",
    "Batch",
    "DatasetGenerator",
    "LapsBM",
    "VoxForge",
    "Sid",
    "CSLU",
    "BRSD",
    "Dummy",
]
