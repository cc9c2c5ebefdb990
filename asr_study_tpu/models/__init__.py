from asr_study_tpu.models.cells import (
    GRUCell,
    LSTMCell,
    LayerNormLSTMCell,
    MILSTMCell,
    ZoneoutLSTMCell,
)
from asr_study_tpu.models.rnn import RNNLayer, StackedRNN
from asr_study_tpu.models.zoo import AcousticModel, build_model

__all__ = [
    "LSTMCell",
    "GRUCell",
    "LayerNormLSTMCell",
    "ZoneoutLSTMCell",
    "MILSTMCell",
    "RNNLayer",
    "StackedRNN",
    "AcousticModel",
    "build_model",
]
