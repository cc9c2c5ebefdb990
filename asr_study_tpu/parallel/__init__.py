from asr_study_tpu.parallel.tp import (  # noqa: F401
    tp_rnn_layer_apply,
    tp_scan,
    tp_slice,
)
