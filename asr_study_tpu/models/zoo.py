"""Model zoo: named acoustic-model constructors, HParams-driven.

Mirrors the reference's registry of model-constructor functions
[ref: core/models.py] resolved by ``--model <name>``
(``get_from_module('model', name)``).  Each constructor returns an
``AcousticModel``: features [B, T, F] -> CTC logits [B, T, V+1] (blank last).
Unlike the reference, the CTC loss/decoder are NOT baked into the model graph
(no Keras Lambda shims needed) — they live in ops/ and are composed by the
training/eval steps.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from asr_study_tpu.models import nn
from asr_study_tpu.models.rnn import StackedRNN
from asr_study_tpu.utils.hparams import HParams
from asr_study_tpu.utils.registry import register


class AcousticModel:
    """features -> CTC logits.

    Structure: [optional dense front-end with clipped-ReLU (Deep-Speech-1
    style)] -> StackedRNN -> Dense(num_classes + 1).

    Batch-major [B, T, F] at the API (matching the reference and the data
    layer); internally time-major [T, B, F] for the scans.
    """

    def __init__(
        self,
        num_classes: int,
        rnn: StackedRNN,
        input_dense: int = 0,
        input_layers: int = 0,
        input_dropout: float = 0.0,
        relu_clip: float = 20.0,
        name: str = "model",
    ):
        self.num_classes = num_classes  # real labels; blank appended
        self.rnn = rnn
        self.input_dense = input_dense
        self.input_layers = input_layers
        self.input_dropout = input_dropout
        self.relu_clip = relu_clip
        self.name = name

    @property
    def vocab_size(self) -> int:
        return self.num_classes + 1  # + blank (last index)

    @property
    def blank_id(self) -> int:
        return self.num_classes

    def init(self, key, input_dim: int):
        params = {}
        dim = input_dim
        if self.input_layers:
            front = []
            for _ in range(self.input_layers):
                key, k = jax.random.split(key)
                front.append(nn.dense_init(k, dim, self.input_dense))
                dim = self.input_dense
            params["front"] = front
        key, k_rnn, k_out = jax.random.split(key, 3)
        params["rnn"] = self.rnn.init(k_rnn, dim)
        params["out"] = nn.dense_init(k_out, self.rnn.output_dim, self.vocab_size)
        return params

    def apply(
        self,
        params,
        inputs: jax.Array,            # [B, T, F]
        input_lengths: jax.Array,     # [B]
        train: bool = False,
        rng: Optional[jax.Array] = None,
        tp: "Optional[tuple]" = None,  # ("model_axis_name", num_shards)
    ) -> jax.Array:                   # logits [B, T, V+1]
        x = jnp.transpose(inputs, (1, 0, 2))  # time-major
        t_steps = x.shape[0]
        mask = (
            jnp.arange(t_steps)[:, None] < input_lengths[None, :]
        ).astype(x.dtype)[..., None]          # [T, B, 1]
        if self.input_layers:
            for i, p in enumerate(params["front"]):
                x = nn.dense_apply(p, x)
                x = jnp.clip(jax.nn.relu(x), 0.0, self.relu_clip)
                if train and self.input_dropout > 0 and rng is not None:
                    rng, k = jax.random.split(rng)
                    x = nn.dropout(k, x, self.input_dropout, train)
            x = x * mask
        h = self.rnn.apply(params["rnn"], x, mask, rng, train, tp=tp)
        logits = nn.dense_apply(params["out"], h)
        return jnp.transpose(logits, (1, 0, 2))

    def init_stream_carries(self, batch: int):
        return self.rnn.init_stream_carries(batch)

    def apply_streaming(
        self,
        params,
        inputs: jax.Array,            # [B, T, F]  one chunk
        input_lengths: jax.Array,     # [B] valid frames in this chunk
        carries,                      # from init_stream_carries / last call
    ):
        """Chunked forward with carried recurrent state — unbounded-length
        transcription at bounded memory (unidirectional models only).
        -> (logits [B, T, V+1], new_carries).  Feeding a full utterance in
        chunks is exactly equivalent to one apply() call."""
        x = jnp.transpose(inputs, (1, 0, 2))
        t_steps = x.shape[0]
        mask = (
            jnp.arange(t_steps)[:, None] < input_lengths[None, :]
        ).astype(x.dtype)[..., None]
        if self.input_layers:
            for p in params["front"]:
                x = nn.dense_apply(p, x)
                x = jnp.clip(jax.nn.relu(x), 0.0, self.relu_clip)
            x = x * mask
        h, carries = self.rnn.apply_streaming(params["rnn"], x, mask, carries)
        logits = nn.dense_apply(params["out"], h)
        return jnp.transpose(logits, (1, 0, 2)), carries

    def __call__(self, *args, **kw):
        return self.apply(*args, **kw)

    def summary(self, params) -> str:
        """Keras-``model.summary()``-style parameter table (the reference's
        train flow printed one [ref: train.py via keras Model.summary]):
        one line per leaf array with its tree path, shape and size, plus
        the f32 total."""
        leaves = jax.tree_util.tree_flatten_with_path(params)[0]
        rows = []
        total = 0
        for path, leaf in leaves:
            keys = "/".join(
                str(getattr(p, "key", getattr(p, "idx", p))) for p in path
            )
            n = int(math.prod(leaf.shape)) if leaf.ndim else 1
            total += n
            rows.append((keys, str(tuple(leaf.shape)), n))
        width = max(len(r[0]) for r in rows) + 2
        swidth = max(len(r[1]) for r in rows) + 2
        lines = [
            f'Model "{self.name}" — {len(rows)} arrays, '
            f"vocab {self.vocab_size} (blank={self.blank_id})"
        ]
        lines += [
            f"  {k:<{width}}{s:<{swidth}}{n:>12,}" for k, s, n in rows
        ]
        lines.append(
            f"  total params: {total:,} ({total * 4 / 1e6:.1f} MB f32)"
        )
        return "\n".join(lines)


# ---------------------------------------------------------------------------
# named constructors
# ---------------------------------------------------------------------------

def _hp(params, **defaults) -> HParams:
    hp = HParams(**defaults)
    if isinstance(params, HParams):
        for k, v in params.to_dict().items():
            hp.set(k, v)
    elif isinstance(params, dict):
        for k, v in params.items():
            hp.set(k, v)
    elif isinstance(params, str):
        hp.parse(params)
    return hp


def _stacked(hp: HParams, cell_kind: str, **cell_kw) -> StackedRNN:
    return StackedRNN(
        cell_kind=cell_kind,
        hidden=hp.num_hiddens,
        num_layers=hp.num_layers,
        bidirectional=hp.bidirectional,
        dropout=hp.dropout,
        skip=hp.get("skip", "none"),
        **cell_kw,
    )


@register("model")
def graves2006(params=None, num_classes: int = 27) -> AcousticModel:
    """Single-layer BLSTM à la Graves et al. 2006 (the reference's default
    model [ref: core/models.py::graves2006])."""
    hp = _hp(params, num_hiddens=100, num_layers=1, bidirectional=True, dropout=0.0)
    return AcousticModel(num_classes, _stacked(hp, "lstm"), name="graves2006")


@register("model")
def deep_blstm(params=None, num_classes: int = 27) -> AcousticModel:
    """Deep bidirectional LSTM stack (BASELINE config 3's 'deep BLSTM')."""
    hp = _hp(params, num_hiddens=256, num_layers=3, bidirectional=True, dropout=0.2)
    return AcousticModel(num_classes, _stacked(hp, "lstm"), name="deep_blstm")


@register("model")
def deep_gru(params=None, num_classes: int = 27) -> AcousticModel:
    """Deep (B)GRU stack (the reference's GRU configs)."""
    hp = _hp(params, num_hiddens=256, num_layers=3, bidirectional=True, dropout=0.2)
    return AcousticModel(num_classes, _stacked(hp, "gru"), name="deep_gru")


@register("model")
def ln_blstm(params=None, num_classes: int = 27) -> AcousticModel:
    """Layer-norm BLSTM stack (reference LN variant)."""
    hp = _hp(params, num_hiddens=256, num_layers=3, bidirectional=True, dropout=0.2)
    return AcousticModel(num_classes, _stacked(hp, "ln_lstm"), name="ln_blstm")


@register("model")
def zoneout_blstm(params=None, num_classes: int = 27) -> AcousticModel:
    """Zoneout BLSTM stack (reference zoneout variant)."""
    hp = _hp(
        params, num_hiddens=256, num_layers=3, bidirectional=True, dropout=0.0,
        zoneout_h=0.1, zoneout_c=0.1,
    )
    return AcousticModel(
        num_classes,
        _stacked(hp, "zoneout_lstm", zoneout_h=hp.zoneout_h, zoneout_c=hp.zoneout_c),
        name="zoneout_blstm",
    )


@register("model")
def mi_blstm(params=None, num_classes: int = 27) -> AcousticModel:
    """Multiplicative-integration BLSTM stack (reference MI variant)."""
    hp = _hp(params, num_hiddens=256, num_layers=3, bidirectional=True, dropout=0.2)
    return AcousticModel(num_classes, _stacked(hp, "mi_lstm"), name="mi_blstm")


@register("model")
def highway_blstm(params=None, num_classes: int = 27) -> AcousticModel:
    """BLSTM stack with highway connections between recurrent layers
    (reference highway variant)."""
    hp = _hp(
        params, num_hiddens=256, num_layers=5, bidirectional=True, dropout=0.2,
        skip="highway",
    )
    return AcousticModel(num_classes, _stacked(hp, "lstm"), name="highway_blstm")


@register("model")
def residual_blstm(params=None, num_classes: int = 27) -> AcousticModel:
    """BLSTM stack with residual connections between recurrent layers
    (reference residual variant)."""
    hp = _hp(
        params, num_hiddens=256, num_layers=5, bidirectional=True, dropout=0.2,
        skip="residual",
    )
    return AcousticModel(num_classes, _stacked(hp, "lstm"), name="residual_blstm")


@register("model")
def deep_speech(params=None, num_classes: int = 27) -> AcousticModel:
    """Deep-Speech-1-style model: 3 clipped-ReLU dense layers, one
    bidirectional recurrent layer, dense output."""
    hp = _hp(
        params, num_hiddens=512, num_layers=1, bidirectional=True, dropout=0.1,
        input_dense=512, input_layers=3, input_dropout=0.1,
    )
    return AcousticModel(
        num_classes,
        _stacked(hp, "lstm"),
        input_dense=hp.input_dense,
        input_layers=hp.input_layers,
        input_dropout=hp.input_dropout,
        name="deep_speech",
    )


def build_model(name: str, params=None, num_classes: int = 27) -> AcousticModel:
    from asr_study_tpu.utils.registry import get_from_module

    return get_from_module("model", name)(params, num_classes=num_classes)
