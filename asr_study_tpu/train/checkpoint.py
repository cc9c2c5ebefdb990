"""Self-describing checkpoints: weights + training metadata, resumable.

TPU equivalent of the reference's ``MetaCheckpoint`` Keras callback
[ref: core/callbacks.py], which wrote weights plus a meta payload (epoch,
hparams, loss history) into one HDF5 so runs are resumable.  Here the
payload is ``{params, opt_state, step}`` via Orbax (async-capable, sharded-
array aware) plus a JSON sidecar with hparams/history; ``latest`` and
``best`` retention both supported, like the reference's two MetaCheckpoint
instances.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from asr_study_tpu.train.trainer import TrainState


class CheckpointManager:
    """Keeps ``latest`` and (optionally) ``best`` checkpoints under a dir.

    Layout::

        <dir>/ckpt/<step>/      orbax pytree {params, opt_state, step}
        <dir>/meta.json         {hparams, history, best_step, last_step}
    """

    def __init__(
        self,
        directory: str,
        max_to_keep: int = 2,
        keep_best: bool = True,
        best_metric: str = "val_loss",
        mode: str = "min",
    ):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.best_metric = best_metric
        self.mode = mode
        self.keep_best = keep_best
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep + (1 if keep_best else 0),
            best_fn=(lambda m: m.get(best_metric, np.inf)) if keep_best else None,
            best_mode=mode if keep_best else "max",
            keep_checkpoints_without_metrics=True,
            create=True,
        )
        self._mgr = ocp.CheckpointManager(
            os.path.join(self.directory, "ckpt"), options=options
        )
        self._meta_path = os.path.join(self.directory, "meta.json")
        self.meta: Dict[str, Any] = {"history": [], "hparams": {}}
        if os.path.exists(self._meta_path):
            with open(self._meta_path) as f:
                self.meta = json.load(f)

    # -- save -------------------------------------------------------------
    def save(
        self,
        state: TrainState,
        metrics: Optional[Dict[str, float]] = None,
        hparams: Optional[Dict[str, Any]] = None,
    ) -> None:
        step = int(state.step)
        self._mgr.save(
            step,
            args=ocp.args.StandardSave(
                {"params": state.params, "opt_state": state.opt_state}
            ),
            metrics={k: float(v) for k, v in (metrics or {}).items()},
        )
        if hparams is not None:
            self.meta["hparams"] = dict(hparams)
        if metrics:
            self.meta["history"].append({"step": step, **metrics})
        self.meta["last_step"] = step
        with open(self._meta_path, "w") as f:
            json.dump(self.meta, f, indent=1)

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    # -- restore ----------------------------------------------------------
    @property
    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    @property
    def best_step(self) -> Optional[int]:
        try:
            return self._mgr.best_step()
        except Exception:
            return None

    def restore(
        self, state: TrainState, step: Optional[int] = None,
        best: bool = False,
    ) -> TrainState:
        """Restore into the structure of ``state`` (shapes/shardings kept)."""
        if step is None:
            step = self.best_step if best else self.latest_step
        if step is None:
            raise FileNotFoundError(
                f"no checkpoint found under {self.directory}"
            )
        target = {"params": state.params, "opt_state": state.opt_state}
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(target)
        )
        return TrainState(
            params=restored["params"],
            opt_state=restored["opt_state"],
            step=jax.numpy.asarray(step, dtype=jax.numpy.int32),
        )

    def close(self) -> None:
        self._mgr.close()
