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

    Like the reference's two MetaCheckpoint instances, 'latest' and 'best'
    live in SEPARATE retention domains — a single best_fn-managed store
    would delete newer-but-worse checkpoints and silently break
    resume-from-latest.

    Layout::

        <dir>/ckpt/<step>/      latest checkpoints (recency retention)
        <dir>/best/<step>/      best-by-metric checkpoint
        <dir>/meta.json         {hparams, history, last_step} (best_step
                                is resolved live from the best store)
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
        # explicit handler so item_metadata works on managers that never
        # saved in this process (the device-agnostic restore needs it)
        self._mgr = ocp.CheckpointManager(
            os.path.join(self.directory, "ckpt"),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
            item_handlers=ocp.StandardCheckpointHandler(),
        )
        self._best_mgr = None
        if keep_best:
            self._best_mgr = ocp.CheckpointManager(
                os.path.join(self.directory, "best"),
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=1,
                    best_fn=lambda m: m.get(best_metric, np.inf),
                    best_mode=mode,
                    keep_checkpoints_without_metrics=False,
                    create=True,
                ),
                item_handlers=ocp.StandardCheckpointHandler(),
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
        payload = {"params": state.params, "opt_state": state.opt_state}
        m = {k: float(v) for k, v in (metrics or {}).items()}
        self._mgr.save(step, args=ocp.args.StandardSave(payload), metrics=m)
        if self._best_mgr is not None and self.best_metric in m:
            self._best_mgr.save(
                step, args=ocp.args.StandardSave(payload), metrics=m
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
        if self._best_mgr is not None:
            self._best_mgr.wait_until_finished()

    # -- restore ----------------------------------------------------------
    @property
    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    @property
    def best_step(self) -> Optional[int]:
        if self._best_mgr is None:
            return None
        try:
            return self._best_mgr.best_step()
        except Exception:
            return None

    def restore(
        self, state: TrainState, step: Optional[int] = None,
        best: bool = False,
    ) -> TrainState:
        """Restore into the structure of ``state`` (shapes/shardings kept)."""
        mgr = self._mgr
        if step is None:
            if best:
                step = self.best_step
                mgr = self._best_mgr or self._mgr
            else:
                step = self.latest_step
        if step is None:
            raise FileNotFoundError(
                f"no checkpoint found under {self.directory}"
            )
        target = {"params": state.params, "opt_state": state.opt_state}
        restored = mgr.restore(step, args=ocp.args.StandardRestore(target))
        return TrainState(
            params=restored["params"],
            opt_state=restored["opt_state"],
            step=jax.numpy.asarray(step, dtype=jax.numpy.int32),
        )

    def restore_params(self, params, step: Optional[int] = None,
                       best: bool = False):
        """Warm-start restore: ONLY the model params, into the structure
        of ``params`` — the checkpoint's optimizer state is ignored, so a
        run trained with one optimizer can seed a run using another
        (``train.py --init_from``).  Shapes must match exactly."""
        mgr = self._mgr
        if step is None:
            if best:
                # loud like restore(): an empty best store (run trained
                # without val metrics) must not silently hand back the
                # LATEST weights as if they were the best ones
                step = self.best_step
                if step is None:
                    raise FileNotFoundError(
                        f"no BEST checkpoint under {self.directory} (was "
                        "the run trained without a validation metric?)"
                    )
                mgr = self._best_mgr or self._mgr
            else:
                step = self.latest_step
        if step is None:
            raise FileNotFoundError(
                f"no checkpoint found under {self.directory}"
            )
        # Device-agnostic restore: the checkpoint's opt_state may have any
        # structure (different optimizer), so the target comes from the
        # CHECKPOINT's own metadata — with every leaf bound to the current
        # default device.  A target-less restore would instead replay the
        # SAVED sharding layout, which fails whenever the device set
        # changed (e.g. eval on one chip of a run trained on a mesh).
        meta = mgr.item_metadata(step)
        sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])
        target = jax.tree_util.tree_map(
            lambda m: jax.ShapeDtypeStruct(
                m.shape, m.dtype, sharding=sharding
            ),
            meta, is_leaf=lambda x: hasattr(x, "shape"),
        )
        saved = mgr.restore(
            step, args=ocp.args.StandardRestore(target)
        )["params"]
        def _paths(tree):
            flat = jax.tree_util.tree_flatten_with_path(tree)[0]
            return (
                ["/".join(
                    str(getattr(p, "key", getattr(p, "idx", p)))
                    for p in path
                ) for path, _ in flat],
                [leaf for _, leaf in flat],
            )

        got_paths, leaves = _paths(saved)
        want_paths, tgt_leaves = _paths(params)
        _, tgt_td = jax.tree_util.tree_flatten(params)
        if len(leaves) != len(tgt_leaves):
            raise ValueError(
                f"checkpoint under {self.directory} has {len(leaves)} "
                f"param arrays, model expects {len(tgt_leaves)} — "
                "different architecture?"
            )
        out = []
        for gp, got, wp, want in zip(
            got_paths, leaves, want_paths, tgt_leaves
        ):
            # key paths must match too: same-count same-shape trees with
            # different keys would otherwise silently load weights into
            # the wrong parameters
            if gp != wp:
                raise ValueError(
                    f"param tree mismatch restoring from "
                    f"{self.directory}: checkpoint has {gp!r} where the "
                    f"model expects {wp!r} — different architecture?"
                )
            if tuple(got.shape) != tuple(want.shape):
                raise ValueError(
                    f"param shape mismatch restoring {wp!r} from "
                    f"{self.directory}: checkpoint {tuple(got.shape)} vs "
                    f"model {tuple(want.shape)}"
                )
            out.append(jax.numpy.asarray(got, want.dtype))
        return jax.tree_util.tree_unflatten(tgt_td, out)

    def close(self) -> None:
        self._mgr.close()
        if self._best_mgr is not None:
            self._best_mgr.close()
