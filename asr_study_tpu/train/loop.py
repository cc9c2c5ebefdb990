"""The training loop: epochs over length-bucketed batches, periodic eval,
checkpointing, logging, optional profiling.

Replaces the reference's ``model.fit_generator(...)`` orchestration
[ref: train.py] with an explicit loop around the jitted ``Trainer`` steps.
Host work per step is only the numpy batch hand-off; everything else is one
device dispatch (SURVEY.md §3.1 hot-loop analysis).
"""

from __future__ import annotations

import time
from typing import Any, Dict, Optional

import jax

from asr_study_tpu.data.prefetch import device_prefetch
from asr_study_tpu.train.checkpoint import CheckpointManager
from asr_study_tpu.train.trainer import Trainer, TrainState
from asr_study_tpu.utils.metrics_writer import MetricWriter


def fit(
    trainer: Trainer,
    state: TrainState,
    train_iter,                      # DatasetIterator
    valid_iter=None,
    epochs: int = 10,
    seed: int = 0,
    ckpt: Optional[CheckpointManager] = None,
    hparams: Optional[Dict[str, Any]] = None,
    log_dir: Optional[str] = None,
    log_every: int = 10,
    profile: bool = False,
    profile_steps: tuple = (10, 20),
    tensorboard: bool = False,
    early_stop_patience: int = 0,
) -> TrainState:
    """Run ``epochs`` epochs; returns the final state.

    ``profile=True`` captures a jax.profiler trace (Perfetto/XProf-readable)
    of steps [profile_steps) into ``<log_dir>/trace`` — the tracing hook the
    reference never had (SURVEY.md §5.1).

    ``early_stop_patience`` > 0 stops training once ``val_loss`` has not
    improved for that many consecutive epochs (the Keras ``EarlyStopping``
    idiom; requires ``valid_iter``).
    """
    if early_stop_patience > 0 and valid_iter is None:
        raise ValueError(
            "early_stop_patience requires a validation split (val_loss "
            "drives the stopping decision) — none was provided"
        )
    writer = MetricWriter(log_dir, "train", tensorboard=tensorboard)
    rng = jax.random.PRNGKey(seed)
    step = int(state.step)
    t_last = time.time()
    best_val = float("inf")
    stale_epochs = 0

    def consume(pending, ep):
        """Fetch a step's (device) metrics one step late, so the NEXT step's
        dispatch overlaps this sync — on the remote-tunnel backend a host
        fetch per step would otherwise serialize every dispatch behind the
        previous step's completion (~28 ms round-trip floor)."""
        nonlocal t_last
        p_step, p_metrics, p_w, p_epoch = pending
        loss = float(p_metrics["loss"])
        ep[0] += loss * float(p_w)
        ep[1] += float(p_w)
        if p_step % log_every == 0:
            now = time.time()
            writer.write(
                p_step,
                {
                    "epoch": p_epoch,
                    "loss": loss,
                    "grad_norm": float(p_metrics["grad_norm"]),
                    "steps_per_s": log_every / max(now - t_last, 1e-9),
                },
                echo=True,
            )
            t_last = now

    for epoch in range(epochs):
        ep_acc = [0.0, 0.0]          # weighted loss sum, weight sum
        pending = None               # (step, device metrics, weight, epoch)
        batches = device_prefetch(
            train_iter.epoch(seed=seed + epoch),
            depth=2,
            sharding=trainer.batch_sharding,
        )
        for batch in batches:
            if profile and log_dir and step == profile_steps[0]:
                jax.profiler.start_trace(f"{log_dir}/trace")
            state, metrics = trainer.train_step(
                state, batch.inputs, batch.input_lengths, batch.labels,
                batch.label_lengths, batch.weights, rng,
            )
            step += 1
            if profile and log_dir and step == profile_steps[1]:
                jax.block_until_ready(metrics["loss"])
                jax.profiler.stop_trace()
            if pending is not None:
                consume(pending, ep_acc)
            # epoch loss weighted by real (non-padding) rows, not
            # batch.size.  The sum stays a DEVICE scalar until consume()
            # one step later — float()ing it here would block on the
            # just-dispatched train step (in-order device queue) and
            # re-introduce the per-step sync this deferral removes.
            pending = (step, metrics, batch.weights.sum(), epoch)
        if pending is not None:
            consume(pending, ep_acc)

        scalars: Dict[str, float] = {
            "epoch": epoch, "train_loss": ep_acc[0] / max(ep_acc[1], 1e-9)
        }
        if valid_iter is not None:
            val = trainer.run_eval(state, valid_iter.epoch())
            scalars["val_loss"] = val["loss"]
            scalars["val_ler"] = val["ler"]
        writer.write(step, scalars, echo=True)
        if ckpt is not None:
            ckpt.save(
                state,
                metrics={k: v for k, v in scalars.items() if k != "epoch"},
                hparams=hparams,
            )
        if early_stop_patience > 0 and "val_loss" in scalars:
            if scalars["val_loss"] < best_val - 1e-6:
                best_val = scalars["val_loss"]
                stale_epochs = 0
            else:
                stale_epochs += 1
                if stale_epochs >= early_stop_patience:
                    import sys

                    print(
                        f"early stop: val_loss has not improved for "
                        f"{stale_epochs} epochs (best {best_val:.4g})",
                        file=sys.stderr,
                    )
                    break
    if ckpt is not None:
        ckpt.wait()
    writer.close()
    return state
