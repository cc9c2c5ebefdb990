"""Async host input pipeline: batch assembly + H2D transfer off the step
critical path.

The reference's hot-loop cost (a) is the synchronous Python generator +
padding + feed_dict copy per step (SURVEY.md §3.1).  Here a daemon thread
assembles padded numpy batches and issues ``jax.device_put`` ahead of the
consumer, so the accelerator step N overlaps with host prep + transfer of
batch N+1..N+depth.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional

import jax

from asr_study_tpu.data.generator import Batch

_SENTINEL = object()


def device_prefetch(
    batches: Iterator[Batch],
    depth: int = 2,
    sharding=None,
    transform: Optional[Callable[[Batch], Batch]] = None,
) -> Iterator[Batch]:
    """Wrap a Batch iterator with an async transfer pipeline.

    Device-bound fields (inputs, lengths, labels, weights) are device_put
    (optionally with a ``jax.sharding.Sharding``) ``depth`` batches ahead;
    host-only fields (texts, uids) pass through untouched.  Exceptions in
    the worker re-raise at the consumer.
    """
    q: "queue.Queue" = queue.Queue(maxsize=depth)

    # Multi-host mesh (DCN): each process contributes only its local shard;
    # jax.make_array_from_process_local_data assembles the global array.
    # Single-host meshes (fully addressable) keep the plain device_put path.
    multiproc = sharding is not None and not sharding.is_fully_addressable

    def put(b: Batch) -> Batch:
        if multiproc:
            dev = lambda x: jax.make_array_from_process_local_data(  # noqa: E731
                sharding, x
            )
        else:
            dev = lambda x: jax.device_put(x, sharding)  # noqa: E731
        return Batch(
            inputs=dev(b.inputs),
            input_lengths=dev(b.input_lengths),
            labels=dev(b.labels),
            label_lengths=dev(b.label_lengths),
            weights=dev(b.weights),
            texts=b.texts,
            uids=b.uids,
        )

    def worker():
        try:
            for b in batches:
                if transform is not None:
                    b = transform(b)
                q.put(put(b))
        except BaseException as e:  # surface worker errors to the consumer
            q.put(e)
            return
        q.put(_SENTINEL)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            break
        if isinstance(item, BaseException):
            raise item
        yield item
