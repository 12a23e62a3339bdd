"""Batching + device prefetch: keep the TPU compute-bound.

Replaces the reference's DataLoader worker processes + pin_memory +
non_blocking H2D copies (ref: train.py:449-459) with the JAX idiom: a host-side
thread pool decodes/transforms images, batches are assembled in numpy, and a
small prefetch queue keeps the *next* batch already on device (double
buffering) while the current step runs — so the H2D copy overlaps compute.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Iterator

import jax
import numpy as np


def batch_iterator(sample_iter: Iterator[np.ndarray], batch_size: int,
                   drop_last: bool = True,
                   num_workers: int = 0,
                   sample_fn: Callable[[Any], np.ndarray] | None = None
                   ) -> Iterator[np.ndarray]:
    """Assemble [B, H, W, C] float32 batches.

    With num_workers > 0 and a ``sample_fn``, raw items from ``sample_iter``
    are mapped through ``sample_fn`` on a thread pool (JPEG decode + resize
    release the GIL in PIL, so threads parallelize like DataLoader workers).
    """
    if num_workers > 0 and sample_fn is not None:
        pool = ThreadPoolExecutor(max_workers=num_workers)
        mapped = pool.map(sample_fn, sample_iter, chunksize=4)
    elif sample_fn is not None:
        mapped = map(sample_fn, sample_iter)
    else:
        mapped = sample_iter

    def assemble(items):
        # (image, label) items batch to (images [B,H,W,C], labels [B]) — the
        # labeled-dataset contract from datasets.make_dataset(with_labels=True).
        if isinstance(items[0], tuple):
            return (np.stack([s[0] for s in items]),
                    np.asarray([s[1] for s in items], np.int32))
        return np.stack(items)

    buf: list = []
    for sample in mapped:
        buf.append(sample)
        if len(buf) == batch_size:
            yield assemble(buf)
            buf = []
    if buf and not drop_last:
        yield assemble(buf)


def prefetch_to_device(batch_iter: Iterator[np.ndarray], size: int = 2,
                       sharding=None) -> Iterator[jax.Array]:
    """Asynchronously stage upcoming batches on device (double buffering).

    ``sharding`` (e.g. NamedSharding(mesh, P('data'))) places each batch
    directly in its distributed layout — the analogue of DistributedSampler
    feeding per-rank slices.
    """
    q: queue.Queue = queue.Queue(maxsize=size)
    _END = object()

    def producer():
        # Exceptions must surface in the consumer — swallowing them would
        # make a corrupt file / dead data source look like clean end-of-data
        # and a long run would "complete" early with exit code 0.
        try:
            for batch in batch_iter:
                if sharding is not None:
                    arr = jax.device_put(batch, sharding)
                else:
                    arr = jax.device_put(batch)
                q.put(arr)
            q.put(_END)
        except BaseException as e:  # noqa: BLE001 — re-raised consumer-side
            q.put(("__pipeline_error__", e))

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    while True:
        item = q.get()
        if item is _END:
            return
        if isinstance(item, tuple) and len(item) == 2                 and item[0] == "__pipeline_error__":
            raise item[1]
        yield item


def input_pipeline(source_iter: Iterator[np.ndarray], batch_size: int,
                   sharding=None, prefetch: int = 2,
                   drop_last: bool = True) -> Iterator[jax.Array]:
    """source samples → batches → device-resident, sharded, prefetched."""
    batches = batch_iterator(source_iter, batch_size, drop_last=drop_last)
    return prefetch_to_device(batches, size=prefetch, sharding=sharding)
