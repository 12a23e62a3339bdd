"""Observability: TensorBoard metric writer + step timing + profiler hooks.

Reference: rank-0 SummaryWriter with per-term scalars every 100 steps keyed by
global_step (ref: train.py:703, train_2.py:379-383); tqdm throughput bars.
TPU additions (SURVEY.md §5): jax.profiler trace capture and images/sec
counters — the things the reference lacked.
"""

from __future__ import annotations

import collections
import contextlib
import time
from typing import Mapping

import jax


class MetricWriter:
    """Thin TensorBoard writer; no-ops gracefully when tensorboardX is absent
    or on non-primary hosts (the pjit analogue of rank-0 gating)."""

    def __init__(self, log_dir: str | None, only_primary: bool = True):
        self._writer = None
        if log_dir is None:
            return
        if only_primary and jax.process_index() != 0:
            return
        try:
            from tensorboardX import SummaryWriter

            self._writer = SummaryWriter(log_dir)
        except ImportError:
            pass

    def scalars(self, step: int, metrics: Mapping[str, float],
                prefix: str = "train") -> None:
        if self._writer is None:
            return
        for name, value in metrics.items():
            self._writer.add_scalar(f"{prefix}/{name}", float(value), step)

    def image(self, step: int, tag: str, image) -> None:
        if self._writer is None:
            return
        self._writer.add_image(tag, image, step, dataformats="HWC")

    def flush(self) -> None:
        if self._writer is not None:
            self._writer.flush()

    def close(self) -> None:
        if self._writer is not None:
            self._writer.close()


class RunHistory:
    """Append-only JSONL run record (<output_dir>/history.jsonl).

    Every logged metric row (train losses, val PSNR/SSIM, throughput) is
    appended as one JSON object so quality/perf claims are auditable after
    the run — the machine-readable counterpart of the reference's
    TensorBoard-only logging (ref: train_2.py:379-383). Collected into the
    tracked RESULTS/ dir by scripts/record_run.py."""

    def __init__(self, path: str | None, only_primary: bool = True):
        self._path = None
        if path is None:
            return
        if only_primary and jax.process_index() != 0:
            return
        import os

        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._path = path

    def append(self, step: int, metrics: Mapping[str, float],
               kind: str = "train") -> None:
        if self._path is None:
            return
        import json

        row = {"step": int(step), "kind": kind,
               "ts": time.time(),
               **{k: float(v) for k, v in metrics.items()}}
        with open(self._path, "a") as f:
            f.write(json.dumps(row) + "\n")


class StepTimer:
    """Images/sec + step-time tracking with warmup exclusion.

    ``images_per_sec`` is a trailing-window rate (last ``window`` ticks), not
    a run-cumulative average: a cumulative rate never recovers from one-off
    stalls (validation passes, checkpoint saves, host contention) and
    understates the steady state for the rest of the run. ``window=0`` keeps
    the old cumulative behavior."""

    def __init__(self, warmup: int = 2, window: int = 50):
        self.warmup = warmup
        self.window = window
        self._count = 0
        self._images = 0
        self._t0 = None
        self._ticks: collections.deque = collections.deque(
            maxlen=window + 1 if window else None)

    def tick(self, batch_size: int) -> None:
        self._count += 1
        if self._count == self.warmup:
            self._t0 = time.perf_counter()
            self._images = 0
            self._ticks.clear()
            if self.window:
                self._ticks.append((self._t0, 0))
        elif self._count > self.warmup:
            self._images += batch_size
            if self.window:  # cumulative mode keeps no unbounded tick log
                self._ticks.append((time.perf_counter(), batch_size))

    @property
    def images_per_sec(self) -> float:
        if self._t0 is None or self._images == 0:
            return 0.0
        if self.window and len(self._ticks) >= 2:
            t_start = self._ticks[0][0]
            images = sum(n for _, n in list(self._ticks)[1:])
            dt = self._ticks[-1][0] - t_start
            if dt > 0:
                return images / dt
        return self._images / (time.perf_counter() - self._t0)


@contextlib.contextmanager
def profiler_trace(log_dir: str | None):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
