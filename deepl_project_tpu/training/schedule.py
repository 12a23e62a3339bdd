"""LR schedules: linear warmup then constant (ref: train_2.py:266-273 — warmup
default 1000 steps in train_2, 10000 in train.py/configs; stepped per optimizer
step)."""

from __future__ import annotations

import optax


def warmup_constant(base_lr: float = 1e-4, warmup_steps: int = 10_000):
    if warmup_steps <= 0:
        return optax.constant_schedule(base_lr)
    return optax.join_schedules(
        [optax.linear_schedule(0.0, base_lr, warmup_steps),
         optax.constant_schedule(base_lr)],
        boundaries=[warmup_steps])


def warmup_cosine(base_lr: float, warmup_steps: int, total_steps: int,
                  final_lr_ratio: float = 0.0):
    """Extension beyond the reference: cosine decay for longer runs."""
    return optax.warmup_cosine_decay_schedule(
        0.0, base_lr, warmup_steps, max(total_steps, warmup_steps + 1),
        end_value=base_lr * final_lr_ratio)
