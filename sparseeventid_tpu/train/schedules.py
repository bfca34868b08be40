"""Per-step LR schedules — parity with
/root/reference/src/utils/learning_rate_scheduler.py, expressed as
jit-friendly step->lr functions (optax schedule signature) instead of
indexable Python sequences.

WarmupFlatDecay (:92-126): linear warmup from 1e-5 over one epoch to peak,
flat for (total - decay - 1) epochs, then exponential decay (rate 0.01/step)
to a floor.

OneCycle (:130-176): triangle up over half the non-decay steps, down to
min_lr, then exponential decay to the floor.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from ..config.schema import (
    FlatLRConfig,
    LRScheduleConfig,
    OneCycleConfig,
    WarmupFlatDecayConfig,
)

Schedule = Callable


def _linear(step, start, stop, length):
    return start + step * (stop - start) / jnp.maximum(length, 1)


def _decay(step, start, floor, rate=0.01):
    return (start - floor) * jnp.exp(-rate * step) + floor


def warmup_flat_decay(
    peak_lr: float,
    decay_floor: float,
    epoch_length: int,
    decay_epochs: int,
    total_epochs: int,
) -> Schedule:
    warm = epoch_length
    flat_epochs = max(total_epochs - decay_epochs - 1, 0)
    flat = flat_epochs * epoch_length
    decay_len = decay_epochs * epoch_length

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        in_warm = step < warm
        in_flat = step < warm + flat
        in_decay = step < warm + flat + decay_len
        lr = jnp.where(
            in_warm,
            _linear(step, 1e-5, peak_lr, warm),
            jnp.where(
                in_flat,
                peak_lr,
                jnp.where(
                    in_decay,
                    _decay(step - warm - flat, peak_lr, decay_floor),
                    0.0,  # past the schedule -> 0 (LRSchedule.__getitem__ default)
                ),
            ),
        )
        return lr

    return schedule


def one_cycle(
    min_lr: float,
    peak_lr: float,
    decay_floor: float,
    epoch_length: int,
    decay_epochs: int,
    total_epochs: int,
) -> Schedule:
    total_steps = epoch_length * total_epochs
    decay_len = int(epoch_length * decay_epochs)
    triangle_epochs = total_epochs - decay_epochs
    up = int(0.5 * triangle_epochs * epoch_length)
    down = total_steps - up - decay_len

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        in_up = step < up
        in_down = step < up + down
        in_decay = step < up + down + decay_len
        lr = jnp.where(
            in_up,
            _linear(step, min_lr, peak_lr, up),
            jnp.where(
                in_down,
                _linear(step - up, peak_lr, min_lr, down),
                jnp.where(
                    in_decay,
                    _decay(step - up - down, min_lr, decay_floor),
                    0.0,
                ),
            ),
        )
        return lr

    return schedule


def flat(peak_lr: float) -> Schedule:
    def schedule(step):
        return jnp.full_like(jnp.asarray(step, jnp.float32), peak_lr)

    return schedule


def build_lr_schedule(
    cfg: LRScheduleConfig, epoch_length: int, total_epochs: int
) -> Schedule:
    """Select by config, the configure_lr_schedule equivalent
    (/root/reference/bin/exec.py:92-118)."""
    if isinstance(cfg, OneCycleConfig) or cfg.name == "one_cycle":
        return one_cycle(
            getattr(cfg, "min_learning_rate", 1e-5),
            cfg.peak_learning_rate,
            getattr(cfg, "decay_floor", 1e-5),
            epoch_length,
            getattr(cfg, "decay_epochs", 5),
            total_epochs,
        )
    if isinstance(cfg, WarmupFlatDecayConfig) or cfg.name == "standard":
        return warmup_flat_decay(
            cfg.peak_learning_rate,
            getattr(cfg, "decay_floor", 1e-3),
            epoch_length,
            getattr(cfg, "decay_epochs", 5),
            total_epochs,
        )
    return flat(cfg.peak_learning_rate)
