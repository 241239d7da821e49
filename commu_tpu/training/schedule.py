"""Learning-rate schedule (reference: train.py:441-461).

Noam-style: linear warmup over ``warmup_step`` updates, then inverse-sqrt
decay floored at ``lr_min``.  The base rate is divided by the data-parallel
device count — a quirk preserved from the reference (train.py:441), where
``local_lr = cfg.TRAIN.lr / num_gpus`` compensates DDP's gradient *averaging*
across ranks.

The multiplier at update count 0 is 0 when ``warmup_step > 0`` (torch's
LambdaLR applies ``lambda(0)`` to the first optimizer step), and exactly
``lr_min/lr`` for all steps when ``warmup_step == 0`` except count 0 itself
which gets multiplier 1.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..config import TrainConfig


def make_lr_schedule(cfg: TrainConfig, num_devices: int = 1):
    base_lr = cfg.lr / num_devices
    warmup = cfg.warmup_step
    floor = cfg.lr_min / cfg.lr

    def schedule(count):
        count = jnp.asarray(count, dtype=jnp.float32)
        if warmup == 0:
            mult = jnp.where(count == 0, 1.0,
                             jnp.maximum(0.0, floor))
        else:
            warm = count / warmup
            decay = jnp.maximum((warmup ** 0.5) / jnp.sqrt(jnp.maximum(count, 1.0)),
                                floor)
            mult = jnp.where(count > warmup, decay, warm)
        return base_lr * mult

    return schedule
