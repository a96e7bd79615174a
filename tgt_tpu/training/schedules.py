"""Learning-rate schedules and the plateau controller.

Capability-parity with the reference mixins (lib/training/training_mixins.py):
- ``warmup_cosine``: per-step linear warmup to peak then cosine decay over a
  total step budget, with a floor (mixins :276-317). Training stops when the
  budget is exhausted (handled by the harness via ``is_finished``).
- ``warmup_linear``: warmup only (mixins :259-273).
- ``PlateauController``: ReduceLR-on-plateau with patience and a stopping lr
  (mixins :170-255) — host-side state, applied as a multiplicative factor.

All schedule fns map step -> lr and are jax-traceable (usable directly as
optax schedules).
"""
from __future__ import annotations

import dataclasses
import jax.numpy as jnp


def warmup_cosine(max_lr: float, warmup_steps: int, total_steps: int,
                  min_lr: float = 1e-6, halfwave: bool = False):
    """Linear warmup then cosine decay, exactly the reference formula
    (training_mixins.py:292-313):

      step <= warmup:  min + (max-min) * step/warmup
      else:            min + (max-min) * (1+cos(pi*p))/2       (full wave)
                       min + (max-min) * cos(pi*p/2)           (halfwave)
      with p = (step-warmup)/(total-warmup), clipped to [0, 1].

    The harness stops training once step > total_steps (mixins :301-304).
    """

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = min_lr + (max_lr - min_lr) * step / jnp.maximum(warmup_steps, 1)
        p = jnp.clip((step - warmup_steps)
                     / jnp.maximum(total_steps - warmup_steps, 1), 0.0, 1.0)
        if halfwave:
            decay = min_lr + (max_lr - min_lr) * jnp.cos(0.5 * jnp.pi * p)
        else:
            decay = min_lr + (max_lr - min_lr) * 0.5 * (1.0 + jnp.cos(jnp.pi * p))
        return jnp.where(step <= warmup_steps, warm, decay)

    return schedule


def warmup_linear(peak_lr: float, warmup_steps: int):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        return peak_lr * jnp.minimum(step / jnp.maximum(warmup_steps, 1), 1.0)

    return schedule


def constant(lr: float):
    def schedule(step):
        return jnp.full_like(jnp.asarray(step, jnp.float32), lr)

    return schedule


@dataclasses.dataclass
class PlateauController:
    """ReduceLROnPlateau: multiply lr by ``factor`` after ``patience`` epochs
    without val improvement; signal stop when lr falls below ``stopping_lr``.
    """

    factor: float = 0.5
    patience: int = 10
    stopping_lr: float = 0.0
    best: float = float("inf")
    bad_epochs: int = 0
    scale: float = 1.0

    def update(self, val_metric: float, current_lr: float) -> bool:
        """Record an epoch's val metric; returns True if training should stop."""
        if val_metric < self.best:
            self.best = val_metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.scale *= self.factor
                self.bad_epochs = 0
        return current_lr * self.scale < self.stopping_lr

    def state_dict(self):
        return {"best": self.best, "bad_epochs": self.bad_epochs,
                "scale": self.scale}

    def load_state_dict(self, d):
        self.best = d["best"]
        self.bad_epochs = d["bad_epochs"]
        self.scale = d["scale"]
