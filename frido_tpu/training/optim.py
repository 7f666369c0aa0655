"""Optimizers and LR schedules.

AdamW matches the reference trainer (``frido.py:1592-1614``); LR lambda
schedulers replicate ``/root/reference/taming/lr_scheduler.py``. The
reference LR-scaling rule (``main.py:802-810``):
``lr = accumulate_grad_batches * n_devices * batch_size * base_lr``.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np
import optax


class LambdaWarmUpCosineScheduler:
    """Linear warmup then cosine decay multiplier
    (``taming/lr_scheduler.py:4-30``); use with base_lr 1.0."""

    def __init__(self, warm_up_steps, lr_min, lr_max, lr_start,
                 max_decay_steps, verbosity_interval=0):
        self.warm_up_steps = warm_up_steps
        self.lr_start = lr_start
        self.lr_min = lr_min
        self.lr_max = lr_max
        self.max_decay_steps = max_decay_steps

    def __call__(self, n):
        if n < self.warm_up_steps:
            return ((self.lr_max - self.lr_start) / self.warm_up_steps * n
                    + self.lr_start)
        t = (n - self.warm_up_steps) / (self.max_decay_steps - self.warm_up_steps)
        t = min(t, 1.0)
        return self.lr_min + 0.5 * (self.lr_max - self.lr_min) * (
            1 + np.cos(t * np.pi))

    def schedule(self, n):
        return self(n)


class LambdaLinearScheduler:
    """Linear warmup then constant multiplier (the LDM config family)."""

    def __init__(self, warm_up_steps, f_min, f_max, f_start, cycle_lengths=None,
                 verbosity_interval=0):
        def first(x):
            return x[0] if isinstance(x, (list, tuple)) else x

        self.warm_up_steps = first(warm_up_steps)
        self.f_min = first(f_min)
        self.f_max = first(f_max)
        self.f_start = first(f_start)
        self.cycle_length = first(cycle_lengths) if cycle_lengths else None

    def __call__(self, n):
        if n < self.warm_up_steps:
            return ((self.f_max - self.f_start) / self.warm_up_steps * n
                    + self.f_start)
        if self.cycle_length is not None:
            t = min((n - self.warm_up_steps) /
                    max(self.cycle_length - self.warm_up_steps, 1), 1.0)
            return self.f_min + (self.f_max - self.f_min) * (1 - t)
        return self.f_max

    def schedule(self, n):
        return self(n)


def scaled_learning_rate(base_lr: float, batch_size: int, n_devices: int,
                         accumulate_grad_batches: int = 1,
                         scale_lr: bool = True) -> float:
    """``main.py:793-810``."""
    if not scale_lr:
        return base_lr
    return accumulate_grad_batches * n_devices * batch_size * base_lr


def build_optimizer(learning_rate: float,
                    scheduler: Optional[Any] = None,
                    weight_decay: float = 0.01,
                    b1: float = 0.9, b2: float = 0.999,
                    accumulate_grad_batches: int = 1,
                    mu_dtype: Optional[Any] = None) -> optax.GradientTransformation:
    """AdamW (torch defaults: wd=0.01) with optional per-step LR lambda and
    gradient accumulation via optax.MultiSteps.

    mu_dtype: store the Adam first moment in this dtype (``jnp.bfloat16``
    halves its HBM footprint, −1.27 GB on the 679M-trainable flagship —
    the round-5 lever that fits the batch-32 remat step, which OOMs by
    236 MB with fp32 moments). The second moment and master params stay
    fp32. Default None = fp32, matching the reference's torch AdamW
    (``frido.py:1592-1614``) bit-for-bit."""
    lr = (_JaxLambdaLR(learning_rate, scheduler)
          if scheduler is not None else learning_rate)
    tx = optax.adamw(lr, b1=b1, b2=b2, weight_decay=weight_decay,
                     mu_dtype=mu_dtype)
    if accumulate_grad_batches > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate_grad_batches)
    return tx


def _JaxLambdaLR(base_lr: float, scheduler: Any):
    """Lower a python LR lambda to a jnp-traceable schedule.

    Both reference schedulers are piecewise (linear warmup + cosine/linear/
    constant); evaluate them with jnp ops so the schedule jits.
    """
    import jax.numpy as jnp

    if isinstance(scheduler, LambdaWarmUpCosineScheduler):
        def fn(step):
            s = step.astype(jnp.float32)
            warm = (scheduler.lr_max - scheduler.lr_start) / \
                scheduler.warm_up_steps * s + scheduler.lr_start
            t = jnp.clip((s - scheduler.warm_up_steps) /
                         (scheduler.max_decay_steps - scheduler.warm_up_steps),
                         0.0, 1.0)
            cos = scheduler.lr_min + 0.5 * (scheduler.lr_max - scheduler.lr_min) \
                * (1 + jnp.cos(t * jnp.pi))
            return base_lr * jnp.where(s < scheduler.warm_up_steps, warm, cos)
        return fn
    if isinstance(scheduler, LambdaLinearScheduler):
        def fn(step):
            s = step.astype(jnp.float32)
            warm = (scheduler.f_max - scheduler.f_start) / \
                scheduler.warm_up_steps * s + scheduler.f_start
            if scheduler.cycle_length is not None:
                t = jnp.clip((s - scheduler.warm_up_steps) /
                             max(scheduler.cycle_length - scheduler.warm_up_steps, 1),
                             0.0, 1.0)
                post = scheduler.f_min + (scheduler.f_max - scheduler.f_min) * (1 - t)
            else:
                post = scheduler.f_max
            return base_lr * jnp.where(s < scheduler.warm_up_steps, warm, post)
        return fn
    raise TypeError(f"unsupported scheduler {type(scheduler)}")


def build_from_config(base_lr: float, scheduler_config: Optional[Dict] = None,
                      **kw) -> optax.GradientTransformation:
    scheduler = None
    if scheduler_config is not None:
        from frido_tpu.config import instantiate_from_config

        scheduler = instantiate_from_config(scheduler_config)
    return build_optimizer(base_lr, scheduler, **kw)
