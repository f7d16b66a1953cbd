"""Optimizer + learning-rate schedule.

Parity with the reference training setup (reference train.py:1103-1165):
AdamW with configurable betas and a weight-decay split that exempts 0D/1D
parameters (layer norms, biases, ReZero scalars) unless weight_decay_1d;
linear warmup over lr_warmup chunks (start factor 1/(W+1)) followed by cosine
annealing to final_lr over the remaining chunks; gradient clipping by global
norm with the pre-clip norm reported for stats (ref train.py:1280-1345).

The LR advances per CHUNK (the reference steps its schedulers once per chunk,
train.py:1345-1347), so the schedule is a function of chunk index that the
loop feeds into the jitted step as a scalar.
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
import optax


def lr_schedule_per_chunk(init_lr: float, final_lr: float, lr_scheduler: str,
                          lr_warmup: int, max_chunks: int,
                          start_chunk: int = 1) -> Callable[[int], float]:
    """chunk_id (1-based) → learning rate.

    start_chunk anchors the schedule: 1 continues/starts the original horizon
    (resume with load_lr_state, ref train.py:1097-1100 restores the scheduler
    state), while start_chunk = resumed chunk restarts warmup AND the cosine
    horizon over the remaining chunks (load_lr_state=False, ref :1132-1134
    resets lr and :1142-1146 skips restoring the warmup/cosine schedulers)."""
    scheduler = lr_scheduler.lower()
    if scheduler not in ("const", "cosine"):
        raise ValueError(f"Unsupported learning rate scheduler: {lr_scheduler}")
    # Cosine horizon (ref train.py:1156): +1 chunk when final_lr == 0 so the last
    # trained chunk doesn't hit exactly 0
    t_max = max((max_chunks if final_lr > 0 else max_chunks + 1) - start_chunk, 1)

    def schedule(chunk_id: int) -> float:
        t = max(chunk_id - start_chunk, 0)  # chunks completed since the anchor
        warm = min(t, lr_warmup)
        warm_factor = (1 + warm) / (lr_warmup + 1) if lr_warmup >= 1 else 1.0
        if scheduler == "const":
            return init_lr * warm_factor
        tc = min(t, t_max)
        cos = final_lr + (init_lr - final_lr) * (1 + math.cos(math.pi * tc / t_max)) / 2
        return cos * warm_factor

    return schedule


def create_optimizer(*, beta1: float = 0.9, beta2: float = 0.95, eps: float = 1e-8,
                     weight_decay: float = 0.1, weight_decay_1d: bool = False,
                     gradient_clip: float = 1.0) -> optax.GradientTransformation:
    """AdamW taking the learning rate as an injected hyperparameter; gradient
    clipping is done in the train step (so the pre-clip norm can be reported)."""

    def decay_mask(params):
        if weight_decay_1d:
            return jax.tree.map(lambda p: True, params)
        return jax.tree.map(lambda p: p.ndim >= 2, params)

    return optax.inject_hyperparams(optax.adamw)(
        learning_rate=0.0, b1=beta1, b2=beta2, eps=eps,
        weight_decay=weight_decay, mask=decay_mask)


def global_norm(tree) -> jnp.ndarray:
    return optax.global_norm(tree)


def clip_by_global_norm(tree, max_norm: float):
    """Returns (clipped_tree, pre_clip_norm); torch clip_grad_norm_ semantics."""
    norm = optax.global_norm(tree)
    scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-12))
    return jax.tree.map(lambda g: g * scale, tree), norm
