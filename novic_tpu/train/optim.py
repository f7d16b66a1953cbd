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
        raise ValueError(f"LR scheduler not recognised: {lr_scheduler}")
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


def adamp(learning_rate: float, *, b1: float = 0.9, b2: float = 0.95,
          eps: float = 1e-8, weight_decay: float = 0.0, delta: float = 0.1,
          wd_ratio: float = 0.1, nesterov: bool = True,
          mask=None) -> optax.GradientTransformation:
    """AdamP (Heo et al. 2021) — Adam whose update is projected onto the
    tangent space of scale-invariant parameters (those followed by a
    normalization), damping the norm-growth that inflates effective LR decay.

    Transcribed from the published algorithm (the timm reference semantics
    the reference selects with optimizer=AdamP, ref train.py:1121): per
    parameter with ndim>1, try the channel view then the layer view; if the
    |cosine| between grad and param rows maxes below delta/sqrt(row_size),
    remove the radial component of the perturbation and scale weight decay
    by wd_ratio. Weight decay multiplies the parameter by
    (1 - lr*weight_decay*wd) BEFORE the -lr/bias1 * perturb step (timm order).
    `mask`: decay applies only where mask(params) is True (AdamW-style split).
    """

    def init(params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        return {"count": jnp.zeros((), jnp.int32),
                "mu": zeros, "nu": jax.tree.map(jnp.zeros_like, params)}

    def _project(p, g, pert):
        def view_stats(view_rows):
            pv = p.reshape(view_rows, -1)
            gv = g.reshape(view_rows, -1)
            p_norm = jnp.linalg.norm(pv, axis=1) + eps
            g_norm = jnp.linalg.norm(gv, axis=1) + eps
            cos = jnp.abs((pv * gv).sum(axis=1)) / p_norm / g_norm
            cond = cos.max() < delta / math.sqrt(pv.shape[1])
            p_n = (pv / p_norm[:, None]).reshape(p.shape)
            radial = (p_n * pert).reshape(view_rows, -1).sum(axis=1)
            expand = (view_rows,) + (1,) * (p.ndim - 1)
            proj = pert - p_n * radial.reshape(expand)
            return cond, proj

        c_cond, c_proj = view_stats(p.shape[0])   # channel view
        l_cond, l_proj = view_stats(1)            # layer view
        pert_out = jnp.where(c_cond, c_proj, jnp.where(l_cond, l_proj, pert))
        wd_out = jnp.where(c_cond | l_cond, wd_ratio, 1.0)
        return pert_out, wd_out

    def update(grads, state, params):
        if params is None:
            raise ValueError("adamp requires params")
        count = state["count"] + 1
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state["mu"], grads)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g, state["nu"], grads)
        bias1 = 1 - b1 ** count.astype(jnp.float32)
        bias2 = 1 - b2 ** count.astype(jnp.float32)
        decay_on = (mask(params) if mask is not None
                    else jax.tree.map(lambda p: True, params))
        lr = learning_rate

        def leaf(p, g, m, v, decay_flag):
            denom = jnp.sqrt(v) / jnp.sqrt(bias2) + eps
            pert = ((b1 * m + (1 - b1) * g) / denom) if nesterov else m / denom
            wd = jnp.asarray(1.0)
            if p.ndim > 1:
                pert, wd = _project(p, g, pert)
            upd = -(lr / bias1) * pert
            if decay_flag:  # static per-leaf mask; weight_decay may be traced
                upd = upd - lr * weight_decay * wd * p
            return upd

        updates = jax.tree.map(leaf, params, grads, mu, nu, decay_on)
        return updates, {"count": count, "mu": mu, "nu": nu}

    return optax.GradientTransformation(init, update)


def create_optimizer(*, beta1: float = 0.9, beta2: float = 0.95, eps: float = 1e-8,
                     weight_decay: float = 0.1, weight_decay_1d: bool = False,
                     gradient_clip: float = 1.0, optimizer: str = "AdamW",
                     nesterov: bool = True) -> optax.GradientTransformation:
    """AdamW / AdamP (ref train.py:1103-1165) taking the learning rate as an
    injected hyperparameter; gradient clipping is done in the train step (so
    the pre-clip norm can be reported)."""

    def decay_mask(params):
        if weight_decay_1d:
            return jax.tree.map(lambda p: True, params)
        return jax.tree.map(lambda p: p.ndim >= 2, params)

    name = optimizer.lower()
    if name == "adamw":
        return optax.inject_hyperparams(optax.adamw)(
            learning_rate=0.0, b1=beta1, b2=beta2, eps=eps,
            weight_decay=weight_decay, mask=decay_mask)
    if name == "adamp":
        return optax.inject_hyperparams(adamp, static_args=("nesterov", "mask"))(
            learning_rate=0.0, b1=beta1, b2=beta2, eps=eps,
            weight_decay=weight_decay, nesterov=nesterov, mask=decay_mask)
    raise ValueError(f"Unsupported optimizer: {optimizer} (AdamW | AdamP)")


def global_norm(tree) -> jnp.ndarray:
    return optax.global_norm(tree)


def clip_by_global_norm(tree, max_norm: float):
    """Returns (clipped_tree, pre_clip_norm); torch clip_grad_norm_ semantics."""
    norm = optax.global_norm(tree)
    scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-12))
    return jax.tree.map(lambda g: g * scale, tree), norm
