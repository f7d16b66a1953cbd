"""The jitted data-parallel training step.

Fuses everything the reference does per batch on device (reference
train.py:1252-1305): mean-shift + unit-sphere noise augmentation, decoder
forward with loss sum/basis decomposition, backward, gradient clipping (with
pre-clip norm reported), AdamW update — into ONE XLA computation per step.

Parallelism: params replicated, batch sharded over the 'data' mesh axis; XLA
inserts the gradient all-reduce (psum over ICI) automatically given the
output shardings. Optional microbatch gradient accumulation runs as a
lax.scan inside the same compiled step (the TPU-idiomatic equivalent of the
reference's GradAccum loop, embedding_dataset.py:198-273).

Host↔device traffic per step: the input batch (via the prefetch loader) and
a handful of scalar metrics out. No other syncs — the reference's per-batch
.item() syncs (train.py:1288-1305 'GPU-CPU synchronization point') become a
single small metrics fetch that the host EWA bookkeeping consumes.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from novic_tpu.data.noise import EmbeddingNoise, apply_mean_shift
from novic_tpu.train.optim import clip_by_global_norm


class TrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    step: jnp.ndarray  # optimizer step counter


def create_train_state(params, tx) -> TrainState:
    return TrainState(params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32))


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    *,
    noise: Optional[EmbeddingNoise] = None,
    mean_shift=None,                 # optional (F,) array
    gradient_clip: float = 1.0,
    accum_steps: int = 1,            # microbatch accumulation inside the step
    multi_first: bool = False,
    donate: bool = True,
    in_shardings=None,
    out_shardings=None,
    steps_per_call: int = 1,
):
    """Build the jitted step: (state, batch, lr, rng) → (state, metrics).

    batch = (embed BxF, target, mask, weight) with None members allowed.
    metrics = dict(loss_sum, loss_basis, correct, tokens, grad_norm).

    steps_per_call > 1 builds the dispatch-amortized variant instead:
    (state, batches, lrs, rngs) → (state, metrics) where every batch member
    gains a leading K axis, lrs is (K,) and rngs is (K, 2), and the K
    optimizer steps run as ONE device-resident ``lax.scan`` — one host
    dispatch and one metrics fetch ((K,)-shaped leaves) instead of K. The
    per-step dispatch overhead measured ~1.5x at production decoder shapes
    (BENCH_NOTES feed-gap row D: 21.2k noun/s per-step vs 31.5k amortized);
    the reference's hot loop (ref train.py:1252-1286) has no equivalent —
    torch eager pays Python per batch by construction."""
    mean_shift_arr = None if mean_shift is None else jnp.asarray(mean_shift, jnp.float32)

    def microbatch_grads(params, batch, rng):
        embed, target, mask, weight = batch
        embed = apply_mean_shift(embed.astype(jnp.float32), mean_shift_arr)
        if noise is not None:
            k_noise, rng = jax.random.split(rng)
            embed = noise(k_noise, embed)

        def lf(p):
            # Dropout rngs are threaded through model.apply below
            logits, padding, loss_sum, loss_basis, correct = model.apply(
                {"params": p}, embed, target, mask, weight,
                calc_loss=True, calc_correct=True, only_pred=False,
                guide_targets=None, multi_first=multi_first, deterministic=False,
                rngs={"dropout": rng})
            tokens = jnp.asarray(target.size, jnp.float32)
            if padding is not None:
                tokens = tokens - padding.sum()
            mean_loss = loss_sum / jnp.maximum(loss_basis, 1e-12)
            return mean_loss, (loss_sum, loss_basis, correct.sum().astype(jnp.float32), tokens)

        (mean_loss, aux), grads = jax.value_and_grad(lf, has_aux=True)(params)
        return grads, aux

    def step_fn(state: TrainState, batch, lr, rng):
        params = state.params
        if accum_steps <= 1:
            grads, (loss_sum, loss_basis, correct, tokens) = microbatch_grads(params, batch, rng)
        else:
            # Reshape batch leading dim into (A, B/A, ...) and scan
            def resh(x):
                if x is None:
                    return None
                return x.reshape((accum_steps, x.shape[0] // accum_steps) + x.shape[1:])

            scan_batch = tuple(resh(x) for x in batch)
            rngs = jax.random.split(rng, accum_steps)

            def body(carry, inp):
                g_acc, ls, lb, co, tk = carry
                mb, r = inp
                g, (s, b, c, t) = microbatch_grads(params, mb, r)
                g_acc = jax.tree.map(jnp.add, g_acc, g)
                return (g_acc, ls + s, lb + b, co + c, tk + t), None

            zero_g = jax.tree.map(jnp.zeros_like, params)
            (grads, loss_sum, loss_basis, correct, tokens), _ = jax.lax.scan(
                body, (zero_g, 0.0, 0.0, 0.0, 0.0), (scan_batch, rngs))
            grads = jax.tree.map(lambda g: g / accum_steps, grads)

        if gradient_clip > 0:
            grads, grad_norm = clip_by_global_norm(grads, gradient_clip)
        else:
            grad_norm = optax.global_norm(grads)

        opt_state = state.opt_state
        opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        new_state = TrainState(params=params, opt_state=opt_state, step=state.step + 1)
        metrics = {"loss_sum": loss_sum, "loss_basis": loss_basis, "correct": correct,
                   "tokens": tokens, "grad_norm": grad_norm}
        return new_state, metrics

    jit_kwargs = {}
    if in_shardings is not None:
        jit_kwargs["in_shardings"] = in_shardings
    if out_shardings is not None:
        jit_kwargs["out_shardings"] = out_shardings
    if steps_per_call <= 1:
        return jax.jit(step_fn, donate_argnums=(0,) if donate else (), **jit_kwargs)

    def multi_step_fn(state: TrainState, batches, lrs, rngs):
        def body(st, xs):
            b, lr, r = xs
            return step_fn(st, b, lr, r)

        return jax.lax.scan(body, state, (batches, lrs, rngs))

    return jax.jit(multi_step_fn, donate_argnums=(0,) if donate else (), **jit_kwargs)


@dataclasses.dataclass
class EwaMetrics:
    """Exponentially-weighted training metrics with half-life in chunks
    (ref train.py:1051-1052,1288-1305)."""

    ewa_factor: float
    loss_sum: float = 0.0
    loss_basis: float = 0.0
    correct: float = 0.0
    tokens: float = 0.0
    top1_max: float = 0.0

    @staticmethod
    def create(halflife_chunks: float, chunk_batches: int) -> "EwaMetrics":
        # factor per batch so that the half-life equals halflife_chunks chunks
        factor = 0.5 ** (1.0 / max(halflife_chunks * chunk_batches, 1e-9))
        return EwaMetrics(ewa_factor=factor)

    def update(self, loss_sum: float, loss_basis: float, correct: float, tokens: float):
        f = self.ewa_factor
        self.loss_sum = self.loss_sum * f + loss_sum
        self.loss_basis = self.loss_basis * f + loss_basis
        self.correct = self.correct * f + correct
        self.tokens = self.tokens * f + tokens
        self.top1_max = max(self.top1_max, self.top1)

    @property
    def loss(self) -> float:
        return self.loss_sum / max(self.loss_basis, 1e-12)

    @property
    def top1(self) -> float:
        return self.correct / max(self.tokens, 1e-12)
