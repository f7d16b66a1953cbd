"""Chunked training loop with checkpoint policy and resume.

Semantics of the reference training loop (reference train.py:977-1479):
training proceeds in chunks of ``chunk_batches`` batches (chunk size =
num_valid_targets * chunk_scale samples quantized to batch size,
train.py:990); LR schedule advances per chunk; EWA loss/top-1 tracked with a
half-life in chunks; checkpoints saved every save_every_max chunks, or after
save_every_min chunks once EWA top-1 ≥ save_top1_min, has plateaued
(< save_top1_delta gain) and is a new max (train.py:1349-1361); resume
restores the full optimizer/scheduler/EWA/counter state.

TPU-first: one jitted data-parallel step per batch (see train/step.py); the
host loop only does bookkeeping, LR schedule, prefetching and checkpointing.
"""

from __future__ import annotations

import dataclasses
import math
import time
from typing import Any, Optional

import jax
import numpy as np

from novic_tpu.data.noise import EmbeddingNoise
from novic_tpu.train.optim import create_optimizer, lr_schedule_per_chunk
from novic_tpu.train.step import EwaMetrics, TrainState, create_train_state, make_train_step
from novic_tpu.utils.logger import log
from novic_tpu.utils.metrics import MetricsLogger


@dataclasses.dataclass
class TrainLoopConfig:
    """Static loop configuration (ref train.py TrainLoopConfig)."""

    chunk_batches: int          # batches per chunk
    chunk_samples: int          # samples per chunk
    epoch_batches: int          # batches per epoch
    max_chunks: int             # total chunks to train
    batch_size: int
    accum_size: int = 1
    gradient_clip: float = 1.0
    loss_ewa_halflife: float = 4.0
    save_every_min: int = 12
    save_every_max: int = 48
    save_top1_min: float = 0.95
    save_top1_delta: float = 0.005
    # Optimizer steps per host dispatch: >1 drives K accumulated steps as one
    # device-resident lax.scan (train/step.py steps_per_call), amortizing the
    # per-step dispatch overhead (measured 1.5x at production shapes,
    # BENCH_NOTES feed-gap row D). Semantics are pinned equal to per-step
    # dispatch (tests/test_train.py test_multi_step_dispatch_matches_per_step).
    steps_per_dispatch: int = 1
    init_lr: float = 1.5e-3
    final_lr: float = 0.0
    lr_scheduler: str = "cosine"
    lr_warmup: int = 0
    last_dropout_chunks: int = 0     # rescale dropout this many chunks before the end (0 = off)
    last_dropout_factor: float = 0.0  # dropout rescale factor for the final chunks
    # load_lr_state=False resume: restart warmup + cosine horizon from the
    # resumed chunk instead of continuing the original schedule
    lr_resume_fresh: bool = False


@dataclasses.dataclass
class TrainLoopState:
    """Mutable loop state (ref train.py TrainLoopState); checkpointed for resume."""

    epoch_id: int = 1
    chunk_id: int = 1
    batch_id: int = 1
    sample_id: int = 1
    epoch_batches_left: int = -1
    saved_num: int = 0
    saved_chunk_id: int = 0
    saved_ewa_train_top1_max: float = 0.0
    ewa_train_top1_last: float = 0.0
    allow_save_delta: bool = False
    rng_seed: int = 0

    def as_dict(self) -> dict:
        return dataclasses.asdict(self)

    @staticmethod
    def from_dict(d: dict) -> "TrainLoopState":
        return TrainLoopState(**d)


def _pad_trailing_and_combine(xs: list, mode: str):
    """Pad one field of several batches to common trailing dims, then combine.

    Members may differ in trailing dims (the cache Dataset's dynamic
    multi-target / token-length trims drop all-padding columns per batch,
    data/cache.py:741-776); padding them back with the format's own padding
    values (target id 0, padding-mask True, weight 0) reconstructs exactly
    the untrimmed representation, so the combined batch is loss-identical to
    forwarding each batch separately."""
    if xs[0] is None:
        return None
    import jax.numpy as jnp

    xp = jnp if any(isinstance(x, jax.Array) for x in xs) else np
    trailing = [max(x.shape[d] for x in xs) for d in range(1, xs[0].ndim)]
    pad_value = True if xs[0].dtype == bool else 0

    def pad(x):
        widths = [(0, 0)] + [(0, t - s) for s, t in zip(x.shape[1:], trailing)]
        if not any(w[1] for w in widths):
            return x
        return xp.pad(x, widths, constant_values=pad_value)

    padded = [pad(x) for x in xs]
    return xp.concatenate(padded, axis=0) if mode == "concat" else xp.stack(padded, axis=0)


def _accum_concat(xs: list):
    """Concatenate one field of an accumulation group along the batch axis."""
    if len(xs) == 1:
        return xs[0]
    return _pad_trailing_and_combine(xs, "concat")


def _accum_stack(xs: list):
    """Stack one field of K meta-batches along a NEW leading axis for a
    multi-step dispatch (train/step.py steps_per_call)."""
    return _pad_trailing_and_combine(xs, "stack")


def compute_chunk_batches(num_valid_targets: int, chunk_scale: float, batch_size: int) -> int:
    """chunk_batches = ceil(num_valid_targets * chunk_scale / batch_size)
    (ref train.py:990)."""
    return max(int(math.ceil(num_valid_targets * chunk_scale / batch_size)), 1)


def train(
    *,
    model,
    params,
    dataset,                     # configured EmbeddingDataset (loaded() context held by caller or here)
    loader,                      # batch loader over the dataset
    loader_info,
    C: TrainLoopConfig,
    S: Optional[TrainLoopState] = None,
    noise: Optional[EmbeddingNoise] = None,
    mean_shift: Optional[np.ndarray] = None,
    multi_first: bool = False,
    beta1: float = 0.9,
    beta2: float = 0.95,
    weight_decay: float = 0.1,
    weight_decay_1d: bool = False,
    optimizer: str = "AdamW",
    nesterov: bool = True,
    opt_state_arrays: Optional[Any] = None,   # resume: restored optimizer state
    metrics: Optional[MetricsLogger] = None,
    save_fn=None,                # callable(chunk_id, state, S) -> path, or None
    mesh=None,                   # optional jax Mesh for data parallelism
    profile_dir: Optional[str] = None,  # capture a jax profiler trace of chunk 1
):
    """Run the training loop; returns (final TrainState, TrainLoopState, EWA metrics)."""
    S = S or TrainLoopState()
    tx = create_optimizer(beta1=beta1, beta2=beta2, weight_decay=weight_decay,
                          weight_decay_1d=weight_decay_1d, gradient_clip=C.gradient_clip,
                          optimizer=optimizer, nesterov=nesterov)
    state = create_train_state(params, tx)
    if opt_state_arrays is not None:
        state = restore_opt_state(state, opt_state_arrays)

    in_shardings = None
    in_shardings_multi = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        replicated = NamedSharding(mesh, P())
        sharded = NamedSharding(mesh, P("data"))
        state = jax.device_put(state, replicated)
        in_shardings = (replicated,
                        tuple(sharded for _ in range(4)),
                        None, None)
        # Multi-step dispatch: batches gain a leading K axis; the per-sample
        # batch axis (now axis 1) stays sharded over 'data'
        sharded_k = NamedSharding(mesh, P(None, "data"))
        in_shardings_multi = (replicated,
                              tuple(sharded_k for _ in range(4)),
                              None, None)

    K = max(C.steps_per_dispatch, 1)

    def build_step(m, steps_per_call: int = 1):
        return make_train_step(m, tx, noise=noise, mean_shift=mean_shift,
                               gradient_clip=C.gradient_clip, accum_steps=C.accum_size,
                               multi_first=multi_first, steps_per_call=steps_per_call,
                               in_shardings=(in_shardings if steps_per_call <= 1
                                             else in_shardings_multi))

    def rescale_dropout_model(m, factor: float):
        """Rebuild the model with rescaled dropout probabilities
        (ref train.py:1215-1217,1363; utils.py:177-192)."""
        cfg2 = m.cfg.replace(input_dropout=m.cfg.input_dropout * factor,
                             layer_dropout=m.cfg.layer_dropout * factor)
        return type(m)(cfg=cfg2)

    dropout_trigger = (C.max_chunks - C.last_dropout_chunks + 1
                       if C.last_dropout_chunks >= 1 else None)
    if dropout_trigger is not None and S.chunk_id >= dropout_trigger:
        model = rescale_dropout_model(model, C.last_dropout_factor)
        dropout_trigger = None
    step = build_step(model)
    step_multi = build_step(model, K) if K > 1 else None

    schedule = lr_schedule_per_chunk(C.init_lr, C.final_lr, C.lr_scheduler, C.lr_warmup,
                                     C.max_chunks,
                                     start_chunk=S.chunk_id if C.lr_resume_fresh else 1)
    A = max(C.accum_size, 1)
    if multi_first and A > 1:
        raise ValueError("accum_factor > 1 requires batch-major data (multi_first=False)")
    # EWA half-life is in chunks; updates arrive once per optimizer step
    # (= accum_size loader batches), so the per-update factor scales with A
    ewa = EwaMetrics.create(C.loss_ewa_halflife, max(C.chunk_batches / A, 1e-9))
    rng = jax.random.PRNGKey(S.rng_seed)

    if S.epoch_batches_left < 0:
        S.epoch_batches_left = C.epoch_batches
    elif S.epoch_batches_left == 0:
        S.epoch_batches_left = C.epoch_batches
        S.epoch_id += 1

    stop_training = S.chunk_id >= C.max_chunks + 1
    if profile_dir and not stop_training:
        jax.profiler.start_trace(profile_dir)
        log.info(f"Profiling chunk {S.chunk_id} to {profile_dir}")
    profiling = bool(profile_dir) and not stop_training
    grad_norms: list[float] = []
    pending = None  # one-step delayed metrics fetch to overlap host/device
    start_time = time.perf_counter()
    chunk_start = start_time

    def consume(pending_metrics):
        m = jax.tree.map(np.asarray, pending_metrics)
        if m["loss_sum"].ndim:  # (K,)-stacked metrics from a multi-step dispatch
            for i in range(m["loss_sum"].shape[0]):
                ewa.update(float(m["loss_sum"][i]), float(m["loss_basis"][i]),
                           float(m["correct"][i]), float(m["tokens"][i]))
                grad_norms.append(float(m["grad_norm"][i]))
        else:
            ewa.update(float(m["loss_sum"]), float(m["loss_basis"]),
                       float(m["correct"]), float(m["tokens"]))
            grad_norms.append(float(m["grad_norm"]))

    accum_buf: list = []  # loader batches awaiting one accumulated optimizer step
    group_buf: list = []  # complete (batch_tuple, lr, key) groups awaiting multi-dispatch

    def dispatch_one(batch_tuple, lr_, key):
        nonlocal state, pending
        state, m = step(state, batch_tuple, lr_, key)
        # One-step-delayed fetch: the host blocks on step t-1's scalar
        # metrics only AFTER dispatching step t, so the device stream
        # always has a step enqueued and is never drained — the fetch
        # costs one scalar-transfer latency of host time per batch, not
        # a device sync (safe at DP-8 step times of ~30 ms).
        if pending is not None:
            consume(pending)
        pending = m

    def dispatch_group():
        """Dispatch the buffered complete accumulation groups: a full K-group
        goes out as ONE multi-step lax.scan call (train/step.py
        steps_per_call); a partial buffer (chunk-end flush) drains through
        the per-step program so only two programs ever compile (K and 1)."""
        nonlocal state, pending
        if not group_buf:
            return
        import jax.numpy as jnp

        same_b = len({bt[0].shape[0] for bt, _, _ in group_buf}) == 1
        if len(group_buf) == K and K > 1 and same_b:
            batches = tuple(_accum_stack([bt[j] for bt, _, _ in group_buf])
                            for j in range(4))
            lrs = jnp.asarray([lr_ for _, lr_, _ in group_buf], jnp.float32)
            rngs = jnp.stack([key for _, _, key in group_buf])
            group_buf.clear()
            state, m = step_multi(state, batches, lrs, rngs)
            if pending is not None:
                consume(pending)
            pending = m
        else:
            leftovers = list(group_buf)
            group_buf.clear()
            for bt, lr_, key in leftovers:
                dispatch_one(bt, lr_, key)

    def dispatch_accum():
        """Concatenate the buffered loader batches into one meta-batch for one
        accumulated optimizer step (the step microbatches them back via
        lax.scan — reference GradAccum semantics, effective batch =
        batch_size * accum_factor, ref embedding_dataset.py:198-273 — but at
        full loader-batch MXU shapes instead of host-side re-staging), then
        dispatch it — immediately (K=1) or buffered K-at-a-time."""
        nonlocal rng
        rng, k = jax.random.split(rng)
        batch_tuple = tuple(_accum_concat([b[j] for b in accum_buf]) for j in range(4))
        accum_buf.clear()
        if K <= 1:
            dispatch_one(batch_tuple, dispatch_accum.lr, k)
            return
        group_buf.append((batch_tuple, dispatch_accum.lr, k))
        if len(group_buf) == K:
            dispatch_group()

    while not stop_training:
        log.info("-" * 60)
        log.info(f"Epoch {S.epoch_id} | Batch {S.batch_id} | Sample {S.sample_id}")

        for batch in loader:
            chunk_batch_id = (S.batch_id - 1) % C.chunk_batches
            if chunk_batch_id == 0:
                log.info(f"Chunk {S.chunk_id} | Batch {S.batch_id} | Sample {S.sample_id}")
                chunk_start = time.perf_counter()

            lr = dispatch_accum.lr = schedule(S.chunk_id)
            embed, target, mask, weight = batch

            def prep(x, dtype=None):
                # Device arrays (from a device_put prefetch loader) pass through;
                # host arrays are made contiguous for the transfer
                if x is None or isinstance(x, jax.Array):
                    return x
                return np.ascontiguousarray(x, dtype=dtype) if dtype else np.ascontiguousarray(x)

            accum_buf.append((prep(embed, np.float32), prep(target), prep(mask),
                              prep(weight, np.float32)))
            if len(accum_buf) == A:
                dispatch_accum()

            batch_samples = embed.shape[0]
            S.sample_id += batch_samples
            S.batch_id += 1
            S.epoch_batches_left -= 1

            if chunk_batch_id == C.chunk_batches - 1:
                dispatch_group()  # flush buffered groups so the chunk's
                # metrics/checkpoint reflect every dispatched step
                if pending is not None:
                    consume(pending)
                    pending = None
                chunk_time = time.perf_counter() - chunk_start
                gns = np.asarray(grad_norms) if grad_norms else np.zeros(1)
                log.info(
                    f"Trained chunk {S.chunk_id} in {chunk_time:.1f}s at "
                    f"{C.chunk_samples / max(chunk_time, 1e-9):.0f} noun/s: lr={lr:.2e}, "
                    f"loss={ewa.loss:.3e}, top1={ewa.top1:.3%} "
                    f"(grad norm {gns.min():.3g}..{gns.max():.3g})")
                if metrics:
                    metrics.log(dict(chunk=S.chunk_id, batch=S.batch_id - 1,
                                     sample=S.sample_id - 1, lr=lr, loss=ewa.loss,
                                     top1=ewa.top1 * 100, top1_max=ewa.top1_max * 100,
                                     chunk_time=chunk_time,
                                     grad_norm_min=float(gns.min()),
                                     grad_norm_mean=float(gns.mean()),
                                     grad_norm_max=float(gns.max()),
                                     saved_num=S.saved_num))
                grad_norms.clear()

                S.chunk_id += 1
                if profiling:
                    jax.profiler.stop_trace()
                    profiling = False
                if S.chunk_id >= C.max_chunks + 1:
                    stop_training = True

                if dropout_trigger is not None and S.chunk_id >= dropout_trigger:
                    log.info(f"Rescaling dropout by x{C.last_dropout_factor} for the "
                             f"final {C.last_dropout_chunks} chunks")
                    model = rescale_dropout_model(model, C.last_dropout_factor)
                    step = build_step(model)
                    step_multi = build_step(model, K) if K > 1 else None
                    dropout_trigger = None

                # Checkpoint policy (ref train.py:1349-1361)
                save_chunk_id = S.chunk_id - 1
                chunks_since_save = save_chunk_id - S.saved_chunk_id
                if ewa.top1 >= C.save_top1_min and ewa.top1 - S.ewa_train_top1_last <= C.save_top1_delta:
                    S.allow_save_delta = True
                S.ewa_train_top1_last = ewa.top1
                should_save = stop_training or chunks_since_save >= C.save_every_max or (
                    chunks_since_save >= C.save_every_min and ewa.top1 >= C.save_top1_min
                    and S.allow_save_delta and ewa.top1 >= S.saved_ewa_train_top1_max)
                if should_save and save_fn is not None:
                    S.saved_num += 1
                    S.saved_chunk_id = save_chunk_id
                    S.saved_ewa_train_top1_max = max(S.saved_ewa_train_top1_max, ewa.top1)
                    save_fn(save_chunk_id, state, S)  # save_checkpoint logs each file written

                if stop_training:
                    break

            if S.epoch_batches_left == 0:
                break

        if S.epoch_batches_left == 0:
            S.epoch_batches_left = C.epoch_batches
            S.epoch_id += 1

    dispatch_group()  # flush any complete groups buffered at an early exit
    if accum_buf:
        # Stopping mid-meta-batch: the reference likewise discards partially
        # accumulated meta-batches at stop/resume (ref train.py:1431,1279).
        # Roll the counters back so the final state's batch/sample ids
        # describe exactly the samples that reached the optimizer.
        n_disc = len(accum_buf)
        disc_samples = sum(b[0].shape[0] for b in accum_buf)
        log.info(f"Discarding {n_disc} loader batches ({disc_samples} samples) of a "
                 f"partial accumulation group at stop")
        S.batch_id -= n_disc
        S.sample_id -= disc_samples
        accum_buf.clear()
    if pending is not None:
        consume(pending)
    elapsed = time.perf_counter() - start_time
    log.info(f"Trained {S.chunk_id - 1} chunks in {elapsed:.1f}s "
             f"({S.batch_id - 1} batches = {S.sample_id - 1} samples)")
    return state, S, ewa


def extract_opt_state_arrays(state: TrainState):
    """Optimizer state → a plain array pytree for checkpointing."""
    return jax.tree.map(np.asarray, state.opt_state)


def restore_opt_state(state: TrainState, arrays) -> TrainState:
    """Restore the optimizer state structure from checkpointed leaf arrays
    (list in tree-flatten order, or a matching pytree)."""
    flat_new = arrays if isinstance(arrays, list) else jax.tree.leaves(arrays)
    treedef = jax.tree.structure(state.opt_state)
    return state.replace(opt_state=jax.tree.unflatten(treedef, flat_new))
