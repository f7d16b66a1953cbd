"""Close (or attribute) the soak train-feed gap (VERDICT r3 weak #1 / next #2).

The r03 soak measured 4,682 noun/s end-to-end training vs the fused step's
33.6k noun/s, blamed on the mmap feed — but exp/loader_feed_rate.py measured
that same path at 600k+ noun/s. Root cause found in round 4: the soak ran
batch_size=1024 with accum_factor=8, and the old loop SLICED each 1024-row
loader batch into 8 microbatches of 128 (terrible MXU shapes + 8x scan
overhead) instead of accumulating 8 loader batches into one 8192-row step
(the reference GradAccum semantics, now implemented in train/loop.py).

This harness measures every stage of the SAME production-shape pipeline on
one chip, so the end-to-end rate is attributable line by line:

  A. loader-only drain            (host mmap -> numpy batches)
  B. loader + device_put prefetch (host -> HBM transfer included)
  C. full train() loop            (CLI-equivalent path, fixed accum semantics)
  D. resident-batch fused step    (the 33.6k noun/s reference number)

Usage: python exp/feed_gap.py [rows] [batch] [accum] [chunks]
Reuses /tmp/feed_cache.bin from exp/loader_feed_rate.py (rebuilds if absent).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from exp.loader_feed_rate import F, NOUNS, build_cache, make_tt
from novic_tpu.data.cache import CacheExpectation, EmbeddingCache
from novic_tpu.data.loader import BatchLoader
from novic_tpu.data.noise import EmbeddingNoise
from novic_tpu.models import DecoderModelConfig, PrefixedIterDecoder
from novic_tpu.train.loop import TrainLoopConfig, train
from novic_tpu.train.optim import create_optimizer
from novic_tpu.train.step import create_train_state, make_train_step

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
ACCUM = int(sys.argv[3]) if len(sys.argv) > 3 else 8
CHUNKS = int(sys.argv[4]) if len(sys.argv) > 4 else 8

import exp.loader_feed_rate as lfr

lfr.ROWS, lfr.BATCH = ROWS, BATCH


def make_model():
    cfg = DecoderModelConfig(embed_dim=F, vocab_size=4096, token_length=12,
                             hidden_dim=512, feedfwd_scale="1/4", mlp_seq_len=4,
                             num_layers=6, num_heads=8, compute_dtype="float32",
                             input_dropout=0.15, layer_dropout=0.05)
    model = PrefixedIterDecoder(cfg=cfg)
    params = jax.jit(model.init)({"params": jax.random.PRNGKey(0)},
                                 jnp.zeros((1, F), jnp.float32),
                                 jnp.zeros((1, cfg.token_length), jnp.int32))["params"]
    return model, params


def noise():
    return EmbeddingNoise.create("GaussElemUniformAngle", vec_norm=3.25,
                                 angle_min=45, angle_max=75, mix_ratio=0.15)


def make_dataset(cache):
    ds = cache.create_dataset(batch_size=BATCH, training=True)
    ds.configure_data(ds.resolve_data_config(use_weights=False, multi_target=False))
    return ds


def phase_a(cache) -> float:
    ds = make_dataset(cache)
    loader = BatchLoader(ds, prefetch=4)
    n, t0 = 0, time.perf_counter()
    for batch in loader:
        n += batch[0].shape[0]
    return n / (time.perf_counter() - t0)


def phase_b(cache) -> float:
    ds = make_dataset(cache)
    loader = BatchLoader(ds, prefetch=4, device_put=True)
    n, t0 = 0, time.perf_counter()
    last = None
    for batch in loader:
        n += batch[0].shape[0]
        last = batch[0]
    np.asarray(jnp.sum(last))  # force the final transfer to complete
    return n / (time.perf_counter() - t0)


def phase_c(cache) -> float:
    model, params = make_model()
    ds = make_dataset(cache)
    loader = BatchLoader(ds, prefetch=4, device_put=True)
    epoch_batches = len(ds)
    chunk_batches = max(epoch_batches // CHUNKS, ACCUM)
    C = TrainLoopConfig(chunk_batches=chunk_batches, chunk_samples=chunk_batches * BATCH,
                        epoch_batches=(epoch_batches // ACCUM) * ACCUM,
                        max_chunks=CHUNKS, batch_size=BATCH, accum_size=ACCUM,
                        init_lr=1.5e-3, save_every_max=10_000, loss_ewa_halflife=2.0)
    t0 = time.perf_counter()
    state, S, ewa = train(model=model, params=params, dataset=None, loader=loader,
                          loader_info=None, C=C, noise=noise())
    dt = time.perf_counter() - t0
    return (S.sample_id - 1) / dt


def phase_d() -> float:
    model, params = make_model()
    tx = create_optimizer(gradient_clip=1.0)
    state = create_train_state(params, tx)
    step = make_train_step(model, tx, noise=noise(), gradient_clip=1.0,
                           accum_steps=ACCUM, donate=False)
    B = BATCH * ACCUM
    rng = np.random.default_rng(0)
    embed = jnp.asarray(rng.normal(size=(B, F)).astype(np.float32))
    embed = embed / jnp.linalg.norm(embed, axis=1, keepdims=True)
    Ctok = 12
    lengths = rng.integers(2, 9, size=B)
    target = np.where(np.arange(Ctok)[None, :] < lengths[:, None],
                      rng.integers(1, 4096, size=(B, Ctok)), 0).astype(np.int32)
    mask = jnp.asarray(np.arange(Ctok)[None, :] >= lengths[:, None] + 1)
    target = jnp.asarray(target)
    batch = (embed, target, mask, None)
    key = jax.random.PRNGKey(1)
    state, m = step(state, batch, 1.5e-3, key)  # compile
    np.asarray(m["loss_sum"])
    iters = 6
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, batch, 1.5e-3, jax.random.fold_in(key, i))
    np.asarray(m["loss_sum"])
    return B * iters / (time.perf_counter() - t0)


def main():
    path = os.environ.get("FEED_CACHE", "/tmp/feed_cache.bin")
    tt = make_tt()
    if not os.path.exists(path) or os.path.getsize(path) < ROWS * F * 4:
        build_cache(path, tt)
    exp_ = CacheExpectation(embed_dim=F, embed_dtype=np.float32)
    results = {}
    with EmbeddingCache(path, expectation=exp_, strict_embedder=False) as cache:
        results["A_loader_host"] = phase_a(cache)
        results["B_loader_device_put"] = phase_b(cache)
        results["C_train_e2e"] = phase_c(cache)
    results["D_step_resident"] = phase_d()
    print(f"--- feed gap attribution (batch {BATCH} x accum {ACCUM}, "
          f"{ROWS} rows, F={F}) ---")
    for k, v in results.items():
        print(f"{k:>22}: {v / 1000:8.1f}k noun/s")
    ratio = results["C_train_e2e"] / results["D_step_resident"]
    print(f"e2e / fused-step ratio: {ratio:.2f} "
          f"({'PASS >= 0.5' if ratio >= 0.5 else 'BELOW 0.5 target'})")


if __name__ == "__main__":
    main()
