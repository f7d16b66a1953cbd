"""Production train-loop throughput vs steps_per_dispatch (VERDICT r4 #2).

Round-4 feed-gap row D: the resident-batch fused step ran at 21.2k noun/s
under per-step host dispatch vs 31.5k with amortized dispatch — the
production loop (train/loop.py) drove one optimizer step per host call.
steps_per_dispatch now scans K accumulated steps per dispatch
(train/step.py steps_per_call); this harness drives the REAL train() loop
(EWA bookkeeping, LR schedule, chunk logging — the exact CLI path) on
device-resident batches at K in {1, 4, 8} and reports steady-state chunk
rates. Gate: K>1 >= 90% of the measured amortized fused-step rate.

Run ON TPU: python exp/train_dispatch_amortize.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from novic_tpu.data.noise import EmbeddingNoise
from novic_tpu.models import DecoderModelConfig, PrefixedIterDecoder
from novic_tpu.train.loop import TrainLoopConfig, train

BATCH = int(os.environ.get("TDA_BATCH", 1024))
ACCUM = int(os.environ.get("TDA_ACCUM", 8))
N_DISTINCT = 16          # distinct resident loader batches cycled
CHUNK_BATCHES = int(os.environ.get("TDA_CHUNK", 64))  # loader batches per chunk
MAX_CHUNKS = int(os.environ.get("TDA_CHUNKS", 4))

cfg = DecoderModelConfig(embed_dim=768, vocab_size=4096, token_length=12,
                         hidden_dim=512, feedfwd_scale="1/4", mlp_seq_len=4,
                         num_layers=6, num_heads=8, compute_dtype="float32",
                         input_dropout=0.15, layer_dropout=0.05)


def make_batches():
    rng = np.random.default_rng(0)
    C = cfg.token_length
    out = []
    for _ in range(N_DISTINCT):
        embed = rng.normal(size=(BATCH, 768)).astype(np.float32)
        embed /= np.linalg.norm(embed, axis=1, keepdims=True)
        lengths = rng.integers(2, 9, size=BATCH)
        target = np.zeros((BATCH, C), np.int32)
        for i, L in enumerate(lengths):
            target[i, :L] = rng.integers(1, cfg.vocab_size, size=L)
        mask = np.arange(C)[None, :] > lengths[:, None]
        out.append((jax.device_put(embed), jax.device_put(target),
                    jax.device_put(mask), None))
    return out


class ResidentLoader:
    """Cycles device-resident batches forever (epoch_batches bounds the loop)."""

    def __init__(self, batches):
        self.batches = batches

    def __iter__(self):
        while True:
            yield from self.batches


def run(spd: int, batches) -> float:
    model = PrefixedIterDecoder(cfg=cfg)
    params = jax.jit(model.init)({"params": jax.random.PRNGKey(0)},
                                 jnp.zeros((1, 768), jnp.float32),
                                 jnp.zeros((1, 12), jnp.int32))["params"]
    noise = EmbeddingNoise.create("GaussElemUniformAngle", vec_norm=3.25,
                                  angle_min=45, angle_max=75, mix_ratio=0.15)
    C = TrainLoopConfig(chunk_batches=CHUNK_BATCHES,
                        chunk_samples=CHUNK_BATCHES * BATCH,
                        epoch_batches=CHUNK_BATCHES * MAX_CHUNKS,
                        max_chunks=MAX_CHUNKS, batch_size=BATCH,
                        accum_size=ACCUM, steps_per_dispatch=spd,
                        init_lr=1e-3, lr_warmup=0, save_every_max=10 ** 6,
                        loss_ewa_halflife=1.0)
    t_chunks = []
    t_mark = [time.perf_counter()]

    class TimingLoader:
        """Cycles resident batches and timestamps every CHUNK_BATCHES yields
        (at steady state, consecutive stamps bracket exactly one chunk of
        loop processing; the loop's own chunk-end metric consume syncs the
        device, so stamps track real completion, not dispatch runahead)."""

        def __iter__(self):
            n = 0
            while True:
                for b in batches:
                    yield b
                    n += 1
                    if n % CHUNK_BATCHES == 0:
                        now = time.perf_counter()
                        t_chunks.append(now - t_mark[0])
                        t_mark[0] = now

    loader = TimingLoader()

    t0 = time.perf_counter()
    state, S, ewa = train(model=model, params=params, dataset=None,
                          loader=loader, loader_info=None, C=C, noise=noise)
    total = time.perf_counter() - t0
    # Steady state = chunks after the first (compiles land in chunk 1).
    # The loop's own chunk logs print rates too; recompute here from stamps.
    steady = t_chunks[1:] if len(t_chunks) > 1 else t_chunks
    rate = CHUNK_BATCHES * BATCH / (sum(steady) / len(steady))
    print(f"steps_per_dispatch={spd}: steady-state {rate:,.0f} noun/s "
          f"({len(steady)} chunks; total {total:.1f}s incl. compile)", flush=True)
    return rate


def main():
    batches = make_batches()
    rates = {spd: run(spd, batches) for spd in (1, 4, 8)}
    base = rates[1]
    for spd in (4, 8):
        print(f"K={spd} vs per-step: {rates[spd] / base:.3f}x")
    print(f"gate (>=90% of 31.5k amortized fused rate = 28.35k): "
          f"{'PASS' if max(rates.values()) >= 28350 else 'FAIL'} "
          f"(best {max(rates.values()):,.0f})")


if __name__ == "__main__":
    main()
