"""On-chip training-step throughput for the released 12M decoder config.

Reference trains 18 epochs x 80.4M targets in <3 days on an A6000
(BASELINE.md: ~5.6k noun/s sustained incl. data loading).
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
from novic_tpu.train.optim import create_optimizer
from novic_tpu.train.step import create_train_state, make_train_step

BATCH, ACCUM, INNER, ITERS = 1024, 8, 5, 3  # effective batch 8192 (ref config)

DTYPE = os.environ.get("TRAIN_DTYPE", "float32")
DROP = float(os.environ.get("TRAIN_DROPOUT", "1"))
DROP_IMPL = os.environ.get("TRAIN_DROPOUT_IMPL", "auto")
ATTN = os.environ.get("TRAIN_ATTN", "auto")  # auto|einsum|vpu (models/layers.py _attend)
cfg = DecoderModelConfig(embed_dim=768, vocab_size=4096, token_length=12,
                         hidden_dim=512, feedfwd_scale="1/4", mlp_seq_len=4,
                         num_layers=6, num_heads=8, compute_dtype=DTYPE,
                         input_dropout=0.15 * DROP, layer_dropout=0.05 * DROP,
                         dropout_impl=DROP_IMPL, attn_impl=ATTN)
model = PrefixedIterDecoder(cfg=cfg)
kd, ke = jax.random.split(jax.random.PRNGKey(0))
params = jax.jit(model.init)({"params": kd}, jnp.zeros((1, 768), jnp.float32),
                             jnp.zeros((1, 12), jnp.int32))["params"]
tx = create_optimizer(gradient_clip=1.0)
state = create_train_state(params, tx)
noise = None if os.environ.get("TRAIN_NOISE", "1") == "0" else \
    EmbeddingNoise.create("GaussElemUniformAngle", vec_norm=3.25,
                          angle_min=45, angle_max=75, mix_ratio=0.15)
step = make_train_step(model, tx, noise=noise, gradient_clip=1.0,
                       accum_steps=ACCUM, donate=False)

B = BATCH * ACCUM
rng = np.random.default_rng(0)
embed = jnp.asarray(rng.normal(size=(B, 768)).astype(np.float32))
embed = embed / jnp.linalg.norm(embed, axis=1, keepdims=True)
C = cfg.token_length
lengths = rng.integers(2, 9, size=B)
target = np.zeros((B, C), np.int32)
for i, L in enumerate(lengths):
    target[i, :L] = rng.integers(1, cfg.vocab_size, size=L)
mask = jnp.asarray(np.arange(C)[None, :] > lengths[:, None])
target = jnp.asarray(target)
batch = (embed, target, mask, None)
RNG_IMPL = os.environ.get("TRAIN_RNG", "threefry2x32")
key = jax.random.key(1, impl=RNG_IMPL)  # typed key: impl survives jit/scan

# One uncached step to warm, then amortized timing (fresh key per iter so the
# noise differs; state threads through so steps are sequential like training)
state, m = step(state, batch, 1e-3, key)
_ = np.asarray(m["loss_sum"])

t0 = time.perf_counter()
st = state
for it in range(ITERS * INNER):
    st, m = step(st, batch, 1e-3, jax.random.fold_in(key, it))
_ = np.asarray(m["loss_sum"])
dt = (time.perf_counter() - t0) / (ITERS * INNER)
print(f"train step [{DTYPE} drop={DROP}/{DROP_IMPL} rng={RNG_IMPL}] (B={BATCH}x{ACCUM} accum): {dt*1000:.2f} ms/step  "
      f"{B/dt:,.0f} noun/s  (ref sustained ~5.6k noun/s incl. IO)", flush=True)
print(f"18 epochs x 80.4M targets at this rate: {18*80.4e6/(B/dt)/3600:.1f} h compute",
      flush=True)
