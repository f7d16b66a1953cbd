"""TPU beam-search timing: split-prefix KV cache, B=256, K=10, amortized."""
import time

import numpy as np

import jax
import jax.numpy as jnp

from novic_tpu.models import DecoderModelConfig, PrefixedIterDecoder
from novic_tpu.models.generate import generate_beam

BATCH, INNER, ITERS, K = 256, 10, 3, 10

dcfg = DecoderModelConfig(embed_dim=768, vocab_size=4096, token_length=12,
                          hidden_dim=512, feedfwd_scale="1/4", mlp_seq_len=4,
                          num_layers=6, num_heads=8, compute_dtype="bfloat16")
decoder = PrefixedIterDecoder(cfg=dcfg)
kd, ke = jax.random.split(jax.random.PRNGKey(0))
d_params = jax.jit(decoder.init)({"params": kd}, jnp.zeros((1, 768), jnp.float32),
                                 jnp.zeros((1, 12), jnp.int32))["params"]
emb = jax.random.normal(ke, (BATCH, 768))
emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
emb = jax.block_until_ready(emb)


@jax.jit
def looped(dp, e):
    def body(i, acc):
        tgt, pad, sc = generate_beam(decoder, dp, e + i * 1e-6, topk=K)
        return acc + (tgt.sum() + pad.sum()).astype(jnp.float32)
    return jax.lax.fori_loop(0, INNER, body, jnp.float32(0))


_ = np.asarray(looped(d_params, emb))
t0 = time.perf_counter()
for _ in range(ITERS):
    _ = np.asarray(looped(d_params, emb))
dt = (time.perf_counter() - t0) / (ITERS * INNER)
print(f"beam k={K} split-cache: {dt*1000:.2f} ms/batch  {BATCH/dt:.1f} img/s", flush=True)
