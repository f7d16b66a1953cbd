"""Beam cost bisection: full vs no-cache-gather vs no-topk (timing-only hacks)."""
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

import novic_tpu.models.generate as gen
from novic_tpu.models import DecoderModelConfig, PrefixedIterDecoder

BATCH, K, INNER, ITERS = 256, 10, 10, 3

dcfg = DecoderModelConfig(embed_dim=768, vocab_size=4096, token_length=12,
                          hidden_dim=512, feedfwd_scale="1/4", mlp_seq_len=4,
                          num_layers=6, num_heads=8, compute_dtype="bfloat16")
decoder = PrefixedIterDecoder(cfg=dcfg)
kd, ke = jax.random.split(jax.random.PRNGKey(0))
d_params = jax.jit(decoder.init)({"params": kd}, jnp.zeros((1, 768), jnp.float32),
                                 jnp.zeros((1, 12), jnp.int32))["params"]
emb = jax.random.normal(ke, (BATCH, 768))
emb = jax.block_until_ready(emb / jnp.linalg.norm(emb, axis=-1, keepdims=True))

src = open("novic_tpu/models/generate.py").read()

VARIANTS = {
    "full beam": src,
    "no cache gather": src.replace(
        "        k = [kc[flat_cand] for kc in k]\n"
        "        v = [vc[flat_cand] for vc in v]\n", ""),
    "no topk (fixed cand)": src.replace(
        "            new_score, top_idx = jax.lax.top_k(flat, H)",
        "            new_score = flat[:, :H]\n"
        "            top_idx = jnp.broadcast_to(jnp.arange(H)[None, :], (B, H)).astype(jnp.int32)"),
    "no gather anywhere": src.replace(
        "        k = [kc[flat_cand] for kc in k]\n"
        "        v = [vc[flat_cand] for vc in v]\n", "").replace(
        "    def gather_h(x, cand):\n"
        '        """Gather along the candidate (H) axis: x (B,H,...) by cand (B,H)."""\n'
        "        b = jnp.arange(B)[:, None]\n"
        "        return x[b, cand]",
        "    def gather_h(x, cand):\n"
        "        return x"),
}

for name, code in VARIANTS.items():
    ns = {}
    exec(compile(code, f"gen_{name}", "exec"), ns)
    beam = ns["generate_beam"]

    @jax.jit
    def looped(dp, e):
        def body(i, acc):
            t, p, s = beam(decoder, dp, e + i * 1e-6, topk=K)
            return acc + (t.sum() + p.sum()).astype(jnp.float32)
        return jax.lax.fori_loop(0, INNER, body, jnp.float32(0))

    _ = np.asarray(looped(d_params, emb))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        _ = np.asarray(looped(d_params, emb))
    dt = (time.perf_counter() - t0) / (ITERS * INNER)
    print(f"{name:24s} {dt*1000:8.2f} ms/batch", flush=True)
