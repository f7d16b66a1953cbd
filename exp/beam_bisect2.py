"""Beam cost bisection, round 2 — against the CURRENT generate.py.

Timing-only ablations (each removes one component; results are wrong, times
are informative): no KV reorder, no top_k, no log_softmax, no decode step
(constant logits -> isolates everything else), decode step only.

B=256 K=10 flagship decoder shapes; axon hygiene (fori_loop INNER, checksum).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

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

src = open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "novic_tpu/models/generate.py")).read()

REORDER = ("        k = [reorder(kc) for kc in k]\n"
           "        v = [reorder(vc) for vc in v]\n")
TOPK = "            new_score, top_idx = jax.lax.top_k(flat, H)"
SOFTMAX = "        scores = jax.nn.log_softmax(logits, axis=2)"
STEP = ("        logits_next, k, v = bound.decode_step_split(tok.reshape(-1), "
        "step, pk, pv, k, v)")

for piece in (REORDER, TOPK, SOFTMAX, STEP):
    assert piece in src, piece[:60]

VARIANTS = {
    "full beam": src,
    "no KV reorder": src.replace(REORDER, ""),
    "no top_k": src.replace(
        TOPK,
        "            new_score = flat[:, :H]\n"
        "            top_idx = jnp.broadcast_to(jnp.arange(H)[None, :], (B, H)).astype(jnp.int32)"),
    "no log_softmax": src.replace(SOFTMAX, "        scores = logits"),
    "no decode step": src.replace(
        STEP,
        "        logits_next = logits_raw.reshape(B * H, V) * jnp.float32(0.999)"),
    "no reorder+step": src.replace(REORDER, "").replace(
        STEP,
        "        logits_next = logits_raw.reshape(B * H, V) * jnp.float32(0.999)"),
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
    print(f"{name:24s} {dt * 1000:8.2f} ms/batch", flush=True)
