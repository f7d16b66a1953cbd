#!/usr/bin/env python
"""Round 4 of the 'all'-scoring bisection: integrated transformer variants.

Round 3 pinned the per-chunk cost: transformer 45.6 ms of the 50.5 ms step,
while its components in isolation (matmuls+LN+FF ~7 ms, attention chain
~11-18 ms) only explain ~25 ms — the rest is XLA integration (the
(B,S,H,hd) head transposes between the qkv split, the attention einsums,
and out_proj). This round measures the REAL transformer with:

  1. production einsum attention (baseline)
  2. VPU broadcast-reduce attention (no bhqk layout, no 4D transposes)
  3. variant 2 with bf16 activations + params
  4. token-only sequences (S = C-1 = 8, extend-path proxy: how much does
     dropping the 4 recomputed prefix positions save?)

All as fori_loop marginals (per round-3 finding: isolated calls carry a
~28 ms axon roundtrip).

Usage: PYTHONPATH=.:/root/.axon_site python exp/all_bisect4.py
"""

import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from novic_tpu.models import DecoderModelConfig, PrefixedIterDecoder
from novic_tpu.models import layers as L

CHUNK = int(os.environ.get("CHUNK", 10))
B = int(os.environ.get("B", 512))
V = int(os.environ.get("V", 8002))
TL = int(os.environ.get("TL", 9))
N1, N2 = 2, 10

CFG = DecoderModelConfig(
    embed_dim=768, vocab_size=V, token_length=TL, hidden_dim=512,
    feedfwd_scale="1/4", mlp_seq_len=4, num_layers=6, num_heads=8,
    compute_dtype="bfloat16",
)
C = TL
ROWS = CHUNK * B
S = CFG.mlp_seq_len + C - 1


def marginal(label, loop_fn, *args):
    f1 = jax.jit(functools.partial(loop_fn, N1))
    f2 = jax.jit(functools.partial(loop_fn, N2))
    np.asarray(f1(*args)), np.asarray(f2(*args))
    ts = []
    for f in (f1, f2):
        t0 = time.perf_counter()
        for _ in range(3):
            np.asarray(f(*args))
        ts.append((time.perf_counter() - t0) / 3)
    dt = (ts[1] - ts[0]) / (N2 - N1) * 1000
    print(f"{label:58s} {dt:9.2f} ms/iter")
    return dt


def attend_vpu(self, q, k, v, attn_bias, deterministic):
    """Broadcast-reduce attention: scores (B,Sq,Sk,H), no head transposes."""
    cfg = self.cfg
    scale = 1.0 / np.sqrt(cfg.head_dim)
    sc = ((q * scale)[:, :, None, :, :] * k[:, None, :, :, :]).sum(axis=-1)  # (B,Sq,Sk,H)
    sc = sc + attn_bias[None, :, :, None]
    a = jax.nn.softmax(sc, axis=2)
    out = (a[:, :, :, :, None] * v[:, None, :, :, :]).sum(axis=2)  # (B,Sq,H,hd)
    Bq, Sq = out.shape[0], out.shape[1]
    return out.reshape(Bq, Sq, cfg.hidden_dim)


def main():
    rng = np.random.default_rng(0)
    model = PrefixedIterDecoder(cfg=CFG)
    params = jax.jit(model.init)({"params": jax.random.PRNGKey(0)},
                                 jnp.zeros((1, 768), jnp.float32),
                                 jnp.zeros((1, TL), jnp.int32))["params"]
    x0 = jax.device_put(np.asarray(rng.standard_normal((ROWS, S, 512)), np.float32))
    print(f"CHUNK={CHUNK} B={B} ROWS={ROWS} S={S}")

    def loop_tfrm(n, p, x):
        m = model.bind({"params": p})
        def one(i, acc):
            return acc + m.transformer(x + i * 1e-9, m.causality_bias[:S, :S],
                                       deterministic=True).sum()
        return jax.lax.fori_loop(0, n, one, jnp.float32(0))

    marginal("transformer S=12 (einsum attention, f32)", loop_tfrm, params, x0)

    orig = L.TransformerLayer._attend
    L.TransformerLayer._attend = attend_vpu
    try:
        marginal("transformer S=12 (VPU attention, f32)", loop_tfrm, params, x0)

        p_bf = jax.tree_util.tree_map(lambda w: w.astype(jnp.bfloat16), params)
        x_bf = x0.astype(jnp.bfloat16)

        def loop_bf(n, p, x):
            m = model.bind({"params": p})
            def one(i, acc):
                return acc + m.transformer(x + jnp.bfloat16(i * 1e-3),
                                           m.causality_bias[:S, :S],
                                           deterministic=True).sum().astype(jnp.float32)
            return jax.lax.fori_loop(0, n, one, jnp.float32(0))

        marginal("transformer S=12 (VPU attention, bf16)", loop_bf, p_bf, x_bf)
    finally:
        L.TransformerLayer._attend = orig

    marginal("transformer S=12 (einsum attention, bf16)", loop_bf, p_bf, x_bf)

    S2 = C - 1
    x2 = jax.device_put(np.asarray(rng.standard_normal((ROWS, S2, 512)), np.float32))

    def loop_tfrm8(n, p, x):
        m = model.bind({"params": p})
        def one(i, acc):
            return acc + m.transformer(x + i * 1e-9, m.causality_bias[:S2, :S2],
                                       deterministic=True).sum()
        return jax.lax.fori_loop(0, n, one, jnp.float32(0))

    marginal(f"transformer S={S2} (einsum, f32; extend proxy)", loop_tfrm8, params, x2)

    L.TransformerLayer._attend = attend_vpu
    try:
        marginal(f"transformer S={S2} (VPU, f32; extend proxy)", loop_tfrm8, params, x2)
    finally:
        L.TransformerLayer._attend = orig


if __name__ == "__main__":
    main()
