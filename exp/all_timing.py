#!/usr/bin/env python
"""Time the production generate_all at FT0 scale on chip (round 3).

Baseline (round-3 soak, pre-redesign): 236 s warm per 512-image batch over
the 42,919-noun vocabulary (50.5 ms per 10-target chunk, measured
exp/all_bisect3.py). This times the redesigned path (prefix-cached extend,
shared position-0 scoring, length buckets, streamed per-position lse).

Usage: PYTHONPATH=.:/root/.axon_site python exp/all_timing.py
Env: W (42919), B (512), V (8002), TL (9), ITERS (2)
"""

import os
import time

import jax
import numpy as np
import jax.numpy as jnp

from novic_tpu.models import DecoderModelConfig, PrefixedIterDecoder
from novic_tpu.models.generate import generate_all, precompute_generate_all

W = int(os.environ.get("W", 42919))
B = int(os.environ.get("B", 512))
V = int(os.environ.get("V", 8002))
TL = int(os.environ.get("TL", 9))
ITERS = int(os.environ.get("ITERS", 2))

CFG = DecoderModelConfig(
    embed_dim=768, vocab_size=V, token_length=TL, hidden_dim=512,
    feedfwd_scale="1/4", mlp_seq_len=4, num_layers=6, num_heads=8,
    compute_dtype="bfloat16",
)


def main():
    rng = np.random.default_rng(0)
    lengths = rng.integers(1, TL, size=W)
    toks = rng.integers(1, V, size=(W, TL), dtype=np.int32)
    guides = np.where(np.arange(TL)[None, :] < lengths[:, None], toks, 0).astype(np.int32)
    model = PrefixedIterDecoder(cfg=CFG)
    embed = np.asarray(rng.standard_normal((B, 768)), np.float32)
    embed /= np.linalg.norm(embed, axis=1, keepdims=True)
    params = jax.jit(model.init)({"params": jax.random.PRNGKey(0)},
                                 jnp.zeros((1, 768), jnp.float32),
                                 jnp.zeros((1, TL), jnp.int32))["params"]
    embed_d = jax.device_put(embed)

    pre = precompute_generate_all(
        CFG.vocab_size, length_alpha=0.0, vocab_targets=None, vocab_per_token=False,
        vocab_scaler=0.0, guide_targets=guides, guide_renorm=False)
    print(f"W={W} B={B} V={V} TL={TL} C={pre.guide_targets.shape[1]} "
          f"avg length={(pre.guide_targets.shape[1] - pre.guide_paddings.sum(1)).mean():.2f}")

    t0 = time.perf_counter()
    out = generate_all(model, params, embed_d, topk=10, guide_targets=guides, precompute=pre)
    jax.tree_util.tree_map(np.asarray, out)
    cold = time.perf_counter() - t0
    print(f"cold (incl. compiles): {cold:.1f} s")
    for i in range(ITERS):
        t0 = time.perf_counter()
        out = generate_all(model, params, embed_d, topk=10, guide_targets=guides, precompute=pre)
        jax.tree_util.tree_map(np.asarray, out)
        warm = time.perf_counter() - t0
        print(f"warm: {warm:.1f} s  ({B / warm:.1f} img/s exhaustive-'all' over {W} targets)")


if __name__ == "__main__":
    main()
