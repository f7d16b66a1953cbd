#!/usr/bin/env python
"""Bisect the guided-beam serving cost at FT0 scale (round 3).

The round-3 soak measured beam-k10 over the 42,919-noun guide trie at ~1.28 s
warm per 512-image batch, vs ~70 ms for unguided beam at the same batch — the
guide machinery is ~15x the rest of the decode. This harness times the full
guided beam and its per-step guide components in isolation on the chip, so
the optimization (if any) targets the measured cost, not the assumed one.

Components per step (models/generate.py):
  1. guide_mask candidate gather: (B,K,W) bool gathered by cand (B,K)
  2. guide_idx = where(mask, V, gcol): (B,K,W) int32 materialization
  3. _scatter_allowed: scatter-max of (B,K,W) indices into (B,K,V+1) f32
  4. guide_mask update: gather + (tok != gcol) comparison

Usage: python exp/guided_beam_bisect.py  (runs on the default device)
Env: W (default 42919), B (512), K (10), G (8: FT0 auto token length).
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from novic_tpu.models import DecoderModelConfig, PrefixedIterDecoder
from novic_tpu.models.generate import generate_beam

W = int(os.environ.get("W", 42919))
B = int(os.environ.get("B", 512))
K = int(os.environ.get("K", 10))
G = int(os.environ.get("G", 8))
V = int(os.environ.get("V", 8002))
ITERS = int(os.environ.get("ITERS", 3))

CFG = DecoderModelConfig(
    embed_dim=768, vocab_size=V, token_length=G, hidden_dim=512,
    feedfwd_scale="1/4", mlp_seq_len=4, num_layers=6, num_heads=8,
    compute_dtype="bfloat16",
)


def make_guides(rng: np.random.Generator) -> np.ndarray:
    """Random FT0-shaped guide targets: lengths 2..G-1 content tokens + end."""
    C = G  # guide rows are (W, C) with trailing zeros
    lengths = rng.integers(1, C - 1, size=W)
    toks = rng.integers(1, V, size=(W, C), dtype=np.int32)
    pos = np.arange(C)[None, :]
    return np.where(pos < lengths[:, None], toks, 0).astype(np.int32)


def timed(label, fn, *args):
    out = fn(*args)
    jax.tree_util.tree_map(np.asarray, out)  # materialize (axon: block_until_ready lies)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
        jax.tree_util.tree_map(np.asarray, out)
    dt = (time.perf_counter() - t0) / ITERS * 1000
    print(f"{label:55s} {dt:9.1f} ms")
    return dt


def main():
    rng = np.random.default_rng(0)
    guides = make_guides(rng)
    model = PrefixedIterDecoder(cfg=CFG)
    embed = np.asarray(rng.standard_normal((B, 768)), np.float32)
    embed /= np.linalg.norm(embed, axis=1, keepdims=True)
    params = jax.jit(model.init)({"params": jax.random.PRNGKey(0)},
                                 jnp.zeros((1, 768), jnp.float32),
                                 jnp.zeros((1, G), jnp.int32))["params"]
    embed_d = jax.device_put(embed)
    guides_d = jax.device_put(guides)

    print(f"W={W} B={B} K={K} G={G} V={V}  ((B,K,W) bool = "
          f"{B * K * W / 1e6:.0f} MB, int32 = {B * K * W * 4 / 1e6:.0f} MB)")

    # Full beams ----------------------------------------------------------
    from novic_tpu.models.guide_trie import build_guide_trie, trie_num_nodes

    t0 = time.perf_counter()
    trie = build_guide_trie(guides, V, G - 1)
    t_build = time.perf_counter() - t0
    print(f"trie build (host): {t_build * 1000:.0f} ms, "
          f"{trie_num_nodes(trie) / 1e6:.2f}M table entries, depth widths "
          f"{[t.shape for t in trie['child_tok']]}")
    trie_d = jax.device_put(trie)

    f_plain = jax.jit(lambda p, e: generate_beam(model, p, e, topk=K))
    f_guided = jax.jit(lambda p, e, g: generate_beam(model, p, e, topk=K, guide_targets=g))
    f_trie = jax.jit(lambda p, e, g, t: generate_beam(model, p, e, topk=K, guide_targets=g,
                                                      guide_trie=t))
    f_renorm = jax.jit(lambda p, e, g: generate_beam(model, p, e, topk=K, guide_targets=g,
                                                     guide_renorm=True))
    f_trie_renorm = jax.jit(lambda p, e, g, t: generate_beam(
        model, p, e, topk=K, guide_targets=g, guide_trie=t, guide_renorm=True))
    t_plain = timed("beam unguided (full)", f_plain, params, embed_d)
    t_trie = timed("beam guided TRIE (full)", f_trie, params, embed_d, guides_d, trie_d)
    timed("beam guided renorm TRIE (full)", f_trie_renorm, params, embed_d, guides_d, trie_d)
    print(f"trie guide overhead vs unguided: {t_trie - t_plain:.1f} ms")
    if os.environ.get("SKIP_MASK", ""):
        return
    t_guided = timed("beam guided plain MASK (full)", f_guided, params, embed_d, guides_d)
    t_renorm = timed("beam guided renorm MASK (full)", f_renorm, params, embed_d, guides_d)

    # Per-step components in isolation (x G-1 steps for scale) ------------
    steps = G - 1
    mask0 = jnp.zeros((B, K, W), dtype=bool)
    cand0 = jnp.tile(jnp.arange(K, dtype=jnp.int32)[None, :], (B, 1))
    tok0 = jnp.ones((B, K), dtype=jnp.int32)

    @jax.jit
    def comp_gather(mask, cand):
        # candidate gather of the big mask, `steps` times (varied to defeat CSE)
        def body(i, m):
            c = (cand + i) % K
            b = jnp.arange(B)[:, None]
            return m[b, c]
        return jax.lax.fori_loop(0, steps, body, mask)

    @jax.jit
    def comp_idx_scatter(mask, g):
        # where(mask,V,gcol) + scatter-max into (B,K,V+1), `steps` times
        def body(i, acc):
            gcol = jax.lax.dynamic_index_in_dim(g, i % (G - 1), axis=1, keepdims=False)
            idx = jnp.where(mask, V, jnp.broadcast_to(gcol[None, None, :], (B, K, W)))
            base = jnp.full((B, K, V + 1), -1e30, dtype=jnp.float32)
            b = jnp.arange(B)[:, None, None]
            h = jnp.arange(K)[None, :, None]
            allowed = base.at[b, h, idx].max(0.0)[:, :, :V]
            return acc + allowed.sum()
        return jax.lax.fori_loop(0, steps, body, jnp.float32(0))

    @jax.jit
    def comp_mask_update(mask, g, tok):
        # mask |= (tok != gcol), `steps` times
        def body(i, m):
            gcol = jax.lax.dynamic_index_in_dim(g, i % (G - 1), axis=1, keepdims=False)
            return m | jnp.not_equal(((tok + i) % V)[:, :, None], gcol[None, None, :])
        return jax.lax.fori_loop(0, steps, body, mask)

    timed(f"guide_mask cand gather x{steps}", comp_gather, mask0, cand0)
    timed(f"guide idx+scatter_allowed x{steps}", comp_idx_scatter, mask0, guides_d)
    timed(f"guide_mask update x{steps}", comp_mask_update, mask0, guides_d, tok0)

    print(f"\nguide overhead (guided-plain minus unguided): {t_guided - t_plain:.1f} ms"
          f" ({(t_guided - t_plain) / B * 1000:.2f} us/img)")


if __name__ == "__main__":
    main()
