#!/usr/bin/env python
"""Bisect the exhaustive 'all' scoring cost at FT0 scale (round 3).

The round-3 soak measured generate_all (teacher-forced scoring of every
guide target, ref embedding_decoder.py:986-1079) at ~236 s warm per
512-image batch over the 42,919-noun FT0 vocabulary — 3,904 chunk steps at
~60 ms. The roofline says each chunk step is ~1.25 TFLOP of well-shaped
matmuls (~15-20 ms at realistic MXU rates), so ~2/3 of the time is
structure, not compute. This harness measures where it goes:

  1. the current generate_all scan slice (per-chunk cost at the production
     chunk size, derived full-W time)
  2. model.apply forward in isolation at several chunk sizes (does the cost
     amortize with bigger chunks once the f32 logits tensor is avoided?)
  3. the transformer body alone vs the logits matmul alone vs the
     lse+gather scoring math alone
  4. a streamed-scoring variant: forward to hidden states, then a Python
     position loop computing [logit@target - logsumexp] one position at a
     time (peak memory (rows, V) instead of (rows, C, V)) at chunk sizes
     the materializing path cannot reach

Usage: python exp/all_bisect.py
Env: W (42919), B (512), V (8002), TL (9: token_length, FT0 auto G=8),
     ITERS (3).
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from novic_tpu.models import DecoderModelConfig, PrefixedIterDecoder
from novic_tpu.models.generate import generate_all, precompute_generate_all

W = int(os.environ.get("W", 42919))
B = int(os.environ.get("B", 512))
V = int(os.environ.get("V", 8002))
TL = int(os.environ.get("TL", 9))
ITERS = int(os.environ.get("ITERS", 3))

CFG = DecoderModelConfig(
    embed_dim=768, vocab_size=V, token_length=TL, hidden_dim=512,
    feedfwd_scale="1/4", mlp_seq_len=4, num_layers=6, num_heads=8,
    compute_dtype="bfloat16",
)


def make_guides(rng: np.random.Generator) -> np.ndarray:
    """Random FT0-shaped guide targets: 1..TL-1 content tokens + end."""
    C = TL
    lengths = rng.integers(1, C, size=W)
    toks = rng.integers(1, V, size=(W, C), dtype=np.int32)
    pos = np.arange(C)[None, :]
    return np.where(pos < lengths[:, None], toks, 0).astype(np.int32)


def timed(label, fn, *args, iters=ITERS):
    out = fn(*args)
    jax.tree_util.tree_map(np.asarray, out)  # materialize (axon: block_until_ready lies)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        jax.tree_util.tree_map(np.asarray, out)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{label:62s} {dt:9.1f} ms")
    return dt


def main():
    rng = np.random.default_rng(0)
    guides = make_guides(rng)
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
    gt, gp = pre.guide_targets, pre.guide_paddings
    C = gt.shape[1]
    print(f"W={W} B={B} V={V} token_length={TL} -> trimmed C={C}, "
          f"seq S={CFG.mlp_seq_len + C - 1}")

    # 1. Current production path on a W subset (sized for ~1 scan slice) ----
    budget_elems = 384_000_000
    chunk_now = max(min(budget_elems // max(B * C * V, 1), 128), 8)
    w_sub = chunk_now * 64  # 64 chunk steps; scale up to full W
    t_cur = timed(f"generate_all current (W={w_sub}, chunk={chunk_now})",
                  lambda: generate_all(model, params, embed_d, topk=10,
                                       guide_targets=guides[:w_sub]), iters=max(ITERS // 2, 1))
    full = t_cur * (W / w_sub)
    print(f"  -> derived full-W time: {full / 1000:.1f} s "
          f"({-(-W // chunk_now)} chunk steps at {t_cur / 64:.1f} ms)")

    # 2. Isolated forward at several chunk sizes ---------------------------
    def fwd(p, emb_b, g_tok):
        ch = g_tok.shape[0]
        tgt = jnp.repeat(g_tok, B, axis=0)
        emb = jnp.tile(emb_b, (ch, 1))
        logits, _, _, _, _ = model.apply(
            {"params": p}, emb, tgt, None, None, calc_loss=False, calc_correct=False,
            only_pred=False, guide_targets=None, multi_first=False, deterministic=True)
        at = jnp.take_along_axis(logits, tgt[:, :, None], axis=2)[:, :, 0]
        sc = at - jax.scipy.special.logsumexp(logits, axis=2)
        return sc.reshape(ch, B, C).sum(axis=2)

    fwd_j = jax.jit(fwd)
    for ch in (chunk_now, 2 * chunk_now, 4 * chunk_now):
        logits_gb = ch * B * C * V * 4 / 1e9
        if logits_gb > 8:
            print(f"  (chunk={ch}: logits {logits_gb:.1f} GB f32 — skipped, would OOM)")
            continue
        gt_d = jax.device_put(gt[:ch])
        t = timed(f"score_chunk isolated (chunk={ch}, logits {logits_gb:.1f} GB)",
                  fwd_j, params, embed_d, gt_d)
        print(f"  -> per-target-row: {t / ch * 1000:.1f} us, full-W extrapolation "
              f"{t * W / ch / 1000:.1f} s")

    # 3. Component ablations at the production chunk -----------------------
    ch = chunk_now
    rows = ch * B
    gt_d = jax.device_put(gt[:ch])
    bound = model.bind({"params": params})

    def hidden_only(p, emb_b, g_tok):
        """Forward to final hidden states, NO logits matmul."""
        tgt = jnp.repeat(g_tok, B, axis=0)
        emb = jnp.tile(emb_b, (ch, 1))
        m = model.bind({"params": p})
        x = m.embed_mlp(emb)
        tok = m.embed_tokens(tgt[:, :-1])
        x = jnp.concatenate([x, tok], axis=1)
        S = x.shape[1]
        x = x + m.pos_embedding[:S, :]
        x = m.transformer(x, m.causality_bias[:S, :S], deterministic=True)
        return x[:, CFG.mlp_seq_len - 1:, :].sum()

    timed(f"  body only (no logits), chunk={ch}", jax.jit(hidden_only), params, embed_d, gt_d)

    h_s = jax.device_put(np.asarray(
        rng.standard_normal((rows, C, 512)), np.float32))
    lw = params["logits_weight"]

    def logits_only(h, w):
        out = jax.lax.dot_general(h, w, (((2,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        return out.sum()

    timed(f"  logits matmul only (rows={rows}, C={C}, V)", jax.jit(logits_only), h_s, lw)

    def logits_score(h, w, tgt):
        logits = jax.lax.dot_general(h, w, (((2,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)[..., :V]
        at = jnp.take_along_axis(logits, tgt[:, :, None], axis=2)[:, :, 0]
        return (at - jax.scipy.special.logsumexp(logits, axis=2)).sum()

    tgt_rows = jax.device_put(np.repeat(gt[:ch], B, axis=0))
    timed(f"  logits+lse+gather (materialized)", jax.jit(logits_score), h_s, lw, tgt_rows)

    def logits_score_streamed(h, w, tgt):
        """Position loop: peak (rows, V) instead of (rows, C, V)."""
        acc = jnp.zeros((h.shape[0],), jnp.float32)
        for c in range(C):
            logit_c = jax.lax.dot_general(h[:, c, :], w, (((1,), (1,)), ((), ())),
                                          preferred_element_type=jnp.float32)[:, :V]
            at = jnp.take_along_axis(logit_c, tgt[:, c][:, None], axis=1)[:, 0]
            acc = acc + at - jax.scipy.special.logsumexp(logit_c, axis=1)
        return acc.sum()

    timed(f"  logits+lse+gather (streamed per position)", jax.jit(logits_score_streamed),
          h_s, lw, tgt_rows)

    # 4. Streamed end-to-end scoring at big chunks -------------------------
    def fwd_streamed(p, emb_b, g_tok):
        ch2 = g_tok.shape[0]
        tgt = jnp.repeat(g_tok, B, axis=0)
        emb = jnp.tile(emb_b, (ch2, 1))
        m = model.bind({"params": p})
        x = m.embed_mlp(emb)
        tok = m.embed_tokens(tgt[:, :-1])
        x = jnp.concatenate([x, tok], axis=1)
        S = x.shape[1]
        x = x + m.pos_embedding[:S, :]
        x = m.transformer(x, m.causality_bias[:S, :S], deterministic=True)
        h = x[:, CFG.mlp_seq_len - 1:, :]
        w = p["logits_weight"]
        acc = jnp.zeros((h.shape[0],), jnp.float32)
        for c in range(C):
            logit_c = jax.lax.dot_general(h[:, c, :], w, (((1,), (1,)), ((), ())),
                                          preferred_element_type=jnp.float32)[:, :V]
            at = jnp.take_along_axis(logit_c, tgt[:, c][:, None], axis=1)[:, 0]
            acc = acc + at - jax.scipy.special.logsumexp(logit_c, axis=1)
        return acc.reshape(ch2, B)

    fwd_st = jax.jit(fwd_streamed)
    for ch2 in (chunk_now, 4 * chunk_now, 8 * chunk_now):
        h_gb = ch2 * B * (CFG.mlp_seq_len + C - 1) * 512 * 4 / 1e9
        if h_gb > 10:
            print(f"  (chunk={ch2}: hidden {h_gb:.1f} GB — skipped)")
            continue
        gt_d2 = jax.device_put(gt[:ch2])
        t = timed(f"streamed e2e score (chunk={ch2})", fwd_st, params, embed_d, gt_d2)
        print(f"  -> full-W extrapolation {t * W / ch2 / 1000:.1f} s")


if __name__ == "__main__":
    main()
