#!/usr/bin/env python
"""Round 3 of the 'all'-scoring bisection: marginal per-step costs.

Rounds 1-2 established (a) every isolated jit call over the axon tunnel pays
a ~28 ms roundtrip, so only IN-LOOP marginal times are trustworthy, and
(b) the reconstructed component costs (~25-30 ms) do not explain the
118 ms/chunk-step measured inside the production lax.scan. This round times
everything as fori_loop marginals (t(N2) - t(N1)) / (N2 - N1), comparing:

  1. the exact production score_chunk body
  2. model.apply alone (no scoring math)
  3. manual reconstruction: embed_mlp + concat + transformer (no logits)
  4. transformer alone on a premade (rows, S, E) input
  5. scoring math alone on premade hidden states

Usage: PYTHONPATH=.:/root/.axon_site python exp/all_bisect3.py
Env: CHUNK (10), B (512), V (8002), TL (9), N1 (2), N2 (10)
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from novic_tpu.models import DecoderModelConfig, PrefixedIterDecoder

CHUNK = int(os.environ.get("CHUNK", 10))
B = int(os.environ.get("B", 512))
V = int(os.environ.get("V", 8002))
TL = int(os.environ.get("TL", 9))
N1 = int(os.environ.get("N1", 2))
N2 = int(os.environ.get("N2", 10))

CFG = DecoderModelConfig(
    embed_dim=768, vocab_size=V, token_length=TL, hidden_dim=512,
    feedfwd_scale="1/4", mlp_seq_len=4, num_layers=6, num_heads=8,
    compute_dtype="bfloat16",
)
C = TL
ROWS = CHUNK * B


def marginal(label, loop_fn, *args):
    """loop_fn(n, *args) jitted with static n; marginal ms per iteration."""
    f1 = jax.jit(lambda *a: loop_fn(N1, *a))
    f2 = jax.jit(lambda *a: loop_fn(N2, *a))
    np.asarray(f1(*args)), np.asarray(f2(*args))  # compile both
    ts = []
    for f in (f1, f2):
        t0 = time.perf_counter()
        for _ in range(3):
            np.asarray(f(*args))
        ts.append((time.perf_counter() - t0) / 3)
    dt = (ts[1] - ts[0]) / (N2 - N1) * 1000
    print(f"{label:58s} {dt:9.2f} ms/iter   (t{N1}={ts[0]*1e3:.0f} t{N2}={ts[1]*1e3:.0f})")
    return dt


def main():
    rng = np.random.default_rng(0)
    model = PrefixedIterDecoder(cfg=CFG)
    embed = np.asarray(rng.standard_normal((B, 768)), np.float32)
    embed /= np.linalg.norm(embed, axis=1, keepdims=True)
    params = jax.jit(model.init)({"params": jax.random.PRNGKey(0)},
                                 jnp.zeros((1, 768), jnp.float32),
                                 jnp.zeros((1, TL), jnp.int32))["params"]
    embed_d = jax.device_put(embed)
    lengths = rng.integers(1, C, size=CHUNK)
    toks = rng.integers(1, V, size=(CHUNK, C), dtype=np.int32)
    gt = np.where(np.arange(C)[None, :] < lengths[:, None], toks, 0).astype(np.int32)
    gt_d = jax.device_put(gt)
    print(f"CHUNK={CHUNK} B={B} ROWS={ROWS} C={C} S={CFG.mlp_seq_len + C - 1} V={V}")

    def score_chunk_once(p, emb_b, g_tok, i):
        tgt = jnp.repeat(g_tok, B, axis=0)
        emb = jnp.tile(emb_b, (CHUNK, 1)) + i * 1e-9
        logits, _, _, _, _ = model.apply(
            {"params": p}, emb, tgt, None, None, calc_loss=False, calc_correct=False,
            only_pred=False, guide_targets=None, multi_first=False, deterministic=True)
        at = jnp.take_along_axis(logits, tgt[:, :, None], axis=2)[:, :, 0]
        sc = at - jax.scipy.special.logsumexp(logits, axis=2)
        return sc.reshape(CHUNK, B, C).sum(axis=2).sum()

    def loop_score(n, p, emb_b, g_tok):
        return jax.lax.fori_loop(
            0, n, lambda i, acc: acc + score_chunk_once(p, emb_b, g_tok, i), jnp.float32(0))

    marginal("production score_chunk", loop_score, params, embed_d, gt_d)

    def apply_once(p, emb_b, g_tok, i):
        tgt = jnp.repeat(g_tok, B, axis=0)
        emb = jnp.tile(emb_b, (CHUNK, 1)) + i * 1e-9
        logits, _, _, _, _ = model.apply(
            {"params": p}, emb, tgt, None, None, calc_loss=False, calc_correct=False,
            only_pred=False, guide_targets=None, multi_first=False, deterministic=True)
        return logits.sum()

    def loop_apply(n, p, emb_b, g_tok):
        return jax.lax.fori_loop(
            0, n, lambda i, acc: acc + apply_once(p, emb_b, g_tok, i), jnp.float32(0))

    marginal("model.apply only (logits summed)", loop_apply, params, embed_d, gt_d)

    def body_once(p, emb_b, g_tok, i):
        m = model.bind({"params": p})
        tgt = jnp.repeat(g_tok, B, axis=0)
        emb = jnp.tile(emb_b, (CHUNK, 1)) + i * 1e-9
        x = m.embed_mlp(emb)
        tok = m.embed_tokens(tgt[:, :-1])
        x = jnp.concatenate([x, tok], axis=1)
        S = x.shape[1]
        x = x + m.pos_embedding[:S, :]
        x = m.transformer(x, m.causality_bias[:S, :S], deterministic=True)
        return x[:, CFG.mlp_seq_len - 1:, :].sum()

    def loop_body(n, p, emb_b, g_tok):
        return jax.lax.fori_loop(
            0, n, lambda i, acc: acc + body_once(p, emb_b, g_tok, i), jnp.float32(0))

    marginal("body (embed_mlp+transformer, no logits)", loop_body, params, embed_d, gt_d)

    S = CFG.mlp_seq_len + C - 1
    x0 = jax.device_put(np.asarray(rng.standard_normal((ROWS, S, 512)), np.float32))

    def loop_tfrm(n, p, x):
        m = model.bind({"params": p})
        def one(i, acc):
            return acc + m.transformer(x + i * 1e-9, m.causality_bias[:S, :S],
                                       deterministic=True).sum()
        return jax.lax.fori_loop(0, n, one, jnp.float32(0))

    marginal("transformer alone (premade input)", loop_tfrm, params, x0)

    h0 = jax.device_put(np.asarray(rng.standard_normal((ROWS, C, 512)), np.float32))
    tgt_rows = jax.device_put(np.repeat(gt, B, axis=0))

    def loop_logits(n, p, h, t):
        w = p["logits_weight"]
        def one(i, acc):
            lg = jax.lax.dot_general(h + i * 1e-9, w, (((2,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)[..., :V]
            at = jnp.take_along_axis(lg, t[:, :, None], axis=2)[:, :, 0]
            return acc + (at - jax.scipy.special.logsumexp(lg, axis=2)).sum()
        return jax.lax.fori_loop(0, n, one, jnp.float32(0))

    marginal("logits+lse+gather (premade hidden)", loop_logits, params, h0, tgt_rows)

    def loop_prep(n, emb_b, g_tok):
        def one(i, acc):
            tgt = jnp.repeat(g_tok, B, axis=0)
            emb = jnp.tile(emb_b, (CHUNK, 1)) + i * 1e-9
            return acc + emb.sum() + tgt.sum().astype(jnp.float32)
        return jax.lax.fori_loop(0, n, one, jnp.float32(0))

    marginal("repeat/tile prep alone", loop_prep, embed_d, gt_d)


if __name__ == "__main__":
    main()
