"""Beam cost bisection (ROUND-1 ARCHIVE — string-patches target the round-1
generate.py and no longer apply; use exp/beam_bisect2.py, which bisects the
current source). Kept for the measurement history in BENCH_NOTES."""
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

psrc = open("novic_tpu/models/prefixed_iter.py").read()
ONEHOT_EMBED = psrc.replace(
    """    def embed_tokens(self, token_ids: jnp.ndarray) -> jnp.ndarray:
        table = self.logits_weight if self.token_embedding is None else self.token_embedding
        return jnp.take(table, token_ids, axis=0)""",
    """    def embed_tokens(self, token_ids: jnp.ndarray) -> jnp.ndarray:
        table = self.logits_weight if self.token_embedding is None else self.token_embedding
        oh = jax.nn.one_hot(token_ids, table.shape[0], dtype=jnp.bfloat16)
        return jax.lax.dot_general(oh, table.astype(jnp.bfloat16),
                                   (((oh.ndim - 1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)""")

VARIANTS = {
    "full beam": src,
    "one-hot embed_tokens": ("PATCH_EMBED", src),
    "no cache gather": src.replace(
        "        k = [kc[flat_cand] for kc in k]\n"
        "        v = [vc[flat_cand] for vc in v]\n", ""),
    "no topk (fixed cand)": src.replace(
        "            new_score, top_idx = jax.lax.top_k(flat, H)",
        "            new_score = flat[:, :H]\n"
        "            top_idx = jnp.broadcast_to(jnp.arange(H)[None, :], (B, H)).astype(jnp.int32)"),
    "approx_max_k recall 1.0": src.replace(
        "            new_score, top_idx = jax.lax.top_k(flat, H)",
        "            new_score, top_idx = jax.lax.approx_max_k(flat, H, recall_target=1.0)\n"
        "            top_idx = top_idx.astype(jnp.int32)"),
    "approx_max_k recall .99": src.replace(
        "            new_score, top_idx = jax.lax.top_k(flat, H)",
        "            new_score, top_idx = jax.lax.approx_max_k(flat, H, recall_target=0.99)\n"
        "            top_idx = top_idx.astype(jnp.int32)"),
    "iterative exact topk": src.replace(
        "            new_score, top_idx = jax.lax.top_k(flat, H)",
        """            vals, idxs = [], []
            cur = flat
            for _h in range(H):
                _i = jnp.argmax(cur, axis=1)
                vals.append(jnp.take_along_axis(cur, _i[:, None], axis=1)[:, 0])
                idxs.append(_i.astype(jnp.int32))
                cur = cur.at[jnp.arange(cur.shape[0]), _i].set(NEG_INF)
            new_score = jnp.stack(vals, axis=1)
            top_idx = jnp.stack(idxs, axis=1)"""),
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

import novic_tpu.models.prefixed_iter as pi_mod

for name, code in VARIANTS.items():
    dec = decoder
    if isinstance(code, tuple):
        ns_p = {}
        exec(compile(ONEHOT_EMBED, "pi_onehot", "exec"), ns_p)
        dec = ns_p["PrefixedIterDecoder"](cfg=dcfg)
        code = code[1]
    ns = {}
    exec(compile(code, f"gen_{name}", "exec"), ns)
    beam = ns["generate_beam"]
    decoder_local = dec

    @jax.jit
    def looped(dp, e):
        def body(i, acc):
            t, p, s = beam(decoder_local, dp, e + i * 1e-6, topk=K)
            return acc + (t.sum() + p.sum()).astype(jnp.float32)
        return jax.lax.fori_loop(0, INNER, body, jnp.float32(0))

    _ = np.asarray(looped(d_params, emb))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        _ = np.asarray(looped(d_params, emb))
    dt = (time.perf_counter() - t0) / (ITERS * INNER)
    print(f"{name:24s} {dt*1000:8.2f} ms/batch", flush=True)
