#!/usr/bin/env python
"""Round 2 of the 'all'-scoring bisection: where does the teacher-forced BODY
(84 ms per chunk=10 step, ~10 TF/s) go at (rows=5120, S=12, E=512) shapes?

Measures, each in isolation on chip:
  1. raw GEMM rates at exactly the body's matmul shapes (floor check)
  2. the 6-layer transformer body with the attention chain removed
  3. the attention chain alone: production einsum vs a VPU broadcast-reduce
     formulation (no (B,S,H,hd)->(B,H,S,S) batched tiny matmuls)
  4. the logits matmul at f32 vs bf16 inputs, with fused lse

Usage: PYTHONPATH=.:$AXON python exp/all_bisect2.py
Env: ROWS (5120), S (12), V (8064), ITERS (5)
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

ROWS = int(os.environ.get("ROWS", 5120))
S = int(os.environ.get("S", 12))
E = 512
FF = 128
H, HD = 8, 64
V = int(os.environ.get("V", 8064))
ITERS = int(os.environ.get("ITERS", 5))
L = 6


def timed(label, fn, *args, iters=ITERS, flops=None):
    out = fn(*args)
    jax.tree_util.tree_map(np.asarray, out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        jax.tree_util.tree_map(np.asarray, out)
    dt = (time.perf_counter() - t0) / iters * 1000
    tfs = f"  {flops / dt / 1e9:7.1f} TF/s" if flops else ""
    print(f"{label:58s} {dt:9.2f} ms{tfs}")
    return dt


def main():
    rng = np.random.default_rng(0)
    x = jax.device_put(np.asarray(rng.standard_normal((ROWS, S, E)), np.float32))
    x_bf = x.astype(jnp.bfloat16)
    w_in = jax.device_put(np.asarray(rng.standard_normal((3 * E, E)) * 0.02, np.float32))
    w_out = jax.device_put(np.asarray(rng.standard_normal((E, E)) * 0.02, np.float32))
    w_ff1 = jax.device_put(np.asarray(rng.standard_normal((FF, E)) * 0.02, np.float32))
    w_ff2 = jax.device_put(np.asarray(rng.standard_normal((E, FF)) * 0.02, np.float32))
    w_log = jax.device_put(np.asarray(rng.standard_normal((V, E)) * 0.02, np.float32))
    tgt = jax.device_put(rng.integers(0, V, size=(ROWS, S)).astype(np.int32))

    def dot(a, b, prec=None):
        return jax.lax.dot_general(a, b, (((a.ndim - 1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32, precision=prec)

    # 1. Raw GEMMs ---------------------------------------------------------
    fl_in = 2 * ROWS * S * E * 3 * E
    timed("in_proj GEMM (rows*S,E)@(E,3E) f32 default", jax.jit(lambda a, b: dot(a, b).sum()),
          x, w_in, flops=fl_in)
    timed("in_proj GEMM bf16 inputs", jax.jit(lambda a, b: dot(a, b).sum()),
          x_bf, w_in.astype(jnp.bfloat16), flops=fl_in)
    timed("in_proj GEMM x6 (fori, varied)", jax.jit(
        lambda a, b: jax.lax.fori_loop(0, L, lambda i, acc: acc + dot(a + i, b).sum(),
                                       jnp.float32(0))), x, w_in, flops=fl_in * L)

    # 2. Body without attention -------------------------------------------
    def ln(h):
        mu = h.mean(axis=-1, keepdims=True)
        var = ((h - mu) ** 2).mean(axis=-1, keepdims=True)
        return (h - mu) * jax.lax.rsqrt(var + 1e-5)

    def body_noattn(h, wi, wo, w1, w2):
        for _ in range(L):
            a = dot(ln(h), wi)  # qkv proj (kept, output unused except v slice)
            vpart = a[..., 2 * E:]
            h = h + dot(vpart, wo)
            h = h + dot(jax.nn.gelu(dot(ln(h), w1)), w2)
        return h.sum()

    fl_body = L * 2 * ROWS * S * E * (3 * E + E + 2 * FF)
    timed("6-layer body, attention = v-passthrough", jax.jit(body_noattn),
          x, w_in, w_out, w_ff1, w_ff2, flops=fl_body)

    # 3. Attention chain alone (6 layers' worth) ---------------------------
    q = jax.device_put(np.asarray(rng.standard_normal((ROWS, S, H, HD)), np.float32))
    k = jax.device_put(np.asarray(rng.standard_normal((ROWS, S, H, HD)), np.float32))
    v = jax.device_put(np.asarray(rng.standard_normal((ROWS, S, H, HD)), np.float32))
    bias = jnp.where(jnp.arange(S)[None, :] <= jnp.arange(S)[:, None], 0.0, -1e30)

    def attn_einsum(q, k, v):
        def one(i, acc):
            sc = jnp.einsum("bqhd,bkhd->bhqk", q + i, k, preferred_element_type=jnp.float32)
            sc = sc + bias
            a = jax.nn.softmax(sc, axis=-1)
            o = jnp.einsum("bhqk,bkhd->bqhd", a, v, preferred_element_type=jnp.float32)
            return acc + o.sum()
        return jax.lax.fori_loop(0, L, one, jnp.float32(0))

    timed(f"attention chain x{L} (production einsum)", jax.jit(attn_einsum), q, k, v)

    def attn_vpu(q, k, v):
        def one(i, acc):
            # broadcast-reduce: no (B,H,S,S) batched matmul, no layout transpose
            sc = ((q + i)[:, :, None, :, :] * k[:, None, :, :, :]).sum(axis=-1)  # (B,Sq,Sk,H)
            sc = sc + bias[None, :, :, None]
            a = jax.nn.softmax(sc, axis=2)
            o = (a[:, :, :, :, None] * v[:, None, :, :, :]).sum(axis=2)  # (B,Sq,H,hd)
            return acc + o.sum()
        return jax.lax.fori_loop(0, L, one, jnp.float32(0))

    timed(f"attention chain x{L} (VPU broadcast-reduce)", jax.jit(attn_vpu), q, k, v)

    def attn_einsum_bf(q, k, v):
        qb, kb, vb = q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16)
        def one(i, acc):
            sc = jnp.einsum("bqhd,bkhd->bhqk", qb + jnp.bfloat16(i), kb,
                            preferred_element_type=jnp.float32)
            sc = sc + bias
            a = jax.nn.softmax(sc, axis=-1).astype(jnp.bfloat16)
            o = jnp.einsum("bhqk,bkhd->bqhd", a, vb, preferred_element_type=jnp.float32)
            return acc + o.sum()
        return jax.lax.fori_loop(0, L, one, jnp.float32(0))

    timed(f"attention chain x{L} (einsum, bf16 in)", jax.jit(attn_einsum_bf), q, k, v)

    def attn_merged(q, k, v):
        # heads merged into the batch dim: (B*H, S, hd) batched matmul
        qm = q.transpose(0, 2, 1, 3).reshape(ROWS * H, S, HD)
        km = k.transpose(0, 2, 1, 3).reshape(ROWS * H, S, HD)
        vm = v.transpose(0, 2, 1, 3).reshape(ROWS * H, S, HD)
        def one(i, acc):
            sc = jnp.einsum("bqd,bkd->bqk", qm + i, km, preferred_element_type=jnp.float32)
            sc = sc + bias
            a = jax.nn.softmax(sc, axis=-1)
            o = jnp.einsum("bqk,bkd->bqd", a, vm, preferred_element_type=jnp.float32)
            return acc + o.sum()
        return jax.lax.fori_loop(0, L, one, jnp.float32(0))

    timed(f"attention chain x{L} (B*H batched 2D)", jax.jit(attn_merged), q, k, v)

    # 4. Logits matmul ------------------------------------------------------
    h = jax.device_put(np.asarray(rng.standard_normal((ROWS, S - 3, E)), np.float32))
    fl_log = 2 * ROWS * (S - 3) * E * V
    timed("logits GEMM f32 default", jax.jit(lambda a, b: dot(a, b).sum()),
          h, w_log, flops=fl_log)
    timed("logits GEMM bf16 in", jax.jit(lambda a, b: dot(a, b).sum()),
          h.astype(jnp.bfloat16), w_log.astype(jnp.bfloat16), flops=fl_log)

    def logits_lse(a, b, t):
        lg = dot(a, b)
        at = jnp.take_along_axis(lg, t[:, : S - 3, None], axis=2)[:, :, 0]
        return (at - jax.scipy.special.logsumexp(lg, axis=2)).sum()

    timed("logits GEMM + lse + gather (fused consumer)", jax.jit(logits_lse),
          h, w_log, tgt, flops=fl_log)


if __name__ == "__main__":
    main()
