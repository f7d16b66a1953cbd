"""TPU tower attention variants: XLA f32-scores (current), bf16-scores, flash kernel.

Standalone raw-jnp ViT-B/16 block stack (no MAP head) — timing-only comparison.
"""
import functools
import math
import time

import numpy as np

import jax
import jax.numpy as jnp

B, S, E, H, L, FF = 256, 196, 768, 12, 12, 3072
hd = E // H
INNER, ITERS = 10, 3

rng = np.random.default_rng(0)


def mk(*shape, std=0.02):
    return jnp.asarray(rng.normal(0, std, shape).astype(np.float32))


params = [dict(
    n1w=jnp.ones((E,)), n1b=jnp.zeros((E,)), n2w=jnp.ones((E,)), n2b=jnp.zeros((E,)),
    wq=mk(E, E), bq=jnp.zeros((E,)), wk=mk(E, E), bk=jnp.zeros((E,)),
    wv=mk(E, E), bv=jnp.zeros((E,)), wo=mk(E, E), bo=jnp.zeros((E,)),
    w1=mk(FF, E), b1=jnp.zeros((FF,)), w2=mk(E, FF), b2=jnp.zeros((E,)),
) for _ in range(L)]
x0 = mk(B, S, E, std=1.0)

bf16 = jnp.bfloat16


def dense(x, w, b):
    y = jax.lax.dot_general(x.astype(bf16), w.astype(bf16),
                            (((x.ndim - 1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return y + b


def ln(x, w, b):
    x = x.astype(jnp.float32)
    m = jnp.mean(x, axis=-1, keepdims=True)
    v = jnp.mean(jnp.square(x - m), axis=-1, keepdims=True)
    return ((x - m) * jax.lax.rsqrt(v + 1e-6) * w + b).astype(bf16)


def attn_xla_f32(q, k, v):
    scale = 1.0 / math.sqrt(hd)
    s = jnp.einsum("bqhd,bkhd->bhqk", (q * scale).astype(bf16), k.astype(bf16),
                   preferred_element_type=jnp.float32)
    a = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", a.astype(bf16), v.astype(bf16),
                      preferred_element_type=jnp.float32)


def attn_xla_bf16(q, k, v):
    scale = 1.0 / math.sqrt(hd)
    s = jnp.einsum("bqhd,bkhd->bhqk", (q * scale).astype(bf16), k.astype(bf16),
                   preferred_element_type=bf16)
    a = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", a.astype(bf16), v.astype(bf16),
                      preferred_element_type=jnp.float32)


def attn_flash(q, k, v):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, SegmentIds, flash_attention)
    Sp = 256
    pad = ((0, 0), (0, Sp - S), (0, 0), (0, 0))
    qp = jnp.pad(q.astype(bf16), pad).transpose(0, 2, 1, 3)  # (B,H,Sp,hd)
    kp = jnp.pad(k.astype(bf16), pad).transpose(0, 2, 1, 3)
    vp = jnp.pad(v.astype(bf16), pad).transpose(0, 2, 1, 3)
    seg = jnp.pad(jnp.ones((B, S), jnp.int32), ((0, 0), (0, Sp - S)))
    bs = BlockSizes(block_q=256, block_k_major=256, block_k=256, block_b=1)
    out = flash_attention(qp, kp, vp, segment_ids=SegmentIds(q=seg, kv=seg),
                          sm_scale=1.0 / math.sqrt(hd), block_sizes=bs)
    return out.transpose(0, 2, 1, 3)[:, :S].astype(jnp.float32)


def tower_bhsd(x, params):
    """Head-major projections: q/k/v emitted directly as (B,H,S,hd) via a
    reshaped-weight einsum, avoiding the (B,S,H,hd)->(B,H,S,hd) transposes;
    scores in bf16. One transpose remains on the attention output."""
    scale = 1.0 / math.sqrt(hd)
    for p in params:
        h = ln(x, p["n1w"], p["n1b"])
        hb = h.astype(bf16)
        def proj(w, b):
            y = jnp.einsum("bse,hde->bhsd", hb, w.reshape(H, hd, E).astype(bf16),
                           preferred_element_type=jnp.float32)
            return (y + b.reshape(1, H, 1, hd)).astype(bf16)
        q, k, v = proj(p["wq"], p["bq"]), proj(p["wk"], p["bk"]), proj(p["wv"], p["bv"])
        sc = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k, preferred_element_type=bf16)
        a = jax.nn.softmax(sc, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", a, v, preferred_element_type=jnp.float32)
        o = o.transpose(0, 2, 1, 3).reshape(B, S, E)
        x = x + dense(o, p["wo"], p["bo"]).astype(bf16)
        h = ln(x, p["n2w"], p["n2b"])
        h = jax.nn.gelu(dense(h, p["w1"], p["b1"]).astype(bf16), approximate=True)
        x = x + dense(h, p["w2"], p["b2"]).astype(bf16)
    return x


def attn_xla_bf16_f32sm(q, k, v):
    """Current production path: bf16 scores, f32 softmax math."""
    scale = 1.0 / math.sqrt(hd)
    s = jnp.einsum("bqhd,bkhd->bhqk", (q * scale).astype(bf16), k.astype(bf16),
                   preferred_element_type=bf16)
    a = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(bf16)
    return jnp.einsum("bhqk,bkhd->bqhd", a, v.astype(bf16),
                      preferred_element_type=jnp.float32)


def tower(x, attn, params):
    for p in params:
        h = ln(x, p["n1w"], p["n1b"])
        q = dense(h, p["wq"], p["bq"]).reshape(B, S, H, hd)
        k = dense(h, p["wk"], p["bk"]).reshape(B, S, H, hd)
        v = dense(h, p["wv"], p["bv"]).reshape(B, S, H, hd)
        o = attn(q, k, v).reshape(B, S, E)
        x = x + dense(o, p["wo"], p["bo"]).astype(bf16)
        h = ln(x, p["n2w"], p["n2b"])
        h = jax.nn.gelu(dense(h, p["w1"], p["b1"]).astype(bf16), approximate=True)
        x = x + dense(h, p["w2"], p["b2"]).astype(bf16)
    return x


def timeit(name, attn):
    # Params must be jit ARGUMENTS: closure-captured arrays become HLO
    # constants and the axon remote-compile payload blows past HTTP limits.
    @jax.jit
    def looped(x, params):
        def body(i, acc):
            return acc + tower(x + i * 1e-6, attn, params).sum().astype(jnp.float32)
        return jax.lax.fori_loop(0, INNER, body, jnp.float32(0))

    _ = np.asarray(looped(x0, params))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        _ = np.asarray(looped(x0, params))
    dt = (time.perf_counter() - t0) / (ITERS * INNER)
    print(f"{name:24s} {dt*1000:8.2f} ms/batch  {B/dt:9.1f} img/s", flush=True)


# numeric sanity: flash vs xla f32 on one layer's worth of random qkv
q = mk(4, S, H, hd, std=1.0); k = mk(4, S, H, hd, std=1.0); v = mk(4, S, H, hd, std=1.0)
Bsave = B
B = 4
ref = np.asarray(attn_xla_f32(q, k, v))
got = np.asarray(attn_flash(q, k, v))
print("flash vs xla max abs diff:", np.abs(ref - got).max(), flush=True)
B = Bsave

def timeit2(name, fn):
    @jax.jit
    def looped(x, params):
        def body(i, acc):
            return acc + fn(x + i * 1e-6, params).sum().astype(jnp.float32)
        return jax.lax.fori_loop(0, INNER, body, jnp.float32(0))

    _ = np.asarray(looped(x0, params))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        _ = np.asarray(looped(x0, params))
    dt = (time.perf_counter() - t0) / (ITERS * INNER)
    print(f"{name:28s} {dt*1000:8.2f} ms/batch  {B/dt:9.1f} img/s", flush=True)


timeit2("head-major + bf16 softmax", tower_bhsd)
