"""TPU tower cost bisection: ablate components to bound their cost at B=256."""
import math
import time

import numpy as np

import jax
import jax.numpy as jnp

B, S, E, H, L, FF = 256, 196, 768, 12, 12, 3072
hd = E // H
INNER, ITERS = 10, 3
bf16 = jnp.bfloat16
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


def attn(q, k, v):
    scale = 1.0 / math.sqrt(hd)
    s = jnp.einsum("bqhd,bkhd->bhqk", (q * scale).astype(bf16), k.astype(bf16),
                   preferred_element_type=bf16)
    a = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", a, v.astype(bf16),
                      preferred_element_type=jnp.float32)


def tower(x, params, *, use_ln=True, use_attn=True, use_mlp=True, use_proj=True):
    for p in params:
        h = ln(x, p["n1w"], p["n1b"]) if use_ln else x.astype(bf16)
        if use_proj:
            q = dense(h, p["wq"], p["bq"]).reshape(B, S, H, hd)
            k = dense(h, p["wk"], p["bk"]).reshape(B, S, H, hd)
            v = dense(h, p["wv"], p["bv"]).reshape(B, S, H, hd)
            o = (attn(q, k, v) if use_attn else v).reshape(B, S, E)
            x = x + dense(o, p["wo"], p["bo"]).astype(bf16)
        if use_mlp:
            h = ln(x, p["n2w"], p["n2b"]) if use_ln else x.astype(bf16)
            h = jax.nn.gelu(dense(h, p["w1"], p["b1"]).astype(bf16), approximate=True)
            x = x + dense(h, p["w2"], p["b2"]).astype(bf16)
    return x


def timeit(name, **kw):
    @jax.jit
    def looped(x, params):
        def body(i, acc):
            return acc + tower(x + i * 1e-6, params, **kw).sum().astype(jnp.float32)
        return jax.lax.fori_loop(0, INNER, body, jnp.float32(0))

    _ = np.asarray(looped(x0, params))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        _ = np.asarray(looped(x0, params))
    dt = (time.perf_counter() - t0) / (ITERS * INNER)
    print(f"{name:36s} {dt*1000:8.2f} ms/batch", flush=True)
    return dt


full = timeit("full tower")
no_attn = timeit("no attention (v passthrough)", use_attn=False)
no_ln = timeit("no layernorms", use_ln=False)
no_mlp = timeit("no MLP blocks", use_mlp=False)
print(f"\nattention chain cost  ~{(full-no_attn)*1000:6.2f} ms")
print(f"layernorm cost        ~{(full-no_ln)*1000:6.2f} ms")
print(f"MLP cost              ~{(full-no_mlp)*1000:6.2f} ms")
