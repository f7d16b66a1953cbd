"""Is int8 MXU worth it? Raw dot timing at tower shapes (v5e int8 peak ~394 TOPS)."""
import time

import numpy as np
import jax
import jax.numpy as jnp

M, K, N = 50176, 768, 768
INNER, ITERS = 20, 3
rng = np.random.default_rng(0)
xf = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
wf = jnp.asarray(rng.normal(size=(N, K)).astype(np.float32))
xi = (xf * 10).astype(jnp.int8)
wi = (wf * 10).astype(jnp.int8)


def timeit(name, fn, *args):
    @jax.jit
    def looped(*a):
        def body(i, acc):
            return acc + fn(i, *a)
        return jax.lax.fori_loop(0, INNER, body, jnp.float32(0))
    _ = np.asarray(looped(*args))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        _ = np.asarray(looped(*args))
    dt = (time.perf_counter() - t0) / (ITERS * INNER)
    tf = 2 * M * K * N / dt / 1e12
    print(f"{name:34s} {dt*1e3:7.3f} ms   {tf:6.1f} T(FL)OP/s", flush=True)


def bf16_dot(i, x, w):
    y = jax.lax.dot_general((x + i * 1e-6).astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    return y.sum()


def int8_dot(i, x, w):
    y = jax.lax.dot_general(x + i.astype(jnp.int8), w,
                            (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32)
    return y.sum().astype(jnp.float32)


def int8_dyn_quant(i, x, w):
    # dynamic per-row activation quant + per-col weight scales + dequant
    xx = x + i * 1e-6
    s = jnp.max(jnp.abs(xx), axis=1, keepdims=True) / 127.0
    xq = jnp.clip(jnp.round(xx / s), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(xq, w, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * s).sum()


timeit("bf16 dot", bf16_dot, xf, wf)
timeit("int8 dot (pre-quantized)", int8_dot, xi, wi)
timeit("int8 dot + dynamic act quant", int8_dyn_quant, xf, wi)
