"""int8 vs bf16 on a serving-shaped MLP chain (VERDICT r4 #1, probe v2).

The standalone-dot probes (r4 exp/int8_matmul_timing.py, r5
exp/pallas_int8_matmul.py) are confounded: a single (M,N) f32/i32 output +
sum costs a large fixed share, and the isolated dot never reaches the fused
rate the tower actually runs at (~168 T/s, BENCH_NOTES tower breakdown).
This probe measures the workload int8 would actually serve: the DFN5B-H MLP
pair fc1 (1280->5120) + fc2 (5120->1280), chained INNER times with the
small (M,1280) residual as the only inter-step tensor — weights resident,
outputs small, exactly the serving dataflow.

Arms:
  bf16 chain           tower_dense-equivalent (bf16 in, f32 accum -> bf16)
  int8 XLA chain       W8A8: dynamic row quant + lax.dot_general int8
  int8 pallas chain    W8A8: same quant, tiled Mosaic int8 kernel
  int8 pallas fused    Mosaic kernel with in-kernel dequant (bf16 out)

Run ON TPU: python exp/pallas_int8_mlp_chain.py
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, E, F = 16384, 1280, 5120   # DFN5B-H: rows, width, mlp_dim
INNER, ITERS = 10, 3


def quant_rows(x):
    sx = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True), 1e-12) / 127.0
    return jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8), sx


def quant_w(w):  # (I, O) layout here
    sw = jnp.maximum(jnp.max(jnp.abs(w), axis=0), 1e-12) / 127.0
    return jnp.clip(jnp.round(w / sw[None, :]), -127, 127).astype(jnp.int8), sw


# -- pallas int8 matmul (i32 out) --------------------------------------------

def _mm_kernel(x_ref, w_ref, o_ref, acc_ref, *, n_k):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)

    @pl.when(pl.program_id(2) == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:]


def pallas_int8_mm(xq, wq, bm, bn, bk):
    Mx, K = xq.shape
    N = wq.shape[1]
    n_k = K // bk
    return pl.pallas_call(
        functools.partial(_mm_kernel, n_k=n_k),
        grid=(Mx // bm, N // bn, n_k),
        in_specs=[pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
                  pl.BlockSpec((bk, bn), lambda i, j, k: (k, j))],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((Mx, N), jnp.int32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(xq, wq)


# -- pallas int8 matmul with fused dequant (bf16 out) ------------------------

def _mm_deq_kernel(x_ref, w_ref, sx_ref, sw_ref, o_ref, acc_ref, *, n_k):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)

    @pl.when(pl.program_id(2) == n_k - 1)
    def _():
        o_ref[:] = (acc_ref[:].astype(jnp.float32) * sx_ref[:] * sw_ref[:]
                    ).astype(o_ref.dtype)


def pallas_int8_mm_deq(xq, sx, wq, sw, bm, bn, bk):
    Mx, K = xq.shape
    N = wq.shape[1]
    n_k = K // bk
    return pl.pallas_call(
        functools.partial(_mm_deq_kernel, n_k=n_k),
        grid=(Mx // bm, N // bn, n_k),
        in_specs=[pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
                  pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),
                  pl.BlockSpec((bm, 1), lambda i, j, k: (i, 0)),
                  pl.BlockSpec((1, bn), lambda i, j, k: (0, j))],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((Mx, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(xq, wq, sx, sw[None, :])


def timeit(name, chain_fn, x0, *weights):
    @jax.jit
    def looped(x, *ws):
        def body(i, h):
            return chain_fn(h + (i * 1e-6).astype(h.dtype), *ws)
        return jax.lax.fori_loop(0, INNER, body, x).sum().astype(jnp.float32)

    try:
        _ = np.asarray(looped(x0, *weights))
    except Exception as e:
        print(f"{name:40s} FAILED: {type(e).__name__}: {str(e)[:120]}", flush=True)
        return
    t0 = time.perf_counter()
    for _ in range(ITERS):
        _ = np.asarray(looped(x0, *weights))
    dt = (time.perf_counter() - t0) / (ITERS * INNER)
    tf = 2 * M * E * F * 2 / dt / 1e12  # two matmuls per chain step
    print(f"{name:40s} {dt * 1e3:8.3f} ms/step   {tf:6.1f} T(FL)OP/s", flush=True)


def main():
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(M, E)).astype(np.float32) * 0.05).astype(jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(size=(E, F)).astype(np.float32) * 0.02)
    w2 = jnp.asarray(rng.normal(size=(F, E)).astype(np.float32) * 0.02)
    w1b, w2b = w1.astype(jnp.bfloat16), w2.astype(jnp.bfloat16)
    w1q, s1 = quant_w(w1)
    w2q, s2 = quant_w(w2)

    def bf16_chain(h, w1b, w2b):
        a = jax.lax.dot_general(h, w1b, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        a = jax.nn.gelu(a).astype(jnp.bfloat16)
        b = jax.lax.dot_general(a, w2b, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return b.astype(jnp.bfloat16)

    def int8_xla_chain(h, w1q, s1, w2q, s2):
        xq, sx = quant_rows(h.astype(jnp.float32))
        a = jax.lax.dot_general(xq, w1q, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        a = jax.nn.gelu(a.astype(jnp.float32) * sx * s1[None, :])
        aq, sa = quant_rows(a)
        b = jax.lax.dot_general(aq, w2q, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return (b.astype(jnp.float32) * sa * s2[None, :]).astype(jnp.bfloat16)

    def make_pallas_chain(bm, bn1, bn2, bk1, bk2, fused):
        def chain(h, w1q, s1, w2q, s2):
            xq, sx = quant_rows(h.astype(jnp.float32))
            if fused:
                a = pallas_int8_mm_deq(xq, sx, w1q, s1, bm, bn1, bk1).astype(jnp.float32)
                a = jax.nn.gelu(a)
            else:
                a = pallas_int8_mm(xq, w1q, bm, bn1, bk1)
                a = jax.nn.gelu(a.astype(jnp.float32) * sx * s1[None, :])
            aq, sa = quant_rows(a)
            if fused:
                b = pallas_int8_mm_deq(aq, sa, w2q, s2, bm, bn2, bk2)
                return b
            b = pallas_int8_mm(aq, w2q, bm, bn2, bk2)
            return (b.astype(jnp.float32) * sa * s2[None, :]).astype(jnp.bfloat16)
        return chain

    timeit("bf16 chain (control)", bf16_chain, x0, w1b, w2b)
    timeit("int8 XLA chain", int8_xla_chain, x0, w1q, s1, w2q, s2)
    # bn1 divides F=5120 (fc1 out), bn2 divides E=1280 (fc2 out); bk1 divides
    # E (fc1 K), bk2 divides F (fc2 K)
    for bm, bn1, bn2, bk1, bk2 in ((512, 512, 640, 1280, 1280),
                                   (1024, 512, 640, 1280, 1280),
                                   (512, 1024, 1280, 640, 640)):
        tag = f"bm{bm} bn{bn1}/{bn2} bk{bk1}/{bk2}"
        timeit(f"int8 pallas chain {tag}",
               make_pallas_chain(bm, bn1, bn2, bk1, bk2, False), x0, w1q, s1, w2q, s2)
        timeit(f"int8 pallas fused {tag}",
               make_pallas_chain(bm, bn1, bn2, bk1, bk2, True), x0, w1q, s1, w2q, s2)


if __name__ == "__main__":
    main()
