"""Pin the Mosaic int8 MXU rate question (VERDICT r4 #1, probe v3).

Pure pre-quantized dots (no quant overhead, small checksum output) across
tile shapes, with an f32 control to prove the harness distinguishes MXU
rates at all: on this hardware f32 should run at ~1/4 the bf16 rate, and a
true int8 double-rate path would show ~2x bf16. Measured equality of int8
and bf16 closes the question: Mosaic feeds the MXU int8 operands at the
bf16 pipeline rate (no double-rate engagement).

Run ON TPU: python exp/pallas_int8_rate_pin.py
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

M, K, N = 8192, 1280, 5120
INNER, ITERS = 10, 3


def _kernel(x_ref, w_ref, o_ref, acc_ref, *, n_k):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
                                      preferred_element_type=acc_ref.dtype)

    @pl.when(pl.program_id(2) == n_k - 1)
    def _():
        # Tiny per-(i,j)-block checksum write: keeps output traffic
        # negligible so the measurement is the MXU rate, not the (M,N) store
        o_ref[:] = jnp.sum(acc_ref[:], axis=1, keepdims=True).astype(o_ref.dtype)


def make_mm(bm, bn, bk, acc_dtype):
    n_k = K // bk

    def mm(x, w):
        return pl.pallas_call(
            functools.partial(_kernel, n_k=n_k),
            grid=(M // bm, N // bn, n_k),
            in_specs=[pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
                      pl.BlockSpec((bk, bn), lambda i, j, k: (k, j))],
            # One checksum column PER j-block: parallel j programs write
            # disjoint blocks (an (i, 0) map would alias every j's write)
            out_specs=pl.BlockSpec((bm, 1), lambda i, j, k: (i, j)),
            out_shape=jax.ShapeDtypeStruct((M, N // bn), jnp.float32),
            scratch_shapes=[pltpu.VMEM((bm, bn), acc_dtype)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
        )(x, w)

    return mm


def timeit(name, fn, x, w):
    @jax.jit
    def looped(x, w):
        def body(i, acc):
            return acc + fn(x, w).sum()
        return jax.lax.fori_loop(0, INNER, body, jnp.float32(0))

    try:
        _ = np.asarray(looped(x, w))
    except Exception as e:
        print(f"{name:40s} FAILED: {type(e).__name__}: {str(e)[:120]}", flush=True)
        return
    t0 = time.perf_counter()
    for _ in range(ITERS):
        _ = np.asarray(looped(x, w))
    dt = (time.perf_counter() - t0) / (ITERS * INNER)
    print(f"{name:40s} {dt * 1e3:8.3f} ms   {2 * M * K * N / dt / 1e12:6.1f} T(FL)OP/s",
          flush=True)


def main():
    rng = np.random.default_rng(0)
    xf = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
    wf = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32))
    xb, wb = xf.astype(jnp.bfloat16), wf.astype(jnp.bfloat16)
    xi = (xf * 10).astype(jnp.int8)
    wi = (wf * 10).astype(jnp.int8)

    for bm, bn, bk in ((512, 512, 1280), (256, 256, 1280), (1024, 1024, 640),
                       (512, 512, 256), (2048, 512, 1280)):
        tag = f"bm{bm} bn{bn} bk{bk}"
        timeit(f"f32  {tag}", make_mm(bm, bn, bk, jnp.float32), xf, wf)
        timeit(f"bf16 {tag}", make_mm(bm, bn, bk, jnp.float32), xb, wb)
        timeit(f"int8 {tag}", make_mm(bm, bn, bk, jnp.int32), xi, wi)


if __name__ == "__main__":
    main()
