"""Does Mosaic/Pallas engage the int8 MXU double-rate path? (VERDICT r4 #1)

Round-4 finding (exp/int8_matmul_timing.py): plain XLA int8 dots measured
41.9 T/s vs bf16's 38.8 on an isolated tower matmul — a tenth of the v5e's
~394 TOPS int8 peak, i.e. XLA never used the int8 MXU path. This probe asks
the same question one level down: a hand-tiled Pallas matmul with int8 VMEM
blocks and int32 accumulation, against the identical-tiling bf16 kernel and
the XLA bf16 dot, at DFN5B-H MLP shapes (K=1280, N=5120 — where the
agreement-gate backbone's FLOPs live).

Run ON TPU: python exp/pallas_int8_matmul.py
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

M, K, N = 16384, 1280, 5120
INNER, ITERS = 8, 3


def matmul_kernel(x_ref, w_ref, o_ref, acc_ref, *, n_k):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=acc_ref.dtype)

    @pl.when(pl.program_id(2) == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def make_matmul(bm, bn, bk, in_dtype, acc_dtype, out_dtype):
    n_k = K // bk

    @jax.jit
    def mm(x, w):
        return pl.pallas_call(
            functools.partial(matmul_kernel, n_k=n_k),
            grid=(M // bm, N // bn, n_k),
            in_specs=[
                pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
                pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
            out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
            scratch_shapes=[pltpu.VMEM((bm, bn), acc_dtype)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
        )(x, w)

    return mm


def timeit(name, fn, *args):
    @jax.jit
    def looped(*a):
        def body(i, acc):
            return acc + fn(*a).sum().astype(jnp.float32)
        return jax.lax.fori_loop(0, INNER, body, jnp.float32(0))

    try:
        _ = np.asarray(looped(*args))
    except Exception as e:
        print(f"{name:44s} FAILED: {type(e).__name__}: {str(e)[:140]}", flush=True)
        return
    t0 = time.perf_counter()
    for _ in range(ITERS):
        _ = np.asarray(looped(*args))
    dt = (time.perf_counter() - t0) / (ITERS * INNER)
    tf = 2 * M * K * N / dt / 1e12
    print(f"{name:44s} {dt * 1e3:8.3f} ms   {tf:6.1f} T(FL)OP/s", flush=True)


def main():
    rng = np.random.default_rng(0)
    xf = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
    wf = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32))
    xb, wb = xf.astype(jnp.bfloat16), wf.astype(jnp.bfloat16)
    xi = (xf * 10).astype(jnp.int8)
    wi = (wf * 10).astype(jnp.int8)

    def xla_bf16(x, w):
        return jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    timeit("XLA bf16 dot (control)", xla_bf16, xb, wb)
    for bm, bn, bk in ((512, 512, 1280), (256, 1024, 1280), (512, 1024, 640),
                       (1024, 512, 1280), (512, 2560, 1280)):
        tag = f"bm{bm} bn{bn} bk{bk}"
        timeit(f"pallas bf16 f32acc   {tag}",
               make_matmul(bm, bn, bk, jnp.bfloat16, jnp.float32, jnp.float32), xb, wb)
        timeit(f"pallas int8 i32acc   {tag}",
               make_matmul(bm, bn, bk, jnp.int8, jnp.int32, jnp.int32), xi, wi)


if __name__ == "__main__":
    main()
