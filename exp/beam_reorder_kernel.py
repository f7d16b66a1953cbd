"""Beam KV-reorder microbenchmark: one-hot einsum vs Pallas permutation kernel.

The per-step candidate reorder costs ~56 ms of the 79 ms beam batch
(exp/beam_bisect2.py): 2L einsums of 256 tiny (10,10)x(10,5632) batched
matmuls are MXU-pipeline-latency bound. A permutation is pure data movement —
a Pallas kernel with grid (B,) that copies rows inside VMEM by a
scalar-prefetched candidate index should run at HBM bandwidth.

Shapes: B=256, H=10, 12 caches of (B*H, G=11, heads*hd=512) bf16 (28.8 MB
each, 345 MB total) — measured as 11 sequential steps like the real beam.
"""

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H, G, F = 256, 10, 11, 512
NCACHE = 12
STEPS = 11
ITERS = 3
bf16 = jnp.bfloat16

rng = np.random.default_rng(0)
caches = [jnp.asarray(rng.normal(size=(B, H, G, F)).astype(np.float32), dtype=bf16)
          for _ in range(NCACHE)]
cands = jnp.asarray(rng.integers(0, H, size=(STEPS, B, H)).astype(np.int32))


# --- variant 1: one-hot einsum (current production) -------------------------

def reorder_einsum(c, cand):
    onehot = jax.nn.one_hot(cand, H, dtype=c.dtype)  # (B, Hout, Hin)
    return jnp.einsum("bij,bjf->bif", onehot, c.reshape(B, H, -1),
                      preferred_element_type=c.dtype).reshape(c.shape)


# --- variant 2: pallas row-permute kernel -----------------------------------

def _permute_kernel(cand_ref, in_ref, out_ref):
    # cand_ref: scalar-prefetch (B, H) int32; blocks (1, H, G, F)
    b = pl.program_id(0)
    for i in range(H):
        ci = cand_ref[b, i]
        out_ref[0, i] = in_ref[0, ci]


def reorder_pallas(c, cand):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, H, G, F), lambda b, cand: (b, 0, 0, 0))],
        out_specs=pl.BlockSpec((1, H, G, F), lambda b, cand: (b, 0, 0, 0)),
    )
    return pl.pallas_call(
        _permute_kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, G, F), c.dtype),
    )(cand, c)


# --- variant 3: pallas, all caches in one call ------------------------------

def _permute_many_kernel(cand_ref, *refs):
    b = pl.program_id(0)
    n = len(refs) // 2
    for in_ref, out_ref in zip(refs[:n], refs[n:]):
        for i in range(H):
            ci = cand_ref[b, i]
            out_ref[0, i] = in_ref[0, ci]


def reorder_pallas_many(cs, cand):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, H, G, F), lambda b, cand: (b, 0, 0, 0))] * len(cs),
        out_specs=[pl.BlockSpec((1, H, G, F), lambda b, cand: (b, 0, 0, 0))] * len(cs),
    )
    return pl.pallas_call(
        _permute_many_kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, H, G, F), c.dtype) for c in cs],
    )(cand, *cs)


def check():
    c = caches[0]
    cand = cands[0]
    ref = reorder_einsum(c, cand)
    out = jax.jit(reorder_pallas)(c, cand)
    err = float(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)).max())
    print(f"pallas permute max err: {err:.2e}")
    assert err == 0.0


def bench(name, fn):
    @jax.jit
    def run(caches, cands):
        cs = caches
        total = jnp.float32(0)
        for s in range(STEPS):
            cs = fn(cs, cands[s])
            total = total + cs[0][0, 0, 0, 0].astype(jnp.float32)
        return total + sum(c.sum().astype(jnp.float32) for c in cs)

    _ = np.asarray(run(caches, cands))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        _ = np.asarray(run(caches, cands))
    dt = (time.perf_counter() - t0) / ITERS
    gb = NCACHE * B * H * G * F * 2 * 2 * STEPS / 1e9
    print(f"{name:28s} {dt * 1000:8.2f} ms for {STEPS} steps x {NCACHE} caches "
          f"({gb / dt:.0f} GB/s effective)", flush=True)


def main():
    check()
    bench("one-hot einsum (prod)",
          lambda cs, cand: [reorder_einsum(c, cand) for c in cs])
    bench("pallas per-cache",
          lambda cs, cand: [reorder_pallas(c, cand) for c in cs])
    bench("pallas all-in-one",
          lambda cs, cand: list(reorder_pallas_many(cs, cand)))


if __name__ == "__main__":
    main()
