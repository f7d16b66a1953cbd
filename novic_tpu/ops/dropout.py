"""Fused dropout on the TPU hardware PRNG (Pallas).

The reference applies torch nn.Dropout inside every decoder layer
(reference embedding_decoder.py:1086-1158 custom encoder layers; dropout 0.1
in the released recipe, config/train.yaml:249-308). The JAX port's
threefry-based FastDropout (models/layers.py) already halves the counter
work by unpacking two 16-bit fields per 32-bit block, but the remaining
dropout cost is still ~48 ms of the 243 ms train step (~15 ms threefry RNG +
keep-mask residual traffic between forward and backward — BENCH_NOTES.md).

MEASURED NEGATIVE RESULT (round 3, on chip): this kernel is bandwidth-optimal
standalone (0.196 ms for a 64 MB tensor ≈ 650 GB/s) but the full train step
is SLOWER with it (308.5 vs 260.3 ms/step) — every pallas_call is a fusion
barrier, so each of the decoder's 25 dropout sites forces its input out of
the matmul epilogue it would otherwise fuse into, twice (fwd + regenerating
bwd). XLA hides the threefry cost inside those fusions for free. The kernel
stays as an explicit opt-in (`dropout_impl=pallas`, single-device TPU only)
and as the measured record of why the "obvious" fused kernel loses here; the
packed-threefry FastDropout (models/layers.py) remains the default.

This kernel removes both RNG costs the TPU-native way:
* random bits come from the per-core hardware PRNG (`pltpu.prng_random_bits`)
  generated directly in VMEM next to the data — no threefry counter math on
  the VPU, no bits tensor in HBM;
* backward REGENERATES the identical mask from the same (seed, block) pair
  instead of saving it — the custom VJP stores only the int32 seed, so no
  keep-mask residual is written/read across the fwd/bwd boundary.

Determinism: the mask is a pure function of (seed, shape, grid position) —
`prng_seed(seed, program_id)` reseeds per block, so forward and backward see
bit-identical masks and a fixed training seed reproduces exactly (on the
same backend; the hardware PRNG stream differs from threefry's, which is
fine — the reference's torch RNG stream differs from ours anyway).

Shapes: the input is flattened to (rows, 128) lanes; row blocks are chosen
as a divisor of the row count (≤ 2048 rows ≈ 1 MB f32 per block). Inputs
whose size is not a multiple of 8·128 fall back to the threefry path at the
call site (FastDropout) — every decoder-layer tensor in this repo is a
multiple (hidden 512, ff 128, attention S² panels batch-padded by 8·heads).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_MAX_BLOCK_ROWS = 2048


def supports_shape(n: int) -> bool:
    """True if an n-element tensor can take the fused kernel path."""
    return n % (8 * _LANES) == 0


def _block_rows(rows: int) -> int:
    """Largest divisor of `rows` that is ≤ _MAX_BLOCK_ROWS and a multiple of 8."""
    best = 8
    for cand in range(_MAX_BLOCK_ROWS, 7, -8):
        if rows % cand == 0:
            best = cand
            break
    return best


def _dropout_kernel(seed_ref, x_ref, o_ref, *, thresh: int, inv_keep: float):
    # Reseed per grid block so backward can regenerate the identical mask.
    # Both key words are fed in: collapsing the key to one uint32 would shrink
    # the mask space to 2^32 and birthday-collide across a long run's ~10^7
    # (site, step) draws. Mosaic accepts at most TWO seed words, so the block
    # index is mixed into word 0 with a golden-ratio odd multiplier
    # (wrapping int32 mul keeps the map bijective per block).
    pltpu.prng_seed(seed_ref[0] ^ (pl.program_id(0) * -1640531527), seed_ref[1])
    bits = pltpu.bitcast(pltpu.prng_random_bits(x_ref.shape), jnp.uint32)
    keep = bits < jnp.uint32(thresh)
    x = x_ref[...]
    o_ref[...] = jnp.where(keep, x * inv_keep, jnp.zeros_like(x))


def _run_kernel(x2d: jnp.ndarray, seed: jnp.ndarray, rate: float) -> jnp.ndarray:
    rows = x2d.shape[0]
    brows = _block_rows(rows)
    # Keep probability quantizes to 2^-32; thresh == 2^32 (rate 0) is clamped
    # by the caller (rate <= 0 short-circuits before reaching the kernel).
    thresh = min(int(round((1.0 - rate) * 2 ** 32)), 2 ** 32 - 1)
    kernel = functools.partial(_dropout_kernel, thresh=thresh,
                               inv_keep=1.0 / (1.0 - rate))
    return pl.pallas_call(
        kernel,
        grid=(rows // brows,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((brows, _LANES), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((brows, _LANES), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(x2d.shape, x2d.dtype),
    )(seed, x2d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def hw_dropout(x: jnp.ndarray, seed: jnp.ndarray, rate: float) -> jnp.ndarray:
    """Dropout(x) with hardware-PRNG mask; seed is a (2,) (or ()) uint32/int32
    array — two words keep the full 64-bit key space (FastDropout passes
    jax.random.bits(rng, (2,), uint32)).

    TPU-only (no interpret-mode fallback: `prng_seed` has no CPU lowering in
    this JAX version) — callers gate on the backend (FastDropout 'pallas')."""
    return _hw_dropout_fwd(x, seed, rate)[0]


def _hw_dropout_fwd(x, seed, rate):
    shape = x.shape
    seed = jnp.asarray(seed, jnp.int32).reshape(-1)
    if seed.size < 2:
        seed = jnp.concatenate([seed, jnp.zeros(2 - seed.size, jnp.int32)])
    seed = seed[:2]
    y = _run_kernel(x.reshape(-1, _LANES), seed, rate)
    return y.reshape(shape), seed


def _hw_dropout_bwd(rate, seed, dy):
    # Same seed + same grid ⇒ bit-identical mask; dropout is linear in x, so
    # dx = dropout(dy) with the regenerated mask. No mask residual in HBM.
    shape = dy.shape
    dx = _run_kernel(dy.reshape(-1, _LANES), seed, rate)
    return dx.reshape(shape), None


hw_dropout.defvjp(_hw_dropout_fwd, _hw_dropout_bwd)
