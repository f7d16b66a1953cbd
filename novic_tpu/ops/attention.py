"""Pallas fused attention for the CLIP/SigLIP towers.

softmax(q·kᵀ·scale + bias)·v computed entirely in VMEM per (batch, head) grid
cell — the S×S attention matrix never round-trips through HBM. At ViT
sequence lengths (S ≈ 196-730 tokens, head_dim 64-80) a whole head's q/k/v
and its score matrix fit comfortably in VMEM (< 3 MB), so a single fused
kernel per grid cell is the right shape — no online-softmax streaming needed
(that machinery only pays off when S is too large for VMEM).

Numerics match the towers' MXU strategy: scores accumulate in float32
(preferred_element_type), softmax in float32, output in float32.

Enabled per tower via VisionTowerConfig/TextTowerConfig use_pallas_attention;
validated against the XLA path in tests (interpret mode on CPU, compiled on
TPU).

Measured on a v5e chip (SigLIP-B/16, B=256, S=196, hd=64): XLA 133.8 ms/batch
vs this kernel 216.3 ms/batch — XLA's fused attention wins at these shapes
because this kernel (a) pads hd 64→128 for lane alignment (2× q/k/v/o HBM
traffic) and (b) launches one grid cell per (batch, head) = 3072 small
kernels. Two further designs were measured and also lost (exp/ harnesses,
BENCH_NOTES.md): jax's bundled flash_attention at S padded to 256 (150 ms
tower) and a grid-(B,) head-major kernel with all 12 heads per cell (133 ms;
Mosaic cannot reshape the lane dim in-kernel, and hd=64 lanes still pad).
The XLA path instead keeps the score tensor + softmax chain in bfloat16,
which captured most of the available win (97 → 86 ms). This kernel stays OFF
by default; it is kept as the scaffold for shapes where a custom schedule
does pay off (longer-S towers) and as the in-repo Pallas reference.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attention_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    # Blocks: q/k/v (S, hd) for one (batch, head); o (S, hd)
    # Scale BEFORE the bf16 cast (matches the XLA tower path bit-for-bit)
    q = (q_ref[:] * scale).astype(jnp.bfloat16)
    k = k_ref[:].astype(jnp.bfloat16)
    v = v_ref[:].astype(jnp.bfloat16)
    scores = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(scores, axis=-1)
    out = jax.lax.dot_general(attn.astype(jnp.bfloat16), v, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    o_ref[:] = out


def _attention_kernel_bias(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float):
    q = (q_ref[:] * scale).astype(jnp.bfloat16)
    k = k_ref[:].astype(jnp.bfloat16)
    v = v_ref[:].astype(jnp.bfloat16)
    scores = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    scores = scores + bias_ref[:]
    attn = jax.nn.softmax(scores, axis=-1)
    out = jax.lax.dot_general(attn.astype(jnp.bfloat16), v, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    o_ref[:] = out


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    bias: Optional[jnp.ndarray] = None, *,
                    interpret: bool = False) -> jnp.ndarray:
    """q,k,v: (B, S, H, hd) float32; bias: optional (S, S) additive float32.

    Returns (B, S, H, hd) float32. Pads S up to a multiple of 128 internally
    (padded key columns are masked with -1e30 so they get zero weight).
    """
    B, S, H, hd = q.shape
    scale = 1.0 / math.sqrt(hd)
    Sp = -(-S // 128) * 128
    # Mosaic tiling wants the lane (last) dim 128-aligned; zero-padding hd is
    # free on the MXU (the systolic array is 128 wide regardless) and does not
    # change q·kᵀ (zero columns) — v's padded outputs are sliced away below.
    hdp = -(-hd // 128) * 128

    # (B,S,H,hd) → (B,H,S,hd) so the grid maps one (batch, head) per cell
    def to_bh(x):
        x = jnp.transpose(x, (0, 2, 1, 3))
        if Sp != S or hdp != hd:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, Sp - S), (0, hdp - hd)))
        return x

    qb, kb, vb = to_bh(q), to_bh(k), to_bh(v)

    pad_bias = None
    if Sp != S or bias is not None:
        pad_bias = jnp.zeros((Sp, Sp), jnp.float32)
        if bias is not None:
            pad_bias = pad_bias.at[:S, :S].set(bias.astype(jnp.float32))
        if Sp != S:
            pad_bias = pad_bias.at[:, S:].set(-1e30)  # mask padded keys

    spec = pl.BlockSpec((1, 1, Sp, hdp), lambda b, h: (b, h, 0, 0),
                        memory_space=pl.ANY if interpret else pltpu.VMEM)
    bias_spec = pl.BlockSpec((Sp, Sp), lambda b, h: (0, 0),
                             memory_space=pl.ANY if interpret else pltpu.VMEM)

    def wrap(kernel):
        def inner(*refs):
            # squeeze leading (1,1) block dims via reshape-free indexing
            if pad_bias is None:
                q_ref, k_ref, v_ref, o_ref = refs
                kernel(q_ref.at[0, 0], k_ref.at[0, 0], v_ref.at[0, 0], o_ref.at[0, 0],
                       scale=scale)
            else:
                q_ref, k_ref, v_ref, b_ref, o_ref = refs
                kernel(q_ref.at[0, 0], k_ref.at[0, 0], v_ref.at[0, 0], b_ref,
                       o_ref.at[0, 0], scale=scale)
        return inner

    if pad_bias is None:
        out = pl.pallas_call(
            wrap(_attention_kernel),
            grid=(B, H),
            in_specs=[spec, spec, spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((B, H, Sp, hdp), jnp.float32),
            interpret=interpret,
        )(qb, kb, vb)
    else:
        out = pl.pallas_call(
            wrap(_attention_kernel_bias),
            grid=(B, H),
            in_specs=[spec, spec, spec, bias_spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((B, H, Sp, hdp), jnp.float32),
            interpret=interpret,
        )(qb, kb, vb, pad_bias)

    out = out[:, :, :S, :hd]
    return jnp.transpose(out, (0, 2, 1, 3))


def xla_attention(q, k, v, bias=None):
    """Reference XLA path with the same numerics (bf16 matmuls, f32 softmax)."""
    hd = q.shape[-1]
    scale = 1.0 / math.sqrt(hd)
    scores = jnp.einsum("bqhd,bkhd->bhqk", (q * scale).astype(jnp.bfloat16),
                        k.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    if bias is not None:
        scores = scores + bias
    attn = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", attn.astype(jnp.bfloat16),
                      v.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
