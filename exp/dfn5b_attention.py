"""DFN5B-H-14-378 attention investigation (VERDICT r1 item 4).

Round 1 concluded "XLA wins" at ViT-B shapes (S=197, hd=64). DFN5B-378 runs a
different regime — S=730 (27x27 patches + cls), E=1280, H=16, hd=80, 32
layers, B<=32 — where the (B,H,S,S) score tensor is ~30x larger per image and
attention is bandwidth-bound. This harness measures, at exactly those shapes:

  xla       — the production einsum+softmax chain (bf16 scores)
  noattn    — v-passthrough ablation (isolates the attention chain cost)
  flash     — jax.experimental.pallas.ops.tpu.flash_attention (never
              materializes scores to HBM), block-size sweep
  fullseq   — custom Pallas: grid (B*H,), whole-sequence scores in VMEM
              (S'=768 padded: 768x768 f32 = 2.25 MB, fits)

Timing hygiene per verify-skill: device-resident inputs, fori_loop INNER
batches per call, scalar checksum fetch to synchronize over the axon relay.

Usage: python exp/dfn5b_attention.py [variants...]
"""

from __future__ import annotations

import functools
import math
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

B = 32
IMG, PATCH = 378, 14
S = (IMG // PATCH) ** 2 + 1  # 730 (cls token)
E, H, LAYERS = 1280, 16, 32
hd = E // H  # 80
FF = 4 * E
INNER, ITERS, WARMUP = 4, 3, 1
bf16 = jnp.bfloat16

rng = np.random.default_rng(0)


def mk(*shape, std=0.02):
    return jnp.asarray(rng.normal(0, std, shape).astype(np.float32))


def make_params():
    layers = []
    for _ in range(LAYERS):
        layers.append({
            "wq": mk(E, E), "wk": mk(E, E), "wv": mk(E, E), "wo": mk(E, E),
            "bq": mk(E), "bk": mk(E), "bv": mk(E), "bo": mk(E),
            "n1w": jnp.ones(E), "n1b": jnp.zeros(E),
            "n2w": jnp.ones(E), "n2b": jnp.zeros(E),
            "w1": mk(E, FF), "b1": mk(FF), "w2": mk(FF, E), "b2": mk(E),
        })
    return layers


def dense(x, w, b, out_dtype=jnp.float32):
    y = jax.lax.dot_general(x.astype(bf16), w.astype(bf16),
                            (((x.ndim - 1,), (0,)), ((), ())),
                            preferred_element_type=out_dtype)
    return y + b.astype(out_dtype)


def ln(x, w, b):
    x = x.astype(jnp.float32)
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + 1e-5) * w + b


SCALE = 1.0 / math.sqrt(hd)


def attn_xla(q, k, v):
    scores = jnp.einsum("bqhd,bkhd->bhqk", (q * SCALE).astype(bf16),
                        k.astype(bf16), preferred_element_type=bf16)
    attn = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", attn, v.astype(bf16),
                      preferred_element_type=jnp.float32)


def attn_noattn(q, k, v):
    return v.astype(jnp.float32)


def make_attn_flash(block_q, block_k, sp=768):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, SegmentIds, flash_attention)

    bs = BlockSizes(block_q=block_q, block_k_major=block_k, block_k=block_k,
                    block_b=1)
    pad = sp - S

    def attn(q, k, v):
        # flash kernel layout: (B, H, S, hd); pad S 730->768 with segment-id
        # masking (pad tokens get segment 0, real tokens 1)
        Bq = q.shape[0]

        def prep(x):
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))
            return x.transpose(0, 2, 1, 3).astype(bf16)

        seg = jnp.pad(jnp.ones((Bq, S), jnp.int32), ((0, 0), (0, pad)))
        o = flash_attention(prep(q), prep(k), prep(v), sm_scale=SCALE,
                            segment_ids=SegmentIds(q=seg, kv=seg),
                            block_sizes=bs)
        return o.transpose(0, 2, 1, 3)[:, :S].astype(jnp.float32)
    return attn


def _fullseq_kernel(q_ref, k_ref, v_ref, o_ref, *, s_valid):
    from jax.experimental import pallas as pl  # noqa: F401

    # q arrives pre-scaled (prep multiplies by SCALE once)
    kmask = jax.lax.broadcasted_iota(jnp.int32, (q_ref.shape[1], k_ref.shape[1]), 1) >= s_valid
    s = jax.lax.dot_general(q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = jnp.where(kmask, -1e30, s)
    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - m)
    a = (e / jnp.sum(e, axis=1, keepdims=True)).astype(bf16)
    o_ref[0] = jax.lax.dot_general(a, v_ref[0], (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32).astype(o_ref.dtype)


def make_attn_fullseq(sp=768):
    """Grid (B*H,): whole padded sequence per cell; scores live only in VMEM."""
    from jax.experimental import pallas as pl

    def attn(q, k, v):
        Bq = q.shape[0]
        pad = sp - S

        def prep(x):  # (B,S,H,hd) -> (B*H, SP, hd) bf16
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))
            return x.transpose(0, 2, 1, 3).reshape(Bq * H, sp, hd).astype(bf16)

        qp, kp, vp = prep(q * SCALE), prep(k), prep(v)
        out = pl.pallas_call(
            functools.partial(_fullseq_kernel, s_valid=S),
            grid=(Bq * H,),
            in_specs=[pl.BlockSpec((1, sp, hd), lambda i: (i, 0, 0))] * 3,
            out_specs=pl.BlockSpec((1, sp, hd), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((Bq * H, sp, hd), jnp.float32),
        )(qp, kp, vp)
        out = out.reshape(Bq, H, sp, hd).transpose(0, 2, 1, 3)[:, :S]
        return out
    return attn


def _allheads_kernel(q_ref, k_ref, v_ref, o_ref, *, s_valid):
    # Block (1, SP, H, hd) in projection layout; static per-head loop.
    kmask = jax.lax.broadcasted_iota(
        jnp.int32, (q_ref.shape[1], k_ref.shape[1]), 1) >= s_valid
    for h in range(H):
        q = q_ref[0, :, h, :]
        k = k_ref[0, :, h, :]
        v = v_ref[0, :, h, :]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = jnp.where(kmask, -1e30, s)
        m = jnp.max(s, axis=1, keepdims=True)
        e = jnp.exp(s - m)
        a = (e / jnp.sum(e, axis=1, keepdims=True)).astype(bf16)
        o_ref[0, :, h, :] = jax.lax.dot_general(
            a, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


def make_attn_allheads(sp=736):
    """Grid (B,): whole (SP, H, hd) slab per cell in the projections' natural
    layout — zero XLA transposes, scores stay in VMEM."""
    from jax.experimental import pallas as pl

    def attn(q, k, v):
        Bq = q.shape[0]
        pad = sp - S
        qp = jnp.pad((q * SCALE).astype(bf16), ((0, 0), (0, pad), (0, 0), (0, 0)))
        kp = jnp.pad(k.astype(bf16), ((0, 0), (0, pad), (0, 0), (0, 0)))
        vp = jnp.pad(v.astype(bf16), ((0, 0), (0, pad), (0, 0), (0, 0)))
        out = pl.pallas_call(
            functools.partial(_allheads_kernel, s_valid=S),
            grid=(Bq,),
            in_specs=[pl.BlockSpec((1, sp, H, hd), lambda b: (b, 0, 0, 0))] * 3,
            out_specs=pl.BlockSpec((1, sp, H, hd), lambda b: (b, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((Bq, sp, H, hd), bf16),
        )(qp, kp, vp)
        return out[:, :S].astype(jnp.float32)
    return attn


def attn_xla_premuted(q, k, v):
    """(B,H,S,hd)-native einsum chain: gives XLA freedom to fold the layout
    into the projection epilogues instead of standalone transposes."""
    scores = jnp.einsum("bhsd,bhtd->bhst", (q * SCALE).astype(bf16),
                        k.astype(bf16), preferred_element_type=bf16)
    attn = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhst,bhtd->bshd", attn, v.astype(bf16),
                      preferred_element_type=jnp.float32)


def tower_premuted(params, x, batch):
    """Projections emit (B,H,S,hd) directly via einsum."""
    x = x.astype(jnp.float32)
    for p in params:
        h = ln(x, p["n1w"], p["n1b"])
        hb = h.astype(bf16)
        q = jnp.einsum("bse,ehd->bhsd", hb, p["wq"].astype(bf16).reshape(E, H, hd),
                       preferred_element_type=bf16) + p["bq"].astype(bf16).reshape(H, 1, hd)
        k = jnp.einsum("bse,ehd->bhsd", hb, p["wk"].astype(bf16).reshape(E, H, hd),
                       preferred_element_type=bf16) + p["bk"].astype(bf16).reshape(H, 1, hd)
        v = jnp.einsum("bse,ehd->bhsd", hb, p["wv"].astype(bf16).reshape(E, H, hd),
                       preferred_element_type=bf16) + p["bv"].astype(bf16).reshape(H, 1, hd)
        o = attn_xla_premuted(q, k, v).reshape(batch, S, E)
        x = x + dense(o, p["wo"], p["bo"])
        h = ln(x, p["n2w"], p["n2b"])
        h = dense(h, p["w1"], p["b1"])
        h = jax.nn.gelu(h)
        x = x + dense(h, p["w2"], p["b2"])
    return x


def _direct_kernel(q_ref, k_ref, v_ref, o_ref, *, s_valid):
    # Blocks arrive as (1, SP, 1, hd) straight from the (B, SP, H, hd) arrays:
    # no XLA transpose ever materializes. q is pre-scaled.
    q = q_ref[0, :, 0, :]
    k = k_ref[0, :, 0, :]
    v = v_ref[0, :, 0, :]
    kmask = jax.lax.broadcasted_iota(jnp.int32, (q.shape[0], k.shape[0]), 1) >= s_valid
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = jnp.where(kmask, -1e30, s)
    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - m)
    a = (e / jnp.sum(e, axis=1, keepdims=True)).astype(bf16)
    o_ref[0, :, 0, :] = jax.lax.dot_general(
        a, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def make_attn_direct(sp=736):
    """Grid (B, H) over (B, SP, H, hd) blocks in the PROJECTION's natural
    layout — the score tensor never leaves VMEM and XLA inserts no
    (B,S,H,hd)->(B,H,S,hd) transposes."""
    from jax.experimental import pallas as pl

    def attn(q, k, v):
        Bq = q.shape[0]
        pad = sp - S
        qp = jnp.pad((q * SCALE).astype(bf16), ((0, 0), (0, pad), (0, 0), (0, 0)))
        kp = jnp.pad(k.astype(bf16), ((0, 0), (0, pad), (0, 0), (0, 0)))
        vp = jnp.pad(v.astype(bf16), ((0, 0), (0, pad), (0, 0), (0, 0)))
        out = pl.pallas_call(
            functools.partial(_direct_kernel, s_valid=S),
            grid=(Bq, H),
            in_specs=[pl.BlockSpec((1, sp, 1, hd), lambda b, h: (b, 0, h, 0))] * 3,
            out_specs=pl.BlockSpec((1, sp, 1, hd), lambda b, h: (b, 0, h, 0)),
            out_shape=jax.ShapeDtypeStruct((Bq, sp, H, hd), jnp.float32),
        )(qp, kp, vp)
        return out[:, :S]
    return attn


def tower(params, x, attn_fn, resid_dtype=jnp.float32, mid_dtype=jnp.float32,
          batch=None):
    """resid_dtype=bf16 halves the HBM traffic of the (B,S,E) residual stream;
    mid_dtype=bf16 halves the (B*S,4E) FF intermediate + q/k/v projection
    traffic (LN statistics always compute in f32)."""
    batch = batch or B
    x = x.astype(resid_dtype)
    for p in params:
        h = ln(x, p["n1w"], p["n1b"])
        q = dense(h, p["wq"], p["bq"], mid_dtype).reshape(batch, S, H, hd)
        k = dense(h, p["wk"], p["bk"], mid_dtype).reshape(batch, S, H, hd)
        v = dense(h, p["wv"], p["bv"], mid_dtype).reshape(batch, S, H, hd)
        o = attn_fn(q, k, v).reshape(batch, S, E)
        x = (x + dense(o, p["wo"], p["bo"])).astype(resid_dtype)
        h = ln(x, p["n2w"], p["n2b"])
        h = dense(h, p["w1"], p["b1"], mid_dtype)
        h = jax.nn.gelu(h)
        x = (x + dense(h, p["w2"], p["b2"])).astype(resid_dtype)
    return x


def bench(name, attn_fn, params, x0, resid_dtype=jnp.float32,
          mid_dtype=jnp.float32, compiler_options=None):
    batch = x0.shape[0]

    @functools.partial(jax.jit, compiler_options=compiler_options)
    def run(params, x0):
        def body(i, acc):
            y = tower(params, x0 + i * 1e-6, attn_fn, resid_dtype=resid_dtype,
                      mid_dtype=mid_dtype, batch=batch)
            return acc + y.sum().astype(jnp.float32)
        return jax.lax.fori_loop(0, INNER, body, jnp.float32(0))

    try:
        for _ in range(WARMUP):
            np.asarray(run(params, x0))
        t0 = time.perf_counter()
        for _ in range(ITERS):
            np.asarray(run(params, x0))
        dt = (time.perf_counter() - t0) / (ITERS * INNER)
    except Exception as e:
        print(f"{name:24s} FAILED: {type(e).__name__}: {str(e)[:200]}")
        return None
    ips = batch / dt
    print(f"{name:24s} {dt * 1000:8.1f} ms/batch(B={batch})  {ips:7.1f} img/s  "
          f"({ips / 56.2:.2f}x A6000)", flush=True)
    return dt


def check(name, attn_fn):
    """Numerical check vs the f32 XLA chain at the real (S, hd), small B."""
    q, k, v = mk(2, S, H, hd, std=1.0), mk(2, S, H, hd, std=1.0), mk(2, S, H, hd, std=1.0)
    ref_scores = jnp.einsum("bqhd,bkhd->bhqk", q * SCALE, k)
    ref = jnp.einsum("bhqk,bkhd->bqhd", jax.nn.softmax(ref_scores, -1), v)
    out = jax.jit(attn_fn)(q, k, v)
    err = float(jnp.abs(out - ref).max())
    print(f"{name:24s} max abs err vs f32 XLA: {err:.2e}", flush=True)
    assert err < 0.02, f"{name} numerically wrong"


def main():
    variants = sys.argv[1:] or ["xla", "noattn", "flash", "fullseq"]
    params = make_params()
    x0 = mk(B, S, E, std=1.0)
    print(f"DFN5B-H-14-378 tower shapes: B={B} S={S} E={E} H={H} hd={hd} "
          f"layers={LAYERS}; INNER={INNER} ITERS={ITERS}", flush=True)
    if "xla" in variants:
        bench("xla bf16 chain", attn_xla, params, x0)
    if "noattn" in variants:
        bench("no-attn ablation", attn_noattn, params, x0)
    if "flash" in variants:
        check("flash q256 k256", make_attn_flash(256, 256))
        for bq, bk in ((768, 768), (384, 384), (256, 256), (128, 256), (256, 768)):
            bench(f"flash q{bq} k{bk}", make_attn_flash(bq, bk), params, x0)
    if "fullseq" in variants:
        check("pallas fullseq", make_attn_fullseq())
        bench("pallas fullseq", make_attn_fullseq(), params, x0)
    if "resid16" in variants:
        bench("xla + bf16 residual", attn_xla, params, x0, resid_dtype=bf16)
        bench("flash768 + bf16 resid", make_attn_flash(768, 768), params, x0,
              resid_dtype=bf16)
    if "ff16" in variants:
        bench("xla + bf16 mid", attn_xla, params, x0, mid_dtype=bf16)
        bench("xla + bf16 mid+resid", attn_xla, params, x0, resid_dtype=bf16,
              mid_dtype=bf16)
    if "allheads" in variants:
        check("pallas allheads", make_attn_allheads())
        bench("pallas allheads", make_attn_allheads(), params, x0)
        bench("pallas allheads bf16", make_attn_allheads(), params, x0,
              resid_dtype=bf16, mid_dtype=bf16)
    if "premuted" in variants:
        @jax.jit
        def run_pre(params, x0):
            def body(i, acc):
                return acc + tower_premuted(params, x0 + i * 1e-6,
                                            x0.shape[0]).sum().astype(jnp.float32)
            return jax.lax.fori_loop(0, INNER, body, jnp.float32(0))

        for _ in range(WARMUP):
            np.asarray(run_pre(params, x0))
        t0 = time.perf_counter()
        for _ in range(ITERS):
            np.asarray(run_pre(params, x0))
        dt = (time.perf_counter() - t0) / (ITERS * INNER)
        print(f"xla premuted einsum       {dt*1000:8.1f} ms/batch(B={x0.shape[0]})  "
              f"{x0.shape[0]/dt:7.1f} img/s  ({x0.shape[0]/dt/56.2:.2f}x A6000)",
              flush=True)
    if "direct" in variants:
        check("pallas direct", make_attn_direct())
        bench("pallas direct", attn_fn=make_attn_direct(), params=params, x0=x0)
        bench("pallas direct bf16mid", make_attn_direct(), params, x0,
              resid_dtype=bf16, mid_dtype=bf16)
    if "vmem" in variants:
        for kib in (32768, 65536, 98304):
            bench(f"xla vmem={kib//1024}MiB", attn_xla, params, x0,
                  compiler_options={"xla_tpu_scoped_vmem_limit_kib": str(kib)})
    if "gemm" in variants:
        # Pure-GEMM roofline at these shapes: the 6 per-layer matmuls chained,
        # no LN / attention / gelu (establishes the compute floor)
        def gemm_tower(params, x):
            x = x.astype(bf16)
            for p in params:
                q = dense(x, p["wq"], p["bq"], bf16)
                k = dense(x, p["wk"], p["bk"], bf16)
                v = dense(x, p["wv"], p["bv"], bf16)
                o = dense(q + k + v, p["wo"], p["bo"], bf16)
                h = dense(o, p["w1"], p["b1"], bf16)
                x = dense(h, p["w2"], p["b2"], bf16)
            return x

        @jax.jit
        def run_gemm(params, x0):
            def body(i, acc):
                return acc + gemm_tower(params, x0 + i * 1e-6).sum().astype(jnp.float32)
            return jax.lax.fori_loop(0, INNER, body, jnp.float32(0))

        for _ in range(WARMUP):
            np.asarray(run_gemm(params, x0))
        t0 = time.perf_counter()
        for _ in range(ITERS):
            np.asarray(run_gemm(params, x0))
        dt = (time.perf_counter() - t0) / (ITERS * INNER)
        tf = 32 * 6 * 2 * (x0.shape[0] * S) * 1280 * (1280 * 4 + 1280 * 0) / 1e12
        # FLOPs: qkv+o are ExE, ff are Ex4E and 4ExE: per layer 2*M*E*E*(4) + 2*M*E*4E*2
        M = x0.shape[0] * S
        tf = 32 * (4 * 2 * M * E * E + 2 * 2 * M * E * FF) / 1e12
        print(f"gemm-only roofline        {dt*1000:8.1f} ms/batch(B={x0.shape[0]})  "
              f"{tf/dt:6.1f} TF/s", flush=True)
    if "batch" in variants:
        for nb in (64, 128):
            xb = mk(nb, S, E, std=1.0)
            bench(f"xla all-bf16 B={nb}", attn_xla, params, xb,
                  resid_dtype=bf16, mid_dtype=bf16)


if __name__ == "__main__":
    main()
