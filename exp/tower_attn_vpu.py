"""Tower attention at ViT-B shapes: one more attempt (VERDICT r3 weak #5/next #5).

The tower is 97% of e2e serving time; its attention chain costs ~37 of 86
ms/batch for only 0.36 TFLOP — layout/traffic-bound, not compute-bound
(BENCH_NOTES "Tower cost bisection"). The round-3 'all' redesign proved a
head-minor broadcast-reduce (VPU) formulation beats einsum at the decoder's
small-S shapes (45->29 ms, exp/all_bisect4.py); this measures that idea —
and a head-minor MXU einsum hybrid ('qkh': same contraction, no bhqk layout
transposes) — at the tower's S=196/B=256 shapes, where it has never been
tried.

Arithmetic expectation, recorded up front: at S=196 the attention FLOPs are
~0.36 TFLOP; a pure-VPU reduction at ~3-4 TF/s would cost ~90-120 ms, i.e.
WORSE than the 37 ms einsum chain — the VPU win at S<=13 came from dodging
per-head layout transposes whose cost dominated tiny matmuls. The 'qkh'
hybrid keeps the MXU for both contractions while avoiding the bhqk
transposes; whether XLA's layout assignment actually exploits that is what
this measures.

Usage: python exp/tower_attn_vpu.py [batch] (run on the TPU chip)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from novic_tpu.embedders.vit import VisionTowerConfig, VisionTransformer

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 256
INNER = int(os.environ.get("INNER", "5"))
ITERS = int(os.environ.get("ITERS", "3"))


def build(attn_impl: str):
    cfg = VisionTowerConfig(image_size=224, patch_size=16, width=768, layers=12,
                            heads=12, embed_dim=768, act="gelu_tanh",
                            use_class_token=False, patch_bias=True, pre_ln=False,
                            pool="map", layer_norm_eps=1e-6,
                            compute_dtype="bfloat16", attn_impl=attn_impl)
    return cfg, VisionTransformer(cfg=cfg)


def measure(attn_impl: str, params, images) -> float:
    _, tower = build(attn_impl)

    @jax.jit
    def pipeline(p, x):
        def body(i, acc):
            feats = tower.apply({"params": p}, x + i.astype(x.dtype) * 1e-6)
            return acc + feats.sum()

        return jax.lax.fori_loop(0, INNER, body, jnp.float32(0))

    np.asarray(pipeline(params, images))  # compile + warm
    best = float("inf")
    for _ in range(ITERS):
        t0 = time.perf_counter()
        np.asarray(pipeline(params, images))
        best = min(best, (time.perf_counter() - t0) / INNER)
    return best


def main():
    cfg, tower = build("einsum")
    kv, ki = jax.random.split(jax.random.PRNGKey(0))
    S = cfg.image_size
    params = jax.jit(tower.init)({"params": kv},
                                 jnp.zeros((1, S, S, 3), jnp.float32))["params"]
    images = jax.jit(lambda k: jax.random.normal(k, (BATCH, S, S, 3), jnp.float32))(ki)

    # Numerics: all formulations agree (same contraction, f32 accumulation)
    outs = {}
    for impl in ("einsum", "qkh", "vpu"):
        _, t = build(impl)
        outs[impl] = np.asarray(jax.jit(
            lambda p, x, t=t: t.apply({"params": p}, x))(params, images[:4]))
    for impl in ("qkh", "vpu"):
        cos = (outs["einsum"] * outs[impl]).sum(-1) / (
            np.linalg.norm(outs["einsum"], axis=-1) * np.linalg.norm(outs[impl], axis=-1))
        print(f"{impl} vs einsum: min cos {cos.min():.6f}")

    print(f"--- ViT-B/16 tower forward, B={BATCH}, S=196+MAP, bf16 ---")
    for impl in ("einsum", "qkh", "vpu"):
        ms = measure(impl, params, images) * 1e3
        print(f"{impl:>7}: {ms:8.1f} ms/batch  ({BATCH / ms * 1e3:7.0f} img/s)",
              flush=True)


if __name__ == "__main__":
    main()
