"""Encode throughput for the released backbone architectures vs BASELINE.md.

Reference (RTX A6000, fp16 AMP, B=256): ViT-B-16-SigLIP 1163 img/s,
ViT-SO400M-14-SigLIP 300 img/s, DFN5B-CLIP-ViT-H-14-378 56.2 img/s.
"""
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from novic_tpu.embedders.registry import lookup
from novic_tpu.embedders.vit import VisionTransformer

INNER, ITERS = 4, 3

ARCHS = [
    ("openclip:timm/ViT-B-16-SigLIP", 256, 1163.0),
    ("openclip:timm/ViT-SO400M-14-SigLIP", 128, 300.0),
    ("openclip:apple/DFN5B-CLIP-ViT-H-14-378", 32, 56.2),
]

which = os.environ.get("ARCH", "")
for spec, B, base in ARCHS:
    if which and which not in spec:
        continue
    vcfg = lookup(spec).vision
    vision = VisionTransformer(cfg=vcfg)
    S = vcfg.image_size
    params = jax.jit(vision.init)({"params": jax.random.PRNGKey(0)},
                                  jnp.zeros((1, S, S, 3), jnp.float32))["params"]
    x0 = jax.random.normal(jax.random.PRNGKey(1), (B, S, S, 3), jnp.float32)

    @jax.jit
    def looped(x, p):
        def body(i, acc):
            return acc + vision.apply({"params": p}, x + i * 1e-6).sum()
        return jax.lax.fori_loop(0, INNER, body, jnp.float32(0))

    _ = np.asarray(looped(x0, params))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        _ = np.asarray(looped(x0, params))
    dt = (time.perf_counter() - t0) / (ITERS * INNER)
    print(f"{spec:42s} B={B:3d}  {dt*1000:8.2f} ms/batch  {B/dt:8.1f} img/s  "
          f"({B/dt/base:.2f}x ref {base:g})", flush=True)
