#!/usr/bin/env python
"""End-to-end NOVIC throughput benchmark: CLIP encode + label decode.

Measures images/sec through the flagship pipeline — SigLIP-B/16 vision tower
(the released ta4 backbone, ref README.md:297) + 12M-param PrefixedIterDecoder
KV-cached greedy decode — as ONE jitted computation per batch, on whatever
accelerator JAX exposes (the real TPU chip under the driver).

Baseline: the reference reports 7 ms/img batched end-to-end (B=256) on an
RTX A6000-class GPU => ~143 img/s (doc/WACV2025_NOVIC.pdf §4; BASELINE.md).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_IMG_PER_SEC = 143.0  # reference end-to-end batched throughput
BATCH = 256
ITERS = 10
WARMUP = 2


def main():
    import jax
    import jax.numpy as jnp

    from novic_tpu.embedders.preprocess import PreprocessConfig, preprocess_uint8_device
    from novic_tpu.embedders.vit import VisionTowerConfig, VisionTransformer
    from novic_tpu.models import DecoderModelConfig, PrefixedIterDecoder
    from novic_tpu.models.generate import generate_greedy

    device = jax.devices()[0]
    # SigLIP-B/16 vision tower + released decoder hyperparams
    vcfg = VisionTowerConfig(image_size=224, patch_size=16, width=768, layers=12, heads=12,
                             embed_dim=768, act="gelu_tanh", use_class_token=False,
                             patch_bias=True, pre_ln=False, pool="map", layer_norm_eps=1e-6)
    dcfg = DecoderModelConfig(embed_dim=768, vocab_size=4096, token_length=12,
                              hidden_dim=512, feedfwd_scale="1/4", mlp_seq_len=4,
                              num_layers=6, num_heads=8)
    pcfg = PreprocessConfig(size=224, resize_mode="squash", mean=(0.5,) * 3, std=(0.5,) * 3)

    vision = VisionTransformer(cfg=vcfg)
    decoder = PrefixedIterDecoder(cfg=dcfg)
    kv, kd = jax.random.split(jax.random.PRNGKey(0))
    v_params = jax.jit(vision.init)({"params": kv}, np.zeros((1, 224, 224, 3), np.float32))["params"]
    d_params = jax.jit(decoder.init)({"params": kd}, np.zeros((1, 768), np.float32),
                                     np.zeros((1, 12), np.int32))["params"]

    @jax.jit
    def pipeline(v_params, d_params, raw_images):
        # uint8 camera frames → on-device preprocess → ViT → unit-norm → greedy decode
        images = preprocess_uint8_device(raw_images, pcfg)
        feats = vision.apply({"params": v_params}, images)
        embeds = feats / jnp.maximum(jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-12)
        target, padding, _, _, _, _ = generate_greedy(decoder, d_params, embeds)
        return target, padding

    rng = np.random.default_rng(0)
    raw = rng.integers(0, 256, size=(BATCH, 256, 256, 3), dtype=np.uint8)
    raw_dev = jax.device_put(raw, device)

    # Warmup (compile)
    for _ in range(WARMUP):
        out = pipeline(v_params, d_params, raw_dev)
        jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = pipeline(v_params, d_params, raw_dev)
        jax.block_until_ready(out)
    elapsed = time.perf_counter() - t0

    img_per_sec = BATCH * ITERS / elapsed
    result = {
        "metric": "end_to_end_images_per_sec_b256_siglip_b16_greedy",
        "value": round(img_per_sec, 2),
        "unit": "img/s",
        "vs_baseline": round(img_per_sec / BASELINE_IMG_PER_SEC, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
