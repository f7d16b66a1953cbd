"""TPU stage breakdown: e2e fused/unfused QKV, encode, tower, preprocess, decode."""
import dataclasses
import time

import numpy as np

import jax
import jax.numpy as jnp

from novic_tpu.embedders.preprocess import PreprocessConfig, preprocess_uint8_device
from novic_tpu.embedders.vit import VisionTowerConfig, VisionTransformer
from novic_tpu.models import DecoderModelConfig, PrefixedIterDecoder
from novic_tpu.models.generate import generate_greedy

BATCH, INNER, ITERS = 256, 10, 3

vcfg = VisionTowerConfig(image_size=224, patch_size=16, width=768, layers=12, heads=12,
                         embed_dim=768, act="gelu_tanh", use_class_token=False,
                         patch_bias=True, pre_ln=False, pool="map", layer_norm_eps=1e-6)
dcfg = DecoderModelConfig(embed_dim=768, vocab_size=4096, token_length=12,
                          hidden_dim=512, feedfwd_scale="1/4", mlp_seq_len=4,
                          num_layers=6, num_heads=8, compute_dtype="bfloat16")
pcfg = PreprocessConfig(size=224, resize_mode="squash", mean=(0.5,) * 3, std=(0.5,) * 3)

vision = VisionTransformer(cfg=vcfg)
vision_unfused = VisionTransformer(cfg=dataclasses.replace(vcfg, fuse_qkv=False))
decoder = PrefixedIterDecoder(cfg=dcfg)
kv, kd, ki = jax.random.split(jax.random.PRNGKey(0), 3)
v_params = jax.jit(vision.init)({"params": kv}, jnp.zeros((1, 224, 224, 3), jnp.float32))["params"]
d_params = jax.jit(decoder.init)({"params": kd}, jnp.zeros((1, 768), jnp.float32),
                                 jnp.zeros((1, 12), jnp.int32))["params"]

raw = jax.jit(lambda k: jax.random.randint(k, (BATCH, 256, 256, 3), 0, 256,
                                           dtype=jnp.int32).astype(jnp.uint8))(ki)
pre = jax.jit(lambda r: preprocess_uint8_device(r, pcfg))(raw)
emb0 = jax.jit(lambda p, x: vision.apply({"params": p}, x))(v_params, pre)
emb0 = emb0 / jnp.linalg.norm(emb0, axis=-1, keepdims=True)
emb0 = jax.block_until_ready(emb0)


def timeit(name, fn, *args):
    @jax.jit
    def looped(*a):
        def body(i, acc):
            return acc + fn(i, *a)
        return jax.lax.fori_loop(0, INNER, body, jnp.float32(0))

    _ = np.asarray(looped(*args))  # compile+warm
    t0 = time.perf_counter()
    for _ in range(ITERS):
        _ = np.asarray(looped(*args))
    dt = (time.perf_counter() - t0) / (ITERS * INNER)
    print(f"{name:28s} {dt*1000:8.2f} ms/batch   {BATCH/dt:9.1f} img/s", flush=True)
    return dt


def e2e(vis):
    def fn(i, vp, dp, r):
        images = preprocess_uint8_device(r + i.astype(jnp.uint8), pcfg)
        feats = vis.apply({"params": vp}, images)
        e = feats / jnp.maximum(jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-12)
        tgt, pad, _, _, _, _ = generate_greedy(decoder, dp, e)
        return (tgt.sum() + pad.sum()).astype(jnp.float32)
    return fn


def enc(vis):
    def fn(i, vp, r):
        images = preprocess_uint8_device(r + i.astype(jnp.uint8), pcfg)
        feats = vis.apply({"params": vp}, images)
        return feats.sum()
    return fn


def tower(vis):
    def fn(i, vp, x):
        return vis.apply({"params": vp}, x + i * 1e-6).sum()
    return fn


def prep(i, r):
    return preprocess_uint8_device(r + i.astype(jnp.uint8), pcfg).sum()


def dec(i, dp, e):
    tgt, pad, _, _, _, _ = generate_greedy(decoder, dp, e + i * 1e-6)
    return (tgt.sum() + pad.sum()).astype(jnp.float32)


t_e2e = timeit("e2e fused", e2e(vision), v_params, d_params, raw)
t_e2e_u = timeit("e2e unfused-qkv", e2e(vision_unfused), v_params, d_params, raw)
t_enc = timeit("encode (prep+tower)", enc(vision), v_params, raw)
t_tow = timeit("tower only", tower(vision), v_params, pre)
t_tow_u = timeit("tower only unfused", tower(vision_unfused), v_params, pre)
t_pre = timeit("preprocess only", prep, raw)
t_dec = timeit("decode only (greedy)", dec, d_params, emb0)
print(f"\nsum of stages (pre+tower+dec): {(t_pre+t_tow+t_dec)*1000:.2f} ms vs e2e {t_e2e*1000:.2f} ms")
print(f"qkv fusion delta: e2e {(t_e2e_u-t_e2e)*1000:+.2f} ms, tower {(t_tow_u-t_tow)*1000:+.2f} ms")
