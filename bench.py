#!/usr/bin/env python
"""End-to-end NOVIC throughput benchmark: CLIP encode + label decode.

Default mode measures images/sec through the flagship pipeline — SigLIP-B/16
vision tower (the released ta4 backbone, ref README.md:297) + 12M-param
PrefixedIterDecoder KV-cached beam/greedy decode — as ONE jitted computation
per batch on the default JAX device (the real TPU chip under the driver).

Modes (env vars):
  BENCH_BACKBONE=siglip_b16|so400m|dfn5b378|clipa_h14
      Encode-only throughput for that backbone (uint8 frame -> on-device
      preprocess -> tower -> unit-norm embeds), like-for-like with the
      reference's per-backbone A6000 image-embed rows (BASELINE.md: 1163 /
      300 / 56.2 img/s; ref config/train.yaml:104-126). Emits the v5e-8 DP
      projection (linear in chips: pure data parallelism, zero cross-chip
      traffic at inference) and, for dfn5b378, the measured GEMM roofline
      context (BENCH_NOTES.md "DFN5B attention": tower floor 162 ms/batch at
      92% MXU => the A6000-ratio ceiling is hardware, not software).
  BENCH_TOKLEN=<G>
      Override the decoder token length for the e2e beam bench — measures the
      fixed-G scan's sensitivity to sequence length (VERDICT r2 weak #6: our
      scan always runs G steps; the reference's python loop exits early on
      short labels. Real trained labels are 3-6 tokens + end, so G=8 vs the
      recipe's 12 bounds what early-exit could buy).
  BENCH_WEIGHTS=<ckpt.npz>|none
      Decoder checkpoint override. DEFAULT: assets/bench_ft0_decoder.npz
      (FT0-vocabulary trained artifact) if present, so the headline measures
      trained weights with data-realistic beam end/finish behavior; 'none'
      forces random init (timing is weight-independent, BENCH_NOTES
      "BENCH_WEIGHTS": 1609.3 vs 1607.7 img/s).
  BENCH_GUIDED=<W>
      Guide-trie size override. DEFAULT (unset) is the PRODUCTION config:
      guided beam k=10 over the full-vocabulary trie (W=42919 FT0 scale,
      or the trained checkpoint's real tokenized vocabulary when shipped) —
      the reference's product-default gencfg (ref infer.py:55). Set 0 for
      unguided decode. Uses the trie-state guided path (models/guide_trie.py).
  BENCH_SECONDARY=0
      Skip the like-for-like secondary measurement (G=12 / random weights /
      unguided beam — the rounds 1-3 headline, kept for series continuity).
  BENCH_ALL=<W>
      Exhaustive-'all' scoring (gencfg method 'all': teacher-force EVERY one
      of W guide targets per image, ref embedding_decoder.py:986-1079) over
      an FT0-shaped synthetic guide set at the released decoder config.
      Reported against this repo's round-3 pre-redesign measurement on the
      same chip (236 s per 512-image batch at W=42919; the reference has no
      published 'all' throughput). W=42919 reproduces FT0 scale.

Benchmark hygiene for the remote-TPU (axon) environment: all tensors live on
device (params initialized on device; synthetic uint8 camera frames generated
on device once and kept resident); per-iteration the host fetches only a
scalar checksum, which forces completion (block_until_ready does not
synchronize over the axon relay).

Baseline: the reference reports 7 ms/img batched end-to-end (B=256) on an
RTX A6000-class GPU => ~143 img/s (doc/WACV2025_NOVIC.pdf §4; BASELINE.md).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

BASELINE_IMG_PER_SEC = 143.0  # reference end-to-end batched throughput
BATCH = int(os.environ.get("BENCH_BATCH", 256))
ITERS = int(os.environ.get("BENCH_ITERS", 3))
WARMUP = int(os.environ.get("BENCH_WARMUP", 1))
# Batches per device-side fori_loop iteration: amortizes the ~32 ms axon-tunnel
# roundtrip out of the measurement (inputs varied per iteration so XLA cannot
# CSE the loop body). BENCH_INNER=1 falls back to per-call timing.
INNER = int(os.environ.get("BENCH_INNER", 10))
SMALL = os.environ.get("BENCH_SMALL", "") not in ("", "0")  # tiny towers for CPU smoke tests
BACKBONE = os.environ.get("BENCH_BACKBONE", "")
TOKLEN = int(os.environ.get("BENCH_TOKLEN", 0))
WEIGHTS = os.environ.get("BENCH_WEIGHTS", "")
# A/B the beam KV-cache strategy: "" (generate_beam's auto), "lazy", "reorder"
BEAM_CACHE = os.environ.get("BENCH_BEAM_CACHE", "auto")
# Guide-set size; unset => production default (full FT0 vocabulary trie),
# BENCH_GUIDED=0 => unguided
_GUIDED_ENV = os.environ.get("BENCH_GUIDED")
GUIDED = None if _GUIDED_ENV is None else int(_GUIDED_ENV)
# Secondary like-for-like config (G=12 / random weights / unguided beam, the
# rounds 1-3 headline) alongside the production default; BENCH_SECONDARY=0 skips
SECONDARY = os.environ.get("BENCH_SECONDARY", "1") not in ("", "0")
ALL_W = int(os.environ.get("BENCH_ALL", 0))      # exhaustive-'all' guide-set size

# Per-backbone baselines: reference A6000 fp16-AMP image embed rates (B=256)
# and text embed rates (B=512, "Text Speed" column; cache-creation workload)
# — BASELINE.md; ref config/train.yaml:104-126
BACKBONES = {
    "siglip_b16": ("openclip:timm/ViT-B-16-SigLIP", 1163.0, 3450.0),
    "so400m": ("openclip:timm/ViT-SO400M-14-SigLIP", 300.0, 3190.0),
    "dfn5b378": ("openclip:apple/DFN5B-CLIP-ViT-H-14-378", 56.2, 1100.0),
    # CLIPA-v2 H/14 (registered round 3): ref yaml:113 — 193-192 id/s, 2.71 kid/s
    "clipa_h14": ("openclip:rwightman/ViT-H-14-CLIPA-datacomp1B", 192.5, 2710.0),
    # EVA02 + ALIGN (registered round 3): ref yaml:129,109,135 id/s + kid/s rows
    "eva02_b16": ("openclip:timm/eva02_base_patch16_clip_224.merged2b_s8b_b131k", 855.0, 4830.0),
    "eva02_e14": ("openclip:timm/eva02_enormous_patch14_clip_224.laion2b_s4b_b115k", 37.8, 1240.0),
    "align_base": ("transformers:kakaobrain/align-base", 540.5, 10200.0),
}


def timeit(pipeline, args, iters, inner, batch, warmup=None):
    for _ in range(WARMUP if warmup is None else warmup):
        _ = np.asarray(pipeline(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        _ = np.asarray(pipeline(*args))
    elapsed = time.perf_counter() - t0
    return batch * iters * max(inner, 1) / elapsed


def bench_text(name: str) -> dict:
    """Text-embed (cache-creation) throughput for a registry backbone:
    token ids -> text tower -> unit-norm embeds, B=512 like the reference's
    'Text Speed' measurement (ref config/train.yaml table)."""
    import jax
    import jax.numpy as jnp

    from novic_tpu.embedders.base import tower_modules
    from novic_tpu.embedders.registry import lookup

    spec, _, a6000_txt_s = BACKBONES[name]
    arch = lookup(spec)
    tcfg = arch.text
    batch = int(os.environ.get("BENCH_BATCH", 512))
    inner = INNER

    _, text = tower_modules(arch)
    t_params = jax.jit(text.init)({"params": jax.random.PRNGKey(0)},
                                  jnp.zeros((1, tcfg.context_length), jnp.int32))["params"]

    @jax.jit
    def make_tokens(key):
        return jax.random.randint(key, (batch, tcfg.context_length), 0,
                                  tcfg.vocab_size, dtype=jnp.int32)

    toks = make_tokens(jax.random.PRNGKey(1))

    @jax.jit
    def pipeline(p, tok):
        def body(i, acc):
            t = jnp.where(tok + i < tcfg.vocab_size, tok + i, tok)  # vary input
            feats = text.apply({"params": p}, t)
            feats = feats / jnp.maximum(jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-12)
            return acc + feats.sum().astype(jnp.float32)

        return jax.lax.fori_loop(0, inner, body, jnp.float32(0))

    tps = timeit(pipeline, (t_params, toks), ITERS, inner, batch)
    return {
        "metric": f"text_embed_texts_per_sec_{name}",
        "value": round(tps, 2),
        "unit": "texts/s",
        "vs_baseline": round(tps / a6000_txt_s, 3),
        "extra": {"backbone": spec, "batch": batch,
                  "context_length": tcfg.context_length,
                  "a6000_baseline_texts_per_sec": a6000_txt_s,
                  "v5e8_dp_projection_texts_per_sec": round(8 * tps, 1)},
    }


def bench_backbone(name: str) -> dict:
    """Encode-only throughput for a registry backbone (uint8 -> embeds)."""
    import jax
    import jax.numpy as jnp

    from novic_tpu.embedders.base import tower_modules
    from novic_tpu.embedders.preprocess import preprocess_uint8_device
    from novic_tpu.embedders.registry import lookup

    spec, a6000_img_s, _ = BACKBONES[name]
    arch = lookup(spec)
    vcfg = arch.vision
    quant = os.environ.get("BENCH_TOWER_QUANT", "")
    if quant:  # int8 serving-mode A/B (VisionTowerConfig.quant)
        import dataclasses as _dc

        vcfg = _dc.replace(vcfg, quant=quant)
        arch = _dc.replace(arch, vision=vcfg)
    pcfg = arch.preprocess
    batch = int(os.environ.get("BENCH_BATCH",
                               256 if name in ("siglip_b16", "eva02_b16", "align_base")
                               else 16 if name == "eva02_e14" else 64))
    inner = INNER

    vision, _ = tower_modules(arch)
    S = vcfg.image_size

    # ViT-E-class towers (eva02_e14: 4.4B params) exceed single-chip HBM in
    # f32 storage; store params in the compute dtype (bf16) instead. The cast
    # happens INSIDE the init jit so the f32 originals never materialize
    # together (peak = one f32 param + the bf16 tree).
    param_dtype = os.environ.get("BENCH_PARAM_DTYPE",
                                 "bfloat16" if name == "eva02_e14" else "")

    def init_params(key, x):
        params = vision.init({"params": key}, x)["params"]
        if param_dtype:
            dt = jnp.dtype(param_dtype)
            params = jax.tree.map(
                lambda a: a.astype(dt) if a.dtype == jnp.float32 else a, params)
        return params

    v_params = jax.jit(init_params)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, S, S, 3), jnp.float32))

    frame_res = max(256, S)

    @jax.jit
    def make_frames(key):
        return jax.random.randint(key, (batch, frame_res, frame_res, 3), 0, 256,
                                  dtype=jnp.int32).astype(jnp.uint8)

    raw_dev = make_frames(jax.random.PRNGKey(1))

    @jax.jit
    def pipeline(v_params, raw_images):
        def body(i, acc):
            images = preprocess_uint8_device(raw_images + i.astype(jnp.uint8), pcfg)
            feats = vision.apply({"params": v_params}, images)
            feats = feats / jnp.maximum(jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-12)
            return acc + feats.sum().astype(jnp.float32)

        return jax.lax.fori_loop(0, inner, body, jnp.float32(0))

    ips = timeit(pipeline, (v_params, raw_dev), ITERS, inner, batch)
    extra = {
        "backbone": spec,
        "batch": batch,
        "v5e8_dp_projection_img_per_sec": round(8 * ips, 1),
        "a6000_baseline_img_per_sec": a6000_img_s,
    }
    if name == "dfn5b378":
        extra["roofline_note"] = (
            "GEMM-only floor for this tower measured 162 ms/batch at 92% MXU "
            "utilization on v5e (BENCH_NOTES.md 'DFN5B attention'): the "
            "single-chip ceiling vs A6000 is set by hardware FLOPs, and "
            "multi-chip scaling is linear (pure DP, no cross-chip traffic)."
        )
    return {
        "metric": f"image_embed_images_per_sec_{name}",
        "value": round(ips, 2),
        "unit": "img/s",
        "vs_baseline": round(ips / a6000_img_s, 3),
        "extra": extra,
    }


def main():
    import jax

    if os.environ.get("BENCH_CPU", ""):
        # Host-CPU smoke mode: the axon plugin ignores JAX_PLATFORMS, pin via
        # config before the first device query initializes a backend
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    if BACKBONE:
        if os.environ.get("BENCH_TEXT", ""):
            print(json.dumps(bench_text(BACKBONE)))
        else:
            print(json.dumps(bench_backbone(BACKBONE)))
        return

    from novic_tpu.embedders.preprocess import PreprocessConfig, preprocess_uint8_device
    from novic_tpu.embedders.vit import VisionTowerConfig, VisionTransformer
    from novic_tpu.models import DecoderModelConfig, PrefixedIterDecoder
    from novic_tpu.models.generate import generate_beam, generate_greedy

    # SigLIP-B/16 vision tower + released decoder hyperparams
    if SMALL:
        vcfg = VisionTowerConfig(image_size=32, patch_size=16, width=64, layers=2, heads=4,
                                 embed_dim=64, act="gelu_tanh", use_class_token=False,
                                 patch_bias=True, pre_ln=False, pool="map", layer_norm_eps=1e-6)
        dcfg = DecoderModelConfig(embed_dim=64, vocab_size=128, token_length=8,
                                  hidden_dim=64, num_layers=2, num_heads=4)
        pcfg = PreprocessConfig(size=32, resize_mode="squash", mean=(0.5,) * 3, std=(0.5,) * 3)
    else:
        vcfg = VisionTowerConfig(image_size=224, patch_size=16, width=768, layers=12, heads=12,
                                 embed_dim=768, act="gelu_tanh", use_class_token=False,
                                 patch_bias=True, pre_ln=False, pool="map", layer_norm_eps=1e-6)
        dcfg = DecoderModelConfig(embed_dim=768, vocab_size=4096, token_length=12,
                                  hidden_dim=512, feedfwd_scale="1/4", mlp_seq_len=4,
                                  num_layers=6, num_heads=8, compute_dtype="bfloat16")
        pcfg = PreprocessConfig(size=224, resize_mode="squash", mean=(0.5,) * 3, std=(0.5,) * 3)

    # Production default (VERDICT r3 #3): trained FT0 decoder checkpoint if
    # shipped (assets/bench_ft0_decoder.npz: trained on the FT0-scale
    # 42,919-noun soak vocabulary, auto_fixed_token_length G) + guided beam
    # over the full-vocabulary trie — the product-default serving config
    # (ref infer.py:55 beam_k10..gp). Explicit env vars override each lever.
    weights = WEIGHTS
    if weights in ("none", "random"):
        weights = ""
    elif not weights and not SMALL:
        default_ckpt = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "assets", "bench_ft0_decoder.npz")
        if os.path.isfile(default_ckpt):
            weights = default_ckpt

    d_params_override = None
    if weights:
        # Trained decoder checkpoint: beam end-token/finish behavior becomes
        # data-realistic instead of random-weight (VERDICT r2 weak #6)
        from novic_tpu.train.checkpoint import load_checkpoint

        ck = load_checkpoint(weights)
        dcfg = ck["model_config"]
        d_params_override = ck["params"]
        if dcfg.embed_dim != vcfg.embed_dim:
            raise SystemExit(f"BENCH_WEIGHTS embed_dim {dcfg.embed_dim} != tower "
                             f"{vcfg.embed_dim}")
    if TOKLEN:
        if d_params_override is not None:
            # Shrinking G against loaded params: pos_embedding is the only
            # G-shaped parameter (max_seq_len = mlp_seq_len + token_length - 1)
            if TOKLEN > dcfg.token_length:
                raise SystemExit(f"BENCH_TOKLEN {TOKLEN} exceeds the checkpoint's "
                                 f"token_length {dcfg.token_length}")
            new_max = dcfg.mlp_seq_len + TOKLEN - 1
            d_params_override = dict(d_params_override)
            d_params_override["pos_embedding"] = \
                np.asarray(d_params_override["pos_embedding"])[:new_max]
        dcfg = dcfg.replace(token_length=TOKLEN)

    vision = VisionTransformer(cfg=vcfg)
    decoder = PrefixedIterDecoder(cfg=dcfg)
    kv, kd, ki = jax.random.split(jax.random.PRNGKey(0), 3)
    # Params initialize ON device (only PRNG keys cross the wire)
    S = vcfg.image_size
    v_params = jax.jit(vision.init)({"params": kv},
                                    jnp.zeros((1, S, S, 3), jnp.float32))["params"]
    if d_params_override is not None:
        # The shipped asset stores fp16 params (half the repo weight); compute
        # wants the training dtype back
        d_params_override = jax.tree.map(
            lambda a: np.asarray(a).astype(np.float32)
            if np.issubdtype(np.asarray(a).dtype, np.floating) else np.asarray(a),
            d_params_override)
        d_params = jax.device_put(d_params_override)
    else:
        d_params = jax.jit(decoder.init)({"params": kd},
                                         jnp.zeros((1, dcfg.embed_dim), jnp.float32),
                                         jnp.zeros((1, dcfg.token_length), jnp.int32))["params"]

    # Synthetic uint8 camera frames, generated on device once and kept resident
    frame_res = 64 if SMALL else 256

    @jax.jit
    def make_frames(key):
        return jax.random.randint(key, (BATCH, frame_res, frame_res, 3), 0, 256,
                                  dtype=jnp.int32).astype(jnp.uint8)

    raw_dev = make_frames(ki)

    def embed_batch(v_params, raw_images):
        images = preprocess_uint8_device(raw_images, pcfg)
        feats = vision.apply({"params": v_params}, images)
        return feats / jnp.maximum(jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-12)

    if ALL_W:
        from novic_tpu.models.generate import generate_all, precompute_generate_all

        grng = np.random.default_rng(0)
        C = dcfg.token_length
        glengths = grng.integers(1, C, size=ALL_W)
        gtoks = grng.integers(1, dcfg.vocab_size, size=(ALL_W, C), dtype=np.int32)
        guide_np = np.where(np.arange(C)[None, :] < glengths[:, None], gtoks, 0).astype(np.int32)
        pre = precompute_generate_all(
            dcfg.vocab_size, length_alpha=0.0, vocab_targets=None, vocab_per_token=False,
            vocab_scaler=0.0, guide_targets=guide_np, guide_renorm=False)
        embeds = jax.jit(embed_batch)(v_params, raw_dev)

        def run_all():
            out = generate_all(decoder, d_params, embeds, topk=10,
                               guide_targets=guide_np, precompute=pre)
            jax.tree_util.tree_map(np.asarray, out)

        run_all()  # compile + warm
        reps = max(ITERS // 3, 1)
        t0 = time.perf_counter()
        for _ in range(reps):
            run_all()
        dt = (time.perf_counter() - t0) / reps
        ips = BATCH / dt
        # Pre-redesign measurement on this same chip: 236 s per 512-image
        # batch at W=42919 (round-3 soak; rate scales ~1/W) — the reference
        # publishes no 'all' throughput.
        base_ips = (512.0 / 236.0) * (42919.0 / ALL_W)
        print(json.dumps({
            "metric": f"exhaustive_all_images_per_sec_b{BATCH}_w{ALL_W}",
            "value": round(ips, 3),
            "unit": "img/s",
            "vs_baseline": round(ips / base_ips, 3),
            "extra": {"seconds_per_batch": round(dt, 1), "guide_targets": ALL_W,
                      "decoder_token_length": C,
                      "baseline": "this repo pre-redesign round-3 soak "
                                  "(236 s / 512 img at W=42919, same chip)"},
        }))
        return

    guided_W = GUIDED
    if guided_W is None:
        guided_W = 64 if SMALL else 42919

    def make_guide(dcfg_g, d_ck=None):
        """(guide_ids, trie) device tuple for guided decode. With a trained
        checkpoint the REAL vocabulary tokenizations are used (the production
        trie); otherwise FT0-shaped random targets of the same W."""
        from novic_tpu.models.guide_trie import build_guide_trie

        C = dcfg_g.token_length
        guide_np = None
        if d_ck is not None and d_ck.get("target_nouns") is not None:
            from novic_tpu.text.simple import make_test_tokenizer
            from novic_tpu.text.target import TargetTokenizer

            nouns = list(d_ck["target_nouns"])[int(d_ck.get("num_invalid_target_nouns", 0)):]
            tok = make_test_tokenizer(nouns)
            tc = d_ck["target_config"]
            if tok.vocab_size == (len(tc.compact_map) if tc.compact_map is not None else tok.vocab_size):
                tt = TargetTokenizer(tok, tc)
                ids, _ = tt.tokenize_targets_batched(nouns, batch_size=8192)
                guide_np = ids[(ids >= 0).all(axis=1)].astype(np.int32)[:, :C]
                if GUIDED is not None:  # explicit W: subset the real vocab
                    guide_np = guide_np[:guided_W]
        if guide_np is None:
            grng = np.random.default_rng(0)
            glengths = grng.integers(1, max(C - 1, 2), size=guided_W)
            gtoks = grng.integers(1, dcfg_g.vocab_size, size=(guided_W, C), dtype=np.int32)
            guide_np = np.where(np.arange(C)[None, :] < glengths[:, None],
                                gtoks, 0).astype(np.int32)
        # The trie rides as a jit ARGUMENT (a closure would inline the tables
        # as HLO constants into the remote compile request)
        return (jax.device_put(guide_np),
                jax.device_put(build_guide_trie(guide_np, dcfg_g.vocab_size, C - 1)))

    def measure(dcfg_m, d_params_m, guide_extra, with_greedy, with_latency):
        """e2e beam/greedy/latency rates for one decoder configuration."""
        decoder = PrefixedIterDecoder(cfg=dcfg_m)

        def one_batch_greedy(v_params, d_params, raw_images):
            embeds = embed_batch(v_params, raw_images)
            target, padding, _, _, _, _ = generate_greedy(decoder, d_params, embeds)
            # Tiny checksum: fetching it forces completion of the whole batch
            return (target.sum() + padding.sum()).astype(jnp.float32)

        def one_batch_beam(v_params, d_params, raw_images, *extra):
            # The reference's product default is GUIDED beam k=10
            # (ref infer.py:55); its 143 img/s baseline is beam decode
            # end-to-end (paper §4).
            embeds = embed_batch(v_params, raw_images)
            if extra:
                guide_ids, guide_trie = extra
                out = generate_beam(decoder, d_params, embeds, topk=10,
                                    cache_mode=BEAM_CACHE, guide_targets=guide_ids,
                                    guide_renorm=True, guide_trie=guide_trie)
            else:
                out = generate_beam(decoder, d_params, embeds, topk=10,
                                    cache_mode=BEAM_CACHE)
            target, padding = out[0], out[1]
            return (target.sum() + padding.sum()).astype(jnp.float32)

        def make_pipeline(one_batch, inner):
            @jax.jit
            def pipeline(v_params, d_params, raw_images, *extra):
                if inner <= 1:
                    return one_batch(v_params, d_params, raw_images, *extra)

                def body(i, acc):
                    # Vary the input per iteration so the body cannot be CSE'd
                    return acc + one_batch(v_params, d_params,
                                           raw_images + i.astype(jnp.uint8), *extra)

                return jax.lax.fori_loop(0, inner, body, jnp.float32(0))
            return pipeline

        def run(pipeline, raw, iters, inner, batch, *extra):
            return timeit(pipeline, (v_params, d_params_m, raw) + extra,
                          iters, inner, batch)

        out = {}
        out["beam"] = run(make_pipeline(one_batch_beam, INNER), raw_dev, ITERS, INNER,
                          BATCH, *guide_extra)
        if with_greedy:
            out["greedy"] = run(make_pipeline(one_batch_greedy, INNER), raw_dev,
                                ITERS, INNER, BATCH)
        if with_latency:
            # Single-image latency: K sequential B=1 pipelines on device;
            # per-image time is the p50 proxy (deterministic identical work;
            # excludes the ~32 ms axon-tunnel roundtrip a local host would not
            # pay). Reference: 26 ms/img single-image beam e2e (paper §4).
            lat_inner = 20 if not SMALL else 4
            lat_ips = run(make_pipeline(one_batch_beam, lat_inner), raw_dev[:1],
                          max(ITERS, 2), lat_inner, 1, *guide_extra)
            out["p50_ms"] = 1000.0 / lat_ips
        return out

    profile_dir = os.environ.get("BENCH_PROFILE", "")
    if profile_dir:
        jax.profiler.start_trace(profile_dir)

    # Headline: the PRODUCTION serving configuration (trained decoder if the
    # shipped checkpoint exists, auto-G token length, guided beam k=10 over
    # the full-vocabulary trie at B=256) vs the reference's 143 img/s
    # batched-beam baseline (paper §4).
    ck_dict = ck if weights else None
    guide_extra = make_guide(dcfg, ck_dict) if guided_W else ()
    prod = measure(dcfg, d_params, guide_extra, with_greedy=True, with_latency=True)

    suffix = ""
    if weights:
        suffix += "_trained"
    suffix += f"_G{dcfg.token_length}"
    if guided_W:
        suffix += f"_guided{guide_extra[0].shape[0]}"
    result = {
        # b256 in the default name; a BENCH_BATCH override names its true batch
        "metric": f"end_to_end_images_per_sec_b{BATCH}_siglip_b16_beam_k10{suffix}",
        "value": round(prod["beam"], 2),
        "unit": "img/s",
        "vs_baseline": round(prod["beam"] / BASELINE_IMG_PER_SEC, 3),
        "extra": {
            f"greedy_img_per_sec_b{BATCH}": round(prod["greedy"], 2),
            "greedy_vs_baseline": round(prod["greedy"] / BASELINE_IMG_PER_SEC, 3),
            "single_image_p50_ms_beam_k10": round(prod["p50_ms"], 3),
            "single_image_p50_vs_baseline_26ms": round(26.0 / prod["p50_ms"], 3),
            "decoder_token_length": dcfg.token_length,
            "decoder_weights": os.path.basename(weights) if weights else "random",
            "guide_targets": int(guide_extra[0].shape[0]) if guided_W else 0,
        },
    }

    if profile_dir:
        jax.profiler.stop_trace()  # trace covers only the production config
        profile_dir = ""

    if SECONDARY and not SMALL:
        # Like-for-like with the rounds 1-3 headline: G=12, random decoder
        # weights, unguided beam (continuity of the BENCH_r*.json series)
        dcfg2 = DecoderModelConfig(embed_dim=768, vocab_size=4096, token_length=12,
                                   hidden_dim=512, feedfwd_scale="1/4", mlp_seq_len=4,
                                   num_layers=6, num_heads=8, compute_dtype="bfloat16")
        decoder2 = PrefixedIterDecoder(cfg=dcfg2)
        d_params2 = jax.jit(decoder2.init)(
            {"params": kd}, jnp.zeros((1, dcfg2.embed_dim), jnp.float32),
            jnp.zeros((1, dcfg2.token_length), jnp.int32))["params"]
        legacy = measure(dcfg2, d_params2, (), with_greedy=False, with_latency=False)
        result["extra"]["legacy_unguided_G12_random_beam_img_per_sec"] = \
            round(legacy["beam"], 2)
        result["extra"]["legacy_vs_baseline"] = round(legacy["beam"] / BASELINE_IMG_PER_SEC, 3)

    if profile_dir:
        jax.profiler.stop_trace()

    print(json.dumps(result))


if __name__ == "__main__":
    main()
