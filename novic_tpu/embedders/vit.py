"""CLIP-family dual-encoder towers (vision ViT + text transformer) in flax.

Covers the architectures behind the reference's three embedder backends
(reference embedders.py: OpenAIEmbedder :438-594, OpenCLIPEmbedder :596-764,
TransformersEmbedder :766-907) — CLIP (OpenAI/LAION/DFN) and SigLIP variants —
as one configurable pair of towers:

* CLIP vision:  patch conv (no bias) + class token + pre-LN + post-LN on CLS + linear projection
* SigLIP vision: patch conv (bias) + no class token + post-LN + MAP attention-pooling head
* CLIP text:   causal transformer, pooled at the end-of-text token, linear projection
* SigLIP text: bidirectional transformer, pooled at the last token, linear head (with bias)

TPU-first engineering:
* All heavy matmuls run through one ``tower_dense`` helper with a configurable
  compute dtype — bfloat16 by default on the MXU, with float32 layernorms and
  a float32 final projection (embeddings are unit-norm float32, the invariant
  the whole pipeline relies on, ref embedders.py:583,594,753,764).
* Static shapes throughout; patchify is a reshape+matmul (not a conv) so XLA
  maps it straight onto the MXU.
* Parameters are stored in torch layout (out,in) making HF checkpoint
  conversion a direct copy (novic_tpu.embedders.convert).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


_ACTS = {
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "gelu_tanh": lambda x: jax.nn.gelu(x, approximate=True),
    "quick_gelu": quick_gelu,
    "swish": jax.nn.silu,  # EfficientNet/ALIGN (HF ACT2FN['swish'] = SiLU)
}


@dataclasses.dataclass(frozen=True)
class VisionTowerConfig:
    image_size: int = 224
    patch_size: int = 32
    width: int = 768
    layers: int = 12
    heads: int = 12
    mlp_ratio: float = 4.0
    embed_dim: int = 512           # output projection dim (CLIP joint space)
    act: str = "quick_gelu"        # gelu | gelu_tanh | quick_gelu
    use_class_token: bool = True   # CLIP yes, SigLIP no
    patch_bias: bool = False       # CLIP no, SigLIP yes
    pre_ln: bool = True            # CLIP ln_pre, SigLIP none
    pool: str = "cls"              # cls (CLIP) | map (SigLIP attention pooling)
    proj_bias: bool = False        # projection bias (SigLIP head uses bias inside MAP)
    layer_norm_eps: float = 1e-5   # CLIP 1e-5, SigLIP 1e-6
    compute_dtype: str = "bfloat16"
    use_pallas_attention: bool = False  # fused VMEM attention kernel (novic_tpu.ops.attention)
    # Measured on TPU (B=256, ViT-B/16): fusing q/k/v into one (3E,E) matmul is
    # 1.77x SLOWER than three separate matmuls (171 vs 97 ms/batch) — the
    # (B,S,3,H,hd) output layout forces copies that outweigh re-reading x.
    fuse_qkv: bool = False
    # Attention formulation: einsum (bhqk MXU batched matmuls, default) | vpu
    # (head-minor broadcast-reduce, the decoder's small-S winner — measured at
    # tower shapes in exp/tower_attn_vpu.py) | qkh (head-minor scores via
    # einsum, MXU contraction without the bhqk layout transposes).
    attn_impl: str = "einsum"
    # Quantized serving mode for the block matmuls (q/k/v/o + MLP):
    # "" (off) | "int8" (W8A8 via lax.dot_general) | "int8:pallas" (tiled
    # Mosaic kernel, novic_tpu/ops/int8_matmul.py). Per-output-channel weight
    # scales + dynamic per-row activation scales, int32 MXU accumulate.
    # Patch embed, attention einsums and the final projection stay unquantized.
    quant: str = ""

    @property
    def grid(self) -> int:
        # Floor, matching strided-conv patch embedding: e.g. SO400M-14@384
        # covers 27x27 patches = 378 px, dropping the trailing 6 px exactly
        # like the HF/torch Conv2d(stride=patch) does.
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid * self.grid

    @property
    def mlp_dim(self) -> int:
        return int(self.width * self.mlp_ratio)


@dataclasses.dataclass(frozen=True)
class TextTowerConfig:
    context_length: int = 77
    vocab_size: int = 49408
    width: int = 512
    layers: int = 12
    heads: int = 8
    mlp_ratio: float = 4.0
    embed_dim: int = 512
    act: str = "quick_gelu"
    causal: bool = True            # CLIP yes, SigLIP no
    pool: str = "argmax"           # argmax (CLIP eot = highest token id) | last (SigLIP)
    proj_bias: bool = False        # CLIP text_projection no bias; SigLIP head yes
    layer_norm_eps: float = 1e-5
    compute_dtype: str = "bfloat16"
    use_pallas_attention: bool = False  # fused VMEM attention kernel (novic_tpu.ops.attention)
    fuse_qkv: bool = False         # see VisionTowerConfig.fuse_qkv — measured slower
    quant: str = ""                # see VisionTowerConfig.quant

    @property
    def mlp_dim(self) -> int:
        return int(self.width * self.mlp_ratio)


def _precision_for(compute_dtype) -> str | None:
    # float32 compute must be exact f32 (matches torch); this backend's default
    # matmul precision is a single bf16 pass. bf16 inputs are single-pass anyway.
    return "highest" if jnp.dtype(compute_dtype) == jnp.float32 else None


def tower_dense(x, w, b, compute_dtype, quant: str = ""):
    """x @ w.T + b with torch-layout w; inputs cast to compute dtype, f32 accum.

    quant="int8"/"int8:pallas": W8A8 quantized path (ops/int8_matmul.py) —
    weights are quantized per-output-channel on the fly (one extra elementwise
    pass over w, negligible next to the activation matmul at serving batch
    sizes), activations per-row dynamically."""
    if quant:
        kind, _, impl = quant.partition(":")
        if kind != "int8":
            raise ValueError(f"Unknown tower quant mode: {quant}")
        from novic_tpu.ops.int8_matmul import int8_dense, quantize_weight

        wq, sw = quantize_weight(w)
        return int8_dense(x, wq, sw, b, impl=impl or "xla")
    dt = jnp.dtype(compute_dtype)
    y = jax.lax.dot_general(x.astype(dt), w.astype(dt), (((x.ndim - 1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=_precision_for(dt))
    if b is not None:
        y = y + b
    return y


def f32_layer_norm(x, weight, bias, eps, out_dtype=jnp.float32):
    """LayerNorm computed in float32 (stability), emitted in out_dtype (the
    residual stream runs in the compute dtype — matching the reference's
    fp16/bf16 autocast inference, ref embedders.py:131-143)."""
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    return ((x - mean) * jax.lax.rsqrt(var + eps) * weight + bias).astype(out_dtype)


class TowerAttention(nn.Module):
    """Standard biased MHA (separate q/k/v projections, HF layout)."""

    width: int
    heads: int
    compute_dtype: str
    use_pallas: bool = False
    fuse_qkv: bool = False
    attn_impl: str = "einsum"
    quant: str = ""

    @nn.compact
    def __call__(self, x: jnp.ndarray, attn_bias: Optional[jnp.ndarray] = None,
                 kv: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        E, H = self.width, self.heads
        hd = E // H
        dt = self.compute_dtype
        init = nn.initializers.normal(stddev=E ** -0.5)
        wq = self.param("q_proj_weight", init, (E, E))
        bq = self.param("q_proj_bias", nn.initializers.zeros, (E,))
        wk = self.param("k_proj_weight", init, (E, E))
        bk = self.param("k_proj_bias", nn.initializers.zeros, (E,))
        wv = self.param("v_proj_weight", init, (E, E))
        bv = self.param("v_proj_bias", nn.initializers.zeros, (E,))
        wo = self.param("out_proj_weight", init, (E, E))
        bo = self.param("out_proj_bias", nn.initializers.zeros, (E,))

        src = x if kv is None else kv
        B, Sq = x.shape[0], x.shape[1]
        Sk = src.shape[1]
        if self.fuse_qkv and kv is None:
            # Self-attention: one (3E,E) projection reads x from HBM once.
            # Params stay in HF layout (checkpoint conversion is a direct copy);
            # the concat is a cheap device-side reshuffle of 3*E*E weights.
            wqkv = jnp.concatenate([wq, wk, wv], axis=0)
            bqkv = jnp.concatenate([bq, bk, bv], axis=0)
            qkv = tower_dense(x, wqkv, bqkv, dt, self.quant).reshape(B, Sq, 3, H, hd)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        else:
            q = tower_dense(x, wq, bq, dt, self.quant).reshape(B, Sq, H, hd)
            k = tower_dense(src, wk, bk, dt, self.quant).reshape(B, Sk, H, hd)
            v = tower_dense(src, wv, bv, dt, self.quant).reshape(B, Sk, H, hd)
        if self.use_pallas and kv is None:
            # Fused VMEM attention kernel (self-attention only; the MAP head's
            # 1-query cross-attention stays on the XLA path)
            from novic_tpu.ops.attention import fused_attention

            sq_bias = None
            if attn_bias is not None:
                sq_bias = jnp.broadcast_to(attn_bias, (Sq, Sk)).astype(jnp.float32)
            out = fused_attention(q.astype(jnp.float32), k.astype(jnp.float32),
                                  v.astype(jnp.float32), sq_bias)
            return tower_dense(out.reshape(B, Sq, E), wo, bo, dt, self.quant)
        scale = 1.0 / math.sqrt(hd)
        # Score tensor + softmax chain stay in the compute dtype: at B=256
        # ViT-B/16 the (B,H,S,S) scores are the tower's largest intermediate
        # (472 MB in f32), and the bf16 chain measured 97.0 -> 86.2 ms/batch on
        # TPU (f32 softmax math measured 0 accuracy benefit: unit-embedding
        # cosine vs f32 compute is 0.99998 either way, max 0.36 deg, while its
        # cast chain cost ~8 ms). The MXU still accumulates matmuls in f32.
        # bf16 spans the f32 exponent range, so the -1e30 causal bias is safe.
        dtj = jnp.dtype(dt)
        if self.attn_impl == "vpu":
            # Head-minor broadcast-reduce (no layout transposes; hd reduced on
            # the VPU) — the decoder's small-S winner, measured at tower
            # shapes in exp/tower_attn_vpu.py
            scores = ((q * scale).astype(dtj)[:, :, None] * k.astype(dtj)[:, None]).sum(-1)
            if attn_bias is not None:
                scores = scores + attn_bias.astype(dtj)[..., None]
            attn = jax.nn.softmax(scores, axis=2)
            out = (attn[..., None] * v.astype(dtj)[:, None]).sum(axis=2)
            return tower_dense(out.reshape(B, Sq, E).astype(jnp.float32), wo, bo, dt,
                               self.quant)
        if self.attn_impl == "qkh":
            # Head-minor scores via MXU einsum: same contraction, no bhqk
            # transposes of q/k/v
            scores = jnp.einsum("bqhd,bkhd->bqkh", (q * scale).astype(dtj),
                                k.astype(dtj), preferred_element_type=dtj,
                                precision=_precision_for(dt))
            if attn_bias is not None:
                scores = scores + attn_bias.astype(dtj)[..., None]
            attn = jax.nn.softmax(scores, axis=2)
            out = jnp.einsum("bqkh,bkhd->bqhd", attn, v.astype(dtj),
                             preferred_element_type=jnp.float32,
                             precision=_precision_for(dt))
            return tower_dense(out.reshape(B, Sq, E), wo, bo, dt, self.quant)
        scores = jnp.einsum("bqhd,bkhd->bhqk", (q * scale).astype(dtj),
                            k.astype(dtj), preferred_element_type=dtj,
                            precision=_precision_for(dt))
        if attn_bias is not None:
            scores = scores + attn_bias.astype(dtj)
        attn = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn,
                         v.astype(dtj), preferred_element_type=jnp.float32,
                         precision=_precision_for(dt))
        return tower_dense(out.reshape(B, Sq, E), wo, bo, dt, self.quant)


class TowerBlock(nn.Module):
    """Pre-LN residual block (HF CLIP/SigLIP encoder layer)."""

    width: int
    heads: int
    mlp_dim: int
    act: str
    eps: float
    compute_dtype: str
    use_pallas: bool = False
    fuse_qkv: bool = False
    attn_impl: str = "einsum"
    quant: str = ""

    @nn.compact
    def __call__(self, x: jnp.ndarray, attn_bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        E = self.width
        dt = jnp.dtype(self.compute_dtype)
        n1w = self.param("norm1_weight", nn.initializers.ones, (E,))
        n1b = self.param("norm1_bias", nn.initializers.zeros, (E,))
        n2w = self.param("norm2_weight", nn.initializers.ones, (E,))
        n2b = self.param("norm2_bias", nn.initializers.zeros, (E,))
        w1 = self.param("fc1_weight", nn.initializers.normal(stddev=E ** -0.5), (self.mlp_dim, E))
        b1 = self.param("fc1_bias", nn.initializers.zeros, (self.mlp_dim,))
        w2 = self.param("fc2_weight", nn.initializers.normal(stddev=self.mlp_dim ** -0.5),
                        (E, self.mlp_dim))
        b2 = self.param("fc2_bias", nn.initializers.zeros, (E,))
        act = _ACTS[self.act]

        # Residual stream in the compute dtype; layernorms in f32 internally
        x = x.astype(dt)
        h = f32_layer_norm(x, n1w, n1b, self.eps, out_dtype=dt)
        attn_out = TowerAttention(width=E, heads=self.heads, compute_dtype=self.compute_dtype,
                                  use_pallas=self.use_pallas, fuse_qkv=self.fuse_qkv,
                                  attn_impl=self.attn_impl, quant=self.quant,
                                  name="attn")(h, attn_bias)
        x = x + attn_out.astype(dt)
        h = f32_layer_norm(x, n2w, n2b, self.eps, out_dtype=dt)
        h = tower_dense(h, w1, b1, self.compute_dtype, self.quant).astype(dt)
        h = act(h)
        h = tower_dense(h, w2, b2, self.compute_dtype, self.quant)
        return x + h.astype(dt)


class VisionTransformer(nn.Module):
    """ViT image tower. Input: (B, H, W, 3) float32 already normalized
    (see novic_tpu.embedders.preprocess). Output: (B, embed_dim) float32
    (NOT normalized; the embedder normalizes, ref embedders.py:594,764)."""

    cfg: VisionTowerConfig

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        E = cfg.width
        B = images.shape[0]
        P = cfg.patch_size
        G = cfg.grid
        assert images.shape[1] == images.shape[2] == cfg.image_size, \
            f"Expected {cfg.image_size}px square images, got {images.shape}"

        # Patchify as reshape + matmul: (B,G,P,G,P,3) → (B,G*G,P*P*3) @ W.T
        patch_w = self.param("patch_weight", nn.initializers.normal(stddev=E ** -0.5),
                             (E, P * P * 3))
        patch_b = self.param("patch_bias", nn.initializers.zeros, (E,)) if cfg.patch_bias else None
        if cfg.image_size != G * P:
            # Conv-floor semantics: a strided conv drops trailing pixels when
            # image_size is not a patch multiple (e.g. SO400M-14@384 -> 378)
            images = images[:, :G * P, :G * P]
        x = images.reshape(B, G, P, G, P, 3)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, G * G, P * P * 3)
        x = tower_dense(x, patch_w, patch_b, cfg.compute_dtype)  # (B, N, E)

        if cfg.use_class_token:
            cls = self.param("class_embedding", nn.initializers.normal(stddev=E ** -0.5), (E,))
            cls_tok = jnp.broadcast_to(cls[None, None, :], (B, 1, E))
            x = jnp.concatenate([cls_tok, x.astype(cls_tok.dtype)], axis=1)
        pos = self.param("pos_embedding", nn.initializers.normal(stddev=E ** -0.5),
                         (x.shape[1], E))
        x = x + pos

        if cfg.pre_ln:
            plw = self.param("pre_ln_weight", nn.initializers.ones, (E,))
            plb = self.param("pre_ln_bias", nn.initializers.zeros, (E,))
            x = f32_layer_norm(x, plw, plb, cfg.layer_norm_eps)

        for i in range(cfg.layers):
            x = TowerBlock(width=E, heads=cfg.heads, mlp_dim=cfg.mlp_dim, act=cfg.act,
                           eps=cfg.layer_norm_eps, compute_dtype=cfg.compute_dtype,
                           use_pallas=cfg.use_pallas_attention, fuse_qkv=cfg.fuse_qkv,
                           attn_impl=cfg.attn_impl, quant=cfg.quant,
                           name=f"blocks_{i}")(x)

        postw = self.param("post_ln_weight", nn.initializers.ones, (E,))
        postb = self.param("post_ln_bias", nn.initializers.zeros, (E,))

        if cfg.pool == "cls":
            pooled = f32_layer_norm(x[:, 0, :], postw, postb, cfg.layer_norm_eps)
            proj_w = self.param("proj_weight", nn.initializers.normal(stddev=E ** -0.5),
                                (cfg.embed_dim, E))
            proj_b = (self.param("proj_bias", nn.initializers.zeros, (cfg.embed_dim,))
                      if cfg.proj_bias else None)
            return tower_dense(pooled, proj_w, proj_b, "float32")
        elif cfg.pool == "avg":
            # CLIPA: global-average pool over PATCH tokens (class token kept in
            # the sequence but excluded from the mean), final LN applied AFTER
            # pooling (open_clip VisionTransformer pool_type='avg' +
            # final_ln_after_pool=true, the CLIPA model-config combination)
            tokens = x[:, 1:, :] if cfg.use_class_token else x
            pooled = jnp.mean(tokens.astype(jnp.float32), axis=1)
            pooled = f32_layer_norm(pooled, postw, postb, cfg.layer_norm_eps)
            proj_w = self.param("proj_weight", nn.initializers.normal(stddev=E ** -0.5),
                                (cfg.embed_dim, E))
            proj_b = (self.param("proj_bias", nn.initializers.zeros, (cfg.embed_dim,))
                      if cfg.proj_bias else None)
            return tower_dense(pooled, proj_w, proj_b, "float32")
        elif cfg.pool == "map":
            # SigLIP: post-LN over all tokens, then MAP attention-pooling head
            x = f32_layer_norm(x, postw, postb, cfg.layer_norm_eps)
            probe = self.param("map_probe", nn.initializers.normal(stddev=E ** -0.5), (1, 1, E))
            probe_b = jnp.broadcast_to(probe, (B, 1, E))
            attn_out = TowerAttention(width=E, heads=cfg.heads, compute_dtype=cfg.compute_dtype,
                                      name="map_attn")(probe_b, kv=x)
            mlw = self.param("map_ln_weight", nn.initializers.ones, (E,))
            mlb = self.param("map_ln_bias", nn.initializers.zeros, (E,))
            w1 = self.param("map_fc1_weight", nn.initializers.normal(stddev=E ** -0.5),
                            (cfg.mlp_dim, E))
            b1 = self.param("map_fc1_bias", nn.initializers.zeros, (cfg.mlp_dim,))
            w2 = self.param("map_fc2_weight", nn.initializers.normal(stddev=cfg.mlp_dim ** -0.5),
                            (E, cfg.mlp_dim))
            b2 = self.param("map_fc2_bias", nn.initializers.zeros, (E,))
            h = f32_layer_norm(attn_out, mlw, mlb, cfg.layer_norm_eps)
            h = tower_dense(h, w1, b1, cfg.compute_dtype)
            h = _ACTS[cfg.act](h)
            h = tower_dense(h, w2, b2, cfg.compute_dtype)
            out = (attn_out + h)[:, 0, :]
            if cfg.embed_dim != E:
                proj_w = self.param("proj_weight", nn.initializers.normal(stddev=E ** -0.5),
                                    (cfg.embed_dim, E))
                return tower_dense(out, proj_w, None, "float32")
            return out.astype(jnp.float32)
        else:
            raise ValueError(f"Unknown vision pool: {cfg.pool}")


class TextTransformer(nn.Module):
    """Text tower. Input: (B, S) int token ids padded to context length.
    Output: (B, embed_dim) float32 (unnormalized)."""

    cfg: TextTowerConfig

    @nn.compact
    def __call__(self, token_ids: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        E = cfg.width
        B, S = token_ids.shape
        tok_table = self.param("token_embedding", nn.initializers.normal(stddev=0.02),
                               (cfg.vocab_size, E))
        pos_table = self.param("pos_embedding", nn.initializers.normal(stddev=0.01),
                               (cfg.context_length, E))
        x = jnp.take(tok_table, token_ids, axis=0) + pos_table[:S]

        attn_bias = None
        if cfg.causal:
            i = jnp.arange(S)[:, None]
            j = jnp.arange(S)[None, :]
            attn_bias = jnp.where(j <= i, 0.0, -1e30).astype(jnp.float32)

        for li in range(cfg.layers):
            x = TowerBlock(width=E, heads=cfg.heads, mlp_dim=cfg.mlp_dim, act=cfg.act,
                           eps=cfg.layer_norm_eps, compute_dtype=cfg.compute_dtype,
                           use_pallas=cfg.use_pallas_attention, fuse_qkv=cfg.fuse_qkv,
                           quant=cfg.quant, name=f"blocks_{li}")(x, attn_bias)

        fw = self.param("final_ln_weight", nn.initializers.ones, (E,))
        fb = self.param("final_ln_bias", nn.initializers.zeros, (E,))
        x = f32_layer_norm(x, fw, fb, cfg.layer_norm_eps)

        if cfg.pool == "argmax":
            # CLIP: pool at the end-of-text token = highest token id in sequence
            idx = jnp.argmax(token_ids, axis=1)
            pooled = x[jnp.arange(B), idx]
        elif cfg.pool == "last":
            pooled = x[:, -1, :]
        else:
            raise ValueError(f"Unknown text pool: {cfg.pool}")

        proj_w = self.param("proj_weight", nn.initializers.normal(stddev=E ** -0.5),
                            (cfg.embed_dim, E))
        proj_b = (self.param("proj_bias", nn.initializers.zeros, (cfg.embed_dim,))
                  if cfg.proj_bias else None)
        return tower_dense(pooled, proj_w, proj_b, "float32")
