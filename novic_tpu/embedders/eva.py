"""EVA02 CLIP vision towers (rotary pos-emb + SwiGLU + sub-LN ViT) in flax.

The reference reaches the EVA02 family through open_clip
(reference embedders.py:596-764 OpenCLIPEmbedder; supported-spec rows
`openclip:timm/eva02_{base,large,enormous[_plus]}_*_clip_224.*`, reference
config/train.yaml:105,109,119,129). open_clip delegates the visual trunk to
timm's `Eva` class; the text towers are stock open_clip CLIP text
transformers (handled by embedders/vit.py TextTransformer).

Architecture facts replicated from timm's eva.py (EvaAttention/EvaBlock/Eva)
and open_clip's EVA02 model configs — neither package is installed in this
environment, so these facts are transcribed from their public sources rather
than diffed against them live. The uncertainty ledger is PARITY.md ("EVA02
provenance"); the independent torch mirror in tests/test_eva_parity.py pins
the JAX implementation against a second implementation of the same spec, and
`exp/validate_released.py` closes true weight-level parity the day real
checkpoints are on disk (the converter fails loudly on any key mismatch).

Block structure (base/large "EVA02" variants):
* separate q/k/v projections; q and v have biases, k does NOT
* 2D rotary position embedding applied to q and k of every head, skipping
  the class token; axis frequencies: head_dim//4 bands at temperature 1e4,
  grid coordinates rescaled by ref_feat_shape/feat_shape
* attention output passes an inner LayerNorm (sub-LN) before the out proj
* MLP is SwiGLU: silu(fc1_g(x)) * fc1_x(x) → LayerNorm(hidden) → fc2
The enormous (EVA-CLIP-E) variant is plain pre-LN ViT blocks inside the same
class: fused qkv with a zero k-bias, no rope, no sub-LN, GELU MLP.

TPU-first engineering mirrors embedders/vit.py: bf16 matmuls with f32
accumulation via tower_dense, f32 layernorms, static shapes, rope tables
precomputed as constants (grid is static), torch-layout (out, in) weights.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from novic_tpu.embedders.vit import _ACTS, _precision_for, f32_layer_norm, tower_dense


@dataclasses.dataclass(frozen=True)
class EvaVisionConfig:
    image_size: int = 224
    patch_size: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    mlp_hidden: int = 2048         # explicit: int(width * mlp_ratio), e.g. int(1024*8/3)=2730
    embed_dim: int = 512           # CLIP joint space (timm head / open_clip proj)
    use_rope: bool = True
    ref_feat_shape: int = 16       # rope grid rescale target (timm ref_feat_shape)
    swiglu: bool = True            # SwiGLU MLP with inner LN (scale_mlp)
    inner_attn_norm: bool = True   # sub-LN on attention output (scale_attn_inner)
    qkv_fused: bool = False        # enormous: TORCH checkpoint stores fused qkv
                                   # (k-bias a fixed zero); converter splits it —
                                   # flax params are always separate q/k/v
    act: str = "gelu"              # plain-MLP act for the enormous variant
    layer_norm_eps: float = 1e-6
    compute_dtype: str = "bfloat16"

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def mlp_dim(self) -> int:      # TP divisibility checks (parallel/tp.py)
        return self.mlp_hidden


def rope_cat_table(grid: int, ref: int, head_dim: int) -> np.ndarray:
    """(N, 2*head_dim) [sin | cos] rotary table over the patch grid.

    timm RotaryEmbeddingCat semantics (pos_embed_sincos.py): head_dim//4
    frequency bands per spatial axis at temperature 10000 (step 1), grid
    coordinates rescaled to ref_feat_shape, per-axis angles interleave-
    repeated ×2 so adjacent channel pairs share an angle, axis 0 (rows)
    occupying the first head_dim//2 channels.
    """
    num_bands = head_dim // 4
    bands = 1.0 / (10000.0 ** (np.arange(num_bands, dtype=np.float64) / num_bands))
    t = np.arange(grid, dtype=np.float64)
    if ref:
        t = t / grid * ref
    yy, xx = np.meshgrid(t, t, indexing="ij")               # row-major (y, x)
    pos = np.stack([yy.reshape(-1), xx.reshape(-1)], axis=-1)  # (N, 2)
    ang = pos[:, :, None] * bands                            # (N, 2, bands)
    ang = np.repeat(ang.reshape(pos.shape[0], -1), 2, axis=-1)  # (N, head_dim)
    return np.concatenate([np.sin(ang), np.cos(ang)], axis=-1).astype(np.float32)


def apply_rope_cat(x: jnp.ndarray, table: jnp.ndarray) -> jnp.ndarray:
    """x: (B, N, H, hd); table: (N, 2*hd) [sin | cos]. Pair rotation
    (x0, x1) → (x0 cos − x1 sin, x1 cos + x0 sin) via rot(x) = (−x1, x0)."""
    hd = x.shape[-1]
    sin = table[:, :hd][None, :, None, :]
    cos = table[:, hd:][None, :, None, :]
    x2 = x.reshape(x.shape[:-1] + (hd // 2, 2))
    rot = jnp.stack([-x2[..., 1], x2[..., 0]], axis=-1).reshape(x.shape)
    return x * cos + rot * sin


class EvaBlock(nn.Module):
    cfg: EvaVisionConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, rope: "jnp.ndarray | None") -> jnp.ndarray:
        cfg = self.cfg
        E, H = cfg.width, cfg.heads
        hd = E // H
        dt = jnp.dtype(cfg.compute_dtype)
        eps = cfg.layer_norm_eps
        init = nn.initializers.normal(stddev=E ** -0.5)
        B, S = x.shape[0], x.shape[1]

        n1w = self.param("norm1_weight", nn.initializers.ones, (E,))
        n1b = self.param("norm1_bias", nn.initializers.zeros, (E,))
        h = f32_layer_norm(x, n1w, n1b, eps, out_dtype=dt)

        # Always three separate (E, E) projections, k without bias (timm
        # EvaAttention; for qkv_fused archs timm's k bias is a non-trainable
        # zero and the converter splits the fused (3E, E) weight row-wise).
        # Deliberately NOT one fused (3E, E) matmul: XLA pays layout copies
        # slicing the fused output (measured 1.77x slower, BENCH_NOTES
        # "Compute-time QKV fusion"), and under tensor-parallel serving a
        # contiguously-sharded fused weight would split shards across the
        # q/k/v boundary, forcing per-block reshard collectives
        # (parallel/tp.py column-parallel layout).
        wq = self.param("q_proj_weight", init, (E, E))
        bq = self.param("q_proj_bias", nn.initializers.zeros, (E,))
        wk = self.param("k_proj_weight", init, (E, E))
        wv = self.param("v_proj_weight", init, (E, E))
        bv = self.param("v_proj_bias", nn.initializers.zeros, (E,))
        q = tower_dense(h, wq, bq, cfg.compute_dtype).reshape(B, S, H, hd)
        k = tower_dense(h, wk, None, cfg.compute_dtype).reshape(B, S, H, hd)
        v = tower_dense(h, wv, bv, cfg.compute_dtype).reshape(B, S, H, hd)

        if rope is not None:
            # rope covers patch tokens only; the class token (index 0) passes
            # through unrotated (timm eva.py EvaAttention.forward)
            q = jnp.concatenate([q[:, :1], apply_rope_cat(q[:, 1:], rope)], axis=1)
            k = jnp.concatenate([k[:, :1], apply_rope_cat(k[:, 1:], rope)], axis=1)

        dtj = jnp.dtype(cfg.compute_dtype)
        scale = 1.0 / math.sqrt(hd)
        scores = jnp.einsum("bqhd,bkhd->bhqk", (q * scale).astype(dtj), k.astype(dtj),
                            preferred_element_type=dtj,
                            precision=_precision_for(cfg.compute_dtype))
        attn = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v.astype(dtj),
                         preferred_element_type=jnp.float32,
                         precision=_precision_for(cfg.compute_dtype)).reshape(B, S, E)
        if cfg.inner_attn_norm:
            aw = self.param("attn_norm_weight", nn.initializers.ones, (E,))
            ab = self.param("attn_norm_bias", nn.initializers.zeros, (E,))
            out = f32_layer_norm(out, aw, ab, eps, out_dtype=dt)
        wo = self.param("out_proj_weight", init, (E, E))
        bo = self.param("out_proj_bias", nn.initializers.zeros, (E,))
        x = x.astype(dt) + tower_dense(out, wo, bo, cfg.compute_dtype).astype(dt)

        n2w = self.param("norm2_weight", nn.initializers.ones, (E,))
        n2b = self.param("norm2_bias", nn.initializers.zeros, (E,))
        h = f32_layer_norm(x, n2w, n2b, eps, out_dtype=dt)
        M = cfg.mlp_hidden
        if cfg.swiglu:
            wg = self.param("fc1_g_weight", init, (M, E))
            bg = self.param("fc1_g_bias", nn.initializers.zeros, (M,))
            wx = self.param("fc1_x_weight", init, (M, E))
            bx = self.param("fc1_x_bias", nn.initializers.zeros, (M,))
            mw = self.param("mlp_norm_weight", nn.initializers.ones, (M,))
            mb = self.param("mlp_norm_bias", nn.initializers.zeros, (M,))
            g = jax.nn.silu(tower_dense(h, wg, bg, cfg.compute_dtype))
            hh = g * tower_dense(h, wx, bx, cfg.compute_dtype)
            hh = f32_layer_norm(hh, mw, mb, eps, out_dtype=dt)
        else:
            w1 = self.param("fc1_weight", init, (M, E))
            b1 = self.param("fc1_bias", nn.initializers.zeros, (M,))
            hh = _ACTS[cfg.act](tower_dense(h, w1, b1, cfg.compute_dtype).astype(dt))
        w2 = self.param("fc2_weight", nn.initializers.normal(stddev=M ** -0.5), (E, M))
        b2 = self.param("fc2_bias", nn.initializers.zeros, (E,))
        return x + tower_dense(hh, w2, b2, cfg.compute_dtype).astype(dt)


class EvaVisionTransformer(nn.Module):
    """EVA02 image tower. Input: (B, S, S, 3) float32 normalized images.
    Output: (B, embed_dim) float32 (unnormalized; the embedder normalizes)."""

    cfg: EvaVisionConfig

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        E, P, G = cfg.width, cfg.patch_size, cfg.grid
        B = images.shape[0]
        assert images.shape[1] == images.shape[2] == cfg.image_size, \
            f"Expected {cfg.image_size}px square images, got {images.shape}"

        patch_w = self.param("patch_weight", nn.initializers.normal(stddev=E ** -0.5),
                             (E, P * P * 3))
        patch_b = self.param("patch_bias", nn.initializers.zeros, (E,))
        x = images[:, :G * P, :G * P].reshape(B, G, P, G, P, 3)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, G * G, P * P * 3)
        x = tower_dense(x, patch_w, patch_b, cfg.compute_dtype)

        cls = self.param("class_embedding", nn.initializers.normal(stddev=E ** -0.5), (E,))
        x = jnp.concatenate([jnp.broadcast_to(cls[None, None, :], (B, 1, E)),
                             x.astype(jnp.float32)], axis=1)
        pos = self.param("pos_embedding", nn.initializers.normal(stddev=E ** -0.5),
                         (G * G + 1, E))
        x = x + pos

        rope = None
        if cfg.use_rope:
            rope = jnp.asarray(rope_cat_table(G, cfg.ref_feat_shape, E // cfg.heads))
        for i in range(cfg.layers):
            x = EvaBlock(cfg=cfg, name=f"blocks_{i}")(x, rope)

        fw = self.param("final_norm_weight", nn.initializers.ones, (E,))
        fb = self.param("final_norm_bias", nn.initializers.zeros, (E,))
        pooled = f32_layer_norm(x, fw, fb, cfg.layer_norm_eps)[:, 0, :]
        hw = self.param("head_weight", nn.initializers.normal(stddev=E ** -0.5),
                        (cfg.embed_dim, E))
        hb = self.param("head_bias", nn.initializers.zeros, (cfg.embed_dim,))
        return tower_dense(pooled, hw, hb, "float32")
