"""ALIGN dual-encoder towers (EfficientNet-B7 vision + BERT text) in flax.

The reference reaches ALIGN through its generic transformers backend
(reference embedders.py:766-907 TransformersEmbedder; the supported-spec
table lists `transformers:kakaobrain/align-base` at embed dim 640, reference
config/train.yaml:135). The semantics replicated here are those of the HF
`AlignModel` (transformers models/align/modeling_align.py):

* vision  = EfficientNet-B7 trunk (width 2.0, depth 3.1) WITHOUT a top conv:
  the last block emits round_filters(320)=640 channels, global mean pool over
  the spatial map IS the image embedding (no projection;
  modeling_align.py AlignModel.get_image_features → vision pooler_output).
* text    = BERT-base post-LN encoder; the text embedding is the [CLS]
  last-hidden-state (NOT the tanh pooler) through Linear(768→640, bias)
  (modeling_align.py get_text_features: text_outputs[0][:, 0, :] →
  text_projection).

TPU-first engineering:
* NHWC layout throughout (TPU-native); conv kernels stored HWIO.
* BatchNorms are FOLDED into per-channel (scale, bias) at conversion time —
  the towers are frozen/inference-only, so y = gamma*(x-mean)/sqrt(var+eps)+beta
  collapses to y = x*scale + bias, removing 2 ops + 2 params per BN site.
* Convs run in the configurable compute dtype (bfloat16 on the MXU by
  default) with float32 accumulation, like the ViT towers (embedders/vit.py).
* Static block plan: the B7 stage/repeat/stride topology is resolved to a
  static tuple at trace time (round_filters/round_repeats math identical to
  HF modeling_align.py:126-138,449-484) — no dynamic shapes under jit.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from novic_tpu.embedders.vit import _ACTS, _precision_for, f32_layer_norm, tower_dense


@dataclasses.dataclass(frozen=True)
class AlignVisionConfig:
    """EfficientNet trunk hyperparameters (HF AlignVisionConfig defaults ==
    kakaobrain/align-base == EfficientNet-B7, configuration_align.py:204-250)."""

    image_size: int = 289              # processed input size (processor crop), not the B7 train size
    width_coefficient: float = 2.0
    depth_coefficient: float = 3.1
    depth_divisor: int = 8
    kernel_sizes: tuple = (3, 3, 5, 3, 5, 5, 3)
    in_channels: tuple = (32, 16, 24, 40, 80, 112, 192)
    out_channels: tuple = (16, 24, 40, 80, 112, 192, 320)
    strides: tuple = (1, 2, 2, 2, 1, 2, 1)
    num_block_repeats: tuple = (1, 2, 2, 3, 3, 4, 1)
    expand_ratios: tuple = (1, 6, 6, 6, 6, 6, 6)
    depthwise_padding: tuple = ()      # block indices with adjust_padding=False
    squeeze_expansion_ratio: float = 0.25
    act: str = "swish"
    embed_dim: int = 640               # = round_filters(out_channels[-1]); asserted in the tower
    compute_dtype: str = "bfloat16"

    def round_filters(self, num_channels: int) -> int:
        """Width scaling (identical math to HF modeling_align.py:126-138)."""
        divisor = self.depth_divisor
        num_channels *= self.width_coefficient
        new_dim = max(divisor, int(num_channels + divisor / 2) // divisor * divisor)
        if new_dim < 0.9 * num_channels:
            new_dim += divisor
        return int(new_dim)

    def round_repeats(self, repeats: int) -> int:
        return int(math.ceil(self.depth_coefficient * repeats))


@dataclasses.dataclass(frozen=True)
class AlignBlockPlan:
    """Static per-block descriptor resolved from the stage config."""

    in_dim: int
    out_dim: int
    stride: int
    kernel_size: int
    expand_ratio: int
    residual: bool        # repeated blocks (j>0): stride 1, in==out → skip-add
    adjust_padding: bool  # asymmetric (k//2-1, k//2) stride-2 padding


def align_block_plan(cfg: AlignVisionConfig) -> tuple[AlignBlockPlan, ...]:
    """Expand the 7-stage config into the 55-block B7 plan (identical
    iteration order to HF AlignVisionEncoder, modeling_align.py:449-484)."""
    plan = []
    block_num = 0
    for i in range(len(cfg.in_channels)):
        in_dim = cfg.round_filters(cfg.in_channels[i])
        out_dim = cfg.round_filters(cfg.out_channels[i])
        for j in range(cfg.round_repeats(cfg.num_block_repeats[i])):
            plan.append(AlignBlockPlan(
                in_dim=out_dim if j > 0 else in_dim,
                out_dim=out_dim,
                stride=1 if j > 0 else cfg.strides[i],
                kernel_size=cfg.kernel_sizes[i],
                expand_ratio=cfg.expand_ratios[i],
                # HF: apply_dropout/residual = (stride==1 and not id_skip);
                # id_skip is True on the first block of each stage
                residual=j > 0,
                adjust_padding=block_num not in cfg.depthwise_padding,
            ))
            block_num += 1
    return tuple(plan)


def _conv(x, kernel, stride, padding, compute_dtype, groups: int = 1):
    """NHWC conv with HWIO kernel, compute-dtype inputs, f32 accumulation."""
    dt = jnp.dtype(compute_dtype)
    return jax.lax.conv_general_dilated(
        x.astype(dt), kernel.astype(dt), window_strides=(stride, stride),
        padding=padding, feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32, precision=_precision_for(dt))


def _fold_bn(x, scale, bias, out_dtype):
    # BN folded to per-channel affine; applied in f32 (cheap, channel-wise)
    return (x.astype(jnp.float32) * scale + bias).astype(out_dtype)


class AlignVisionBlock(nn.Module):
    """One MBConv block: expand(1x1) → depthwise → SE → project(1x1) [+skip]."""

    plan: AlignBlockPlan
    squeeze_ratio: float
    act: str
    compute_dtype: str

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        p = self.plan
        dt = jnp.dtype(self.compute_dtype)
        act = _ACTS[self.act]
        expand_dim = p.in_dim * p.expand_ratio
        init = nn.initializers.normal(stddev=0.02)
        inputs = x

        if p.expand_ratio != 1:
            w = self.param("expand_conv_weight", init, (1, 1, p.in_dim, expand_dim))
            s = self.param("expand_bn_scale", nn.initializers.ones, (expand_dim,))
            b = self.param("expand_bn_bias", nn.initializers.zeros, (expand_dim,))
            x = act(_fold_bn(_conv(x, w, 1, "SAME", self.compute_dtype), s, b, dt))

        k = p.kernel_size
        dw = self.param("dw_conv_weight", init, (k, k, 1, expand_dim))
        s = self.param("dw_bn_scale", nn.initializers.ones, (expand_dim,))
        b = self.param("dw_bn_bias", nn.initializers.zeros, (expand_dim,))
        if p.stride == 2:
            # HF pads asymmetrically (k//2-1, k//2) when adjust_padding (the
            # TF 'SAME' convention for even strides), modeling_align.py:142-159
            lo = k // 2 - 1 if p.adjust_padding else k // 2
            hi = k // 2
            pad = ((lo, hi), (lo, hi))
        else:
            pad = "SAME"
        x = act(_fold_bn(_conv(x, dw, p.stride, pad, self.compute_dtype,
                               groups=expand_dim), s, b, dt))

        # Squeeze-excite: the bottleneck width derives from the block in_dim
        # (pre-expansion), modeling_align.py:283-307
        dim_se = max(1, int(p.in_dim * self.squeeze_ratio))
        rw = self.param("se_reduce_weight", init, (dim_se, expand_dim))
        rb = self.param("se_reduce_bias", nn.initializers.zeros, (dim_se,))
        ew = self.param("se_expand_weight", init, (expand_dim, dim_se))
        eb = self.param("se_expand_bias", nn.initializers.zeros, (expand_dim,))
        se = jnp.mean(x.astype(jnp.float32), axis=(1, 2))           # (B, C)
        se = act(tower_dense(se, rw, rb, self.compute_dtype))
        se = jax.nn.sigmoid(tower_dense(se, ew, eb, self.compute_dtype))
        x = x * se[:, None, None, :].astype(dt)

        pw = self.param("project_conv_weight", init, (1, 1, expand_dim, p.out_dim))
        s = self.param("project_bn_scale", nn.initializers.ones, (p.out_dim,))
        b = self.param("project_bn_bias", nn.initializers.zeros, (p.out_dim,))
        x = _fold_bn(_conv(x, pw, 1, "SAME", self.compute_dtype), s, b, dt)
        if p.residual:
            x = x + inputs.astype(dt)
        return x


class EfficientNetTower(nn.Module):
    """ALIGN image tower. Input: (B, S, S, 3) float32 normalized images.
    Output: (B, embed_dim) float32 mean-pooled features (NOT normalized;
    the embedder normalizes, matching ref embedders.py:907)."""

    cfg: AlignVisionConfig

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        dt = jnp.dtype(cfg.compute_dtype)
        act = _ACTS[cfg.act]
        plan = align_block_plan(cfg)
        assert plan[-1].out_dim == cfg.embed_dim, \
            f"embed_dim {cfg.embed_dim} != trunk output {plan[-1].out_dim}"

        # Stem: ZeroPad2d(0,1,0,1) + conv3x3 stride2 VALID (modeling_align.py:163-185)
        stem_dim = cfg.round_filters(32)
        w = self.param("stem_conv_weight", nn.initializers.normal(stddev=0.02),
                       (3, 3, 3, stem_dim))
        s = self.param("stem_bn_scale", nn.initializers.ones, (stem_dim,))
        b = self.param("stem_bn_bias", nn.initializers.zeros, (stem_dim,))
        x = act(_fold_bn(_conv(images, w, 2, ((0, 1), (0, 1)), cfg.compute_dtype),
                         s, b, dt))

        for i, p in enumerate(plan):
            x = AlignVisionBlock(plan=p, squeeze_ratio=cfg.squeeze_expansion_ratio,
                                 act=cfg.act, compute_dtype=cfg.compute_dtype,
                                 name=f"block_{i}")(x)

        # Global mean pool == HF's AvgPool2d(hidden_dim, ceil_mode=True) with a
        # kernel larger than the feature map (modeling_align.py:1024-1030)
        return jnp.mean(x.astype(jnp.float32), axis=(1, 2))


@dataclasses.dataclass(frozen=True)
class AlignTextConfig:
    """BERT-base encoder (HF AlignTextConfig defaults, configuration_align.py:93-128)."""

    context_length: int = 64           # kakaobrain/align-base tokenizer model_max_length
    vocab_size: int = 30522
    width: int = 768
    layers: int = 12
    heads: int = 12
    mlp_dim: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    act: str = "gelu"
    layer_norm_eps: float = 1e-12
    embed_dim: int = 640               # text_projection output (AlignConfig.projection_dim)
    pad_token_id: int = 0
    compute_dtype: str = "bfloat16"


class BertTextTower(nn.Module):
    """ALIGN text tower: BERT post-LN encoder, [CLS] pooling, linear projection.

    Input: (B, S) int token ids padded with pad_token_id; the attention mask is
    derived as (ids != pad) — [PAD]=0 never appears as a content token in BERT
    vocabs, so this reproduces the HF attention_mask the reference forwards
    (ref embedders.py:886-890). Output: (B, embed_dim) float32 (unnormalized).
    """

    cfg: AlignTextConfig

    @nn.compact
    def __call__(self, token_ids: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        E = cfg.width
        B, S = token_ids.shape
        dt = jnp.dtype(cfg.compute_dtype)
        act = _ACTS[cfg.act]
        init = nn.initializers.normal(stddev=0.02)

        word = self.param("word_embedding", init, (cfg.vocab_size, E))
        pos = self.param("pos_embedding", init, (cfg.max_position_embeddings, E))
        typ = self.param("type_embedding", init, (cfg.type_vocab_size, E))
        ew = self.param("emb_ln_weight", nn.initializers.ones, (E,))
        eb = self.param("emb_ln_bias", nn.initializers.zeros, (E,))
        x = jnp.take(word, token_ids, axis=0) + pos[:S] + typ[0]
        x = f32_layer_norm(x, ew, eb, cfg.layer_norm_eps, out_dtype=dt)

        # Additive pad mask (HF extended_attention_mask semantics); position 0
        # is always [CLS], so every row has at least one unmasked key
        mask = (token_ids != cfg.pad_token_id)
        attn_bias = jnp.where(mask, 0.0, -1e30).astype(jnp.float32)[:, None, None, :]

        H = cfg.heads
        hd = E // H
        scale = 1.0 / math.sqrt(hd)
        for li in range(cfg.layers):
            pfx = f"layers_{li}"
            with_name = lambda n: f"{pfx}_{n}"  # noqa: E731
            qw = self.param(with_name("q_weight"), init, (E, E))
            qb = self.param(with_name("q_bias"), nn.initializers.zeros, (E,))
            kw = self.param(with_name("k_weight"), init, (E, E))
            kb = self.param(with_name("k_bias"), nn.initializers.zeros, (E,))
            vw = self.param(with_name("v_weight"), init, (E, E))
            vb = self.param(with_name("v_bias"), nn.initializers.zeros, (E,))
            ow = self.param(with_name("attn_out_weight"), init, (E, E))
            ob = self.param(with_name("attn_out_bias"), nn.initializers.zeros, (E,))
            alw = self.param(with_name("attn_ln_weight"), nn.initializers.ones, (E,))
            alb = self.param(with_name("attn_ln_bias"), nn.initializers.zeros, (E,))
            w1 = self.param(with_name("fc1_weight"), init, (cfg.mlp_dim, E))
            b1 = self.param(with_name("fc1_bias"), nn.initializers.zeros, (cfg.mlp_dim,))
            w2 = self.param(with_name("fc2_weight"), init, (E, cfg.mlp_dim))
            b2 = self.param(with_name("fc2_bias"), nn.initializers.zeros, (E,))
            olw = self.param(with_name("out_ln_weight"), nn.initializers.ones, (E,))
            olb = self.param(with_name("out_ln_bias"), nn.initializers.zeros, (E,))

            q = tower_dense(x, qw, qb, cfg.compute_dtype).reshape(B, S, H, hd)
            k = tower_dense(x, kw, kb, cfg.compute_dtype).reshape(B, S, H, hd)
            v = tower_dense(x, vw, vb, cfg.compute_dtype).reshape(B, S, H, hd)
            dtj = jnp.dtype(cfg.compute_dtype)
            scores = jnp.einsum("bqhd,bkhd->bhqk", (q * scale).astype(dtj),
                                k.astype(dtj), preferred_element_type=dtj,
                                precision=_precision_for(cfg.compute_dtype))
            scores = scores + attn_bias.astype(dtj)
            attn = jax.nn.softmax(scores, axis=-1)
            out = jnp.einsum("bhqk,bkhd->bqhd", attn, v.astype(dtj),
                             preferred_element_type=jnp.float32,
                             precision=_precision_for(cfg.compute_dtype))
            out = tower_dense(out.reshape(B, S, E), ow, ob, cfg.compute_dtype)
            # Post-LN (BERT): LN AFTER the residual add, both sub-layers
            x = f32_layer_norm(x.astype(jnp.float32) + out, alw, alb,
                               cfg.layer_norm_eps, out_dtype=dt)
            h = act(tower_dense(x, w1, b1, cfg.compute_dtype).astype(dt))
            h = tower_dense(h, w2, b2, cfg.compute_dtype)
            x = f32_layer_norm(x.astype(jnp.float32) + h, olw, olb,
                               cfg.layer_norm_eps, out_dtype=dt)

        # [CLS] last hidden state → projection (NOT the tanh pooler),
        # modeling_align.py get_text_features:1156-1167
        pooled = x[:, 0, :]
        pw = self.param("proj_weight", init, (cfg.embed_dim, E))
        pb = self.param("proj_bias", nn.initializers.zeros, (cfg.embed_dim,))
        return tower_dense(pooled, pw, pb, "float32")
