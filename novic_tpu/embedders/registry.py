"""Known CLIP-family model architectures (the reference's supported backends).

Architecture hyperparameters for the embedder specs used by the reference
(reference config/train.yaml:90-138 lists the supported embedder specs with
embed dims; README.md:295-301 the released-checkpoint backbones). Weights are
converted from HF checkpoints via novic_tpu.embedders.convert; architectures
here let us build the exact compute graph (and benchmark it at speed-of-light)
even before weights are available on disk.
"""

from __future__ import annotations

import dataclasses

from novic_tpu.embedders.preprocess import (
    CLIP_MEAN,
    CLIP_STD,
    SIGLIP_MEAN,
    SIGLIP_STD,
    PreprocessConfig,
)
from novic_tpu.embedders.vit import TextTowerConfig, VisionTowerConfig


@dataclasses.dataclass(frozen=True)
class EmbedderArch:
    vision: VisionTowerConfig
    text: TextTowerConfig
    preprocess: PreprocessConfig
    tokenizer: str       # clip_bpe | sentencepiece | wordpiece
    family: str          # clip | siglip | clipa


def _clip(image_size, patch, v_width, v_layers, v_heads, t_width, t_layers, t_heads,
          embed_dim, act="quick_gelu", vocab=49408, context=77, v_mlp_ratio=4.0):
    return EmbedderArch(
        vision=VisionTowerConfig(image_size=image_size, patch_size=patch, width=v_width,
                                 layers=v_layers, heads=v_heads, embed_dim=embed_dim, act=act,
                                 mlp_ratio=v_mlp_ratio,
                                 use_class_token=True, patch_bias=False, pre_ln=True, pool="cls"),
        text=TextTowerConfig(context_length=context, vocab_size=vocab, width=t_width,
                             layers=t_layers, heads=t_heads, embed_dim=embed_dim, act=act,
                             causal=True, pool="argmax", proj_bias=False),
        preprocess=PreprocessConfig(size=image_size, resize_mode="shortest",
                                    mean=CLIP_MEAN, std=CLIP_STD),
        tokenizer="clip_bpe",
        family="clip",
    )


def _siglip(image_size, patch, width, layers, heads, mlp_dim, embed_dim,
            vocab=32000, context=64):
    ratio = mlp_dim / width
    return EmbedderArch(
        vision=VisionTowerConfig(image_size=image_size, patch_size=patch, width=width,
                                 layers=layers, heads=heads, mlp_ratio=ratio,
                                 embed_dim=embed_dim, act="gelu_tanh", use_class_token=False,
                                 patch_bias=True, pre_ln=False, pool="map",
                                 layer_norm_eps=1e-6),
        text=TextTowerConfig(context_length=context, vocab_size=vocab, width=width,
                             layers=layers, heads=heads, mlp_ratio=ratio, embed_dim=embed_dim,
                             act="gelu_tanh", causal=False, pool="last", proj_bias=True,
                             layer_norm_eps=1e-6),
        preprocess=PreprocessConfig(size=image_size, resize_mode="squash",
                                    mean=SIGLIP_MEAN, std=SIGLIP_STD),
        tokenizer="sentencepiece",
        family="siglip",
    )


def _clipa(v_width, v_layers, v_heads, t_width, t_layers, t_heads, embed_dim,
           image_size=224, patch=14, context=32, vocab=32000, v_mlp_ratio=4.0):
    """CLIPA-v2 tower config (open_clip ViT-*-CLIPA model configs): standard
    ViT trunk geometry, but no ln_pre, avg pooling over patch tokens with the
    final LN after pooling, non-causal text with last-token pooling over a
    BERT-uncased WordPiece vocab at context 32."""
    return EmbedderArch(
        vision=VisionTowerConfig(image_size=image_size, patch_size=patch, width=v_width,
                                 layers=v_layers, heads=v_heads, embed_dim=embed_dim,
                                 act="gelu", mlp_ratio=v_mlp_ratio,
                                 use_class_token=True, patch_bias=False,
                                 pre_ln=False, pool="avg"),
        text=TextTowerConfig(context_length=context, vocab_size=vocab, width=t_width,
                             layers=t_layers, heads=t_heads, embed_dim=embed_dim,
                             act="gelu", causal=False, pool="last", proj_bias=False),
        preprocess=PreprocessConfig(size=image_size, resize_mode="shortest",
                                    mean=CLIP_MEAN, std=CLIP_STD),
        tokenizer="wordpiece",
        family="clipa",
    )


REGISTRY: dict[str, EmbedderArch] = {
    # OpenAI CLIP (ref embedders.py:442-452 EMBED_DIM table)
    "openai:ViT-B/32": _clip(224, 32, 768, 12, 12, 512, 12, 8, 512),
    "openai:ViT-B/16": _clip(224, 16, 768, 12, 12, 512, 12, 8, 512),
    "openai:ViT-L/14": _clip(224, 14, 1024, 24, 16, 768, 12, 12, 768),
    "openai:ViT-L/14@336px": _clip(336, 14, 1024, 24, 16, 768, 12, 12, 768),
    # OpenCLIP SigLIP family (the main released backbones, ref README.md:295-301)
    "openclip:timm/ViT-B-16-SigLIP": _siglip(224, 16, 768, 12, 12, 3072, 768),
    "openclip:timm/ViT-B-16-SigLIP-384": _siglip(384, 16, 768, 12, 12, 3072, 768),
    "openclip:timm/ViT-L-16-SigLIP-256": _siglip(256, 16, 1024, 24, 16, 4096, 1024),
    "openclip:timm/ViT-SO400M-14-SigLIP": _siglip(224, 14, 1152, 27, 16, 4304, 1152, context=16),
    "openclip:timm/ViT-SO400M-14-SigLIP-384": _siglip(384, 14, 1152, 27, 16, 4304, 1152, context=64),
    # DFN5B CLIP-H (agreement-target backbone, ref README.md:299-300)
    "openclip:apple/DFN5B-CLIP-ViT-H-14": _clip(224, 14, 1280, 32, 16, 1024, 24, 16, 1024, act="gelu"),
    "openclip:apple/DFN5B-CLIP-ViT-H-14-378": _clip(378, 14, 1280, 32, 16, 1024, 24, 16, 1024, act="gelu"),
    # LAION / DataComp OpenCLIP family (gelu activations; ref
    # config/train.yaml:103-138 supported-spec table — curated * rows)
    "openclip:apple/DFN2B-CLIP-ViT-L-14": _clip(224, 14, 1024, 24, 16, 768, 12, 12, 768, act="gelu"),
    "openclip:laion/CLIP-ViT-L-14-DataComp.XL-s13B-b90K": _clip(224, 14, 1024, 24, 16, 768, 12, 12, 768, act="gelu"),
    "transformers:laion/CLIP-ViT-L-14-DataComp.XL-s13B-b90K": _clip(224, 14, 1024, 24, 16, 768, 12, 12, 768, act="gelu"),
    "openclip:laion/CLIP-ViT-B-16-DataComp.XL-s13B-b90K": _clip(224, 16, 768, 12, 12, 512, 12, 8, 512, act="gelu"),
    "openclip:laion/CLIP-ViT-B-32-DataComp.XL-s13B-b90K": _clip(224, 32, 768, 12, 12, 512, 12, 8, 512, act="gelu"),
    "openclip:laion/CLIP-ViT-B-32-256x256-DataComp-s34B-b86K": _clip(256, 32, 768, 12, 12, 512, 12, 8, 512, act="gelu"),
    "openclip:laion/CLIP-ViT-B-32-laion2B-s34B-b79K": _clip(224, 32, 768, 12, 12, 512, 12, 8, 512, act="gelu"),
    "transformers:laion/CLIP-ViT-B-32-laion2B-s34B-b79K": _clip(224, 32, 768, 12, 12, 512, 12, 8, 512, act="gelu"),
    "openclip:laion/CLIP-ViT-H-14-laion2B-s32B-b79K": _clip(224, 14, 1280, 32, 16, 1024, 24, 16, 1024, act="gelu"),
    "transformers:laion/CLIP-ViT-H-14-laion2B-s32B-b79K": _clip(224, 14, 1280, 32, 16, 1024, 24, 16, 1024, act="gelu"),
    "openclip:laion/CLIP-ViT-g-14-laion2B-s34B-b88K": _clip(224, 14, 1408, 40, 16, 1024, 24, 16, 1024, act="gelu", v_mlp_ratio=6144 / 1408),
    "openclip:laion/CLIP-ViT-bigG-14-laion2B-39B-b160k": _clip(224, 14, 1664, 48, 16, 1280, 32, 20, 1280, act="gelu", v_mlp_ratio=8192 / 1664),
    "transformers:laion/CLIP-ViT-bigG-14-laion2B-39B-b160k": _clip(224, 14, 1664, 48, 16, 1280, 32, 20, 1280, act="gelu", v_mlp_ratio=8192 / 1664),
    # CLIPA-v2 (ref config/train.yaml:107,113,117): plain pre-LN ViT trunks
    # with three config-level quirks vs stock CLIP (open_clip model_configs
    # ViT-{L,H,bigG}-14-CLIPA.json): no ln_pre, avg-pool over patch tokens
    # with final LN AFTER pooling, and a non-causal text tower (context 32,
    # BERT-uncased WordPiece vocab, strip-SEP => end=pad, last-token pool).
    "openclip:rwightman/ViT-L-14-CLIPA-datacomp1B": _clipa(
        1024, 24, 16, 768, 12, 12, 768),
    "openclip:rwightman/ViT-H-14-CLIPA-datacomp1B": _clipa(
        1280, 32, 16, 1024, 24, 16, 1024),
    "openclip:rwightman/ViT-bigG-14-CLIPA-datacomp1B": _clipa(
        1664, 48, 16, 1280, 32, 20, 1280, v_mlp_ratio=8192 / 1664),
    # MetaCLIP (quick_gelu; tokenizer quirk handled as in ref embedders.py:800)
    "transformers:facebook/metaclip-h14-fullcc2.5b": _clip(224, 14, 1280, 32, 16, 1024, 24, 16, 1024),
    # OpenAI CLIP via the transformers backend
    "transformers:openai/clip-vit-base-patch32": _clip(224, 32, 768, 12, 12, 512, 12, 8, 512),
    "transformers:openai/clip-vit-base-patch16": _clip(224, 16, 768, 12, 12, 512, 12, 8, 512),
    "transformers:openai/clip-vit-large-patch14": _clip(224, 14, 1024, 24, 16, 768, 12, 12, 768),
    # NOT registered (materially different block structures — would need their
    # own tower code, not a config): EVA02 (rotary pos + SwiGLU), ALIGN
    # (EfficientNet+BERT). lookup() rejects them loudly rather than building
    # a silently-wrong tower.
}


def lookup(spec: str) -> EmbedderArch:
    if spec not in REGISTRY:
        arch = _arch_from_local_hf(spec)
        if arch is not None:
            REGISTRY[spec] = arch
            return arch
        raise ValueError(
            f"Unknown embedder spec '{spec}'. Known: {sorted(REGISTRY)} "
            f"(add new architectures to novic_tpu/embedders/registry.py)")
    return REGISTRY[spec]


def _arch_from_local_hf(spec: str) -> "EmbedderArch | None":
    """Derive an EmbedderArch from a local HF CLIP checkpoint directory.

    Lets 'transformers:<local_dir>' specs work for any on-disk HF CLIP model
    (the reference's TransformersEmbedder accepts arbitrary model ids, ref
    embedders.py:767-788; with zero egress only local directories resolve).
    """
    import json
    import os

    if ":" not in spec:
        return None
    kind, name = spec.split(":", maxsplit=1)
    cfg_path = os.path.join(name, "config.json")
    if kind != "transformers" or not os.path.isfile(cfg_path):
        return None
    with open(cfg_path) as f:
        hf = json.load(f)
    if hf.get("model_type") != "clip":
        return None
    v, t = hf["vision_config"], hf["text_config"]
    act = {"quick_gelu": "quick_gelu", "gelu": "gelu",
           "gelu_new": "gelu_tanh", "gelu_pytorch_tanh": "gelu_tanh"}[
        v.get("hidden_act", "quick_gelu")]
    embed_dim = hf.get("projection_dim", 512)
    return EmbedderArch(
        vision=VisionTowerConfig(
            image_size=v.get("image_size", 224), patch_size=v.get("patch_size", 32),
            width=v.get("hidden_size", 768), layers=v.get("num_hidden_layers", 12),
            heads=v.get("num_attention_heads", 12),
            mlp_ratio=v.get("intermediate_size", 3072) / v.get("hidden_size", 768),
            embed_dim=embed_dim, act=act, use_class_token=True, patch_bias=False,
            pre_ln=True, pool="cls", layer_norm_eps=v.get("layer_norm_eps", 1e-5)),
        text=TextTowerConfig(
            context_length=t.get("max_position_embeddings", 77),
            vocab_size=t.get("vocab_size", 49408), width=t.get("hidden_size", 512),
            layers=t.get("num_hidden_layers", 12), heads=t.get("num_attention_heads", 8),
            mlp_ratio=t.get("intermediate_size", 2048) / t.get("hidden_size", 512),
            embed_dim=embed_dim, act=act, causal=True, pool="argmax", proj_bias=False,
            layer_norm_eps=t.get("layer_norm_eps", 1e-5)),
        preprocess=PreprocessConfig(size=v.get("image_size", 224),
                                    resize_mode="shortest", mean=CLIP_MEAN, std=CLIP_STD),
        tokenizer="clip_bpe",
        family="clip",
    )
