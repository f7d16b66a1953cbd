"""Config-driven tower building for LOCAL checkpoint directories of every
family (VERDICT r3 #4): an unseen openclip:<dir> / transformers:<dir>
checkpoint of the CLIP / SigLIP / CLIPA / EVA02 / ALIGN families must build
the correct tower architecture with zero code changes, matching the curated
registry entries (ref embedders.py:70-94 — the factory accepts any name;
open_clip/HF resolve the architecture from the checkpoint's own config)."""

import json

import pytest

from novic_tpu.embedders.base import Embedder
from novic_tpu.embedders.registry import REGISTRY, lookup


def write_openclip_dir(tmp_path, model_cfg, preprocess_cfg=None):
    d = tmp_path / "ckpt"
    d.mkdir(exist_ok=True)
    payload = {"model_cfg": model_cfg}
    if preprocess_cfg is not None:
        payload["preprocess_cfg"] = preprocess_cfg
    with open(d / "open_clip_config.json", "w") as f:
        json.dump(payload, f)
    return str(d)


def test_local_openclip_siglip_dir(tmp_path):
    """A SigLIP hub-layout dir (timm_model_name indirection) derives the exact
    curated ViT-B-16-SigLIP architecture."""
    d = write_openclip_dir(tmp_path, {
        "embed_dim": 768,
        "init_logit_bias": -10,
        "custom_text": True,
        "vision_cfg": {"timm_model_name": "vit_base_patch16_siglip_224",
                       "timm_model_pretrained": False, "timm_pool": "map",
                       "timm_proj": "none", "image_size": 224},
        "text_cfg": {"context_length": 64, "vocab_size": 32000,
                     "hf_tokenizer_name": "timm/ViT-B-16-SigLIP",
                     "width": 768, "heads": 12, "layers": 12,
                     "no_causal_mask": True, "proj_bias": True,
                     "pool_type": "last", "norm_kwargs": {"eps": 1e-6},
                     "act_kwargs": {"approximate": "tanh"}},
    }, {"mean": [0.5, 0.5, 0.5], "std": [0.5, 0.5, 0.5], "interpolation": "bicubic",
        "resize_mode": "squash", "size": 224})
    arch = lookup(f"openclip:{d}")
    ref = REGISTRY["openclip:timm/ViT-B-16-SigLIP"]
    assert arch.family == "siglip" and arch.tokenizer == "sentencepiece"
    assert arch.vision == ref.vision
    assert arch.text == ref.text
    assert arch.preprocess == ref.preprocess


def test_local_openclip_siglip_unseen_resolution(tmp_path):
    """An UNSEEN SigLIP variant (SO400M at 512px) still builds: geometry from
    the timm name, resolution from the name suffix."""
    d = write_openclip_dir(tmp_path, {
        "embed_dim": 1152,
        "vision_cfg": {"timm_model_name": "vit_so400m_patch14_siglip_512",
                       "image_size": 512},
        "text_cfg": {"context_length": 64, "vocab_size": 32000,
                     "hf_tokenizer_name": "timm/ViT-SO400M-14-SigLIP",
                     "width": 1152, "heads": 16, "layers": 27,
                     "no_causal_mask": True, "proj_bias": True, "pool_type": "last",
                     "norm_kwargs": {"eps": 1e-6}, "act_kwargs": {"approximate": "tanh"}},
    })
    arch = lookup(f"openclip:{d}")
    assert arch.family == "siglip"
    assert arch.vision.image_size == 512 and arch.vision.patch_size == 14
    assert arch.vision.width == 1152 and arch.vision.layers == 27
    assert abs(arch.vision.mlp_ratio - 4304 / 1152) < 1e-9
    assert arch.text.width == 1152 and arch.text.layers == 27


def test_local_openclip_clipa_dir(tmp_path):
    """A CLIPA dir (explicit vision_cfg with the three quirk flags) derives
    the curated ViT-L-14-CLIPA architecture."""
    d = write_openclip_dir(tmp_path, {
        "embed_dim": 768,
        "vision_cfg": {"image_size": 224, "layers": 24, "width": 1024,
                       "patch_size": 14, "no_ln_pre": True, "pool_type": "avg",
                       "final_ln_after_pool": True},
        "text_cfg": {"context_length": 32, "vocab_size": 32000,
                     "hf_tokenizer_name": "bert-base-uncased",
                     "tokenizer_kwargs": {"strip_sep_token": True},
                     "width": 768, "heads": 12, "layers": 12,
                     "pool_type": "last", "no_causal_mask": True},
    }, {"mean": list(REGISTRY["openclip:rwightman/ViT-L-14-CLIPA-datacomp1B"].preprocess.mean),
        "std": list(REGISTRY["openclip:rwightman/ViT-L-14-CLIPA-datacomp1B"].preprocess.std),
        "size": 224})
    arch = lookup(f"openclip:{d}")
    ref = REGISTRY["openclip:rwightman/ViT-L-14-CLIPA-datacomp1B"]
    assert arch.family == "clipa" and arch.tokenizer == "wordpiece"
    assert arch.vision == ref.vision
    assert arch.text == ref.text
    assert arch.preprocess == ref.preprocess


def test_local_openclip_eva02_dir(tmp_path):
    """An EVA02 dir (timm eva02 trunk name + stock CLIP text) derives the
    curated eva02-base architecture."""
    d = write_openclip_dir(tmp_path, {
        "embed_dim": 512,
        "vision_cfg": {"image_size": 224,
                       "timm_model_name": "eva02_base_patch16_clip_224",
                       "timm_model_pretrained": False, "timm_pool": "token"},
        "text_cfg": {"context_length": 77, "vocab_size": 49408,
                     "width": 512, "heads": 8, "layers": 12},
    })
    arch = lookup(f"openclip:{d}")
    ref = REGISTRY["openclip:timm/eva02_base_patch16_clip_224.merged2b_s8b_b131k"]
    assert arch.family == "eva02" and arch.tokenizer == "clip_bpe"
    assert arch.vision == ref.vision
    assert arch.text == ref.text
    assert arch.preprocess == ref.preprocess


def test_local_hf_siglip_dir(tmp_path):
    """A transformers checkpoint dir with model_type 'siglip' builds the
    SigLIP towers from its explicit vision/text configs."""
    d = tmp_path / "hf_siglip"
    d.mkdir()
    with open(d / "config.json", "w") as f:
        json.dump({
            "model_type": "siglip",
            "vision_config": {"image_size": 224, "patch_size": 16, "hidden_size": 768,
                              "num_hidden_layers": 12, "num_attention_heads": 12,
                              "intermediate_size": 3072, "layer_norm_eps": 1e-6},
            "text_config": {"max_position_embeddings": 64, "vocab_size": 32000,
                            "hidden_size": 768, "num_hidden_layers": 12,
                            "num_attention_heads": 12, "intermediate_size": 3072,
                            "layer_norm_eps": 1e-6},
        }, f)
    arch = lookup(f"transformers:{d}")
    ref = REGISTRY["openclip:timm/ViT-B-16-SigLIP"]
    assert arch.family == "siglip" and arch.tokenizer == "sentencepiece"
    assert arch.vision == ref.vision
    assert arch.text == ref.text


def test_local_dir_embedder_create_builds(tmp_path):
    """Embedder.create on a local config dir goes through the same factory
    path end-to-end (tokenizer fallback warning expected: no .model asset)."""
    d = write_openclip_dir(tmp_path, {
        "embed_dim": 64,
        "vision_cfg": {"image_size": 32, "layers": 2, "width": 64,
                       "patch_size": 16, "head_width": 32},
        "text_cfg": {"context_length": 16, "vocab_size": 128, "width": 64,
                     "heads": 2, "layers": 2},
    })
    e = Embedder.create(f"openclip:{d}", load_model=True)
    import numpy as np

    out = e.inference_image(np.zeros((2, 32, 32, 3), np.float32))
    assert out.shape == (2, 64)
    assert np.allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-5)


def test_unknown_spec_still_errors():
    with pytest.raises(ValueError, match="Unknown embedder spec"):
        lookup("openclip:not/a-real-model")
