"""Differential parity: novic_tpu towers vs transformers CLIP/SigLIP models.

Tiny configs, locally random-initialized (no downloads); weights converted via
novic_tpu.embedders.convert and forward outputs compared. This is the same
guarantee the reference implicitly gets by calling the upstream packages
(reference embedders.py backends) — here we prove our from-scratch towers
compute the identical function.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402

from novic_tpu.embedders.convert import convert_hf_model  # noqa: E402
from novic_tpu.embedders.vit import (  # noqa: E402
    TextTowerConfig,
    TextTransformer,
    VisionTowerConfig,
    VisionTransformer,
)

TOL = dict(rtol=2e-3, atol=2e-3)  # bf16-free f32 comparison below uses tighter


def _jit_apply(model):
    return jax.jit(lambda p, x: model.apply({"params": p}, x))


@pytest.fixture(scope="module")
def hf_clip():
    cfg = transformers.CLIPConfig(
        text_config_dict=dict(vocab_size=99, hidden_size=32, intermediate_size=64,
                              num_hidden_layers=2, num_attention_heads=4,
                              max_position_embeddings=16, hidden_act="quick_gelu",
                              bos_token_id=97, eos_token_id=98, pad_token_id=0),
        vision_config_dict=dict(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                                num_attention_heads=4, image_size=24, patch_size=8,
                                hidden_act="quick_gelu"),
        projection_dim=20,
    )
    torch.manual_seed(0)
    model = transformers.CLIPModel(cfg).eval()
    return model


def test_clip_vision_parity(hf_clip):
    model = hf_clip
    v_params, _ = convert_hf_model(model, "clip")
    cfg = VisionTowerConfig(image_size=24, patch_size=8, width=32, layers=2, heads=4,
                            mlp_ratio=2.0, embed_dim=20, act="quick_gelu",
                            use_class_token=True, patch_bias=False, pre_ln=True, pool="cls",
                            compute_dtype="float32")
    mine = VisionTransformer(cfg=cfg)
    rng = np.random.default_rng(0)
    imgs = rng.normal(size=(3, 24, 24, 3)).astype(np.float32)
    with torch.no_grad():
        ref = model.get_image_features(pixel_values=torch.from_numpy(imgs.transpose(0, 3, 1, 2)))
    out = _jit_apply(mine)(v_params, imgs)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=2e-4, atol=2e-4)


def test_clip_text_parity(hf_clip):
    model = hf_clip
    _, t_params = convert_hf_model(model, "clip")
    cfg = TextTowerConfig(context_length=16, vocab_size=99, width=32, layers=2, heads=4,
                          mlp_ratio=2.0, embed_dim=20, act="quick_gelu", causal=True,
                          pool="argmax", proj_bias=False, compute_dtype="float32")
    mine = TextTransformer(cfg=cfg)
    rng = np.random.default_rng(1)
    # CLIP-style sequences: bos=97 < content < eos=98, eos is the max id
    toks = rng.integers(1, 97, size=(4, 16))
    toks[:, 0] = 97
    lengths = rng.integers(3, 15, size=4)
    for i, L in enumerate(lengths):
        toks[i, L] = 98
        toks[i, L + 1:] = 0
    toks = toks.astype(np.int64)
    with torch.no_grad():
        ref = model.get_text_features(input_ids=torch.from_numpy(toks))
    out = _jit_apply(mine)(t_params, toks.astype(np.int32))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=2e-4, atol=2e-4)


@pytest.fixture(scope="module")
def hf_siglip():
    try:
        cfg = transformers.SiglipConfig(
            text_config=dict(vocab_size=99, hidden_size=32, intermediate_size=64,
                             num_hidden_layers=2, num_attention_heads=4,
                             max_position_embeddings=16, hidden_act="gelu_pytorch_tanh"),
            vision_config=dict(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                               num_attention_heads=4, image_size=24, patch_size=8,
                               hidden_act="gelu_pytorch_tanh"),
        )
        torch.manual_seed(0)
        return transformers.SiglipModel(cfg).eval()
    except AttributeError:
        pytest.skip("transformers has no Siglip support")


def test_siglip_vision_parity(hf_siglip):
    model = hf_siglip
    v_params, _ = convert_hf_model(model, "siglip")
    cfg = VisionTowerConfig(image_size=24, patch_size=8, width=32, layers=2, heads=4,
                            mlp_ratio=2.0, embed_dim=32, act="gelu_tanh",
                            use_class_token=False, patch_bias=True, pre_ln=False, pool="map",
                            layer_norm_eps=1e-6, compute_dtype="float32")
    mine = VisionTransformer(cfg=cfg)
    rng = np.random.default_rng(2)
    imgs = rng.normal(size=(3, 24, 24, 3)).astype(np.float32)
    with torch.no_grad():
        ref = model.get_image_features(pixel_values=torch.from_numpy(imgs.transpose(0, 3, 1, 2)))
    out = _jit_apply(mine)(v_params, imgs)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=3e-4, atol=3e-4)


def test_siglip_text_parity(hf_siglip):
    model = hf_siglip
    _, t_params = convert_hf_model(model, "siglip")
    cfg = TextTowerConfig(context_length=16, vocab_size=99, width=32, layers=2, heads=4,
                          mlp_ratio=2.0, embed_dim=32, act="gelu_tanh", causal=False,
                          pool="last", proj_bias=True, layer_norm_eps=1e-6,
                          compute_dtype="float32")
    mine = TextTransformer(cfg=cfg)
    rng = np.random.default_rng(3)
    toks = rng.integers(1, 99, size=(4, 16)).astype(np.int64)
    with torch.no_grad():
        ref = model.get_text_features(input_ids=torch.from_numpy(toks))
    out = _jit_apply(mine)(t_params, toks.astype(np.int32))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=3e-4, atol=3e-4)


def test_text_tower_bf16_causal_finite():
    """bf16 compute with the -1e30 causal bias stays finite and close to f32
    (bf16 spans the f32 exponent range, so the bias doesn't overflow)."""
    import dataclasses

    from novic_tpu.embedders.vit import TextTowerConfig, TextTransformer

    cfg32 = TextTowerConfig(context_length=16, vocab_size=100, width=64, layers=2,
                            heads=4, embed_dim=64, causal=True, pool="argmax",
                            compute_dtype="float32")
    cfg16 = dataclasses.replace(cfg32, compute_dtype="bfloat16")
    ids = np.random.default_rng(0).integers(1, 99, size=(4, 16)).astype(np.int32)
    ids[:, -1] = 99  # highest id = pooling position
    m32, m16 = TextTransformer(cfg=cfg32), TextTransformer(cfg=cfg16)
    p = jax.jit(m32.init)({"params": jax.random.PRNGKey(0)}, ids)["params"]
    e32 = np.asarray(jax.jit(m32.apply)({"params": p}, ids))
    e16 = np.asarray(jax.jit(m16.apply)({"params": p}, ids))
    assert np.isfinite(e16).all()
    n32 = e32 / np.linalg.norm(e32, axis=1, keepdims=True)
    n16 = e16 / np.linalg.norm(e16, axis=1, keepdims=True)
    assert ((n32 * n16).sum(axis=1) > 0.995).all()
