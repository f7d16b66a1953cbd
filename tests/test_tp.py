"""Tensor-parallel tower serving over the 8-device CPU mesh (Megatron-style
column/row-parallel split expressed as GSPMD param shardings; new TPU-first
capability — the reference is single-device, SURVEY.md §2.13)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-tier (pytest --full)

import jax
from jax.sharding import Mesh

from novic_tpu.embedders.base import Embedder
from novic_tpu.embedders.registry import EmbedderArch
from novic_tpu.embedders.vit import TextTowerConfig, VisionTowerConfig
from novic_tpu.parallel.mesh import create_mesh
from novic_tpu.parallel.tp import (
    tp_tower_shardings,
    validate_tp_divisibility,
)


def tiny_embedder(heads=8, width=32, pool="cls", use_class_token=True,
                  pre_ln=True):
    emb = Embedder.create("openai:ViT-B/32", load_model=False,
                          inference_batch_size=16, image_batch_size=16)
    emb.arch = EmbedderArch(
        vision=VisionTowerConfig(image_size=32, patch_size=16, width=width, layers=2,
                                 heads=heads, embed_dim=16, compute_dtype="float32",
                                 pool=pool, use_class_token=use_class_token,
                                 pre_ln=pre_ln,
                                 patch_bias=not use_class_token),
        text=TextTowerConfig(context_length=16, vocab_size=64, width=width, layers=2,
                             heads=heads, embed_dim=16, compute_dtype="float32"),
        preprocess=emb.arch.preprocess, tokenizer=emb.arch.tokenizer, family="clip")
    emb.tokenizer.context_length = emb.arch.text.context_length
    emb.load_model()
    return emb


def test_tp_param_shardings_classification():
    emb = tiny_embedder()
    mesh = create_mesh(jax.devices()[:8], axis_names=("model",))
    shardings = tp_tower_shardings(emb._vision_params, mesh)
    block = shardings["blocks_0"]
    assert block["attn"]["q_proj_weight"].spec == jax.sharding.PartitionSpec("model", None)
    assert block["attn"]["q_proj_bias"].spec == jax.sharding.PartitionSpec("model")
    assert block["attn"]["out_proj_weight"].spec == jax.sharding.PartitionSpec(None, "model")
    assert block["attn"]["out_proj_bias"].spec == jax.sharding.PartitionSpec()
    assert block["fc1_weight"].spec == jax.sharding.PartitionSpec("model", None)
    assert block["fc2_weight"].spec == jax.sharding.PartitionSpec(None, "model")
    assert shardings["pos_embedding"].spec == jax.sharding.PartitionSpec()
    assert shardings["proj_weight"].spec == jax.sharding.PartitionSpec()


@pytest.mark.parametrize("pool,use_cls,pre_ln", [("cls", True, True),
                                                 ("map", False, False),
                                                 ("avg", True, False)])
def test_tp_inference_matches_single_device(pool, use_cls, pre_ln):
    """Pure TP over Mesh('model', 8): results == single-device, for all three
    vision pooling families (CLIP cls / SigLIP map / CLIPA avg)."""
    emb = tiny_embedder(pool=pool, use_class_token=use_cls, pre_ln=pre_ln)
    rng = np.random.default_rng(0)
    imgs = rng.normal(size=(4, 32, 32, 3)).astype(np.float32)
    texts = ["a dog", "a cat", "xyz"]
    out_img_single = emb.inference_image(imgs)
    out_txt_single = emb.inference_text(texts)

    mesh = create_mesh(jax.devices()[:8], axis_names=("model",))
    emb.set_mesh(mesh, mode="tp")
    out_img_tp = emb.inference_image(imgs)
    out_txt_tp = emb.inference_text(texts)
    np.testing.assert_allclose(out_img_tp, out_img_single, atol=2e-5)
    np.testing.assert_allclose(out_txt_tp, out_txt_single, atol=2e-5)
    # Params are genuinely sharded over the model axis
    leaf = emb._vision_params["blocks_0"]["attn"]["q_proj_weight"]
    assert leaf.sharding.spec == jax.sharding.PartitionSpec("model", None)


@pytest.mark.parametrize("qkv_fused,swiglu", [(False, True), (True, False)])
def test_tp_eva_tower_matches_single_device(qkv_fused, swiglu):
    """TP over the EVA02 trunk (rope + sub-LN; SwiGLU split-qkv like base/
    large, and fused-qkv plain-MLP like enormous). Pins the qkv_weight /
    fc1_g/fc1_x/mlp_norm column entries in parallel/tp.py."""
    from novic_tpu.embedders.eva import EvaVisionConfig

    emb = Embedder.create(
        "openclip:timm/eva02_base_patch16_clip_224.merged2b_s8b_b131k",
        load_model=False, inference_batch_size=16, image_batch_size=16)
    emb.arch = EmbedderArch(
        vision=EvaVisionConfig(image_size=32, patch_size=16, width=32, layers=2,
                               heads=8, mlp_hidden=16, embed_dim=16,
                               use_rope=True, ref_feat_shape=2,
                               swiglu=swiglu, inner_attn_norm=True,
                               qkv_fused=qkv_fused, compute_dtype="float32"),
        text=TextTowerConfig(context_length=16, vocab_size=64, width=32, layers=2,
                             heads=8, embed_dim=16, compute_dtype="float32"),
        preprocess=emb.arch.preprocess, tokenizer=emb.arch.tokenizer,
        family="eva02")
    emb.tokenizer.context_length = 16
    emb.load_model()

    rng = np.random.default_rng(2)
    imgs = rng.normal(size=(4, 32, 32, 3)).astype(np.float32)
    out_single = emb.inference_image(imgs)

    mesh = create_mesh(jax.devices()[:8], axis_names=("model",))
    emb.set_mesh(mesh, mode="tp")
    out_tp = emb.inference_image(imgs)
    np.testing.assert_allclose(out_tp, out_single, atol=2e-5)
    # q/k/v + SwiGLU gate params are genuinely column-sharded (fused-qkv
    # archs store separate projections too — the converter splits the torch
    # fused weight so TP shards never cross the q/k/v boundary)
    block = emb._vision_params["blocks_0"]
    assert "qkv_weight" not in block
    leaves = [block["q_proj_weight"], block["k_proj_weight"], block["v_proj_weight"]]
    if not qkv_fused:
        leaves.append(block["fc1_g_weight"])
    for leaf in leaves:
        assert leaf.sharding.spec == jax.sharding.PartitionSpec("model", None)


def test_dp_tp_2d_mesh():
    """2-D ('data','model') mesh: batch sharded on data, params TP on model."""
    emb = tiny_embedder()
    rng = np.random.default_rng(1)
    imgs = rng.normal(size=(8, 32, 32, 3)).astype(np.float32)
    out_single = emb.inference_image(imgs)

    devices = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devices, ("data", "model"))
    emb.set_mesh(mesh, mode="dp_tp")
    out_2d = emb.inference_image(imgs)
    np.testing.assert_allclose(out_2d, out_single, atol=2e-5)


def test_tp_divisibility_validation():
    emb = tiny_embedder(heads=6, width=48)  # 6 heads not divisible by 8
    mesh = create_mesh(jax.devices()[:8], axis_names=("model",))
    with pytest.raises(ValueError, match="not divisible"):
        emb.set_mesh(mesh, mode="tp")
    validate_tp_divisibility(emb.arch.vision, axis_size=2)  # 6 % 2 == 0 ok
    with pytest.raises(ValueError, match="Unknown mesh mode"):
        emb.set_mesh(mesh, mode="pp")


def test_tp_registered_towers_divisible():
    """Every curated registry tower splits evenly at TP-2/4 (heads+mlp).

    Skips dynamically-derived local-HF-dir entries (lookup() caches those
    into REGISTRY; tests create tiny ones with 2-head text towers)."""
    import os

    from novic_tpu.embedders.registry import REGISTRY

    for spec, arch in REGISTRY.items():
        name = spec.split(":", 1)[1]
        if os.path.isdir(name):
            continue
        if arch.family == "align":
            continue  # conv tower: TP unsupported, set_mesh raises (test_align_parity)
        for n in (2, 4):
            if "eva02_large" in spec and n == 4:
                # known exception: SwiGLU hidden int(1024*8/3)=2730 splits
                # only at TP-2; loud refusal pinned in test_eva_parity.py
                continue
            validate_tp_divisibility(arch.vision, arch.text, axis_size=n)
        if arch.vision.heads % 8 == 0 and arch.vision.mlp_dim % 8 == 0:
            validate_tp_divisibility(arch.vision, axis_size=8)
