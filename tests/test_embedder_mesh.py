"""Data-parallel embedder inference over the 8-device CPU mesh."""

import numpy as np

import jax

from novic_tpu.embedders.base import Embedder
from novic_tpu.parallel.mesh import create_mesh


def test_embedder_dp_inference():
    emb = Embedder.create("openai:ViT-B/32", load_model=False,
                          inference_batch_size=16, image_batch_size=16)
    # Shrink to a tiny architecture for the test
    import dataclasses

    from novic_tpu.embedders.registry import EmbedderArch
    from novic_tpu.embedders.vit import TextTowerConfig, VisionTowerConfig

    emb.arch = EmbedderArch(
        vision=VisionTowerConfig(image_size=32, patch_size=16, width=32, layers=1, heads=2,
                                 embed_dim=16, compute_dtype="float32"),
        text=TextTowerConfig(context_length=16, vocab_size=64, width=32, layers=1, heads=2,
                             embed_dim=16, compute_dtype="float32"),
        preprocess=emb.arch.preprocess, tokenizer=emb.arch.tokenizer, family="clip")
    emb.load_model()
    rng = np.random.default_rng(0)
    imgs = rng.normal(size=(12, 32, 32, 3)).astype(np.float32)
    out_single = emb.inference_image(imgs)

    mesh = create_mesh(jax.devices()[:8])
    emb.set_mesh(mesh)
    out_dp = emb.inference_image(imgs)
    assert out_dp.shape == (12, 16)
    np.testing.assert_allclose(out_dp, out_single, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(out_dp, axis=1), 1.0, rtol=1e-5)
