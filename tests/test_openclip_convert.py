"""open_clip-format state dict conversion: the converted pytree matches the
tower's init structure exactly (paths + shapes), and packed projections land
in the right slices."""

import numpy as np
import pytest

import jax

from novic_tpu.embedders.convert import (
    convert_openclip_clip_text,
    convert_openclip_clip_vision,
    convert_openclip_siglip_vision,
)
from novic_tpu.embedders.vit import (
    TextTowerConfig,
    TextTransformer,
    VisionTowerConfig,
    VisionTransformer,
)

E, P, S, L, H = 32, 8, 16, 2, 4
D = 20  # projection dim


def tree_spec(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(tree_spec(v, prefix + k + "."))
        else:
            out[prefix + k] = tuple(np.shape(v))
    return out


def make_openclip_clip_sd(rng):
    sd = {}
    grid = (S // P) ** 2
    sd["visual.conv1.weight"] = rng.normal(size=(E, 3, P, P)).astype(np.float32)
    sd["visual.class_embedding"] = rng.normal(size=(E,)).astype(np.float32)
    sd["visual.positional_embedding"] = rng.normal(size=(grid + 1, E)).astype(np.float32)
    for name in ("visual.ln_pre", "visual.ln_post"):
        sd[f"{name}.weight"] = np.ones(E, np.float32)
        sd[f"{name}.bias"] = np.zeros(E, np.float32)
    sd["visual.proj"] = rng.normal(size=(E, D)).astype(np.float32)
    for scope, n in (("visual.transformer", L), ("transformer", L)):
        for i in range(n):
            pre = f"{scope}.resblocks.{i}"
            sd[f"{pre}.attn.in_proj_weight"] = rng.normal(size=(3 * E, E)).astype(np.float32)
            sd[f"{pre}.attn.in_proj_bias"] = rng.normal(size=(3 * E,)).astype(np.float32)
            sd[f"{pre}.attn.out_proj.weight"] = rng.normal(size=(E, E)).astype(np.float32)
            sd[f"{pre}.attn.out_proj.bias"] = rng.normal(size=(E,)).astype(np.float32)
            for ln in ("ln_1", "ln_2"):
                sd[f"{pre}.{ln}.weight"] = np.ones(E, np.float32)
                sd[f"{pre}.{ln}.bias"] = np.zeros(E, np.float32)
            sd[f"{pre}.mlp.c_fc.weight"] = rng.normal(size=(2 * E, E)).astype(np.float32)
            sd[f"{pre}.mlp.c_fc.bias"] = rng.normal(size=(2 * E,)).astype(np.float32)
            sd[f"{pre}.mlp.c_proj.weight"] = rng.normal(size=(E, 2 * E)).astype(np.float32)
            sd[f"{pre}.mlp.c_proj.bias"] = rng.normal(size=(E,)).astype(np.float32)
    sd["token_embedding.weight"] = rng.normal(size=(50, E)).astype(np.float32)
    sd["positional_embedding"] = rng.normal(size=(12, E)).astype(np.float32)
    sd["ln_final.weight"] = np.ones(E, np.float32)
    sd["ln_final.bias"] = np.zeros(E, np.float32)
    sd["text_projection"] = rng.normal(size=(E, D)).astype(np.float32)
    return sd


def test_openclip_clip_conversion_structure():
    rng = np.random.default_rng(0)
    sd = make_openclip_clip_sd(rng)
    v_params = convert_openclip_clip_vision(sd, L)
    t_params = convert_openclip_clip_text(sd, L)

    vcfg = VisionTowerConfig(image_size=S, patch_size=P, width=E, layers=L, heads=H,
                             mlp_ratio=2.0, embed_dim=D, compute_dtype="float32")
    tcfg = TextTowerConfig(context_length=12, vocab_size=50, width=E, layers=L, heads=H,
                           mlp_ratio=2.0, embed_dim=D, compute_dtype="float32")
    vm, tm = VisionTransformer(cfg=vcfg), TextTransformer(cfg=tcfg)
    v_init = jax.jit(vm.init)({"params": jax.random.PRNGKey(0)},
                              np.zeros((1, S, S, 3), np.float32))["params"]
    t_init = jax.jit(tm.init)({"params": jax.random.PRNGKey(0)},
                              np.zeros((1, 12), np.int32))["params"]
    assert tree_spec(v_params) == tree_spec(v_init)
    assert tree_spec(t_params) == tree_spec(t_init)

    # Packed qkv split lands correctly and projection is transposed
    np.testing.assert_array_equal(
        v_params["blocks_0"]["attn"]["k_proj_weight"],
        sd["visual.transformer.resblocks.0.attn.in_proj_weight"][E:2 * E])
    np.testing.assert_array_equal(v_params["proj_weight"], sd["visual.proj"].T)
    np.testing.assert_array_equal(t_params["proj_weight"], sd["text_projection"].T)

    # Converted params run through the towers
    out = jax.jit(lambda p, x: vm.apply({"params": p}, x))(
        v_params, np.random.default_rng(1).normal(size=(2, S, S, 3)).astype(np.float32))
    assert np.isfinite(np.asarray(out)).all()


def test_openclip_siglip_vision_structure():
    rng = np.random.default_rng(2)
    grid = (S // P) ** 2
    t = "visual.trunk"
    sd = {f"{t}.patch_embed.proj.weight": rng.normal(size=(E, 3, P, P)).astype(np.float32),
          f"{t}.patch_embed.proj.bias": rng.normal(size=(E,)).astype(np.float32),
          f"{t}.pos_embed": rng.normal(size=(1, grid, E)).astype(np.float32),
          f"{t}.norm.weight": np.ones(E, np.float32), f"{t}.norm.bias": np.zeros(E, np.float32),
          f"{t}.attn_pool.latent": rng.normal(size=(1, 1, E)).astype(np.float32),
          f"{t}.attn_pool.q.weight": rng.normal(size=(E, E)).astype(np.float32),
          f"{t}.attn_pool.q.bias": rng.normal(size=(E,)).astype(np.float32),
          f"{t}.attn_pool.kv.weight": rng.normal(size=(2 * E, E)).astype(np.float32),
          f"{t}.attn_pool.kv.bias": rng.normal(size=(2 * E,)).astype(np.float32),
          f"{t}.attn_pool.proj.weight": rng.normal(size=(E, E)).astype(np.float32),
          f"{t}.attn_pool.proj.bias": rng.normal(size=(E,)).astype(np.float32),
          f"{t}.attn_pool.norm.weight": np.ones(E, np.float32),
          f"{t}.attn_pool.norm.bias": np.zeros(E, np.float32),
          f"{t}.attn_pool.mlp.fc1.weight": rng.normal(size=(2 * E, E)).astype(np.float32),
          f"{t}.attn_pool.mlp.fc1.bias": rng.normal(size=(2 * E,)).astype(np.float32),
          f"{t}.attn_pool.mlp.fc2.weight": rng.normal(size=(E, 2 * E)).astype(np.float32),
          f"{t}.attn_pool.mlp.fc2.bias": rng.normal(size=(E,)).astype(np.float32)}
    for i in range(L):
        pre = f"{t}.blocks.{i}"
        sd[f"{pre}.attn.qkv.weight"] = rng.normal(size=(3 * E, E)).astype(np.float32)
        sd[f"{pre}.attn.qkv.bias"] = rng.normal(size=(3 * E,)).astype(np.float32)
        sd[f"{pre}.attn.proj.weight"] = rng.normal(size=(E, E)).astype(np.float32)
        sd[f"{pre}.attn.proj.bias"] = rng.normal(size=(E,)).astype(np.float32)
        for ln in ("norm1", "norm2"):
            sd[f"{pre}.{ln}.weight"] = np.ones(E, np.float32)
            sd[f"{pre}.{ln}.bias"] = np.zeros(E, np.float32)
        sd[f"{pre}.mlp.fc1.weight"] = rng.normal(size=(2 * E, E)).astype(np.float32)
        sd[f"{pre}.mlp.fc1.bias"] = rng.normal(size=(2 * E,)).astype(np.float32)
        sd[f"{pre}.mlp.fc2.weight"] = rng.normal(size=(E, 2 * E)).astype(np.float32)
        sd[f"{pre}.mlp.fc2.bias"] = rng.normal(size=(E,)).astype(np.float32)

    v_params = convert_openclip_siglip_vision(sd, L)
    vcfg = VisionTowerConfig(image_size=S, patch_size=P, width=E, layers=L, heads=H,
                             mlp_ratio=2.0, embed_dim=E, act="gelu_tanh",
                             use_class_token=False, patch_bias=True, pre_ln=False,
                             pool="map", layer_norm_eps=1e-6, compute_dtype="float32")
    vm = VisionTransformer(cfg=vcfg)
    v_init = jax.jit(vm.init)({"params": jax.random.PRNGKey(0)},
                              np.zeros((1, S, S, 3), np.float32))["params"]
    assert tree_spec(v_params) == tree_spec(v_init)
    out = jax.jit(lambda p, x: vm.apply({"params": p}, x))(
        v_params, np.random.default_rng(3).normal(size=(2, S, S, 3)).astype(np.float32))
    assert np.isfinite(np.asarray(out)).all()


def test_registry_local_hf_dir(tmp_path):
    """'transformers:<local_dir>' specs derive an EmbedderArch from the HF
    config.json (zero-egress path for any on-disk CLIP checkpoint)."""
    import json

    from novic_tpu.embedders.registry import lookup

    cfg = {
        "model_type": "clip",
        "projection_dim": 64,
        "vision_config": {"hidden_size": 96, "num_hidden_layers": 3,
                          "num_attention_heads": 4, "intermediate_size": 384,
                          "image_size": 112, "patch_size": 16,
                          "hidden_act": "quick_gelu"},
        "text_config": {"hidden_size": 64, "num_hidden_layers": 2,
                        "num_attention_heads": 2, "intermediate_size": 256,
                        "vocab_size": 1000, "max_position_embeddings": 77,
                        "hidden_act": "quick_gelu"},
    }
    (tmp_path / "config.json").write_text(json.dumps(cfg))
    arch = lookup(f"transformers:{tmp_path}")
    assert arch.vision.width == 96 and arch.vision.layers == 3
    assert arch.vision.image_size == 112 and arch.vision.embed_dim == 64
    assert arch.text.vocab_size == 1000 and arch.text.causal
    assert arch.vision.mlp_ratio == 4.0
    assert arch.family == "clip" and arch.tokenizer == "clip_bpe"
    # unknown specs still raise
    import pytest as _pytest

    with _pytest.raises(ValueError, match="Unknown embedder spec"):
        lookup("transformers:/nonexistent/dir")
