"""Pallas fused attention: parity with the XLA path (interpret mode on the CPU
test mesh; compiles natively on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from novic_tpu.ops.attention import fused_attention, xla_attention


@pytest.mark.parametrize("S", [64, 100, 196])
def test_fused_attention_parity(S):
    rng = np.random.default_rng(0)
    B, H, hd = 2, 4, 64
    q = jnp.asarray(rng.normal(size=(B, S, H, hd)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, H, hd)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, H, hd)), jnp.float32)
    ref = np.asarray(xla_attention(q, k, v))
    out = np.asarray(fused_attention(q, k, v, interpret=True))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)


def test_fused_attention_causal_bias():
    rng = np.random.default_rng(1)
    B, S, H, hd = 2, 48, 4, 32
    q = jnp.asarray(rng.normal(size=(B, S, H, hd)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, H, hd)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, H, hd)), jnp.float32)
    i = jnp.arange(S)
    bias = jnp.where(i[None, :] <= i[:, None], 0.0, -1e30).astype(jnp.float32)
    ref = np.asarray(xla_attention(q, k, v, bias))
    out = np.asarray(fused_attention(q, k, v, bias, interpret=True))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)
    # Causality actually enforced: output at position 0 only depends on k/v[0]
    v2 = v.at[:, 1:].set(0.0)
    out2 = np.asarray(fused_attention(q, k, v2, bias, interpret=True))
    np.testing.assert_allclose(out[:, 0], out2[:, 0], atol=1e-5)


def test_tower_with_pallas_attention():
    """VisionTransformer forward with use_pallas_attention matches the XLA path."""
    from novic_tpu.embedders.vit import VisionTowerConfig, VisionTransformer

    # interpret-mode pallas inside a tower: only feasible by monkeypatching the
    # interpret flag, so instead compare two towers sharing params where the
    # pallas path runs interpreted
    import novic_tpu.ops.attention as attn_mod

    orig = attn_mod.fused_attention

    def interp(q, k, v, bias=None, **kw):
        return orig(q, k, v, bias, interpret=True)

    attn_mod.fused_attention = interp
    try:
        # float32 compute: the XLA path's score tensor stays f32 there, matching
        # the f32 Pallas kernel (bf16 compute now quantizes scores to bf16 on
        # the XLA path, a deliberate traffic optimization the kernel lacks)
        cfg_x = VisionTowerConfig(image_size=32, patch_size=16, width=64, layers=2, heads=4,
                                  embed_dim=32, act="gelu_tanh", use_class_token=False,
                                  patch_bias=True, pre_ln=False, pool="map",
                                  layer_norm_eps=1e-6, compute_dtype="float32")
        cfg_p = type(cfg_x)(**{**cfg_x.__dict__, "use_pallas_attention": True})
        mx = VisionTransformer(cfg=cfg_x)
        mp = VisionTransformer(cfg=cfg_p)
        rng = np.random.default_rng(2)
        imgs = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
        params = jax.jit(mx.init)({"params": jax.random.PRNGKey(0)}, imgs)["params"]
        out_x = np.asarray(jax.jit(lambda p, x: mx.apply({"params": p}, x))(params, imgs))
        out_p = np.asarray(jax.jit(lambda p, x: mp.apply({"params": p}, x))(params, imgs))
        np.testing.assert_allclose(out_p, out_x, atol=5e-3, rtol=5e-3)
    finally:
        attn_mod.fused_attention = orig
