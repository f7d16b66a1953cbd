"""W8A8 quantized dense (novic_tpu/ops/int8_matmul.py): quantization
round-trip accuracy, XLA/Pallas impl agreement, and shape/padding edges."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from novic_tpu.ops.int8_matmul import (int8_dense, int8_matmul_pallas,
                                       quantize_rows, quantize_weight)


def test_quantize_weight_roundtrip():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(96, 64)).astype(np.float32) * rng.uniform(0.1, 3.0, size=(96, 1))
    wq, sw = quantize_weight(jnp.asarray(w))
    assert wq.dtype == jnp.int8 and sw.shape == (96,)
    deq = np.asarray(wq, np.float32) * np.asarray(sw)[:, None]
    # Symmetric per-channel int8: max relative error ~= 1/254 per channel max
    err = np.abs(deq - w).max(axis=1) / np.abs(w).max(axis=1)
    assert err.max() < 1.0 / 127.0


def test_int8_dense_close_to_f32():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(40, 64)).astype(np.float32)
    w = rng.normal(size=(96, 64)).astype(np.float32)
    b = rng.normal(size=(96,)).astype(np.float32)
    wq, sw = quantize_weight(jnp.asarray(w))
    y = np.asarray(int8_dense(jnp.asarray(x), wq, sw, jnp.asarray(b)))
    ref = x @ w.T + b
    # W8A8 error at K=64: relative Frobenius error well under 1%
    rel = np.linalg.norm(y - ref) / np.linalg.norm(ref)
    assert rel < 0.01, rel
    cos = (y.ravel() @ ref.ravel()) / (np.linalg.norm(y) * np.linalg.norm(ref))
    assert cos > 0.9999


def test_int8_dense_leading_dims_and_no_bias():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(3, 5, 32)).astype(np.float32)
    w = rng.normal(size=(48, 32)).astype(np.float32)
    wq, sw = quantize_weight(jnp.asarray(w))
    y = int8_dense(jnp.asarray(x), wq, sw, None)
    assert y.shape == (3, 5, 48)
    flat = int8_dense(jnp.asarray(x.reshape(-1, 32)), wq, sw, None)
    np.testing.assert_allclose(np.asarray(y).reshape(-1, 48), np.asarray(flat),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("m,k,n,bk", [(64, 128, 256, 0), (40, 70, 200, 0),
                                      (512, 1280, 640, 0),
                                      # bk not dividing K: K pads to whole blocks
                                      (128, 1280, 256, 512),
                                      # M not a multiple of the 32-sublane tile
                                      (257, 384, 256, 0)])
def test_pallas_matmul_matches_xla(m, k, n, bk):
    rng = np.random.default_rng(3)
    xq = jnp.asarray(rng.integers(-127, 128, size=(m, k)), jnp.int8)
    wq = jnp.asarray(rng.integers(-127, 128, size=(k, n)), jnp.int8)
    want = jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    got = int8_matmul_pallas(xq, wq, bm=64, bn=128, bk=bk, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_quantized_tower_embedding_cosine():
    """The int8 serving mode must track the unquantized tower: unit-embedding
    cosine > 0.995 on a random-weight tower (the agreement gate's in-test
    stand-in; real-checkpoint agreement runs via exp/validate_released.py)."""
    from novic_tpu.embedders.vit import VisionTowerConfig, VisionTransformer

    cfg = VisionTowerConfig(image_size=64, patch_size=16, width=128, layers=3, heads=4,
                            embed_dim=96, compute_dtype="float32")
    model = VisionTransformer(cfg=cfg)
    imgs = np.random.default_rng(0).normal(size=(4, 64, 64, 3)).astype(np.float32)
    params = jax.jit(model.init)({"params": jax.random.PRNGKey(0)},
                                 jnp.zeros((1, 64, 64, 3)))["params"]
    out = np.asarray(model.apply({"params": params}, imgs))
    qcfg = dataclasses_replace(cfg, quant="int8")
    outq = np.asarray(VisionTransformer(cfg=qcfg).apply({"params": params}, imgs))
    a = out / np.linalg.norm(out, axis=1, keepdims=True)
    b = outq / np.linalg.norm(outq, axis=1, keepdims=True)
    assert (a * b).sum(axis=1).min() > 0.995


def dataclasses_replace(cfg, **kw):
    import dataclasses

    return dataclasses.replace(cfg, **kw)


def test_int8_dense_impls_agree():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(33, 48)).astype(np.float32)
    w = rng.normal(size=(56, 48)).astype(np.float32)
    wq, sw = quantize_weight(jnp.asarray(w))
    y_xla = np.asarray(int8_dense(jnp.asarray(x), wq, sw, None, impl="xla"))
    y_pl = np.asarray(int8_dense(jnp.asarray(x), wq, sw, None, impl="pallas",
                                 interpret=True))
    np.testing.assert_allclose(y_xla, y_pl, rtol=1e-6, atol=1e-6)
