"""Device (XLA) vs host (PIL) preprocessing consistency: the two paths must
be interchangeable (caches built on host, serving preprocesses on device —
ref infer.py:293 / embedders.py get_image_transform). Measured agreement is
sub-pixel (mean ~0.3/255); tolerances hold 3-5x headroom."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from novic_tpu.embedders.preprocess import (
    CLIP_MEAN,
    CLIP_STD,
    PreprocessConfig,
    preprocess_pil_host,
    preprocess_uint8_device,
)


@pytest.fixture(scope="module")
def images():
    pytest.importorskip("PIL")
    rng = np.random.default_rng(0)
    base = jnp.asarray(rng.normal(0, 1, size=(4, 40, 40, 3)))
    up = jax.image.resize(base, (4, 320, 288, 3), "cubic") * 60 + 128
    return np.asarray(jnp.clip(up, 0, 255)).astype(np.uint8)


@pytest.mark.parametrize("mode", ["squash", "shortest"])
def test_device_matches_pil(images, mode):
    cfg = PreprocessConfig(size=224, resize_mode=mode, mean=CLIP_MEAN, std=CLIP_STD)
    dev = np.asarray(jax.jit(lambda x: preprocess_uint8_device(x, cfg))(jnp.asarray(images)))
    host = preprocess_pil_host(list(images), cfg)
    assert dev.shape == host.shape == (4, 224, 224, 3)
    d = np.abs(dev - host)
    assert d.mean() < 0.02
    assert np.quantile(d, 0.99) < 0.05
    assert d.max() < 0.15


def test_shortest_upscale_and_portrait(images):
    """Upsampling (size > source) and portrait aspect both produce SxS crops."""
    cfg = PreprocessConfig(size=384, resize_mode="shortest", mean=CLIP_MEAN, std=CLIP_STD)
    dev = np.asarray(preprocess_uint8_device(jnp.asarray(images), cfg))
    host = preprocess_pil_host(list(images), cfg)
    assert dev.shape == host.shape == (4, 384, 384, 3)
    assert np.abs(dev - host).mean() < 0.03
    portrait = np.swapaxes(images, 1, 2)  # (4, 288, 320) -> portrait
    cfg2 = PreprocessConfig(size=224, resize_mode="shortest", mean=CLIP_MEAN, std=CLIP_STD)
    dev2 = np.asarray(preprocess_uint8_device(jnp.asarray(portrait), cfg2))
    host2 = preprocess_pil_host(list(portrait), cfg2)
    assert np.abs(dev2 - host2).mean() < 0.02
