"""Image preprocessing: on-device XLA path + PIL-exact host path.

The reference preprocesses on CPU with PIL per image (resize shorter side,
center crop, normalize — reference infer.py:293, embedders.py get_image_transform).
TPU-first: decode on host, then do resize/center-crop/normalize as fused XLA
ops on device (jit-compiled per input resolution; static shapes per batch).
The PIL host path is kept for bit-parity validation against the reference.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)
SIGLIP_MEAN = (0.5, 0.5, 0.5)
SIGLIP_STD = (0.5, 0.5, 0.5)


@dataclasses.dataclass(frozen=True)
class PreprocessConfig:
    size: int = 224
    resize_mode: str = "shortest"  # shortest (resize shorter side + center crop) | squash (resize to SxS)
    mean: tuple = CLIP_MEAN
    std: tuple = CLIP_STD
    interpolation: str = "bicubic"  # bicubic | bilinear | nearest
    # squash mode only: resize to resize_size² first, then center crop to
    # size² (the HF EfficientNetImageProcessor recipe ALIGN uses: 346 → 289).
    # 0 means resize directly to size².
    resize_size: int = 0


def preprocess_uint8_device(images: "jax.Array", cfg: PreprocessConfig) -> "jax.Array":
    """(B, H, W, 3) uint8 → (B, S, S, 3) float32 normalized, entirely on device.

    jit-compatible for fixed (H, W); resize uses jax.image with antialiasing
    (closely matching PIL's antialiased bicubic for downsampling).
    """
    import jax
    import jax.numpy as jnp

    B, H, W, _ = images.shape
    S = cfg.size
    x = images.astype(jnp.float32) / 255.0
    method = {"bicubic": "cubic", "bilinear": "linear", "nearest": "nearest"}[cfg.interpolation]
    antialias = method != "nearest"

    if cfg.resize_mode == "squash":
        R = cfg.resize_size or S
        x = jax.image.resize(x, (B, R, R, 3), method=method, antialias=antialias)
        if R != S:
            off = (R - S) // 2
            x = jax.lax.dynamic_slice(x, (0, off, off, 0), (B, S, S, 3))
    else:
        # Long side via truncation, matching preprocess_pil_host (which matches
        # HF image utils / torchvision F.resize short-side semantics).
        if H <= W:
            new_h, new_w = S, max(int(W * S / H), S)
        else:
            new_h, new_w = max(int(H * S / W), S), S
        x = jax.image.resize(x, (B, new_h, new_w, 3), method=method, antialias=antialias)
        top = (new_h - S) // 2
        left = (new_w - S) // 2
        x = jax.lax.dynamic_slice(x, (0, top, left, 0), (B, S, S, 3))

    mean = jnp.asarray(cfg.mean, dtype=jnp.float32)
    std = jnp.asarray(cfg.std, dtype=jnp.float32)
    return (jnp.clip(x, 0.0, 1.0) - mean) / std


def preprocess_pil_host(images: Sequence, cfg: PreprocessConfig) -> np.ndarray:
    """PIL-exact preprocessing matching the reference's CPU transform
    (resize shorter side with bicubic, center crop, normalize). Returns
    (B, S, S, 3) float32."""
    import PIL.Image

    S = cfg.size
    resample = {"bicubic": PIL.Image.Resampling.BICUBIC,
                "bilinear": PIL.Image.Resampling.BILINEAR,
                "nearest": PIL.Image.Resampling.NEAREST}[cfg.interpolation]
    out = np.empty((len(images), S, S, 3), dtype=np.float32)
    for i, img in enumerate(images):
        if not isinstance(img, PIL.Image.Image):
            img = PIL.Image.fromarray(np.asarray(img))
        img = img.convert("RGB")
        if cfg.resize_mode == "squash":
            R = cfg.resize_size or S
            img = img.resize((R, R), resample)
            if R != S:
                off = (R - S) // 2
                img = img.crop((off, off, off + S, off + S))
        else:
            w, h = img.size
            # Long side via truncation, matching HF image_processing utils and
            # torchvision F.resize short-side semantics (int(), not round()).
            if h <= w:
                new_h, new_w = S, max(int(w * S / h), S)
            else:
                new_h, new_w = max(int(h * S / w), S), S
            img = img.resize((new_w, new_h), resample)
            left = (new_w - S) // 2
            top = (new_h - S) // 2
            img = img.crop((left, top, left + S, top + S))
        out[i] = np.asarray(img, dtype=np.float32) / 255.0
    mean = np.asarray(cfg.mean, dtype=np.float32)
    std = np.asarray(cfg.std, dtype=np.float32)
    return (out - mean) / std


def load_images(paths: Sequence[str]) -> list:
    import PIL.Image

    return [PIL.Image.open(p).convert("RGB") for p in paths]
