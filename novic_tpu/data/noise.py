"""On-device unit-sphere embedding noise augmentation.

THE mechanism that bridges the CLIP text→image modality gap during text-only
training (reference embedding_noise.py, all 5 schemes; applied on-device per
batch in the train loop, train.py:1263-1267, after optional mean-shift
train.py:1008-1026).

Pure functions of (rng key, batch of unit embeddings) → noised unit
embeddings; designed to be fused by XLA into the surrounding train step (no
separate kernel launches, no host RNG).

Released recipe (ref README:322): GaussElemUniformAngle, vec_norm=3.25,
angle 45°-75°, mix_ratio=0.15.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp


def _renorm(x: jnp.ndarray) -> jnp.ndarray:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


def gauss_elem(key: jax.Array, embed: jnp.ndarray, *, vec_norm: float) -> jnp.ndarray:
    """Add iid N(0, (vec_norm/sqrt(F))^2) per element, renormalize
    (ref embedding_noise.py:59-75)."""
    F = embed.shape[-1]
    elem_std = vec_norm / math.sqrt(F)
    if elem_std <= 0:
        raise ValueError(f"Element noise standard deviation must be positive: {elem_std:.3g}")
    return _renorm(embed + elem_std * jax.random.normal(key, embed.shape, embed.dtype))


def gauss_vec(key: jax.Array, embed: jnp.ndarray, *, vec_norm: float) -> jnp.ndarray:
    """Add a random-direction vector with N(0, vec_norm) length
    (ref embedding_noise.py:78-95)."""
    if vec_norm <= 0:
        raise ValueError(f"Vector noise norm must be positive: {vec_norm:.3g}")
    k1, k2 = jax.random.split(key)
    noise = _renorm(jax.random.normal(k1, embed.shape, embed.dtype))
    length = jax.random.normal(k2, embed.shape[:-1] + (1,), embed.dtype)
    return _renorm(embed + noise * length * vec_norm)


def _angle_rotate(key_dir: jax.Array, embed: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Rotate each unit embedding by `angle` toward a random orthogonal direction
    (ref embedding_noise.py:98-112)."""
    noise = jax.random.normal(key_dir, embed.shape, embed.dtype)
    dot = jnp.sum(embed * noise, axis=-1, keepdims=True)
    noise = _renorm(noise - embed * dot)
    return _renorm(embed * jnp.cos(angle) + noise * jnp.sin(angle))


def gauss_angle(key: jax.Array, embed: jnp.ndarray, *, angle_std: float, angle_max: float
                ) -> jnp.ndarray:
    """Rotate by clamped Gaussian angle (degrees) (ref embedding_noise.py:115-132)."""
    std_rad, max_rad = math.radians(angle_std), math.radians(angle_max)
    if std_rad <= 0 or max_rad <= 0:
        raise ValueError("Angular noise std and max must both be positive")
    k1, k2 = jax.random.split(key)
    angle = jnp.clip(std_rad * jax.random.normal(k1, embed.shape[:-1] + (1,), embed.dtype),
                     -max_rad, max_rad)
    return _angle_rotate(k2, embed, angle)


def uniform_angle(key: jax.Array, embed: jnp.ndarray, *, angle_min: float, angle_max: float
                  ) -> jnp.ndarray:
    """Rotate by U(angle_min, angle_max) degrees (ref embedding_noise.py:135-152)."""
    min_rad, max_rad = math.radians(angle_min), math.radians(angle_max)
    if min_rad > max_rad:
        raise ValueError("Minimum angular noise must be smaller than maximum angular noise")
    k1, k2 = jax.random.split(key)
    angle = jax.random.uniform(k1, embed.shape[:-1] + (1,), embed.dtype, min_rad, max_rad)
    return _angle_rotate(k2, embed, angle)


def gauss_elem_uniform_angle(key: jax.Array, embed: jnp.ndarray, *, vec_norm: float,
                             angle_min: float, angle_max: float, mix_ratio: float
                             ) -> jnp.ndarray:
    """Per-sample Bernoulli(mix_ratio) mix of UniformAngle and GaussElem
    (ref embedding_noise.py:155-173)."""
    if not 0 <= mix_ratio <= 1:
        raise ValueError(f"Mix ratio must be in [0, 1]: {mix_ratio:.3g}")
    k1, k2, k3 = jax.random.split(key, 3)
    e_angle = uniform_angle(k1, embed, angle_min=angle_min, angle_max=angle_max)
    e_elem = gauss_elem(k2, embed, vec_norm=vec_norm)
    mix = jax.random.uniform(k3, embed.shape[:-1] + (1,), embed.dtype) < mix_ratio
    return jnp.where(mix, e_angle, e_elem)


@dataclasses.dataclass(frozen=True)
class EmbeddingNoise:
    """Factory matching the reference's config surface (ref embedding_noise.py:17-42)."""

    scheme: str
    vec_norm: float = 0.0
    angle_min: float = 0.0
    angle_max: float = 0.0
    angle_std: float = 0.0
    mix_ratio: float = 0.0

    @staticmethod
    def create(scheme: str, *, embed_dim: int = 0, vec_norm: float = 0.0, angle_min: float = 0.0,
               angle_max: float = 0.0, angle_std: float = 0.0, mix_ratio: float = 0.0
               ) -> Optional["EmbeddingNoise"]:
        if not scheme:
            return None
        canon = scheme.lower()
        if canon not in ("gausselem", "gaussvec", "gaussangle", "uniformangle",
                         "gausselemuniformangle"):
            raise ValueError(f"Embedding noise scheme not recognised: {scheme}")
        return EmbeddingNoise(scheme=canon, vec_norm=vec_norm, angle_min=angle_min,
                              angle_max=angle_max, angle_std=angle_std, mix_ratio=mix_ratio)

    def __call__(self, key: jax.Array, embed: jnp.ndarray) -> jnp.ndarray:
        if self.scheme == "gausselem":
            return gauss_elem(key, embed, vec_norm=self.vec_norm)
        if self.scheme == "gaussvec":
            return gauss_vec(key, embed, vec_norm=self.vec_norm)
        if self.scheme == "gaussangle":
            return gauss_angle(key, embed, angle_std=self.angle_std, angle_max=self.angle_max)
        if self.scheme == "uniformangle":
            return uniform_angle(key, embed, angle_min=self.angle_min, angle_max=self.angle_max)
        if self.scheme == "gausselemuniformangle":
            return gauss_elem_uniform_angle(key, embed, vec_norm=self.vec_norm,
                                            angle_min=self.angle_min, angle_max=self.angle_max,
                                            mix_ratio=self.mix_ratio)
        raise ValueError(f"Unsupported embedding noise type: {self.scheme}")


def apply_mean_shift(embed: jnp.ndarray, mean_shift: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Add the measured image-minus-text modality-gap mean and renormalize
    (ref train.py:1263-1265)."""
    if mean_shift is None:
        return embed
    return _renorm(embed + mean_shift)
