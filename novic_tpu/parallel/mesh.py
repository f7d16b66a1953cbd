"""Device mesh + sharding helpers.

New TPU-first design work (the reference is single-device, SURVEY.md §2.13):
the 12M-param object decoder trains data-parallel with replicated parameters —
batch sharded over a 1-axis 'data' mesh, gradients all-reduced by XLA over ICI
(psum inserted automatically by jit given the output shardings). Embedder
inference shards the image batch the same way.

The helpers are deliberately general: a second 'model' axis is accepted for
future tensor-parallel tower sharding (the big ViT towers are the only
components that could ever need it).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(devices: Optional[Sequence] = None, axis_names: tuple = ("data",),
                shape: Optional[tuple] = None) -> Mesh:
    """1-axis data mesh over all devices by default."""
    devices = list(devices) if devices is not None else jax.devices()
    import numpy as np

    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names)


def dp_shardings(mesh: Mesh) -> tuple[NamedSharding, NamedSharding]:
    """(replicated, batch-sharded) shardings for pure data parallelism."""
    replicated = NamedSharding(mesh, P())
    batch_sharded = NamedSharding(mesh, P("data"))
    return replicated, batch_sharded


def shard_batch_spec(batch, batch_sharded: NamedSharding, replicated: NamedSharding):
    """Per-leaf shardings for a (embed, target, mask, weight) batch pytree:
    leading-axis sharded, None leaves pass through."""
    return jax.tree.map(lambda x: batch_sharded if x is not None else None, batch,
                        is_leaf=lambda x: x is None)
