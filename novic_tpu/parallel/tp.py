"""Tensor-parallel sharding for the CLIP-family towers (Megatron-style TP).

New TPU-first capability beyond the reference (which is single-device,
SURVEY.md §2.13): the big vision/text towers (ViT-H DFN5B, SO400M) can shard
their attention heads and MLP hidden dim over a 'model' mesh axis, cutting
single-image latency by ~the axis size at the cost of two ICI all-reduces
per block — the classic Megatron column/row-parallel split, expressed purely
as GSPMD parameter shardings: XLA propagates the activation shardings and
inserts the collectives.

Layout (torch-layout weights, (out_features, in_features)):
  q/k/v proj + MLP fc1 : column-parallel  -> P(axis, None), bias P(axis)
  out_proj + MLP fc2   : row-parallel     -> P(None, axis), bias replicated
  embeddings / norms / pooling probe / final projection: replicated

Requirements: heads % axis_size == 0 and mlp_dim % axis_size == 0 (every
registered tower satisfies this for axis sizes 2/4/8; validated at
placement). Works with a pure ('model',) mesh (batch replicated) or a 2-D
('data', 'model') mesh (batch sharded on 'data') — specs here only name the
'model' axis, so both compose.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Leaf-name -> (column|row|bias_col|replicated) classification.
# fc1_g/fc1_x/mlp_norm cover the EVA02 trunk (embedders/eva.py): SwiGLU's
# inner LN runs over the TP-sharded hidden dim — GSPMD inserts the
# cross-shard mean/var collectives, one extra all-reduce per block. Fused-qkv
# torch checkpoints are split into separate q/k/v at conversion (eva.py,
# convert.py) precisely so column-parallel sharding never crosses the
# q/k/v boundary.
_COLUMN = ("q_proj_weight", "k_proj_weight", "v_proj_weight", "fc1_weight",
           "map_fc1_weight", "fc1_g_weight", "fc1_x_weight")
_COLUMN_BIAS = ("q_proj_bias", "k_proj_bias", "v_proj_bias", "fc1_bias",
                "map_fc1_bias", "fc1_g_bias", "fc1_x_bias",
                "mlp_norm_weight", "mlp_norm_bias")
_ROW = ("out_proj_weight", "fc2_weight", "map_fc2_weight")


def tp_param_spec(path: tuple, leaf, axis: str) -> P:
    """PartitionSpec for one tower parameter leaf by its name."""
    name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
    if name in _COLUMN:
        return P(axis, None)
    if name in _COLUMN_BIAS:
        return P(axis)
    if name in _ROW:
        return P(None, axis)
    return P()


def tp_tower_shardings(params, mesh: Mesh, axis: str = "model"):
    """Pytree of NamedShardings implementing Megatron TP for a tower."""
    if axis not in mesh.axis_names:
        raise ValueError(f"Mesh has no '{axis}' axis: {mesh.axis_names}")
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, tp_param_spec(path, leaf, axis)),
        params)


def validate_tp_divisibility(vision_cfg=None, text_cfg=None, *, axis_size: int):
    """Heads and MLP hidden dims must split evenly over the model axis."""
    for name, cfg in (("vision", vision_cfg), ("text", text_cfg)):
        if cfg is None:
            continue
        if cfg.heads % axis_size:
            raise ValueError(
                f"{name} tower heads ({cfg.heads}) not divisible by the "
                f"model-axis size ({axis_size})")
        if cfg.mlp_dim % axis_size:
            raise ValueError(
                f"{name} tower mlp_dim ({cfg.mlp_dim}) not divisible by the "
                f"model-axis size ({axis_size})")


def place_tower_params_tp(params, mesh: Mesh, axis: str = "model"):
    """device_put a tower param pytree into its TP layout."""
    return jax.device_put(params, tp_tower_shardings(params, mesh, axis))
