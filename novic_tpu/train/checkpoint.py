"""Checkpoint save/load: native .npz format + reference torch-pickle interop.

Reference checkpoint schema (reference train.py:1450-1473): a flat dict with
keys cfg_flat, target_config, data_config, model_state_dict, target_nouns,
num_invalid_target_nouns (+ train-only: train_loop_config, train_loop_state,
optimizer_type, optimizer_state_dict, scheduler_*_state_dict, amp_scaler_*).
File naming outputs/ovod_<stamp>/ovod_chunk####_<stamp>.{train|model}.

Native format: one .npz with flattened arrays + a JSON metadata entry —
torch-free, mmap-friendly, and byte-stable. Torch interop (reading the
released ovod_*.train/.model pickles and writing reference-compatible ones)
is gated on torch availability; the conversion maps the reference's
state-dict names onto our parameter tree (see PARAM_NAME_MAP).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Optional

import numpy as np

from novic_tpu.models.config import DecoderModelConfig
from novic_tpu.text.target import TargetConfig
from novic_tpu.utils.logger import log
from novic_tpu.utils.misc import flatten_dict, unflatten_dict

# ---------------------------------------------------------------------------
# Reference (torch) state-dict name mapping for PrefixedIterDecoder
# ---------------------------------------------------------------------------

# reference name (embedding_decoder.py modules) → our param path
# MLP: the reference's nn.Sequential indices depend on the hidden-layer
# configuration, handled dynamically in _torch_key_to_ours.


def _torch_key_to_ours(key: str, mlp_has_hidden: bool, mlp_has_norm: bool) -> Optional[str]:
    if key == "causality_mask":
        return None  # constant buffer, rebuilt from config
    if key == "logits_linear.weight":
        return "logits_weight"
    if key == "logits_linear.bias":
        return "logits_bias"
    if key == "token_embedding.weight":
        return "token_embedding"
    if key == "pos_embedding.embedding.weight":
        return "pos_embedding"
    if key.startswith("embed_mlp.mlp."):
        idx, _, leaf = key[len("embed_mlp.mlp."):].partition(".")
        idx = int(idx)
        if not mlp_has_hidden:
            name = "linear1"
        else:
            # Sequential: [linear1, (norm), activation, linear2, (dropout)]
            norm_idx = 1 if mlp_has_norm else None
            linear2_idx = 3 if mlp_has_norm else 2
            if idx == 0:
                name = "linear1"
            elif norm_idx is not None and idx == norm_idx:
                name = "norm"
            elif idx == linear2_idx:
                name = "linear2"
            else:
                raise ValueError(f"Unexpected MLP sequential index in checkpoint key: {key}")
        return f"embed_mlp.{name}_{leaf}"
    if key.startswith("transformer.layers."):
        rest = key[len("transformer.layers."):]
        layer, _, sub = rest.partition(".")
        mapping = {
            "self_attn.in_proj_weight": "self_attn_in_proj_weight",
            "self_attn.in_proj_bias": "self_attn_in_proj_bias",
            "self_attn.out_proj.weight": "self_attn_out_proj_weight",
            "self_attn.out_proj.bias": "self_attn_out_proj_bias",
            "linear1.weight": "linear1_weight",
            "linear1.bias": "linear1_bias",
            "linear2.weight": "linear2_weight",
            "linear2.bias": "linear2_bias",
            "norm1.weight": "norm1_weight",
            "norm1.bias": "norm1_bias",
            "norm2.weight": "norm2_weight",
            "norm2.bias": "norm2_bias",
            "scale1": "scale1",
            "scale2": "scale2",
        }
        if sub not in mapping:
            raise ValueError(f"Unknown transformer-layer checkpoint key: {key}")
        return f"transformer.layers_{layer}.{mapping[sub]}"
    if key == "transformer.norm.weight":
        return "transformer.norm_weight"
    if key == "transformer.norm.bias":
        return "transformer.norm_bias"
    raise ValueError(f"Unknown checkpoint key: {key}")


def torch_state_dict_to_params(state_dict: dict[str, Any], cfg: DecoderModelConfig) -> dict:
    """Reference PrefixedIterDecoder state dict → our params pytree."""
    mlp_has_hidden = cfg.mlp_hidden_layer != "none"
    flat = {}
    for key, value in state_dict.items():
        ours = _torch_key_to_ours(key, mlp_has_hidden, cfg.mlp_hidden_norm)
        if ours is None:
            continue
        arr = np.asarray(value.detach().cpu().numpy() if hasattr(value, "detach") else value)
        flat[ours] = arr.astype(np.float32)
    return unflatten_dict(flat)


def params_to_torch_state_dict(params: dict, cfg: DecoderModelConfig) -> dict:
    """Inverse mapping: our params pytree → reference state-dict names (numpy values)."""
    mlp_has_hidden = cfg.mlp_hidden_layer != "none"
    out = {}
    for path, arr in flatten_dict(params).items():
        if path == "logits_weight":
            key = "logits_linear.weight"
        elif path == "logits_bias":
            key = "logits_linear.bias"
        elif path == "token_embedding":
            key = "token_embedding.weight"
        elif path == "pos_embedding":
            key = "pos_embedding.embedding.weight"
        elif path.startswith("embed_mlp."):
            name, _, leaf = path[len("embed_mlp."):].rpartition("_")
            if not mlp_has_hidden:
                idx = 0
            else:
                idx = {"linear1": 0, "norm": 1 if cfg.mlp_hidden_norm else None,
                       "linear2": 3 if cfg.mlp_hidden_norm else 2}[name]
            key = f"embed_mlp.mlp.{idx}.{leaf}"
        elif path.startswith("transformer.layers_"):
            rest = path[len("transformer.layers_"):]
            layer, _, sub = rest.partition(".")
            inverse = {
                "self_attn_in_proj_weight": "self_attn.in_proj_weight",
                "self_attn_in_proj_bias": "self_attn.in_proj_bias",
                "self_attn_out_proj_weight": "self_attn.out_proj.weight",
                "self_attn_out_proj_bias": "self_attn.out_proj.bias",
                "linear1_weight": "linear1.weight",
                "linear1_bias": "linear1.bias",
                "linear2_weight": "linear2.weight",
                "linear2_bias": "linear2.bias",
                "norm1_weight": "norm1.weight",
                "norm1_bias": "norm1.bias",
                "norm2_weight": "norm2.weight",
                "norm2_bias": "norm2.bias",
                "scale1": "scale1",
                "scale2": "scale2",
            }
            key = f"transformer.layers.{layer}.{inverse[sub]}"
        elif path == "transformer.norm_weight":
            key = "transformer.norm.weight"
        elif path == "transformer.norm_bias":
            key = "transformer.norm.bias"
        else:
            raise ValueError(f"Unknown param path: {path}")
        out[key] = np.asarray(arr)
    # The reference registers the causal mask as a persistent buffer, so a
    # strict state-dict load requires it (ref embedding_decoder.py:651-654:
    # upper-triangular -inf over max_seq_len, prefix block un-masked unless
    # strictly_causal). Derived from config, not learned.
    L = cfg.mlp_seq_len + cfg.token_length - 1
    mask = np.triu(np.full((L, L), -np.inf, dtype=np.float32), k=1)
    if not cfg.strictly_causal:
        mask[:cfg.mlp_seq_len, :cfg.mlp_seq_len] = 0.0
    out["causality_mask"] = mask
    return out


# ---------------------------------------------------------------------------
# Native checkpoint format
# ---------------------------------------------------------------------------


def save_checkpoint(
    path: str,
    *,
    params: dict,
    cfg_flat: dict,
    model_config: DecoderModelConfig,
    target_config: TargetConfig,
    data_config: dict,
    target_nouns: tuple,
    num_invalid_target_nouns: int,
    opt_state_arrays: Optional[dict] = None,
    train_meta: Optional[dict] = None,
):
    """Write a native .npz checkpoint (arrays + one JSON metadata entry)."""
    import jax

    arrays = {f"params.{k}": np.asarray(v) for k, v in flatten_dict(
        jax.tree.map(np.asarray, params)).items()}
    if opt_state_arrays is not None:
        # Optimizer state is an arbitrary optax pytree: store its leaves in
        # deterministic tree-flatten order (restored against the live treedef)
        leaves = jax.tree.leaves(opt_state_arrays)
        arrays.update({f"opt.{i:05d}": np.asarray(v) for i, v in enumerate(leaves)})
    meta = {
        "format": "novic_tpu.checkpoint.v1",
        "cfg_flat": cfg_flat,
        "model_config": model_config.as_dict(),
        "target_config": target_config.as_jsonable(),
        "data_config": data_config,
        "target_nouns": list(target_nouns),
        "num_invalid_target_nouns": num_invalid_target_nouns,
        "train_meta": train_meta or {},
        "saved_unix_time": time.time(),
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, __meta__=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8), **arrays)
    os.replace(tmp, path)  # atomic commit
    log.info(f"Saved checkpoint: {path}")


def load_checkpoint(path: str) -> dict:
    """Load a native checkpoint (.npz file or orbax directory) → dict with
    params/meta/opt arrays."""
    if os.path.isdir(path):
        return load_checkpoint_orbax(path)
    data = np.load(path, allow_pickle=False)
    meta = json.loads(bytes(data["__meta__"]).decode())
    if meta.get("format") != "novic_tpu.checkpoint.v1":
        raise ValueError(f"Unsupported checkpoint format in {path}")
    params_flat = {k[len("params."):]: data[k] for k in data.files if k.startswith("params.")}
    opt_keys = sorted(k for k in data.files if k.startswith("opt."))
    opt_leaves = [data[k] for k in opt_keys] or None
    return {
        "meta": meta,
        "params": unflatten_dict(params_flat),
        "opt_arrays": opt_leaves,
        "model_config": DecoderModelConfig.from_dict(meta["model_config"]),
        "target_config": TargetConfig.from_jsonable(meta["target_config"]),
        "target_nouns": tuple(meta["target_nouns"]),
        "num_invalid_target_nouns": meta["num_invalid_target_nouns"],
        "cfg_flat": meta["cfg_flat"],
        "data_config": meta["data_config"],
        "train_meta": meta["train_meta"],
    }


# ---------------------------------------------------------------------------
# Orbax backend (async-capable, sharding-aware; directory checkpoints)
# ---------------------------------------------------------------------------

_ORBAX_META = "novic_meta.json"


def save_checkpoint_orbax(path: str, *, params: dict, cfg_flat: dict,
                          model_config: DecoderModelConfig, target_config: TargetConfig,
                          data_config: dict, target_nouns: tuple,
                          num_invalid_target_nouns: int,
                          opt_state_arrays: Optional[dict] = None,
                          train_meta: Optional[dict] = None):
    """Write an Orbax directory checkpoint (same schema as the .npz format).

    Orbax restores arrays with their shardings on multi-host meshes, which the
    .npz path cannot; use checkpoint_format=orbax for large multi-chip runs."""
    import jax
    import orbax.checkpoint as ocp

    tree = {"params": jax.tree.map(np.asarray, params)}
    if opt_state_arrays is not None:
        tree["opt"] = [np.asarray(v) for v in jax.tree.leaves(opt_state_arrays)]
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, tree, force=True)
    meta = {
        "format": "novic_tpu.checkpoint.v1",
        "cfg_flat": cfg_flat,
        "model_config": model_config.as_dict(),
        "target_config": target_config.as_jsonable(),
        "data_config": data_config,
        "target_nouns": list(target_nouns),
        "num_invalid_target_nouns": num_invalid_target_nouns,
        "train_meta": train_meta or {},
        "saved_unix_time": time.time(),
    }
    with open(os.path.join(path, _ORBAX_META), "w") as f:
        f.write(json.dumps(meta))
    log.info(f"Saved orbax checkpoint: {path}")


def load_checkpoint_orbax(path: str) -> dict:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with open(os.path.join(path, _ORBAX_META)) as f:
        meta = json.load(f)
    if meta.get("format") != "novic_tpu.checkpoint.v1":
        raise ValueError(f"Unsupported checkpoint format in {path}")
    with ocp.StandardCheckpointer() as ckptr:
        tree = ckptr.restore(path)
    return {
        "meta": meta,
        "params": tree["params"],
        "opt_arrays": tree.get("opt"),
        "model_config": DecoderModelConfig.from_dict(meta["model_config"]),
        "target_config": TargetConfig.from_jsonable(meta["target_config"]),
        "target_nouns": tuple(meta["target_nouns"]),
        "num_invalid_target_nouns": meta["num_invalid_target_nouns"],
        "cfg_flat": meta["cfg_flat"],
        "data_config": meta["data_config"],
        "train_meta": meta["train_meta"],
    }


# ---------------------------------------------------------------------------
# Reference torch-pickle interop (gated on torch)
# ---------------------------------------------------------------------------


def load_reference_checkpoint(path: str) -> dict:
    """Load a reference ovod_*.train/.model torch checkpoint → normalized dict.

    Returns params (converted tree), target_config, target_nouns, cfg_flat.
    The reference's checkpoints pickle only builtin/torch classes
    (ref utils.py:484-537 TorchSaveClasses audit + train.py:1475 enforcement),
    so the native restricted unpickler (novic_tpu.train.torch_pickle — no
    torch import, tensors land as numpy) handles them; torch.load is only a
    fallback for legacy/exotic files.
    """
    import pickle
    import zipfile

    try:
        from novic_tpu.train.torch_pickle import load_torch_pickle

        ckpt = load_torch_pickle(path)
    except pickle.UnpicklingError:
        # The restricted unpickler REFUSED a class reference — never re-load
        # such a file through a more permissive path.
        raise
    except (zipfile.BadZipFile, StopIteration, KeyError) as e:
        # Structural/format errors only (legacy non-zip torch format):
        # weights_only keeps the fallback restricted to tensor/container types.
        log.warning(f"Native torch-pickle reader failed ({e}) => torch.load(weights_only=True)")
        import torch

        ckpt = torch.load(path, map_location="cpu", weights_only=True)
    cfg_flat = dict(ckpt["cfg_flat"])

    # Rebuild model config from the reference's flat cfg keys
    tc_dict = ckpt["target_config"]
    if hasattr(tc_dict, "__dataclass_fields__"):
        import dataclasses

        tc_dict = dataclasses.asdict(tc_dict)
    tc_json = {}
    for k, v in tc_dict.items():
        if hasattr(v, "numpy"):
            v = v.numpy().tolist()
        elif str(type(v)).startswith("<class 'torch."):
            v = str(v)
        tc_json[k] = v
    target_config = TargetConfig.from_jsonable(tc_json)

    model_config = DecoderModelConfig.from_dict(
        {k: cfg_flat[k] for k in DecoderModelConfig.__dataclass_fields__ if k in cfg_flat},
        embed_dim=int(cfg_flat.get("embed_dim", 0) or next(
            v.shape[1] for k, v in ckpt["model_state_dict"].items()
            if k.startswith("embed_mlp.mlp.0.weight"))),
        vocab_size=target_config.vocab_size,
        token_length=target_config.token_length,
    )

    params = torch_state_dict_to_params(ckpt["model_state_dict"], model_config)

    # .train checkpoints carry the loop state (ref train.py:948-974); map the
    # intersecting fields so training can RESUME from a reference checkpoint.
    train_meta = {}
    ref_loop = ckpt.get("train_loop_state")
    if isinstance(ref_loop, dict):
        from novic_tpu.train.loop import TrainLoopState

        fields = set(TrainLoopState.__dataclass_fields__)
        loop_state = {}
        for k, v in ref_loop.items():
            if k in fields:
                loop_state[k] = v.item() if hasattr(v, "item") else v
        if loop_state:
            train_meta["loop_state"] = loop_state

    opt_arrays = _convert_reference_optimizer_state(ckpt, model_config, params, cfg_flat)
    return {
        "params": params,
        "model_config": model_config,
        "target_config": target_config,
        "target_nouns": tuple(ckpt["target_nouns"]),
        "num_invalid_target_nouns": int(ckpt.get("num_invalid_target_nouns", 0)),
        "cfg_flat": cfg_flat,
        "data_config": ckpt.get("data_config"),
        "train_meta": train_meta,
        "opt_arrays": opt_arrays,
    }


def _convert_reference_optimizer_state(ckpt: dict, model_config: DecoderModelConfig,
                                       params: dict, cfg_flat: dict):
    """Reference torch-AdamW optimizer state → our optax leaf list (or None).

    Torch indexes optimizer state by global param position across param
    groups; the reference builds the groups as [1D no-decay params, ND decay
    params], each in model.parameters() order (= state-dict order minus
    buffers, ref train.py:1103-1116). The exp_avg/exp_avg_sq moments then
    convert through the same name mapping as the params (pure renames — both
    layouts are torch layout), and are grafted into a freshly-initialized
    optax state whose flat leaves the training loop restores.
    """
    opt_sd = ckpt.get("optimizer_state_dict")
    if not isinstance(opt_sd, dict) or not opt_sd.get("state"):
        return None
    opt_type = str(ckpt.get("optimizer_type", "AdamW"))
    if "AdamW" not in opt_type:
        log.warning(f"Reference optimizer {opt_type} is not AdamW => optimizer restarts")
        return None

    sd = ckpt["model_state_dict"]
    param_keys = [k for k in sd if k != "causality_mask"]

    def _ndim(k):
        return np.asarray(sd[k]).ndim

    if bool(cfg_flat.get("weight_decay_1d", False)):
        ordered = param_keys
    else:
        ordered = ([k for k in param_keys if _ndim(k) < 2]
                   + [k for k in param_keys if _ndim(k) >= 2])

    state_items = opt_sd["state"]
    if len(state_items) != len(ordered):
        log.warning(f"Reference optimizer state covers {len(state_items)}/"
                    f"{len(ordered)} params => optimizer restarts")
        return None
    mu_sd, nu_sd = {}, {}
    step = 0
    try:
        for idx, st in state_items.items():
            key = ordered[int(idx)]
            mu_sd[key] = st["exp_avg"]
            nu_sd[key] = st["exp_avg_sq"]
            s = st.get("step", 0)
            step = max(step, int(s.item() if hasattr(s, "item") else s))
        mu = torch_state_dict_to_params(mu_sd, model_config)
        nu = torch_state_dict_to_params(nu_sd, model_config)
    except (KeyError, IndexError, ValueError, TypeError) as e:
        log.warning(f"Could not convert reference optimizer state ({e}) => "
                    f"optimizer restarts")
        return None

    import jax
    import jax.numpy as jnp

    from novic_tpu.train.optim import create_optimizer

    tx = create_optimizer(
        beta1=float(cfg_flat.get("beta1", 0.9)),
        beta2=float(cfg_flat.get("beta2", 0.95)),
        weight_decay=float(cfg_flat.get("weight_decay", 0.1)),
        weight_decay_1d=bool(cfg_flat.get("weight_decay_1d", False)))
    fresh = tx.init(jax.tree.map(jnp.asarray, params))
    adam = fresh.inner_state[0]
    adam = adam._replace(count=jnp.asarray(step, jnp.int32),
                         mu=jax.tree.map(jnp.asarray, mu),
                         nu=jax.tree.map(jnp.asarray, nu))
    grafted = fresh._replace(inner_state=(adam,) + tuple(fresh.inner_state[1:]))
    log.info(f"Converted reference AdamW optimizer state: {len(state_items)} "
             f"param moments at step {step}")
    return [np.asarray(x) for x in jax.tree.leaves(grafted)]


def save_reference_checkpoint(path: str, *, params: dict, model_config: DecoderModelConfig,
                              target_config: TargetConfig, target_nouns: tuple,
                              num_invalid_target_nouns: int, cfg_flat: dict,
                              data_config: Optional[dict] = None):
    """Write a reference-schema .model torch checkpoint (consumable by the
    reference's infer.py)."""
    import torch

    state_dict = {k: torch.from_numpy(np.ascontiguousarray(v))
                  for k, v in params_to_torch_state_dict(params, model_config).items()}
    # Match dataclasses.asdict(model.target_config) as written by ref
    # train.py:1445-1457: token/mask dtypes are torch.dtype objects and
    # compact maps are torch.Tensor — ref infer.py:695 does
    # torch.full(..., dtype=target_config.token_dtype) and ref
    # embedders.py indexes compact_unmap with tensors, so JSON strings/lists
    # would fail at runtime inside the reference.
    tc = target_config.as_jsonable()
    tc["token_dtype"] = getattr(torch, tc["token_dtype"])
    tc["mask_dtype"] = getattr(torch, tc["mask_dtype"])
    for key in ("compact_map", "compact_unmap"):
        if tc[key] is not None:
            tc[key] = torch.tensor(tc[key], dtype=tc["token_dtype"])
    ckpt = {
        "cfg_flat": dict(cfg_flat),
        "target_config": tc,
        "data_config": data_config,
        "model_state_dict": state_dict,
        "target_nouns": tuple(target_nouns),
        "num_invalid_target_nouns": num_invalid_target_nouns,
    }
    torch.save(ckpt, path)
    log.info(f"Saved reference-format checkpoint: {path}")


def checkpoint_dir_and_name(output_dir: str, chunk_id: int, stamp: Optional[str] = None,
                            kind: str = "train") -> str:
    """outputs/ovod_<stamp>/ovod_chunk####_<stamp>.<kind> (ref train.py:1459-1463)."""
    stamp = stamp or time.strftime("%Y%m%d_%H%M%S")
    run_dir = os.path.join(output_dir, f"ovod_{stamp}")
    os.makedirs(run_dir, exist_ok=True)
    return os.path.join(run_dir, f"ovod_chunk{chunk_id:04d}_{stamp}.{kind}")
