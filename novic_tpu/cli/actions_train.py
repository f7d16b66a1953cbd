"""action=train and fix_checkpoints.

Parity with the reference train action (reference train.py:977-1479):
chunk math, mean-shift + noise, DP training, EWA metrics, checkpoint policy
and resume; fix_checkpoints retrofits missing target_nouns into legacy
checkpoints (ref train.py:1487-1643).
"""

from __future__ import annotations

import math
import os

import jax
import numpy as np

from novic_tpu.cli.common import (
    check_loaded_config,
    find_checkpoints,
    gen_data_config,
    load_embedder,
    load_embedding_dataset,
    load_mean_shift,
    make_run_dir,
    model_config_from_cfg,
    resolve_path,
    wandb_init_kwargs,
)
from novic_tpu.data.grad_accum import GradAccum
from novic_tpu.data.noise import EmbeddingNoise
from novic_tpu.models.base import count_params, create_decoder
from novic_tpu.parallel.mesh import create_mesh
from novic_tpu.train.checkpoint import load_checkpoint, save_checkpoint, save_reference_checkpoint
from novic_tpu.train.loop import (
    TrainLoopConfig,
    TrainLoopState,
    compute_chunk_batches,
    extract_opt_state_arrays,
    train,
)
from novic_tpu.utils.config import config_to_flat
from novic_tpu.utils.logger import log
from novic_tpu.utils.metrics import MetricsLogger


def action_train(cfg):
    embedder = load_embedder(cfg, load_model=False)
    dataset = load_embedding_dataset(cfg, embedder, training=True)
    dc = gen_data_config(cfg, dataset)
    loader, info = dataset.create_loader(batch_size=cfg.batch_size, training=True, seed=cfg.seed,
                                         prefetch=cfg.loader_prefetch,
                                         num_threads=int(cfg.get("dataset_workers", 4)))
    grad_accum = GradAccum(loader, info, accum_size=cfg.accum_factor, drop_last=True)

    # Chunk math (ref train.py:990): chunk = num_valid_targets * chunk_scale samples
    chunk_batches = compute_chunk_batches(dataset.num_valid_targets, cfg.chunk_scale,
                                          cfg.batch_size)
    epoch_batches = grad_accum.loader_batches
    if cfg.max_chunks > 0:
        max_chunks = cfg.max_chunks
    else:
        max_chunks = max(int(math.floor(cfg.max_epochs * epoch_batches / chunk_batches)), 1)
    log.info(f"Chunks of {chunk_batches} batches; training {max_chunks} chunks "
             f"(~{max_chunks * chunk_batches / max(epoch_batches, 1):.1f} epochs)")

    model_cfg = model_config_from_cfg(cfg, embedder)
    model, params = create_decoder(model_cfg, target_tokenizer=embedder.target_tokenizer,
                                   rng=jax.random.PRNGKey(cfg.seed))
    pc = count_params(params, model_cfg)
    unused_str = f" + {pc['unused']} unused" if pc["unused"] else ""
    log.info(f"Decoder {model_cfg.model}: {pc['used']} params{unused_str}")

    # Resume (ref train.py:1057-1101)
    S = TrainLoopState(rng_seed=cfg.seed)
    opt_arrays = None
    # load_lr_state=True resumes the checkpoint's LR schedule (its init/final
    # lr, scheduler + warmup, original cosine horizon, ref train.py:1097-1100);
    # False uses the current cfg's LR hyperparams with the warmup and cosine
    # horizon restarted at the resumed chunk (ref :1132-1146)
    lr_params = dict(init_lr=cfg.init_lr, final_lr=cfg.final_lr,
                     lr_scheduler=cfg.lr_scheduler, lr_warmup=cfg.lr_warmup)
    lr_resume_fresh = False
    ckpts = find_checkpoints(cfg)
    if ckpts:
        if ckpts[-1].endswith((".model", ".train")):
            # Reference torch checkpoint: params, loop counters AND AdamW
            # moments resume (moments convert through the same name mapping
            # as the params); the optimizer restarts only if the state is
            # absent or not AdamW
            from novic_tpu.train.checkpoint import load_reference_checkpoint

            ckpt = load_reference_checkpoint(ckpts[-1])
            log.info("Resuming from a REFERENCE torch checkpoint"
                     + ("" if ckpt.get("opt_arrays") is not None else
                        ": optimizer state restarts"))
        else:
            ckpt = load_checkpoint(ckpts[-1])
        check_loaded_config(ckpt["cfg_flat"], config_to_flat(cfg))
        params = ckpt["params"]
        if cfg.load_train_state and ckpt["train_meta"].get("loop_state"):
            S = TrainLoopState.from_dict(ckpt["train_meta"]["loop_state"])
            opt_arrays = ckpt["opt_arrays"]
            log.info(f"Resumed training state at chunk {S.chunk_id}")
            if cfg.load_lr_state:
                ck = ckpt["cfg_flat"]
                lr_params = {k: ck.get(k, lr_params[k]) for k in lr_params}
                log.info(f"Resuming checkpoint LR schedule: {lr_params}")
            else:
                lr_resume_fresh = True
                log.info("load_lr_state=false => restarting LR schedule at the resumed chunk")

    noise = EmbeddingNoise.create(cfg.noise_scheme, embed_dim=embedder.embed_dim,
                                  vec_norm=cfg.noise_vec_norm, angle_min=cfg.noise_angle_min,
                                  angle_max=cfg.noise_angle_max, angle_std=cfg.noise_angle_std,
                                  mix_ratio=cfg.noise_mix_ratio)
    mean_shift = load_mean_shift(cfg, embedder)

    mesh = None
    if cfg.data_parallel and len(jax.devices()) > 1:
        n = len(jax.devices())
        if cfg.batch_size % n == 0:
            mesh = create_mesh()
            log.info(f"Data-parallel training over {n} devices")
        else:
            log.warning(f"batch_size {cfg.batch_size} not divisible by {n} devices => "
                        f"falling back to single-device training")
    # Overlap host→HBM transfer with compute: the prefetch thread device_puts
    # batches under the training sharding while the device runs the prior step
    if hasattr(loader, "device_put"):
        loader.device_put = True
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            loader.sharding = NamedSharding(mesh, P("data"))

    run_dir = make_run_dir(cfg)
    stamp = os.path.basename(run_dir)[len("ovod_"):]
    metrics = MetricsLogger(run_dir=run_dir, use_wandb=cfg.use_wandb, wandb_kwargs=wandb_init_kwargs(cfg),
                            project=cfg.wandb_project, config=config_to_flat(cfg))

    C = TrainLoopConfig(
        chunk_batches=chunk_batches, chunk_samples=chunk_batches * cfg.batch_size,
        epoch_batches=epoch_batches, max_chunks=max_chunks, batch_size=cfg.batch_size,
        accum_size=cfg.accum_factor, gradient_clip=cfg.gradient_clip,
        steps_per_dispatch=int(cfg.get("steps_per_dispatch", 1) or 1),
        loss_ewa_halflife=cfg.loss_ewa_halflife, save_every_min=cfg.save_every_min,
        save_every_max=cfg.save_every_max, save_top1_min=cfg.save_top1_min / 100.0,
        save_top1_delta=cfg.save_top1_delta / 100.0, **lr_params,
        last_dropout_chunks=cfg.last_dropout_chunks,
        last_dropout_factor=cfg.last_dropout_factor, lr_resume_fresh=lr_resume_fresh)

    def save_fn(chunk_id, state, loop_state):
        ckpt_fmt = str(cfg.get("checkpoint_format", "npz") or "npz").lower()
        ext = ".orbax" if ckpt_fmt == "orbax" else ".npz"
        path = os.path.join(run_dir, f"ovod_chunk{chunk_id:04d}_{stamp}{ext}")
        if ckpt_fmt == "orbax":
            from novic_tpu.train.checkpoint import save_checkpoint_orbax as _save
        elif ckpt_fmt == "npz":
            _save = save_checkpoint
        else:
            raise ValueError(f"Unsupported checkpoint_format: {ckpt_fmt}")
        _save(
            path, params=jax.tree.map(np.asarray, state.params),
            cfg_flat=config_to_flat(cfg), model_config=model_cfg,
            target_config=embedder.target_config, data_config=dc.as_dict(),
            target_nouns=dataset.targets, num_invalid_target_nouns=dataset.num_invalid_targets,
            opt_state_arrays=extract_opt_state_arrays(state),
            train_meta={"loop_state": loop_state.as_dict(), "chunk_id": chunk_id})
        if cfg.save_torch_checkpoints:
            try:
                save_reference_checkpoint(
                    path[:-4] + ".model", params=jax.tree.map(np.asarray, state.params),
                    model_config=model_cfg, target_config=embedder.target_config,
                    target_nouns=dataset.targets,
                    num_invalid_target_nouns=dataset.num_invalid_targets,
                    cfg_flat=config_to_flat(cfg), data_config=dc.as_dict())
            except ImportError:
                log.warning("torch unavailable => skipping reference-format checkpoint")
        return path

    with dataset.loaded():
        state, S, ewa = train(
            model=model, params=params, dataset=dataset, loader=grad_accum.loader(),
            loader_info=info, C=C, S=S, noise=noise, mean_shift=mean_shift,
            multi_first=dc.multi_first, beta1=cfg.beta1, beta2=cfg.beta2,
            weight_decay=cfg.weight_decay, weight_decay_1d=cfg.weight_decay_1d,
            optimizer=cfg.optimizer, nesterov=cfg.nesterov,
            opt_state_arrays=opt_arrays, metrics=metrics, save_fn=save_fn, mesh=mesh,
            profile_dir=(cfg.get("profile_dir", "") or None))
    metrics.finish()
    log.info(f"Training finished: loss {ewa.loss:.4e}, top1 {ewa.top1:.3%} "
             f"(max {ewa.top1_max:.3%}); run dir {run_dir}")
    return state, S, ewa


def action_fix_checkpoints(cfg):
    """Retrofit target_nouns into legacy checkpoints missing them — both our
    native .npz and the reference's torch .train/.model pickles (the action's
    whole purpose in the reference is fixing legacy torch checkpoints, ref
    train.py:1487-1643). Supports dry_run."""
    import glob

    output_dir = resolve_path(cfg, cfg.output_dir)
    dry = bool(cfg.get("dry_run"))
    fixed = scanned = 0
    target_nouns = None  # computed lazily, once

    def get_target_nouns():
        nonlocal target_nouns
        if target_nouns is None:
            embedder = load_embedder(cfg, load_model=False)
            from novic_tpu.cli.common import load_noun_dataset

            dataset = load_noun_dataset(cfg, embedder, use_cache=False)
            # Checkpoint convention: row 0 is the invalid "" noun
            # (ref train.py:1546-1549 target_nouns_bin)
            target_nouns = (("",) + tuple(dataset.targets), 1)
        return target_nouns

    for path in sorted(glob.glob(os.path.join(output_dir, "ovod_*", "*.npz"))):
        scanned += 1
        try:
            ckpt = load_checkpoint(path)
        except Exception as e:
            log.warning(f"Skipping unreadable checkpoint {path}: {e}")
            continue
        if ckpt["target_nouns"]:
            continue
        nouns, num_invalid = get_target_nouns()
        if dry:
            log.info(f"[dry run] would fix {path} (+{len(nouns)} target nouns)")
            fixed += 1
            continue
        save_checkpoint(path, params=ckpt["params"], cfg_flat=ckpt["cfg_flat"],
                        model_config=ckpt["model_config"], target_config=ckpt["target_config"],
                        data_config=ckpt["data_config"], target_nouns=nouns,
                        num_invalid_target_nouns=num_invalid,
                        opt_state_arrays=ckpt["opt_arrays"], train_meta=ckpt["train_meta"])
        fixed += 1
        log.info(f"Fixed checkpoint: {path}")

    # Reference torch checkpoints: load with the torch reader (tensor values
    # preserved), insert the vocabulary, save back with torch.
    for pattern in ("*.train", "*.model"):
        for path in sorted(glob.glob(os.path.join(output_dir, "ovod_*", pattern))):
            scanned += 1
            try:
                import torch

                ckpt = torch.load(path, map_location="cpu", weights_only=True)
            except Exception as e:
                log.warning(f"Skipping unreadable torch checkpoint {path}: {e}")
                continue
            if not isinstance(ckpt, dict) or "cfg_flat" not in ckpt:
                log.warning(f"Skipping {path}: not a reference checkpoint dict")
                continue
            if ckpt.get("target_nouns"):
                continue
            nouns, num_invalid = get_target_nouns()
            if dry:
                log.info(f"[dry run] would fix {path} (+{len(nouns)} target nouns)")
                fixed += 1
                continue
            ckpt["target_nouns"] = nouns
            ckpt["num_invalid_target_nouns"] = num_invalid
            torch.save(ckpt, path)
            fixed += 1
            log.info(f"Fixed torch checkpoint: {path}")
    log.info(f"fix_checkpoints: scanned {scanned}, fixed {fixed}"
             f"{' (dry run)' if dry else ''}")
    return fixed
