#!/usr/bin/env python
"""In-stack demonstration of the text->image modality-gap mechanism.

The system's core scientific claim (reference paper §3, embedding_noise.py:59-173,
train.py:1008-1026): a decoder trained purely on TEXT embeddings with
unit-sphere noise augmentation (and optionally mean-shift) classifies IMAGE
embeddings zero-shot across the CLIP modality gap. This harness runs that
exact ablation through the full CLI pipeline (cache_noun_multiset -> train ->
eval [text side] -> eval_cls [image side]) on a synthetic *structured*
dual-modality embedding space ('test-structured:<dim>:<gap>:<jitter>', see
novic_tpu/embedders/structured.py): class prototypes on the unit sphere, text
embeddings jittered around them, image embeddings rotated gap_deg toward a
global direction.

Arms:
  none        no noise augmentation           -> image side collapses
  noise       released GaussElemUniformAngle  -> image side recovers
              (vec_norm 3.25, angle 45-75, mix 0.15; reference README:322)
  noise+shift noise + measured mean_shift     -> image side recovers further
              (gap JSON from embedder_zero_shot measure_gap=true, the
              reference's data/modality_gap_*.json production path)

Usage:
  python exp/modality_gap.py --workdir /tmp/mgap [--classes 32] [--dim 64]
      [--gap 60] [--jitter 10] [--freq 40] [--images-per-class 20]
      [--chunk-scale 20] [--max-chunks 12] [--arms none,noise,noise_shift]

Prints one JSON summary line and a human table; exits nonzero if the
mechanism fails to demonstrate (noise arm not clearly above the no-noise arm).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from novic_tpu.cli.train import main as cli
from novic_tpu.embedders.structured import (
    make_structured_vocab,
    write_structured_cls_dataset,
)

RELEASED_NOISE = ["noise_scheme=GaussElemUniformAngle", "noise_vec_norm=3.25",
                  "noise_angle_min=45.0", "noise_angle_max=75.0", "noise_mix_ratio=0.15"]


def run(a) -> dict:
    os.makedirs(a.workdir, exist_ok=True)
    vocab_json = make_structured_vocab(a.classes, freq=a.freq, seed=a.seed)
    nouns = [e["target_noun"] for e in vocab_json]
    vocab_path = os.path.join(a.workdir, "vocab.json")
    with open(vocab_path, "w") as f:
        json.dump(vocab_json, f)
    cls_root = os.path.join(a.workdir, "cls")
    if not os.path.isdir(cls_root):
        write_structured_cls_dataset(cls_root, nouns, a.images_per_class, seed=a.seed + 1)

    spec = f"test-structured:{a.dim}:{a.gap}:{a.jitter}:{a.seed}"
    if a.gap_mix != 1.0 or a.gap_spread or a.crowd:
        spec += f":{a.gap_mix}"
        if a.gap_spread or a.crowd:
            spec += f":{a.gap_spread}"
            if a.crowd:
                spec += f":{a.crowd}"
    common = [f"embedder={spec}", f"vocab_path={vocab_path}", "prompt_path=",
              "prompt_collection=Basic", "hypernym_collection=None",
              f"seed={a.seed}", f"output_dir={a.workdir}/outputs"]
    cls_args = ["cls_dataset=Food101", f"cls_dataset_root={cls_root}",
                "cls_split=valid", f"batch_size_image={a.batch_size_image}"]
    model_args = [f"batch_size={a.batch_size}", f"hidden_dim={a.hidden_dim}",
                  f"num_layers={a.num_layers}", f"num_heads={a.num_heads}",
                  "mlp_seq_len=2", "input_dropout=0.0", "layer_dropout=0.0"]

    # Text-embedding cache: the released multiset recipe arm (M1+M2 heads)
    cache = os.path.join(a.workdir, "multiset_cache.bin")
    if not os.path.exists(cache):
        cli(["action=cache_noun_multiset", f"save_embedding_cache={cache}",
             "multi_target_freq=[2,1]"] + common)

    # Zero-shot + modality-gap measurement (image side, encoder only)
    gap_path = os.path.join(a.workdir, "gap.json")
    zs = cli(["action=embedder_zero_shot", "measure_gap=true",
              f"gap_output_path={gap_path}"] + cls_args + common)
    gap = json.load(open(gap_path))
    zero_shot_top1 = float(zs["Food101"])

    shift_args = ["mean_shift=true", f"mean_shift_path={gap_path}"]
    arm_specs = {
        "none": [],
        "noise": RELEASED_NOISE,
        "noise_shift": RELEASED_NOISE + shift_args,
        "shift": shift_args,
    }

    def resolve_arm(arm: str) -> list:
        """Named arm, or a parameterized noise arm for hyperparameter sweeps:
        'noise[/shift]:<vec_norm>:<angle_min>:<angle_max>' (released values
        are 3.25:45:75, ref README:322)."""
        if arm in arm_specs:
            return arm_specs[arm]
        head, *params = arm.split(":")
        if head in ("noise", "noise_shift") and len(params) == 3:
            vec, amin, amax = params
            return (["noise_scheme=GaussElemUniformAngle", f"noise_vec_norm={vec}",
                     f"noise_angle_min={amin}", f"noise_angle_max={amax}",
                     "noise_mix_ratio=0.15"]
                    + (shift_args if head == "noise_shift" else []))
        raise SystemExit(f"Unknown arm: {arm}")

    results: dict[str, dict] = {}
    for arm in a.arms.split(","):
        arm = arm.strip()
        arm_args = resolve_arm(arm)
        out_dir = os.path.join(a.workdir, f"outputs_{arm.replace(':', '_')}")
        shutil.rmtree(out_dir, ignore_errors=True)
        args = [x if not x.startswith("output_dir=") else f"output_dir={out_dir}"
                for x in common]
        t0 = time.perf_counter()
        cli(["action=train", f"embedding_dataset={cache}",
             f"chunk_scale={a.chunk_scale}", f"max_chunks={a.max_chunks}",
             f"init_lr={a.init_lr}", "save_every_max=1000000", "save_top1_min=200"]
            + arm_args + model_args + args)
        ckpts = sorted(glob.glob(f"{out_dir}/ovod_*/*.npz"))
        assert ckpts, f"No checkpoint saved for arm {arm}"
        train_s = time.perf_counter() - t0

        ev = cli(["action=eval", f"embedding_dataset={cache}",
                  f"load_model={ckpts[-1]}"] + model_args + args)
        (_, text_res), = list(ev.items())
        ec = cli(["action=eval_cls", f"load_model={ckpts[-1]}"]
                 + cls_args + model_args + args)
        (_, img_res), = list(ec.items())
        results[arm] = {
            "text_noun_top1": float(text_res["noun_top1"]),
            "image_top1": float(img_res["direct_top1"]),
            "image_guided_top1": float(img_res["guided_top1"]),
            "train_s": round(train_s, 1),
        }
        print(f"[arm {arm}] text noun_top1={results[arm]['text_noun_top1']:.4f} "
              f"image top1={results[arm]['image_top1']:.4f} "
              f"guided={results[arm]['image_guided_top1']:.4f} ({train_s:.0f}s)")

    summary = {
        "spec": spec, "classes": a.classes, "zero_shot_top1": zero_shot_top1,
        "gap_angle_mean_deg": float(gap["all_angle_mean"]),
        "mean_shift_norm": float(sum(x * x for x in gap["mean_shift"]) ** 0.5),
        "arms": results,
    }
    print(json.dumps(summary))
    return summary


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--workdir", required=True)
    p.add_argument("--classes", type=int, default=32)
    p.add_argument("--dim", type=int, default=64)
    p.add_argument("--gap", type=float, default=60.0)
    p.add_argument("--jitter", type=float, default=10.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--gap-mix", type=float, default=1.0)
    p.add_argument("--gap-spread", type=float, default=0.0,
                   help="per-class gap magnitude spread in degrees")
    p.add_argument("--crowd", type=float, default=0.0,
                   help="prototype crowding in [0,1): expected pairwise cosine ~= crowd^2")
    p.add_argument("--freq", type=int, default=40)
    p.add_argument("--images-per-class", type=int, default=20)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--batch-size-image", type=int, default=64)
    p.add_argument("--hidden-dim", type=int, default=128)
    p.add_argument("--num-layers", type=int, default=3)
    p.add_argument("--num-heads", type=int, default=4)
    p.add_argument("--chunk-scale", type=int, default=200)
    p.add_argument("--max-chunks", type=int, default=10)
    p.add_argument("--init-lr", type=float, default=2e-3)
    p.add_argument("--arms", default="none,noise,noise_shift")
    a = p.parse_args(argv)
    summary = run(a)
    arms = summary["arms"]
    if "none" in arms and "noise" in arms:
        lift = arms["noise"]["image_top1"] - arms["none"]["image_top1"]
        if lift < 0.2:
            print(f"FAIL: noise arm lift over no-noise arm is only {lift:.3f}")
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
