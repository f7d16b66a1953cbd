"""Pinned in-stack demonstration of the text->image modality-gap mechanism
(VERDICT r3 next #1; MODALITY_GAP.md has the full-scale TPU ablation).

Runs the released recipe through the public CLI on the structured
dual-modality test embedder: cache_noun_multiset -> embedder_zero_shot
(measure_gap) -> train (no-noise arm vs released-noise arm) -> eval (text
side) -> eval_cls (image side), and asserts the core scientific behavior:
both decoders are comparably good on the TEXT manifold they trained on, but
only the noise-augmented one transfers across the 70-degree modality gap to
IMAGE embeddings (ref embedding_noise.py:59-173, train.py:1008-1026,
paper SS3). Measured at this exact scale: no-noise ~0.49 image top-1 vs
noise 1.00 (TPU full scale: 0.12 vs 1.00)."""

import json
import os

import pytest

from novic_tpu.cli.train import main
from novic_tpu.embedders.structured import (
    make_structured_vocab,
    write_structured_cls_dataset,
)

pytestmark = pytest.mark.slow  # full-tier (pytest --full)

CLASSES, DIM, GAP, JITTER = 32, 128, 70.0, 8.0
RELEASED_NOISE = ["noise_scheme=GaussElemUniformAngle", "noise_vec_norm=3.25",
                  "noise_angle_min=45.0", "noise_angle_max=75.0", "noise_mix_ratio=0.15"]


def test_modality_gap_noise_ablation(tmp_path):
    import glob

    vocab = make_structured_vocab(CLASSES, freq=60, seed=0)
    nouns = [e["target_noun"] for e in vocab]
    with open(tmp_path / "vocab.json", "w") as f:
        json.dump(vocab, f)
    cls_root = str(tmp_path / "cls")
    write_structured_cls_dataset(cls_root, nouns, 8, seed=1)

    common = [f"embedder=test-structured:{DIM}:{GAP}:{JITTER}:0",
              f"vocab_path={tmp_path}/vocab.json", "prompt_path=",
              "prompt_collection=Basic", "hypernym_collection=None", "seed=0",
              f"output_dir={tmp_path}/outputs"]
    cls_args = ["cls_dataset=Food101", f"cls_dataset_root={cls_root}",
                "cls_split=valid", "batch_size_image=128"]
    model_args = ["batch_size=256", "hidden_dim=96", "num_layers=2", "num_heads=4",
                  "mlp_seq_len=2", "input_dropout=0.0", "layer_dropout=0.0"]

    cache = str(tmp_path / "multiset.bin")
    main(["action=cache_noun_multiset", f"save_embedding_cache={cache}",
          "multi_target_freq=[2,1]"] + common)

    # Encoder-side sanity + the production mean-shift measurement path: the
    # structured geometry is cleanly separable (zero-shot ~1.0) and
    # measure_gap recovers the designed gap angle
    gap_path = str(tmp_path / "gap.json")
    zs = main(["action=embedder_zero_shot", "measure_gap=true",
               f"gap_output_path={gap_path}"] + cls_args + common)
    assert zs["Food101"] >= 0.95
    gap = json.load(open(gap_path))
    assert abs(gap["angle_mean"] - GAP) < 3.0
    assert sum(x * x for x in gap["mean_shift"]) > 0.5  # a real, consistent shift

    results = {}
    for arm, extra in (("none", []), ("noise", RELEASED_NOISE)):
        out_dir = f"{tmp_path}/outputs_{arm}"
        args = [a if not a.startswith("output_dir=") else f"output_dir={out_dir}"
                for a in common]
        main(["action=train", f"embedding_dataset={cache}", "chunk_scale=150",
              "max_chunks=20", "init_lr=2e-3", "save_every_max=1000000",
              "save_top1_min=200"] + extra + model_args + args)
        ckpt = sorted(glob.glob(f"{out_dir}/ovod_*/*.npz"))[-1]
        (_, text_res), = list(main(["action=eval", f"embedding_dataset={cache}",
                                    f"load_model={ckpt}"] + model_args + args).items())
        (_, img_res), = list(main(["action=eval_cls", f"load_model={ckpt}"]
                                  + cls_args + model_args + args).items())
        results[arm] = (float(text_res["noun_top1"]), float(img_res["direct_top1"]))

    (text_none, img_none), (text_noise, img_noise) = results["none"], results["noise"]
    # Both arms learned the text task comparably well...
    assert text_none >= 0.7 and text_noise >= 0.7
    # ...but only the noise arm transfers across the modality gap
    assert img_noise >= 0.85, f"noise arm failed to transfer: {img_noise}"
    assert img_none <= 0.65, f"no-noise arm unexpectedly transfers: {img_none}"
    assert img_noise - img_none >= 0.3


def test_modality_gap_graded_arm_ordering(tmp_path):
    """The de-saturated testbed (VERDICT r4 #3): class-dependent gap direction
    (gap_mix 0.25) + per-class magnitude spread + light prototype crowding
    put every arm off its ceiling, and the paper's ordering emerges with real
    effect sizes: noise+shift > noise > shift > none (full-scale chip tables
    in MODALITY_GAP.md; this pins the same regime at CI scale — measured
    here: none 0.57, shift 0.62, noise 0.69, noise+shift 0.74, zero-shot
    0.95)."""
    import glob

    vocab = make_structured_vocab(CLASSES, freq=40, seed=0)
    nouns = [e["target_noun"] for e in vocab]
    with open(tmp_path / "vocab.json", "w") as f:
        json.dump(vocab, f)
    cls_root = str(tmp_path / "cls")
    write_structured_cls_dataset(cls_root, nouns, 8, seed=1)

    # gap 68 +- 8 (class-dependent magnitude), direction 25% global, crowd 0.15
    common = ["embedder=test-structured:128:68:10:0:0.25:8:0.15",
              f"vocab_path={tmp_path}/vocab.json", "prompt_path=",
              "prompt_collection=Basic", "hypernym_collection=None", "seed=0",
              f"output_dir={tmp_path}/outputs"]
    cls_args = ["cls_dataset=Food101", f"cls_dataset_root={cls_root}",
                "cls_split=valid", "batch_size_image=128"]
    model_args = ["batch_size=256", "hidden_dim=96", "num_layers=2", "num_heads=4",
                  "mlp_seq_len=2", "input_dropout=0.0", "layer_dropout=0.0"]

    cache = str(tmp_path / "multiset.bin")
    main(["action=cache_noun_multiset", f"save_embedding_cache={cache}",
          "multi_target_freq=[2,1]"] + common)
    gap_path = str(tmp_path / "gap.json")
    zs = main(["action=embedder_zero_shot", "measure_gap=true",
               f"gap_output_path={gap_path}"] + cls_args + common)
    assert zs["Food101"] >= 0.85  # encoder stays separable in the hard regime

    shift = ["mean_shift=true", f"mean_shift_path={gap_path}"]
    arms = {"none": [], "noise": RELEASED_NOISE, "shift": shift,
            "noise_shift": RELEASED_NOISE + shift}
    img = {}
    for arm, extra in arms.items():
        out_dir = f"{tmp_path}/outputs_{arm}"
        args = [a if not a.startswith("output_dir=") else f"output_dir={out_dir}"
                for a in common]
        main(["action=train", f"embedding_dataset={cache}", "chunk_scale=50",
              "max_chunks=12", "init_lr=2e-3", "save_every_max=1000000",
              "save_top1_min=200"] + extra + model_args + args)
        ckpt = sorted(glob.glob(f"{out_dir}/ovod_*/*.npz"))[-1]
        (_, img_res), = list(main(["action=eval_cls", f"load_model={ckpt}"]
                                  + cls_args + model_args + args).items())
        img[arm] = float(img_res["direct_top1"])

    # Graded (nothing saturated) ...
    assert all(0.3 < v < 0.95 for v in img.values()), img
    # ... with the paper's ordering and real margins. Seed sweep at this
    # scale (exp probe, seeds 0/1/2): none 57-59, shift 62-63, noise 68-74,
    # noise+shift 66-74 — the noise-vs-none/shift margins are robust
    # (>= 5.5 pts at every seed); noise_shift-vs-noise is only resolved at
    # full training scale (96.5 vs 98.2, MODALITY_GAP.md), so it gets slack
    # here rather than a strict ordering claim CI cannot support.
    assert img["noise"] - img["none"] >= 0.05, img
    assert img["noise"] - img["shift"] >= 0.03, img
    assert img["noise_shift"] >= img["noise"] - 0.04, img
    assert img["shift"] >= img["none"] - 0.01, img
