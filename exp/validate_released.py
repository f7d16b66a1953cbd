"""One-command released-asset validation (VERDICT r2 next-round item 4).

The BASELINE gates (>=95% top-1 agreement vs the released `dfn5bl`/`ye2`
checkpoints, ref README.md:295-301) are blocked here only by missing assets.
This script is the single command that closes them the day assets land:

    python exp/validate_released.py \
        --hf_dir /path/to/hf-format-CLIP-dir \
        --ovod_ckpt /path/to/ovod_*.model \
        [--tokenizer_asset merges.txt|.model|vocab.txt] \
        [--image_dir /path/to/photos] [--gencfg beam_k10_vnone_gp_t1_a0] \
        [--bench] [--spec transformers:/path]

It runs, in order: weight conversion -> tokenizer parity -> text/image
embedding parity -> end-to-end demo-image label agreement (our NOVICModel vs
the REFERENCE's own NOVICModel strict-loading the same decoder checkpoint)
-> optional backbone bench, and writes AGREEMENT_released.md at the repo
root. Every step reuses the proven round-2 agreement machinery
(exp/agreement/run_agreement.py phases) — only the asset paths differ.

Asset notes:
* --hf_dir: an HF-format CLIP directory (config.json + safetensors +
  tokenizer files). DFN5B (apple/DFN5B-CLIP-ViT-H-14[-378]) is published in
  this format, so the full two-sided flow works for it. The reference side
  runs its TransformersEmbedder on the same directory.
* --openclip_ckpt + --spec: an open_clip .pt/.bin checkpoint converted via
  convert_openclip_state_dict. The reference side needs the open_clip
  package for these, so agreement runs our-side-only conversions/bench and
  says so in the report.
* --synthetic: dry-run the ENTIRE flow on fabricated assets (the round-2
  agreement fixtures) — proves the pipeline end-to-end with zero real files.

Reproduced gate evidence lands in AGREEMENT_released.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

import numpy as np

EXP_DIR = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(EXP_DIR)
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(EXP_DIR, "agreement"))


def log(msg: str) -> None:
    print(f"[validate_released] {msg}", flush=True)


def prepare_work(args) -> None:
    """Populate the agreement WORK layout from the provided assets."""
    import run_agreement as ra

    work = ra.WORK
    os.makedirs(work, exist_ok=True)

    # --- decoder checkpoint -------------------------------------------------
    model_dst = os.path.join(work, "agreement.model")
    if os.path.abspath(args.ovod_ckpt) != os.path.abspath(model_dst):
        shutil.copyfile(args.ovod_ckpt, model_dst)

    # --- tower weights ------------------------------------------------------
    towers = os.path.join(work, "towers.npz")
    if args.hf_dir:
        hf_dst = os.path.join(work, "hf_model")
        if os.path.islink(hf_dst) or os.path.exists(hf_dst):
            if os.path.islink(hf_dst):
                os.unlink(hf_dst)
            else:
                shutil.rmtree(hf_dst)
        os.symlink(os.path.abspath(args.hf_dir), hf_dst)
        import transformers

        from novic_tpu.embedders.convert import convert_hf_model, save_params_npz

        model = transformers.CLIPModel.from_pretrained(args.hf_dir)
        v, t = convert_hf_model(model, "clip")
        save_params_npz(towers, v, t)
        log(f"converted HF weights {args.hf_dir} -> {towers}")
    elif args.openclip_ckpt:
        from novic_tpu.embedders.convert import (convert_openclip_state_dict,
                                                 save_params_npz)
        from novic_tpu.embedders.registry import lookup
        from novic_tpu.train.torch_pickle import load_torch_pickle

        arch = lookup(args.spec)
        sd = load_torch_pickle(args.openclip_ckpt)
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        sd = {k[len("module."):] if k.startswith("module.") else k: v
              for k, v in sd.items()}
        v, t = convert_openclip_state_dict(sd, arch.family, arch.vision.layers,
                                           arch.text.layers,
                                           vision_cfg=arch.vision)
        save_params_npz(towers, v, t)
        log(f"converted open_clip checkpoint {args.openclip_ckpt} -> {towers}")

    # --- tokenizer asset ----------------------------------------------------
    if args.tokenizer_asset:
        shutil.copyfile(args.tokenizer_asset, os.path.join(work, "merges.txt"))
    elif args.hf_dir:
        for name in ("merges.txt",):
            src = os.path.join(args.hf_dir, name)
            if os.path.isfile(src):
                shutil.copyfile(src, os.path.join(work, "merges.txt"))
                break

    # --- evaluation images (demo photos x deterministic variants) -----------
    import PIL.Image

    image_dir = args.image_dir or os.path.join("/root/reference", "demo")
    img_dir = os.path.join(work, "images")
    os.makedirs(img_dir, exist_ok=True)
    srcs = sorted(os.path.join(image_dir, f) for f in os.listdir(image_dir)
                  if f.lower().endswith((".jpg", ".jpeg", ".png", ".webp")))
    paths = []
    for p in srcs:
        im = PIL.Image.open(p).convert("RGB")
        base = os.path.splitext(os.path.basename(p))[0]
        w, h = im.size
        variants = {
            "orig": im,
            "flip": im.transpose(PIL.Image.FLIP_LEFT_RIGHT),
            "crop80": im.crop((int(w * 0.1), int(h * 0.1), int(w * 0.9), int(h * 0.9))),
            "crop60": im.crop((int(w * 0.2), int(h * 0.2), int(w * 0.8), int(h * 0.8))),
            "cropTL": im.crop((0, 0, int(w * 0.75), int(h * 0.75))),
            "cropBR": im.crop((int(w * 0.25), int(h * 0.25), w, h)),
        }
        for name, v_im in variants.items():
            out = os.path.join(img_dir, f"{base}_{name}.png")
            v_im.save(out)
            paths.append(out)
    with open(os.path.join(work, "images.json"), "w") as f:
        json.dump(paths, f)
    log(f"evaluation images: {len(paths)} ({len(srcs)} photos x 6 variants)")

    # --- parity texts from the DECODER's own target nouns -------------------
    from novic_tpu.train.checkpoint import load_reference_checkpoint

    ck = load_reference_checkpoint(args.ovod_ckpt)
    nouns = list(ck["target_nouns"][ck["num_invalid_target_nouns"]:])
    rng = np.random.default_rng(0)
    sample = [nouns[i] for i in rng.permutation(len(nouns))[:400]]
    texts = ([f"a photo of a {n}" for n in sample[:200]]
             + [f"i love my {n}" for n in sample[200:300]] + sample[300:])
    with open(os.path.join(work, "texts.json"), "w") as f:
        json.dump(texts, f)
    log(f"parity texts: {len(texts)} built from {len(nouns)} checkpoint nouns")


def write_released_report(args, results: dict) -> None:
    import run_agreement as ra

    lines = [
        "# AGREEMENT_released — label agreement on released assets",
        "",
        f"Date: {time.strftime('%Y-%m-%d %H:%M')}  ",
        f"Assets: embedder={'--synthetic fixtures' if args.synthetic else (args.hf_dir or args.openclip_ckpt)}, "
        f"decoder={'(synthetic-trained)' if args.synthetic else args.ovod_ckpt}, "
        f"gencfg=`{args.gencfg}`",
        "",
    ]
    if args.synthetic:
        lines += [
            "**DRY RUN on synthetic fixtures** — the same phases run unchanged",
            "on real released files; only the --hf_dir/--ovod_ckpt paths differ.",
            "",
        ]
    tokens = results.get("tokens")
    if tokens:
        lines += ["## Tokenizer parity", "",
                  f"- {tokens['total'] - tokens['mismatches']}/{tokens['total']} "
                  f"sequences identical vs `{tokens['tokenizer_class']}`", ""]
    embeds = results.get("embeds")
    if embeds:
        t, im = embeds["text"], embeds["image"]
        lines += ["## Embedding agreement (f32)", "",
                  "| Modality | max abs diff | min cosine |", "|---|---|---|",
                  f"| text | {t['max_abs']:.2e} | {t['min_cos']:.8f} |",
                  f"| image | {im['max_abs']:.2e} | {im['min_cos']:.8f} |", ""]
    labels = results.get("labels")
    if labels:
        lines += [
            "## End-to-end label agreement (gate: >=95%)", "",
            f"- Images: {labels['images']}",
            f"- **Top-1 agreement: {labels['top1_agree']}/{labels['images']} = "
            f"{labels['top1_pct']:.2f}%**",
            f"- Top-3 overlap: {labels['top3_overlap']}/{labels['images']}", ""]
        if labels.get("diffs"):
            lines += ["Disagreements:", ""]
            lines += [f"- `{d['image']}`: ours {d['ours']} vs ref {d['ref']}"
                      for d in labels["diffs"][:20]]
            lines += [""]
    elif not args.synthetic and args.openclip_ckpt:
        lines += ["## End-to-end label agreement", "",
                  "Skipped: the reference side needs the `open_clip` package "
                  "for open_clip checkpoints; ours-side conversion/bench ran. "
                  "Provide --hf_dir for two-sided agreement.", ""]
    bench = results.get("bench")
    if bench:
        lines += ["## Backbone bench", "", "```", json.dumps(bench), "```", ""]
    table = results.get("bench_table")
    if table:
        lines += [
            "## Per-backbone bench (this chip, random weights, uint8 frames)", "",
            "| backbone | spec | img/s | vs A6000 ref | v5e-8 DP projection |",
            "|---|---|---|---|---|"]
        for name, row in table.items():
            if "error" in row:
                lines.append(f"| {name} | — | FAILED | — | — |")
                continue
            e = row["extra"]
            lines.append(f"| {name} | `{e['backbone']}` | {row['value']} | "
                         f"{row['vs_baseline']}x ({e['a6000_baseline_img_per_sec']}) | "
                         f"{e['v5e8_dp_projection_img_per_sec']} |")
        lines += ["",
                  "Reference A6000 rates: ref README.md:295-301 / config/train.yaml "
                  "embed-speed table. Projections are linear DP x8 (no cross-chip "
                  "traffic in image encode).", ""]
    lines += ["## Reproduce", "", "```",
              "python exp/validate_released.py " + " ".join(sys.argv[1:]),
              "```", f"Work dir: {ra.WORK}"]
    out = os.path.join(REPO, "AGREEMENT_released.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    log(f"wrote {out}")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--hf_dir", help="HF-format CLIP checkpoint directory")
    p.add_argument("--openclip_ckpt", help="open_clip .pt/.bin checkpoint")
    p.add_argument("--spec", help="registry spec for --openclip_ckpt "
                                  "(e.g. openclip:apple/DFN5B-CLIP-ViT-H-14-378)")
    p.add_argument("--ovod_ckpt", help="reference decoder .model checkpoint")
    p.add_argument("--tokenizer_asset",
                   help="merges.txt / sentencepiece .model / BERT vocab.txt")
    p.add_argument("--image_dir", help="photos to classify (default: reference demo)")
    p.add_argument("--gencfg", default="beam_k10_vnone_gp_t1_a0")
    import bench as _bench  # repo-root bench.py — single source of backbone keys

    p.add_argument("--bench", action="store_true",
                   help="also run the backbone bench (BENCH_BACKBONE mode)")
    p.add_argument("--bench_backbone", default="siglip_b16",
                   choices=sorted(_bench.BACKBONES))
    p.add_argument("--bench_all", nargs="?", const=",".join(sorted(_bench.BACKBONES)),
                   default=None, metavar="NAMES",
                   help="emit the per-backbone bench table into the report "
                        "(comma list of backbone keys; no value = all)")
    p.add_argument("--synthetic", action="store_true",
                   help="dry-run the whole flow on fabricated assets")
    args = p.parse_args()

    os.environ.setdefault("AGREEMENT_WORK", "/tmp/validate_released")
    import run_agreement as ra

    results: dict = {}
    if args.synthetic:
        ra.phase_assets()
        results["tokens"] = ra.phase_tokens()
        results["embeds"] = ra.phase_embeds()
        ckpt = ra.phase_train()
        model_path = ra.export_reference_model(ckpt)
        results["labels"] = ra.phase_labels(model_path, gencfg=args.gencfg,
                                            result_name="result_labels_released.json")
    else:
        if not args.ovod_ckpt or not (args.hf_dir or args.openclip_ckpt):
            p.error("need --ovod_ckpt and one of --hf_dir/--openclip_ckpt "
                    "(or --synthetic)")
        if args.openclip_ckpt and not args.spec:
            p.error("--openclip_ckpt requires --spec")
        prepare_work(args)
        model_path = os.path.join(ra.WORK, "agreement.model")
        if args.hf_dir:
            # Both stacks read the same HF-format weights through their
            # transformers backends, overriding whatever (possibly openclip:*)
            # spec the released decoder checkpoint recorded
            spec = "transformers:" + os.path.join(ra.WORK, "hf_model")
            results["tokens"] = ra.phase_tokens()
            results["embeds"] = ra.phase_embeds()
            results["labels"] = ra.phase_labels(
                model_path, gencfg=args.gencfg,
                result_name="result_labels_released.json", embedder_spec=spec)

    def run_backbone_bench(name: str):
        env = dict(os.environ, BENCH_BACKBONE=name)
        proc = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                              env=env, capture_output=True, text=True, timeout=3600)
        sys.stdout.write(proc.stdout)
        if proc.returncode == 0 and proc.stdout.strip():
            return json.loads(proc.stdout.strip().splitlines()[-1])
        sys.stderr.write(proc.stderr)
        log(f"bench {name} failed (non-fatal)")
        return {"error": proc.returncode}

    if args.bench:
        out = run_backbone_bench(args.bench_backbone)
        if "error" not in out:
            results["bench"] = out
    if args.bench_all:
        results["bench_table"] = {name.strip(): run_backbone_bench(name.strip())
                                  for name in args.bench_all.split(",") if name.strip()}

    write_released_report(args, results)


if __name__ == "__main__":
    main()
