"""Cross-implementation differential for action=eval (round 3).

tests/test_eval_fidelity.py pins our eval against a transcription of the
reference semantics; this harness goes further and runs the REFERENCE'S OWN
`eval_top1_single` (imported from /root/reference/train.py, hydra/wandb
shimmed) on the same cache files and decoder checkpoint, then compares every
reported metric: weighted loss, token top-1, whole-noun any-of-M top-1,
per-position top-1, token/valid-target/sample counts.

Cases:
  single — a single-target cache (weights default)
  multi  — M=3 multi-target cache with padded targets + zero-weight tails
  guided — the multi cache with eval_guided=true (guide-masked argmax in
           the metric on both sides)

Requires the round-2 agreement fixtures (run_agreement.py phases assets..
train) in AGREEMENT_WORK (default /tmp/agreement).

Usage: python exp/agreement/beam_tie.py-style: python exp/agreement/eval_diff.py
"""

from __future__ import annotations

import dataclasses
import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REF = "/root/reference"
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from fixture_store import resolve_work  # noqa: E402

WORK = resolve_work()

sys.path.insert(0, REPO)


def log(msg: str) -> None:
    print(f"[eval_diff] {msg}", flush=True)


def run_ref_eval(cache: str, out: str, *, multi=False, weights=False, guided=False):
    from run_agreement import _make_shims

    env = dict(os.environ)
    env["PYTHONPATH"] = REF + os.pathsep + _make_shims()
    env.pop("JAX_PLATFORMS", None)
    driver = os.path.join(REPO, "exp", "agreement", "ref_driver.py")
    cmd = [sys.executable, driver, "eval",
           "--hf-dir", os.path.join(WORK, "hf_model"), "--cache", cache,
           "--checkpoint", os.path.join(WORK, "agreement.model"),
           "--batch-size", "64", "--out", out]
    if multi:
        cmd.append("--multi-target")
    if weights:
        cmd.append("--use-weights")
    if guided:
        cmd.append("--eval-guided")
    proc = subprocess.run(cmd, env=env, cwd=REF, capture_output=True,
                          text=True, timeout=3600)
    sys.stdout.write(proc.stdout)
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr)
        raise RuntimeError(f"ref eval failed rc={proc.returncode}")
    with open(out) as f:
        return json.load(f)


def build_caches():
    """Single-target and multi-target caches over the checkpoint's own nouns,
    written by OUR writer with the reference's int64 token dtype (the
    reference reader requires dtype match with its TransformersEmbedder)."""
    import jax

    jax.config.update("jax_platforms", "cpu")

    from novic_tpu.embedders.base import Embedder
    from novic_tpu.data.cache import EmbeddingCacheWriter
    from novic_tpu.text.target import TargetTokenizer
    from novic_tpu.train.checkpoint import load_reference_checkpoint

    ck = load_reference_checkpoint(os.path.join(WORK, "agreement.model"))
    nouns = list(ck["target_nouns"][ck["num_invalid_target_nouns"]:])
    tc = dataclasses.replace(
        ck["target_config"], token_dtype="int64",
        compact_map=ck["target_config"].compact_map.astype(np.int64),
        compact_unmap=ck["target_config"].compact_unmap.astype(np.int64))

    emb = Embedder.create(
        "transformers:" + os.path.join(WORK, "hf_model"),
        weights_path=os.path.join(WORK, "towers.npz"),
        bpe_merges_path=os.path.join(WORK, "merges.txt"),
        compute_dtype="float32", load_model=True)
    tt = TargetTokenizer(emb.tokenizer, tc)

    rng = np.random.default_rng(17)
    N = 192
    idx = rng.integers(0, len(nouns), size=N)
    embeds = emb.inference_text([f"a photo of a {nouns[i]}" for i in idx])
    embeds = np.asarray(embeds, np.float32)

    single = os.path.join(WORK, "evaldiff_single.bin")
    with EmbeddingCacheWriter(single, num_embed=N, embed_dim=emb.embed_dim,
                              target_tokenizer=tt, target_nouns=nouns,
                              num_embed_targets=1, shuffle=False,
                              use_targets=True, full_targets=True,
                              default_weights=True, unit_weights=True,
                              embedder_strict=False) as w:
        w.write(embeds, (idx + 1).astype(np.int64).reshape(N, 1))

    targets = np.zeros((N, 3), np.int64)
    weights = np.zeros((N, 3), np.float32)
    for i, ni in enumerate(idx):
        correct = ni + 1
        wrong = (ni + 1) % len(nouns) + 1
        wrong2 = (ni + 2) % len(nouns) + 1
        pat = i % 4
        if pat == 0:
            targets[i, :2] = [correct, wrong]
            weights[i, :2] = [1.0, 0.4]
        elif pat == 1:
            targets[i, :2] = [wrong, correct]
            weights[i, :2] = [0.9, 0.6]
        elif pat == 2:
            targets[i] = [wrong, correct, wrong2]
            weights[i] = [0.9, 0.0, 0.0]
        else:
            targets[i, 0] = correct
            weights[i, 0] = 1.0
    multi = os.path.join(WORK, "evaldiff_multi.bin")
    with EmbeddingCacheWriter(multi, num_embed=N, embed_dim=emb.embed_dim,
                              target_tokenizer=tt, target_nouns=nouns,
                              num_embed_targets=3, shuffle=False,
                              use_targets=True, full_targets=False,
                              default_weights=False, unit_weights=False,
                              embedder_strict=False) as w:
        w.write(embeds, targets, weights)
    log(f"caches written: {single}, {multi} ({N} rows over {len(nouns)} nouns)")
    return single, multi


def run_our_eval(cache: str, *, multi=False, weights=False, guided=False):
    from novic_tpu.cli.train import main as cli

    args = [
        "action=eval", f"embedding_dataset={cache}",
        f"load_model={os.path.join(WORK, 'agreement.model')}",
        "embedder=transformers:" + os.path.join(WORK, "hf_model"),
        f"embedder_weights={os.path.join(WORK, 'towers.npz')}",
        f"bpe_merges_path={os.path.join(WORK, 'merges.txt')}",
        "embedder_compute_dtype=float32", "strict_embedder=false",
        "batch_size=64", f"output_dir={os.path.join(WORK, 'outputs')}",
        f"multi_target={str(multi).lower()}",
        f"use_weights={str(weights).lower()}",
        f"eval_guided={str(guided).lower()}",
    ]
    results = cli(args)
    return next(iter(results.values()))


def compare(name: str, ours: dict, ref: dict) -> dict:
    diffs = {
        "loss_rel": abs(ours["loss"] - ref["loss"]) / max(abs(ref["loss"]), 1e-12),
        "token_top1": (ours["token_top1"], ref["token_top1"]),
        "noun_top1": (ours["noun_top1"], ref["noun_top1"]),
        "tokens": (ours["tokens"], ref["tokens"]),
        "num_valid_targets": (ours["num_valid_targets"], ref["num_valid_targets"]),
        "num_samples": (ours["num_samples"], ref["num_samples"]),
    }
    ok = (diffs["loss_rel"] < 5e-4
          and ours["tokens"] == ref["tokens"]
          and ours["num_valid_targets"] == ref["num_valid_targets"]
          and ours["num_samples"] == ref["num_samples"]
          and abs(ours["token_top1"] - ref["token_top1"]) < 1e-6
          and abs(ours["noun_top1"] - ref["noun_top1"]) < 1e-6)
    ours_pos = [p for p in ours["pos_top1"] if p is not None]
    ref_pos = ref["pos_top1"][:len(ours_pos)]
    # ref eval_top1_seq is an int-tensor division in float32; ours is
    # float64 — compare at f32 resolution
    pos_ok = all(abs(a - b) < 1e-6 for a, b in zip(ours_pos, ref_pos))
    log(f"[{name}] loss ours {ours['loss']:.6e} vs ref {ref['loss']:.6e} "
        f"(rel {diffs['loss_rel']:.1e}); token top1 {ours['token_top1']:.4%} vs "
        f"{ref['token_top1']:.4%}; noun top1 {ours['noun_top1']:.4%} vs "
        f"{ref['noun_top1']:.4%}; counts "
        f"{(ours['tokens'], ours['num_valid_targets'], ours['num_samples'])} vs "
        f"{(ref['tokens'], ref['num_valid_targets'], ref['num_samples'])}; "
        f"per-pos match {pos_ok} -> {'MATCH' if ok and pos_ok else 'MISMATCH'}")
    if not pos_ok:
        log(f"  pos ours: {[round(p, 6) for p in ours_pos]}")
        log(f"  pos ref : {[round(p, 6) for p in ref_pos]}")
        log(f"  pos ref full: {[round(p, 6) for p in ref['pos_top1']]}")
    return {"name": name, "ok": bool(ok and pos_ok), **diffs,
            "pos_ours": ours_pos, "pos_ref": ref_pos}


def main() -> None:
    single, multi = build_caches()
    report = []
    ref = run_ref_eval(single, os.path.join(WORK, "ref_eval_single.json"))
    ours = run_our_eval(single)
    report.append(compare("single", ours, ref))

    ref = run_ref_eval(multi, os.path.join(WORK, "ref_eval_multi.json"),
                       multi=True, weights=True)
    ours = run_our_eval(multi, multi=True, weights=True)
    report.append(compare("multi+weights", ours, ref))

    ref = run_ref_eval(multi, os.path.join(WORK, "ref_eval_guided.json"),
                       multi=True, weights=True, guided=True)
    ours = run_our_eval(multi, multi=True, weights=True, guided=True)
    report.append(compare("multi+weights+guided", ours, ref))

    with open(os.path.join(WORK, "result_eval_diff.json"), "w") as f:
        json.dump(report, f, indent=1)
    if all(r["ok"] for r in report):
        log("ALL CASES MATCH — action=eval is differentially identical to the "
            "reference's eval_top1_single")
    else:
        log("MISMATCHES FOUND — see result_eval_diff.json")
        sys.exit(1)


if __name__ == "__main__":
    main()
