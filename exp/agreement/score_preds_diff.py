"""format_preds scoring differential: our categorisation/scoring vs the
REFERENCE's own PredictionScorer (ref train.py:234-336) on shared
predictions + annotations.

The fixture deliberately exercises the scorer's edge semantics: missing
samples, predictions matching no category, unknown (zero-weight) categories,
a prediction matching MULTIPLE categories (the reference counts the
alphabetically-first match and records a multiple-categories error), and the
top-k best-so-far carry incl. equal-score ties.

Usage: python exp/agreement/score_preds_diff.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REF = "/root/reference"
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from fixture_store import resolve_work  # noqa: E402

WORK = resolve_work()

sys.path.insert(0, REPO)

PREDICTIONS = {
    "img_a": ["dog", "cat", "apple"],          # top1 correct_primary
    "img_b": ["cat", "dog", "tree"],           # close_secondary then correct
    "img_c": ["tree", "rock", "dog"],          # misses until rank 3
    "img_d": ["dog", "dog", "dog"],            # missing sample (no annotation)
    "img_e": ["both", "cat", "dog"],           # multi-category match
    "img_f": ["odd", "cat", "dog"],            # unknown zero-weight category
    "img_g": ["tie1", "tie2", "dog"],          # equal-score tie carry
}
ANNOTATIONS = {
    "img_a": {"correct_primary": ["dog"], "close_primary": ["puppy"]},
    "img_b": {"correct_primary": ["dog"], "close_secondary": ["cat"]},
    "img_c": {"correct_primary": ["dog"], "close_primary": []},
    "img_e": {"correct_primary": ["both", "dog"], "close_primary": ["both"]},
    "img_f": {"correct_primary": ["dog"], "weird_cat": ["odd"]},
    "img_g": {"close_primary": ["tie1"], "close_secondary": [],
              "correct_primary": ["dog"], "half": ["tie2"]},
}
TOPK = 3


def log(msg: str) -> None:
    print(f"[score_preds_diff] {msg}", flush=True)


def main() -> None:
    preds_json = os.path.join(WORK, "scorediff_preds.json")
    ann_json = os.path.join(WORK, "scorediff_ann.json")
    with open(preds_json, "w") as f:
        json.dump(PREDICTIONS, f)
    with open(ann_json, "w") as f:
        json.dump(ANNOTATIONS, f)

    from run_agreement import _make_shims

    env = dict(os.environ)
    env["PYTHONPATH"] = REF + os.pathsep + _make_shims()
    env.pop("JAX_PLATFORMS", None)
    driver = os.path.join(REPO, "exp", "agreement", "ref_driver.py")
    out = os.path.join(WORK, "ref_score.json")
    proc = subprocess.run([sys.executable, driver, "score", "--preds-json",
                           preds_json, "--ann-json", ann_json, "--topk",
                           str(TOPK), "--out", out],
                          env=env, cwd=REF, capture_output=True, text=True,
                          timeout=600)
    sys.stdout.write(proc.stdout)
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr)
        raise RuntimeError(f"ref score failed rc={proc.returncode}")
    with open(out) as f:
        ref = json.load(f)

    from novic_tpu.cli.actions_eval import CATEGORY_WEIGHTS, _categorise_topk

    sample_keys = list(PREDICTIONS)
    pred_rows = [PREDICTIONS[s] for s in sample_keys]
    scores, counters = _categorise_topk(ANNOTATIONS, sample_keys, pred_rows, TOPK)
    ours = {
        "topk_scores": [float(s) for s in scores],
        "topk_counters": [{str(k): v for k, v in c.items()} for c in counters],
    }

    ok = True
    if [round(s, 9) for s in ours["topk_scores"]] != \
            [round(s, 9) for s in ref["topk_scores"]]:
        log(f"topk scores: ours {ours['topk_scores']} vs ref {ref['topk_scores']} MISMATCH")
        ok = False
    for k, (oc, rc) in enumerate(zip(ours["topk_counters"], ref["topk_counters"])):
        if oc != rc:
            log(f"top{k + 1} counter: ours {oc} vs ref {rc} MISMATCH")
            ok = False
    log(f"topk scores {ours['topk_scores']} vs ref {ref['topk_scores']}")
    if ok:
        log("MATCH — format_preds categorisation/scoring identical to the "
            "reference PredictionScorer (incl. multi-category, unknown-"
            "category, tie-carry and missing-sample semantics)")
    else:
        sys.exit(1)


if __name__ == "__main__":
    main()
