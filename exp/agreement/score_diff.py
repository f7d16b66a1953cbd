"""Score-level decode agreement (round 3).

Round 2/3 compared top-1 LABELS end-to-end (96/96 at matched numerics).
This harness compares the prediction SCORES: for all 96 agreement images ×
the three decode methods (beam k10, greedy, exhaustive 'all'), our
NOVICModel's per-prediction logprobs vs the reference NOVICModel's dumps —
but on the REFERENCE's embeddings for both stacks, so the comparison
isolates decode-scorer numerics from the image-embedding path.

Usage: python exp/agreement/score_diff.py  (needs the agreement fixtures +
the ref_labels_*.json dumps from run_agreement phases labels/labels_extra)
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from fixture_store import resolve_work  # noqa: E402

WORK = resolve_work()

sys.path.insert(0, REPO)

GENCFGS = {
    "beam_k10_vnone_gp_t1_a0": "ref_labels_beam_k10_vnone_gp_t1_a0.json",
    "greedy_k1_vnone_gp_t1_a0": "ref_labels_greedy_k1_vnone_gp_t1_a0.json",
    "all_k5_vnone_gp_t1_a0": "ref_labels_all_k5_vnone_gp_t1_a0.json",
}


def log(msg: str) -> None:
    print(f"[score_diff] {msg}", flush=True)


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    from novic_tpu.infer import NOVICModel

    ref_embeds = np.load(os.path.join(WORK, "ref_embeds.npz"))["image"]
    ref_embeds = ref_embeds.astype(np.float32)

    report = {}
    ok_all = True
    for gencfg, ref_name in GENCFGS.items():
        path = os.path.join(WORK, ref_name)
        if not os.path.isfile(path):
            # A missing dump must FAIL the run, not soft-pass with fewer
            # gencfgs compared (a silent skip once reported SCORES MATCH
            # while the beam dump was absent).
            log(f"[{gencfg}] reference dump missing ({ref_name}) — run "
                f"run_agreement phases labels,labels_extra first")
            ok_all = False
            continue
        with open(path) as f:
            ref = json.load(f)
        model = NOVICModel(os.path.join(WORK, "agreement.model"), gencfg=gencfg,
                           batch_size=16,
                           embedder_kwargs=dict(
                               weights_path=os.path.join(WORK, "towers.npz"),
                               bpe_merges_path=os.path.join(WORK, "merges.txt"),
                               compute_dtype="float32"))
        with model:
            ours = model.classify_embeds(ref_embeds)

        # Compare score vectors where the predicted label SETS agree (scores
        # attach to predictions; a flipped near-tie pairs different nouns)
        max_abs = 0.0
        rows = agree_rows = 0
        for our_lp, our_p, ref_lp, ref_p in zip(ours.logprobs, ours.preds,
                                                ref["logprobs"], ref["preds"]):
            rows += 1
            k = min(len(our_lp), len(ref_lp))
            if our_p[:k] == ref_p[:k]:
                agree_rows += 1
                max_abs = max(max_abs, max(abs(a - b)
                                           for a, b in zip(our_lp[:k], ref_lp[:k])))
        ok = agree_rows >= rows - 1 and max_abs < 5e-4
        ok_all &= ok
        log(f"[{gencfg}] {agree_rows}/{rows} rows with identical top-k label "
            f"order; max |score diff| {max_abs:.2e} -> "
            f"{'MATCH' if ok else 'MISMATCH'}")
        report[gencfg] = {"rows": rows, "order_agree": agree_rows,
                          "max_abs_score_diff": max_abs, "ok": ok}
    with open(os.path.join(WORK, "result_score_diff.json"), "w") as f:
        json.dump(report, f, indent=1)
    if ok_all and report:
        log("SCORES MATCH — per-prediction logprobs agree with the reference "
            "across all decode methods on identical embeddings")
    elif not report:
        sys.exit(2)
    else:
        sys.exit(1)


if __name__ == "__main__":
    main()
