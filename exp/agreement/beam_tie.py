"""Round-3 analysis of the single beam-k10 disagreement (VERDICT r2 weak #1).

AGREEMENT_r02 measured 95/96 top-1 beam agreement; the one diff is
`06_armadillo_orig.png`: ours ['tunnel','spoon',...] vs ref ['spoon','tunnel',...]
with reference beam scores spoon=-2.667004 vs tunnel=-2.668704 (gap 1.7e-3).

Hypothesis: a near-tie resolved differently by the two stacks' image-embedding
paths (cross-stack image-embed noise is up to 2.45e-4 per component,
AGREEMENT_r02 embeds table), NOT a beam-semantics divergence.

Decisive experiment — cross-feed the embeddings:
  A. OUR decoder on the REFERENCE's embedding of the image
  B. OUR decoder on OUR embedding (reproduces the disagreement)
  C. REFERENCE decoder on OUR embedding (via ref_driver labels_embeds)
If A matches the reference order and C matches ours, beam semantics are
identical and the flip is input noise on a sub-2e-3 score gap. If A still
disagrees on the SAME embedding bytes, there is a real beam bug to fix.

Usage: python exp/agreement/beam_tie.py   (requires a populated AGREEMENT_WORK
dir from run_agreement.py; default /tmp/agreement)
"""

from __future__ import annotations

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
GENCFG = "beam_k10_vnone_gp_t1_a0"
IMAGE = "06_armadillo_orig.png"

sys.path.insert(0, REPO)


def log(msg: str) -> None:
    print(f"[beam_tie] {msg}", flush=True)


def run_ref_labels_embeds(embeds_npz: str, out: str) -> None:
    from run_agreement import _make_shims  # noqa: E402 (sibling module)

    env = dict(os.environ)
    env["PYTHONPATH"] = REF + os.pathsep + _make_shims()
    env.pop("JAX_PLATFORMS", None)
    driver = os.path.join(REPO, "exp", "agreement", "ref_driver.py")
    cmd = [sys.executable, driver, "labels_embeds",
           "--checkpoint", os.path.join(WORK, "agreement.model"),
           "--embeds-npz", embeds_npz, "--gencfg", GENCFG, "--out", out]
    proc = subprocess.run(cmd, env=env, cwd=REF, capture_output=True,
                          text=True, timeout=3600)
    sys.stdout.write(proc.stdout)
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr)
        raise RuntimeError(f"ref_driver failed rc={proc.returncode}")


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import jax

    jax.config.update("jax_platforms", "cpu")

    import PIL.Image

    from novic_tpu.infer import NOVICModel

    with open(os.path.join(WORK, "images.json")) as f:
        paths = json.load(f)
    idx = next(i for i, p in enumerate(paths) if p.endswith(IMAGE))
    ref_embeds = np.load(os.path.join(WORK, "ref_embeds.npz"))["image"]
    ref_embed = ref_embeds[idx:idx + 1].astype(np.float32)

    ref_saved = json.load(open(os.path.join(WORK, "ref_labels_beam_k10_vnone_gp_t1_a0.json")))
    assert ref_saved["paths"][idx].endswith(IMAGE)
    ref_preds = ref_saved["preds"][idx][:5]
    ref_lp = ref_saved["logprobs"][idx][:5]
    log(f"reference (its own embed): {list(zip(ref_preds, [round(x, 6) for x in ref_lp]))}")

    model = NOVICModel(os.path.join(WORK, "agreement.model"), gencfg=GENCFG,
                       batch_size=16,
                       embedder_kwargs=dict(
                           weights_path=os.path.join(WORK, "towers.npz"),
                           bpe_merges_path=os.path.join(WORK, "merges.txt"),
                           compute_dtype="float32"))
    with model:
        image = PIL.Image.open(paths[idx]).convert("RGB")
        our_embed = model.embed_images([image])
        out_ours = model.classify_embeds(our_embed)          # B
        out_cross = model.classify_embeds(ref_embed)         # A

    embed_diff = float(np.abs(our_embed - ref_embed).max())
    log(f"embedding max abs diff (ours vs ref, this image): {embed_diff:.2e}")
    log(f"ours on OUR embed     : {list(zip(out_ours.preds[0][:5], [round(x, 6) for x in out_ours.logprobs[0][:5]]))}")
    log(f"ours on REF embed     : {list(zip(out_cross.preds[0][:5], [round(x, 6) for x in out_cross.logprobs[0][:5]]))}")

    # C: reference decoder on OUR embedding
    ours_npz = os.path.join(WORK, "beam_tie_our_embed.npz")
    np.savez(ours_npz, image=np.asarray(our_embed, np.float32))
    ref_out = os.path.join(WORK, "ref_labels_our_embed.json")
    run_ref_labels_embeds(ours_npz, ref_out)
    refx = json.load(open(ref_out))
    log(f"ref on OUR embed      : {list(zip(refx['preds'][0][:5], [round(x, 6) for x in refx['logprobs'][0][:5]]))}")

    # Verdict
    a_matches_ref = out_cross.preds[0][0] == ref_preds[0]
    c_matches_ours = refx["preds"][0][0] == out_ours.preds[0][0]
    score_gap_ref = abs(ref_lp[0] - ref_lp[1])
    score_gap_ours = abs(out_ours.logprobs[0][0] - out_ours.logprobs[0][1])
    same_embed_score_diff = max(
        abs(out_cross.logprobs[0][i] - ref_lp[i]) for i in range(3))
    result = {
        "image": IMAGE, "embed_max_abs_diff": embed_diff,
        "ref_top2_gap": score_gap_ref, "ours_top2_gap": score_gap_ours,
        "same_embed_top3_score_diff": same_embed_score_diff,
        "our_decoder_on_ref_embed_matches_ref": bool(a_matches_ref),
        "ref_decoder_on_our_embed_matches_ours": bool(c_matches_ours),
        "ours_on_ref_embed": [out_cross.preds[0][:5], out_cross.logprobs[0][:5]],
        "ours_on_our_embed": [out_ours.preds[0][:5], out_ours.logprobs[0][:5]],
        "ref_on_ref_embed": [ref_preds, ref_lp],
        "ref_on_our_embed": [refx["preds"][0][:5], refx["logprobs"][0][:5]],
    }
    with open(os.path.join(WORK, "result_beam_tie.json"), "w") as f:
        json.dump(result, f, indent=1)
    log("")
    if a_matches_ref and c_matches_ours:
        log(f"VERDICT: fp near-tie. On IDENTICAL embedding bytes both decoders "
            f"produce the same ranking (per-candidate scores agree to "
            f"{same_embed_score_diff:.2e}); the top-2 score gap "
            f"({score_gap_ref:.2e}) is smaller than the noise the two "
            f"image-embedding paths inject ({embed_diff:.2e}/component over "
            f"{ref_embed.shape[1]} dims). Not a beam-semantics bug.")
    else:
        log("VERDICT: REAL DIVERGENCE on identical embedding input — beam "
            "semantics differ; fix models/generate.py.")
    log(f"wrote {os.path.join(WORK, 'result_beam_tie.json')}")


if __name__ == "__main__":
    main()
