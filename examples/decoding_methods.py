"""Decode-method tour: greedy vs beam vs exhaustive 'all' on one checkpoint.

NOVIC serves one of three generation methods per request, named by the
compact gencfg codec (reference infer.py:357-433; same grammar here):

    {method}_k{K}_v{none|tokX|tgtX}_g{n|p|r}_t{tau}_a{alpha}

  * greedy — KV-cached argmax scan (fastest; the reference re-forwards the
    whole sequence per token instead, ref embedding_decoder.py:779-850)
  * beam   — batched beam search, k candidates (the product default)
  * all    — exhaustively teacher-force EVERY guide target and rank them
    (exact posterior over the guide set; always guided)

and three orthogonal score knobs: guiding (gn/gp/gr = none / prefix-masked /
renormalized), a vocab-prior correction (vtokX / vtgtX with scaler X), and
length normalization (a{alpha}).

This example trains the tiny quickstart checkpoint, then classifies the same
embeddings under a grid of gencfgs through the packaged NOVICModel API —
the way eval_cls_decoding sweeps its grid (ref train.py:2127-2450).

Run:  python examples/decoding_methods.py     (CPU ok, ~2 min, no assets)
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

from examples.quickstart import NOUNS, build_demo_checkpoint
from novic_tpu.infer import NOVICModel

GENCFGS = [
    "greedy_k1_vnone_gn_t1_a0",      # fastest: unguided argmax
    "greedy_k1_vnone_gp_t1_a0",      # guided: only vocab prefixes survive
    "beam_k3_vnone_gn_t1_a0",        # product default shape (released: k=10)
    "beam_k3_vnone_gr_t1_a0",        # guided + renormalized over the guide set
    "beam_k3_vtgt0.5_gp_t1_a0",      # per-target vocab prior correction
    "all_k3_vnone_gp_t1_a0",         # exact: every vocab target scored
    "all_k3_vtok0.5_gr_t1_a0.5",     # 'all' + per-token prior + length norm
]


def main():
    workdir = tempfile.mkdtemp(prefix="novic_decoding_")
    print(f"Workdir: {workdir}")
    ckpt, base = build_demo_checkpoint(workdir)

    # Probe embeddings: the clean per-noun embeddings plus jittered copies
    # (the modality-gap stand-in this toy pipeline trains across)
    rng = np.random.default_rng(7)
    noisy = base + 0.02 * rng.normal(size=base.shape).astype(np.float32)
    noisy /= np.linalg.norm(noisy, axis=1, keepdims=True)
    probes = np.concatenate([base, noisy], axis=0)
    labels = NOUNS + NOUNS

    print(f"\n{'gencfg':32s} {'top1':>6s}  {'mean logprob':>12s}  sample predictions")
    results = {}
    with NOVICModel(ckpt, gencfg=GENCFGS[0], batch_size=len(probes)) as novic:
        for name in GENCFGS:
            novic.set_gencfg(name)
            out = novic.classify_embeds(probes)
            top1 = np.mean([p[0] == l for p, l in zip(out.preds, labels)])
            mean_lp = float(np.mean([lp[0] for lp in out.logprobs]))
            results[name] = top1
            sample = ", ".join(p[0] for p in out.preds[:3])
            print(f"{name:32s} {top1:6.1%}  {mean_lp:12.3f}  {sample}")

    # On this fully-trained toy task every method should nail the clean set;
    # 'all' is the exact ranking the approximate methods approach.
    assert results["all_k3_vnone_gp_t1_a0"] == 1.0
    assert results["beam_k3_vnone_gn_t1_a0"] >= results["greedy_k1_vnone_gn_t1_a0"] - 1e-9
    print("\nOK: greedy/beam/all gencfg grid through the NOVICModel API")


if __name__ == "__main__":
    main()
