"""NounDataset differential: our procedural noun dataset vs the REFERENCE's
own noun_dataset.py on identical vocab + the reference's OWN prompts.json.

Compares, sample-for-sample: FSID/USID numbering, frequencies, generated
texts (prompt templating, indefinite articles, hypernym suffixes with comma
variants and frequency distributions), target nouns, the target list +
invalid count, and 200 random-FSID indexed decodes (the O(1) index math vs
the sequential generator, cross-implementation).

The vocab exercises: multi-variant singulars/plurals with distinct
frequencies, multi-word nouns, vowel/consonant article selection, hypernym
chains (incl. an entry with two hypernyms), and vocab_thres filtering.

Usage: python exp/agreement/noun_diff.py   (needs the agreement hf_model
fixture for the reference's embedder construction; AGREEMENT_WORK dir)
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

VOCAB = [
    {"id": 0, "target_noun": "animal", "pretty_noun": "Animal",
     "singulars": ["animal", "creature"], "plurals": ["animals"],
     "singulars_freq": [3, 1], "plurals_freq": [2], "hypernyms": []},
    {"id": 1, "target_noun": "dog", "pretty_noun": "Dog",
     "singulars": ["dog", "hound"], "plurals": ["dogs", "hounds"],
     "singulars_freq": [4, 1], "plurals_freq": [2, 1], "hypernyms": [0]},
    {"id": 2, "target_noun": "eagle", "pretty_noun": "Eagle",
     "singulars": ["eagle"], "plurals": ["eagles"],
     "singulars_freq": [2], "plurals_freq": [1], "hypernyms": [0]},
    {"id": 3, "target_noun": "fire truck", "pretty_noun": "Fire Truck",
     "singulars": ["fire truck", "fire engine"], "plurals": ["fire trucks"],
     "singulars_freq": [2, 1], "plurals_freq": [1], "hypernyms": [5]},
    {"id": 4, "target_noun": "umbrella", "pretty_noun": "Umbrella",
     "singulars": ["umbrella"], "plurals": ["umbrellas"],
     "singulars_freq": [2], "plurals_freq": [1], "hypernyms": [5]},
    {"id": 5, "target_noun": "vehicle", "pretty_noun": "Vehicle",
     "singulars": ["vehicle"], "plurals": ["vehicles"],
     "singulars_freq": [1], "plurals_freq": [1], "hypernyms": []},
    {"id": 6, "target_noun": "golden retriever", "pretty_noun": "Golden Retriever",
     "singulars": ["golden retriever"], "plurals": ["golden retrievers"],
     "singulars_freq": [1], "plurals_freq": [1], "hypernyms": [1, 0]},
    # Filtered out at vocab_thres=1 (total freq 1)
    {"id": 7, "target_noun": "rarity", "pretty_noun": "Rarity",
     "singulars": ["rarity"], "plurals": [],
     "singulars_freq": [1], "plurals_freq": [], "hypernyms": []},
]


def log(msg: str) -> None:
    print(f"[noun_diff] {msg}", flush=True)


def run_ref(vocab_json: str, out: str, collection: str, hyp: str, thres: int):
    from run_agreement import _make_shims

    env = dict(os.environ)
    env["PYTHONPATH"] = REF + os.pathsep + _make_shims()
    env.pop("JAX_PLATFORMS", None)
    driver = os.path.join(REPO, "exp", "agreement", "ref_driver.py")
    cmd = [sys.executable, driver, "noundata",
           "--hf-dir", os.path.join(WORK, "hf_model"),
           "--vocab-json", vocab_json,
           "--prompts-json", os.path.join(REF, "data", "prompts.json"),
           "--prompt-collection", collection, "--hypernym-collection", hyp,
           "--vocab-thres", str(thres), "--out", out]
    proc = subprocess.run(cmd, env=env, cwd=REF, capture_output=True,
                          text=True, timeout=3600)
    sys.stdout.write(proc.stdout)
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr)
        raise RuntimeError(f"ref noundata failed rc={proc.returncode}")
    with open(out) as f:
        return json.load(f)


def run_ours(collection: str, hyp: str, thres: int):
    import numpy as np

    from novic_tpu.data.noun_dataset import NounDataset
    from novic_tpu.embedders.base import Embedder

    emb = Embedder.create("test:32")
    # Our reader consumes the REFERENCE'S OWN prompts.json asset
    ds = NounDataset(emb, vocab_json=VOCAB,
                     prompt_path=os.path.join(REF, "data", "prompts.json"),
                     prompt_collection=collection, hypernym_collection=hyp,
                     vocab_thres=thres, check_consistent=True)
    samples = [(s.fsid, s.usid, s.freq, s.text, s.target)
               for s in ds.unique_sample()]
    rng = np.random.default_rng(3)
    probe_fsids = sorted(int(i) for i in rng.integers(0, ds.num_fsids, size=200))
    probes = []
    for fsid in probe_fsids:
        usid = ds.get_sample_usid(fsid)
        text, target = ds.get_sample_text(fsid=fsid)
        probes.append((fsid, int(usid), text, target))
    return {"num_fsids": int(ds.num_fsids), "num_usids": int(ds.num_usids),
            "samples": samples, "probes": probes, "targets": list(ds.targets),
            "num_invalid_targets": int(ds.num_invalid_targets)}


def compare(name, ours, ref) -> bool:
    ok = True
    for key in ("num_fsids", "num_usids", "num_invalid_targets"):
        if ours[key] != ref[key]:
            log(f"[{name}] {key}: ours {ours[key]} vs ref {ref[key]} MISMATCH")
            ok = False
    if list(ours["targets"]) != list(ref["targets"]):
        log(f"[{name}] target list mismatch "
            f"({len(ours['targets'])} vs {len(ref['targets'])})")
        ok = False
    ref_samples = [tuple(s) for s in ref["samples"]]
    our_samples = [tuple(s) for s in ours["samples"]]
    if our_samples != ref_samples:
        n_diff = sum(a != b for a, b in zip(our_samples, ref_samples)) + \
            abs(len(our_samples) - len(ref_samples))
        log(f"[{name}] sample stream: {n_diff} differing entries "
            f"(ours {len(our_samples)} vs ref {len(ref_samples)})")
        for a, b in zip(our_samples, ref_samples):
            if a != b:
                log(f"  first diff: ours {a} vs ref {b}")
                break
        ok = False
    if [tuple(p) for p in ours["probes"]] != [tuple(p) for p in ref["probes"]]:
        log(f"[{name}] indexed-probe mismatch")
        ok = False
    log(f"[{name}] {'MATCH' if ok else 'MISMATCH'} — "
        f"{ref['num_usids']} USIDs / {ref['num_fsids']} FSIDs, "
        f"{len(ref['samples'])} samples compared")
    return ok


def main() -> None:
    vocab_json = os.path.join(WORK, "noun_diff_vocab.json")
    with open(vocab_json, "w") as f:
        json.dump(VOCAB, f)
    cases = [
        ("in1k_cifar", "ImageNet1K | CIFAR", "None", 0),
        ("hypernyms", "ImageNet1K", "Type | Example", 0),
        ("thres_bracket", "CIFAR", "Bracket", 1),
    ]
    all_ok = True
    for name, collection, hyp, thres in cases:
        ref = run_ref(vocab_json, os.path.join(WORK, f"ref_noundata_{name}.json"),
                      collection, hyp, thres)
        ours = run_ours(collection, hyp, thres)
        all_ok &= compare(name, ours, ref)
    if all_ok:
        log("ALL CASES MATCH — NounDataset is differentially identical to the "
            "reference (index math, templating, hypernyms, thresholding)")
    else:
        sys.exit(1)


if __name__ == "__main__":
    main()
