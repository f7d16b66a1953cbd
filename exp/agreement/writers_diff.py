"""Cache-writer stream differential: our NounMultisetCacheWriter and
CaptionsCacheWriter vs the REFERENCE'S OWN writers (imported, not copied)
on identical vocab + the reference's own prompts.json + a shared captions
fixture.

Both stacks sample with Mersenne `random` seeded identically and make the
same `sample()` calls in the same order, so the generated (text, targets)
streams must match ORDERED, element for element — this pins the sampling
structure (frequency-weighted multiset draws, per-prompt draw order, caption
template sampling/clamping/cycling, dot-termination, article insertion) far
beyond what content-set comparison can.

The captions fixture exercises: clamped template sampling (more templates
needed than captions exist), captions missing trailing dots, a vocab target
with no captions at all, a captions target not in the vocab, and
singular-only captions entries. The multiset case runs multi_target_freq
[2, 1, 1] (trailing m=2/m=3 multi-target streams + the writer's own m=1
counter verification against the plain dataset).

Usage: python exp/agreement/writers_diff.py   (needs the agreement hf_model
fixture for the reference's embedder construction; AGREEMENT_WORK dir)
"""

from __future__ import annotations

import contextlib
import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REF = "/root/reference"
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from fixture_store import resolve_work  # noqa: E402
from noun_diff import VOCAB  # noqa: E402  (shared vocab fixture)

WORK = resolve_work()

sys.path.insert(0, REPO)

SEED = 20260820
MULTI_FREQ = [2, 1, 1]
TEMPLATE_MULT = 2
SAMPLE_MULT = 3
PROMPT_COLLECTION = "ImageNet1K | CIFAR"

CAPTIONS = [
    # Clamped sampling: needs singulars_freq_sum(4)*tm(2)=8 > 5 available.
    {"target_noun": "animal",
     "singular_captions": [
         "A {singular} resting in the shade.",
         "Photo of a wild {singular}",
         "The {singular} looked at the camera.",
         "One {singular} in a field",
         "A curious {singular} sniffing around."],
     "plural_captions": [
         "Several {plural} grazing together.",
         "A group of {plural}",
         "Many {plural} in the distance."]},
    # No trailing dots anywhere (dot-appending path).
    {"target_noun": "dog",
     "singular_captions": ["A {singular} chasing a ball",
                           "My {singular} sleeping on the couch"],
     "plural_captions": ["Two {plural} playing in the park",
                         "The {plural} barked at the mailman"]},
    # "eagle" is deliberately MISSING (vocab target with no captions).
    # Singular-only entry (empty plural captions).
    {"target_noun": "fire truck",
     "singular_captions": ["A red {singular} with its lights on.",
                           "The {singular} rushed to the scene."],
     "plural_captions": []},
    {"target_noun": "umbrella",
     "singular_captions": ["An open {singular} in the rain.",
                           "A striped {singular} on the beach.",
                           "Someone holding a {singular}.",
                           "A {singular} drying by the door.",
                           "The {singular} turned inside out."],
     "plural_captions": ["Colorful {plural} at the market.",
                         "A row of {plural} on the sand."]},
    {"target_noun": "vehicle",
     "singular_captions": ["A {singular} parked outside."],
     "plural_captions": ["Many {plural} stuck in traffic."]},
    {"target_noun": "golden retriever",
     "singular_captions": ["A {singular} fetching a stick."],
     "plural_captions": ["Three {plural} on the lawn."]},
    # Target not in the vocab (unused path).
    {"target_noun": "zebra",
     "singular_captions": ["A {singular} with bold stripes."],
     "plural_captions": ["A dazzle of {plural}."]},
]


def log(msg: str) -> None:
    print(f"[writers_diff] {msg}", flush=True)


def run_ref(vocab_json: str, captions_json: str, out: str) -> dict:
    from run_agreement import _make_shims

    env = dict(os.environ)
    env["PYTHONPATH"] = REF + os.pathsep + _make_shims()
    env.pop("JAX_PLATFORMS", None)
    driver = os.path.join(REPO, "exp", "agreement", "ref_driver.py")
    cache_dir = os.path.join(WORK, "writers_diff_ref")
    os.makedirs(cache_dir, exist_ok=True)
    cmd = [sys.executable, driver, "writerstreams",
           "--hf-dir", os.path.join(WORK, "hf_model"),
           "--vocab-json", vocab_json,
           "--prompts-json", os.path.join(REF, "data", "prompts.json"),
           "--captions-json", captions_json,
           "--prompt-collection", PROMPT_COLLECTION,
           "--multi-freq", json.dumps(MULTI_FREQ),
           "--template-multiplier", str(TEMPLATE_MULT),
           "--sample-multiplier", str(SAMPLE_MULT),
           "--seed", str(SEED), "--cache-dir", cache_dir, "--out", out]
    proc = subprocess.run(cmd, env=env, cwd=REF, capture_output=True,
                          text=True, timeout=3600)
    sys.stdout.write(proc.stdout)
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr)
        raise RuntimeError(f"ref writerstreams failed rc={proc.returncode}")
    with open(out) as f:
        return json.load(f)


def _record_streams(writer, emb):
    """Stub inference_text to record texts + return unit rows; wrap
    tensorize_embed_targets to record the target stream."""
    texts_log: list[str] = []
    targets_log: list = []
    rng = np.random.default_rng(7)

    def fake_inference_text(texts):
        texts_log.extend(texts)
        e = rng.normal(size=(len(texts), emb.embed_dim)).astype(np.float32)
        return e / np.linalg.norm(e, axis=1, keepdims=True)

    orig_tensorize = writer.tensorize_embed_targets

    def wrapped(embed_targets_str):
        targets_log.extend(t if isinstance(t, str) else list(t)
                           for t in embed_targets_str)
        return orig_tensorize(embed_targets_str)

    emb.inference_text = fake_inference_text
    emb.inference_model = contextlib.nullcontext
    writer.tensorize_embed_targets = wrapped
    return texts_log, targets_log


def run_ours(vocab_json: str, captions_json: str, tmp_dir: str) -> dict:
    from novic_tpu.data.cache_writers import (
        CaptionsCacheWriter,
        NounMultisetCacheWriter,
    )
    from novic_tpu.data.noun_dataset import NounDataset
    from novic_tpu.embedders.base import Embedder

    out: dict = {}
    for which in ("captions", "multiset"):
        emb = Embedder.create("test:32")
        ds = NounDataset(emb, vocab_json=VOCAB,
                         prompt_path=os.path.join(REF, "data", "prompts.json"),
                         prompt_collection=PROMPT_COLLECTION,
                         hypernym_collection="None", check_consistent=True)
        tc = emb.create_target_config(
            ds.targets, with_start_token=False, with_end_token=True,
            compact_ids=True, fixed_token_length=False,
            auto_fixed_token_length=True, use_masks=True)
        emb.configure_target(tc, ds.targets)
        ds.configure_target()
        if which == "captions":
            writer = CaptionsCacheWriter(
                os.path.join(tmp_dir, "ours_captions.bin"), captions_json, ds,
                template_multiplier=TEMPLATE_MULT, sample_multiplier=SAMPLE_MULT,
                seed=SEED)
        else:
            writer = NounMultisetCacheWriter(
                os.path.join(tmp_dir, "ours_multiset.bin"), ds,
                multi_target_freq=MULTI_FREQ, seed=SEED)
        texts_log, targets_log = _record_streams(writer, emb)
        writer.generate()
        entry = {"stream": list(zip(texts_log, targets_log)),
                 "num_embed": int(writer.num_embed),
                 "full_targets": bool(writer.full_targets)}
        if which == "captions":
            entry["unique_captions"] = sum(
                len(sp) + len(pp) for _, sp, pp in writer.entries)
        else:
            entry["multi_target_freq"] = list(writer.multi_target_freq)
            entry["embed_targets_dim"] = int(writer.num_embed_targets)
        out[which] = entry
    return out


def compare(name: str, ours: dict, ref: dict) -> bool:
    ok = True
    for key in set(ref) - {"stream"}:
        if key in ours and ours[key] != ref[key]:
            log(f"[{name}] {key}: ours {ours[key]} vs ref {ref[key]} MISMATCH")
            ok = False
    norm = lambda s: [(t, tg if isinstance(tg, str) else tuple(tg))  # noqa: E731
                      for t, tg in s]
    our_stream, ref_stream = norm(ours["stream"]), norm(ref["stream"])
    if our_stream != ref_stream:
        n_diff = sum(a != b for a, b in zip(our_stream, ref_stream)) + \
            abs(len(our_stream) - len(ref_stream))
        log(f"[{name}] stream: {n_diff} differing entries "
            f"(ours {len(our_stream)} vs ref {len(ref_stream)})")
        for i, (a, b) in enumerate(zip(our_stream, ref_stream)):
            if a != b:
                log(f"  first diff at {i}: ours {a} vs ref {b}")
                break
        ok = False
    log(f"[{name}] {'MATCH' if ok else 'MISMATCH'} — "
        f"{len(ref_stream)} ordered rows compared")
    return ok


def main() -> None:
    vocab_json = os.path.join(WORK, "writers_diff_vocab.json")
    with open(vocab_json, "w") as f:
        json.dump(VOCAB, f)
    captions_json = os.path.join(WORK, "writers_diff_captions.json")
    with open(captions_json, "w") as f:
        json.dump(CAPTIONS, f)
    tmp_dir = os.path.join(WORK, "writers_diff_ours")
    os.makedirs(tmp_dir, exist_ok=True)

    ref = run_ref(vocab_json, captions_json,
                  os.path.join(WORK, "ref_writerstreams.json"))
    ours = run_ours(vocab_json, captions_json, tmp_dir)

    ok = compare("captions", ours["captions"], ref["captions"])
    ok &= compare("multiset", ours["multiset"], ref["multiset"])
    if ok:
        log("ALL MATCH — multiset + captions writers are differentially "
            "identical to the reference (ordered text/target streams)")
    else:
        sys.exit(1)


if __name__ == "__main__":
    main()
