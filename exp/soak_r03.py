"""Round-3 soak: FULL released-vocabulary scale end-to-end on chip.

Round 2's soak proved the circuit at released *recipe* shapes (batch 8192,
released noise scheme) but on a 600-noun toy vocabulary. This soak scales the
VOCABULARY to the released FT0 numbers (ref paper fn.3: 42,919 nouns /
96,526 variants) so the paths whose cost grows with vocab run at production
size for the first time:

  * target-tokenizer compaction over a ~8k-word corpus (decoder token vocab
    ~8k after ×64 quantization — the released FT0 decoder's output matmul
    regime, ref embedding_decoder.py:131-141);
  * noun-dataset FSID/USID index math over 96.5k variants × a released
    prompt collection (CIFAR: 18 singular / 16 plural prompts; the full
    ImageNet1K|CIFAR expansion would be a 129 GB cache — over this box's
    disk — and changes nothing structural);
  * multi-million-row cache write / merge / mmap-read;
  * beam-k10 with a 42,919-noun guide trie;
  * the exhaustive 'all' scorer over every vocab target (the eval_cls
    decoding grid's most expensive member, ref embedding_decoder.py:986-1079).

Hash embedder (F=768) — no released tower weights exist in this env; the
soak validates scale behavior, not CLIP semantics (AGREEMENT_r02.md +
exp/agreement/* cover those).

Usage: python exp/soak_r03.py [--epochs N] [--workdir D] [--serve-only]
Writes a summary line per phase; keep the final checkpoint for
BENCH_WEIGHTS (bench.py trained-weights decode mode).
"""

from __future__ import annotations

import argparse
import glob
import itertools
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FT0_NOUNS = 42_919
FT0_VARIANTS = 96_526

# Pseudo-word corpus: enough unique words that the word-level target
# tokenizer compacts to a realistically-sized decoder vocab (~8k tokens),
# unlike combinatorial mod+base toys whose 90 unique words collapse the
# output matmul to nothing.
_ONSETS = "b bl br c ch cl cr d dr f fl fr g gl gr h j k l m n p pl pr qu r s sc sh sk sl sm sn sp st str sw t th tr tw v w wh z".split()
_VOWELS = "a e i o u ai ea ee oa oo ou".split()
_CODAS = "b ck d ft g k l lk lm lt m mp n nd ng nk nt p rd rk rm rn rt s sh sk sp ss st t th x z".split()


def make_words(n: int) -> list[str]:
    words, seen = [], set()
    for onset, vowel, coda in itertools.product(_ONSETS, _VOWELS, _CODAS):
        w = onset + vowel + coda
        if w not in seen:
            seen.add(w)
            words.append(w)
            if len(words) >= n:
                return words
    raise ValueError(f"syllable space exhausted at {len(words)} < {n}")


def make_vocab(num_nouns: int = FT0_NOUNS, num_variants: int = FT0_VARIANTS,
               num_words: int = 8000, seed: int = 4) -> list[dict]:
    """FT0-scale synthetic vocabulary: multi-word pseudo-nouns, singular +
    plural variants each, extra singular variants up to the released variant
    count, sparse hypernym links, frequency weights 1-3."""
    rng = np.random.default_rng(seed)
    words = make_words(num_words)
    entries, seen = [], set()
    extra_budget = num_variants - 2 * num_nouns
    while len(entries) < num_nouns:
        k = int(rng.choice([1, 2, 2, 3, 3, 4]))
        noun = " ".join(words[i] for i in rng.integers(0, num_words, size=k))
        if noun in seen:
            continue
        seen.add(noun)
        i = len(entries)
        singulars, sfreq = [noun], [int(rng.integers(1, 4))]
        if extra_budget > 0 and rng.random() < 0.25:
            singulars.append(f"{words[int(rng.integers(0, num_words))]} {noun}")
            sfreq.append(1)
            extra_budget -= 1
        hyper = [int(rng.integers(0, i))] if i > 0 and rng.random() < 0.1 else []
        entries.append({
            "id": i, "target_noun": noun, "pretty_noun": noun.title(),
            "singulars": singulars, "plurals": [noun + "s"],
            "singulars_freq": sfreq, "plurals_freq": [int(rng.integers(1, 3))],
            "hypernyms": hyper,
        })
    nv = sum(len(e["singulars"]) + len(e["plurals"]) for e in entries)
    print(f"[soak3] vocab: {len(entries)} nouns, {nv} variants "
          f"(FT0: {FT0_NOUNS}/{FT0_VARIANTS})", flush=True)
    return entries


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=float, default=3.0)
    p.add_argument("--workdir", default="/tmp/soak_r03")
    p.add_argument("--serve-only", action="store_true")
    p.add_argument("--nouns", type=int, default=FT0_NOUNS)
    p.add_argument("--variants", type=int, default=FT0_VARIANTS)
    p.add_argument("--words", type=int, default=8000)
    p.add_argument("--probe", type=int, default=512, help="held-out serving batch")
    # Default CIFAR (18 singular / 16 plural prompts): at the FT0 vocab the
    # full ImageNet1K|CIFAR collections expand to ~42M rows = 129 GB of
    # cache, past this box's disk; CIFAR lands at ~9M rows / 28 GB while
    # still exercising the FSID expansion across both prompt kinds.
    p.add_argument("--prompts", default="CIFAR")
    args = p.parse_args()
    W = args.workdir
    os.makedirs(W, exist_ok=True)

    from novic_tpu.cli.train import main as cli

    vocab_path = os.path.join(W, "vocab.json")
    if not os.path.exists(vocab_path):
        vocab = make_vocab(args.nouns, args.variants, args.words)
        with open(vocab_path, "w") as f:
            json.dump(vocab, f)
    else:
        vocab = json.load(open(vocab_path))
        if len(vocab) != args.nouns:
            sys.exit(f"[soak3] {vocab_path} has {len(vocab)} nouns but --nouns"
                     f"={args.nouns}; use a fresh --workdir for a different scale")

    common = ["embedder=test:768", f"vocab_path={vocab_path}",
              f"prompt_collection={args.prompts}", "seed=3",
              f"output_dir={W}/outputs", "batch_size_embed=8192"]

    def cache_ok(path: str) -> bool:
        # The writers commit the header magic LAST, so a partial file from an
        # interrupted build fails validation and is rebuilt.
        if not os.path.exists(path):
            return False
        try:
            from novic_tpu.data.cache import EmbeddingCache
            EmbeddingCache(path)
            return True
        except Exception:
            print(f"[soak3] {path} exists but is invalid/partial -> rebuilding",
                  flush=True)
            return False

    multiset = os.path.join(W, "multiset.bin")
    singles = os.path.join(W, "singles.bin")
    merged = os.path.join(W, "merged.bin")
    if not cache_ok(merged) and not args.serve_only:
        t0 = time.perf_counter()
        if not cache_ok(multiset):
            cli(["action=cache_noun_multiset", f"save_embedding_cache={multiset}",
                 "multi_target_freq=[1]", "hypernym_collection=None"] + common)
        if not cache_ok(singles):
            cli(["action=convert_noun_dataset", f"save_embedding_cache={singles}",
                 "hypernym_collection=Type"] + common)
        cli(["action=merge_caches", f"save_embedding_cache={merged}",
             f"embedding_datasets=[{multiset}, {singles}]", "merge_freqs=[1, 1]"]
            + common)
        for f in (multiset, singles):
            os.remove(f)  # merged carries everything; reclaim ~2/3 of the disk
        print(f"[soak3] caches built in {(time.perf_counter() - t0) / 60:.1f} min: "
              f"{os.path.getsize(merged) / 1e9:.2f} GB merged", flush=True)

    model_args = ["hidden_dim=512", "num_layers=6", "num_heads=8",
                  "mlp_seq_len=4", "feedfwd_scale=1/4",
                  "batch_size=1024", "accum_factor=8",
                  # Released noise SCHEME, magnitudes scaled to the
                  # hash-embedder regime (see soak_r02.py note)
                  "noise_scheme=GaussElemUniformAngle", "noise_vec_norm=0.5",
                  "noise_angle_min=10", "noise_angle_max=30",
                  "noise_mix_ratio=0.15"]

    ckpts = sorted(glob.glob(f"{W}/outputs/ovod_*/*.npz"))
    if args.serve_only and not ckpts:
        sys.exit(f"[soak3] --serve-only but no checkpoint under {W}/outputs")
    if not args.serve_only:
        from novic_tpu.data.cache import EmbeddingCache
        from novic_tpu.train.loop import compute_chunk_batches
        rows = EmbeddingCache(merged).header.embed_num
        chunk_scale = 2
        # A chunk is ceil(num_targets * chunk_scale / batch_size) BATCHES of
        # batch_size=1024 (ref train.py:990; accum groups 8 of them per
        # optimizer step) -- at this vocab that is ~84 batches per chunk, NOT
        # chunk_scale; deriving max_chunks from the real per-chunk sample
        # count keeps the run at the requested epoch count.
        chunk_batches = compute_chunk_batches(len(vocab), chunk_scale, 1024)
        max_chunks = max(round(args.epochs * rows / (chunk_batches * 1024)), 2)
        print(f"[soak3] {rows} rows -> {args.epochs} epochs = {max_chunks} "
              f"chunks of {chunk_batches} batches of 1024", flush=True)
        t0 = time.perf_counter()
        state, S, ewa = cli(["action=train", f"embedding_dataset={merged}",
                             f"max_chunks={max_chunks}", f"chunk_scale={chunk_scale}",
                             "init_lr=1.5e-3", "lr_warmup=50",
                             "save_every_max=200", "save_top1_min=200"]
                            + model_args + common)
        train_time = time.perf_counter() - t0
        print(f"[soak3] trained {S.chunk_id - 1} chunks in {train_time / 60:.1f} min "
              f"({S.batch_id * 1024 / train_time:,.0f} noun/s incl. host->chip feed "
              f"over the axon tunnel): "
              f"loss {ewa.loss:.4f}, top1 {ewa.top1:.2%}", flush=True)
        ckpts = sorted(glob.glob(f"{W}/outputs/ovod_*/*.npz"))
    print(f"[soak3] checkpoint: {ckpts[-1]}", flush=True)

    # ---- Serving at full vocab scale -------------------------------------
    from novic_tpu.infer import NOVICModel

    from novic_tpu.utils.misc import make_indefinite

    rng = np.random.default_rng(11)
    idx = rng.choice(len(vocab), size=min(args.probe, len(vocab)), replace=False)
    nouns = [vocab[i]["target_noun"] for i in idx]

    # greedy/beam unguided (open decoding over the ~8k-token vocab), 'all'
    # guided by construction (scores every vocab target, ref
    # embedding_decoder.py:986-1079)
    for gencfg in ("greedy_k1_vnone_gn_t1_a0", "beam_k10_vnone_gn_t1_a0",
                   "all_k10_vnone_gp_t1_a0"):
        model = NOVICModel(ckpts[-1], gencfg=gencfg, batch_size=len(nouns))
        with model:
            emb = model.embedder
            # Probe texts MUST use a template from the training prompt
            # collection: the hash embedder maps unseen templates to
            # unrelated embeddings (CIFAR prompt 1 compiles to
            # "a photo of {article noun}." — noun_dataset.py appends the '.')
            text_embeds = emb.inference_text(
                [f"a photo of {make_indefinite(n)}." for n in nouns])
            noise = rng.normal(size=text_embeds.shape).astype(np.float32)
            noise *= 1.0 / np.sqrt(text_embeds.shape[1])
            noisy = text_embeds + 0.25 * noise
            noisy /= np.linalg.norm(noisy, axis=1, keepdims=True)
            t0 = time.perf_counter()
            out = model.classify_embeds(noisy)
            dt = time.perf_counter() - t0
            t0 = time.perf_counter()
            out = model.classify_embeds(noisy)  # warm second pass
            dt_warm = time.perf_counter() - t0
        top1 = sum(p[0] == n for p, n in zip(out.preds, nouns)) / len(nouns)
        top5 = sum(n in p[:5] for p, n in zip(out.preds, nouns)) / len(nouns)
        print(f"[soak3] {gencfg}: top-1 {top1:.2%}, top-5 {top5:.2%} over "
              f"{len(vocab)} classes (chance {1 / len(vocab):.4%}); "
              f"{len(nouns)} embeds in {dt:.1f}s cold / {dt_warm:.2f}s warm "
              f"({len(nouns) / dt_warm:,.0f} embeds/s)", flush=True)


if __name__ == "__main__":
    main()
