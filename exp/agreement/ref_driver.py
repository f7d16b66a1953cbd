"""Reference-side driver for the round-2 agreement proxy.

Runs with PYTHONPATH=/root/reference (cwd there too) so `embedders`, `infer`
etc. resolve to the REFERENCE modules. All inputs (HF model dir, BPE assets,
decoder checkpoint) are produced by run_agreement.py and shared byte-for-byte
with the novic_tpu side; this script only *executes the reference code* on
them (tokenize / embed / classify on CPU) and dumps the results for
comparison. No reference code is copied anywhere — it is imported.

Commands:
  tokens  --hf-dir D --texts-json F --out F.json
  embed   --hf-dir D [--texts-json F] [--images-json F] --out F.npz
  labels  --checkpoint C --images-json F --gencfg G --out F.json
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def _load_texts(path: str) -> list[str]:
    with open(path) as f:
        return json.load(f)


def cmd_tokens(args) -> None:
    import transformers

    tok = transformers.AutoTokenizer.from_pretrained(args.hf_dir)
    texts = _load_texts(args.texts_json)
    out = [tok.encode(t) for t in texts]
    with open(args.out, "w") as f:
        json.dump({"tokenizer_class": type(tok).__qualname__, "token_ids": out}, f)
    print(f"ref tokens: {len(out)} sequences via {type(tok).__qualname__}")


def _create_embedder(hf_dir: str):
    import embedders  # reference module

    return embedders.Embedder.create(
        spec=f"transformers:{hf_dir}", amp=False, device="cpu",
        load_model=True, check=False)


def cmd_embed(args) -> None:
    import torch

    emb = _create_embedder(args.hf_dir)
    result: dict[str, np.ndarray] = {}
    with emb.inference_mode():
        if args.texts_json:
            texts = _load_texts(args.texts_json)
            chunks = []
            for i in range(0, len(texts), emb.inference_batch_size):
                chunks.append(emb.inference_text(
                    text=texts[i:i + emb.inference_batch_size]).cpu().numpy())
            result["text"] = np.concatenate(chunks, axis=0)
            print(f"ref text embeds: {result['text'].shape}")
        if args.images_json:
            import PIL.Image

            paths = _load_texts(args.images_json)
            transform = emb.get_image_transform()
            pixel = torch.stack([transform(PIL.Image.open(p).convert("RGB"))
                                 for p in paths])
            chunks = []
            for i in range(0, len(paths), emb.image_batch_size):
                chunks.append(emb.inference_image(
                    images=pixel[i:i + emb.image_batch_size]).cpu().numpy())
            result["image"] = np.concatenate(chunks, axis=0)
            print(f"ref image embeds: {result['image'].shape}")
    np.savez(args.out, **result)


def cmd_labels(args) -> None:
    import PIL.Image
    import infer  # reference module

    override = ({"embedder_spec": args.embedder_spec, "embedder": args.embedder_spec}
                if getattr(args, "embedder_spec", None) else None)
    model = infer.NOVICModel(checkpoint=args.checkpoint, gencfg=args.gencfg,
                             device="cpu", batch_size=args.batch_size,
                             cfg_flat_override=override)
    paths = _load_texts(args.images_json)
    images = [PIL.Image.open(p).convert("RGB") for p in paths]
    with model:
        output = model.classify_images(images=images)
    result = {
        "paths": paths,
        "preds": output.preds,
        "logprobs": [[float(x) for x in row] for row in output.logprobs],
        "types": [[getattr(t, "name", str(t)) for t in row] for row in output.types],
        "gencfg": model.gencfg.name,
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"ref labels: {len(result['preds'])} images, gencfg {model.gencfg.name}")


def cmd_labels_embeds(args) -> None:
    """Classify precomputed embeddings with the reference NOVICModel (skips
    its embedder image path — isolates decoder/beam semantics)."""
    import torch
    import infer  # reference module

    model = infer.NOVICModel(checkpoint=args.checkpoint, gencfg=args.gencfg,
                             device="cpu", batch_size=args.batch_size)
    embeds = np.load(args.embeds_npz)["image"].astype(np.float32)
    with model:
        output = model.classify_embeds(embeds=torch.from_numpy(embeds))
    result = {
        "preds": output.preds,
        "logprobs": [[float(x) for x in row] for row in output.logprobs],
        "gencfg": model.gencfg.name,
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"ref labels_embeds: {len(result['preds'])} rows, gencfg {model.gencfg.name}")


def cmd_noise(args) -> None:
    """Apply the REFERENCE's embedding_noise schemes to a shared unit base
    embedding N times and dump distribution statistics (angle/norm moments +
    quantiles) for the novic_tpu differential. RNG realizations differ by
    construction (torch vs jax PRNG); the distributions must match."""
    import torch
    import embedding_noise  # reference module

    with open(args.spec_json) as f:
        specs = json.load(f)
    base = np.load(args.base_npz)["base"].astype(np.float32)  # (F,)
    N = args.num
    torch.manual_seed(123)
    out = {}
    for name, kw in specs.items():
        noise = embedding_noise.EmbeddingNoise.create(
            embed_dim=base.shape[0], **kw)
        embed = torch.from_numpy(np.tile(base, (N, 1))).clone()
        with torch.no_grad():
            noisy = noise(embed=embed)
        noisy = noisy.numpy()
        cos = np.clip(noisy @ base, -1.0, 1.0)
        angles = np.degrees(np.arccos(cos))
        norms = np.linalg.norm(noisy, axis=1)
        qs = [1, 5, 25, 50, 75, 95, 99]
        out[name] = {
            "angle_mean": float(angles.mean()), "angle_std": float(angles.std()),
            "angle_q": [float(x) for x in np.percentile(angles, qs)],
            "norm_mean": float(norms.mean()), "norm_std": float(norms.std()),
        }
        print(f"ref noise {name}: angle {out[name]['angle_mean']:.3f}"
              f"+-{out[name]['angle_std']:.3f} deg")
    with open(args.out, "w") as f:
        json.dump(out, f)


def cmd_score(args) -> None:
    """Run the REFERENCE's PredictionScorer (ref train.py:234-336) on shared
    predictions + annotations for the format_preds differential."""
    import train as ref_train  # reference module (hydra/wandb/timm shimmed)

    with open(args.preds_json) as f:
        predictions = json.load(f)  # {sample: [preds...]}
    with open(args.ann_json) as f:
        raw_ann = json.load(f)
    class_annotations = {s: {c: set(v) for c, v in ann.items()}
                         for s, ann in raw_ann.items()}
    categories = {c: None for ann in raw_ann.values() for c in ann}
    scorer = ref_train.PredictionScorer(class_annotations, categories)
    top1_score, top1_counter = scorer.categorise(
        {s: p[0] for s, p in predictions.items()})
    topk_scores, topk_counters = scorer.categorise_topk(predictions, args.topk)
    out = {
        "top1_score": float(top1_score),
        "top1_counter": {str(k): v for k, v in top1_counter.items()},
        "topk_scores": [float(x) for x in topk_scores],
        "topk_counters": [{str(k): v for k, v in c.items()}
                          for c in topk_counters],
        "missing_samples": sorted(scorer.missing_samples),
        "multiple_categories": sorted([s, p, list(m)] for s, p, m
                                      in scorer.multiple_categories),
    }
    with open(args.out, "w") as f:
        json.dump(out, f)
    print(f"ref score: top1 {top1_score:.2f}, topk {out['topk_scores']}")


def cmd_noundata(args) -> None:
    """Enumerate the REFERENCE's NounDataset (index math + procedural sample
    generation, ref noun_dataset.py) for the novic_tpu differential."""
    import noun_dataset  # reference module
    import embedders  # reference module

    emb = embedders.Embedder.create(
        spec=f"transformers:{args.hf_dir}", amp=False, device="cpu",
        load_model=False, check=False)
    ds = noun_dataset.NounDataset(
        embedder=emb, vocab_path=args.vocab_json, prompt_path=args.prompts_json,
        prompt_collection=args.prompt_collection,
        hypernym_collection=args.hypernym_collection,
        vocab_thres=args.vocab_thres, cache_dir=None, check_consistent=True)
    samples = [(s.fsid, s.usid, s.freq, s.text, s.target)
               for s in ds.unique_sample()]
    rng = np.random.default_rng(3)
    probe_fsids = sorted(int(i) for i in rng.integers(0, ds.num_fsids, size=200))
    probes = []
    for fsid in probe_fsids:
        usid, text, target = ds.get_sample_usid_text(fsid)
        probes.append((fsid, int(usid), text, target))
    with open(args.out, "w") as f:
        json.dump({"num_fsids": int(ds.num_fsids), "num_usids": int(ds.num_usids),
                   "samples": samples, "probes": probes,
                   "targets": list(ds.targets),
                   "num_invalid_targets": int(ds.num_invalid_targets)}, f)
    print(f"ref noundata: {ds.num_usids} USIDs / {ds.num_fsids} FSIDs, "
          f"{len(ds.targets)} targets")


class _AttrDict(dict):
    """Attribute-access dict standing in for omegaconf.DictConfig (the
    reference's eval path only reads cfg.<key>)."""

    def __getattr__(self, key):
        try:
            return self[key]
        except KeyError as e:
            raise AttributeError(key) from e


def _load_ref_cfg(overrides: dict) -> "_AttrDict":
    """The reference's own config/train.yaml defaults (minus hydra headers),
    with CPU/eval overrides applied."""
    import yaml

    with open("/root/reference/config/train.yaml") as f:
        cfg = yaml.safe_load(f)
    cfg.pop("defaults", None)
    cfg.pop("hydra", None)
    cfg.update(overrides)
    return _AttrDict(cfg)


def cmd_eval(args) -> None:
    """Run the REFERENCE's own eval_top1_single (ref train.py:1725-1868) on a
    shared cache + decoder checkpoint and dump its exact metrics — the
    cross-implementation differential for novic_tpu's action=eval."""
    import train as ref_train  # reference module (hydra/wandb/timm shimmed)
    import infer as ref_infer

    overrides = {
        "device": "cpu", "embedder_spec": f"transformers:{args.hf_dir}",
        "embedder_amp": False, "embedder_amp_bf16": False,
        "embedder_compile": False, "embedder_optimum": False,
        "amp": False, "amp_bf16": False, "determ": False,
        "dataset_workers": 0, "batch_size": args.batch_size,
        "strict_embedder": False, "eval_guided": bool(args.eval_guided),
        "eval_debug": False, "eval_train": False,
        "multi_target": bool(args.multi_target),
        "use_weights": bool(args.use_weights),
        "multi_first": False, "fixed_multi_length": False,
        "multi_length": None, "unit_weights": None,
    }
    cfg = _load_ref_cfg(overrides)

    device, device_is_cpu, _ = ref_train.load_device(cfg=cfg)
    dataset_embedder = ref_train.load_embedder(cfg=cfg, device=device)
    model_embedder = ref_train.load_embedder(cfg=cfg, device=device)
    amp_context, _ = ref_train.load_decoder_amp(cfg=cfg, device=device)

    # On CUDA the reference's .to(device) transfer implicitly makes batch
    # tensors contiguous; on CPU the per-batch multi-length trim's slice view
    # reaches the decoder's .view() and crashes (latent reference CPU bug).
    # Mirror the CUDA behavior by contiguizing batches.
    orig_loader_fn = ref_train.load_embedding_dataset_loader

    def patched_loader_fn(**kw):
        loader, info = orig_loader_fn(**kw)

        class ContigLoader:
            def __iter__(self):
                for batch in loader:
                    yield tuple(b.contiguous() if hasattr(b, "contiguous") else b
                                for b in batch)

            def __len__(self):
                return len(loader)

        return ContigLoader(), info

    ref_train.load_embedding_dataset_loader = patched_loader_fn

    dataset = ref_train.load_embedding_dataset(
        cfg=cfg, embedder=dataset_embedder, embed_dataset=args.cache,
        use_targets=True, training=False, strict_embedder=False)
    ref_train.gen_target_config(cfg=cfg, embedder=dataset_embedder,
                                targets=dataset.targets,
                                num_invalid_targets=dataset.num_invalid_targets)
    ref_train.gen_data_config(cfg=cfg, dataset=dataset)

    (eval_loss, eval_top1_noun, eval_top1, eval_top1_seq, eval_tokens_total,
     num_valid_targets, num_samples, num_batches, elapsed) = \
        ref_train.eval_top1_single(
            cfg=cfg, dataset=dataset, model_path=args.checkpoint,
            device=device, device_is_cpu=device_is_cpu,
            amp_context=amp_context, dataset_embedder=dataset_embedder,
            model_embedder=model_embedder)
    del ref_infer
    result = {
        "loss": float(eval_loss), "noun_top1": float(eval_top1_noun),
        "token_top1": float(eval_top1), "pos_top1": [float(x) for x in eval_top1_seq],
        "tokens": int(eval_tokens_total), "num_valid_targets": int(num_valid_targets),
        "num_samples": int(num_samples), "num_batches": int(num_batches),
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"ref eval: loss {eval_loss:.6e}, token top1 {eval_top1:.4%}, "
          f"noun top1 {eval_top1_noun:.4%} over {num_samples} samples")


def cmd_gencfgs(args) -> None:
    """Run the REFERENCE's load_generation_configs (ref train.py:3775-3832) on
    a list of config cases and dump the resulting canonical gencfg names, for
    the grid/dedup/fallback differential."""
    import train as ref_train  # reference module (hydra/wandb/timm shimmed)

    with open(args.cases_json) as f:
        cases = json.load(f)
    out = []
    for case in cases:
        cfg = _load_ref_cfg(case.get("cfg", {}))
        kwargs = case.get("kwargs", {})
        try:
            gencfgs = ref_train.load_generation_configs(cfg=cfg, **kwargs)
            out.append({"names": [g.name for g in gencfgs]})
        except ValueError as e:
            out.append({"error": str(e)})
    with open(args.out, "w") as f:
        json.dump(out, f)
    print(f"ref gencfgs: {len(out)} cases")


def cmd_writerstreams(args) -> None:
    """Run the REFERENCE's NounMultisetCacheWriter + CaptionsCacheWriter on a
    shared vocab/prompts/captions fixture, with the embedder's inference_text
    stubbed to RECORD the (text, targets) stream instead of embedding it.
    Both stacks seed Mersenne identically and make the same sample() calls,
    so the recorded streams must match ORDERED, element for element."""
    import contextlib
    import random

    import torch
    import embedders  # reference module
    import embedding_cache_writers  # reference module
    import noun_dataset  # reference module

    emb = embedders.Embedder.create(
        spec=f"transformers:{args.hf_dir}", amp=False, device="cpu",
        load_model=False, check=False)
    ds = noun_dataset.NounDataset(
        embedder=emb, vocab_path=args.vocab_json, prompt_path=args.prompts_json,
        prompt_collection=args.prompt_collection, hypernym_collection="None",
        cache_dir=None, check_consistent=True)
    tc = emb.create_target_config(
        ds.targets, with_start_token=False, with_end_token=True,
        compact_ids=True, fixed_token_length=False,
        auto_fixed_token_length=True, use_masks=True)
    emb.configure_target(target_config=tc, target_vocab=ds.targets)

    # Record the text stream; return arbitrary unit embeddings (stream
    # comparison does not depend on embedding values).
    texts_log: list[str] = []
    gen = torch.Generator().manual_seed(7)

    def fake_inference_text(text):
        texts_log.extend(text)
        e = torch.randn((len(text), emb.embed_dim), generator=gen)
        return torch.nn.functional.normalize(e, dim=-1)

    emb.inference_text = fake_inference_text
    emb.inference_model = contextlib.nullcontext

    def record_targets(writer):
        log_t: list = []
        orig = writer.tensorize_embed_targets

        def wrapped(embed_targets_str):
            log_t.extend(t if isinstance(t, str) else list(t)
                         for t in embed_targets_str)
            return orig(embed_targets_str)

        writer.tensorize_embed_targets = wrapped
        return log_t

    out: dict = {}

    random.seed(args.seed)
    cap = embedding_cache_writers.CaptionsCacheWriter(
        cache_path=args.cache_dir + "/ref_captions.bin",
        captions_path=args.captions_json, dataset=ds,
        template_multiplier=args.template_multiplier,
        sample_multiplier=args.sample_multiplier, print_approx=0)
    texts_log.clear()
    cap_targets = record_targets(cap)
    cap.generate()
    out["captions"] = {
        "stream": list(zip(texts_log, cap_targets)),
        "num_embed": int(cap.num_embed),
        "unique_captions": int(cap.unique_captions),
        "full_targets": bool(cap.header.full_targets),
    }

    random.seed(args.seed)
    ms = embedding_cache_writers.NounMultisetCacheWriter(
        cache_path=args.cache_dir + "/ref_multiset.bin", dataset=ds,
        multi_target_freq=json.loads(args.multi_freq))
    texts_log.clear()
    ms_targets = record_targets(ms)
    ms.generate()
    out["multiset"] = {
        "stream": list(zip(texts_log, ms_targets)),
        "num_embed": int(ms.num_embed),
        "multi_target_freq": list(ms.multi_target_freq),
        "full_targets": bool(ms.header.full_targets),
        "embed_targets_dim": int(ms.header.embed_targets_dim),
    }

    with open(args.out, "w") as f:
        json.dump(out, f)
    print(f"ref writerstreams: captions {len(out['captions']['stream'])} rows, "
          f"multiset {len(out['multiset']['stream'])} rows")


def cmd_readcache(args) -> None:
    """Open a cache file WRITTEN BY novic_tpu with the reference's own
    EmbeddingCache reader (byte-level format interop beyond the golden file)."""
    import embedding_cache  # reference module

    emb = _create_embedder(args.hf_dir)
    with open(args.nouns_json) as f:
        nouns = json.load(f)
    tc = emb.create_target_config(
        tuple(nouns), with_start_token=False, with_end_token=True,
        compact_ids=True, fixed_token_length=False,
        auto_fixed_token_length=True, use_masks=True)
    emb.configure_target(target_config=tc, target_vocab=tuple(nouns))
    cache = embedding_cache.EmbeddingCache(args.cache, emb, use_targets=True,
                                           strict_embedder=False)
    with cache:
        n = cache.header.embed_num
        embed, target_ids, target, mask, weight = cache.get_samples(0, n)
        rows = []
        for i in range(n):
            row_nouns = [cache.target_nouns[int(t)] for t in target_ids[i]
                         if int(t) != 0]
            rows.append({
                "nouns": row_nouns,
                "embed_head": [float(x) for x in embed[i][:4]],
                "tokens": [[int(x) for x in target[i, j]]
                           for j in range(target.shape[1])],
            })
    with open(args.out, "w") as f:
        json.dump({"num": int(n), "target_nouns": list(cache.target_nouns),
                   "rows": rows}, f)
    print(f"ref readcache: {n} rows via reference EmbeddingCache")


def cmd_writecache(args) -> None:
    """Write a cache with the reference's own PhotoCacheWriter ('a photo of a
    {noun}' per target noun) for the novic_tpu reader to consume."""
    import embedding_cache_writers  # reference module

    emb = _create_embedder(args.hf_dir)
    with open(args.nouns_json) as f:
        nouns = json.load(f)
    tc = emb.create_target_config(
        tuple(nouns), with_start_token=False, with_end_token=True,
        compact_ids=True, fixed_token_length=False,
        auto_fixed_token_length=True, use_masks=True)
    emb.configure_target(target_config=tc, target_vocab=tuple(nouns))
    embedding_cache_writers.PhotoCacheWriter(
        cache_path=args.cache, embedder=emb, target_nouns=tuple(nouns)).generate()
    print(f"ref writecache: wrote {len(nouns)} rows via reference PhotoCacheWriter")


def main() -> None:
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    t = sub.add_parser("tokens")
    t.add_argument("--hf-dir", required=True)
    t.add_argument("--texts-json", required=True)
    t.add_argument("--out", required=True)
    e = sub.add_parser("embed")
    e.add_argument("--hf-dir", required=True)
    e.add_argument("--texts-json")
    e.add_argument("--images-json")
    e.add_argument("--out", required=True)
    l = sub.add_parser("labels")
    l.add_argument("--checkpoint", required=True)
    l.add_argument("--images-json", required=True)
    l.add_argument("--gencfg", default="beam_k10_vnone_gp_t1_a0")
    l.add_argument("--batch-size", type=int, default=16)
    l.add_argument("--embedder-spec", default=None)
    l.add_argument("--out", required=True)
    le = sub.add_parser("labels_embeds")
    le.add_argument("--checkpoint", required=True)
    le.add_argument("--embeds-npz", required=True)
    le.add_argument("--gencfg", default="beam_k10_vnone_gp_t1_a0")
    le.add_argument("--batch-size", type=int, default=16)
    le.add_argument("--out", required=True)
    sc = sub.add_parser("score")
    sc.add_argument("--preds-json", required=True)
    sc.add_argument("--ann-json", required=True)
    sc.add_argument("--topk", type=int, default=3)
    sc.add_argument("--out", required=True)
    nz = sub.add_parser("noise")
    nz.add_argument("--spec-json", required=True)
    nz.add_argument("--base-npz", required=True)
    nz.add_argument("--num", type=int, default=200000)
    nz.add_argument("--out", required=True)
    nd = sub.add_parser("noundata")
    nd.add_argument("--hf-dir", required=True)
    nd.add_argument("--vocab-json", required=True)
    nd.add_argument("--prompts-json", required=True)
    nd.add_argument("--prompt-collection", default="ImageNet1K | CIFAR")
    nd.add_argument("--hypernym-collection", default="None")
    nd.add_argument("--vocab-thres", type=int, default=0)
    nd.add_argument("--out", required=True)
    ev = sub.add_parser("eval")
    ev.add_argument("--hf-dir", required=True)
    ev.add_argument("--cache", required=True)
    ev.add_argument("--checkpoint", required=True)
    ev.add_argument("--batch-size", type=int, default=64)
    ev.add_argument("--eval-guided", action="store_true")
    ev.add_argument("--multi-target", action="store_true")
    ev.add_argument("--use-weights", action="store_true")
    ev.add_argument("--out", required=True)
    wc = sub.add_parser("writecache")
    wc.add_argument("--hf-dir", required=True)
    wc.add_argument("--cache", required=True)
    wc.add_argument("--nouns-json", required=True)
    gc = sub.add_parser("gencfgs")
    gc.add_argument("--cases-json", required=True)
    gc.add_argument("--out", required=True)
    ws = sub.add_parser("writerstreams")
    ws.add_argument("--hf-dir", required=True)
    ws.add_argument("--vocab-json", required=True)
    ws.add_argument("--prompts-json", required=True)
    ws.add_argument("--captions-json", required=True)
    ws.add_argument("--prompt-collection", default="ImageNet1K | CIFAR")
    ws.add_argument("--multi-freq", default="[2, 1, 1]")
    ws.add_argument("--template-multiplier", type=int, default=2)
    ws.add_argument("--sample-multiplier", type=int, default=3)
    ws.add_argument("--seed", type=int, default=1234)
    ws.add_argument("--cache-dir", required=True)
    ws.add_argument("--out", required=True)
    rc = sub.add_parser("readcache")
    rc.add_argument("--hf-dir", required=True)
    rc.add_argument("--cache", required=True)
    rc.add_argument("--nouns-json", required=True)
    rc.add_argument("--out", required=True)
    args = p.parse_args()
    {"tokens": cmd_tokens, "embed": cmd_embed, "labels": cmd_labels,
     "labels_embeds": cmd_labels_embeds, "eval": cmd_eval,
     "noundata": cmd_noundata, "noise": cmd_noise, "score": cmd_score,
     "readcache": cmd_readcache, "writecache": cmd_writecache,
     "writerstreams": cmd_writerstreams, "gencfgs": cmd_gencfgs}[args.cmd](args)


if __name__ == "__main__":
    main()
