"""CLI action integration: cache → test actions → train → resume → eval →
infer → format_preds, all through the public dispatcher (the reference's
train.py action surface, SURVEY.md §2.10)."""

import glob
import json
import os

import pytest

from novic_tpu.cli.train import main

VOCAB = [
    {"id": 0, "target_noun": "dog", "pretty_noun": "Dog", "singulars": ["dog"],
     "plurals": ["dogs"], "singulars_freq": [2], "plurals_freq": [1], "hypernyms": []},
    {"id": 1, "target_noun": "cat", "pretty_noun": "Cat", "singulars": ["cat"],
     "plurals": ["cats"], "singulars_freq": [2], "plurals_freq": [1], "hypernyms": []},
    {"id": 2, "target_noun": "fire truck", "pretty_noun": "Fire Truck",
     "singulars": ["fire truck"], "plurals": ["fire trucks"],
     "singulars_freq": [1], "plurals_freq": [1], "hypernyms": []},
    {"id": 3, "target_noun": "apple", "pretty_noun": "Apple", "singulars": ["apple"],
     "plurals": ["apples"], "singulars_freq": [1], "plurals_freq": [1], "hypernyms": []},
]


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    with open(d / "vocab.json", "w") as f:
        json.dump(VOCAB, f)
    return d


def common_args(workdir):
    return ["embedder=test:32", f"vocab_path={workdir}/vocab.json", "prompt_path=",
            "prompt_collection=Basic", "hypernym_collection=None", "seed=1",
            f"output_dir={workdir}/outputs"]



@pytest.fixture(scope="module")
def trained_ckpt(workdir):
    """Latest .npz checkpoint in the shared workdir; builds the cache and
    trains the tiny model on demand so every dependent test runs standalone
    (not only after test_cli_full_pipeline in module order)."""
    ckpts = sorted(glob.glob(f"{workdir}/outputs/ovod_*/*.npz"))
    if ckpts:
        return ckpts[-1]
    args = common_args(workdir)
    cache = f"{workdir}/noun_cache.bin"
    if not os.path.exists(cache):
        main(["action=convert_noun_dataset", f"save_embedding_cache={cache}"] + args)
    main(["action=train", f"embedding_dataset={cache}", "chunk_scale=4",
          "max_chunks=3", "init_lr=3e-3", "save_every_max=2", "save_top1_min=200",
          "batch_size=8", "hidden_dim=32", "num_layers=2", "num_heads=4",
          "mlp_seq_len=2", "input_dropout=0.0", "layer_dropout=0.0"] + args)
    ckpts = sorted(glob.glob(f"{workdir}/outputs/ovod_*/*.npz"))
    assert ckpts
    return ckpts[-1]


def test_cli_help():
    assert main(["--help"]) is None


def test_cli_unknown_action(workdir):
    with pytest.raises(ValueError, match="Unknown action"):
        main(["action=bogus"] + common_args(workdir))


def test_cli_test_embed_cache(workdir):
    main(["action=test_embed_cache"] + common_args(workdir))


def test_cli_full_pipeline(workdir):
    args = common_args(workdir)
    cache = f"{workdir}/noun_cache.bin"
    main(["action=convert_noun_dataset", f"save_embedding_cache={cache}"] + args)
    assert os.path.exists(cache)

    main(["action=test_data_loader", f"embedding_dataset={cache}",
          "batch_size=7", "accum_factor=3"] + args)

    model_args = ["batch_size=8", "hidden_dim=32", "num_layers=2", "num_heads=4",
                  "mlp_seq_len=2", "input_dropout=0.0", "layer_dropout=0.0"]
    state, S, ewa = main(["action=train", f"embedding_dataset={cache}", "chunk_scale=4",
                          "max_chunks=3", "init_lr=3e-3", "save_every_max=2",
                          "save_top1_min=200"] + model_args + args)
    assert S.chunk_id == 4
    ckpts = sorted(glob.glob(f"{workdir}/outputs/ovod_*/*.npz"))
    assert ckpts

    # Resume from the checkpoint continues the chunk counter
    state2, S2, _ = main(["action=train", f"embedding_dataset={cache}",
                          f"load_model={ckpts[-1]}", "chunk_scale=4", "max_chunks=5",
                          "init_lr=3e-3", "save_every_max=100", "save_top1_min=200"]
                         + model_args + args)
    assert S2.chunk_id == 6

    results = main(["action=eval", f"embedding_dataset={cache}",
                    f"load_model={ckpts[-1]}"] + model_args + args)
    (_, res), = [(k, v) for k, v in results.items()]
    assert res["loss"] > 0

    preds_path = f"{workdir}/preds.json"
    out = main(["action=infer", f"load_model={ckpts[-1]}",
                "gencfg=beam_k2_vnone_gr_t1_a0",
                "infer_texts=[a photo of a dog, a photo of a cat]",
                f"predictions_path={preds_path}"] + model_args + args)
    assert os.path.exists(preds_path)
    assert out["version"] == 1 and len(out["keys"]) == 2

    # Score against a synthetic annotation file
    ann_path = f"{workdir}/annotations.json"
    model_name = list(out["models"])[0]
    g = list(out["models"][model_name]["gencfgs"])[0]
    first_preds = out["models"][model_name]["gencfgs"][g]["pred"]
    annotations = {"a photo of a dog": {"correct_primary": [first_preds[0][0]]},
                   "a photo of a cat": {"close_primary": [first_preds[1][0]]}}
    with open(ann_path, "w") as f:
        json.dump(annotations, f)
    grid = main(["action=format_preds", f"predictions_path={preds_path}",
                 f"annotations_paths=[{ann_path}]", "format_mode=model_max_v1"] + args)
    # grid: gencfg -> model label -> (topk scores, topk counters); top-1 score
    # = 1.0 (correct_primary) + 0.5 (close_primary)
    (label_data,) = [grid[gn] for gn in grid if g == gn]
    scores, counters = next(iter(label_data.values()))
    assert abs(scores[0] - 1.5) < 1e-9
    assert counters[0]["correct_primary"] == 1 and counters[0]["close_primary"] == 1
    # other modes run without error on the same inputs
    for mode in ("model_topk_v1", "gencfg_model_v1", "nouns_v1"):
        main(["action=format_preds", f"predictions_path={preds_path}",
              f"annotations_paths=[{ann_path}]", f"format_mode={mode}"] + args)


def test_cli_infer_ann_json_update(workdir, trained_ckpt):
    """infer with infer_ann_json_update inserts un-annotated samples into the
    annotation JSON skeleton (existing entries preserved, new ones empty per
    category, file sorted), then annotate-stub -> format_preds round-trips
    (ref train.py:2522-2553, :4197-4230)."""
    args = common_args(workdir)
    model_args = ["batch_size=8", "hidden_dim=32", "num_layers=2", "num_heads=4",
                  "mlp_seq_len=2", "input_dropout=0.0", "layer_dropout=0.0"]
    ckpt = trained_ckpt
    ann_path = f"{workdir}/ann_update.json"
    existing = {"a photo of a dog": {"correct_primary": ["dog"],
                                     "close_primary": []}}
    with open(ann_path, "w") as f:
        json.dump(existing, f)

    preds_path = f"{workdir}/preds_ann.json"
    out = main(["action=infer", f"load_model={ckpt}", "gencfg=greedy_k1_vnone_gn_t1_a0",
                "infer_texts=[a photo of a dog, a photo of a cat, an apple photo]",
                f"predictions_path={preds_path}", f"infer_ann_json={ann_path}",
                "infer_ann_json_update=true"] + model_args + args)

    with open(ann_path) as f:
        ann = json.load(f)
    # Existing entry untouched, new samples inserted with empty skeletons of
    # the existing categories, keys sorted
    assert ann["a photo of a dog"] == existing["a photo of a dog"]
    assert ann["a photo of a cat"] == {"correct_primary": [], "close_primary": []}
    assert ann["an apple photo"] == {"correct_primary": [], "close_primary": []}
    assert list(ann) == sorted(ann)

    # Re-running is idempotent (no new samples => no rewrite needed)
    before = open(ann_path).read()
    main(["action=infer", f"load_model={ckpt}", "gencfg=greedy_k1_vnone_gn_t1_a0",
          "infer_texts=[a photo of a dog, a photo of a cat, an apple photo]",
          f"predictions_path={preds_path}", f"infer_ann_json={ann_path}",
          "infer_ann_json_update=true"] + model_args + args)
    assert open(ann_path).read() == before

    # Annotate-stub: fill one new sample's category, then format_preds scores it
    model_name = list(out["models"])[0]
    g = list(out["models"][model_name]["gencfgs"])[0]
    preds = out["models"][model_name]["gencfgs"][g]["pred"]
    cat_pred = preds[1][0]  # top-1 for 'a photo of a cat'
    ann["a photo of a cat"]["correct_primary"] = [cat_pred]
    with open(ann_path, "w") as f:
        json.dump(ann, f)
    grid = main(["action=format_preds", f"predictions_path={preds_path}",
                 f"annotations_paths=[{ann_path}]", "format_mode=model_max_v1"] + args)
    (label_data,) = [grid[gn] for gn in grid if g == gn]
    scores, counters = next(iter(label_data.values()))
    # dog scored via existing annotation iff predicted 'dog'; cat via the stub
    assert counters[0]["correct_primary"] >= 1


def test_cli_format_metrics(workdir, trained_ckpt):
    # trained_ckpt guarantees at least one run dir with metrics.jsonl exists
    rows = main(["action=format_metrics"] + common_args(workdir))
    assert isinstance(rows, list) and rows


@pytest.mark.slow  # full-tier (pytest --full)
def test_cli_orbax_checkpoint_train_resume_infer(workdir, trained_ckpt):
    """checkpoint_format=orbax: train saves .orbax dirs, resume loads them,
    eval accepts an .orbax path directly."""
    args = common_args(workdir)
    cache = f"{workdir}/noun_cache.bin"  # built by the trained_ckpt fixture
    model_args = ["batch_size=8", "hidden_dim=32", "num_layers=2", "num_heads=4",
                  "mlp_seq_len=2", "input_dropout=0.0", "layer_dropout=0.0"]
    out = f"{workdir}/outputs_orbax"
    args = [a for a in args if not a.startswith("output_dir=")] + [f"output_dir={out}"]
    state, S, _ = main(["action=train", f"embedding_dataset={cache}", "chunk_scale=4",
                        "max_chunks=3", "init_lr=3e-3", "save_every_max=2",
                        "save_top1_min=200", "checkpoint_format=orbax"]
                       + model_args + args)
    ckpts = sorted(glob.glob(f"{out}/ovod_*/*.orbax"))
    assert ckpts and os.path.isdir(ckpts[-1])
    assert os.path.exists(os.path.join(ckpts[-1], "novic_meta.json"))

    # Resume from the orbax dir with load_lr_state=false (fresh LR restart)
    _, S2, _ = main(["action=train", f"embedding_dataset={cache}",
                     f"load_model={ckpts[-1]}", "chunk_scale=4", "max_chunks=5",
                     "init_lr=3e-3", "load_lr_state=false", "save_every_max=100",
                     "save_top1_min=200", "checkpoint_format=orbax"]
                    + model_args + args)
    assert S2.chunk_id == 6

    results = main(["action=eval", f"embedding_dataset={cache}",
                    f"load_model={ckpts[-1]}", "eval_debug=true", "eval_guided=true",
                    "eval_batches=1"] + model_args + args)
    (_, res), = list(results.items())
    assert res["noun_top1"] >= 0.0  # ran through the orbax-loaded decoder


def test_cli_format_wandb(workdir, trained_ckpt):
    """format_wandb mines the local run-dir results database written by eval."""
    args = common_args(workdir)
    cache = f"{workdir}/noun_cache.bin"
    ckpts = [trained_ckpt]
    model_args = ["batch_size=8", "hidden_dim=32", "num_layers=2", "num_heads=4",
                  "mlp_seq_len=2", "input_dropout=0.0", "layer_dropout=0.0"]
    main(["action=eval", f"embedding_dataset={cache}", f"load_model={ckpts[-1]}"]
         + model_args + args)
    rows = main(["action=format_wandb", "fmt_type=all_v1"] + args)
    assert rows and any(r[1] == "eval" for r in rows)
    # infer_v1 filter excludes eval rows
    rows2 = main(["action=format_wandb", "fmt_type=infer_v1"] + args)
    assert not any(r[1] == "eval" for r in rows2)
    with pytest.raises(ValueError, match="format type"):
        main(["action=format_wandb", "fmt_type=bogus"] + args)


@pytest.fixture(scope="module")
def mnist_root(tmp_path_factory):
    import struct

    import numpy as np

    def write_idx(path, array):
        array = np.asarray(array, np.uint8)
        with open(path, "wb") as f:
            f.write(struct.pack(">I", 0x00000800 | array.ndim))
            for d in array.shape:
                f.write(struct.pack(">I", d))
            f.write(array.tobytes())

    d = tmp_path_factory.mktemp("mnist")
    raw = d / "MNIST" / "raw"
    raw.mkdir(parents=True)
    rng = np.random.default_rng(0)
    write_idx(raw / "t10k-images-idx3-ubyte", rng.integers(0, 256, (16, 28, 28)))
    write_idx(raw / "t10k-labels-idx1-ubyte", rng.integers(0, 10, (16,)))
    write_idx(raw / "train-images-idx3-ubyte", rng.integers(0, 256, (16, 28, 28)))
    write_idx(raw / "train-labels-idx1-ubyte", rng.integers(0, 10, (16,)))
    return str(d)


def test_cli_zero_shot_noun_prompts_and_clean(workdir, mnist_root):
    """clip_prompts=false swaps the CLIP ensembles for the noun dataset's
    compiled singular templates, and clip_clean cleans the class names
    (ref train.py:681-688, config clip_clean/clip_prompts)."""
    args = common_args(workdir)
    cls_args = ["cls_dataset=MNIST", f"cls_dataset_root={mnist_root}",
                "cls_split=valid", "batch_size_image=8"]
    res_noun = main(["action=embedder_zero_shot", "clip_prompts=false",
                     "clip_clean=true"] + cls_args + args)
    assert 0.0 <= res_noun["MNIST"] <= 1.0


def test_cli_zero_shot_and_eval_cls(workdir, mnist_root, trained_ckpt):
    """embedder_zero_shot (+measure_gap), cache_cls, eval_cls and
    eval_cls_decoding all run end-to-end on a synthetic MNIST with the hash
    embedder (SURVEY §3.3/§3.5 call stacks)."""
    args = common_args(workdir)
    cls_args = ["cls_dataset=MNIST", f"cls_dataset_root={mnist_root}",
                "cls_split=valid", "batch_size_image=8"]

    gap_path = f"{workdir}/gap.json"
    results = main(["action=embedder_zero_shot", "measure_gap=true",
                    f"gap_output_path={gap_path}"] + cls_args + args)
    assert "MNIST" in results and 0.0 <= results["MNIST"] <= 1.0
    assert os.path.exists(gap_path)
    gap = json.load(open(gap_path))
    # Reference gap-JSON schema (ref train.py:762-774)
    assert len(gap["mean_shift"]) == 32
    assert gap["angle_histc"]["bins"] == 360 and sum(gap["angle_histc"]["counts"]) == 16
    assert gap["all_angle_histc"]["bins"] == 360
    assert gap["all_angle_mean"] > 0 and gap["angle_std"] >= 0
    assert gap["cfg_embedder"]["embedder_spec"] and gap["cfg_cls"]["cls_dataset"]

    # cache_cls needs class names aligned to the noun vocab: MNIST classes are
    # "0".."9", so build a digit vocab (unmatched classes error per reference
    # ClassificationCacheWriter semantics — probed below)
    digit_vocab = [{"id": i, "target_noun": str(i), "pretty_noun": str(i),
                    "singulars": [str(i)], "plurals": [f"{i}s"],
                    "singulars_freq": [1], "plurals_freq": [1], "hypernyms": []}
                   for i in range(10)]
    with open(f"{workdir}/digit_vocab.json", "w") as f:
        json.dump(digit_vocab, f)
    digit_args = [a if not a.startswith("vocab_path=") else
                  f"vocab_path={workdir}/digit_vocab.json" for a in args]
    cls_cache = f"{workdir}/cls_cache.bin"
    main(["action=cache_cls", f"save_embedding_cache={cls_cache}"]
         + cls_args + digit_args)
    assert os.path.exists(cls_cache)
    # Probe: a vocab with no matching class names errors cleanly
    with pytest.raises(ValueError, match="non-empty sequences"):
        main(["action=cache_cls", f"save_embedding_cache={workdir}/bad.bin"]
             + cls_args + args)

    # eval_cls + eval_cls_decoding against the trained checkpoint
    ckpts = [trained_ckpt]
    model_args = ["batch_size=8", "hidden_dim=32", "num_layers=2", "num_heads=4",
                  "mlp_seq_len=2", "input_dropout=0.0", "layer_dropout=0.0"]
    res = main(["action=eval_cls", f"load_model={ckpts[-1]}"]
               + cls_args + model_args + args)
    (path, r), = list(res.items())
    assert r["total"] == 16 and sum(r["buckets"].values()) == 16

    rows = main(["action=eval_cls_decoding", f"load_model={ckpts[-1]}",
                 "gencfgs=[greedy_k1_vnone_gn_t1_a0, beam_k2_vnone_gr_t1_a0]"]
                + cls_args + model_args + args)
    assert rows  # one row per (dataset, model, gencfg)


def test_cli_cache_noun_dataset_ensures_noun_cache(workdir, tmp_path):
    """cache_noun_dataset ensures the noun dataset's OWN cache (ref
    train.py:781-793) — distinct from convert_noun_dataset, which writes an
    embedding cache."""
    cache_dir = tmp_path / "noun_cache_dir"
    main(["action=cache_noun_dataset", f"noun_cache_dir={cache_dir}"]
         + common_args(workdir))
    files = list(cache_dir.glob("noun_cache_*.bin"))
    assert files, "noun dataset cache was not generated"
    # Re-entry uses (and sanity-checks) the existing cache
    main(["action=cache_noun_dataset", f"noun_cache_dir={cache_dir}"]
         + common_args(workdir))
    assert list(cache_dir.glob("noun_cache_*.bin")) == files


def test_cli_fix_checkpoints_reference_torch(workdir, tmp_path):
    """fix_checkpoints retrofits target_nouns into legacy REFERENCE torch
    checkpoints (the action's core purpose, ref train.py:1487-1643)."""
    torch = pytest.importorskip("torch")
    out_dir = tmp_path / "outputs" / "ovod_20240101_000000"
    out_dir.mkdir(parents=True)
    legacy = {
        "cfg_flat": {"action": "train", "model": "PrefixedIterDecoder"},
        "target_config": {"vocab_size": 8},
        "data_config": {},
        "model_state_dict": {"w": torch.zeros(2, 2)},
    }
    path = str(out_dir / "ovod_chunk0001_20240101_000000.train")
    torch.save(legacy, path)

    args = common_args(workdir) + [f"output_dir={tmp_path}/outputs"]
    args = [a for a in args if not a.startswith("output_dir=")] + [f"output_dir={tmp_path}/outputs"]

    # Dry run: reports but does not write
    fixed = main(["action=fix_checkpoints", "dry_run=true"] + args)
    assert fixed == 1
    assert "target_nouns" not in torch.load(path, weights_only=True)

    fixed = main(["action=fix_checkpoints"] + args)
    assert fixed == 1
    fixed_ckpt = torch.load(path, weights_only=True)
    assert fixed_ckpt["target_nouns"][0] == ""
    assert fixed_ckpt["num_invalid_target_nouns"] == 1
    assert "dog" in fixed_ckpt["target_nouns"]
    # Second pass: nothing left to fix
    assert main(["action=fix_checkpoints"] + args) == 0


def test_cli_format_wandb_api_arm(workdir, monkeypatch):
    """format_wandb's wandb-API arm: Mongo-style filters (created-at windows,
    host + model-path regexes), scan_history mining, and output.log scraping
    of past inference predictions — against a mocked wandb module
    (ref train.py:2935-3336)."""
    import sys
    import types

    captured = {}

    class _Run:
        def __init__(self, name, action, history, log_text=""):
            self.name = name
            self.config = {"action": action, "load_model": "ovod_x/ck.npz"}
            self._history = history
            self._log = log_text

        def scan_history(self):
            return iter(self._history)

        def file(self, name):
            run = self

            class F:
                def download(self, replace=True, exist_ok=True):
                    import io

                    return io.StringIO(run._log)
            return F()

    class _Api:
        def runs(self, path, filters):
            captured["path"] = path
            captured["filters"] = filters
            return [
                _Run("run-eval", "eval",
                     [{"model": "m1", "dataset": "d", "loss": 1.5, "_step": 0}]),
                _Run("run-infer", "infer", [],
                     log_text="[beam_k2_vnone_gn_t1_a0] img.jpg --> dog\n"),
            ]

    fake_wandb = types.ModuleType("wandb")
    fake_wandb.Api = _Api
    monkeypatch.setitem(sys.modules, "wandb", fake_wandb)

    rows = main(["action=format_wandb", "fmt_type=all_v1", "use_wandb=true",
                 "wandb_entity=team", "fmt_max_ago=3d", "fmt_min_stamp=20240101",
                 "fmt_hosts=tpu-.* hostA", "fmt_models=m1"]
                + common_args(workdir))

    assert captured["path"] == "team/novic_tpu"
    ands = captured["filters"]["$and"]
    assert {"state": "finished"} in ands
    assert any("createdAt" in f and "$gt" in f["createdAt"] for f in ands)
    texts = str(ands)
    assert "tpu-.*" in texts and "hostA" in texts  # host filters
    assert "$regex" in texts and "m1" in texts     # model-path regex
    # eval history row mined + infer output.log scraped
    assert any(r[0] == "run-eval" and r[2] == "m1" for r in rows)
    scraped = [r for r in rows if r[0] == "run-infer"]
    assert scraped and scraped[0][3] == "beam_k2_vnone_gn_t1_a0 img.jpg"
    assert scraped[0][4]["pred"] == "dog"


def test_parse_duration_and_stamp():
    import datetime

    from novic_tpu.cli.actions_eval import parse_datetime_str, parse_duration_str

    now = datetime.datetime(2026, 8, 16, tzinfo=datetime.timezone.utc)
    assert parse_duration_str("", now) is None
    assert parse_duration_str("1d", now) == "2026-08-15T00:00:00+00:00"
    assert parse_duration_str("1w2d3h", now).startswith("2026-08-06T21:00")
    with pytest.raises(ValueError):
        parse_duration_str("nonsense", now)
    assert parse_datetime_str("20260101") == "2026-01-01T00:00:00+00:00"
    assert parse_datetime_str("20260101_120000") == "2026-01-01T12:00:00+00:00"


@pytest.mark.slow  # full-tier (pytest --full)
def test_cli_released_prompt_recipe_and_class_name_variants(workdir, mnist_root, tmp_path, trained_ckpt):
    """The shipped data tables drive the released recipe: cache_noun_multiset
    with prompt_collection='ImageNet1K | CIFAR' uses the released 85-singular/
    68-plural templates (ref data/prompts.json, noun_dataset.py:148-254), and
    eval_cls runs with class_names_variant=multi/guide resolving the shipped
    cls_class_names_{multi,guide}.json tables."""
    args = [a for a in common_args(workdir) if not a.startswith("prompt_path=")
            and not a.startswith("prompt_collection=")
            and not a.startswith("hypernym_collection=")]
    cache = f"{tmp_path}/multiset.bin"
    main(["action=cache_noun_multiset", f"save_embedding_cache={cache}",
          "prompt_collection=ImageNet1K | CIFAR", "hypernym_collection=None",
          "multi_target_freq=[1,1]"] + args)
    assert os.path.exists(cache)

    from novic_tpu.cli.common import load_embedder, load_noun_dataset
    from novic_tpu.utils.config import load_config

    cfg = load_config(overrides=["action=train", "embedder=test:32",
                                 f"vocab_path={workdir}/vocab.json",
                                 "prompt_collection=ImageNet1K | CIFAR"])
    ds = load_noun_dataset(cfg, load_embedder(cfg), use_cache=False)
    assert len(ds.singular_prompts) == 85 and len(ds.plural_prompts) == 68

    # eval_cls with variant=multi and variant=guide on MNIST (digit vocab)
    cls_args = ["cls_dataset=MNIST", f"cls_dataset_root={mnist_root}",
                "cls_split=valid", "batch_size_image=8"]
    ckpts = [trained_ckpt]
    model_args = ["batch_size=8", "hidden_dim=32", "num_layers=2", "num_heads=4",
                  "mlp_seq_len=2", "input_dropout=0.0", "layer_dropout=0.0"]
    for variant in ("multi", "guide"):
        res = main(["action=eval_cls", f"load_model={ckpts[-1]}",
                    f"class_names_variant={variant}"]
                   + cls_args + model_args + common_args(workdir))
        (path, r), = list(res.items())
        assert r["total"] == 16


def test_cli_resume_from_reference_train_checkpoint(workdir, tmp_path, trained_ckpt):
    """action=train resumes from a REFERENCE torch .train checkpoint: params
    load through the interop path, loop counters resume, optimizer restarts
    (ref train.py:1057-1101 resume semantics; moments are torch-AdamW)."""
    torch = pytest.importorskip("torch")
    import numpy as np

    import jax

    from novic_tpu.models.base import create_decoder
    from novic_tpu.models.config import DecoderModelConfig
    from novic_tpu.train.checkpoint import params_to_torch_state_dict
    from novic_tpu.text.simple import make_test_tokenizer
    from novic_tpu.text.target import create_target_config

    # Build a tiny decoder + reference-schema .train checkpoint
    nouns = [v["target_noun"] for v in VOCAB]
    tok = make_test_tokenizer(nouns)
    tc = create_target_config(tok, nouns, with_start_token=False,
                              with_end_token=True, compact_ids=True,
                              fixed_token_length=True,
                              auto_fixed_token_length=True, use_masks=True)
    mc = DecoderModelConfig(embed_dim=32, vocab_size=tc.vocab_size,
                            token_length=tc.token_length, hidden_dim=32,
                            num_layers=2, num_heads=4, mlp_seq_len=2,
                            input_dropout=0.0, layer_dropout=0.0)
    _, params = create_decoder(mc, rng=jax.random.PRNGKey(0))
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in params_to_torch_state_dict(
              jax.tree.map(np.asarray, params), mc).items()}
    cfg_flat = {f: getattr(mc, f) for f in mc.__dataclass_fields__}
    ckpt = {
        "cfg_flat": cfg_flat,
        "target_config": {"vocab_size": tc.vocab_size, "token_dtype": torch.int32,
                          "mask_dtype": torch.bool, "start_token_id": None,
                          "end_token_id": 0, "pad_token_id": 0, "compact_ids": True,
                          "compact_map": torch.from_numpy(tc.compact_map),
                          "compact_unmap": torch.from_numpy(tc.compact_unmap),
                          "fixed_token_length": True,
                          "token_length": tc.token_length, "use_masks": True},
        "data_config": {},
        "model_state_dict": sd,
        "target_nouns": ("",) + tuple(nouns),
        "num_invalid_target_nouns": 1,
        "train_loop_config": {},
        "train_loop_state": {"epoch_id": 2, "chunk_id": 5, "batch_id": 17,
                             "sample_id": 129, "saved_num": 1,
                             "ewa_train_top1_last": 0.5},
        "optimizer_type": "torch.optim.AdamW",
        "optimizer_state_dict": {"state": {}, "param_groups": []},
    }
    ref_path = str(tmp_path / "ovod_chunk0005_x.train")
    torch.save(ckpt, ref_path)

    args = common_args(workdir)
    cache = f"{workdir}/noun_cache.bin"  # from the pipeline test
    model_args = ["batch_size=8", "hidden_dim=32", "num_layers=2", "num_heads=4",
                  "mlp_seq_len=2", "input_dropout=0.0", "layer_dropout=0.0"]
    state, S, _ = main(["action=train", f"embedding_dataset={cache}",
                        f"load_model={ref_path}", "chunk_scale=4", "max_chunks=7",
                        "init_lr=3e-3", "save_every_max=100", "save_top1_min=200"]
                       + model_args + args)
    # Loop counters resumed from the reference checkpoint (chunk 5 -> 8)
    assert S.chunk_id == 8


def test_cli_infer_guide_sources(workdir, trained_ckpt):
    """infer_guide_targets / infer_guide_dataset restrict guided decoding
    (ref train.py:2468-2476 guide-source precedence)."""
    args = common_args(workdir)
    model_args = ["batch_size=8", "hidden_dim=32", "num_layers=2", "num_heads=4",
                  "mlp_seq_len=2", "input_dropout=0.0", "layer_dropout=0.0"]
    ckpt = trained_ckpt

    # Explicit list: every top-1 must come from it
    out = main(["action=infer", f"load_model={ckpt}", "gencfg=beam_k2_vnone_gr_t1_a0",
                "infer_texts=[a photo of a dog, a photo of a cat]",
                "infer_guide_targets=[dog, cat]",
                f"predictions_path={workdir}/preds_guide1.json"] + model_args + args)
    model_name = list(out["models"])[0]
    preds = out["models"][model_name]["gencfgs"]["beam_k2_vnone_gr_t1_a0"]["pred"]
    assert all(p[0] in ("dog", "cat") for p in preds)

    # Guiding dataset: guides come from the cache's target nouns
    cache = f"{workdir}/noun_cache.bin"
    out2 = main(["action=infer", f"load_model={ckpt}", "gencfg=beam_k2_vnone_gr_t1_a0",
                 "infer_texts=[a photo of a dog]",
                 f"infer_guide_dataset={cache}",
                 f"predictions_path={workdir}/preds_guide2.json"] + model_args + args)
    vocab_nouns = {v["target_noun"] for v in VOCAB}
    preds2 = out2["models"][model_name]["gencfgs"]["beam_k2_vnone_gr_t1_a0"]["pred"]
    assert all(p[0] in vocab_nouns for p in preds2)


def test_cli_sample_images(workdir, tmp_path):
    """sample_images: random sampling into a timestamped subdir, special-noun
    zero-shot-weighted sampling, and factor-length validation
    (ref train.py:3512-3576)."""
    import numpy as np
    import PIL.Image

    src = tmp_path / "imgs"
    src.mkdir()
    rng = np.random.default_rng(0)
    for i in range(8):
        PIL.Image.fromarray(
            rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)).save(src / f"img{i}.png")
    (src / "notes.txt").write_text("not an image")
    args = common_args(workdir)
    out_parent = tmp_path / "sampled"

    out, chosen = main(["action=sample_images", f"sample_input_dir={src}",
                        f"sample_output_dir={out_parent}", "sample_count=4"] + args)
    assert len(chosen) == 4 and len(set(chosen)) == 4
    assert sorted(os.listdir(out)) == sorted(chosen)
    assert os.path.dirname(out) == str(out_parent)

    out2, chosen2 = main(["action=sample_images", f"sample_input_dir={src}",
                          f"sample_output_dir={out_parent}", "sample_count=3",
                          "sample_special=[dog, cat]",
                          "sample_special_factor=[2.0, 1.0]",
                          "batch_size_image=4"] + args)
    assert len(chosen2) == len(set(chosen2)) == 3
    assert sorted(os.listdir(out2)) == sorted(chosen2)

    with pytest.raises(ValueError, match="same length"):
        main(["action=sample_images", f"sample_input_dir={src}",
              f"sample_output_dir={out_parent}", "sample_count=2",
              "sample_special=[dog]", "sample_special_factor=[1.0, 2.0]"] + args)


def test_cli_infer_log_debug_and_format_model_spec(workdir, trained_ckpt):
    """infer_log/infer_debug logging knobs (ref train.py:2665-2676) and
    format_model_spec labeling (ref pfmt_model_spec)."""
    import logging

    from novic_tpu.utils.logger import log as nlog

    args = common_args(workdir)
    model_args = ["batch_size=8", "hidden_dim=32", "num_layers=2", "num_heads=4",
                  "mlp_seq_len=2", "input_dropout=0.0", "layer_dropout=0.0"]
    preds_path = f"{workdir}/preds_log.json"
    records: list[str] = []
    handler = logging.Handler()
    handler.emit = lambda r: records.append(r.getMessage())
    nlog.addHandler(handler)
    try:
        main(["action=infer", f"load_model={trained_ckpt}",
              "gencfg=greedy_k1_vnone_gn_t1_a0", "infer_log=false", "infer_debug=true",
              "infer_texts=[a photo of a dog]",
              f"predictions_path={preds_path}"] + model_args + args)
    finally:
        nlog.removeHandler(handler)
    text = "\n".join(records)
    assert " --> " not in text          # infer_log=false suppresses top-1 lines
    assert "a photo of a dog:" in text  # infer_debug=true emits the top-k table

    # format_model_spec=false labels rows by the predictions-JSON basename
    ann_path = f"{workdir}/ann_log.json"
    with open(ann_path, "w") as f:
        json.dump({"a photo of a dog": {"correct_primary": ["dog"]}}, f)
    grid = main(["action=format_preds", f"predictions_path={preds_path}",
                 f"annotations_paths=[{ann_path}]", "format_mode=model_topk_v1",
                 "format_model_spec=false"] + args)
    (labels,) = [list(per_label) for per_label in grid.values()]
    assert labels == [os.path.basename(preds_path)]


def test_cli_gencfg_cost_guard(workdir, mnist_root, trained_ckpt):
    """max_gencfg_cost skips gencfgs whose estimated decode cost exceeds the
    budget (logged estimate; VERDICT r3 weak #6 guard). 0 = log only."""
    args = common_args(workdir)
    cls_args = ["cls_dataset=MNIST", f"cls_dataset_root={mnist_root}",
                "cls_split=valid", "batch_size_image=8"]
    model_args = ["batch_size=8", "hidden_dim=32", "num_layers=2", "num_heads=4",
                  "mlp_seq_len=2", "input_dropout=0.0", "layer_dropout=0.0"]
    base = ["action=eval_cls_decoding", f"load_model={trained_ckpt}",
            "gencfgs=[greedy_k1_vnone_gn_t1_a0, beam_k2_vnone_gr_t1_a0]"]
    rows = main(base + cls_args + model_args + args)
    assert len(rows) == 2
    # Tight budget: beam (more expensive than greedy) is skipped
    rows2 = main(base + ["max_gencfg_cost=0.0012"] + cls_args + model_args + args)
    kept = {r[2] for r in rows2}
    assert kept == {"greedy_k1_vnone_gn_t1_a0"}
    # Budget below everything: all skipped, action still completes
    rows3 = main(base + ["max_gencfg_cost=1e-9"] + cls_args + model_args + args)
    assert rows3 == []
