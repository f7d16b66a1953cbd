"""Round-2 label-agreement proxy vs the reference implementation.

No released backbone/decoder weights are reachable in this environment (zero
egress, no HF cache), so BASELINE.json's >=95 % top-1 agreement gate is
evidenced by the strongest available proxy (VERDICT.md round 1, item 2b): the
reference code at /root/reference (PyTorch CPU, PIL preprocessing, HF
tokenizer) and this framework share ONE set of embedder + decoder weights and
the SAME gencfg, and we measure end-to-end top-1 label agreement of
image -> CLIP embed -> guided beam decode -> noun label on the reference demo
photos (plus deterministic photographic variants for sample size).

This exercises every layer the real agreement test would: image preprocessing
(PIL vs on-device XLA), HF-vs-native BPE tokenization, ViT weight conversion
and tower forward parity, reference torch-checkpoint interop (strict
state_dict load by the REFERENCE loader), target-config round-trip, and
beam-search semantics.

Phases (in dependency order):
  assets — mini CLIP BPE trained on the noun corpus + seeded HF CLIPModel
           saved locally; both stacks load these same files
  tokens — tokenizer parity: HF AutoTokenizer vs novic_tpu clip_bpe
  embeds — text/image embedding agreement (cosine/atol, vs the reference's
           own cache tolerance bands, ref noun_dataset.py:757-849)
  train  — train a decoder on our stack from text embeddings of the shared
           embedder (so labels are confident, not argmax-on-noise)
  labels — run reference NOVICModel + our NOVICModel on the images, compare
  labels_extra — same comparison for greedy and the exhaustive 'all' scorer
  cacheio — the reference's EmbeddingCache reader consumes OUR writer's file

Usage: python exp/agreement/run_agreement.py [--phases assets,tokens,...]
Writes AGREEMENT_r02.md at the repo root when the labels phase completes.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from collections import Counter

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REF = "/root/reference"
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from fixture_store import resolve_work  # noqa: E402

WORK = resolve_work()
GENCFG = "beam_k10_vnone_gp_t1_a0"  # the reference product default (ref infer.py:55)

# ~300 common object nouns (new text, not the reference's vocab asset — that
# JSON is a missing blob in the checkout anyway). Multi-word and 'an'-article
# cases included deliberately.
NOUNS = """
dog cat horse cow sheep goat pig rabbit deer fox wolf bear lion tiger elephant
giraffe zebra monkey gorilla panda koala kangaroo camel donkey mouse rat
squirrel hedgehog otter badger raccoon skunk bat whale dolphin shark seal
walrus penguin eagle hawk owl parrot pigeon sparrow robin crow raven duck
goose swan chicken rooster turkey peacock flamingo ostrich frog toad snake
lizard turtle crocodile alligator spider ant bee wasp butterfly moth beetle
ladybug dragonfly grasshopper cricket snail slug worm crab lobster shrimp
octopus squid jellyfish starfish apple banana orange lemon lime grape cherry
strawberry blueberry raspberry watermelon melon peach pear plum apricot mango
pineapple kiwi coconut avocado tomato potato carrot onion garlic cucumber
lettuce cabbage broccoli cauliflower spinach pumpkin zucchini eggplant pepper
mushroom corn pea bean rice bread cake cookie pie donut muffin sandwich pizza
burger hotdog taco pasta noodle soup salad cheese butter egg milk yogurt
coffee tea juice wine beer bottle glass cup mug plate bowl fork knife spoon
pot pan kettle toaster oven stove refrigerator microwave blender table chair
sofa bench stool desk bed pillow blanket curtain carpet mirror lamp candle
clock watch telephone television radio computer laptop keyboard mouse pad
screen camera speaker headphone microphone printer scanner book magazine
newspaper notebook pencil pen eraser ruler scissors stapler tape glue brush
comb towel soap shampoo toothbrush toothpaste razor umbrella hat cap helmet
scarf glove mitten sock shoe boot sandal slipper shirt blouse sweater jacket
coat dress skirt trouser jean belt tie bag backpack suitcase wallet purse
ring necklace bracelet earring car truck bus van taxi motorcycle bicycle
scooter train tram subway airplane helicopter boat ship yacht canoe kayak
sailboat submarine rocket balloon kite drone wheel tire engine door window
roof wall floor ceiling stair elevator escalator bridge tunnel road street
sidewalk fence gate garden yard park bench fountain statue tower castle
church temple mosque house apartment cottage cabin barn garage shed tent
hammer screwdriver wrench pliers saw drill nail screw bolt ladder shovel
rake hoe axe broom mop bucket hose rope chain lock key bell whistle drum
guitar violin piano trumpet flute harp banjo accordion ball bat racket net
goal glove ski skate sled surfboard skateboard mountain hill valley river
lake ocean beach island desert forest tree flower grass leaf branch root
rock stone sand cloud star moon sun rainbow snowman armadillo daffodil
banknote lantern spur panda bobsled ferret aurora
""".split()


def log(msg: str) -> None:
    print(f"[agreement] {msg}", flush=True)


# ---------------------------------------------------------------------------
# Phase: assets
# ---------------------------------------------------------------------------

def train_bpe(words: list[str], num_merges: int) -> list[tuple[str, str]]:
    """Classic greedy BPE over word frequency (ties broken lexically for
    determinism). Symbols are plain chars + '</w>' word-end markers — the
    exact alphabet HF CLIPTokenizer and our clip_bpe share for ASCII."""
    vocab: Counter = Counter()
    for w in words:
        for piece in w.lower().split():
            sym = tuple(piece[:-1]) + (piece[-1] + "</w>",)
            vocab[sym] += 1
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for sym, c in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        best = max(pairs, key=lambda p: (pairs[p], (-ord(p[0][0]), p)))
        merges.append(best)
        merged = "".join(best)
        new_vocab: Counter = Counter()
        for sym, c in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i < len(sym) - 1 and (sym[i], sym[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] += c
        vocab = new_vocab
    return merges


def build_vocab_json(merges: list[tuple[str, str]]) -> dict[str, int]:
    """Token->id map in the canonical OpenAI-CLIP construction order, matching
    novic_tpu.text.clip_bpe's derivation from the merges list."""
    sys.path.insert(0, REPO)
    from novic_tpu.text.clip_bpe import bytes_to_unicode

    vocab = list(bytes_to_unicode().values())
    vocab = vocab + [v + "</w>" for v in vocab]
    for a, b in merges:
        vocab.append(a + b)
    vocab.extend(["<|startoftext|>", "<|endoftext|>"])
    return {tok: i for i, tok in enumerate(vocab)}


def phase_assets() -> None:
    os.makedirs(WORK, exist_ok=True)
    hf_dir = os.path.join(WORK, "hf_model")
    os.makedirs(hf_dir, exist_ok=True)

    # --- shared BPE ---------------------------------------------------------
    corpus = NOUNS * 3 + "a an the photo of i love my it is in scene".split() * 20
    merges = train_bpe(corpus, num_merges=600)
    merges_path = os.path.join(WORK, "merges.txt")
    with open(merges_path, "w") as f:
        f.write("#version: 0.2\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")
    vocab = build_vocab_json(merges)
    vocab_path = os.path.join(WORK, "vocab.json")
    with open(vocab_path, "w") as f:
        json.dump(vocab, f)
    log(f"BPE: {len(merges)} merges, vocab {len(vocab)}")

    # --- seeded HF CLIP model ------------------------------------------------
    import torch
    import transformers

    torch.manual_seed(20260816)
    config = transformers.CLIPConfig(
        text_config=dict(vocab_size=len(vocab), hidden_size=128,
                         intermediate_size=512, num_hidden_layers=4,
                         num_attention_heads=4, max_position_embeddings=77,
                         hidden_act="quick_gelu",
                         bos_token_id=vocab["<|startoftext|>"],
                         eos_token_id=vocab["<|endoftext|>"],
                         pad_token_id=vocab["<|endoftext|>"]),
        vision_config=dict(hidden_size=192, intermediate_size=768,
                           num_hidden_layers=4, num_attention_heads=4,
                           image_size=224, patch_size=32,
                           hidden_act="quick_gelu"),
        projection_dim=128,
    )
    model = transformers.CLIPModel(config)
    model.eval()
    model.save_pretrained(hf_dir, safe_serialization=True)
    proc = transformers.CLIPImageProcessor(
        do_resize=True, size={"shortest_edge": 224}, resample=3,  # PIL bicubic
        do_center_crop=True, crop_size={"height": 224, "width": 224},
        do_rescale=True, do_normalize=True,
        image_mean=[0.48145466, 0.4578275, 0.40821073],
        image_std=[0.26862954, 0.26130258, 0.27577711])
    proc.save_pretrained(hf_dir)
    tok = transformers.CLIPTokenizerFast(
        vocab_file=vocab_path, merges_file=merges_path, model_max_length=77)
    tok.save_pretrained(hf_dir)
    log(f"HF CLIP model saved: {hf_dir} "
        f"({sum(p.numel() for p in model.parameters())/1e6:.1f}M params)")

    # --- converted tower weights for the JAX side ----------------------------
    sys.path.insert(0, REPO)
    from novic_tpu.embedders.convert import convert_hf_model, save_params_npz

    v, t = convert_hf_model(model, "clip")
    npz = os.path.join(WORK, "towers.npz")
    save_params_npz(npz, v, t)
    log(f"converted tower weights: {npz}")

    # --- evaluation images: 16 demo photos + deterministic variants ----------
    import PIL.Image

    img_dir = os.path.join(WORK, "images")
    os.makedirs(img_dir, exist_ok=True)
    demo = sorted(os.path.join(REF, "demo", f) for f in os.listdir(os.path.join(REF, "demo"))
                  if f.endswith(".jpg"))
    paths = []
    for p in demo:
        im = PIL.Image.open(p).convert("RGB")
        base = os.path.splitext(os.path.basename(p))[0]
        w, h = im.size
        variants = {
            "orig": im,
            "flip": im.transpose(PIL.Image.FLIP_LEFT_RIGHT),
            "crop80": im.crop((int(w * 0.1), int(h * 0.1), int(w * 0.9), int(h * 0.9))),
            "crop60": im.crop((int(w * 0.2), int(h * 0.2), int(w * 0.8), int(h * 0.8))),
            "cropTL": im.crop((0, 0, int(w * 0.75), int(h * 0.75))),
            "cropBR": im.crop((int(w * 0.25), int(h * 0.25), w, h)),
        }
        for name, v_im in variants.items():
            out = os.path.join(img_dir, f"{base}_{name}.png")
            v_im.save(out)
            paths.append(out)
    with open(os.path.join(WORK, "images.json"), "w") as f:
        json.dump(paths, f)
    log(f"evaluation images: {len(paths)} ({len(demo)} demo photos x 6 variants)")

    # --- texts for token/embed parity ----------------------------------------
    texts = ([f"a photo of a {n}" for n in NOUNS[:150]]
             + [f"i love my {n}" for n in NOUNS[150:250]]
             + list(dict.fromkeys(NOUNS)))
    with open(os.path.join(WORK, "texts.json"), "w") as f:
        json.dump(texts, f)

    # --- noun-dataset vocab JSON for training --------------------------------
    uniq = list(dict.fromkeys(NOUNS))
    vocab_entries = []
    for i, n in enumerate(uniq):
        vocab_entries.append({
            "id": i, "target_noun": n, "pretty_noun": n.capitalize(),
            "singulars": [n], "plurals": [n + "s"],
            "singulars_freq": [2], "plurals_freq": [1], "hypernyms": []})
    with open(os.path.join(WORK, "noun_vocab.json"), "w") as f:
        json.dump(vocab_entries, f)
    log(f"noun vocab: {len(vocab_entries)} entries")


# ---------------------------------------------------------------------------
# Phase: tokens
# ---------------------------------------------------------------------------

def _make_shims() -> str:
    """Stub modules the reference imports but this image lacks.

    `unidecode` (ref utils.py:19, identity on pure-ASCII nouns), and — for
    importing the reference's train.py itself (the eval differential) —
    minimal `wandb` / `hydra` / `omegaconf` / `timm.optim` stubs covering
    exactly what executes on the CPU eval path (the decorators/config APIs
    main() would use are bypassed by calling the helpers directly)."""
    shim_dir = os.path.join(WORK, "shims")
    os.makedirs(shim_dir, exist_ok=True)
    with open(os.path.join(shim_dir, "unidecode.py"), "w") as f:
        f.write("def unidecode(s):\n    return s.encode('ascii', 'ignore').decode()\n")
    with open(os.path.join(shim_dir, "wandb.py"), "w") as f:
        f.write("def log(*a, **k):\n    raise RuntimeError('wandb stub')\n")
    os.makedirs(os.path.join(shim_dir, "hydra", "core"), exist_ok=True)
    with open(os.path.join(shim_dir, "hydra", "__init__.py"), "w") as f:
        f.write("def main(*a, **k):\n"
                "    def deco(fn):\n        return fn\n    return deco\n")
    with open(os.path.join(shim_dir, "hydra", "core", "__init__.py"), "w") as f:
        f.write("")
    with open(os.path.join(shim_dir, "hydra", "core", "hydra_config.py"), "w") as f:
        f.write("class HydraConfig:\n"
                "    @staticmethod\n"
                "    def get():\n        raise RuntimeError('hydra stub')\n")
    with open(os.path.join(shim_dir, "omegaconf.py"), "w") as f:
        f.write(
            "class DictConfig(dict):\n"
            "    __getattr__ = dict.__getitem__\n"
            "class OmegaConf:\n"
            "    @staticmethod\n"
            "    def to_yaml(cfg):\n        return str(cfg)\n"
            "    @staticmethod\n"
            "    def to_container(cfg, resolve=False):\n        return dict(cfg)\n"
            "    @staticmethod\n"
            "    def update(cfg, key, value, merge=False):\n"
            "        parts = key.split('.')\n"
            "        for p in parts[:-1]:\n            cfg = cfg[p]\n"
            "        cfg[parts[-1]] = value\n")
    os.makedirs(os.path.join(shim_dir, "timm"), exist_ok=True)
    with open(os.path.join(shim_dir, "timm", "__init__.py"), "w") as f:
        f.write("from . import optim  # noqa: F401\n")
    with open(os.path.join(shim_dir, "timm", "optim.py"), "w") as f:
        f.write("AdamP = None  # only touched when optimizer=AdamP\n")
    os.makedirs(os.path.join(shim_dir, "torchvision"), exist_ok=True)
    with open(os.path.join(shim_dir, "torchvision", "__init__.py"), "w") as f:
        f.write("from . import datasets  # noqa: F401\n")
    with open(os.path.join(shim_dir, "torchvision", "datasets.py"), "w") as f:
        # classification_dataset.py only isinstance-checks / getattrs these;
        # the eval path never constructs an image dataset
        f.write("class ImageFolder:\n    pass\n\nclass Food101:\n    pass\n")
    return shim_dir


def run_ref(cmd: list[str]) -> None:
    env = dict(os.environ)
    env["PYTHONPATH"] = REF + os.pathsep + _make_shims()
    env.pop("JAX_PLATFORMS", None)
    driver = os.path.join(REPO, "exp", "agreement", "ref_driver.py")
    proc = subprocess.run([sys.executable, driver] + cmd, env=env, cwd=REF,
                          capture_output=True, text=True, timeout=3600)
    sys.stdout.write(proc.stdout)
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr)
        raise RuntimeError(f"ref_driver failed rc={proc.returncode}")


def phase_tokens() -> dict:
    """HF-reference tokenizer parity via the embedder's OWN tokenizer (so the
    family the arch declares — CLIP BPE, SentencePiece, WordPiece — is the
    one compared; the asset arrives through bpe_merges_path regardless)."""
    texts_json = os.path.join(WORK, "texts.json")
    out = os.path.join(WORK, "ref_tokens.json")
    run_ref(["tokens", "--hf-dir", os.path.join(WORK, "hf_model"),
             "--texts-json", texts_json, "--out", out])

    tok = _our_embedder(load_model=False).tokenizer
    with open(texts_json) as f:
        texts = json.load(f)
    with open(out) as f:
        ref = json.load(f)
    mismatches = []
    for text, ref_ids in zip(texts, ref["token_ids"]):
        row = [int(x) for x in np.asarray(tok.tokenize(text))[0]]
        # non-padded length: up to and including first end token
        end = row.index(tok.end_token_id) if tok.end_token_id in row else len(row) - 1
        row = row[:end + 1]
        if row != ref_ids:
            mismatches.append((text, row, ref_ids))
    result = {"total": len(texts), "mismatches": len(mismatches),
              "tokenizer_class": ref["tokenizer_class"]}
    log(f"token parity: {result['total'] - result['mismatches']}/{result['total']} "
        f"identical vs {ref['tokenizer_class']}")
    for m in mismatches[:5]:
        log(f"  MISMATCH {m}")
    with open(os.path.join(WORK, "result_tokens.json"), "w") as f:
        json.dump(result, f)
    return result


# ---------------------------------------------------------------------------
# Phase: embeds
# ---------------------------------------------------------------------------

def _our_embedder(load_model: bool = True):
    sys.path.insert(0, REPO)
    from novic_tpu.embedders.base import Embedder

    return Embedder.create(
        "transformers:" + os.path.join(WORK, "hf_model"),
        weights_path=os.path.join(WORK, "towers.npz"),
        bpe_merges_path=os.path.join(WORK, "merges.txt"),
        compute_dtype="float32", load_model=load_model)


def phase_embeds() -> dict:
    texts_json = os.path.join(WORK, "texts.json")
    images_json = os.path.join(WORK, "images.json")
    out = os.path.join(WORK, "ref_embeds.npz")
    run_ref(["embed", "--hf-dir", os.path.join(WORK, "hf_model"),
             "--texts-json", texts_json, "--images-json", images_json,
             "--out", out])
    ref = np.load(out)

    emb = _our_embedder()
    with open(texts_json) as f:
        texts = json.load(f)
    ours_text = emb.inference_text(texts)

    import PIL.Image

    from novic_tpu.embedders.preprocess import preprocess_pil_host

    with open(images_json) as f:
        paths = json.load(f)
    images = [PIL.Image.open(p).convert("RGB") for p in paths]
    # Production path: host PIL decode+resize, device normalize etc is fused in
    # preprocess; use the embedder's own transform (PIL-exact host path).
    pixel = emb.get_image_transform()(images)
    ours_image = emb.inference_image(pixel)

    # Production serving path: on-device XLA preprocessing (resize/crop/
    # normalize as jitted ops) on the raw decoded pixels — the path a real
    # camera feed takes (VERDICT r1 weak 6: device-vs-PIL on real photos).
    import jax

    from novic_tpu.embedders.preprocess import preprocess_uint8_device

    pcfg = emb.arch.preprocess
    # Original demo photos only (one jit per distinct raw resolution)
    orig = [i for i, p in enumerate(paths) if p.endswith("_orig.png")]
    fn = jax.jit(lambda x: preprocess_uint8_device(x, pcfg))
    dev_chunks = [np.asarray(fn(np.asarray(images[i], dtype=np.uint8)[None]))
                  for i in orig]
    ours_image_dev = emb.inference_image(np.concatenate(dev_chunks, axis=0))
    ref_image_orig = ref["image"][orig]

    def stats(a, b):
        cos = np.sum(a * b, axis=1)
        return {"max_abs": float(np.abs(a - b).max()),
                "min_cos": float(cos.min()),
                "mean_cos": float(cos.mean())}

    result = {"text": stats(ours_text, ref["text"]),
              "image": stats(ours_image, ref["image"]),
              "image_device_preprocess": stats(ours_image_dev, ref_image_orig)}
    # Reference tolerance bands (ref noun_dataset.py:758-765): strict f32
    # band atol=6*eps(f32)~7.2e-7 (same-backend re-embed), AMP band
    # atol=eps(fp16)=9.77e-4 (how the reference actually runs on GPU).
    result["bands"] = {"strict_f32_atol": 6 * float(np.finfo(np.float32).eps),
                      "amp_fp16_atol": float(np.finfo(np.float16).eps)}
    log(f"text embeds: {result['text']}")
    log(f"image embeds: {result['image']}")
    with open(os.path.join(WORK, "result_embeds.json"), "w") as f:
        json.dump(result, f, indent=1)
    return result


# ---------------------------------------------------------------------------
# Phase: train
# ---------------------------------------------------------------------------

def phase_train() -> str:
    """Train the decoder on our stack from the shared embedder's text
    embeddings, then export a reference-schema .model checkpoint."""
    sys.path.insert(0, REPO)
    from novic_tpu.cli.train import main as cli

    hf_dir = os.path.join(WORK, "hf_model")
    common = [
        f"embedder=transformers:{hf_dir}",
        f"embedder_weights={os.path.join(WORK, 'towers.npz')}",
        f"bpe_merges_path={os.path.join(WORK, 'merges.txt')}",
        "embedder_compute_dtype=float32",
        f"vocab_path={os.path.join(WORK, 'noun_vocab.json')}",
        "prompt_path=", "prompt_collection=Basic", "hypernym_collection=None",
        "seed=7", f"output_dir={os.path.join(WORK, 'outputs')}",
    ]
    cache = os.path.join(WORK, "noun_cache.bin")
    if not os.path.exists(cache):
        cli(["action=convert_noun_dataset", f"save_embedding_cache={cache}"] + common)
    model_args = ["batch_size=256", "hidden_dim=256", "num_layers=4", "num_heads=8",
                  "mlp_seq_len=4", "input_dropout=0.0", "layer_dropout=0.0",
                  "noise_scheme=GaussElem", "noise_vec_norm=1.0"]
    state, S, ewa = cli(["action=train", f"embedding_dataset={cache}",
                         "chunk_scale=8", "max_chunks=30", "init_lr=2e-3",
                         "save_every_max=1000", "save_top1_min=200"]
                        + model_args + common)
    log(f"trained: chunk {S.chunk_id}, EWA {ewa}")
    import glob

    ckpts = sorted(glob.glob(os.path.join(WORK, "outputs", "ovod_*", "*.npz")))
    assert ckpts, "no checkpoint written"
    return ckpts[-1]


def export_reference_model(our_ckpt: str) -> str:
    """Write a reference-consumable .model with the reference's cfg_flat keys."""
    sys.path.insert(0, REPO)
    from novic_tpu.train.checkpoint import load_checkpoint, save_reference_checkpoint

    ck = load_checkpoint(our_ckpt)
    mc = ck["model_config"]
    hf_dir = os.path.join(WORK, "hf_model")
    cfg_flat = {
        # embedder + AMP surface consumed by ref NOVICModel (ref infer.py:96-120)
        "embedder_spec": f"transformers:{hf_dir}",
        "embedder_amp": False, "embedder_amp_bf16": False,
        "embedder_compile": False, "embedder_optimum": False,
        "amp": False, "amp_bf16": False,
        # model construction keys (ref infer.py:713-778 load_decoder_model)
        "model": mc.model, "vocab_quant": mc.vocab_quant,
        "num_end_loss": mc.num_end_loss, "label_smoothing": mc.label_smoothing,
        "hidden_dim": mc.hidden_dim, "feedfwd_scale": mc.feedfwd_scale,
        "mlp_hidden_layer": mc.mlp_hidden_layer, "mlp_hidden_bias": mc.mlp_hidden_bias,
        "mlp_hidden_norm": mc.mlp_hidden_norm,
        "mlp_hidden_activation": mc.mlp_hidden_activation,
        "input_dropout": mc.input_dropout, "num_layers": mc.num_layers,
        "num_heads": mc.num_heads, "layer_dropout": mc.layer_dropout,
        "layer_activation": mc.layer_activation, "layer_norm_first": mc.layer_norm_first,
        "layer_bias": mc.layer_bias, "logits_bias": mc.logits_bias,
        "init_bias_zero": mc.init_bias_zero, "init_mlp_mode": mc.init_mlp_mode,
        "init_mlp_unit_norm": mc.init_mlp_unit_norm,
        "init_tfrm_mode": mc.init_tfrm_mode,
        "init_tfrm_unit_norm": mc.init_tfrm_unit_norm,
        "init_tfrm_unit_postnorm": mc.init_tfrm_unit_postnorm,
        "init_tfrm_proj_layers": mc.init_tfrm_proj_layers,
        "init_zero_norm": mc.init_zero_norm, "init_rezero_mode": mc.init_rezero_mode,
        "mlp_seq_len": mc.mlp_seq_len, "weight_tying": mc.weight_tying,
        "strictly_causal": mc.strictly_causal, "enable_nested": False,
        # extra keys our NOVICModel peeks
        "embedder": f"transformers:{hf_dir}",
    }
    # The reference's TransformersEmbedder produces int64 tokens (ref
    # embedders.py:833 token_dtype=torch.int64), and its beam search
    # preallocates topk index buffers with target_config.token_dtype — declare
    # the dtype the reference backend would have used.
    import dataclasses

    tc = dataclasses.replace(ck["target_config"], token_dtype="int64")
    path = os.path.join(WORK, "agreement.model")
    save_reference_checkpoint(
        path, params=ck["params"], model_config=mc,
        target_config=tc, target_nouns=ck["target_nouns"],
        num_invalid_target_nouns=ck["num_invalid_target_nouns"],
        cfg_flat=cfg_flat)
    log(f"exported reference .model: {path}")
    return path


# ---------------------------------------------------------------------------
# Phase: labels
# ---------------------------------------------------------------------------

def phase_labels(model_path: str, gencfg: str = GENCFG,
                 result_name: str = "result_labels.json",
                 embedder_spec: Optional[str] = None) -> dict:
    images_json = os.path.join(WORK, "images.json")
    tag = gencfg.replace("/", "_")
    ref_out = os.path.join(WORK, f"ref_labels_{tag}.json")
    ref_cmd = ["labels", "--checkpoint", model_path, "--images-json", images_json,
               "--gencfg", gencfg, "--out", ref_out]
    if embedder_spec:
        # Released decoder checkpoints record openclip:* specs; both sides
        # run the same HF-format weights through their transformers backends
        ref_cmd += ["--embedder-spec", embedder_spec]
    run_ref(ref_cmd)

    sys.path.insert(0, REPO)
    from novic_tpu.infer import NOVICModel

    import PIL.Image

    with open(images_json) as f:
        paths = json.load(f)
    model = NOVICModel(model_path, gencfg=gencfg, batch_size=16,
                       embedder_spec=embedder_spec,
                       embedder_kwargs=dict(
                           weights_path=os.path.join(WORK, "towers.npz"),
                           bpe_merges_path=os.path.join(WORK, "merges.txt"),
                           compute_dtype="float32"))
    images = [PIL.Image.open(p).convert("RGB") for p in paths]
    with model:
        ours = model.classify_images(images)

    with open(ref_out) as f:
        ref = json.load(f)
    n = len(paths)
    top1 = sum(o[0] == r[0] for o, r in zip(ours.preds, ref["preds"]))
    top3_any = sum(bool(set(o[:3]) & set(r[:3]))
                   for o, r in zip(ours.preds, ref["preds"]))
    diffs = [{"image": os.path.basename(p), "ours": o[:3], "ref": r[:3]}
             for p, o, r in zip(paths, ours.preds, ref["preds"]) if o[0] != r[0]]
    result = {"gencfg": gencfg, "images": n, "top1_agree": top1,
              "top1_pct": 100.0 * top1 / n, "top3_overlap": top3_any,
              "diffs": diffs,
              "ours_preds": ours.preds, "ref_preds": ref["preds"]}
    log(f"LABEL AGREEMENT [{gencfg}]: top-1 {top1}/{n} = {result['top1_pct']:.2f}% "
        f"(gate: >=95%)")
    with open(os.path.join(WORK, result_name), "w") as f:
        json.dump(result, f, indent=1)
    return result


def phase_cacheio() -> dict:
    """Cross-implementation cache interop: OUR EmbeddingCacheWriter writes a
    cache with targets; the REFERENCE's EmbeddingCache reader (torch, ref
    embedding_cache.py) opens it and must see identical rows. Proves the v1
    format compatibility live, beyond the golden byte test."""
    sys.path.insert(0, REPO)
    import numpy as _np

    from novic_tpu.data.cache import EmbeddingCacheWriter
    from novic_tpu.text.clip_bpe import CLIPBPETokenizer
    from novic_tpu.text.target import TargetTokenizer, create_target_config

    nouns = sorted(dict.fromkeys(NOUNS))[:60]
    tok = CLIPBPETokenizer(os.path.join(WORK, "merges.txt"), context_length=77)
    tc = create_target_config(tok, nouns, with_start_token=False,
                              with_end_token=True, compact_ids=True,
                              fixed_token_length=False,
                              auto_fixed_token_length=True, use_masks=True)
    # The reference's transformers backend produces int64 tokens (ref
    # embedders.py:833) and its reader requires dtype match with its embedder
    import dataclasses as _dc

    tc = _dc.replace(tc, token_dtype="int64",
                     compact_map=tc.compact_map.astype(np.int64),
                     compact_unmap=tc.compact_unmap.astype(np.int64))
    tt = TargetTokenizer(tok, tc)
    rng = np.random.default_rng(7)
    N, F = 200, 128
    embeds = rng.normal(size=(N, F)).astype(np.float32)
    embeds /= np.linalg.norm(embeds, axis=1, keepdims=True)
    noun_ids = rng.integers(1, len(nouns) + 1, size=(N, 2)).astype(np.int32)
    noun_ids[rng.random(N) < 0.4, 1] = 0  # some single-target rows

    cache_path = os.path.join(WORK, "interop_cache.bin")
    with EmbeddingCacheWriter(cache_path, num_embed=N, embed_dim=F,
                              target_tokenizer=tt, target_nouns=nouns,
                              num_embed_targets=2, shuffle=True,
                              full_targets=False, default_weights=True,
                              unit_weights=True, embedder_strict=False,
                              seed=5) as w:
        for i in range(0, N, 32):
            w.write(embeds[i:i + 32], noun_ids[i:i + 32])

    nouns_json = os.path.join(WORK, "interop_nouns.json")
    with open(nouns_json, "w") as f:
        json.dump(nouns, f)
    ref_out = os.path.join(WORK, "ref_readcache.json")
    run_ref(["readcache", "--hf-dir", os.path.join(WORK, "hf_model"),
             "--cache", cache_path, "--nouns-json", nouns_json,
             "--out", ref_out])

    with open(ref_out) as f:
        ref = json.load(f)
    # The writer shuffles rows on disk; compare as multisets of
    # (noun-set, embed-head) and verify embed<->noun pairing row by row
    expect = {}
    for i in range(N):
        key = tuple(np.round(embeds[i][:4], 5))
        expect[key] = sorted(nouns[j - 1] for j in noun_ids[i] if j > 0)
    ok = 0
    for row in ref["rows"]:
        key = tuple(np.round(np.asarray(row["embed_head"], np.float32), 5))
        ok += sorted(row["nouns"]) == expect.get(key)
    result = {"rows": N, "pairing_ok": ok}
    log(f"cache interop: reference reader sees correct embed<->target pairing "
        f"on {ok}/{N} shuffled rows")
    assert ok == N, "reference reader disagreed with our writer"

    # Reverse direction: the REFERENCE's PhotoCacheWriter writes; OUR reader
    # consumes and each row's embedding must equal OUR embedding of
    # 'a photo of a {noun}' for that row's stored target noun.
    ref_cache = os.path.join(WORK, "interop_ref_cache.bin")
    run_ref(["writecache", "--hf-dir", os.path.join(WORK, "hf_model"),
             "--cache", ref_cache, "--nouns-json", nouns_json])
    from novic_tpu.data.cache import CacheExpectation, EmbeddingCache

    emb = _our_embedder()
    with EmbeddingCache(ref_cache,
                        CacheExpectation(embed_dim=emb.embed_dim,
                                         embed_dtype=np.float32),
                        strict_embedder=False) as rc:
        e2, tids2, _, _, _ = rc.get_samples(0, rc.header.embed_num)
        row_nouns = [rc.target_nouns[int(t)] for t in tids2[:, 0]]
    ours2 = emb.inference_text([f"a photo of a {n}" for n in row_nouns])
    max_abs = float(np.abs(ours2 - e2).max())
    log(f"cache interop (reverse): our reader on the reference writer's file — "
        f"{len(row_nouns)} rows, re-embedded max abs diff {max_abs:.2e}")
    assert max_abs < 5e-6, "reverse interop embedding mismatch"
    result["reverse_rows"] = len(row_nouns)
    result["reverse_max_abs"] = max_abs
    with open(os.path.join(WORK, "result_cacheio.json"), "w") as f:
        json.dump(result, f)
    return result


def write_report() -> None:
    def load(name):
        p = os.path.join(WORK, name)
        return json.load(open(p)) if os.path.exists(p) else None

    tokens, embeds, labels = (load("result_tokens.json"),
                              load("result_embeds.json"),
                              load("result_labels.json"))
    lines = [
        "# AGREEMENT_r02 — measured label agreement vs the reference implementation",
        "",
        f"Date: {time.strftime('%Y-%m-%d %H:%M')}  ",
        "Setup: zero-egress environment — released weights unreachable, so this is the",
        "strongest available proxy (VERDICT r1 item 2b): the REFERENCE code at",
        "`/root/reference` (PyTorch CPU, PIL preprocessing, HF AutoTokenizer) and this",
        "framework share one set of seeded CLIP tower weights + one trained decoder",
        "checkpoint (written by us, strict-loaded by the reference's own",
        "`infer.NOVICModel`), and both classify the same photos end-to-end with",
        f"gencfg `{GENCFG}` (the reference product default).",
        "",
        "Every layer of the real agreement test is exercised: PIL-vs-XLA image",
        "preprocessing, HF-vs-native BPE tokenization, HF->JAX ViT weight conversion,",
        "torch-checkpoint interop, target-config round-trip, guided beam search.",
        "",
    ]
    if tokens:
        lines += [
            "## Tokenizer parity (HF AutoTokenizer vs novic_tpu clip_bpe)",
            "",
            f"- {tokens['total'] - tokens['mismatches']}/{tokens['total']} token"
            f" sequences identical vs `{tokens['tokenizer_class']}`",
            "",
        ]
    if embeds:
        t, im = embeds["text"], embeds["image"]
        lines += [
            "## Embedding agreement (torch CPU reference vs JAX towers, f32)",
            "",
            "| Modality | max abs diff | min cosine | mean cosine |",
            "|---|---|---|---|",
            f"| text ({tokens['total'] if tokens else '?'} strings) | {t['max_abs']:.2e} | {t['min_cos']:.8f} | {t['mean_cos']:.8f} |",
            f"| image (PIL-host preprocess) | {im['max_abs']:.2e} | {im['min_cos']:.8f} | {im['mean_cos']:.8f} |",
        ] + ([
            f"| image (on-device XLA preprocess — production path) | {embeds['image_device_preprocess']['max_abs']:.2e} | {embeds['image_device_preprocess']['min_cos']:.8f} | {embeds['image_device_preprocess']['mean_cos']:.8f} |",
        ] if "image_device_preprocess" in embeds else []) + [
            "",
            f"Reference tolerance bands (ref noun_dataset.py:758-765): strict f32 "
            f"atol={embeds['bands']['strict_f32_atol']:.1e} (same-backend re-embed), "
            f"fp16-AMP atol={embeds['bands']['amp_fp16_atol']:.1e} (how the reference "
            "actually runs on GPU).",
            "",
        ]
    if labels:
        lines += [
            "## End-to-end label agreement",
            "",
            f"- Images: {labels['images']} (16 reference demo photos x 6 deterministic"
            " photographic variants)",
            f"- **Top-1 agreement (beam k10, product default): {labels['top1_agree']}/{labels['images']} = "
            f"{labels['top1_pct']:.2f}%** (gate: >=95%)",
            f"- Top-3 overlap (any shared prediction): {labels['top3_overlap']}/{labels['images']}",
        ]
        for name, title in (("result_labels_greedy.json", "greedy k1"),
                            ("result_labels_all.json", "exhaustive 'all' scorer")):
            extra = load(name)
            if extra:
                lines += [f"- Top-1 agreement ({title}, gencfg `{extra['gencfg']}`): "
                          f"{extra['top1_agree']}/{extra['images']} = {extra['top1_pct']:.2f}%"]
        lines += [""]
        if labels["diffs"]:
            lines += ["Disagreements:", ""]
            for d in labels["diffs"][:20]:
                lines.append(f"- `{d['image']}`: ours {d['ours']} vs ref {d['ref']}")
            lines.append("")
    cacheio = load("result_cacheio.json")
    if cacheio:
        lines += [
            "## Cache-format interop (reference reader on our writer's file)",
            "",
            f"- The REFERENCE's own `EmbeddingCache` reader (torch) opened a cache"
            f" written by this framework's `EmbeddingCacheWriter` (writer-side"
            f" global shuffle, 2-target rows, int64 transformers-backend dtype)"
            f" and saw correct embed<->target pairing on"
            f" **{cacheio['pairing_ok']}/{cacheio['rows']}** rows.",
        ] + ([
            f"- Reverse direction: the reference's `PhotoCacheWriter` wrote a cache"
            f" and OUR reader consumed it — every row's embedding matches our"
            f" re-embedding of its stored target noun"
            f" (max abs {cacheio['reverse_max_abs']:.1e} over"
            f" {cacheio['reverse_rows']} rows).",
        ] if "reverse_max_abs" in cacheio else []) + [
            "",
        ]
    lines += [
        "## Reproduce",
        "",
        "```",
        "python exp/agreement/run_agreement.py",
        "```",
        "",
        "Work dir: set `AGREEMENT_WORK` (default /tmp/agreement). The reference side",
        "runs via `exp/agreement/ref_driver.py` with PYTHONPATH=/root/reference.",
    ]
    out = os.path.join(REPO, "AGREEMENT_r02.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    log(f"wrote {out}")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--phases", default="assets,tokens,embeds,train,labels,labels_extra,report")
    p.add_argument("--model", help="existing .model checkpoint for labels phase")
    args = p.parse_args()
    phases = args.phases.split(",")
    model_path = args.model
    if "assets" in phases:
        phase_assets()
    if "tokens" in phases:
        phase_tokens()
    if "embeds" in phases:
        phase_embeds()
    if "train" in phases:
        ckpt = phase_train()
        model_path = export_reference_model(ckpt)
    if "labels" in phases:
        if model_path is None:
            model_path = os.path.join(WORK, "agreement.model")
        phase_labels(model_path)
    if "labels_extra" in phases:
        # Decode-method coverage beyond the product default: greedy and the
        # exhaustive generate_all scorer (gencfg method=all), each vs the
        # reference's own implementations
        if model_path is None:
            model_path = os.path.join(WORK, "agreement.model")
        phase_labels(model_path, gencfg="greedy_k1_vnone_gp_t1_a0",
                     result_name="result_labels_greedy.json")
        phase_labels(model_path, gencfg="all_k5_vnone_gp_t1_a0",
                     result_name="result_labels_all.json")
    if "cacheio" in phases:
        phase_cacheio()
    if "report" in phases:
        write_report()
    # Mirror the freshly built prerequisites into the repo-local durable
    # store so the differential suite survives a /tmp wipe (fixture_store)
    from fixture_store import snapshot

    if snapshot(WORK):
        print(f"[fixtures] mirrored into {os.path.join(REPO, '.agreement_fixtures')}")


if __name__ == "__main__":
    main()
