"""End-to-end novic_tpu quickstart — runs anywhere (CPU ok), no assets needed.

Builds the full NOVIC pipeline on a toy vocabulary:
  1. create an embedder + target config,
  2. write a binary embedding cache of noisy text embeddings,
  3. train a small object decoder on it,
  4. save a checkpoint and classify embeddings with the NOVICModel API.

With real assets you would instead use `embedder=openclip:timm/ViT-B-16-SigLIP`
(+ converted weights via action=convert_embedder), build caches with
action=cache_noun_multiset / cache_captions / merge_caches, and train with
`python -m novic_tpu.cli.train action=train ...` (see README.md).

Run:  python examples/quickstart.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    # Some accelerator plugins append themselves to jax_platforms regardless
    # of the env var; honor the caller's explicit CPU pin (CI runs this on
    # the host while the accelerator is busy benchmarking)
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

from novic_tpu.data.cache import CacheExpectation, EmbeddingCache, EmbeddingCacheWriter
from novic_tpu.embedders.base import Embedder
from novic_tpu.infer import NOVICModel
from novic_tpu.models.base import create_decoder
from novic_tpu.models.config import DecoderModelConfig
from novic_tpu.train.checkpoint import save_checkpoint
from novic_tpu.train.loop import TrainLoopConfig, train

NOUNS = ["dog", "cat", "fire truck", "sea lion", "tree", "car", "hot dog", "apple"]


def build_demo_checkpoint(workdir):
    """Steps 1-4 of the quickstart: embedder + cache + train + checkpoint.

    Returns (checkpoint_path, clean per-noun embeddings). Reused by the other
    examples (decoding_methods.py) so each stays a single runnable story."""
    # 1. Embedder + target config. 'test:<dim>' is the deterministic hash
    #    embedder (real specs: openai:*, openclip:*, transformers:*).
    embedder = Embedder.create("test:64")
    tc = embedder.create_target_config(NOUNS, with_start_token=False, with_end_token=True,
                                       compact_ids=True, fixed_token_length=False,
                                       auto_fixed_token_length=True, use_masks=True)
    embedder.configure_target(tc, NOUNS)

    # 2. Binary embedding cache: per-noun text embeddings + unit-sphere jitter
    rng = np.random.default_rng(0)
    N = 1024
    noun_idx = rng.integers(0, len(NOUNS), size=N)
    base = embedder.inference_text(NOUNS)
    embeds = base[noun_idx] + 0.02 * rng.normal(size=(N, 64)).astype(np.float32)
    embeds /= np.linalg.norm(embeds, axis=1, keepdims=True)
    cache_path = os.path.join(workdir, "cache.bin")
    with EmbeddingCacheWriter(cache_path, num_embed=N, embed_dim=64,
                              target_tokenizer=embedder.target_tokenizer,
                              target_nouns=NOUNS, num_embed_targets=1,
                              default_weights=True,
                              embedder_hash=embedder.get_configuration_hash(True, False),
                              seed=1) as w:
        w.write(embeds, (noun_idx + 1).astype(np.int32).reshape(N, 1))

    # 3. Train a small decoder (the released config scales this to 12M params)
    cfg = DecoderModelConfig(embed_dim=64, vocab_size=tc.vocab_size,
                             token_length=tc.token_length, hidden_dim=64,
                             feedfwd_scale="1/4", num_layers=2, num_heads=4,
                             mlp_seq_len=2, input_dropout=0.0, layer_dropout=0.0)
    import jax as _jax

    model, params = create_decoder(cfg, rng=_jax.random.PRNGKey(5))
    cache = EmbeddingCache(cache_path, CacheExpectation(embed_dim=64,
                                                        embed_dtype=np.float32,
                                                        target_config=tc))
    ds = cache.create_dataset(batch_size=128, training=True)
    ds.configure_data(ds.resolve_data_config(multi_target=False, use_weights=False))
    loader, info = ds.create_loader(batch_size=128, training=True, seed=3)
    C = TrainLoopConfig(chunk_batches=4, chunk_samples=512,
                        epoch_batches=info.epoch_batches, max_chunks=10,
                        batch_size=128, init_lr=3e-3, save_every_max=1000)
    with ds.loaded():
        state, S, ewa = train(model=model, params=params, dataset=ds, loader=loader,
                              loader_info=info, C=C)
    print(f"Trained: top-1 {ewa.top1:.1%}")

    # 4. Checkpoint + the packaged inference API
    ckpt = os.path.join(workdir, "decoder.npz")
    save_checkpoint(ckpt, params=_jax.tree.map(np.asarray, state.params),
                    cfg_flat={"embedder": "test:64", "action": "train"},
                    model_config=cfg, target_config=tc, data_config={},
                    target_nouns=("",) + tuple(NOUNS), num_invalid_target_nouns=1)
    return ckpt, base


def main():
    workdir = tempfile.mkdtemp(prefix="novic_quickstart_")
    print(f"Workdir: {workdir}")
    ckpt, base = build_demo_checkpoint(workdir)
    with NOVICModel(ckpt, gencfg="beam_k3_vnone_gn_t1_a0", batch_size=8) as novic:
        out = novic.classify_embeds(base)  # clean per-noun embeddings
    for noun, preds in zip(NOUNS, out.preds):
        print(f"  {noun:12s} --> {preds[0]}")


if __name__ == "__main__":
    main()
