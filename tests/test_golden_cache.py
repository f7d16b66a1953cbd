"""Golden-file regression: the committed v1 cache binary must keep reading
byte-identically across rounds (the format is the checkpoint/cache
compatibility contract with the reference, ref embedding_cache.py:24-160)."""

import hashlib
import os

import numpy as np

from novic_tpu.data.cache import CacheExpectation, EmbeddingCache, EmbeddingCacheWriter
from novic_tpu.embedders.base import Embedder

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "cache_v1.bin")
GOLDEN_SHA = "46b52b9e8220796a21f77921722de3e4f5a73b6d513fb150bbd62c7da5094ab7"
NOUNS = ["dog", "cat", "tree"]


def make_embedder():
    emb = Embedder.create("test:8")
    tc = emb.create_target_config(NOUNS, with_start_token=False, with_end_token=True,
                                  compact_ids=True, fixed_token_length=False,
                                  auto_fixed_token_length=True, use_masks=True)
    emb.configure_target(tc, NOUNS)
    return emb, tc


def golden_inputs():
    rng = np.random.default_rng(42)
    embeds = rng.normal(size=(6, 8)).astype(np.float32)
    embeds /= np.linalg.norm(embeds, axis=1, keepdims=True)
    ids = np.array([[1], [2], [3], [1], [2], [3]], np.int32)
    return embeds, ids


def test_golden_cache_unchanged_on_disk():
    data = open(GOLDEN, "rb").read()
    assert hashlib.sha256(data).hexdigest() == GOLDEN_SHA


def test_writer_reproduces_golden_bytes(tmp_path):
    """Same inputs + seed must produce byte-identical output (writer-side
    shuffle is seeded; any format or shuffle-order drift fails here)."""
    emb, tc = make_embedder()
    embeds, ids = golden_inputs()
    path = str(tmp_path / "cache.bin")
    with EmbeddingCacheWriter(path, num_embed=6, embed_dim=8,
                              target_tokenizer=emb.target_tokenizer, target_nouns=NOUNS,
                              num_embed_targets=1, shuffle=True, default_weights=True,
                              embedder_hash=emb.get_configuration_hash(True, False),
                              seed=7) as w:
        w.write(embeds, ids)
    assert open(path, "rb").read() == open(GOLDEN, "rb").read()


def test_golden_cache_reads_back():
    """The committed binary round-trips through the reader: all six embeddings
    and their noun ids recovered (order-independent: writer shuffled)."""
    emb, tc = make_embedder()
    embeds, ids = golden_inputs()
    cache = EmbeddingCache(GOLDEN, CacheExpectation(embed_dim=8, embed_dtype=np.float32,
                                                    target_config=tc))
    assert cache.header.embed_num == 6
    assert tuple(cache.target_nouns[1:]) == tuple(NOUNS)
    ds = cache.create_dataset(batch_size=6, training=False)
    ds.configure_data(ds.resolve_data_config(multi_target=False, use_weights=False))
    loader, info = ds.create_loader(batch_size=6, training=False)
    with ds.loaded():
        (got_embeds, got_targets, got_mask, _), = list(loader)
    got_embeds = np.asarray(got_embeds)
    # Match rows by nearest embedding (write order was shuffled)
    order = [int(np.argmax(got_embeds @ e)) for e in embeds]
    assert sorted(order) == list(range(6))
    np.testing.assert_allclose(got_embeds[order], embeds, atol=1e-6)
    # First token of each target row is the noun's compact content token
    tt = emb.target_tokenizer
    want_tokens, _ = tt.tokenize_target(NOUNS)
    got_targets = np.asarray(got_targets)[order]
    for i, noun_id in enumerate(ids[:, 0]):
        np.testing.assert_array_equal(got_targets[i, :want_tokens.shape[1]],
                                      want_tokens[noun_id - 1])
