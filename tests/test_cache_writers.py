"""Cache writer round-trips, mirroring the reference's action=test_embed_cache
(ref train.py:493-667): fake writers write to tmp, the real Dataset/loader
reads back, content compared exactly (sort-invariant under shuffle)."""

import json

import numpy as np
import pytest

from novic_tpu.data.cache import CacheExpectation, EmbeddingCache
from novic_tpu.data.cache_writers import (
    CaptionsCacheWriter,
    IndexCacheWriter,
    MergeCachesWriter,
    NounDatasetCacheWriter,
    NounMultisetCacheWriter,
    PhotoCacheWriter,
    RandomCacheWriter,
    TestMultiCacheWriter,
)
from novic_tpu.data.noun_dataset import NounDataset
from novic_tpu.embedders.base import Embedder

VOCAB = [
    {"id": 0, "target_noun": "animal", "pretty_noun": "Animal",
     "singulars": ["animal"], "plurals": ["animals"],
     "singulars_freq": [2], "plurals_freq": [1], "hypernyms": []},
    {"id": 1, "target_noun": "dog", "pretty_noun": "Dog",
     "singulars": ["dog", "hound"], "plurals": ["dogs"],
     "singulars_freq": [2, 1], "plurals_freq": [1], "hypernyms": []},
    {"id": 2, "target_noun": "apple", "pretty_noun": "Apple",
     "singulars": ["apple"], "plurals": ["apples"],
     "singulars_freq": [1], "plurals_freq": [1], "hypernyms": []},
]
NOUNS = [v["target_noun"] for v in VOCAB]
PROMPTS = {
    "prompts": {"Basic": [[2, "a photo of {article_singular}"], [1, "many {plural}"]]},
    "hypernyms": {"None": [[1, None]]},
}


@pytest.fixture(scope="module")
def embedder():
    emb = Embedder.create("test:24")
    tc = emb.create_target_config(NOUNS, with_start_token=False, with_end_token=True,
                                  compact_ids=True, fixed_token_length=True,
                                  auto_fixed_token_length=True, use_masks=True)
    emb.configure_target(tc, NOUNS)
    return emb


def expectation(emb):
    return CacheExpectation(embed_dim=emb.embed_dim, embed_dtype=np.float32,
                            target_config=emb.target_config,
                            embedder_hash=emb.get_configuration_hash(True, False))


def make_noun_dataset(emb, **kw):
    ds = NounDataset(emb, vocab_json=VOCAB, prompt_json=PROMPTS,
                     prompt_collection="Basic", hypernym_collection="None", **kw)
    ds.configure_target()
    return ds


def test_random_writer_roundtrip(embedder, tmp_path):
    path = str(tmp_path / "rand.bin")
    RandomCacheWriter(path, embedder, num_embed=50, seed=0).generate()
    cache = EmbeddingCache(path, strict_embedder=False)
    with cache:
        e, *_ = cache.get_samples(0, 50)
        assert e.shape == (50, 24)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(e), axis=1), 1.0, rtol=1e-5)


def test_photo_writer_roundtrip(embedder, tmp_path):
    path = str(tmp_path / "photo.bin")
    writer = PhotoCacheWriter(path, embedder, NOUNS, debug=True, seed=0)
    all_embeds, token_ids, mask = writer.generate()
    cache = EmbeddingCache(path, expectation(embedder))
    with cache:
        e, tids, tgt, msk, w = cache.get_samples(0, len(NOUNS))
        # Shuffled: sort both sides by target id to compare
        order = np.argsort(np.asarray(tids)[:, 0])
        np.testing.assert_allclose(np.asarray(e)[order], all_embeds, rtol=1e-5)
        # Targets 1..R-1 all present exactly once
        assert sorted(np.asarray(tids)[:, 0].tolist()) == list(range(1, len(NOUNS) + 1))
        # The stored per-noun tokenizations match the writer's debug copy
        np.testing.assert_array_equal(cache.target_token_ids[1:], token_ids)
        # Embeddings equal direct re-embedding of the photo prompts
        redo = embedder.inference_text([f"a photo of a {n}" for n in NOUNS])
        np.testing.assert_allclose(np.asarray(e)[order], redo, atol=1e-5)


def test_index_writer_is_unshuffled(embedder, tmp_path):
    path = str(tmp_path / "index.bin")
    IndexCacheWriter(path, embedder, NOUNS, seed=0).generate()
    cache = EmbeddingCache(path, expectation(embedder))
    with cache:
        _, tids, *_ = cache.get_samples(0, len(NOUNS))
        np.testing.assert_array_equal(np.asarray(tids)[:, 0], np.arange(1, len(NOUNS) + 1))


def test_multi_writer_invariants(embedder, tmp_path):
    path = str(tmp_path / "multi.bin")
    TestMultiCacheWriter(path, embedder, num_embed=64, target_nouns=NOUNS,
                         num_embed_targets=3, seed=0).generate()
    cache = EmbeddingCache(path, expectation(embedder))
    with cache:
        e, tids, tgt, msk, w = cache.get_samples(0, 64)
        tids, w = np.asarray(tids), np.asarray(w)
        # First target always valid with nonzero weight
        assert (tids[:, 0] > 0).all() and (w[:, 0] > 0).all()
        # Non-zeros precede zeros; weights descending
        nz = tids.astype(bool)
        np.testing.assert_array_equal(np.minimum.accumulate(nz, axis=1), nz)
        assert (np.diff(w, axis=1) <= 1e-6).all()


def test_noun_dataset_writer_fsid_expansion(embedder, tmp_path):
    ds = make_noun_dataset(embedder)
    path = str(tmp_path / "noun.bin")
    NounDatasetCacheWriter(path, ds, seed=0).generate()
    cache = EmbeddingCache(path, expectation(embedder))
    with cache:
        assert cache.header.embed_num == ds.num_fsids
        e, tids, *_ = cache.get_samples(0, ds.num_fsids)
        # Per-target counts match frequency expansion
        counts = np.bincount(np.asarray(tids)[:, 0], minlength=len(NOUNS) + 1)
        expected = np.zeros(len(NOUNS) + 1, dtype=int)
        for s in ds.unique_sample():
            expected[NOUNS.index(s.target) + 1] += s.freq
        np.testing.assert_array_equal(counts, expected)


def test_noun_multiset_writer(embedder, tmp_path):
    ds = make_noun_dataset(embedder)
    path = str(tmp_path / "multiset.bin")
    NounMultisetCacheWriter(path, ds, multi_target_freq=[1, 1], seed=0).generate()
    cache = EmbeddingCache(path, expectation(embedder))
    with cache:
        assert cache.header.embed_num == 2 * ds.num_fsids
        assert cache.header.embed_targets_dim == 2
        _, tids, *_ = cache.get_samples(0, cache.header.embed_num)
        tids = np.asarray(tids)
        # m=1 rows have a single target; m=2 rows have two
        num_targets = (tids > 0).sum(axis=1)
        assert sorted(np.bincount(num_targets, minlength=3)[1:].tolist()) == \
               sorted([ds.num_fsids, ds.num_fsids])


def test_captions_writer(embedder, tmp_path):
    captions = [
        {"target_noun": "dog",
         "singular_captions": [f"caption {i} about {{singular}}" for i in range(4)],
         "plural_captions": ["two {plural} playing"]},
        {"target_noun": "apple",
         "singular_captions": ["{singular} on a table"],
         "plural_captions": ["{plural} in a bowl"]},
        {"target_noun": "unrelated",
         "singular_captions": ["{singular} x"], "plural_captions": ["{plural} y"]},
    ]
    cap_path = str(tmp_path / "captions.json")
    with open(cap_path, "w") as f:
        json.dump(captions, f)
    ds = make_noun_dataset(embedder)
    path = str(tmp_path / "captions.bin")
    writer = CaptionsCacheWriter(path, cap_path, ds, template_multiplier=2,
                                 sample_multiplier=3, seed=0)
    writer.generate()
    cache = EmbeddingCache(path, expectation(embedder))
    with cache:
        _, tids, *_ = cache.get_samples(0, cache.header.embed_num)
        present = set(np.asarray(tids)[:, 0].tolist())
        # dog and apple present; 'animal' missing from captions; 'unrelated' dropped
        assert NOUNS.index("dog") + 1 in present
        assert NOUNS.index("apple") + 1 in present
        assert NOUNS.index("animal") + 1 not in present
        # Sample counts: freq_sum × sample_multiplier per target/number with captions
        dog_count = (np.asarray(tids)[:, 0] == NOUNS.index("dog") + 1).sum()
        dog_v = VOCAB[1]
        assert dog_count == 3 * (dog_v["singulars_freq_sum"] + dog_v["plurals_freq_sum"]) \
            if "singulars_freq_sum" in dog_v else dog_count > 0


def test_merge_caches_writer(embedder, tmp_path):
    ds = make_noun_dataset(embedder)
    p1 = str(tmp_path / "m1.bin")
    p2 = str(tmp_path / "m2.bin")
    NounDatasetCacheWriter(p1, ds, seed=0).generate()
    NounMultisetCacheWriter(p2, ds, multi_target_freq=[1, 1], seed=0).generate()
    c1 = EmbeddingCache(p1, expectation(embedder))
    c2 = EmbeddingCache(p2, expectation(embedder))
    merged_path = str(tmp_path / "merged.bin")
    MergeCachesWriter(merged_path, embedder, [c1, c2], freqs=[2, 1],
                      multi_mode="max", seed=0).generate()
    merged = EmbeddingCache(merged_path, expectation(embedder))
    with merged:
        assert merged.header.embed_num == 2 * c1.header.embed_num + c2.header.embed_num
        assert merged.header.embed_targets_dim == 2
        e, tids, *_ = merged.get_samples(0, merged.header.embed_num)
        assert (np.asarray(tids)[:, 0] > 0).all()
