"""Noun dataset: FSID/USID index math cross-validated against the sequential
generator (the reference's own consistency check, noun_dataset.py:487-501),
frequency accounting, text assembly, noun cache round-trip and loader.
"""

import numpy as np
import pytest

from novic_tpu.data.noun_dataset import BUILTIN_PROMPTS, NounDataset
from novic_tpu.embedders.base import Embedder

VOCAB = [
    {"id": 0, "target_noun": "animal", "pretty_noun": "Animal",
     "singulars": ["animal"], "plurals": ["animals"],
     "singulars_freq": [2], "plurals_freq": [1], "hypernyms": []},
    {"id": 1, "target_noun": "dog", "pretty_noun": "Dog",
     "singulars": ["dog", "hound"], "plurals": ["dogs"],
     "singulars_freq": [3, 1], "plurals_freq": [2], "hypernyms": [0]},
    {"id": 2, "target_noun": "fire truck", "pretty_noun": "Fire Truck",
     "singulars": ["fire truck", "fire engine"], "plurals": ["fire trucks"],
     "singulars_freq": [2, 2], "plurals_freq": [1], "hypernyms": []},
    {"id": 3, "target_noun": "apple", "pretty_noun": "Apple",
     "singulars": ["apple"], "plurals": ["apples"],
     "singulars_freq": [1], "plurals_freq": [1], "hypernyms": [0]},
]


@pytest.fixture(scope="module")
def embedder():
    return Embedder.create("test:24")


def make_ds(embedder, **kwargs):
    defaults = dict(vocab_json=VOCAB, prompt_json=BUILTIN_PROMPTS,
                    prompt_collection="Basic", hypernym_collection="None | Type")
    defaults.update(kwargs)
    return NounDataset(embedder, **defaults)


def test_consistency_full(embedder):
    """Exhaustive cross-check: indexed O(log n) decode == sequential generator
    for EVERY fsid."""
    ds = make_ds(embedder, check_consistent=True)
    # Consume the generator to trigger the full check
    samples = list(ds.unique_sample())
    assert len(samples) == ds.num_usids
    assert samples[-1].fsid + samples[-1].freq == ds.num_fsids
    # USIDs are exactly sequential, FSIDs accumulate freq
    for a, b in zip(samples, samples[1:]):
        assert b.usid == a.usid + 1
        assert b.fsid == a.fsid + a.freq


def test_frequency_accounting(embedder):
    ds = make_ds(embedder)
    # num_fsids = sum over (vocab, number) of total prompt freq × hypernym freq × noun freq
    total = 0
    sing_freq = sum(p.freq for p in ds.singular_prompts)
    plur_freq = sum(p.freq for p in ds.plural_prompts)
    hyp_freq = ds.total_freq_hypernyms
    for v in VOCAB:
        total += sing_freq * hyp_freq * sum(v["singulars_freq"])
        total += plur_freq * hyp_freq * sum(v["plurals_freq"])
    assert ds.num_fsids == total
    # Frequencies aggregate correctly per unique sample
    freq_sum = sum(s.freq for s in ds.unique_sample())
    assert freq_sum == ds.num_fsids


def test_text_assembly(embedder):
    ds = make_ds(embedder)
    texts = {s.text for s in ds.unique_sample()}
    # Articles correct
    assert "a photo of a dog." in texts
    assert "a photo of an apple." in texts
    assert "a photo of an animal." in texts
    # Plural prompts use plurals, no article
    assert "an image of many dogs." in texts
    # Hypernym suffix present for dog (hypernym: animal)
    assert any("which is a type of" in t and "dog" in t for t in texts)
    # Bare noun template
    assert "dog." in texts


def test_vocab_thres(embedder):
    ds = make_ds(embedder, vocab_thres=2)
    # 'animal' (freq 3) and 'apple' (freq 2) — apple filtered (<= 2), animal kept
    assert "apple" not in ds.target_nouns
    assert "animal" in ds.target_nouns and "dog" in ds.target_nouns


def test_getitem_uncached(embedder):
    ds = make_ds(embedder)
    text, target, _, _ = ds[0]
    assert isinstance(text, str) and target in ds.target_nouns
    with pytest.raises(IndexError):
        ds.get_sample_details(fsid=ds.num_fsids)


def test_noun_cache_roundtrip(embedder, tmp_path):
    tc = embedder.create_target_config(
        [v["target_noun"] for v in VOCAB], with_start_token=False, with_end_token=True,
        compact_ids=True, fixed_token_length=True, auto_fixed_token_length=True, use_masks=True)
    embedder.configure_target(tc, [v["target_noun"] for v in VOCAB])
    ds = make_ds(embedder, cache_dir=str(tmp_path))
    ds.configure_target()
    ds.configure_data(ds.resolve_data_config())
    with ds.loaded():
        # Cached getitem returns embed/target/mask consistent with direct embedding
        usid = ds.get_sample_usid(0)
        embed, target, mask, _ = ds[0]
        text, target_noun = ds.get_sample_text(fsid=0)
        ref = embedder.inference_text([text])[0]
        np.testing.assert_allclose(embed, ref, atol=1e-5)
        ids, _ = embedder.tokenize_target(target_noun)
        np.testing.assert_array_equal(target[:ids.shape[1]], ids[0])
    # Second load hits the sanity check path (no regeneration)
    with ds.loaded():
        pass


def test_noun_loader(embedder, tmp_path):
    tc = embedder.create_target_config(
        [v["target_noun"] for v in VOCAB], with_start_token=False, with_end_token=True,
        compact_ids=True, fixed_token_length=True, auto_fixed_token_length=True, use_masks=True)
    embedder.configure_target(tc, [v["target_noun"] for v in VOCAB])
    ds = make_ds(embedder, cache_dir=str(tmp_path / "cache2"))
    ds.configure_target()
    ds.configure_data(ds.resolve_data_config())
    loader, info = ds.create_loader(batch_size=16, training=True, seed=1)
    assert info.epoch_samples == (ds.num_fsids // 16) * 16
    with ds.loaded():
        n = 0
        for embed, target, mask, weight in loader:
            assert embed.shape == (16, 24)
            assert target.shape[0] == 16 and mask.shape == target.shape
            assert weight is None
            np.testing.assert_allclose(np.linalg.norm(embed, axis=1), 1.0, rtol=1e-4)
            n += 1
            if n >= 3:
                break


def test_uncached_loader(embedder):
    """Uncached mode embeds text on the fly per batch (ref noun_dataset.py:532-562)."""
    ds = make_ds(embedder)
    tc = embedder.create_target_config(
        [v["target_noun"] for v in VOCAB], with_start_token=False, with_end_token=True,
        compact_ids=True, fixed_token_length=False, auto_fixed_token_length=True, use_masks=True)
    embedder.configure_target(tc, [v["target_noun"] for v in VOCAB])
    ds.configure_target()
    ds.configure_data(ds.resolve_data_config())
    loader, info = ds.create_loader(batch_size=8, training=False)
    with ds.loaded():
        embed, target, mask, weight = next(iter(loader))
    assert embed.shape == (8, 24)
    assert target is not None and target.shape[0] == 8
