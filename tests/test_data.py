"""Data layer tests: cache round-trips (ref train.py:493-667 test_embed_cache),
loader invariants + GradAccum (ref train.py:343-486 test_data_loader), and
noise augmentation statistics.
"""

import math
import random

import jax
import numpy as np
import pytest

from novic_tpu.data import noise as noise_mod
from novic_tpu.data.cache import (
    CacheExpectation,
    EmbeddingCache,
    EmbeddingCacheWriter,
    MAGIC_BYTES,
)
from novic_tpu.data.grad_accum import GradAccum
from novic_tpu.text.simple import make_test_tokenizer
from novic_tpu.text.target import TargetTokenizer, create_target_config

NOUNS = ["dog", "cat", "fire truck", "sea lion", "tree"]
F = 16


def unit_rows(n, f=F, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, f)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


@pytest.fixture(scope="module")
def tt():
    tok = make_test_tokenizer(NOUNS)
    tc = create_target_config(tok, NOUNS, with_start_token=False, with_end_token=True,
                              compact_ids=True, fixed_token_length=True,
                              auto_fixed_token_length=True, use_masks=True)
    return TargetTokenizer(tok, tc)


def write_target_cache(path, tt, n=32, m=2, shuffle=True, seed=1):
    rng = np.random.default_rng(seed)
    embeds = unit_rows(n, seed=seed)
    noun_ids = rng.integers(1, len(NOUNS) + 1, size=(n, m)).astype(np.int32)
    # Make some rows single-target (second id 0, zero weight)
    single = rng.random(n) < 0.3
    if m > 1:
        noun_ids[single, 1:] = 0
    w = rng.random((n, m)).astype(np.float32) + 0.1
    w[:, 1:][noun_ids[:, 1:] == 0] = 0 if m > 1 else 0
    w = -np.sort(-w, axis=1)
    w[:, 1:][noun_ids[:, 1:] == 0] = 0
    w = w / w.sum(axis=1, keepdims=True)
    with EmbeddingCacheWriter(
            path, num_embed=n, embed_dim=F, target_tokenizer=tt, target_nouns=NOUNS,
            num_embed_targets=m, shuffle=shuffle, full_targets=False, unit_weights=True,
            seed=seed) as w_:
        for i in range(0, n, 8):
            w_.write(embeds[i:i + 8], noun_ids[i:i + 8], w[i:i + 8])
    return embeds, noun_ids, w


def test_cache_roundtrip_no_targets(tmp_path):
    path = str(tmp_path / "plain.bin")
    embeds = unit_rows(20)
    with EmbeddingCacheWriter(path, num_embed=20, embed_dim=F, use_targets=False,
                              shuffle=True, embedder_strict=False, seed=3) as w:
        for i in range(0, 20, 7):
            w.write(embeds[i:i + 7])
    cache = EmbeddingCache(path, CacheExpectation(embed_dim=F, embed_dtype=np.float32))
    with cache:
        got, *_ = cache.get_samples(0, 20)
        # Shuffled on disk: compare as sets of rows
        a = np.asarray(sorted(map(tuple, np.round(got, 5).tolist())))
        b = np.asarray(sorted(map(tuple, np.round(embeds, 5).tolist())))
        np.testing.assert_array_equal(a, b)


def test_cache_magic_commit(tmp_path):
    """Partial writes leave no valid cache (magic-bytes-last commit,
    ref embedding_cache.py:426-452)."""
    path = str(tmp_path / "partial.bin")
    embeds = unit_rows(10)
    with pytest.raises(RuntimeError):
        with EmbeddingCacheWriter(path, num_embed=10, embed_dim=F, use_targets=False,
                                  embedder_strict=False) as w:
            w.write(embeds[:5])  # incomplete
    import os
    assert not os.path.exists(path)


def test_cache_rejects_nonunit(tmp_path):
    path = str(tmp_path / "nonunit.bin")
    with pytest.raises(ValueError, match="unit vectors"):
        with EmbeddingCacheWriter(path, num_embed=4, embed_dim=F, use_targets=False,
                                  embedder_strict=False) as w:
            w.write(2.0 * unit_rows(4))


def test_cache_targets_roundtrip(tmp_path, tt):
    path = str(tmp_path / "tgt.bin")
    embeds, noun_ids, weights = write_target_cache(path, tt, n=32, m=2, shuffle=False)
    cache = EmbeddingCache(path, CacheExpectation(
        embed_dim=F, embed_dtype=np.float32, target_config=tt.target_config))
    with cache:
        e, tids, tgt, mask, w = cache.get_samples(0, 32)
        np.testing.assert_allclose(np.asarray(e), embeds, rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(tids), noun_ids)
        np.testing.assert_allclose(np.asarray(w), weights, rtol=1e-6)
        # Gathered tokenizations match direct tokenization
        all_nouns = ("",) + tuple(NOUNS)
        for b in range(5):
            for mcol in range(2):
                nid = noun_ids[b, mcol]
                if nid > 0:
                    ids, msk = tt.tokenize_target(all_nouns[nid])
                    np.testing.assert_array_equal(np.asarray(tgt[b, mcol]), ids[0])
        # Detokenization via cache target rows
        assert cache.target_nouns == all_nouns


def test_cache_hash_mismatch(tmp_path, tt):
    path = str(tmp_path / "hash.bin")
    write_target_cache(path, tt)
    tok2 = make_test_tokenizer(NOUNS + ["extra noun"])
    tc2 = create_target_config(tok2, NOUNS + ["extra noun"], with_start_token=False,
                               with_end_token=True, compact_ids=True, fixed_token_length=True,
                               auto_fixed_token_length=True, use_masks=True)
    with pytest.raises(ValueError, match="target config hash"):
        EmbeddingCache(path, CacheExpectation(embed_dim=F, embed_dtype=np.float32,
                                              target_config=tc2))


def test_dataset_batches_and_epoch_coverage(tmp_path, tt):
    path = str(tmp_path / "ds.bin")
    write_target_cache(path, tt, n=30, m=2)
    cache = EmbeddingCache(path, CacheExpectation(
        embed_dim=F, embed_dtype=np.float32, target_config=tt.target_config))
    ds = cache.create_dataset(batch_size=8, training=True)
    dc = ds.resolve_data_config(multi_target=True, use_weights=True, multi_first=False)
    ds.configure_data(dc)
    assert ds.num_items == 3 and ds.num_embeds == 24  # incomplete batch dropped in training
    loader, info = ds.create_loader(batch_size=8, training=True, seed=5)
    assert info.epoch_batches == 3 and info.batch_size == 8 and not info.incomplete_batch
    with ds.loaded():
        # Two epochs: all batches full-size; circular offset changes coverage
        seen = []
        for _ in range(2):
            for embed, target, mask, weight in loader:
                assert embed.shape == (8, F)
                assert target.ndim == 3 and target.shape[0] == 8
                assert mask.shape == target.shape
                assert weight.shape == target.shape[:2]
                # weights renormalized to sum 1 (after trimming)
                np.testing.assert_allclose(weight.sum(axis=1), 1.0, rtol=1e-5)
                seen.append(np.asarray(embed))
        assert len(seen) == 6


def test_dataset_eval_mode_incomplete_batch(tmp_path, tt):
    path = str(tmp_path / "ev.bin")
    write_target_cache(path, tt, n=30, m=2)
    cache = EmbeddingCache(path, CacheExpectation(
        embed_dim=F, embed_dtype=np.float32, target_config=tt.target_config))
    ds = cache.create_dataset(batch_size=8, training=False)
    ds.configure_data(ds.resolve_data_config(multi_target=True))
    loader, info = ds.create_loader(batch_size=8, training=False)
    assert info.incomplete_batch and info.batch_size_last == 6
    with ds.loaded():
        sizes = [e.shape[0] for e, *_ in loader]
    assert sizes == [8, 8, 8, 6]


def test_dataset_single_target_mode(tmp_path, tt):
    """multi_target=False squeezes M and sets unit weights (ref embedding_cache.py:877-889)."""
    path = str(tmp_path / "st.bin")
    write_target_cache(path, tt, n=16, m=2)
    cache = EmbeddingCache(path, CacheExpectation(
        embed_dim=F, embed_dtype=np.float32, target_config=tt.target_config))
    ds = cache.create_dataset(batch_size=4, training=False)
    ds.configure_data(ds.resolve_data_config(multi_target=False, use_weights=True))
    loader, _ = ds.create_loader(batch_size=4, training=False)
    with ds.loaded():
        for embed, target, mask, weight in loader:
            assert target.ndim == 2
            np.testing.assert_array_equal(weight, np.ones_like(weight))


def test_dataset_multi_first(tmp_path, tt):
    path = str(tmp_path / "mf.bin")
    write_target_cache(path, tt, n=16, m=2)
    cache = EmbeddingCache(path, CacheExpectation(
        embed_dim=F, embed_dtype=np.float32, target_config=tt.target_config))
    ds = cache.create_dataset(batch_size=4, training=False)
    ds.configure_data(ds.resolve_data_config(multi_target=True, multi_first=True))
    loader, _ = ds.create_loader(batch_size=4, training=False)
    with ds.loaded():
        embed, target, mask, weight = next(iter(loader))
        assert target.shape[1] == 4  # M x B x C
        assert weight.shape[1] == 4


def test_grad_accum_bookkeeping():
    """Accumulated scaled losses sum to ~1 for unit mean losses (ref train.py:440-460)."""

    class FakeLoader(list):
        pass

    from novic_tpu.data.config import LoaderInfo

    batches = 10
    loader = FakeLoader(range(batches))
    info = LoaderInfo(num_workers=0, prefetch_factor=0, pin_memory=False, on_device=True,
                      batch_size=4, batch_size_last=0, complete_batches=batches,
                      incomplete_batch=False, epoch_batches=batches, epoch_samples=40,
                      available_samples=40)
    ga = GradAccum(loader, info, accum_size=3, drop_last=False)
    assert ga.complete_steps == 3 and ga.incomplete_step and ga.loader_steps == 4
    total = 0.0
    steps = 0
    for _ in ga.loader():
        scaled, do_step = ga.accum_loss(1.0, 4)
        total += scaled
        steps += int(do_step)
    assert steps == ga.loader_steps
    # 9 complete batches at 1/3 + 1 incomplete at 4/4 = 3 + 1 = 4 meta-batch means
    assert math.isclose(total, 4.0, rel_tol=1e-9)


# ---------------------------------------------------------------------------
# Noise
# ---------------------------------------------------------------------------


def test_noise_schemes_unit_norm():
    key = jax.random.PRNGKey(0)
    embed = jax.numpy.asarray(unit_rows(64, 32))
    for fn in (
        lambda k, e: noise_mod.gauss_elem(k, e, vec_norm=3.25),
        lambda k, e: noise_mod.gauss_vec(k, e, vec_norm=1.0),
        lambda k, e: noise_mod.gauss_angle(k, e, angle_std=30, angle_max=60),
        lambda k, e: noise_mod.uniform_angle(k, e, angle_min=45, angle_max=75),
        lambda k, e: noise_mod.gauss_elem_uniform_angle(k, e, vec_norm=3.25, angle_min=45,
                                                        angle_max=75, mix_ratio=0.15),
    ):
        out = np.asarray(jax.jit(fn)(key, embed))
        np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, rtol=1e-5)
        assert not np.allclose(out, np.asarray(embed))


def test_uniform_angle_range():
    key = jax.random.PRNGKey(1)
    embed = jax.numpy.asarray(unit_rows(256, 64))
    out = np.asarray(jax.jit(
        lambda k, e: noise_mod.uniform_angle(k, e, angle_min=45, angle_max=75))(key, embed))
    cos = np.clip((out * np.asarray(embed)).sum(axis=1), -1, 1)
    angles = np.degrees(np.arccos(cos))
    assert angles.min() > 44.0 and angles.max() < 76.0


def test_noise_factory_and_mean_shift():
    n = noise_mod.EmbeddingNoise.create("GaussElemUniformAngle", vec_norm=3.25,
                                        angle_min=45, angle_max=75, mix_ratio=0.15)
    assert n is not None and n.scheme == "gausselemuniformangle"
    assert noise_mod.EmbeddingNoise.create("") is None
    with pytest.raises(ValueError):
        noise_mod.EmbeddingNoise.create("bogus")
    embed = jax.numpy.asarray(unit_rows(8, 16))
    shift = jax.numpy.ones((16,)) * 0.1
    out = np.asarray(noise_mod.apply_mean_shift(embed, shift))
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, rtol=1e-5)


def test_native_scatter_pwrite(tmp_path):
    """Native C++ scatter-pwrite produces byte-identical caches to the Python
    path and is available in this environment (g++ is baked in)."""
    from novic_tpu.data import native

    lib = native.get_lib()
    assert lib is not None, "native cache I/O should build with the baked-in g++"
    # Write the same shuffled cache twice: native vs forced-Python fallback
    embeds = unit_rows(40)
    paths = []
    for mode in ("native", "python"):
        path = str(tmp_path / f"nat_{mode}.bin")
        paths.append(path)
        if mode == "python":
            native._lib, native._tried = None, True  # force fallback
        try:
            with EmbeddingCacheWriter(path, num_embed=40, embed_dim=F, use_targets=False,
                                      embedder_strict=False, seed=42) as w:
                for i in range(0, 40, 16):
                    w.write(embeds[i:i + 16])
        finally:
            if mode == "python":
                native._lib, native._tried = lib, True  # restore
    with open(paths[0], "rb") as a, open(paths[1], "rb") as b:
        assert a.read() == b.read(), "native and python cache bytes differ"


def test_native_scatter_speed(tmp_path):
    """The native path beats the per-row Python loop on a scatter-heavy write."""
    import time

    from novic_tpu.data import native

    lib = native.get_lib()
    if lib is None:
        pytest.skip("no native lib")
    n = 20000
    embeds = unit_rows(n, 64, seed=9)

    def build(path, force_python):
        if force_python:
            native._lib, native._tried = None, True
        try:
            t0 = time.perf_counter()
            with EmbeddingCacheWriter(path, num_embed=n, embed_dim=64, use_targets=False,
                                      embedder_strict=False, seed=7) as w:
                w.write(embeds)
            return time.perf_counter() - t0
        finally:
            native._lib, native._tried = lib, True

    t_native = build(str(tmp_path / "fast.bin"), False)
    t_python = build(str(tmp_path / "slow.bin"), True)
    # Not a strict benchmark (1-core box) but native should never be slower
    assert t_native <= t_python * 1.5, f"native {t_native:.3f}s vs python {t_python:.3f}s"


def test_grad_accum_loader_reiterable(tt, tmp_path):
    """GradAccum.loader() must survive multiple epoch passes even when
    drop_last truncates (a one-shot islice hung training at epoch 2 in the
    round-2 soak: the second pass yielded zero batches)."""
    path = str(tmp_path / "reiter.bin")
    write_target_cache(path, tt, n=50, m=1)
    cache = EmbeddingCache(path, CacheExpectation(embed_dim=F, embed_dtype=np.float32))
    with cache:
        ds = cache.create_dataset(batch_size=10, training=True)
        ds.configure_data(ds.resolve_data_config(use_weights=False, multi_target=False))
        loader, info = ds.create_loader(batch_size=10, training=True, seed=3)
        # accum 3 over 5 complete batches -> drop_last truncates to 3 batches
        ga = GradAccum(loader, info, accum_size=3, drop_last=True)
        assert ga.loader_batches == 3 < info.epoch_batches
        epoch_loader = ga.loader()
        for _epoch in range(3):
            batches = list(epoch_loader)
            assert len(batches) == 3, "epoch loader must re-iterate every epoch"


class _ListBatchDataset:
    """Minimal batch-item dataset for BatchLoader unit tests."""

    def __init__(self, n, fail_at=None):
        self.n = n
        self.fail_at = fail_at
        self.epochs = 0

    def new_epoch(self, rng=None):
        self.epochs += 1

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        if self.fail_at is not None and i == self.fail_at:
            raise RuntimeError(f"injected failure at {i}")
        return (np.full((4, 8), i, np.float32), None, None, None)


def test_batch_loader_concurrent_put_ordering():
    """With put_workers > 1 the device_put transfers run concurrently but
    batches are delivered strictly in dataset order (futures preserve it)."""
    from novic_tpu.data.loader import BatchLoader

    ds = _ListBatchDataset(12)
    loader = BatchLoader(ds, prefetch=3, device_put=True, put_workers=4)
    for epoch in range(2):
        got = [float(np.asarray(b[0])[0, 0]) for b in loader]
        assert got == [float(i) for i in range(12)]
    assert ds.epochs == 2


def test_batch_loader_error_propagates_with_pool():
    from novic_tpu.data.loader import BatchLoader

    loader = BatchLoader(_ListBatchDataset(8, fail_at=5), prefetch=2,
                         device_put=True, put_workers=4)
    seen = []
    with pytest.raises(RuntimeError, match="injected failure"):
        for b in loader:
            seen.append(float(np.asarray(b[0])[0, 0]))
    assert seen == [0.0, 1.0, 2.0, 3.0, 4.0]


def test_batch_loader_early_break_shuts_down_pool():
    from novic_tpu.data.loader import BatchLoader

    ds = _ListBatchDataset(64)
    loader = BatchLoader(ds, prefetch=2, device_put=True, put_workers=4)
    for k, b in enumerate(loader):
        if k == 3:
            break
    # A fresh iteration restarts cleanly after the early break
    got = [float(np.asarray(b[0])[0, 0]) for b in loader]
    assert got == [float(i) for i in range(64)]
