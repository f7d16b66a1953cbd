"""Input-pipeline feed-rate benchmark at DP-8 consumption rates (VERDICT r1
item 6 / weak 4).

The jitted train step consumes 33.6k noun/s per chip (BENCH_NOTES round-1
training table); pure-DP on a v5e-8 therefore needs the host loader to
sustain >=270k noun/s of batch assembly (~830 MB/s of f32 embeds at F=768).
This measures the actual CacheDataset/BatchLoader mmap path on a synthetic
cache of the production shape (F=768, single-target), host-side (the feed
either keeps up on the host or the chips starve — device transfer overlaps
via the double-buffered prefetch thread).

Usage: python exp/loader_feed_rate.py [rows] [batch]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from novic_tpu.data.cache import CacheExpectation, EmbeddingCache, EmbeddingCacheWriter
from novic_tpu.text.simple import make_test_tokenizer
from novic_tpu.text.target import TargetTokenizer, create_target_config

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
F = 768
TARGET_RATE = 270_000  # 8 x 33.6k noun/s (BENCH_NOTES train-step rate)
NOUNS = [f"noun{i:05d}" for i in range(4000)]


def make_tt() -> TargetTokenizer:
    tok = make_test_tokenizer(NOUNS)
    tc = create_target_config(tok, NOUNS, with_start_token=False, with_end_token=True,
                              compact_ids=True, fixed_token_length=True,
                              auto_fixed_token_length=True, use_masks=True)
    return TargetTokenizer(tok, tc)


def build_cache(path: str, tt: TargetTokenizer) -> None:
    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    with EmbeddingCacheWriter(
            path, num_embed=ROWS, embed_dim=F, target_tokenizer=tt,
            target_nouns=NOUNS, num_embed_targets=1, shuffle=True,
            full_targets=False, unit_weights=True, embedder_strict=False,
            default_weights=True,
            seed=0) as w:
        chunk = 16384
        for start in range(0, ROWS, chunk):
            n = min(chunk, ROWS - start)
            e = rng.normal(size=(n, F)).astype(np.float32)
            e /= np.linalg.norm(e, axis=1, keepdims=True)
            ids = rng.integers(1, len(NOUNS) + 1, size=(n, 1)).astype(np.int32)
            w.write(e, ids)
    mb = ROWS * F * 4 / 1e6
    print(f"built cache: {ROWS} rows, {mb:.0f} MB embeds, "
          f"{time.perf_counter() - t0:.1f}s", flush=True)


def measure(cache: EmbeddingCache, epochs: int = 2, prefetch: int = 4) -> float:
    ds = cache.create_dataset(batch_size=BATCH, training=True)
    ds.configure_data(ds.resolve_data_config(use_weights=False, multi_target=False))
    from novic_tpu.data.loader import BatchLoader

    loader = BatchLoader(ds, prefetch=prefetch)
    n = 0
    t0 = time.perf_counter()
    for _ in range(epochs):
        ds.new_epoch()
        for batch in loader:
            embed = batch[0]
            n += embed.shape[0]
            # Consumer-side touch comparable to jax.device_put packaging
            _ = embed[::1024].sum()
    dt = time.perf_counter() - t0
    return n / dt


def main() -> None:
    path = os.environ.get("FEED_CACHE", "/tmp/feed_cache.bin")
    tt = make_tt()
    if not os.path.exists(path) or os.path.getsize(path) < ROWS * F * 4:
        build_cache(path, tt)
    exp = CacheExpectation(embed_dim=F, embed_dtype=np.float32)
    with EmbeddingCache(path, expectation=exp, strict_embedder=False) as cache:
        rate = measure(cache)
    print(f"BatchLoader feed rate (warm page cache): {rate / 1000:.1f}k noun/s "
          f"at batch {BATCH} (target {TARGET_RATE / 1000:.0f}k for DP-8) => "
          f"{'OK' if rate >= TARGET_RATE else 'TOO SLOW'} "
          f"({rate / TARGET_RATE:.2f}x)", flush=True)

    # Cold page cache: production caches (40M rows = 123 GB) exceed RAM, so
    # steady-state reads come from disk. Evict and measure one epoch.
    fd = os.open(path, os.O_RDONLY)
    try:
        os.posix_fadvise(fd, 0, 0, os.POSIX_FADV_DONTNEED)
    finally:
        os.close(fd)
    with EmbeddingCache(path, expectation=exp, strict_embedder=False) as cache:
        cold = measure(cache, epochs=1)
    print(f"BatchLoader feed rate (cold, from disk): {cold / 1000:.1f}k noun/s "
          f"=> {'OK' if cold >= TARGET_RATE else 'TOO SLOW'} "
          f"({cold / TARGET_RATE:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
