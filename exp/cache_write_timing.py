"""Cache-writer throughput: native C++ scatter-pwrite vs the Python fallback.

Writer-side global shuffle makes every row a scattered pwrite — the hot path
at paper scale (40M+ rows, ref embedding_cache.py:161-457).
"""
import os
import tempfile
import time

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import novic_tpu.data.native as native
from novic_tpu.data.cache import EmbeddingCacheWriter
from novic_tpu.embedders.base import Embedder

N, F, CHUNK = 200_000, 768, 4096
NOUNS = [f"noun{i}" for i in range(64)]


def run(label):
    embedder = Embedder.create("test:%d" % F)
    tc = embedder.create_target_config(NOUNS, with_start_token=False, with_end_token=True,
                                       compact_ids=True, fixed_token_length=False,
                                       auto_fixed_token_length=True, use_masks=True)
    embedder.configure_target(tc, NOUNS)
    rng = np.random.default_rng(0)
    embeds = rng.normal(size=(CHUNK, F)).astype(np.float32)
    embeds /= np.linalg.norm(embeds, axis=1, keepdims=True)
    ids = rng.integers(1, len(NOUNS) + 1, size=(CHUNK, 1)).astype(np.int32)
    path = os.path.join(tempfile.mkdtemp(), "cache.bin")
    t0 = time.perf_counter()
    with EmbeddingCacheWriter(path, num_embed=N, embed_dim=F,
                              target_tokenizer=embedder.target_tokenizer,
                              target_nouns=NOUNS, num_embed_targets=1, shuffle=True,
                              default_weights=True, seed=1) as w:
        for i in range(0, N, CHUNK):
            n = min(CHUNK, N - i)
            w.write(embeds[:n], ids[:n])
    dt = time.perf_counter() - t0
    size = os.path.getsize(path)
    print(f"{label:26s} {N/dt:12,.0f} rows/s   {size/dt/1e6:8.1f} MB/s   ({dt:.2f}s)",
          flush=True)
    os.unlink(path)


run("native scatter-pwrite")
native._lib = None
orig = native.get_lib
native.get_lib = lambda: None
run("python fallback")
native.get_lib = orig
