"""A/B: packed tok+id trie table vs separate tables — guided B=1 beam latency.

VERDICT r4 weak #4 / ask #4: the guided-decode bisection attributed the
W-independent +2.3 ms single-image penalty to ~6-8 sequential trie HLOs per
step and named the child_tok/child_id merge as the consolidation. The packed
table (guide_trie.build_guide_trie "child_pack") halves the per-step table
gathers (row gather + candidate-reorder gather each become one). This
harness measures B=1 guided beam k=10 p50 and B=256 throughput with the
packed table present vs stripped, same trie, same chip, interleaved runs.

Run ON TPU (one axon client at a time): python exp/guided_pack_latency.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from novic_tpu.models.config import DecoderModelConfig
from novic_tpu.models.generate import generate_beam
from novic_tpu.models.guide_trie import build_guide_trie
from novic_tpu.models.prefixed_iter import PrefixedIterDecoder
from novic_tpu.train.checkpoint import load_checkpoint

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ck = load_checkpoint(os.path.join(REPO, "assets", "bench_ft0_decoder.npz"))
    dcfg: DecoderModelConfig = ck["model_config"]
    params = jax.tree.map(
        lambda a: np.asarray(a).astype(np.float32)
        if np.issubdtype(np.asarray(a).dtype, np.floating) else np.asarray(a), ck["params"])
    decoder = PrefixedIterDecoder(cfg=dcfg)
    C = dcfg.token_length

    # Real-vocabulary guide trie (the bench's production path)
    from novic_tpu.text.simple import make_test_tokenizer
    from novic_tpu.text.target import TargetTokenizer

    nouns = list(ck["target_nouns"])[int(ck.get("num_invalid_target_nouns", 0)):]
    tok = make_test_tokenizer(nouns)
    tt = TargetTokenizer(tok, ck["target_config"])
    ids, _ = tt.tokenize_targets_batched(nouns, batch_size=8192)
    guide_np = ids[(ids >= 0).all(axis=1)].astype(np.int32)[:, :C]
    print(f"guide set: W={guide_np.shape[0]}, C={C}, V={dcfg.vocab_size}, "
          f"G={dcfg.token_length}")

    trie_full = build_guide_trie(guide_np, dcfg.vocab_size, C - 1)
    assert trie_full["child_pack"] is not None, "packing must fit for FT0 shapes"
    trie_nopack = dict(trie_full)
    trie_nopack["child_pack"] = None

    guide_dev = jax.device_put(guide_np)
    t_pack = jax.device_put({k: v for k, v in trie_full.items()})
    t_nopk = jax.device_put({k: v for k, v in trie_nopack.items() if k != "child_pack"})
    t_nopk["child_pack"] = None

    rng = np.random.default_rng(0)

    def embeds_of(b):
        e = rng.normal(size=(b, dcfg.embed_dim)).astype(np.float32)
        return jax.device_put(e / np.linalg.norm(e, axis=1, keepdims=True))

    @jax.jit
    def run_beam(params, embeds, gids, gtrie):
        t, p, s = generate_beam(decoder, params, embeds, topk=10,
                                guide_targets=gids, guide_renorm=True, guide_trie=gtrie)
        return (t.sum() + p.sum()).astype(jnp.float32) + s.sum()

    def bench(b, trie, label, iters, inner):
        e = embeds_of(b)

        @jax.jit
        def pipe(params, e, gids, gtrie):
            def body(i, acc):
                return acc + run_beam(params, e + 1e-6 * i, gids, gtrie)
            return jax.lax.fori_loop(0, inner, body, jnp.float32(0))

        np.asarray(pipe(params, e, guide_dev, trie))  # compile + warm
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            np.asarray(pipe(params, e, guide_dev, trie))
            best = min(best, time.perf_counter() - t0)
        per_img_ms = best / (inner * b) * 1000.0
        print(f"  {label:10s} B={b:4d}: {per_img_ms:8.3f} ms/img "
              f"({b / (best / inner):,.0f} img/s)")
        return per_img_ms

    print("B=1 guided beam k=10 (p50 proxy, best-of-5 of 20-step pipelines):")
    lat = {}
    for label, trie in (("packed", t_pack), ("separate", t_nopk), ("packed2", t_pack)):
        lat[label] = bench(1, trie, label, iters=5, inner=20)
    print("B=256 guided beam k=10 throughput:")
    thr = {}
    for label, trie in (("packed", t_pack), ("separate", t_nopk)):
        thr[label] = bench(256, trie, label, iters=3, inner=2)
    print(f"\nB=1 packed vs separate: {lat['separate'] / min(lat['packed'], lat['packed2']):.3f}x "
          f"({lat['separate'] - min(lat['packed'], lat['packed2']):+.3f} ms saved)")


if __name__ == "__main__":
    main()
