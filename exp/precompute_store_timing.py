"""Cold vs warm 'all'-mode precompute at FT0 scale (VERDICT r4 ask #5 evidence).

Builds the FT0-shaped guide set (W=42,919, C=12, V=4096 — the bench.py
exhaustive-'all' shape) at the heaviest precompute config (guide_renorm +
per-target vocab prior: renorm trie + vectorized trie walks), times the cold
host-side precompute + atomic save, then re-loads the artifact in a FRESH
python subprocess — the serving-restart scenario the store exists for.

Usage: python exp/precompute_store_timing.py          (full run)
       python exp/precompute_store_timing.py --load DIR KEY   (warm child)
"""

import os
import subprocess
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

W, C, V = 42919, 12, 4096


def make_guide(w=W, c=C, v=V):
    rng = np.random.default_rng(0)
    lengths = rng.integers(1, c, size=w)
    toks = rng.integers(1, v, size=(w, c), dtype=np.int32)
    return np.where(np.arange(c)[None, :] < lengths[:, None], toks, 0).astype(np.int32)


def main():
    from novic_tpu.models.generate import precompute_generate_all
    from novic_tpu.models.precompute_store import precompute_cache_key, save_precompute

    guide = make_guide()
    kwargs = dict(length_alpha=0.5, vocab_targets=guide, vocab_per_token=False,
                  vocab_scaler=0.4, guide_renorm=True)

    t0 = time.perf_counter()
    pre = precompute_generate_all(V, guide_targets=guide, **kwargs)
    t_cold = time.perf_counter() - t0

    store = tempfile.mkdtemp(prefix="novic_prestore_")
    key = precompute_cache_key(V, guide_targets=guide, **kwargs)
    t0 = time.perf_counter()
    path = save_precompute(store, key, pre)
    t_save = time.perf_counter() - t0
    size_mb = os.path.getsize(path) / (1 << 20)

    # Warm load in a fresh process (cold imports + cold page cache for numpy)
    t0 = time.perf_counter()
    subprocess.run([sys.executable, os.path.abspath(__file__), "--load", store, key],
                   check=True)
    t_warm_proc = time.perf_counter() - t0

    print(f"cold precompute: {t_cold:.2f} s  (W={W}, C={C}, V={V}, renorm+vocab)")
    print(f"atomic save:     {t_save:.2f} s  ({size_mb:.1f} MiB)")
    print(f"fresh-process load (incl. interpreter+import): {t_warm_proc:.2f} s")
    ok = t_warm_proc < 5.0
    print(f"warm-restart < 5 s gate: {'PASS' if ok else 'FAIL'}")


def child_load(store, key):
    t0 = time.perf_counter()
    from novic_tpu.models.precompute_store import load_precompute

    t_import = time.perf_counter() - t0
    t0 = time.perf_counter()
    pre = load_precompute(store, key)
    t_load = time.perf_counter() - t0
    assert pre is not None and pre.renorm_trie is not None
    assert pre.guide_targets.shape[0] == W
    print(f"  child: import {t_import:.2f} s, load {t_load:.2f} s")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--load":
        child_load(sys.argv[2], sys.argv[3])
    else:
        main()
