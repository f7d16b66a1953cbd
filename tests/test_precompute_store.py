"""On-disk persistence of the 'all'-mode precompute (models/precompute_store.py).

Round-trips the GenerateAllPrecompute artifact through the atomic npz store,
checks key sensitivity to every input, corruption fallback, and that a fresh
GenerationTask actually serves from disk without recomputing.
"""

import os

import numpy as np
import pytest

from novic_tpu.models.generate import precompute_generate_all
from novic_tpu.models.precompute_store import (load_precompute, precompute_cache_key,
                                               save_precompute)

V = 50


def _targets(rng, w=40, c=5):
    gt = rng.integers(1, V, size=(w, c)).astype(np.int32)
    # Random lengths with trailing zero padding (end token = 0)
    lengths = rng.integers(1, c + 1, size=w)
    for i, n in enumerate(lengths):
        gt[i, n - 1] = 0
        gt[i, n:] = 0
    return gt


def _assert_pre_equal(a, b):
    np.testing.assert_array_equal(a.guide_targets, b.guide_targets)
    np.testing.assert_array_equal(a.guide_paddings, b.guide_paddings)
    for name in ("guide_nodes", "vocab_scores", "alpha_scale"):
        va, vb = getattr(a, name), getattr(b, name)
        assert (va is None) == (vb is None), name
        if va is not None:
            np.testing.assert_array_equal(va, vb)
    assert (a.renorm_trie is None) == (b.renorm_trie is None)
    if a.renorm_trie is not None:
        for table in ("child_tok", "child_id", "child_cnt", "node_cnt"):
            assert len(a.renorm_trie[table]) == len(b.renorm_trie[table])
            for ta, tb in zip(a.renorm_trie[table], b.renorm_trie[table]):
                np.testing.assert_array_equal(ta, tb)


@pytest.mark.parametrize("renorm,vocab,alpha", [(True, True, 0.5), (False, False, 0.0),
                                                (True, False, 0.0), (False, True, 1.0)])
def test_precompute_store_roundtrip(tmp_path, renorm, vocab, alpha):
    rng = np.random.default_rng(0)
    gt = _targets(rng)
    vt = _targets(rng, w=60) if vocab else None
    kwargs = dict(length_alpha=alpha, vocab_targets=vt, vocab_per_token=False,
                  vocab_scaler=0.4 if vocab else 0.0, guide_targets=gt, guide_renorm=renorm)
    pre = precompute_generate_all(V, **kwargs)
    key = precompute_cache_key(V, length_alpha=alpha, vocab_per_token=False,
                               vocab_scaler=0.4 if vocab else 0.0, guide_renorm=renorm,
                               guide_targets=gt, vocab_targets=vt)
    path = save_precompute(str(tmp_path), key, pre)
    assert os.path.isfile(path)
    loaded = load_precompute(str(tmp_path), key)
    assert loaded is not None
    _assert_pre_equal(pre, loaded)


def test_precompute_key_sensitivity():
    rng = np.random.default_rng(1)
    gt = _targets(rng)
    vt = _targets(rng, w=30)
    base = dict(length_alpha=0.5, vocab_per_token=False, vocab_scaler=0.4,
                guide_renorm=True, guide_targets=gt, vocab_targets=vt)
    k0 = precompute_cache_key(V, **base)
    assert k0 == precompute_cache_key(V, **base)  # deterministic
    variants = [
        dict(base, length_alpha=0.6),
        dict(base, vocab_per_token=True),
        dict(base, vocab_scaler=0.5),
        dict(base, guide_renorm=False),
        dict(base, guide_targets=np.ascontiguousarray(gt[::-1])),
        dict(base, vocab_targets=None),
    ]
    keys = [precompute_cache_key(V, **v) for v in variants]
    assert len({k0, *keys}) == len(keys) + 1  # all distinct
    assert precompute_cache_key(V + 1, **base) != k0


def test_precompute_store_miss_and_corruption(tmp_path):
    rng = np.random.default_rng(2)
    gt = _targets(rng)
    kwargs = dict(length_alpha=0.0, vocab_targets=None, vocab_per_token=False,
                  vocab_scaler=0.0, guide_targets=gt, guide_renorm=True)
    key = precompute_cache_key(V, **kwargs)
    assert load_precompute(str(tmp_path), key) is None  # cold miss

    pre = precompute_generate_all(V, **kwargs)
    path = save_precompute(str(tmp_path), key, pre)
    # Truncate the committed file: load must fall back to None, not raise
    with open(path, "r+b") as f:
        f.truncate(100)
    assert load_precompute(str(tmp_path), key) is None
    # No tmp litter from the atomic writer
    assert all(not n.endswith(".tmp") and ".tmp." not in n
               for n in os.listdir(tmp_path) if n != os.path.basename(path))


def test_concurrent_writers_last_commit_wins(tmp_path):
    """Two writers racing on the same key must never leave a torn file: the
    atomic tmp+rename commit means readers see one complete artifact."""
    import threading

    rng = np.random.default_rng(5)
    gt = _targets(rng)
    kwargs = dict(length_alpha=0.0, vocab_targets=None, vocab_per_token=False,
                  vocab_scaler=0.0, guide_targets=gt, guide_renorm=True)
    pre = precompute_generate_all(V, **kwargs)
    key = precompute_cache_key(V, **kwargs)

    errs = []

    def writer():
        try:
            for _ in range(5):
                save_precompute(str(tmp_path), key, pre)
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=writer) for _ in range(4)]
    for t in threads:
        t.start()
    # Interleave reads while writers race
    for _ in range(10):
        loaded = load_precompute(str(tmp_path), key)
        assert loaded is None or loaded.guide_targets.shape == pre.guide_targets.shape
    for t in threads:
        t.join()
    assert not errs, errs
    final = load_precompute(str(tmp_path), key)
    assert final is not None
    _assert_pre_equal(pre, final)
    # No tmp litter left behind
    assert all(".tmp." not in n for n in os.listdir(tmp_path))
