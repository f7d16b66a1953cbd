"""Tests for the object decoder: forward semantics, loss decomposition,
KV-cached generation equivalence, guide masking, beam search, generate_all.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from novic_tpu.models import DecoderModelConfig, PrefixedIterDecoder, create_decoder
from novic_tpu.models import generate as gen_mod


def generate_greedy(model, params, embed, **kw):
    fn = jax.jit(lambda p, e: gen_mod.generate_greedy(model, p, e, **kw))
    return fn(params, embed)


def generate_beam(model, params, embed, **kw):
    fn = jax.jit(lambda p, e: gen_mod.generate_beam(model, p, e, **kw))
    return fn(params, embed)


def generate_all(model, params, embed, **kw):
    return gen_mod.generate_all(model, params, embed, **kw)
from novic_tpu.models.prefixed_iter import cross_entropy_elems, expand_target_padding

V = 23          # compact vocab size
CMAX = 7        # token length incl end
F = 32          # embed dim
E = 64          # hidden

BASE_CFG = DecoderModelConfig(
    embed_dim=F, vocab_size=V, token_length=CMAX,
    hidden_dim=E, feedfwd_scale="1/4", num_layers=2, num_heads=4,
    input_dropout=0.0, layer_dropout=0.0,
    matmul_precision="highest",  # exact f32 so cached/uncached paths agree bitwise-closely
)

MODEL = PrefixedIterDecoder(cfg=BASE_CFG)

from functools import partial


@partial(jax.jit, static_argnames=("calc_loss", "calc_correct", "only_pred", "multi_first",
                                   "have_guide"))
def _apply(params, embed, target, padding, weight, guide, calc_loss=False,
           calc_correct=False, only_pred=False, multi_first=False, have_guide=False):
    return MODEL.apply({"params": params}, embed, target, padding, weight,
                       calc_loss=calc_loss, calc_correct=calc_correct, only_pred=only_pred,
                       guide_targets=guide if have_guide else None, multi_first=multi_first)


def apply_model(params, embed, target, padding=None, weight=None, guide=None, **kw):
    return _apply(params, embed, target, padding, weight, guide,
                  have_guide=guide is not None, **kw)


@pytest.fixture(scope="module")
def model_and_params():
    model = MODEL
    rng = jax.random.PRNGKey(7)
    embed = jax.random.normal(jax.random.PRNGKey(1), (2, F))
    target = jnp.zeros((2, CMAX), dtype=jnp.int32)
    params = jax.jit(model.init)({"params": rng}, embed, target)["params"]
    return model, params


def random_targets(key, B, C=CMAX, min_len=1):
    """Random compact-token targets: content tokens in [1,V), end token, padding."""
    k1, k2 = jax.random.split(key)
    lengths = jax.random.randint(k1, (B,), min_len, C - 1)
    toks = jax.random.randint(k2, (B, C), 1, V)
    pos = jnp.arange(C)[None, :]
    target = jnp.where(pos < lengths[:, None], toks, 0).astype(jnp.int32)
    padding = pos > lengths[:, None]  # end token at pos == length is not padding
    return np.asarray(target), np.asarray(padding)


def unit_embeds(key, B):
    e = jax.random.normal(key, (B, F))
    return e / jnp.linalg.norm(e, axis=1, keepdims=True)


# ---------------------------------------------------------------------------
# Forward semantics
# ---------------------------------------------------------------------------


def test_forward_shapes_and_loss(model_and_params):
    model, params = model_and_params
    B = 4
    embed = unit_embeds(jax.random.PRNGKey(2), B)
    target, padding = random_targets(jax.random.PRNGKey(3), B)
    logits, pad_out, loss_sum, loss_basis, correct = apply_model(
        params, embed, jnp.asarray(target), jnp.asarray(padding),
        calc_loss=True, calc_correct=True)
    assert logits.shape == (B, CMAX, V)
    assert pad_out.shape == (B, CMAX)
    assert float(loss_basis) == (~padding).sum()
    assert float(loss_sum) > 0
    assert correct.shape == (B, CMAX)
    # correct and padding are disjoint (ref embedding_decoder.py:137)
    assert not np.logical_and(np.asarray(correct), np.asarray(pad_out)).any()


def test_loss_sum_basis_combination(model_and_params):
    """(sum1+sum2)/(basis1+basis2) == mean loss of the concatenated batch
    (ref embedding_decoder.py:136)."""
    model, params = model_and_params
    embed = unit_embeds(jax.random.PRNGKey(4), 6)
    target, padding = random_targets(jax.random.PRNGKey(5), 6)

    def loss(e, t, p):
        _, _, s, b, _ = apply_model(params, e, jnp.asarray(t), jnp.asarray(p), calc_loss=True)
        return float(s), float(b)

    s_all, b_all = loss(embed, target, padding)
    s1, b1 = loss(embed[:2], target[:2], padding[:2])
    s2, b2 = loss(embed[2:], target[2:], padding[2:])
    assert np.isclose(s_all, s1 + s2, rtol=1e-5)
    assert b_all == b1 + b2


def test_weighted_loss(model_and_params):
    model, params = model_and_params
    embed = unit_embeds(jax.random.PRNGKey(6), 3)
    target, padding = random_targets(jax.random.PRNGKey(7), 3)
    w = jnp.asarray([1.0, 0.5, 0.0])
    _, pad_out, s_w, b_w, _ = apply_model(
        params, embed, jnp.asarray(target), jnp.asarray(padding), w, calc_loss=True)
    # Zero-weight sample fully padded in output padding
    assert np.asarray(pad_out)[2].all()
    # Manual check
    elems = []
    for i in range(3):
        _, _, s_i, b_i, _ = apply_model(
            params, embed[i:i + 1], jnp.asarray(target[i:i + 1]),
            jnp.asarray(padding[i:i + 1]), calc_loss=True)
        elems.append((float(s_i), float(b_i)))
    assert np.isclose(float(s_w), elems[0][0] + 0.5 * elems[1][0], rtol=1e-4)
    assert np.isclose(float(b_w), elems[0][1] + 0.5 * elems[1][1], rtol=1e-6)


def test_only_pred_matches_full(model_and_params):
    model, params = model_and_params
    embed = unit_embeds(jax.random.PRNGKey(8), 3)
    target, padding = random_targets(jax.random.PRNGKey(9), 3)
    full, _, _, _, _ = apply_model(params, embed, jnp.asarray(target), jnp.asarray(padding))
    only, _, _, _, _ = apply_model(params, embed, jnp.asarray(target), jnp.asarray(padding),
                                   only_pred=True)
    np.testing.assert_allclose(np.asarray(full[:, -1:, :]), np.asarray(only), rtol=1e-5, atol=1e-5)


def test_multi_target_equals_flat(model_and_params):
    """BxMxC multi-target forward == flattened BM forward with repeated embeds."""
    model, params = model_and_params
    B, M = 2, 3
    embed = unit_embeds(jax.random.PRNGKey(10), B)
    target, padding = random_targets(jax.random.PRNGKey(11), B * M)
    t3 = jnp.asarray(target).reshape(B, M, CMAX)
    p3 = jnp.asarray(padding).reshape(B, M, CMAX)
    w3 = jnp.abs(jax.random.normal(jax.random.PRNGKey(12), (B, M))) + 0.1

    logits3, pad3, s3, b3, corr3 = apply_model(
        params, embed, t3, p3, w3, calc_loss=True, calc_correct=True)
    assert logits3.shape == (B, M, CMAX, V)

    embed_flat = jnp.repeat(embed, M, axis=0)
    logits_f, pad_f, s_f, b_f, corr_f = apply_model(
        params, embed_flat, jnp.asarray(target), jnp.asarray(padding),
        w3.reshape(-1), calc_loss=True, calc_correct=True)
    np.testing.assert_allclose(np.asarray(logits3).reshape(B * M, CMAX, V),
                               np.asarray(logits_f), rtol=2e-5, atol=2e-5)
    assert np.isclose(float(s3), float(s_f), rtol=1e-5)
    assert np.isclose(float(b3), float(b_f), rtol=1e-6)


def test_multi_first_layout(model_and_params):
    model, params = model_and_params
    B, M = 2, 3
    embed = unit_embeds(jax.random.PRNGKey(13), B)
    target, padding = random_targets(jax.random.PRNGKey(14), B * M)
    t_bm = jnp.asarray(target).reshape(B, M, CMAX)
    p_bm = jnp.asarray(padding).reshape(B, M, CMAX)
    t_mb = jnp.swapaxes(t_bm, 0, 1)
    p_mb = jnp.swapaxes(p_bm, 0, 1)
    l_bm, _, s_bm, b_bm, _ = apply_model(params, embed, t_bm, p_bm, calc_loss=True)
    l_mb, _, s_mb, b_mb, _ = apply_model(params, embed, t_mb, p_mb, calc_loss=True,
                                         multi_first=True)
    np.testing.assert_allclose(np.asarray(jnp.swapaxes(l_mb, 0, 1)), np.asarray(l_bm),
                               rtol=2e-5, atol=2e-5)
    assert np.isclose(float(s_bm), float(s_mb), rtol=1e-5)


def test_expand_target_padding():
    pad = np.array([[False, False, True, True, True],
                    [True, True, True, True, True]])
    # N=1: unchanged
    out = np.asarray(expand_target_padding(jnp.asarray(pad), 4, 1))
    np.testing.assert_array_equal(out, pad)
    # N=2, P=4: padding_expand=4, padding_keep=4 → last token before padding
    # also gets loss: concat(pad[:,0:1]x4, pad[:, :4])[-5:]
    out = np.asarray(expand_target_padding(jnp.asarray(pad), 4, 2))
    expected = np.concatenate([np.repeat(pad[:, 0:1], 4, axis=1), pad[:, :4]], axis=1)[:, -5:]
    np.testing.assert_array_equal(out, expected)


def test_guide_restricted_correct(model_and_params):
    """Guide-masked argmax restricts predictions to prefix-matching guide tokens."""
    model, params = model_and_params
    guides = np.zeros((3, CMAX), dtype=np.int32)
    guides[0, :3] = [5, 6, 0]
    guides[1, :3] = [5, 7, 0]
    guides[2, :2] = [9, 0]
    embed = unit_embeds(jax.random.PRNGKey(15), 2)
    target = np.zeros((2, CMAX), dtype=np.int32)
    target[0, :3] = [5, 6, 0]
    target[1, :2] = [9, 0]
    padding = np.zeros((2, CMAX), dtype=bool)
    padding[0, 3:] = True
    padding[1, 2:] = True
    _, _, _, _, correct = apply_model(
        params, embed, jnp.asarray(target), jnp.asarray(padding),
        guide=jnp.asarray(guides), calc_correct=True)
    assert correct.shape == (2, CMAX)
    # With guides, position-0 prediction must be one of {5, 9}; correctness of
    # sample 0 position 0 then equals (pred == 5). Just sanity: no crash + disjoint.
    assert not np.logical_and(np.asarray(correct), padding).any()


# ---------------------------------------------------------------------------
# Generation
# ---------------------------------------------------------------------------


def reference_style_greedy(model, params, embed, guide_targets=None):
    """No-KV-cache greedy loop mimicking ref embedding_decoder.py:779-850, for
    equivalence testing of the cached path."""
    B = embed.shape[0]
    G = CMAX - 1
    target = np.zeros((B, G), dtype=np.int32)
    padding = np.zeros((B, G), dtype=bool)
    sample_mask = np.zeros((B,), dtype=bool)
    guide_dead = np.zeros((B, guide_targets.shape[0]), dtype=bool) if guide_targets is not None else None
    logits_all = []
    for C in range(1, G + 1):
        t_slice = jnp.asarray(target[:, :C])
        if C > 1:
            padding[:, C - 1] = sample_mask
        logits, _, _, _, _ = apply_model(params, embed, t_slice, only_pred=True)
        logits = np.asarray(logits[:, 0, :])
        logits_all.append(logits)
        if guide_targets is None:
            if C <= 1:
                tok = logits[:, 1:].argmax(axis=1) + 1
            else:
                tok = logits.argmax(axis=1)
        else:
            gcol = guide_targets[:, C - 1]
            score = np.full((B, V + 1), -1e30, dtype=np.float32)
            idx = np.where(guide_dead, V, np.broadcast_to(gcol[None, :], guide_dead.shape))
            np.maximum.at(score, (np.arange(B)[:, None], idx), 0.0)
            tok = (score[:, :V] + logits).argmax(axis=1)
            guide_dead |= tok[:, None] != gcol[None, :]
        target[:, C - 1] = tok
        sample_mask |= tok == 0
        if sample_mask.all():
            break
    target[padding] = 0
    return target, padding, np.stack(logits_all, axis=1)


def test_greedy_kv_cache_equivalence(model_and_params):
    model, params = model_and_params
    embed = unit_embeds(jax.random.PRNGKey(16), 5)
    tgt, pad, logits_nc = reference_style_greedy(model, params, embed)
    tgt_kv, pad_kv, logits_kv, _, _, _ = generate_greedy(
        model, params, embed, collect_logits=True)
    T = logits_nc.shape[1]
    np.testing.assert_array_equal(np.asarray(tgt_kv)[:, :T] * ~np.asarray(pad_kv)[:, :T],
                                  tgt * ~pad)
    # Logits match at all non-padded positions
    valid = ~pad
    np.testing.assert_allclose(np.asarray(logits_kv)[:, :T][valid], logits_nc[valid],
                               rtol=2e-4, atol=2e-4)
    # Trailing columns (if any) are all padding
    assert np.asarray(pad_kv)[:, T:].all() or T == CMAX - 1


def test_greedy_guided(model_and_params):
    model, params = model_and_params
    guides = np.zeros((4, CMAX), dtype=np.int32)
    guides[0, :3] = [5, 6, 0]
    guides[1, :4] = [5, 6, 7, 0]
    guides[2, :2] = [9, 0]
    guides[3, :3] = [11, 2, 0]
    embed = unit_embeds(jax.random.PRNGKey(17), 6)
    tgt, pad, _ = reference_style_greedy(model, params, embed, guide_targets=guides)
    tgt_kv, pad_kv, _, _, _, _ = generate_greedy(model, params, embed,
                                                 guide_targets=jnp.asarray(guides))
    T = tgt.shape[1]
    np.testing.assert_array_equal(np.asarray(tgt_kv)[:, :T], tgt)
    # Every generated sequence must be exactly a guide target (prefix-complete)
    guide_set = {tuple(g[:CMAX - 1]) for g in guides.tolist()}
    for row in np.asarray(tgt_kv).tolist():
        assert tuple(row) in guide_set


def test_greedy_scores(model_and_params):
    model, params = model_and_params
    embed = unit_embeds(jax.random.PRNGKey(18), 4)
    tgt, pad, logits, s, b, score = generate_greedy(
        model, params, embed, calc_loss=True, temperature=2.0, length_alpha=0.5)
    assert score.shape == (4,)
    assert float(b) == (~np.asarray(pad)).sum()
    # Manual score check for sample 0
    lp = jax.nn.log_softmax(np.asarray(logits[0]) / 2.0, axis=-1)
    t0 = np.asarray(tgt[0])
    p0 = np.asarray(pad[0])
    manual = sum(lp[i, t0[i]] for i in range(len(t0)) if not p0[i])
    n = max((~p0).sum(), 1)
    manual *= n ** -0.5
    assert np.isclose(float(score[0]), manual, rtol=1e-4)


def test_beam_h1_matches_greedy(model_and_params):
    model, params = model_and_params
    embed = unit_embeds(jax.random.PRNGKey(19), 5)
    tgt_g, pad_g, _, _, _, _ = generate_greedy(model, params, embed)
    tgt_b, pad_b, score_b = generate_beam(model, params, embed, topk=1)
    np.testing.assert_array_equal(np.asarray(tgt_b)[:, 0, :], np.asarray(tgt_g))
    assert score_b.shape == (5, 1)


def test_beam_descending_scores(model_and_params):
    model, params = model_and_params
    embed = unit_embeds(jax.random.PRNGKey(20), 3)
    tgt, pad, score = generate_beam(model, params, embed, topk=4)
    s = np.asarray(score)
    assert (np.diff(s, axis=1) <= 1e-6).all()
    # Beam candidates are distinct sequences per sample (generically)
    t = np.asarray(tgt)
    for b in range(t.shape[0]):
        rows = {tuple(r) for r in t[b].tolist()}
        assert len(rows) >= 2


def test_beam_guided(model_and_params):
    model, params = model_and_params
    guides = np.zeros((4, CMAX), dtype=np.int32)
    guides[0, :3] = [5, 6, 0]
    guides[1, :4] = [5, 6, 7, 0]
    guides[2, :2] = [9, 0]
    guides[3, :3] = [11, 2, 0]
    embed = unit_embeds(jax.random.PRNGKey(21), 3)
    tgt, pad, score = generate_beam(model, params, embed, topk=3,
                                    guide_targets=jnp.asarray(guides), guide_renorm=True)
    guide_set = {tuple(g[:CMAX - 1]) for g in guides.tolist()}
    t = np.asarray(tgt)
    s = np.asarray(score)
    for b in range(t.shape[0]):
        for h in range(t.shape[1]):
            if s[b, h] > -1e29:  # valid candidates only
                assert tuple(t[b, h].tolist()) in guide_set


@pytest.mark.parametrize("kw", [
    dict(topk=4),
    dict(topk=1),
    dict(topk=3, length_alpha=0.7),
    dict(topk=4, temperature=0.7),
    dict(topk=3, guided=True),
    dict(topk=4, guided=True, guide_renorm=True),
    dict(topk=3, vocab=True, vocab_scaler=0.5),
    dict(topk=3, vocab=True, vocab_scaler=0.5, vocab_per_token=True, guided=True),
    dict(topk=4, temperature=0.7, length_alpha=0.3, guided=True),
])
@pytest.mark.slow  # full-tier (pytest --full)
def test_beam_lazy_cache_equivalence(model_and_params, kw):
    """The slot-stationary (ancestry-bias) beam cache is result-identical to
    the reorder cache: same chosen tokens/paddings, scores within fp tolerance.
    The lazy path exists purely to remove the per-step cache permutation's
    HBM traffic; softmax over -inf-masked slots == softmax over the gathered
    path, so any divergence here is a bug."""
    model, params = model_and_params
    kw = dict(kw)
    guides = np.zeros((5, CMAX), dtype=np.int32)
    guides[0, :3] = [5, 6, 0]
    guides[1, :4] = [5, 6, 7, 0]
    guides[2, :2] = [9, 0]
    guides[3, :3] = [11, 2, 0]
    guides[4, :3] = [3, 3, 0]
    if kw.pop("guided", False):
        kw["guide_targets"] = jnp.asarray(guides)
    if kw.pop("vocab", False):
        kw["vocab_targets"] = jnp.asarray(guides)
    embed = unit_embeds(jax.random.PRNGKey(31), 4)
    t1, p1, s1 = generate_beam(model, params, embed, cache_mode="reorder", **kw)
    t2, p2, s2 = generate_beam(model, params, embed, cache_mode="lazy", **kw)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-4, atol=1e-4)


def _trie_fixture_targets():
    rng = np.random.default_rng(3)
    W = 17
    lengths = rng.integers(1, CMAX - 1, size=W)
    toks = rng.integers(1, V, size=(W, CMAX)).astype(np.int32)
    pos = np.arange(CMAX)[None, :]
    guide = np.where(pos < lengths[:, None], toks, 0).astype(np.int32)
    guide[5] = guide[2]  # duplicate row: counts must include it
    lengths2 = rng.integers(1, CMAX - 1, size=11)
    toks2 = rng.integers(1, V, size=(11, CMAX)).astype(np.int32)
    vocab = np.where(pos < lengths2[:, None], toks2, 0).astype(np.int32)
    return guide, vocab


def test_guide_trie_builder_matches_brute_force():
    """Trie children/counts equal brute-force prefix matching on every
    reachable prefix (incl. duplicates and dead prefixes)."""
    from novic_tpu.models.guide_trie import build_guide_trie

    guide, _ = _trie_fixture_targets()
    depth = CMAX - 1
    trie = build_guide_trie(guide, V, depth)

    def walk(prefix):
        node = 1
        for d, p in enumerate(prefix):
            ct, cid = trie["child_tok"][d][node], trie["child_id"][d][node]
            m = np.flatnonzero(ct == p)
            node = int(cid[m[0]]) if len(m) else 0
        return node

    rng = np.random.default_rng(0)
    prefixes = [[]] + [list(guide[w, :n]) for w in range(len(guide)) for n in range(1, depth)]
    prefixes += [list(rng.integers(0, V, size=n)) for n in range(1, depth) for _ in range(5)]
    for prefix in prefixes:
        d = len(prefix)
        alive = [w for w in range(len(guide))
                 if all(guide[w, i] == p for i, p in enumerate(prefix))]
        node = walk(prefix)
        if node == 0:
            assert not alive, prefix
            continue
        ct = trie["child_tok"][d][node]
        cc = trie["child_cnt"][d][node]
        got = {int(t): int(c) for t, c in zip(ct, cc) if t < V}
        want = {}
        for w in alive:
            want[int(guide[w, d])] = want.get(int(guide[w, d]), 0) + 1
        assert got == want, (prefix, got, want)
        assert int(trie["node_cnt"][d][node]) == len(alive), prefix


@pytest.mark.parametrize("kw", [
    dict(topk=4, guided=True),
    dict(topk=3, guided=True, guide_renorm=True),
    dict(topk=4, guided=True, length_alpha=0.5, temperature=0.8),
    dict(topk=3, guided=True, vocab="guide", vocab_scaler=0.4),
    dict(topk=3, guided=True, vocab="guide", vocab_scaler=0.4, vocab_per_token=True),
    dict(topk=4, guided=True, vocab="own", vocab_scaler=0.6),
    dict(topk=4, guided=True, vocab="own", vocab_scaler=0.6, vocab_per_token=True),
])
@pytest.mark.slow  # full-tier (pytest --full)
def test_beam_trie_equals_mask(model_and_params, kw):
    """Trie-node guided decoding is result-identical to the (B,H,W) alive-mask
    formulation — the alive set of a candidate IS a trie node. The trie path
    exists because the mask path's per-step W-sized scatter measured ~2.7 s/step
    at FT0 scale on chip (exp/guided_beam_bisect.py)."""
    from novic_tpu.models.guide_trie import build_guide_trie

    model, params = model_and_params
    kw = dict(kw)
    guide, vocab = _trie_fixture_targets()
    kw.pop("guided")
    kw["guide_targets"] = guide
    vmode = kw.pop("vocab", None)
    gtrie = build_guide_trie(guide, V, CMAX - 1)
    vtrie = None
    if vmode == "guide":
        kw["vocab_targets"] = guide
    elif vmode == "own":
        kw["vocab_targets"] = vocab
        vtrie = build_guide_trie(vocab, V, CMAX - 1)
    embed = unit_embeds(jax.random.PRNGKey(33), 4)
    t1, p1, s1 = generate_beam(model, params, embed, **kw)
    fn = jax.jit(lambda p, e, gt, vt: gen_mod.generate_beam(
        model, p, e, guide_trie=gt, vocab_trie=vt, **kw))
    t2, p2, s2 = fn(params, embed, gtrie, vtrie)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("renorm", [False, True])
def test_greedy_trie_equals_mask(model_and_params, renorm):
    from novic_tpu.models.guide_trie import build_guide_trie

    model, params = model_and_params
    guide, _ = _trie_fixture_targets()
    gtrie = build_guide_trie(guide, V, CMAX - 1)
    embed = unit_embeds(jax.random.PRNGKey(34), 5)
    r1 = generate_greedy(model, params, embed, calc_loss=True,
                         guide_targets=guide, guide_renorm=renorm)
    fn = jax.jit(lambda p, e, t: gen_mod.generate_greedy(
        model, p, e, calc_loss=True, guide_targets=guide, guide_renorm=renorm,
        guide_trie=t))
    r2 = fn(params, embed, gtrie)
    np.testing.assert_array_equal(np.asarray(r1[0]), np.asarray(r2[0]))
    np.testing.assert_array_equal(np.asarray(r1[1]), np.asarray(r2[1]))
    np.testing.assert_allclose(np.asarray(r1[5]), np.asarray(r2[5]), rtol=1e-5, atol=1e-5)


def test_generate_all_matches_teacher_forcing(model_and_params):
    model, params = model_and_params
    guides = np.zeros((5, CMAX), dtype=np.int32)
    guides[0, :3] = [5, 6, 0]
    guides[1, :4] = [5, 6, 7, 0]
    guides[2, :2] = [9, 0]
    guides[3, :3] = [11, 2, 0]
    guides[4, :3] = [3, 3, 0]
    embed = unit_embeds(jax.random.PRNGKey(22), 2)
    tgt, pad, scores = generate_all(model, params, embed, topk=5,
                                    guide_targets=guides, chunk=2)
    # Manual: teacher-force each guide target, sum non-padded log-probs
    C = tgt.shape[2]
    for b in range(2):
        manual = []
        for w in range(5):
            g = guides[w:w + 1, :C]
            logits, _, _, _, _ = apply_model(params, embed[b:b + 1], jnp.asarray(g))
            lp = np.asarray(jax.nn.log_softmax(logits[0], axis=-1))
            content = [i for i in range(C) if not (i > 0 and g[0, i - 1] == 0)]
            manual.append(sum(lp[i, g[0, i]] for i in content))
        manual = np.asarray(manual)
        order = np.argsort(-manual)
        got = np.asarray(scores[b])
        np.testing.assert_allclose(got, manual[order], rtol=2e-4, atol=2e-4)
        np.testing.assert_array_equal(np.asarray(tgt[b]), guides[order][:, :C])


def test_generate_all_vocab_prior_and_alpha(model_and_params):
    """Vocab-prior corrections and length-alpha scales must stay aligned with
    their targets through the length-sorted bucket processing (a misalignment
    would silently attribute one target's correction to another)."""
    model, params = model_and_params
    guides = np.zeros((6, CMAX), dtype=np.int32)
    guides[0, :3] = [5, 6, 0]
    guides[1, :4] = [5, 6, 7, 0]
    guides[2, :2] = [9, 0]
    guides[3, :3] = [11, 2, 0]
    guides[4, :5] = [3, 3, 1, 4, 0]
    guides[5, :2] = [2, 0]
    vocab = guides.copy()
    embed = unit_embeds(jax.random.PRNGKey(40), 2)
    kw = dict(topk=6, guide_targets=guides, vocab_targets=vocab, vocab_scaler=0.35,
              length_alpha=0.6, chunk=2)
    tgt, pad, scores = generate_all(model, params, embed, **kw)
    # Brute force: plain scores minus precomputed corrections, alpha-scaled
    from novic_tpu.models.generate import precompute_generate_all
    pre = precompute_generate_all(model.cfg.vocab_size, length_alpha=0.6,
                                  vocab_targets=vocab, vocab_per_token=False,
                                  vocab_scaler=0.35, guide_targets=guides,
                                  guide_renorm=False)
    C = pre.guide_targets.shape[1]
    for b in range(2):
        manual = []
        for w in range(6):
            g = guides[w:w + 1, :C]
            logits, _, _, _, _ = apply_model(params, embed[b:b + 1], jnp.asarray(g))
            lp = np.asarray(jax.nn.log_softmax(logits[0], axis=-1))
            content = [i for i in range(C) if not (i > 0 and g[0, i - 1] == 0)]
            s = sum(lp[i, g[0, i]] for i in content)
            manual.append((s - pre.vocab_scores[w]) * pre.alpha_scale[w])
        manual = np.asarray(manual)
        order = np.argsort(-manual)
        np.testing.assert_allclose(np.asarray(scores[b]), manual[order],
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_array_equal(np.asarray(tgt[b]), guides[order][:, :C])


def test_precompute_trie_matches_quadratic():
    """The O(W*C) trie-based precompute (vocab priors + renorm masks) must
    equal the reference's O(W^2) formulation (ref embedding_decoder.py:
    986-1041), including duplicate rows, dead prefixes (guide not in vocab),
    and the per-token prior variant. The quadratic oracle is built here
    explicitly."""
    from novic_tpu.models.generate import INF, NEG_INF, precompute_generate_all

    rng = np.random.default_rng(3)
    Wn, C, V = 37, 5, 13
    lengths = rng.integers(1, C, size=Wn)
    toks = rng.integers(1, V, size=(Wn, C), dtype=np.int32)
    guides = np.where(np.arange(C)[None, :] < lengths[:, None], toks, 0).astype(np.int32)
    guides[5] = guides[2]  # exact duplicate rows (count-sensitive paths)
    guides[6] = guides[2]
    # vocab = a subset + extras, so some guide prefixes are dead in the vocab
    vocab = np.concatenate([guides[::2], guides[:3]], axis=0)

    for per_token in (False, True):
        pre = precompute_generate_all(V, length_alpha=0.0, vocab_targets=vocab,
                                      vocab_per_token=per_token, vocab_scaler=0.7,
                                      guide_targets=guides, guide_renorm=True)
        gt, gp = pre.guide_targets, pre.guide_paddings
        Ct = gt.shape[1]
        vt = vocab[:, :Ct]

        # Quadratic oracle: vocab prior correction per (w, c)
        probs = np.zeros((Wn, Ct), dtype=np.float64)
        for w in range(Wn):
            alive = np.ones(len(vt), dtype=bool)
            for c in range(Ct):
                toks_c = vt[alive, c]
                tok = gt[w, c]
                if per_token:
                    uniq = np.unique(toks_c)
                    probs[w, c] = (1.0 / len(uniq)) if tok in uniq else 0.0
                else:
                    probs[w, c] = np.count_nonzero(toks_c == tok) / max(len(toks_c), 1)
                alive &= vt[:, c] == tok
        with np.errstate(divide="ignore"):
            vs = np.log(probs)
        vs[~np.isfinite(vs)] = INF
        vs[gp] = 0.0
        vs = (vs.sum(axis=1) * 0.7).astype(np.float32)
        np.testing.assert_array_equal(pre.vocab_scores, vs)

        # Quadratic oracle: renorm allowed-token masks per (w, c) vs the trie
        # node's children row
        trie = pre.renorm_trie
        for w in range(0, Wn, 5):
            alive = np.ones(Wn, dtype=bool)
            for c in range(Ct):
                expect = np.full(V, NEG_INF, dtype=np.float32)
                expect[np.unique(gt[alive, c])] = 0.0
                node = pre.guide_nodes[w, c]
                ct_row = trie["child_tok"][c][node]
                got = np.full(V + 1, NEG_INF, dtype=np.float32)
                got[ct_row[ct_row <= V]] = 0.0
                np.testing.assert_array_equal(got[:V], expect)
                alive &= gt[:, c] == gt[w, c]


def test_attn_impl_vpu_matches_einsum(model_and_params):
    """attn_impl=vpu (broadcast-reduce) is the same math as the einsum
    formulation up to f32 summation order."""
    import dataclasses

    model, params = model_and_params
    model_vpu = PrefixedIterDecoder(cfg=dataclasses.replace(BASE_CFG, attn_impl="vpu"))
    target, padding = random_targets(jax.random.PRNGKey(31), 4)
    embed = unit_embeds(jax.random.PRNGKey(32), 4)
    r1 = apply_model(params, embed, jnp.asarray(target), jnp.asarray(padding),
                     calc_loss=True)
    fn = jax.jit(lambda p, e, t, pd: model_vpu.apply(
        {"params": p}, e, t, pd, None, calc_loss=True))
    r2 = fn(params, embed, jnp.asarray(target), jnp.asarray(padding))
    np.testing.assert_allclose(np.asarray(r1[0]), np.asarray(r2[0]), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(r1[2]), float(r2[2]), rtol=1e-6)


def test_generate_all_beam_consistency(model_and_params):
    """Guided beam with renorm and generate_all agree on the best guide target."""
    model, params = model_and_params
    guides = np.zeros((4, CMAX), dtype=np.int32)
    guides[0, :3] = [5, 6, 0]
    guides[1, :4] = [5, 6, 7, 0]
    guides[2, :2] = [9, 0]
    guides[3, :3] = [11, 2, 0]
    embed = unit_embeds(jax.random.PRNGKey(23), 4)
    t_all, _, s_all = generate_all(model, params, embed, topk=4, guide_targets=guides,
                                   guide_renorm=True, chunk=4)
    t_beam, _, s_beam = generate_beam(model, params, embed, topk=4,
                                      guide_targets=jnp.asarray(guides), guide_renorm=True)
    # Top-1 of generate_all == top-1 of guided-renorm beam (beam is exact here
    # since width >= number of guides)
    G = CMAX - 1
    np.testing.assert_array_equal(np.asarray(t_all)[:, 0, :G],
                                  np.asarray(t_beam)[:, 0, :t_all.shape[2]][:, :G])


def test_generate_all_scan_slicing_invariant(model_and_params):
    """Splitting the scoring scan into multiple jitted slices (max_scan_chunks)
    must not change results — the slicing exists only to bound per-program run
    time at FT0 scale (one 3,902-step scan killed the remote TPU worker;
    BENCH_NOTES 'Round-3 soak')."""
    model, params = model_and_params
    guides = np.zeros((7, CMAX), dtype=np.int32)
    guides[0, :3] = [5, 6, 0]
    guides[1, :4] = [5, 6, 7, 0]
    guides[2, :2] = [9, 0]
    guides[3, :3] = [11, 2, 0]
    guides[4, :3] = [3, 3, 0]
    guides[5, :2] = [2, 0]
    guides[6, :4] = [9, 4, 1, 0]
    embed = unit_embeds(jax.random.PRNGKey(24), 3)
    for renorm in (False, True):
        # chunk=2 over 7 guides = 4 chunks: one slice vs four 1-chunk slices
        one = generate_all(model, params, embed, topk=5, guide_targets=guides,
                           guide_renorm=renorm, chunk=2)
        many = generate_all(model, params, embed, topk=5, guide_targets=guides,
                            guide_renorm=renorm, chunk=2, max_scan_chunks=1)
        np.testing.assert_array_equal(np.asarray(one[0]), np.asarray(many[0]))
        np.testing.assert_array_equal(np.asarray(one[1]), np.asarray(many[1]))
        np.testing.assert_allclose(np.asarray(one[2]), np.asarray(many[2]),
                                   rtol=1e-6, atol=1e-6)


def test_guide_trie_fuzz_random_sets():
    """Property fuzz over random guide-set shapes (duplicates, single rows,
    shared prefixes, trailing padding): trie children/counts match
    brute-force prefix matching, and the packed tok+id table unpacks to the
    separate tables bit-exactly at every depth."""
    from novic_tpu.models.guide_trie import build_guide_trie

    for seed in range(10):
        rng = np.random.default_rng(seed)
        V_ = int(rng.integers(4, 40))
        W = int(rng.integers(1, 60))
        C_ = int(rng.integers(2, 7))
        lengths = rng.integers(1, C_ + 1, size=W)
        gt = rng.integers(1, V_, size=(W, C_)).astype(np.int32)
        # force shared prefixes and exact duplicates into the mix
        if W > 4:
            gt[1] = gt[0]
            gt[2, :2] = gt[0, :2]
        for i, n in enumerate(lengths):
            gt[i, n - 1] = 0
            gt[i, n:] = 0
        depth = C_ - 1 if C_ > 1 else 1
        trie = build_guide_trie(gt, V_, depth)

        if trie["child_pack"] is not None:
            tok_bits = max(V_.bit_length(), 1)
            for d in range(depth):
                packed = trie["child_pack"][d]
                np.testing.assert_array_equal(packed & ((1 << tok_bits) - 1),
                                              trie["child_tok"][d])
                np.testing.assert_array_equal(packed >> tok_bits,
                                              trie["child_id"][d])

        def walk(prefix):
            node = 1
            for d, p in enumerate(prefix):
                ct, cid = trie["child_tok"][d][node], trie["child_id"][d][node]
                m = np.flatnonzero(ct == p)
                node = int(cid[m[0]]) if len(m) else 0
            return node

        prefixes = [[]] + [list(gt[w, :n]) for w in range(W)
                           for n in range(1, depth)]
        prefixes += [list(rng.integers(0, V_, size=n))
                     for n in range(1, depth) for _ in range(3)]
        for prefix in prefixes:
            d = len(prefix)
            alive = [w for w in range(W)
                     if all(gt[w, i] == p for i, p in enumerate(prefix))]
            node = walk(prefix)
            if node == 0:
                assert not alive, (seed, prefix)
                continue
            got = {int(t): int(c)
                   for t, c in zip(trie["child_tok"][d][node],
                                   trie["child_cnt"][d][node]) if t < V_}
            want = {}
            for w in alive:
                want[int(gt[w, d])] = want.get(int(gt[w, d]), 0) + 1
            assert got == want, (seed, prefix, got, want)
            assert int(trie["node_cnt"][d][node]) == len(alive), (seed, prefix)
