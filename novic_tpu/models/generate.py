"""KV-cached autoregressive generation: greedy, beam search, exhaustive scoring.

Semantic parity with the reference decode paths (reference
embedding_decoder.py: generate :779-850, generate_beam :852-984,
precompute_generate_all/generate_all :986-1079) — guide-trie masking, vocab
prior corrections, temperature/length-alpha scoring, forced end tokens for
finished candidates — but engineered for TPU:

* One ``lax.scan`` over a fixed G = Cmax-1 steps with a KV cache; the
  reference re-runs the full transformer per step and host-syncs every
  iteration for early exit (embedding_decoder.py:817,964). Fixed shapes
  compile once; finished samples are handled by masking instead of breaking.
* Guide/vocab trie masks are updated functionally inside the scan carry.
* All outputs use the padded width G; trailing all-padded columns are
  equivalent to the reference's early-exit truncation for all consumers
  (detokenize/scoring mask padded positions).

Equivalence note: the reference masks attention keys for finished samples;
because padding is always trailing under a causal mask, those masks only
affect outputs that are discarded, so the KV-cached path yields identical
chosen tokens and scores for every non-padded position.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from novic_tpu.models.layers import NEG_INF, dense, resolve_precision

INF = -NEG_INF

# Jitted-callable cache for the self-jitting paths (generate_all): a fresh
# jax.jit wrapper per call has a new identity, so every call would retrace
# AND recompile its programs — measured at ~half of a "warm" full-W
# generate_all run on one CPU core. Keys are (tag, model type, config, ...)
# so one process compiles each program shape once; jax.jit's internal cache
# handles per-shape specialization under each entry.
_JIT_CACHE: dict = {}


def _cached_jit(key, make):
    fn = _JIT_CACHE.get(key)
    if fn is None:
        fn = _JIT_CACHE[key] = make()
    return fn


def _trie_children(trie: dict, state: jnp.ndarray, Cm: int, vocab_size: int):
    """Gather a node's children (tok, id) rows — ONE table gather when the
    packed tok+id table exists (guide_trie.build_guide_trie), else two.

    The per-step guided-decode cost at B=1 is dominated by sequential
    HLO-launch latency, not arithmetic (BENCH_NOTES "Guided-decode cost
    bisection"); halving the table gathers is the consolidation that note
    names. tok_bits is recomputed statically from vocab_size (the identical
    expression the builder used), so the unpack mask constant-folds."""
    pk = trie.get("child_pack")
    if pk is not None:
        packed = pk[Cm][state]
        tok, cid = _unpack_children(packed, vocab_size)
        return tok, cid, packed
    return trie["child_tok"][Cm][state], trie["child_id"][Cm][state], None


def _unpack_children(packed: jnp.ndarray, vocab_size: int):
    tok_bits = max(int(vocab_size).bit_length(), 1)
    return packed & ((1 << tok_bits) - 1), packed >> tok_bits


def _scatter_allowed(base_shape: tuple, idx: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """-inf everywhere except 0 at positions named by idx (scatter trick,
    ref embedding_decoder.py:809,917). base_shape = (..., V+1); idx values of V
    land in the discarded overflow column."""
    base = jnp.full(base_shape, NEG_INF, dtype=dtype)
    return _scatter_max_zero(base, idx)


def _scatter_max_zero(base: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    # idx indexes the last axis; leading axes are aligned elementwise.
    if idx.ndim == 2:  # (B, W) into (B, V+1)
        b = jnp.arange(idx.shape[0])[:, None]
        return base.at[b, idx].max(0.0)
    if idx.ndim == 3:  # (B, H, W) into (B, H, V+1)
        b = jnp.arange(idx.shape[0])[:, None, None]
        h = jnp.arange(idx.shape[1])[None, :, None]
        return base.at[b, h, idx].max(0.0)
    raise ValueError(f"Unsupported idx ndim: {idx.ndim}")


def _scatter_count(base_shape: tuple, idx: jnp.ndarray, weights: Optional[jnp.ndarray] = None,
                   dtype=jnp.float32) -> jnp.ndarray:
    base = jnp.zeros(base_shape, dtype=dtype)
    src = jnp.ones(idx.shape, dtype=dtype) if weights is None else weights
    if idx.ndim == 2:
        b = jnp.arange(idx.shape[0])[:, None]
        return base.at[b, idx].add(src)
    if idx.ndim == 3:
        b = jnp.arange(idx.shape[0])[:, None, None]
        h = jnp.arange(idx.shape[1])[None, :, None]
        return base.at[b, h, idx].add(src)
    raise ValueError(f"Unsupported idx ndim: {idx.ndim}")


# ---------------------------------------------------------------------------
# Greedy generation (ref embedding_decoder.py:779-850)
# ---------------------------------------------------------------------------


def generate_greedy(
    model,
    params,
    embed: jnp.ndarray,
    *,
    collect_logits: bool = False,
    calc_loss: bool = False,
    temperature: float = 1.0,
    length_alpha: float = 0.0,
    sample_weight: Optional[jnp.ndarray] = None,
    guide_targets: Optional[jnp.ndarray] = None,
    guide_renorm: bool = False,
    guide_trie: Optional[dict] = None,
):
    """Greedy KV-cached decode. Returns
    (target BxG, target_padding BxG, seq_logits BxGxV | None, loss_sum, loss_basis, target_score).

    guide_trie: optional per-depth children tables (guide_trie.build_guide_trie)
    replacing the O(B*W)-per-step alive-mask bookkeeping with a single trie-node
    int per sample — required at large W (see generate_beam's cache_mode doc).
    """
    cfg = model.cfg
    B = embed.shape[0]
    G = cfg.token_length - 1
    V = cfg.vocab_size
    bound = model.bind({"params": params})

    k0, v0 = bound.init_cache(B)
    logits1, k0, v0 = bound.prefill(embed, k0, v0)

    have_guide = guide_targets is not None
    use_trie = have_guide and guide_trie is not None
    if use_trie:
        # state: trie node per sample (all start at the root, node 1)
        guide_state0 = jnp.ones((B,), dtype=jnp.int32)
    else:
        guide_state0 = jnp.zeros((B, guide_targets.shape[0]), dtype=bool) if have_guide else None

    def pick_token(logits, guide_state, step):
        """Choose next token per reference rules; returns (token, guide_score, new_guide_state)."""
        if use_trie:
            Cm = step - 1
            if Cm == 0:
                # Root special case: every sample is at the root at step 1,
                # so the allowed mask is ONE (V,) vector and the children row
                # is the single root row (see generate_beam).
                gct = guide_trie["child_tok"][0][1]  # (M0,)
                guide_score = jnp.broadcast_to(
                    _scatter_allowed((1, V + 1), gct[None, :])[0, :V][None, :], (B, V))
                token = jnp.argmax(guide_score + logits, axis=1).astype(jnp.int32)
                eq = gct[None, :] == token[:, None]
                new_state = jnp.where(eq.any(axis=1),
                                      guide_trie["child_id"][0][1][jnp.argmax(eq, axis=1)], 0)
            else:
                gct, cid, _ = _trie_children(guide_trie, guide_state, Cm, V)  # (B, M) each
                guide_score = _scatter_allowed((B, V + 1), gct)[:, :V]
                token = jnp.argmax(guide_score + logits, axis=1).astype(jnp.int32)
                eq = gct == token[:, None]
                new_state = jnp.where(eq.any(axis=1),
                                      jnp.take_along_axis(cid, jnp.argmax(eq, axis=1)[:, None],
                                                          axis=1)[:, 0], 0)
        elif have_guide:
            gcol = guide_targets[:, step - 1]  # (W,)
            idx = jnp.where(guide_state, V, jnp.broadcast_to(gcol[None, :], guide_state.shape))
            guide_score = _scatter_allowed((B, V + 1), idx)[:, :V]
            scored = guide_score + logits
            token = jnp.argmax(scored, axis=1).astype(jnp.int32)
            new_state = guide_state | jnp.not_equal(token[:, None], gcol[None, :])
        else:
            guide_score = jnp.zeros((B, V), dtype=logits.dtype)
            # Disallow end token at the very first step (ref :804)
            masked = jnp.where((jnp.arange(V)[None, :] == 0) & (step == 1), NEG_INF, logits)
            token = jnp.argmax(masked, axis=1).astype(jnp.int32)
            new_state = None
        return token, guide_score, new_state

    # Python loop = the round-2 scan(unroll=True) lowering (straight-line HLO,
    # XLA aliases the cache carries), but steps are static so the per-depth
    # trie tables (different shapes per depth) index naturally.
    logits, sample_mask, guide_state, k, v = (
        logits1, jnp.zeros((B,), dtype=bool), guide_state0, k0, v0)
    seq_logits_l, tokens_l, paddings_l, guide_scores_l = [], [], [], []
    for step in range(1, G + 1):
        token, guide_score, guide_state = pick_token(logits, guide_state, step)
        seq_logits_l.append(logits)
        tokens_l.append(token)
        paddings_l.append(sample_mask)  # padding at position step-1 = finished before this step
        guide_scores_l.append(guide_score)
        sample_mask = sample_mask | (token == 0)
        logits, k, v = bound.decode_step(token, step, k, v)

    target = jnp.stack(tokens_l, axis=1)            # BxG
    target_padding = jnp.stack(paddings_l, axis=1)  # BxG
    seq_logits_b = jnp.stack(seq_logits_l, axis=1)  # BxGxV
    guide_scores = jnp.stack(guide_scores_l, axis=0)  # GxBxV (as the scan emitted)
    target = jnp.where(target_padding, 0, target)

    loss_sum = loss_basis = target_score = None
    if calc_loss:
        score_logits = seq_logits_b / temperature
        if have_guide and guide_renorm:
            score_logits = score_logits + jnp.transpose(guide_scores, (1, 0, 2))
        logp = jax.nn.log_softmax(score_logits, axis=2)
        target_score = jnp.take_along_axis(logp, target[:, :, None].astype(jnp.int32), axis=2)[:, :, 0]
        target_score = jnp.where(target_padding, 0.0, target_score).sum(axis=1)
        if length_alpha != 0:
            n = jnp.maximum((G - target_padding.sum(axis=1)).astype(target_score.dtype), 1.0)
            target_score = target_score * jnp.power(n, -length_alpha)

        from novic_tpu.models.prefixed_iter import cross_entropy_elems
        loss_target = jnp.where(target_padding, -1, target)
        elems = cross_entropy_elems(seq_logits_b, loss_target, cfg.label_smoothing)
        if sample_weight is None:
            loss_sum = elems.sum()
            loss_basis = (target_padding.size - target_padding.sum()).astype(embed.dtype)
        else:
            loss_sum = jnp.dot(sample_weight, elems.sum(axis=1))
            loss_basis = jnp.dot(sample_weight,
                                 (G - target_padding.sum(axis=1)).astype(sample_weight.dtype))

    return (target, target_padding, seq_logits_b if (collect_logits or calc_loss) else None,
            loss_sum, loss_basis, target_score)


# ---------------------------------------------------------------------------
# Beam search (ref embedding_decoder.py:852-984)
# ---------------------------------------------------------------------------


def generate_beam(
    model,
    params,
    embed: jnp.ndarray,
    *,
    topk: int,
    temperature: float = 1.0,
    length_alpha: float = 0.0,
    vocab_targets: Optional[jnp.ndarray] = None,
    vocab_per_token: bool = False,
    vocab_scaler: float = 0.0,
    guide_targets: Optional[jnp.ndarray] = None,
    guide_renorm: bool = False,
    cache_mode: str = "auto",
    guide_trie: Optional[dict] = None,
    vocab_trie: Optional[dict] = None,
):
    """Batched KV-cached beam search. Returns (target BxHxG, padding BxHxG, scores BxH),
    descending score order per sample.

    cache_mode selects how candidate reordering reaches the KV caches:

    * ``"lazy"`` — token caches are slot-stationary; attention selects each
      candidate's history via an additive ancestry bias over all H*G slots
      (TransformerLayer.step_lazy). Moves ~3x less HBM data per step than
      reordering the caches; identical math (softmax over -inf-masked slots
      == softmax over the gathered path).
    * ``"reorder"`` — per-step one-hot-matmul permutation of the token caches
      (the round-2 design; kept for differential testing).
    * ``"auto"`` — the measured-fastest mode (lazy).

    guide_trie / vocab_trie: optional per-depth children tables
    (guide_trie.build_guide_trie over the same target rows). With a trie the
    per-candidate alive-set state is ONE trie-node int instead of a (B,H,W)
    mask, and the per-step allowed-token scatter runs over the node's M_d
    children instead of all W rows — identical semantics (the alive set IS a
    trie node), but W-independent per-step cost. At FT0 scale (W=42,919) the
    mask formulation measured ~2.7 s/step on chip (exp/guided_beam_bisect.py);
    the trie is the difference between guided beam being unusable and ~free.
    Pass tries as jit ARGUMENTS (device arrays), not closures.
    """
    cfg = model.cfg
    B = embed.shape[0]
    H = topk
    G = cfg.token_length - 1
    V = cfg.vocab_size
    bound = model.bind({"params": params})
    if cache_mode == "auto":
        cache_mode = "lazy"
    if cache_mode not in ("lazy", "reorder"):
        raise ValueError(f"Unsupported beam cache_mode: {cache_mode}")
    lazy = cache_mode == "lazy"

    have_guide = guide_targets is not None
    use_vocab = vocab_targets is not None and vocab_scaler != 0
    vocab_is_guide = False
    if use_vocab and have_guide:
        if vocab_targets is guide_targets:
            vocab_is_guide = True
        elif isinstance(vocab_targets, np.ndarray) and isinstance(guide_targets, np.ndarray):
            vocab_is_guide = (vocab_targets.shape == guide_targets.shape
                              and np.array_equal(vocab_targets, guide_targets))
    W = guide_targets.shape[0] if have_guide else 0
    Z = vocab_targets.shape[0] if use_vocab else 0
    use_alpha = length_alpha != 0
    g_trie = guide_trie if have_guide else None
    v_trie = vocab_trie if (use_vocab and not vocab_is_guide) else None
    if g_trie is not None and len(g_trie["child_tok"]) < G:
        raise ValueError(f"guide_trie depth {len(g_trie['child_tok'])} < decode steps {G}")
    if v_trie is not None and len(v_trie["child_tok"]) < G:
        raise ValueError(f"vocab_trie depth {len(v_trie['child_tok'])} < decode steps {G}")

    # Split KV caches: the P prefix slots are identical across a sample's H
    # candidates, so they are prefilled once at B rows and shared (never
    # gathered); only the G token slots live at B*H rows and get reordered.
    # This cuts prefill compute H-fold and removes 100% of the prefix-slot
    # gather traffic vs a monolithic (B*H, P+G) cache.
    logits1_base, pk, pv = bound.prefill_split(embed)  # caches (B,P,heads,hd)
    tk0, tv0 = bound.init_token_cache(B * H)           # (B*H,G,heads,hd)
    logits1 = jnp.broadcast_to(logits1_base[:, None, :], (B, H, V))
    # Lazy cache: anc[b,c,g] = candidate-slot row holding candidate c's token
    # from step g+1 (-1 = not yet generated).
    anc0 = jnp.full((B, H, G), -1, dtype=jnp.int32) if lazy else None

    target = jnp.zeros((B, H, G), dtype=jnp.int32)
    padding = jnp.ones((B, H, G), dtype=bool).at[:, 0, 0].set(False)
    score = jnp.full((B, H), NEG_INF).at[:, 0].set(0.0)
    # Guide/vocab alive-set state: with a trie, one node int per candidate
    # (root = node 1, slot 0 only — slots 1..H-1 start dead = node 0); the
    # mask fallback carries the full (B,H,W) row mask.
    if g_trie is not None:
        guide_state = jnp.zeros((B, H), dtype=jnp.int32).at[:, 0].set(1)
    else:
        guide_state = (jnp.ones((B, H, W), dtype=bool).at[:, 0, :].set(False)) if have_guide else None
    if use_vocab and not vocab_is_guide:
        if v_trie is not None:
            vocab_state = jnp.zeros((B, H), dtype=jnp.int32).at[:, 0].set(1)
        else:
            vocab_state = jnp.ones((B, H, Z), dtype=bool).at[:, 0, :].set(False)
    else:
        vocab_state = None
    seq_len = jnp.zeros((B, H)).at[:, 0].set(1.0) if use_alpha else None
    logits_raw = logits1
    anc = anc0
    k, v = tk0, tv0

    def gather_h(x, cand):
        """Gather along the candidate (H) axis: x (B,H,...) by cand (B,H)."""
        b = jnp.arange(B)[:, None]
        return x[b, cand]

    def trie_rows(trie, state, Cm):
        """Gather a node's children: (tok, id, cnt, node_cnt, packed). tok/id
        come from ONE packed-table gather when available (_trie_children);
        cnt/node_cnt gathers are DCE'd by XLA unless vocab priors use them."""
        ct, cid, packed = _trie_children(trie, state, Cm, V)
        return (ct, cid, trie["child_cnt"][Cm][state], trie["node_cnt"][Cm][state], packed)

    def trie_advance(ct, cid, cand, tok, packed=None):
        """New node after candidate reorder + emitting tok (dead node 0 if no
        child). With a packed row the candidate reorder is ONE gather."""
        if packed is not None:
            ct_g, cid_g = _unpack_children(gather_h(packed, cand), V)
        else:
            ct_g = gather_h(ct, cand)
            cid_g = gather_h(cid, cand)
        eq = ct_g == tok[:, :, None]
        child = jnp.take_along_axis(cid_g, jnp.argmax(eq, axis=2)[:, :, None], axis=2)[:, :, 0]
        return jnp.where(eq.any(axis=2), child, 0)

    def trie_advance_root(trie, state, cand, tok):
        """Step-1 advance: parents are root (node 1) or dead, so the children
        row is the single root row — no per-candidate table gather."""
        r_ct = trie["child_tok"][0][1]
        r_cid = trie["child_id"][0][1]
        eq = r_ct[None, None, :] == tok[:, :, None]
        child = r_cid[jnp.argmax(eq, axis=2)]
        parent_root = gather_h(state, cand) == 1
        return jnp.where(parent_root & eq.any(axis=2), child, 0)

    # Python loop = scan(unroll=True) lowering (straight-line HLO; XLA aliases
    # the cache carries) with static steps so the per-depth trie tables
    # (different shapes per depth) index naturally.
    for step in range(1, G + 1):
        Cm = step - 1

        finished = padding[:, :, Cm]  # (B,H): padding at pos C-1
        logits = logits_raw / temperature
        # Force finished candidates to predict end with score 0 (ref :913)
        col_is_end = (jnp.arange(V)[None, None, :] == 0)
        logits = jnp.where(~col_is_end & finished[:, :, None], NEG_INF, logits)

        guide_score = None
        guide_idx = None
        g_ct = g_cid = g_cnt = g_ncnt = g_pk = None
        if g_trie is not None:
            if Cm == 0:
                # Root special case: at step 1 every candidate is at the root
                # (slot 0) or dead, so the allowed mask is ONE (V,) vector —
                # skipping the (B,H,M0)-wide gather+scatter (M0 = root children
                # can approach V; this step dominated the trie path's cost).
                root_ct = g_trie["child_tok"][0][1]
                root_allowed = _scatter_allowed((1, V + 1), root_ct[None, :])[0, :V]
                slot0 = (jnp.arange(H) == 0)[None, :, None]
                guide_score = jnp.where(slot0, root_allowed[None, None, :], NEG_INF)
            else:
                g_ct, g_cid, g_cnt, g_ncnt, g_pk = trie_rows(g_trie, guide_state, Cm)
                guide_score = _scatter_allowed((B, H, V + 1), g_ct)[:, :, :V]
            guide_score = jnp.where(col_is_end & finished[:, :, None], 0.0, guide_score)  # ref :918
            if guide_renorm:
                logits = logits + guide_score
        elif have_guide:
            gcol = guide_targets[:, Cm]  # (W,)
            guide_idx = jnp.where(guide_state, V, jnp.broadcast_to(gcol[None, None, :], (B, H, W)))
            guide_score = _scatter_allowed((B, H, V + 1), guide_idx)[:, :, :V]
            guide_score = jnp.where(col_is_end & finished[:, :, None], 0.0, guide_score)  # ref :918
            if guide_renorm:
                logits = logits + guide_score

        scores = jax.nn.log_softmax(logits, axis=2)

        v_ct = v_cid = v_pk = None
        if use_vocab:
            # Counts of alive vocab rows per token / total alive rows. Trie:
            # children carry exact row counts (duplicates included), so the
            # scatter runs over M_d children instead of Z rows; the root step
            # computes one (V,) vector (all candidates at root or dead).
            t_trie = g_trie if (vocab_is_guide and g_trie is not None) else v_trie
            if t_trie is not None and Cm == 0:
                r_ct = t_trie["child_tok"][0][1]
                r_cnt = t_trie["child_cnt"][0][1]
                r_n = t_trie["node_cnt"][0][1]
                if vocab_per_token:
                    present = jnp.minimum(
                        _scatter_count((1, V + 1), r_ct[None, :]), 1.0)[0, :V]
                    root_vp = present / jnp.maximum(present.sum(), 1e-30)
                else:
                    counts = _scatter_count((1, V + 1), r_ct[None, :],
                                            weights=r_cnt[None, :].astype(jnp.float32))[0, :V]
                    root_vp = counts / jnp.maximum(r_n.astype(jnp.float32), 1e-30)
                slot0 = (jnp.arange(H) == 0)[None, :, None]
                # Dead slots: 0 probability, matching the mask path's all-dead rows
                vocab_probs = jnp.where(slot0, root_vp[None, None, :], 0.0)
            else:
                if vocab_is_guide and g_trie is not None:
                    cnt_idx, cnt_w, nz_cnt = g_ct, g_cnt, g_ncnt
                elif v_trie is not None:
                    v_ct, v_cid, v_cnt, v_ncnt, v_pk = trie_rows(v_trie, vocab_state, Cm)
                    cnt_idx, cnt_w, nz_cnt = v_ct, v_cnt, v_ncnt
                else:
                    if vocab_is_guide:
                        vocab_idx = guide_idx
                    else:
                        zcol = vocab_targets[:, Cm]
                        vocab_idx = jnp.where(vocab_state, V,
                                              jnp.broadcast_to(zcol[None, None, :], (B, H, Z)))
                    cnt_idx, cnt_w, nz_cnt = vocab_idx, None, None
                if vocab_per_token:
                    present = jnp.minimum(_scatter_count((B, H, V + 1), cnt_idx), 1.0)[:, :, :V]
                    vocab_probs = present / jnp.maximum(present.sum(axis=2, keepdims=True), 1e-30)
                else:
                    if cnt_w is not None:  # trie path: weighted by child row counts
                        counts = _scatter_count((B, H, V + 1), cnt_idx,
                                                weights=cnt_w.astype(jnp.float32))
                        nz = nz_cnt[:, :, None].astype(jnp.float32)
                    else:
                        counts = _scatter_count((B, H, V + 1), cnt_idx)
                        invalid = counts[:, :, V:]
                        nz = cnt_idx.shape[2] - invalid
                    vocab_probs = counts[:, :, :V] / jnp.maximum(nz, 1e-30)
            vocab_probs = jnp.log(vocab_probs)
            vocab_probs = jnp.where(jnp.isfinite(vocab_probs), vocab_probs, INF)  # ref :934
            vocab_probs = jnp.where(col_is_end & finished[:, :, None], 0.0, vocab_probs)
            scores = scores - vocab_scaler * vocab_probs

        scores = scores + score[:, :, None]
        if step == 1:  # disallow end as first generated token (ref :939-940)
            first_mask = col_is_end & (jnp.arange(H)[None, :, None] == 0)
            scores = jnp.where(first_mask, NEG_INF, scores)

        if have_guide and not guide_renorm:
            scores = scores + guide_score

        flat = scores.reshape(B, H * V)
        if use_alpha:
            scale = jnp.power(jnp.maximum(seq_len, 1.0), -length_alpha)  # (B,H)
            flat_normed = (scores * scale[:, :, None]).reshape(B, H * V)
            new_score_normed, top_idx = jax.lax.top_k(flat_normed, H)
            new_score = jnp.take_along_axis(flat, top_idx, axis=1)
        else:
            new_score, top_idx = jax.lax.top_k(flat, H)
            new_score_normed = None

        cand = (top_idx // V).astype(jnp.int32)  # (B,H)
        tok = (top_idx % V).astype(jnp.int32)    # (B,H)

        target = gather_h(target, cand).at[:, :, Cm].set(tok)
        padding = gather_h(padding, cand)

        new_finished = (tok == 0) | padding[:, :, Cm]
        # Write finished flag at position C (next step's padding), if within range
        if step < G:
            padding = padding.at[:, :, step].set(new_finished)

        if g_trie is not None:
            guide_state = (trie_advance_root(g_trie, guide_state, cand, tok) if Cm == 0
                           else trie_advance(g_ct, g_cid, cand, tok, packed=g_pk))
        elif have_guide:
            gcol = guide_targets[:, Cm]
            guide_state = gather_h(guide_state, cand) | jnp.not_equal(tok[:, :, None], gcol[None, None, :])
        if vocab_state is not None:
            if v_trie is not None:
                vocab_state = (trie_advance_root(v_trie, vocab_state, cand, tok) if Cm == 0
                               else trie_advance(v_ct, v_cid, cand, tok, packed=v_pk))
            else:
                zcol = vocab_targets[:, Cm]
                vocab_state = gather_h(vocab_state, cand) | jnp.not_equal(tok[:, :, None], zcol[None, None, :])
        if use_alpha:
            seq_len = gather_h(seq_len, cand) + (~new_finished).astype(seq_len.dtype)

        if lazy:
            # Slot-stationary caches: thread the ancestry through the gather
            # instead of the (B*H, G, heads, hd) caches themselves, and let
            # attention select each candidate's history with an additive bias
            # (see TransformerLayer.step_lazy). anc is (B,H,G) int32 vs the
            # caches' 2L*(B*H,G,heads,hd) — ~4000x less reorder traffic.
            anc = gather_h(anc, cand).at[:, :, Cm].set(
                jnp.broadcast_to(jnp.arange(H, dtype=jnp.int32)[None, :], (B, H)))
            allowed = anc[:, :, None, :] == jnp.arange(H, dtype=jnp.int32)[None, None, :, None]
            anc_bias = jnp.where(allowed.reshape(B, H, 1, H * G), 0.0, NEG_INF)  # (B,c,1,r*G+g)
            logits_next, k, v = bound.decode_step_lazy(tok.reshape(-1), step, pk, pv, k, v, anc_bias)
        else:
            # Reorder the token-slot KV caches by candidate, then run one decode
            # step against the shared (un-gathered) prefix caches. The reorder is a
            # one-hot batched matmul, NOT a gather: XLA's TPU gather kernel measured
            # 109 ms of a 135 ms beam batch (31 GB/s effective), while the matmul
            # permutation runs at bandwidth (exact: one unit coefficient per row).
            onehot = jax.nn.one_hot(cand, H, dtype=k[0].dtype)  # (B, Hout, Hin)

            def reorder(x):
                xr = x.reshape(B, H, -1)
                out = jnp.einsum("bij,bjf->bif", onehot, xr,
                                 preferred_element_type=xr.dtype)
                return out.reshape(x.shape)

            k = [reorder(kc) for kc in k]
            v = [reorder(vc) for vc in v]
            logits_next, k, v = bound.decode_step_split(tok.reshape(-1), step, pk, pv, k, v)
        logits_raw = logits_next.reshape(B, H, V)
        # NB: raw (unnormalized) cumulative score carries forward; the
        # alpha-normalized score is what the final step reports.
        score = new_score

    target = jnp.where(padding, 0, target)
    final_score = new_score_normed if use_alpha else score
    return target, padding, final_score


# ---------------------------------------------------------------------------
# Exhaustive guided scoring (ref embedding_decoder.py:986-1079)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class GenerateAllPrecompute:
    guide_targets: np.ndarray       # WxC trimmed, padding zeroed
    guide_paddings: np.ndarray      # WxC bool
    renorm_trie: Optional[dict]     # guide-trie children tables (renorm masks) or None
    guide_nodes: Optional[np.ndarray]   # (W, C) trie node of each prefix (renorm only)
    vocab_scores: Optional[np.ndarray]  # (W,) prior correction per guide target
    alpha_scale: Optional[np.ndarray]   # (W,) length normalization
    # Device-resident renorm tables, populated lazily by generate_all so the
    # multi-MB upload happens once per precompute, not once per call
    _renorm_trie_device: Optional[dict] = dataclasses.field(
        default=None, repr=False, compare=False)


def _trie_walk(trie: dict, tokens: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Walk a guide_trie with (W, C) token rows (vectorized over W).

    Returns (nodes (W,C), match_cnt (W,C), node_cnt (W,C), n_children (W,C)):
    nodes[w,c] = trie node of prefix tokens[w,:c] (0 = dead); match_cnt[w,c] =
    rows under the child matching tokens[w,c] (0 if none/dead); node_cnt[w,c]
    = rows under the node; n_children[w,c] = number of distinct next tokens.
    """
    W, C = tokens.shape
    nodes = np.zeros((W, C), dtype=np.int32)
    match_cnt = np.zeros((W, C), dtype=np.int64)
    node_cnt = np.zeros((W, C), dtype=np.int64)
    n_children = np.zeros((W, C), dtype=np.int64)
    node = np.ones((W,), dtype=np.int64)  # root
    for c in range(C):
        nodes[:, c] = node
        ct = trie["child_tok"][c][node]    # (W, M_c)
        cid = trie["child_id"][c][node]
        cct = trie["child_cnt"][c][node]
        eq = ct == tokens[:, c][:, None]
        hit = eq.any(axis=1)
        idx = np.argmax(eq, axis=1)
        aw = np.arange(W)
        match_cnt[:, c] = np.where(hit, cct[aw, idx], 0)
        node_cnt[:, c] = trie["node_cnt"][c][node]
        n_children[:, c] = (cid != 0).sum(axis=1)
        node = np.where(hit, cid[aw, idx], 0).astype(np.int64)
    return nodes, match_cnt, node_cnt, n_children


def precompute_generate_all(
    vocab_size: int,
    *,
    length_alpha: float,
    vocab_targets: Optional[np.ndarray],
    vocab_per_token: bool,
    vocab_scaler: float,
    guide_targets: np.ndarray,
    guide_renorm: bool,
) -> GenerateAllPrecompute:
    """Host-side precomputation of guide paddings, renorm trie tables, vocab
    prior corrections and alpha scales (ref embedding_decoder.py:986-1041).

    The reference materializes a (W, C, W) prefix-alive mask for renorm and
    walks a W x C python loop over (Z,) alive sets for vocab priors — O(W^2)
    in memory/time, infeasible at FT0 scale (42,919 targets => a 16.6T-element
    mask). The alive set of a prefix is a node of the guide/vocab trie
    (guide_trie.py), so both reduce to O(W*C): renorm masks become per-chunk
    scatters of the node's children row (built on device inside the scoring
    scan), and vocab priors are exact alive-row counts read off a vectorized
    trie walk. Numerics are identical — counts are duplicate-exact and the
    prob/log/sum arithmetic matches the reference formulas elementwise
    (pinned by tests/test_decoder.py test_precompute_trie_matches_quadratic).
    """
    guide_targets = np.asarray(guide_targets)
    W, Cmax = guide_targets.shape
    V = vocab_size

    guide_paddings = np.zeros((W, Cmax), dtype=bool)
    guide_paddings[:, 1:] = np.logical_not(guide_targets[:, :-1])
    guide_paddings[:, 1:] = np.maximum.accumulate(guide_paddings[:, 1:], axis=1)

    C = Cmax - int(guide_paddings.all(axis=0).sum())
    guide_paddings = guide_paddings[:, :C]
    guide_targets = np.where(guide_paddings, 0, guide_targets[:, :C]).astype(np.int32)

    from novic_tpu.models.guide_trie import build_guide_trie

    if guide_renorm:
        renorm_trie = build_guide_trie(guide_targets, V, C)
        guide_nodes, _, _, _ = _trie_walk(renorm_trie, guide_targets)
        # Every guide prefix is alive in its own trie by construction
        assert (guide_nodes[:, 1:] > 0).all() if C > 1 else True
    else:
        renorm_trie = None
        guide_nodes = None

    if vocab_targets is None or vocab_scaler == 0:
        vocab_scores = None
    else:
        vocab_targets = np.asarray(vocab_targets)[:, :C]
        v_trie = build_guide_trie(vocab_targets, V, C)
        _, match_cnt, node_cnt, n_children = _trie_walk(v_trie, guide_targets)
        # Reference formulas (ref embedding_decoder.py:1018-1041): per-target
        # prior = |alive rows with this token| / |alive rows|; per-token prior
        # = 1/|distinct next tokens| if this token continues some alive row.
        if vocab_per_token:
            probs = np.where(match_cnt > 0, 1.0 / np.maximum(n_children, 1), 0.0)
        else:
            probs = match_cnt / np.maximum(node_cnt, 1).astype(np.float64)
        with np.errstate(divide="ignore"):
            vocab_scores = np.log(probs)
        vocab_scores[~np.isfinite(vocab_scores)] = INF
        vocab_scores[guide_paddings] = 0.0
        vocab_scores = (vocab_scores.sum(axis=1) * vocab_scaler).astype(np.float32)

    if length_alpha == 0:
        alpha_scale = None
    else:
        n = np.maximum(C - guide_paddings.sum(axis=1), 1)
        alpha_scale = np.power(n.astype(np.float32), -length_alpha)

    return GenerateAllPrecompute(guide_targets=guide_targets,
                                 guide_paddings=guide_paddings,
                                 renorm_trie=renorm_trie,
                                 guide_nodes=guide_nodes,
                                 vocab_scores=vocab_scores,
                                 alpha_scale=alpha_scale)


def generate_all(
    model,
    params,
    embed: jnp.ndarray,
    *,
    topk: int,
    temperature: float = 1.0,
    length_alpha: float = 0.0,
    vocab_targets: Optional[np.ndarray] = None,
    vocab_per_token: bool = False,
    vocab_scaler: float = 0.0,
    guide_targets: Optional[np.ndarray] = None,
    guide_renorm: bool = False,
    precompute: Optional[GenerateAllPrecompute] = None,
    chunk: Optional[int] = None,
    max_scan_chunks: int = 256,
):
    """Teacher-force every guide target and return the per-sample top-k
    (ref embedding_decoder.py:1043-1079). Returns (targets BxKxC, paddings BxKxC, scores BxK).

    TPU-first structure (the reference — and this repo through round 3 —
    re-forwards the full sequence per scored chunk; the round-3 bisection
    exp/all_bisect*.py showed that costs 50.5 ms per 10-target chunk at FT0
    scale, 45.6 ms of it the transformer):

    * The P prefix positions are identical for every scored target of an
      image, so they are prefilled ONCE per call (prefill_split) and the
      per-chunk forward is a prefix-cached ``score_hidden`` over only the
      target's content tokens (broadcast-reduce attention — see
      TransformerLayer.extend).
    * Position-0 scores come straight from the prefill logits: ONE
      (B,V) log-softmax serves all W targets via a gather.
    * Targets are processed in per-length buckets (descending), so a
      length-n target pays for n positions, not Cmax (~25-30% of all
      positions at FT0 are padding).
    * Per-position streamed scoring (logit-at-token minus logsumexp, one
      position at a time) keeps the peak extra at (chunk*B, V) instead of
      the (chunk*B, C, V) materialized-logits tensor, letting the chunk be
      ~8x larger (fewer, better-amortized scan steps).

    Scores are bit-identical math to the reference semantics; only fp
    summation order differs. Ties between exactly-duplicated guide targets
    may resolve to a different (equal-scoring, equal-string) row than the
    reference's lowest-index rule because rows are scored in length-sorted
    order.
    """
    cfg = model.cfg
    if precompute is None:
        precompute = precompute_generate_all(
            cfg.vocab_size, length_alpha=length_alpha, vocab_targets=vocab_targets,
            vocab_per_token=vocab_per_token, vocab_scaler=vocab_scaler,
            guide_targets=np.asarray(guide_targets), guide_renorm=guide_renorm)

    gt = precompute.guide_targets
    gp = precompute.guide_paddings
    W, C = gt.shape
    B = embed.shape[0]
    K = topk
    V = cfg.vocab_size

    # Prefill the shared prefix once per call. params/embed are jit
    # ARGUMENTS, not closures: a closure would inline the 51 MB decoder as
    # HLO constants into the remote (axon) compile request. Jitted callables
    # are cached at module level keyed by config — a fresh jax.jit wrapper
    # per call would RETRACE+RECOMPILE every call (measured as ~half of a
    # "warm" full-W run; the per-shape compile must happen once per process).
    prefill_fn = _cached_jit(
        ("prefill", type(model).__name__, cfg),
        lambda: jax.jit(lambda p, e: model.apply({"params": p}, e, method="prefill_split")),
    )
    logits1, pk, pv = prefill_fn(params, embed)  # (B,V), [(B,P,H,hd)]*L

    if chunk is None:
        # Target ~1k rows (chunk*B) per scan step: the measured per-row cost
        # RISES with the step's working set — 2.2 us/row-position at 1-2k
        # rows vs 2.9 at 4k and 4.1 at 32k (exp: chunk/batch probe, round 3;
        # XLA's fusion windows stop covering the (rows,V) logits slab and the
        # extend intermediates past a few MB) — so small steps win ~1.9x over
        # budget-sized ones. The scan amortizes per-step overhead either way.
        chunk = max(min(1024 // max(B, 1), 64), 1)

    # Length-bucketed processing over length-sorted rows (stable sort keeps
    # the reference's lowest-index tie-break within a bucket).
    n_pos = (C - gp.sum(axis=1)).astype(np.int64)  # scored positions per target, >= 1
    order = np.argsort(-n_pos, kind="stable")
    gt_s = gt[order]
    gp_s = gp[order]
    n_s = n_pos[order]
    gn_s = precompute.guide_nodes[order] if precompute.guide_nodes is not None else None
    vs_s = precompute.vocab_scores[order] if precompute.vocab_scores is not None else None
    as_s = precompute.alpha_scale[order] if precompute.alpha_scale is not None else None

    # Bucket boundaries over the descending-sorted lengths
    bounds = list(np.flatnonzero(np.diff(n_s)) + 1) if W > 1 else []
    starts = [0] + bounds
    ends = bounds + [W]

    renorm = gn_s is not None
    # Renorm mask tables ride as jit ARGUMENTS (device arrays), like the
    # beam/greedy tries — closure constants would inline them into the
    # remote compile request (~MBs at FT0 scale). Only the four base tables
    # upload: the scoring scan reads child_tok alone, and pinning the pytree
    # to the base keys keeps freshly-built tries (which carry child_pack)
    # structurally identical to store-loaded ones (which don't) — one jit
    # structure either way.
    if renorm:
        rt_d = precompute._renorm_trie_device
        if rt_d is None:
            rt_d = precompute._renorm_trie_device = jax.device_put(
                {k: precompute.renorm_trie[k]
                 for k in ("child_tok", "child_id", "child_cnt", "node_cnt")})
    else:
        rt_d = None

    def scan_slice(p, pk, pv, rt, *xs):
        T = xs[0].shape[2] - 1       # tokens fed per target (length - 1)
        Bb = pk[0].shape[0]          # batch from the prefix cache, NOT closure
        # (the jitted callable is cached per config and reused across calls)

        def score_chunk(carry, inputs):
            if renorm:
                g_tok, g_nodes = inputs
            else:
                (g_tok,) = inputs
            ch = g_tok.shape[0]
            # Rows are base-sample-major (row = b*ch + g), matching
            # score_hidden/extend's (Bb, R) layout — under a data mesh the
            # sharded batch axis stays the major dim.
            tok_in = jnp.tile(g_tok[:, :T], (Bb, 1))  # (Bb*ch, T)
            h = model.apply({"params": p}, tok_in, pk, pv, method="score_hidden")
            w = p["logits_weight"]
            b_ = p.get("logits_bias")
            prec = resolve_precision(cfg.matmul_precision)
            acc = jnp.zeros((Bb * ch,), jnp.float32)
            for c in range(T):  # scored positions 1..T; position 0 is shared
                lg = dense(h[:, c, :], w, b_, precision=prec)[:, :V] / temperature
                if renorm:
                    # Allowed-token mask of this prefix's trie node at depth
                    # c+1: the children row replaces the reference's
                    # precomputed (W, C, V) score tensor (34 GB at FT0)
                    gct = rt["child_tok"][c + 1][g_nodes[:, c + 1]]  # (ch, M)
                    allowed = _scatter_allowed((ch, V + 1), gct)[:, :V]
                    lg = lg + jnp.tile(allowed, (Bb, 1))
                tok_c = jnp.tile(g_tok[:, c + 1], (Bb,))
                at = jnp.take_along_axis(lg, tok_c[:, None], axis=1)[:, 0]
                acc = acc + at - jax.scipy.special.logsumexp(lg, axis=1)
            return carry, acc.reshape(Bb, ch)

        return jax.lax.scan(score_chunk, None, xs)[1]  # (scan_len, B, chunk)

    # Per-bucket scans; each bucket padded to a whole number of chunks and
    # sliced into <=max_scan_chunks-step programs (one unbounded scan at FT0
    # scale reliably killed the remote TPU worker; exp/soak_r03.py round 3).
    gt_parts, gp_parts, valid_parts, score_parts = [], [], [], []
    vs_parts = [] if vs_s is not None else None
    as_parts = [] if as_s is not None else None
    # One jitted scan per (model config, renorm, temperature); jax.jit's own
    # per-shape cache covers the (T, chunk, scan_len, B) variations across
    # buckets and calls.
    scan_jit = _cached_jit(
        ("all_scan", type(model).__name__, cfg, renorm, temperature),
        lambda: jax.jit(scan_slice),
    )
    for st, en in zip(starts, ends):
        length = int(n_s[st])
        Wl = en - st
        if length <= 1:
            # End-token-only targets: position-0 score only, no transformer
            gt_parts.append(gt_s[st:en])
            gp_parts.append(gp_s[st:en])
            valid_parts.append(np.ones((Wl,), dtype=bool))
            score_parts.append(None)
            if vs_parts is not None:
                vs_parts.append(vs_s[st:en])
            if as_parts is not None:
                as_parts.append(as_s[st:en])
            continue
        ch = min(chunk, Wl) if Wl < chunk else chunk
        n_chunks = -(-Wl // ch)
        scan_len = max(1, min(n_chunks, max_scan_chunks))
        n_super = -(-n_chunks // scan_len)
        n_chunks = n_super * scan_len
        Wlp = n_chunks * ch
        gt_p = np.zeros((Wlp, C), dtype=np.int32)
        gt_p[:Wl] = gt_s[st:en]
        gp_p = np.ones((Wlp, C), dtype=bool)
        gp_p[:Wl] = gp_s[st:en]
        valid = np.zeros((Wlp,), dtype=bool)
        valid[:Wl] = True
        gt_parts.append(gt_p)
        gp_parts.append(gp_p)
        valid_parts.append(valid)
        if vs_parts is not None:
            vs_p = np.zeros((Wlp,), dtype=np.float32)
            vs_p[:Wl] = vs_s[st:en]
            vs_parts.append(vs_p)
        if as_parts is not None:
            as_p = np.ones((Wlp,), dtype=np.float32)
            as_p[:Wl] = as_s[st:en]
            as_parts.append(as_p)

        gt_d = jnp.asarray(gt_p[:, :length]).reshape(n_chunks, ch, length)
        if renorm:
            gn_p = np.zeros((Wlp, length), dtype=np.int32)  # 0 = dead (pad rows)
            gn_p[:Wl] = gn_s[st:en, :length]
            gn_d = jnp.asarray(gn_p).reshape(n_chunks, ch, length)
        parts = []
        for s in range(n_super):
            sl = slice(s * scan_len, (s + 1) * scan_len)
            xs_s = (gt_d[sl],) + ((gn_d[sl],) if renorm else ())
            parts.append(scan_jit(params, pk, pv, rt_d, *xs_s))
        body = jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
        score_parts.append(jnp.transpose(body, (1, 0, 2)).reshape(B, Wlp))

    gt_all = np.concatenate(gt_parts, axis=0)
    gp_all = np.concatenate(gp_parts, axis=0)
    valid_all = np.concatenate(valid_parts, axis=0)
    Wp = gt_all.shape[0]
    body_scores = jnp.concatenate(
        [s if s is not None else jnp.zeros((B, g.shape[0]), jnp.float32)
         for s, g in zip(score_parts, gt_parts)], axis=1)

    # Position-0 scores: one shared log-softmax of the prefill logits. With
    # guide_renorm the position-0 mask is target-independent (every guide is
    # alive at position 0), so it is one (V,) vector — the root node's
    # children row.
    lse_in = logits1 / temperature
    if renorm:
        root_ct = jnp.asarray(precompute.renorm_trie["child_tok"][0][1])
        root_mask = _scatter_allowed((1, V + 1), root_ct[None, :])[0, :V]
        lse_in = lse_in + root_mask[None, :]
    logp0 = jax.nn.log_softmax(lse_in, axis=1)  # (B,V)
    score0 = logp0[:, jnp.asarray(gt_all[:, 0])]  # (B,Wp)
    scores = body_scores + score0

    if vs_parts is not None:
        scores = scores - jnp.asarray(np.concatenate(vs_parts))[None, :]
    if as_parts is not None:
        scores = scores * jnp.asarray(np.concatenate(as_parts))[None, :]
    scores = jnp.where(jnp.asarray(valid_all)[None, :], scores, NEG_INF)

    topk_scores, topk_idx = jax.lax.top_k(scores, K)
    topk_targets = jnp.asarray(gt_all)[topk_idx]   # BxKxC
    topk_paddings = jnp.asarray(gp_all)[topk_idx]  # BxKxC
    return topk_targets, topk_paddings, topk_scores
