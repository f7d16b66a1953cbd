"""PrefixedIterDecoder: the production object decoder.

Decoder-only causal transformer whose first P sequence positions are an MLP
projection of the (noised) embedding vector; token embeddings are weight-tied
to the logits linear (reference embedding_decoder.py:617-777).

Forward semantics replicated exactly (loss sum/basis decomposition so batches
combine exactly, num_end_loss padding expansion, weighted CE with
ignore_index=-1, guide-masked argmax correctness, multi-target reshape).

TPU-first departures from the reference:
* No key-padding attention masks: target padding is always trailing-or-whole-row,
  so under the causal mask padded key positions are never attended to by any
  position whose output reaches the loss — masking only ever affected outputs
  that are discarded (and NaN guards, ref embedding_decoder.py:710-714, which
  we don't need since nothing is fully masked).
* ``prefill``/``decode_step`` expose a KV cache so generation is a lax.scan of
  O(1)-length steps instead of the reference's full re-forward per token.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from novic_tpu.models.config import DecoderModelConfig
from novic_tpu.models.layers import (
    FastDropout,
    NEG_INF,
    EmbeddingVectorMLP,
    Transformer,
    causality_mask,
    dense,
    normal_init,
    resolve_precision,
)


def cross_entropy_elems(logits: jnp.ndarray, targets: jnp.ndarray, label_smoothing: float
                        ) -> jnp.ndarray:
    """Per-element CE with ignore_index=-1 (torch F.cross_entropy semantics).

    logits: (..., V); targets: (...,) int with -1 = ignored (contributes 0).
    Computed as logsumexp(logits) - logits[target] (and mean(logp) =
    mean(logits) - logsumexp for smoothing) so the full (..., V) log-softmax
    tensor never materializes — at training scale that tensor is the step's
    largest intermediate (BENCH_NOTES.md)."""
    valid = targets >= 0
    tsafe = jnp.maximum(targets, 0)
    lse = jax.scipy.special.logsumexp(logits, axis=-1)
    picked = jnp.take_along_axis(logits, tsafe[..., None], axis=-1)[..., 0]
    nll = lse - picked
    if label_smoothing > 0.0:
        smooth = lse - jnp.mean(logits, axis=-1)
        loss = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    else:
        loss = nll
    return jnp.where(valid, loss, 0.0)


def guide_restricted_argmax(x: jnp.ndarray, target: jnp.ndarray, guide_targets: jnp.ndarray
                            ) -> jnp.ndarray:
    """Argmax restricted to tokens continuing some prefix-matching guide target
    (scatter trick, ref embedding_decoder.py:751-761).

    x: (A,C,V) logits; target: (A,C) token ids; guide_targets: (W,Cmax).
    """
    A, C, V = x.shape
    gt = guide_targets.T[:C, :]  # (C,W)
    ne = jnp.not_equal(target[:, : C - 1, None], gt[None, : C - 1, :])  # (A,C-1,W)
    dead = jax.lax.cummax(ne.astype(jnp.int32), axis=1).astype(bool)
    guide_mask = jnp.concatenate(
        [jnp.zeros((A, 1, gt.shape[1]), dtype=bool), dead], axis=1)  # (A,C,W)
    idx = jnp.where(guide_mask, V, gt[None, :, :].astype(jnp.int32))  # (A,C,W)
    base = jnp.full((A, C, V + 1), NEG_INF, dtype=x.dtype)
    base = base.at[
        jnp.arange(A)[:, None, None], jnp.arange(C)[None, :, None], idx
    ].max(0.0)
    return jnp.argmax(x + base[:, :, :V], axis=2)


def expand_target_padding(target_padding: jnp.ndarray, mlp_seq_len: int, num_end_loss: int
                          ) -> jnp.ndarray:
    """num_end_loss>1 padding adjustment: returns the AxC padding actually used
    for loss masking (ref embedding_decoder.py:696-709, the seq mask's last C cols)."""
    C = target_padding.shape[-1]
    padding_expand = mlp_seq_len + num_end_loss - 2  # P+N-2
    padding_keep = C - num_end_loss + 1              # C-N+1
    if padding_expand < 1:
        return target_padding
    if padding_keep <= 1:
        seq_pad = jnp.broadcast_to(target_padding[..., 0:1], target_padding.shape[:-1] + (padding_expand + 1,))
    else:
        lead = jnp.broadcast_to(target_padding[..., 0:1], target_padding.shape[:-1] + (padding_expand,))
        seq_pad = jnp.concatenate([lead, target_padding[..., :padding_keep]], axis=-1)
    return seq_pad[..., -C:]


class PrefixedIterDecoder(nn.Module):
    """The production model (ref embedding_decoder.py:617-1079)."""

    cfg: DecoderModelConfig

    # Forced target tokenization: no start token, end token = pad = 0, compact IDs
    # (ref embedding_decoder.py:619-627)
    @staticmethod
    def get_target_config_kwargs(**target_kwargs) -> dict[str, Any]:
        target_kwargs.update(with_start_token=False, with_end_token=True, compact_ids=True)
        return target_kwargs

    @staticmethod
    def get_data_config_kwargs(**data_kwargs) -> dict[str, Any]:
        return data_kwargs

    def setup(self):
        cfg = self.cfg
        self.embed_mlp = EmbeddingVectorMLP(cfg=cfg, output_bias=False, name="embed_mlp")
        init_embed_std = (1.0 / math.sqrt(2 * cfg.hidden_dim) if cfg.init_mlp_unit_norm
                          else 1.0 / math.sqrt(2))  # ref embedding_decoder.py:236

        def quant_zeroed(init_fn):
            # Vocab-quantized rows beyond the true vocab stay zero
            # (ref embedding_decoder.py:266-278)
            if not cfg.vocab_quant or cfg.vocab_size_quant == cfg.vocab_size:
                return init_fn

            def init(key, shape, dtype=jnp.float32):
                w = init_fn(key, shape, dtype)
                return w.at[cfg.vocab_size:].set(0.0)

            return init

        self.logits_weight = self.param(
            "logits_weight", quant_zeroed(normal_init(init_embed_std)),
            (cfg.vocab_size_quant, cfg.hidden_dim))
        if cfg.logits_bias:
            if cfg.init_bias_zero:
                bias_init = nn.initializers.zeros
            else:
                bias_std = init_embed_std if cfg.init_tfrm_unit_postnorm else init_embed_std * math.sqrt(cfg.hidden_dim)
                bias_init = normal_init(bias_std)
            self.logits_bias = self.param("logits_bias", quant_zeroed(bias_init),
                                          (cfg.vocab_size_quant,))
        else:
            self.logits_bias = None
        if not cfg.weight_tying:
            self.token_embedding = self.param(
                "token_embedding", quant_zeroed(normal_init(init_embed_std)),
                (cfg.vocab_size_quant, cfg.hidden_dim))
        else:
            self.token_embedding = None
        self.pos_embedding = self.param(
            "pos_embedding", normal_init(init_embed_std), (cfg.max_seq_len, cfg.hidden_dim))
        self.input_dropout_mod = FastDropout(rate=cfg.input_dropout, impl=cfg.dropout_impl)
        self.transformer = Transformer(cfg=cfg, name="transformer")
        self.causality_bias = causality_mask(cfg.max_seq_len, cfg.mlp_seq_len, cfg.strictly_causal)

    # ------------------------------------------------------------------ embed

    def embed_tokens(self, token_ids: jnp.ndarray) -> jnp.ndarray:
        table = self.logits_weight if self.token_embedding is None else self.token_embedding
        return jnp.take(table, token_ids, axis=0)

    def logits(self, x: jnp.ndarray) -> jnp.ndarray:
        out = dense(x, self.logits_weight, self.logits_bias,
                    precision=resolve_precision(self.cfg.matmul_precision))
        if self.cfg.vocab_quant:
            out = out[..., : self.cfg.vocab_size]
        return out

    # ---------------------------------------------------------------- forward

    def __call__(
        self,
        embed: jnp.ndarray,                         # BxF unit embedding vectors
        target: Optional[jnp.ndarray],              # BxC | BxMxC | MxBxC compact token ids
        target_padding: Optional[jnp.ndarray] = None,  # same batch shape as target, True = ignore
        target_weight: Optional[jnp.ndarray] = None,   # B | BxM | MxB loss weights
        calc_loss: bool = False,
        calc_correct: bool = False,
        only_pred: bool = False,
        guide_targets: Optional[jnp.ndarray] = None,   # WxCmax
        multi_first: bool = False,
        deterministic: bool = True,
    ):
        """Returns (logits, target_padding_out, loss_sum, loss_basis, correct)
        with exactly the reference contract (ref embedding_decoder.py:121-141)."""
        cfg = self.cfg
        assert embed.ndim == 2
        x = self.embed_mlp(embed)  # BxPxE

        B = M = None
        if target is not None and target.ndim == 3:
            if multi_first:  # A = MB
                M, B = target.shape[:2]
                if M > 1:
                    x = jnp.tile(x, (M, 1, 1))
            else:  # A = BM
                B, M = target.shape[:2]
                if M > 1:
                    x = jnp.repeat(x, M, axis=0)
            target = target.reshape(-1, target.shape[-1])
            if target_padding is not None:
                target_padding = target_padding.reshape(-1, target_padding.shape[-1])
            if target_weight is not None:
                target_weight = target_weight.reshape(-1)

        if target is not None and target_weight is not None:
            zero_w = jnp.logical_not(target_weight.astype(bool))[:, None]
            if target_padding is None:
                target_padding = jnp.broadcast_to(zero_w, target.shape)
            else:
                target_padding = jnp.logical_or(target_padding, zero_w)

        if target is not None and target.shape[1] > 1:
            tok = self.embed_tokens(target[:, :-1])  # Ax(C-1)xE
            x = jnp.concatenate([x, tok], axis=1)    # AxSxE, S = P+C-1
        S = x.shape[1]
        x = x + self.pos_embedding[:S, :]
        x = self.input_dropout_mod(x, deterministic=deterministic)

        if target_padding is not None:
            target_padding = expand_target_padding(target_padding, cfg.mlp_seq_len, cfg.num_end_loss)

        x = self.transformer(x, self.causality_bias[:S, :S], deterministic=deterministic)

        if only_pred:  # T = 1
            x = x[:, -1:, :]
            if target is not None:
                target = target[:, -1:]
                if target_padding is not None:
                    target_padding = target_padding[:, -1:]
        else:  # T = C
            x = x[:, cfg.mlp_seq_len - 1 :, :]

        x = self.logits(x)  # AxTxV

        loss_sum = loss_basis = correct = None
        if calc_loss or calc_correct:
            assert target is not None
            if target_padding is not None:
                target = jnp.where(target_padding, -1, target)

            if calc_loss:
                elems = cross_entropy_elems(x, target, cfg.label_smoothing)  # AxT
                if target_weight is None:
                    loss_sum = elems.sum()
                    if target_padding is None:
                        loss_basis = jnp.asarray(target.size, dtype=embed.dtype)
                    else:
                        loss_basis = (target_padding.size - target_padding.sum()).astype(embed.dtype)
                else:
                    loss_sum = jnp.dot(target_weight, elems.sum(axis=1),
                                       preferred_element_type=jnp.float32)
                    if target_padding is None:
                        loss_basis = target.shape[1] * target_weight.sum()
                    else:
                        not_pad = (target_padding.shape[1] - target_padding.sum(axis=1)).astype(target_weight.dtype)
                        loss_basis = jnp.dot(target_weight, not_pad,
                                             preferred_element_type=jnp.float32)

            if calc_correct:
                if guide_targets is None:
                    pred_tokens = jnp.argmax(x, axis=2)
                else:
                    assert not only_pred
                    pred_tokens = guide_restricted_argmax(x, target, guide_targets)
                # For masked positions target is -1 so correct is False (argmax >= 0)
                correct = jnp.equal(pred_tokens, target)

        if M is not None:
            batch_shape = (M, B) if multi_first else (B, M)
            x = x.reshape(batch_shape + x.shape[1:])
            if target_padding is not None:
                target_padding = target_padding.reshape(batch_shape + target_padding.shape[1:])
            if correct is not None:
                correct = correct.reshape(batch_shape + correct.shape[1:])

        return x, target_padding, loss_sum, loss_basis, correct

    # ------------------------------------------------------------- generation

    def init_cache(self, batch: int, dtype=None) -> tuple[list, list]:
        """KV cache; stored in the compute dtype (bf16 halves the beam search's
        per-step candidate-gather HBM traffic; attention matmuls read bf16
        anyway under the default matmul precision)."""
        cfg = self.cfg
        if dtype is None:
            dtype = jnp.dtype(cfg.compute_dtype)
        shape = (batch, cfg.max_seq_len, cfg.num_heads, cfg.head_dim)
        k = [jnp.zeros(shape, dtype) for _ in range(cfg.num_layers)]
        v = [jnp.zeros(shape, dtype) for _ in range(cfg.num_layers)]
        return k, v

    def prefill(self, embed: jnp.ndarray, k_caches, v_caches):
        """Run the P prefix positions, fill the cache, return first-step logits (BxV)."""
        cfg = self.cfg
        x = self.embed_mlp(embed)  # BxPxE
        x = x + self.pos_embedding[: cfg.mlp_seq_len, :]
        x, k_caches, v_caches = self.transformer.prefill(
            x, self.causality_bias, k_caches, v_caches)
        logits0 = self.logits(x[:, -1, :])  # output of last prefix position
        return logits0, k_caches, v_caches

    def decode_step(self, token_ids: jnp.ndarray, step: jnp.ndarray, k_caches, v_caches):
        """One KV-cached decode step: token chosen at step-1 feeds position P+step-1;
        returns logits predicting the token at ``step`` (step >= 1)."""
        cfg = self.cfg
        pos = cfg.mlp_seq_len + step - 1
        x = self.embed_tokens(token_ids)[:, None, :]  # Bx1xE
        x = x + jax.lax.dynamic_slice_in_dim(self.pos_embedding, pos, 1, axis=0)[None, :, :]
        x, k_caches, v_caches = self.transformer.step(x, k_caches, v_caches, pos)
        return self.logits(x[:, 0, :]), k_caches, v_caches

    def init_token_cache(self, batch: int, dtype=None) -> tuple[list, list]:
        """Token-slot-only caches (G = token_length-1 slots) for the split-cache
        decode path; the P prefix slots live separately at base-batch rows."""
        cfg = self.cfg
        if dtype is None:
            dtype = jnp.dtype(cfg.compute_dtype)
        shape = (batch, cfg.token_length - 1, cfg.num_heads, cfg.head_dim)
        tk = [jnp.zeros(shape, dtype) for _ in range(cfg.num_layers)]
        tv = [jnp.zeros(shape, dtype) for _ in range(cfg.num_layers)]
        return tk, tv

    def prefill_split(self, embed: jnp.ndarray):
        """Prefill at base-batch rows, returning prefix-only caches (B,P,H,hd).
        Beam search shares these across its candidate rows without gathering."""
        cfg = self.cfg
        B = embed.shape[0]
        dtype = jnp.dtype(cfg.compute_dtype)
        shape = (B, cfg.mlp_seq_len, cfg.num_heads, cfg.head_dim)
        pk = [jnp.zeros(shape, dtype) for _ in range(cfg.num_layers)]
        pv = [jnp.zeros(shape, dtype) for _ in range(cfg.num_layers)]
        return self.prefill(embed, pk, pv)

    def decode_step_split(self, token_ids: jnp.ndarray, step: jnp.ndarray,
                          pk_caches, pv_caches, tk_caches, tv_caches):
        """Split-cache decode step: prefix caches (Bb rows, frozen) + token
        caches (Bb*R rows, slot step-1 updated). See TransformerLayer.step_split."""
        cfg = self.cfg
        pos = cfg.mlp_seq_len + step - 1
        x = self.embed_tokens(token_ids)[:, None, :]  # Bx1xE
        x = x + jax.lax.dynamic_slice_in_dim(self.pos_embedding, pos, 1, axis=0)[None, :, :]
        x, tk_caches, tv_caches = self.transformer.step_split(
            x, pk_caches, pv_caches, tk_caches, tv_caches, step)
        return self.logits(x[:, 0, :]), tk_caches, tv_caches

    def score_hidden(self, token_ids: jnp.ndarray, pk_caches, pv_caches) -> jnp.ndarray:
        """Teacher-forced hidden states against a shared prefix cache.

        token_ids: (A, T) target content tokens (positions 1..T of the target)
        with A = Bb*R rows laid out b*R + r; pk/pv from prefill_split at Bb
        rows. Returns (A, T, E) final-norm outputs at sequence positions
        P..P+T-1 — the logits inputs predicting target positions 1..T (the
        position-0 prediction comes from prefill_split's logits, shared by all
        R targets of a sample). Used by generate_all: vs the full forward this
        skips recomputing the P prefix positions per chunk (ref
        embedding_decoder.py:1043-1079 re-forwards everything per chunk)."""
        cfg = self.cfg
        P = cfg.mlp_seq_len
        T = token_ids.shape[1]
        x = self.embed_tokens(token_ids)
        x = x + jax.lax.slice_in_dim(self.pos_embedding, P, P + T, axis=0)[None, :, :]
        token_bias = self.causality_bias[P : P + T, P : P + T]
        return self.transformer.extend(x, pk_caches, pv_caches, token_bias)

    def decode_step_lazy(self, token_ids: jnp.ndarray, step: jnp.ndarray,
                         pk_caches, pv_caches, tk_caches, tv_caches, anc_bias):
        """Lazy-cache beam decode step: token caches are slot-stationary and
        the candidate's history is selected by an additive ancestry bias in
        attention instead of reordering the caches (TransformerLayer.step_lazy)."""
        cfg = self.cfg
        pos = cfg.mlp_seq_len + step - 1
        x = self.embed_tokens(token_ids)[:, None, :]  # Bx1xE
        x = x + jax.lax.dynamic_slice_in_dim(self.pos_embedding, pos, 1, axis=0)[None, :, :]
        x, tk_caches, tv_caches = self.transformer.step_lazy(
            x, pk_caches, pv_caches, tk_caches, tv_caches, anc_bias, step)
        return self.logits(x[:, 0, :]), tk_caches, tv_caches
