"""DudDecoder: cheating baseline for metric upper bounds and pipeline sanity.

Forward "predicts" the target it was given (with multi-target deduplication
priority so the most-weighted shared-prefix continuation wins); generate*
methods emit a constant noun (reference embedding_decoder.py:454-610).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np

from novic_tpu.models.config import DecoderModelConfig
from novic_tpu.models.layers import NEG_INF
from novic_tpu.models.prefixed_iter import cross_entropy_elems, expand_target_padding


class DudDecoder:
    """Not an nn.Module: no parameters. Matches the EmbeddingDecoder contract."""

    @staticmethod
    def get_target_config_kwargs(**target_kwargs) -> dict[str, Any]:
        return target_kwargs

    @staticmethod
    def get_data_config_kwargs(**data_kwargs) -> dict[str, Any]:
        return data_kwargs

    def __init__(self, cfg: DecoderModelConfig, dud_target: np.ndarray, dud_target_padding: np.ndarray):
        # dud_target: (1, Cd) tokenization of 'unknown' (or '' if unencodable,
        # ref embedding_decoder.py:464-469)
        self.cfg = cfg
        assert dud_target.ndim == 2 and dud_target.shape[0] == 1 and dud_target.shape[1] >= 1
        assert not dud_target_padding.any()
        self.dud_target = np.asarray(dud_target)
        self.dud_target_padding = np.asarray(dud_target_padding)

    def init_params(self, rng) -> dict:
        return {}

    # ------------------------------------------------------------------ forward

    def __call__(self, embed, target, target_padding=None, target_weight=None, *,
                 calc_loss=False, calc_correct=False, only_pred=False,
                 guide_targets=None, multi_first=False):
        if target is None:
            raise ValueError(f"{type(self).__name__} can only cheat, so it requires targets")
        target = jnp.asarray(target)
        Z = target.shape[:-1]
        C = target.shape[-1]
        V = self.cfg.vocab_size

        if target_weight is not None:
            zero_w = jnp.logical_not(jnp.asarray(target_weight).astype(bool))[..., None]
            if target_padding is None:
                target_padding = jnp.broadcast_to(zero_w, target.shape)
            else:
                target_padding = jnp.logical_or(target_padding, zero_w)

        if target_padding is not None and self.cfg.num_end_loss > 1:
            # Dud uses P=1 semantics (ref embedding_decoder.py:491-496)
            target_padding = expand_target_padding(target_padding, 1, self.cfg.num_end_loss)

        target_pred = target
        if len(Z) > 1:
            target_pred = self._dedup_multi(target, target_padding, target_weight, multi_first)

        x = jnp.zeros(target_pred.shape + (V,), dtype=jnp.float32)
        idx = tuple(jnp.indices(target_pred.shape)) + (target_pred,)
        x = x.at[idx].set(1.0)

        if only_pred:
            target_pred = target_pred[..., -1:]
            x = x[..., -1:, :]
            target = target[..., -1:]
            if target_padding is not None:
                target_padding = target_padding[..., -1:]

        loss_sum = jnp.asarray(1.0) if calc_loss else None
        loss_basis = jnp.asarray(1.0) if calc_loss else None

        correct = None
        if calc_correct:
            correct = jnp.equal(target_pred, target)
            if target_padding is not None:
                correct = jnp.logical_and(correct, jnp.logical_not(target_padding))

        return x, target_padding, loss_sum, loss_basis, correct

    def _dedup_multi(self, target, target_padding, target_weight, multi_first):
        """Multi-target dedup priority (ref embedding_decoder.py:499-527).

        Operates in BxMxC layout internally; each group of prefix-equal targets
        predicts the (weight-)majority continuation."""
        V = self.cfg.vocab_size
        if multi_first:  # MxBxC → BxMxC
            target = jnp.swapaxes(target, 0, 1)
            if target_padding is not None:
                target_padding = jnp.swapaxes(target_padding, 0, 1)
            if target_weight is not None:
                target_weight = jnp.swapaxes(jnp.asarray(target_weight), 0, 1)
        B, M, C = target.shape
        target_pred = target

        for m in range(M - 1):
            R = M - m
            t_slice = target[:, m:, :]        # BxRxC
            p_slice = target_pred[:, m:, :]   # BxRxC
            eq = jnp.equal(t_slice[:, :1, :-1], t_slice[:, :, :-1]).astype(jnp.int32)
            eq = jnp.cumprod(eq, axis=-1).astype(bool)  # prefix equality (cummin)
            equiv = jnp.concatenate([jnp.ones((B, R, 1), dtype=bool), eq], axis=-1)
            if target_padding is not None:
                equiv = jnp.logical_and(equiv, jnp.logical_not(target_padding[:, m:, :]))
            idx = jnp.where(equiv, p_slice, V)  # masked → overflow bucket
            if target_weight is None:
                src = jnp.ones(idx.shape, dtype=jnp.float32)
            else:
                src = jnp.broadcast_to(target_weight[:, m:, None].astype(jnp.float32), idx.shape)
            prio = jnp.zeros((B, V + 1, C), dtype=jnp.float32)
            b_i = jnp.arange(B)[:, None, None]
            c_i = jnp.arange(C)[None, None, :]
            prio = prio.at[b_i, idx, c_i].add(src)
            best = jnp.argmax(prio[:, :V, :], axis=1)  # BxC
            new_slice = jnp.where(equiv, best[:, None, :], p_slice)
            target_pred = target_pred.at[:, m:, :].set(new_slice)

        if multi_first:
            target_pred = jnp.swapaxes(target_pred, 0, 1)
        return target_pred

    # ----------------------------------------------------------------- generate

    def generate(self, embed, *, collect_logits=False, calc_loss=False, temperature=1.0,
                 length_alpha=0.0, sample_weight=None, guide_targets=None, guide_renorm=False):
        B = embed.shape[0]
        C = self.dud_target.shape[1]
        V = self.cfg.vocab_size
        target = jnp.broadcast_to(jnp.asarray(self.dud_target), (B, C))
        target_padding = jnp.broadcast_to(jnp.asarray(self.dud_target_padding), (B, C))
        seq_logits = None
        if collect_logits or calc_loss:
            seq_logits = jnp.zeros((B, C, V), dtype=jnp.float32)
            b_i = jnp.arange(B)[:, None]
            c_i = jnp.arange(C)[None, :]
            seq_logits = seq_logits.at[b_i, c_i, target].set(1.0)
        loss_sum = loss_basis = target_score = None
        if calc_loss:
            logp = jnp.log(jnp.exp((seq_logits / temperature)) /
                           jnp.exp(seq_logits / temperature).sum(axis=2, keepdims=True))
            target_score = jnp.take_along_axis(logp, target[:, :, None], axis=2)[:, :, 0].sum(axis=1)
            if length_alpha != 0:
                target_score = target_score * (C ** -length_alpha)
            elems = cross_entropy_elems(seq_logits, target, self.cfg.label_smoothing)
            loss_sum = elems.sum()
            loss_basis = jnp.asarray(float(target.size))
        return target, target_padding, seq_logits, loss_sum, loss_basis, target_score

    def generate_beam(self, embed, *, topk, temperature=1.0, length_alpha=0.0,
                      vocab_targets=None, vocab_per_token=False, vocab_scaler=0.0,
                      guide_targets=None, guide_renorm=False):
        B = embed.shape[0]
        H = topk
        C = self.dud_target.shape[1]
        target = jnp.zeros((B, H, C), dtype=jnp.int32).at[:, 0, :].set(jnp.asarray(self.dud_target[0]))
        padding = jnp.ones((B, H, C), dtype=bool).at[:, 0, :].set(jnp.asarray(self.dud_target_padding[0]))
        score = jnp.full((B, H), NEG_INF).at[:, 0].set(-1.0)
        return target, padding, score

    def precompute_generate_all(self, **kwargs):
        return None

    def generate_all(self, embed, *, topk, guide_targets, precompute=None, **kwargs):
        B = embed.shape[0]
        H = topk
        Cw = np.asarray(guide_targets).shape[1]
        Cd = self.dud_target.shape[1]
        target = jnp.zeros((B, H, Cw), dtype=jnp.int32).at[:, 0, :Cd].set(jnp.asarray(self.dud_target[0]))
        padding = jnp.ones((B, H, Cw), dtype=bool).at[:, 0, :Cd].set(jnp.asarray(self.dud_target_padding[0]))
        score = jnp.full((B, H), NEG_INF).at[:, 0].set(-1.0)
        return target, padding, score
