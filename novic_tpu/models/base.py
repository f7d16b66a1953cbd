"""Decoder model registry and construction helpers.

Mirrors the reference's model-class selection (train.py model=<class>,
infer.py:713-778 load_decoder_model) and the negotiation hooks
get_target_config_kwargs / get_data_config_kwargs
(reference embedding_decoder.py:22-32).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np

from novic_tpu.models.config import DecoderModelConfig
from novic_tpu.models.dud import DudDecoder
from novic_tpu.models.prefixed_iter import PrefixedIterDecoder
from novic_tpu.utils.logger import log

DECODER_REGISTRY: dict[str, Any] = {
    "PrefixedIterDecoder": PrefixedIterDecoder,
    "DudDecoder": DudDecoder,
}


def decoder_class(name: str):
    try:
        return DECODER_REGISTRY[name]
    except KeyError:
        raise ValueError(f"Unsupported decoder model class: {name}") from None


def create_decoder(cfg: DecoderModelConfig, *, target_tokenizer=None, rng: Optional[jax.Array] = None):
    """Build (model, params) for a DecoderModelConfig.

    For DudDecoder, target_tokenizer is required to tokenize the constant noun
    (ref embedding_decoder.py:464-469).
    """
    cls = decoder_class(cfg.model)
    if cls is DudDecoder:
        assert target_tokenizer is not None, "DudDecoder requires a target tokenizer"
        dud_target, dud_padding = target_tokenizer.tokenize_target("unknown")
        if (dud_target < 0).any():
            dud_target, dud_padding = target_tokenizer.tokenize_target("")
        if dud_padding is None:
            dud_padding = np.zeros_like(dud_target, dtype=bool)
        # Trim trailing padding columns: the dud constant is used at its natural
        # dynamic length (ref embedding_decoder.py:466-469 asserts no padding)
        keep = int((~dud_padding[0]).sum())
        dud_target, dud_padding = dud_target[:, :keep], dud_padding[:, :keep]
        model = DudDecoder(cfg, dud_target, dud_padding)
        return model, {}
    model = cls(cfg=cfg)
    if rng is None:
        rng = jax.random.PRNGKey(0)
    import jax.numpy as jnp

    dummy_embed = jnp.zeros((1, cfg.embed_dim), dtype=jnp.float32)
    dummy_target = jnp.zeros((1, cfg.token_length), dtype=jnp.int32)
    variables = model.init({"params": rng}, dummy_embed, dummy_target)
    params = variables["params"]
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    unused = 0
    if cfg.vocab_quant:
        rows = cfg.vocab_size_quant - cfg.vocab_size
        unused = rows * cfg.hidden_dim * (2 if not cfg.weight_tying else 1)
        if cfg.logits_bias:
            unused += rows
    log.info(f"Created {cfg.model}: {n_params - unused} params"
             f"{f' + {unused} unused' if unused else ''}")
    return model, params


def verify_unused(params, cfg: DecoderModelConfig):
    """Assert vocab-quantized unused rows are still zero (ref
    embedding_decoder.py:437-441 state-dict hooks)."""
    if not cfg.vocab_quant or cfg.vocab_size_quant == cfg.vocab_size:
        return
    for name in ("logits_weight", "logits_bias", "token_embedding"):
        if name in params:
            arr = np.asarray(params[name])
            if np.any(arr[cfg.vocab_size:] != 0):
                raise ValueError(
                    f"Unexpected values in the unused portion of {name} "
                    f"(vocab quantization invariant violated)")


def count_params(params, cfg: Optional[DecoderModelConfig] = None) -> dict[str, int]:
    """Parameter count report (ref embedding_decoder.py:1304-1347 ParamCount)."""
    total = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    unused = 0
    if cfg is not None and cfg.vocab_quant:
        rows = cfg.vocab_size_quant - cfg.vocab_size
        unused = rows * cfg.hidden_dim * (1 if cfg.weight_tying else 2)
        if cfg.logits_bias:
            unused += rows
    return {"total": total, "used": total - unused, "unused": unused,
            "trained": total - unused, "frozen": 0}
