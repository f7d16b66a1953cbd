"""Decoder config-variant coverage: every architecture/init option constructs,
runs forward + KV-cached greedy, and produces finite outputs; vocab
quantization keeps unused rows zero (ref embedding_decoder.py:266-278)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from novic_tpu.models import DecoderModelConfig, PrefixedIterDecoder
from novic_tpu.models.generate import generate_greedy

V, CMAX, F = 21, 6, 16


def run_variant(**kw):
    base = dict(embed_dim=F, vocab_size=V, token_length=CMAX,
                hidden_dim=32, feedfwd_scale="1/2", num_layers=2, num_heads=2,
                mlp_seq_len=2, input_dropout=0.0, layer_dropout=0.0)
    base.update(kw)
    cfg = DecoderModelConfig(**base)
    model = PrefixedIterDecoder(cfg=cfg)
    embed = jax.random.normal(jax.random.PRNGKey(0), (3, F))
    embed = embed / jnp.linalg.norm(embed, axis=1, keepdims=True)
    target = jnp.asarray(np.array([[5, 6, 0, 0, 0, 0], [7, 0, 0, 0, 0, 0],
                                   [5, 8, 9, 0, 0, 0]]), jnp.int32)
    mask = jnp.asarray(np.array([[0, 0, 0, 1, 1, 1], [0, 0, 1, 1, 1, 1],
                                 [0, 0, 0, 0, 1, 1]], bool))
    params = jax.jit(model.init)({"params": jax.random.PRNGKey(1)}, embed, target)["params"]
    logits, pad, loss_sum, loss_basis, correct = jax.jit(
        lambda p, e, t, m: model.apply({"params": p}, e, t, m, None,
                                       calc_loss=True, calc_correct=True))(
        params, embed, target, mask)
    assert np.isfinite(np.asarray(logits)).all()
    assert np.isfinite(float(loss_sum)) and float(loss_basis) > 0
    tgt, tpad, _, _, _, _ = jax.jit(lambda p, e: generate_greedy(model, p, e))(params, embed)
    assert np.asarray(tgt).min() >= 0 and np.asarray(tgt).max() < V
    return cfg, model, params


@pytest.mark.parametrize("kw", [
    dict(init_mlp_mode="default", init_tfrm_mode="default"),
    dict(init_tfrm_mode="open"),
    dict(init_mlp_unit_norm=True, init_tfrm_unit_norm=True),
    dict(init_tfrm_unit_postnorm=False, init_tfrm_proj_layers=False),
    dict(init_zero_norm=True),
    dict(init_rezero_mode="perskip"),
    dict(init_rezero_mode="perlayer"),
    dict(layer_norm_first=False),           # post-LN variant
    dict(layer_bias=True, logits_bias=True, init_bias_zero=False),
    dict(weight_tying=False),
    dict(strictly_causal=True),
    dict(mlp_hidden_layer="min", mlp_hidden_bias=True, mlp_hidden_norm=True),
    dict(mlp_hidden_layer="gmean", mlp_hidden_activation="tanh", hidden_dim=128),
    dict(mlp_hidden_layer="amean", mlp_hidden_activation="relu"),
    dict(layer_activation="relu"),
    dict(num_end_loss=2),
    dict(label_smoothing=0.1),
    dict(compute_dtype="bfloat16"),
])
@pytest.mark.slow  # full-tier (pytest --full)
def test_variant_runs(kw):
    run_variant(**kw)


@pytest.mark.slow  # full-tier (pytest --full)
def test_vocab_quant_unused_rows():
    cfg, model, params = run_variant(vocab_quant=True)
    assert cfg.vocab_size_quant == 64
    logits_w = np.asarray(params["logits_weight"])
    assert logits_w.shape[0] == 64
    # Unused rows initialized to zero (ref embedding_decoder.py:272-275)
    assert (logits_w[V:] == 0).all()
    # Logits sliced back to the true vocab size
    embed = jax.random.normal(jax.random.PRNGKey(0), (2, F))
    out, *_ = model.apply({"params": params}, embed,
                          jnp.zeros((2, CMAX), jnp.int32))
    assert out.shape[-1] == V


def test_gmean_too_small_raises():
    """Tiny dims can round the gmean hidden size to zero — must be rejected
    (ref embedding_decoder.py:1210)."""
    with pytest.raises(ValueError, match="non-positive"):
        run_variant(mlp_hidden_layer="gmean")


def test_rezero_zero_init_is_identity_residual():
    """ReZero scales start at 0: the transformer initially passes inputs through
    (plus final norm), so logits equal the no-transformer path."""
    cfg, model, params = run_variant(init_rezero_mode="perskip")
    s1 = np.asarray(params["transformer"]["layers_0"]["scale1"])
    assert s1 == 0.0
