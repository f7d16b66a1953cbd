"""DudDecoder tests (ref embedding_decoder.py:454-610): the cheating baseline
predicts its own targets; generate emits a constant noun."""

import jax
import jax.numpy as jnp
import numpy as np

from novic_tpu.models import DecoderModelConfig, create_decoder
from novic_tpu.text.simple import make_test_tokenizer
from novic_tpu.text.target import TargetTokenizer, create_target_config

NOUNS = ["dog", "cat", "unknown", "sea lion"]


def make_dud():
    tok = make_test_tokenizer(NOUNS)
    tc = create_target_config(tok, NOUNS, with_start_token=False, with_end_token=True,
                              compact_ids=True, fixed_token_length=True,
                              auto_fixed_token_length=True, use_masks=True)
    tt = TargetTokenizer(tok, tc)
    cfg = DecoderModelConfig(embed_dim=8, vocab_size=tc.vocab_size, token_length=tc.token_length,
                             model="DudDecoder")
    model, params = create_decoder(cfg, target_tokenizer=tt)
    return model, tt, tc


def test_dud_forward_all_correct():
    model, tt, tc = make_dud()
    ids, mask = tt.tokenize_target(["dog", "sea lion"])
    embed = jnp.ones((2, 8)) / np.sqrt(8)
    x, pad, s, b, correct = model(embed, jnp.asarray(ids), jnp.asarray(mask),
                                  calc_loss=True, calc_correct=True)
    assert float(s) == 1.0 and float(b) == 1.0
    # All non-padded positions correct (it cheats)
    np.testing.assert_array_equal(np.asarray(correct), ~np.asarray(mask))


def test_dud_generate_unknown():
    model, tt, tc = make_dud()
    embed = jnp.ones((3, 8)) / np.sqrt(8)
    target, padding, logits, s, b, score = model.generate(embed, calc_loss=True)
    assert tt.detokenize_target(np.asarray(target)) == ["unknown"] * 3


def test_dud_beam_and_all():
    model, tt, tc = make_dud()
    embed = jnp.ones((2, 8)) / np.sqrt(8)
    t, p, sc = model.generate_beam(embed, topk=3)
    assert np.asarray(sc)[:, 0].tolist() == [-1.0, -1.0]
    assert (np.asarray(sc)[:, 1:] < -1e29).all()
    guides, _ = tt.tokenize_target(["dog", "cat"])
    t2, p2, sc2 = model.generate_all(embed, topk=2, guide_targets=guides)
    assert t2.shape == (2, 2, guides.shape[1])


def test_dud_multi_target_dedup():
    """Multi-target dedup: the most-weighted shared-prefix continuation wins."""
    model, tt, tc = make_dud()
    # Two targets per sample sharing a first token, different weights
    ids, mask = tt.tokenize_target(["sea lion", "sea lion", "dog", "cat"])
    C = ids.shape[1]
    target = jnp.asarray(ids).reshape(2, 2, C)
    padding = jnp.asarray(mask).reshape(2, 2, C)
    embed = jnp.ones((2, 8)) / np.sqrt(8)
    x, pad, s, b, correct = model(embed, target, padding, calc_loss=False, calc_correct=True)
    # Sample 0: identical targets → all correct. Sample 1: different targets;
    # dedup priority picks one of them at position 0, so at most one row fully correct.
    c = np.asarray(correct)
    m = np.asarray(pad)
    assert (c[0] | m[0]).all()
