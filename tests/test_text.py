"""Tests for the text layer: tokenizer batch semantics + TargetConfig compact IDs.

Mirrors the reference's own tokenizer self-checks (embedders.py:373-383:
detokenize(tokenize(x)) == x round trips) and the compact-map invariants of
embedders.py:209-236.
"""

import numpy as np
import pytest

from novic_tpu.text.simple import SimpleWordTokenizer, make_test_tokenizer
from novic_tpu.text.target import (
    TargetConfig,
    TargetTokenizer,
    create_target_config,
    translate_target_tokens,
)

NOUNS = ["dog", "cat", "fire truck", "sea lion", "hot dog", "tree", "treehouse"]


@pytest.fixture(scope="module")
def tok():
    return make_test_tokenizer(NOUNS)


def make_tc(tok, **kw):
    kwargs = dict(with_start_token=False, with_end_token=True, compact_ids=True,
                  fixed_token_length=True, auto_fixed_token_length=True, use_masks=True)
    kwargs.update(kw)
    return create_target_config(tok, NOUNS, **kwargs)


def test_tokenize_batch_minimal_padding(tok):
    d = tok.tokenize(["dog", "fire truck"], output_dict=True)
    ids, mask = d["input_ids"], d["attention_mask"]
    assert ids.shape == mask.shape and ids.ndim == 2
    # Longest row exactly fits: last column has at least one real token
    assert mask[:, -1].any()
    # Start token present at column 0 for all rows
    assert (ids[:, 0] == tok.start_token_id).all()
    # Round trip
    assert tok.detokenize(ids) == ["dog", "fire truck"]


def test_tokenize_single_str(tok):
    ids = tok.tokenize("sea lion")
    assert ids.ndim == 2 and ids.shape[0] == 1
    assert tok.detokenize(ids[0]) == "sea lion"


def test_compact_target_config_invariants(tok):
    tc = make_tc(tok)
    # PrefixedIterDecoder setup: no start, with end, compact (ref embedding_decoder.py:619-627)
    assert tc.pad_token_id == 0 and tc.end_token_id == 0 and tc.start_token_id is None
    assert tc.compact_map is not None and tc.compact_unmap is not None
    assert tc.compact_unmap.shape == (tc.vocab_size,)
    assert tc.compact_map.shape == (tok.vocab_size,)
    # unmap[0] is the tokenizer pad token
    assert tc.compact_unmap[0] == tok.pad_token_id
    # map∘unmap = identity on compact ids >= num_special
    ids = np.arange(1, tc.vocab_size)
    assert np.array_equal(tc.compact_map[tc.compact_unmap[ids]], ids)
    # start token of tokenizer maps to 0 (= end/pad) since with_start=False... actually maps to -1 or 0
    # All non-used tokenizer ids map to -1
    used = set(tc.compact_unmap.tolist()) | {tok.end_token_id, tok.pad_token_id}
    unused = [i for i in range(tok.vocab_size) if i not in used and i != tok.start_token_id]
    if unused:
        assert (tc.compact_map[unused] == -1).all()


def test_target_roundtrip_compact(tok):
    tc = make_tc(tok)
    tt = TargetTokenizer(tok, tc, check=True)
    ids, mask = tt.tokenize_target(list(NOUNS))
    assert ids.shape == (len(NOUNS), tc.token_length)
    assert mask.shape == ids.shape
    assert ids.min() >= 0 and ids.max() < tc.vocab_size
    assert tt.detokenize_target(ids) == list(NOUNS)
    # Padding mask is True exactly at trailing padding, False at content and end token
    for i, noun in enumerate(NOUNS):
        row_ids, row_mask = ids[i], mask[i]
        content_len = int((~row_mask).sum())
        # After content: all pad (== 0)
        assert (row_ids[content_len:] == 0).all()
        # End token (0) is at position content_len - 1 and not masked
        assert row_ids[content_len - 1] == 0 and not row_mask[content_len - 1]


def test_target_with_start_token(tok):
    tc = make_tc(tok, with_start_token=True)
    assert tc.start_token_id == 1
    tt = TargetTokenizer(tok, tc, check=True)
    ids, mask = tt.tokenize_target(["hot dog"])
    assert ids[0, 0] == 1  # compact start
    assert tt.detokenize_target(ids) == ["hot dog"]


def test_target_no_end_token(tok):
    tc = make_tc(tok, with_end_token=False)
    assert tc.end_token_id is None and tc.pad_token_id == 0
    tt = TargetTokenizer(tok, tc)
    ids, mask = tt.tokenize_target(["dog"])
    # End tokens mapped to pad and masked
    content = tok.encode("dog")
    assert (ids[0, len(content):] == 0).all()
    assert mask[0, len(content):].all()
    assert not mask[0, :len(content)].any()


def test_target_non_compact(tok):
    tc = make_tc(tok, compact_ids=False)
    assert tc.vocab_size == tok.vocab_size
    tt = TargetTokenizer(tok, tc, check=True)
    ids, _ = tt.tokenize_target(list(NOUNS))
    assert tt.detokenize_target(ids) == list(NOUNS)


def test_dynamic_token_length(tok):
    tc = make_tc(tok, fixed_token_length=False)
    tt = TargetTokenizer(tok, tc)
    ids, _ = tt.tokenize_target(["dog", "cat"])
    # Minimal padding: only as long as needed (content + end)
    assert ids.shape[1] == len(tok.encode("dog")) + 1


def test_unencodable_target_yields_negative(tok):
    tc = make_tc(tok)
    tt = TargetTokenizer(tok, tc)
    # 'zebra' is not in the word vocab; its char tokens ARE in the base charset,
    # so craft a tokenizer without those chars used by targets instead:
    tok2 = SimpleWordTokenizer(words=["dog"], context_length=16)
    tc2 = create_target_config(tok2, ["dog"], with_start_token=False, with_end_token=True,
                               compact_ids=True, fixed_token_length=True,
                               auto_fixed_token_length=True, use_masks=True)
    tt2 = TargetTokenizer(tok2, tc2)
    ids, _ = tt2.tokenize_target(["cat"], max_tokens=tc2.token_length + 1)
    assert (ids < 0).any()  # ref infer.py:687-710 drops these


def test_token_length_math(tok):
    # token_length counts content + end when with_end, per ref embedders.py:196-207
    tc = make_tc(tok)
    longest = max(len(tok.encode(n)) for n in NOUNS)
    assert tc.token_length == longest + 1
    tc2 = make_tc(tok, with_end_token=False)
    assert tc2.token_length == longest
    tc3 = make_tc(tok, with_start_token=True)
    assert tc3.token_length == longest + 2
    tc4 = make_tc(tok, fixed_token_length=True, auto_fixed_token_length=False)
    assert tc4.token_length == tok.context_length


def test_config_hash_and_roundtrip(tok):
    tc = make_tc(tok)
    d = tc.as_jsonable()
    tc2 = TargetConfig.from_jsonable(d)
    assert tc2 == tc
    assert tc.config_hash() == tc2.config_hash()
    tc3 = make_tc(tok, with_start_token=True)
    assert tc.config_hash() != tc3.config_hash()


def test_translation(tok):
    # Two tokenizers over different noun subsets → different compact spaces
    tc_a = create_target_config(tok, NOUNS, with_start_token=False, with_end_token=True,
                                compact_ids=True, fixed_token_length=True,
                                auto_fixed_token_length=True, use_masks=True)
    tc_b = create_target_config(tok, NOUNS[:4], with_start_token=False, with_end_token=True,
                                compact_ids=True, fixed_token_length=True,
                                auto_fixed_token_length=True, use_masks=True)
    tt_a = TargetTokenizer(tok, tc_a)
    ids_a, _ = tt_a.tokenize_target(NOUNS[:4])
    ids_b = translate_target_tokens(ids_a, tc_a, tc_b)
    tt_b = TargetTokenizer(tok, tc_b)
    # Pad columns to tc_b length for detokenization if needed
    assert tt_b.detokenize_target(ids_b[:, :tc_b.token_length]) == NOUNS[:4]


def test_batched_target_tokenize(tok):
    tc = make_tc(tok)
    tt = TargetTokenizer(tok, tc)
    ids, masks = tt.tokenize_targets_batched(NOUNS * 10, batch_size=3)
    assert ids.shape == (len(NOUNS) * 10, tc.token_length)
    assert tt.detokenize_target(ids[:7]) == NOUNS
