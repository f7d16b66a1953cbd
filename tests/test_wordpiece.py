"""Native BERT WordPiece tokenizer parity vs transformers.BertTokenizerFast
(the tokenizer the reference reaches through open_clip's
HFTokenizer('bert-base-uncased', strip_sep_token=True) for CLIPA models,
ref embedders.py:617-645)."""

import numpy as np
import pytest

from novic_tpu.text.wordpiece import BertWordPieceTokenizer, basic_tokenize

VOCAB_TOKENS = (
    ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    + ["a", "an", "the", "photo", "of", "dog", "cat", "fire", "truck",
       "un", "##aff", "##able", "##s", "##ing", "run", "jump", "!", ",", ".",
       "'", '"', "-", "do", "##g", "##gy", "fluff", "##y", "arm", "##adi",
       "##llo", "12", "##3", "x", "##x"]
)

TEXTS = [
    "a photo of a dog",
    "A PHOTO OF A CAT",           # uncased folding
    "fire truck!",                # punctuation split
    "doggy, fluffy armadillo.",   # multi-piece words
    "unaffable running",          # ## continuations + unknown suffix
    "café dog",             # combining accent stripped (-> cafe = [UNK])
    "zzz unknownword dog",        # [UNK] handling
    "123 xx x",                   # digit pieces
    "  extra   spaces\tand\nnewlines  ",
    "dog" * 40,                   # > 100 chars -> [UNK]
    "don't stop",
    "...",
    "你好 dog",           # CJK chars split individually -> [UNK]s
]


@pytest.fixture(scope="module")
def hf_tokenizer(tmp_path_factory):
    transformers = pytest.importorskip("transformers")
    d = tmp_path_factory.mktemp("wp")
    vocab_file = d / "vocab.txt"
    vocab_file.write_text("\n".join(VOCAB_TOKENS) + "\n")
    return transformers.BertTokenizerFast(vocab_file=str(vocab_file),
                                          do_lower_case=True), str(vocab_file)


def test_encode_parity_vs_hf(hf_tokenizer):
    hf, vocab_file = hf_tokenizer
    ours = BertWordPieceTokenizer(vocab_file, context_length=32)
    for text in TEXTS:
        expect = hf.encode(text, add_special_tokens=False)
        got = ours.encode(text)
        assert got == expect, f"{text!r}: {got} != {expect}"


def test_clipa_style_ids_parity(hf_tokenizer):
    """Full CLIPA input ids: [CLS] + pieces + [SEP], pad to max_length,
    then every [SEP] zeroed (open_clip HFTokenizer strip_sep_token)."""
    hf, vocab_file = hf_tokenizer
    ctx = 16
    ours = BertWordPieceTokenizer(vocab_file, context_length=ctx)
    enc = hf(TEXTS, padding="max_length", truncation=True, max_length=ctx)
    ref_ids = np.asarray(enc["input_ids"])
    ref_ids[ref_ids == hf.sep_token_id] = 0  # strip_sep_token

    got = ours.tokenize(TEXTS, output_dict=True)["input_ids"]
    # The embedder pads minimally then to full context (base.py
    # inference_tokens); emulate that final pad here
    full = np.full((len(TEXTS), ctx), ours.pad_token_id, dtype=got.dtype)
    full[:, :got.shape[1]] = got[:, :ctx]
    np.testing.assert_array_equal(full, ref_ids)


def test_special_ids_and_metadata(hf_tokenizer):
    _, vocab_file = hf_tokenizer
    tok = BertWordPieceTokenizer(vocab_file, context_length=32)
    assert tok.start_token_id == VOCAB_TOKENS.index("[CLS]")
    # strip-SEP convention: effective end token IS pad (ref embedders.py:644)
    assert tok.end_token_id == tok.pad_token_id == VOCAB_TOKENS.index("[PAD]")
    assert tok.vocab_size == len(VOCAB_TOKENS)
    assert not tok.cased


def test_decode_roundtrip():
    tok = BertWordPieceTokenizer(list(VOCAB_TOKENS), context_length=32)
    ids = tok.encode("a photo of a doggy")
    assert tok.decode(ids) == "a photo of a doggy"


def test_basic_tokenize_rules():
    assert basic_tokenize("Hello, World!") == ["hello", ",", "world", "!"]
    assert basic_tokenize("café") == ["cafe"]
    assert basic_tokenize("你好dog") == ["你", "好", "dog"]


def test_missing_special_raises(tmp_path):
    p = tmp_path / "bad.txt"
    p.write_text("a\nb\nc\n")
    with pytest.raises(ValueError, match="missing"):
        BertWordPieceTokenizer(str(p))
