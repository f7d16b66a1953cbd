"""Native SentencePiece unigram tokenizer: proto round-trip, Viterbi
segmentation, byte fallback, and the SigLIP TextTokenizer adapter
(ref embedders.py:640-652 uses open_clip's SigLipTokenizer for this)."""

import numpy as np
import pytest

from novic_tpu.text.sentencepiece import (
    BYTE, CONTROL, NORMAL, UNKNOWN, PrecompiledCharsmap, SentencePieceProcessor,
    SentencePieceTokenizer, build_model_proto, build_precompiled_charsmap,
    canonicalize_text, parse_model_proto)


def make_model(extra=(), **kw):
    pieces = [
        ("<pad>", 0.0, CONTROL),      # 0
        ("<unk>", 0.0, UNKNOWN),      # 1
        ("</s>", 0.0, CONTROL),       # 2
        ("▁a", -2.0, NORMAL),         # 3
        ("▁ab", -1.0, NORMAL),        # 4
        ("▁abc", -5.0, NORMAL),       # 5
        ("b", -2.5, NORMAL),          # 6
        ("c", -1.0, NORMAL),          # 7
        ("▁", -3.0, NORMAL),          # 8
        ("d", -2.0, NORMAL),          # 9
    ] + list(extra)
    kw.setdefault("unk_id", 1)
    kw.setdefault("eos_id", 2)
    kw.setdefault("pad_id", 0)
    return parse_model_proto(build_model_proto(pieces, **kw))


def test_proto_roundtrip():
    m = make_model()
    assert m.pieces[3] == "▁a"
    assert m.scores[4] == pytest.approx(-1.0)
    assert m.types[1] == UNKNOWN
    assert (m.unk_id, m.eos_id, m.pad_id) == (1, 2, 0)
    assert m.add_dummy_prefix
    # Negative ids survive the varint encoding (bos_id default -1)
    assert m.bos_id == -1


def test_viterbi_picks_best_path():
    sp = SentencePieceProcessor(make_model())
    # "ab": [▁ab]=-1 beats [▁a,b]=-4.5
    assert sp.encode("ab") == [4]
    # "abc": [▁ab,c]=-2 beats [▁abc]=-5 and [▁a,b,c]=-5.5
    assert sp.encode("abc") == [4, 7]
    assert sp.encode("abc", out_pieces=True) == ["▁ab", "c"]
    # multi-word: whitespace escaped to ▁ per word
    assert sp.encode("ab ab") == [4, 4]


def test_unknown_char_maps_to_unk():
    sp = SentencePieceProcessor(make_model())
    ids = sp.encode("axb")
    # ▁a, <unk>(x), b
    assert ids == [3, 1, 6]
    assert sp.decode(ids) == "a ⁇ b".replace(" ⁇ ", "⁇")  # unk renders as ⁇


def test_byte_fallback():
    byte_pieces = [(f"<0x{b:02X}>", -10.0, BYTE) for b in range(256)]
    sp = SentencePieceProcessor(make_model(extra=byte_pieces))
    ids = sp.encode("aé")  # é = 0xC3 0xA9 in UTF-8
    assert ids[0] == 3  # ▁a
    base = 10
    assert ids[1:] == [base + 0xC3, base + 0xA9]
    assert sp.decode(ids) == "aé"


def test_decode_roundtrip_and_specials():
    sp = SentencePieceProcessor(make_model())
    ids = sp.encode("ab cd")
    text = sp.decode([0, 2] + ids)  # control tokens skipped
    assert text == "ab cd"


def test_canonicalize_text():
    assert canonicalize_text("Hello,  World!") == "hello world"
    assert canonicalize_text("a.b.c") == "abc"


def test_tokenizer_adapter():
    data = build_model_proto([
        ("<pad>", 0.0, CONTROL), ("<unk>", 0.0, UNKNOWN), ("</s>", 0.0, CONTROL),
        ("▁a", -2.0, NORMAL), ("▁ab", -1.0, NORMAL), ("b", -2.5, NORMAL),
        ("c", -1.0, NORMAL),
    ], unk_id=1, eos_id=2, pad_id=0)
    tok = SentencePieceTokenizer(data, context_length=8)
    assert tok.vocab_size == 7
    assert tok.end_token_id == 2 and tok.pad_token_id == 0 and tok.start_token_id is None
    out = tok.tokenize(["Ab!", "abc abc"], output_dict=True)
    ids, mask = out["input_ids"], out["attention_mask"]
    # "ab" -> [▁ab, </s>]; "abc abc" -> [▁ab, c, ▁ab, c, </s>]
    assert ids.shape == (2, 5)
    np.testing.assert_array_equal(ids[0], [4, 2, 0, 0, 0])
    np.testing.assert_array_equal(ids[1], [4, 6, 4, 6, 2])
    np.testing.assert_array_equal(mask[0], [1, 1, 0, 0, 0])
    # detokenize strips specials
    assert tok.detokenize(ids) == ["ab", "abc abc"]


def test_tokenizer_truncation():
    data = build_model_proto([
        ("<pad>", 0.0, CONTROL), ("<unk>", 0.0, UNKNOWN), ("</s>", 0.0, CONTROL),
        ("▁a", -1.0, NORMAL),
    ], unk_id=1, eos_id=2, pad_id=0)
    tok = SentencePieceTokenizer(data, context_length=4)
    ids = tok.tokenize("a a a a a a a a")
    assert ids.shape[1] <= 4
    assert ids[0, -1] == 2  # end token survives truncation


def test_pkg_parity_viterbi_and_normalization():
    """Parity of the native unigram encoder vs the official sentencepiece
    package over NFKC-sensitive and multi-space inputs — and, when the
    package is not installed, vs the HF tokenizers Rust pipeline (the
    production sentencepiece replication), so the check always runs."""
    data = build_model_proto([
        ("<pad>", 0.0, CONTROL), ("<unk>", 0.0, UNKNOWN), ("</s>", 0.0, CONTROL),
        ("▁", -3.0, NORMAL), ("▁a", -1.0, NORMAL), ("a", -2.0, NORMAL),
        ("b", -2.5, NORMAL), ("▁ab", -1.5, NORMAL), ("c", -2.2, NORMAL),
        ("▁abc", -1.2, NORMAL), ("ﬁ", -4.0, NORMAL), ("f", -2.8, NORMAL),
        ("i", -2.9, NORMAL),
    ], unk_id=1, eos_id=2, pad_id=0)
    native = SentencePieceTokenizer(data, context_length=16, canonicalize=False,
                                    prefer_native=True)
    try:
        import sentencepiece as spm

        pkg = spm.SentencePieceProcessor()
        pkg.LoadFromSerializedProto(data)
        encode_ref = lambda t: list(pkg.EncodeAsIds(t))  # noqa: E731
        cases = ["abc", "ab c", "  ab   c  ", "a b", "ﬁb",  # NFKC: fi-lig
                 "ABC", "abc abc abc", "", " "]
    except ImportError:
        encode_ref = _hf_unigram_encoder(
            [("<pad>", 0.0), ("<unk>", 0.0), ("</s>", 0.0), ("▁", -3.0),
             ("▁a", -1.0), ("a", -2.0), ("b", -2.5), ("▁ab", -1.5),
             ("c", -2.2), ("▁abc", -1.2), ("ﬁ", -4.0), ("f", -2.8),
             ("i", -2.9)], unk_id=1)
        # The Rust pipeline approximates remove_extra_whitespaces with a
        # collapse-only Replace (no strip): compare on clean strings; the
        # strip/multi-space cases are pinned natively above.
        cases = ["abc", "ab c", "a b", "ABC", "abc abc abc", ""]
    for text in cases:
        assert native.encode(text) == encode_ref(text), text


def _hf_unigram_encoder(vocab, unk_id, charsmap: bytes = b""):
    """Build the HF tokenizers Rust pipeline the way its SpmConverter
    replicates sentencepiece: [Precompiled +] whitespace collapse +
    Metaspace(prepend always) + Unigram."""
    from tokenizers import Regex, Tokenizer, models, normalizers, pre_tokenizers

    tok = Tokenizer(models.Unigram(vocab, unk_id=unk_id))
    norms = []
    if charsmap:
        norms.append(normalizers.Precompiled(charsmap))
    norms.append(normalizers.Replace(Regex(" {2,}"), " "))
    tok.normalizer = normalizers.Sequence(norms)
    tok.pre_tokenizer = pre_tokenizers.Metaspace(replacement="▁",
                                                 prepend_scheme="always")
    return lambda text: tok.encode(text).ids


def test_charsmap_parity_vs_rust_tokenizers():
    """Native PrecompiledCharsmap == HF tokenizers' normalizers.Precompiled
    (the production Rust spm_precompiled implementation) on a synthetic
    charsmap serialized in the sentencepiece blob format."""
    tokenizers = pytest.importorskip("tokenizers")

    mapping = {
        "ﬁ": "fi", "ﬂ": "fl",              # NFKC ligatures
        "Ⅸ": "IX", "①": "1", "…": "...",  # 1-to-many expansions
        "ｅ": "e", "ｘ": "x",                # fullwidth folds
        "á": "á",                         # multi-codepoint source
        " ": " ",                               # nbsp -> space
        "€": "EUR",                             # multi-byte -> multi-char
    }
    blob = build_precompiled_charsmap(mapping)
    ours = PrecompiledCharsmap(blob)
    rust = tokenizers.normalizers.Precompiled(blob)

    cases = ["ﬁnal ﬂow", "Ⅸ①…", "ｅｘample",
             "á b", "a b", "price: 12€", "plain ascii", "",
             "ﬁﬁﬁ", "mixｅd ﬁ①",
             "unmapped ü ö 漢字"]
    for text in cases:
        assert ours.transform(text) == rust.normalize_str(text), text


def test_charsmap_longest_match_and_pool():
    """Longest-match semantics (ref sentencepiece normalizer.cc): a key that
    extends another key wins when both match."""
    blob = build_precompiled_charsmap({"a": "X", "abc": "Y", "ab": "Z"})
    cm = PrecompiledCharsmap(blob)
    assert cm.transform("abc") == "Y"
    assert cm.transform("ab") == "Z"
    assert cm.transform("a") == "X"
    assert cm.transform("abd") == "Zd"
    assert cm.transform("zabcz") == "zYz"
    # common_prefix_search returns ascending match lengths
    lengths = [ln for ln, _ in cm.common_prefix_search(b"abc")]
    assert lengths == [1, 2, 3]


def test_charsmap_flows_from_model_proto():
    """A .model carrying a precompiled charsmap normalizes through it (exact
    normalization, not the NFKC approximation)."""
    charsmap = build_precompiled_charsmap({"Œ": "OE"})
    data = build_model_proto([
        ("<pad>", 0.0, CONTROL), ("<unk>", 0.0, UNKNOWN), ("</s>", 0.0, CONTROL),
        ("▁", -3.0, NORMAL), ("O", -1.0, NORMAL), ("E", -1.0, NORMAL),
        ("▁OE", -0.5, NORMAL),
    ], unk_id=1, eos_id=2, pad_id=0, precompiled_charsmap=charsmap)
    model = parse_model_proto(data)
    assert model.precompiled_charsmap == charsmap
    sp = SentencePieceProcessor(model)
    # The OE ligature is NOT an NFKC mapping (NFKC keeps it); only the
    # charsmap folds it
    assert sp.encode("Œ", out_pieces=True) == ["▁OE"]


def test_unigram_end_to_end_parity_vs_rust_tokenizers():
    """Native encode == the HF tokenizers Rust Unigram pipeline (charsmap
    normalization + Metaspace + Viterbi + fused unknowns) on shared assets."""
    pytest.importorskip("tokenizers")

    charsmap = build_precompiled_charsmap({"ﬁ": "fi", "①": "1"})
    vocab = [("<pad>", 0.0), ("<unk>", 0.0), ("</s>", 0.0), ("▁", -3.0),
             ("▁a", -1.0), ("a", -2.0), ("b", -2.5), ("▁ab", -1.5),
             ("c", -2.2), ("▁abc", -1.2), ("f", -2.8), ("i", -2.9),
             ("▁1", -2.0), ("1", -2.4)]
    data = build_model_proto(
        [(p, s, UNKNOWN if p == "<unk>" else CONTROL if p in ("<pad>", "</s>")
          else NORMAL) for p, s in vocab],
        unk_id=1, eos_id=2, pad_id=0, precompiled_charsmap=charsmap)
    native = SentencePieceTokenizer(data, context_length=32, canonicalize=False,
                                    prefer_native=True)
    encode_ref = _hf_unigram_encoder(vocab, unk_id=1, charsmap=charsmap)
    cases = ["abc", "ﬁb", "① abc", "a b c", "abc abc", "axxb",
             "x", "ﬁﬁ", "cab", "abca"]
    for text in cases:
        assert native.encode(text) == encode_ref(text), text
