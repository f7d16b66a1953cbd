"""Differential test: from-scratch CLIP BPE vs transformers.CLIPTokenizer.

Constructs a tiny consistent vocab/merges pair locally (no downloads) and
checks token IDs agree exactly — the same guarantee the reference gets from
its tokenizer self-check (embedders.py:571-579).
"""

import json
import os

import pytest

from novic_tpu.text.clip_bpe import CLIPBPETokenizer, bytes_to_unicode

MERGES = ["o g</w>", "d og</w>", "a t</w>", "c at</w>", "r e", "e e</w>", "t re", "tre e</w>"]

TEXTS = ["a dog", "tree dog!", "cat", "catdog tree", "DOG cat", "  spaced   out  ", "og re"]


@pytest.fixture(scope="module")
def vocab_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("clip_vocab")
    be = bytes_to_unicode()
    vocab = list(be.values())
    vocab = vocab + [v + "</w>" for v in vocab]
    for m in MERGES:
        vocab.append("".join(m.split()))
    vocab += ["<|startoftext|>", "<|endoftext|>"]
    with open(os.path.join(d, "vocab.json"), "w") as f:
        json.dump({v: i for i, v in enumerate(vocab)}, f)
    with open(os.path.join(d, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n" + "\n".join(MERGES) + "\n")
    return str(d)


def test_matches_hf_clip_tokenizer(vocab_dir):
    transformers = pytest.importorskip("transformers")
    hf = transformers.CLIPTokenizer(
        os.path.join(vocab_dir, "vocab.json"), os.path.join(vocab_dir, "merges.txt"))
    mine = CLIPBPETokenizer(os.path.join(vocab_dir, "merges.txt"))
    assert mine.vocab_size == len(hf.get_vocab())
    assert mine.start_token_id == hf.bos_token_id
    assert mine.end_token_id == hf.eos_token_id
    out = hf(TEXTS, padding=True)
    d = mine.tokenize(TEXTS, output_dict=True)
    assert d["input_ids"].tolist() == out["input_ids"]
    assert d["attention_mask"].tolist() == out["attention_mask"]


def test_roundtrip_and_truncation(vocab_dir):
    mine = CLIPBPETokenizer(os.path.join(vocab_dir, "merges.txt"))
    ids = mine.tokenize(["a dog", "cat"], max_tokens=4)
    assert ids.shape[1] <= 4
    # End token always present even when truncated
    assert (ids == mine.end_token_id).any(axis=1).all()
    assert mine.detokenize(mine.tokenize("tree dog")[0]) == "tree dog"
