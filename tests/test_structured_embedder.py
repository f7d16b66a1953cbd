"""Unit tests for the structured dual-modality test embedder
(novic_tpu/embedders/structured.py — the geometry behind MODALITY_GAP.md)."""

import numpy as np
import pytest

from novic_tpu.embedders.base import Embedder
from novic_tpu.embedders.structured import (
    IMG_SIZE,
    decode_class_image,
    encode_class_image,
    make_structured_vocab,
    write_structured_cls_dataset,
)


def make(spec="test-structured:64:60:10:3", lexicon=None):
    if lexicon is None:
        lexicon = {"dog": "dog", "dogs": "dog", "cat": "cat", "cats": "cat",
                   "fire truck": "fire truck", "fire trucks": "fire truck"}
    return Embedder.create(spec, lexicon=lexicon)


def angle(a, b):
    return np.degrees(np.arccos(np.clip(float(a @ b), -1, 1)))


def test_image_roundtrip_through_preprocessing():
    import PIL.Image

    e = make()
    rng = np.random.default_rng(5)
    img = encode_class_image("dog", rng)
    px = e.get_image_transform()([PIL.Image.fromarray(img)])
    assert decode_class_image(px[0]) == "dog"
    emb = e.inference_image(px)
    assert emb.shape == (1, 64)
    # Image embedding: within jitter of the image center, exactly gap away
    # from the prototype at the center
    assert angle(emb[0], e.image_center("dog")) <= 10.0 + 1e-6
    assert abs(angle(e.image_center("dog"), e.prototype("dog")) - 60.0) < 1e-6


def test_text_geometry_and_lexicon():
    e = make()
    t = e.inference_text(["a photo of a dog", "many dogs here", "a cat photo",
                          "two fire trucks", "nothing relevant"])
    assert np.allclose(np.linalg.norm(t, axis=-1), 1.0, atol=1e-6)
    assert angle(t[0], e.prototype("dog")) <= 10.0 + 1e-6
    assert angle(t[1], e.prototype("dog")) <= 10.0 + 1e-6       # plural variant
    assert angle(t[2], e.prototype("cat")) <= 10.0 + 1e-6
    assert angle(t[3], e.prototype("fire truck")) <= 10.0 + 1e-6  # multi-word
    # unmatched text falls back to an (almost surely) orthogonal hash vector
    assert angle(t[4], e.prototype("dog")) > 45.0
    # determinism + token-path/string-path agreement
    assert np.allclose(e.inference_text(["a photo of a dog"])[0], t[0])
    tok = e.tokenize(["a photo of a dog"], output_dict=True)
    assert np.allclose(e.inference_tokens(tok)[0], t[0], atol=1e-6)


def test_multiset_text_lands_between_prototypes():
    e = make()
    t = e.inference_text(["a photo of a dog and a cat"])[0]
    mid = e.prototype("dog") + e.prototype("cat")
    mid = mid / np.linalg.norm(mid)
    assert angle(t, mid) <= 10.0 + 1e-6


def test_gap_mix_makes_gap_class_dependent():
    g1 = make("test-structured:64:60:0:3")          # purely global gap
    gm = make("test-structured:64:60:0:3:0.5")      # half per-class
    # With a global gap, image-minus-text offsets of different classes are
    # nearly parallel (a translation compensates); with gap_mix < 1 they
    # diverge (translation cannot)
    def offsets(e):
        return [e.image_center(n) - e.prototype(n) for n in ("dog", "cat")]

    o1, om = offsets(g1), offsets(gm)
    cos1 = float(o1[0] @ o1[1]) / (np.linalg.norm(o1[0]) * np.linalg.norm(o1[1]))
    cosm = float(om[0] @ om[1]) / (np.linalg.norm(om[0]) * np.linalg.norm(om[1]))
    # even a purely global gap has per-class (cos g - 1) * prototype terms in
    # the offset, so "nearly parallel" here means cos ~0.64 at gap 60 deg
    assert cos1 > 0.55
    assert cosm < cos1 - 0.3
    # the gap ANGLE itself is unchanged by the mix
    for n in ("dog", "cat"):
        assert abs(angle(gm.image_center(n), gm.prototype(n)) - 60.0) < 1e-6


def test_crowding_reduces_prototype_separation():
    easy = make("test-structured:64:60:0:3")
    hard = make("test-structured:64:60:0:3:1.0:0:0.6")  # crowd=0.6
    nouns = [f"n{i}" for i in range(20)]
    def mean_cos(e):
        protos = np.stack([e.prototype(n) for n in nouns])
        cos = protos @ protos.T
        return float(cos[np.triu_indices(len(nouns), 1)].mean())
    # crowd=0: ~orthogonal; crowd=0.6: expected pairwise cosine ~= 0.36
    assert abs(mean_cos(easy)) < 0.15
    assert abs(mean_cos(hard) - 0.36) < 0.12
    for e in (easy, hard):  # prototypes stay unit
        for n in nouns[:3]:
            assert abs(np.linalg.norm(e.prototype(n)) - 1.0) < 1e-6


def test_gap_spread_varies_per_class_magnitude():
    e = make("test-structured:64:60:0:3:1.0:20")  # gap 60 +- 20
    nouns = [f"n{i}" for i in range(30)]
    gaps = np.asarray([angle(e.image_center(n), e.prototype(n)) for n in nouns])
    assert (gaps >= 40.0 - 1e-6).all() and (gaps <= 80.0 + 1e-6).all()
    assert gaps.std() > 5.0            # actually spread out
    assert abs(gaps.mean() - 60) < 8.0  # centered on the nominal gap
    # per-class magnitude is deterministic
    assert angle(e.image_center("dog"), e.prototype("dog")) == \
        pytest.approx(e.class_gap_deg("dog"), abs=1e-6)


def test_vocab_and_dataset_writers(tmp_path):
    vocab = make_structured_vocab(5, freq=3, seed=2)
    assert len({e["target_noun"] for e in vocab}) == 5
    nouns = [e["target_noun"] for e in vocab]
    root = write_structured_cls_dataset(str(tmp_path), nouns, 2, seed=0)
    from novic_tpu.data.classification import load_image_dataset

    ds = load_image_dataset("Food101", root, split="valid")
    assert len(ds) == 10 and set(ds.classes) == set(nouns)
    img, label = ds[0]
    px = np.asarray(img)
    assert px.shape == (IMG_SIZE, IMG_SIZE, 3)


def test_bad_specs_raise():
    with pytest.raises(ValueError):
        Embedder.create("test-structured:64:60:10:3:0.5:extra")
    with pytest.raises(ValueError):
        encode_class_image("x" * 40)
