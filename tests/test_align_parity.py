"""Differential parity: ALIGN towers (EfficientNet + BERT) vs transformers.

Locally random-initialized AlignModel (no downloads), converted via
novic_tpu.embedders.convert.convert_align_model, forward outputs compared —
the same guarantee the reference implicitly gets by calling transformers
(reference embedders.py:766-907 TransformersEmbedder, supported spec
`transformers:kakaobrain/align-base`, reference config/train.yaml:135).
"""

import dataclasses
import json

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-tier (pytest --full)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from transformers.models.align.configuration_align import (  # noqa: E402
    AlignConfig,
    AlignTextConfig,
    AlignVisionConfig,
)
from transformers.models.align.modeling_align import AlignModel  # noqa: E402

from novic_tpu.embedders.align import (  # noqa: E402
    AlignTextConfig as OurTextConfig,
    AlignVisionConfig as OurVisionConfig,
    BertTextTower,
    EfficientNetTower,
    align_block_plan,
)
from novic_tpu.embedders.convert import align_cfg_from_hf, convert_align_model  # noqa: E402


def _randomize_bn(model):
    """Non-trivial BN running stats so the scale/bias folding is exercised."""
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)
                m.weight.normal_(1.0, 0.2)
                m.bias.normal_(0, 0.2)


@pytest.fixture(scope="module")
def hf_align():
    # Tiny 2-stage trunk exercising both block variants (expand_ratio 1 and 6,
    # stride 1 and 2, k3 and k5, repeated blocks with residual). in_channels[0]
    # must stay 32: the HF stem hardcodes round_filters(32) as its output dim.
    vision_cfg = AlignVisionConfig(
        image_size=17, width_coefficient=0.25, depth_coefficient=1.0, depth_divisor=4,
        kernel_sizes=[3, 5], in_channels=[32, 48], out_channels=[48, 64],
        strides=[1, 2], num_block_repeats=[1, 2], expand_ratios=[1, 6],
        hidden_dim=64, depthwise_padding=[])
    text_cfg = AlignTextConfig(
        vocab_size=50, hidden_size=16, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=32, max_position_embeddings=24, pad_token_id=0)
    cfg = AlignConfig(text_config=text_cfg.to_dict(), vision_config=vision_cfg.to_dict(),
                      projection_dim=16)  # must equal the trunk output round_filters(64)=16:
    # ALIGN images are NOT projected, so joint dim == trunk dim (B7: 640)
    torch.manual_seed(0)
    model = AlignModel(cfg).eval()
    _randomize_bn(model)
    return model


def test_align_vision_parity(hf_align):
    v_params, _ = convert_align_model(hf_align)
    our_cfg = align_cfg_from_hf(hf_align.config.vision_config)
    our_cfg = dataclasses.replace(our_cfg, image_size=17, compute_dtype="float32")
    rng = np.random.default_rng(0)
    imgs = rng.normal(size=(2, 17, 17, 3)).astype(np.float32)
    with torch.no_grad():
        ref = hf_align.get_image_features(
            torch.from_numpy(imgs.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(EfficientNetTower(cfg=our_cfg).apply({"params": v_params}, imgs))
    assert ref.shape == ours.shape == (2, 16)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_align_text_parity(hf_align):
    _, t_params = convert_align_model(hf_align)
    our_cfg = OurTextConfig(context_length=10, vocab_size=50, width=16, layers=2,
                            heads=2, mlp_dim=32, max_position_embeddings=24,
                            embed_dim=16, compute_dtype="float32")
    ids = np.zeros((3, 10), np.int32)
    ids[0, :5] = [2, 7, 9, 4, 3]
    ids[1, :3] = [2, 11, 3]
    ids[2, :7] = [2, 5, 6, 7, 8, 9, 3]
    mask = torch.from_numpy((ids != 0).astype(np.int64))
    with torch.no_grad():
        ref = hf_align.get_text_features(
            input_ids=torch.from_numpy(ids.astype(np.int64)),
            attention_mask=mask).numpy()
    ours = np.asarray(BertTextTower(cfg=our_cfg).apply({"params": t_params}, ids))
    assert ref.shape == ours.shape == (3, 16)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_align_b7_topology_parity():
    """Full align-base (EfficientNet-B7) block topology — real width/depth
    coefficients, 55 blocks — vs HF, at a reduced image size (the trunk is
    fully convolutional, so topology/parity are size-independent)."""
    torch.manual_seed(1)
    hf_cfg = AlignVisionConfig(image_size=65)
    from transformers.models.align.modeling_align import AlignVisionModel

    model = AlignVisionModel(hf_cfg).eval()
    _randomize_bn(model)
    our_cfg = align_cfg_from_hf(hf_cfg)
    assert our_cfg.embed_dim == 640
    plan = align_block_plan(our_cfg)
    assert len(plan) == 55 == len(model.encoder.blocks)
    assert sum(p.stride == 2 for p in plan) == 4

    sd = {f"vision_model.{k}": v for k, v in model.state_dict().items()}
    from novic_tpu.embedders.convert import convert_align_vision

    v_params = convert_align_vision(sd, our_cfg, eps=hf_cfg.batch_norm_eps)
    our_cfg = dataclasses.replace(our_cfg, image_size=65, compute_dtype="float32")
    rng = np.random.default_rng(1)
    imgs = rng.normal(size=(1, 65, 65, 3)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(imgs.transpose(0, 3, 1, 2))).pooler_output.numpy()
    ours = np.asarray(EfficientNetTower(cfg=our_cfg).apply({"params": v_params}, imgs))
    assert ref.shape == ours.shape == (1, 640)
    # 55 folded BNs accumulate a little more float error than the tiny config
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_align_registry_and_local_hf_dir(tmp_path):
    from novic_tpu.embedders.registry import lookup

    arch = lookup("transformers:kakaobrain/align-base")
    assert arch.family == "align" and arch.tokenizer == "bert"
    assert arch.vision.embed_dim == arch.text.embed_dim == 640
    assert arch.preprocess.size == 289 and arch.preprocess.resize_size == 346

    # A local HF checkpoint dir's configs are authoritative (offline flow)
    d = tmp_path / "align_ckpt"
    d.mkdir()
    (d / "config.json").write_text(json.dumps({
        "model_type": "align", "projection_dim": 12,
        "vision_config": {"width_coefficient": 0.25, "depth_coefficient": 1.0,
                          "depth_divisor": 4, "kernel_sizes": [3, 5],
                          "in_channels": [32, 48], "out_channels": [48, 64],
                          "strides": [1, 2], "num_block_repeats": [1, 2],
                          "expand_ratios": [1, 6]},
        "text_config": {"vocab_size": 50, "hidden_size": 16,
                        "num_hidden_layers": 2, "num_attention_heads": 2,
                        "intermediate_size": 32},
    }))
    (d / "preprocessor_config.json").write_text(json.dumps({
        "size": {"height": 40, "width": 40}, "do_center_crop": True,
        "crop_size": {"height": 32, "width": 32}, "resample": 3,
        "image_mean": [0.4, 0.4, 0.4], "image_std": [0.2, 0.2, 0.2],
    }))
    arch = lookup(f"transformers:{d}")
    assert arch.family == "align"
    assert arch.vision.embed_dim == 16 and arch.text.embed_dim == 12
    assert arch.preprocess.size == 32 and arch.preprocess.resize_size == 40
    assert arch.preprocess.interpolation == "bicubic"
    assert arch.preprocess.mean == (0.4, 0.4, 0.4)
    # include_top (default True) double-divides by std → folded as std²
    assert arch.preprocess.std == pytest.approx((0.04, 0.04, 0.04))
    assert arch.vision.image_size == 32

    # Without a preprocessor_config.json the fallback must match the
    # registry entry (folded std 0.25), not the raw 0.5
    d2 = tmp_path / "align_ckpt_nopp"
    d2.mkdir()
    (d2 / "config.json").write_text((d / "config.json").read_text())
    arch2 = lookup(f"transformers:{d2}")
    assert arch2.preprocess.std == (0.25, 0.25, 0.25)
    assert arch2.preprocess.size == 289 and arch2.preprocess.resize_size == 346


def test_align_wordpiece_keep_sep(tmp_path):
    """ALIGN keeps [SEP] as the end token (standard BERT ids, the reference's
    AutoTokenizer path ref embedders.py:803-815), unlike CLIPA's strip-SEP
    convention; full padded ids match BertTokenizerFast."""
    from novic_tpu.text.wordpiece import BertWordPieceTokenizer

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "a", "photo", "of", "cat", "##s"]
    vocab_file = tmp_path / "vocab.txt"
    vocab_file.write_text("\n".join(vocab) + "\n")
    texts = ["a photo of cats", "cat", "a cat photo of a cat"]
    ctx = 10
    tok = BertWordPieceTokenizer(str(vocab_file), context_length=ctx, keep_sep=True)
    assert tok.start_token_id == 2 and tok.end_token_id == 3 and tok.pad_token_id == 0

    hf = transformers.BertTokenizerFast(vocab_file=str(vocab_file), do_lower_case=True)
    ref_ids = np.asarray(hf(texts, padding="max_length", truncation=True,
                            max_length=ctx)["input_ids"])
    got = tok.tokenize(texts, output_dict=True)["input_ids"]
    full = np.full((len(texts), ctx), tok.pad_token_id, dtype=got.dtype)
    full[:, :got.shape[1]] = got[:, :ctx]
    np.testing.assert_array_equal(full, ref_ids)


def test_align_embedder_create_and_tp_refusal(tmp_path):
    """Full JaxEmbedder path for the align family on a tiny local-HF-dir arch:
    random-init towers, text+image inference round trip, unit-norm outputs,
    and the loud TP refusal (conv tower cannot be Megatron-sharded)."""
    import jax

    from novic_tpu.embedders.base import Embedder

    d = tmp_path / "tiny_align"
    d.mkdir()
    (d / "config.json").write_text(json.dumps({
        "model_type": "align", "projection_dim": 16,
        "vision_config": {"width_coefficient": 0.25, "depth_coefficient": 1.0,
                          "depth_divisor": 4, "kernel_sizes": [3, 5],
                          "in_channels": [32, 48], "out_channels": [48, 64],
                          "strides": [1, 2], "num_block_repeats": [1, 2],
                          "expand_ratios": [1, 6]},
        "text_config": {"vocab_size": 64, "hidden_size": 16,
                        "num_hidden_layers": 2, "num_attention_heads": 2,
                        "intermediate_size": 32, "max_position_embeddings": 24},
    }))
    (d / "preprocessor_config.json").write_text(json.dumps({
        "size": {"height": 20, "width": 20}, "do_center_crop": False,
        "resample": 0, "image_mean": [0.5, 0.5, 0.5], "image_std": [0.5, 0.5, 0.5],
    }))
    emb = Embedder.create(f"transformers:{d}", load_model=True,
                          inference_batch_size=4, image_batch_size=4,
                          compute_dtype="float32")
    assert emb.embed_dim == 16
    txt = emb.inference_text(["a photo of a cat", "dog"])
    assert txt.shape == (2, 16)
    np.testing.assert_allclose(np.linalg.norm(txt, axis=-1), 1.0, rtol=1e-5)
    rng = np.random.default_rng(0)
    imgs = rng.normal(size=(3, 20, 20, 3)).astype(np.float32)
    out = emb.inference_image(imgs)
    assert out.shape == (3, 16)
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, rtol=1e-5)

    from jax.sharding import Mesh

    devs = np.array(jax.devices()[:2])
    with pytest.raises(ValueError, match="ALIGN"):
        emb.set_mesh(Mesh(devs, ("model",)), mode="tp")
    # DP serving works (batch sharded over 'data')
    emb.set_mesh(Mesh(devs, ("data",)), mode="dp")
    out_dp = emb.inference_image(imgs)
    np.testing.assert_allclose(out_dp, out, rtol=2e-5, atol=2e-6)
