"""EVA02 tower differential vs an independent torch mirror.

timm/open_clip are not installed in this environment, so unlike the other
families this cannot diff against the upstream package live. Instead, this
file carries a second, independent torch implementation of the documented
EVA02 block spec (timm eva.py semantics: rope-cat rotary embedding skipping
the cls token, k-bias-free attention with sub-LN, SwiGLU with inner LN; see
novic_tpu/embedders/eva.py docstring and PARITY.md 'EVA02 provenance'),
exporting a timm-style `visual.trunk.*` state dict that exercises the real
converter path. Agreement pins the JAX port + converter against torch float
semantics; weight-level parity vs real checkpoints closes via
exp/validate_released.py when assets are on disk.
"""

import dataclasses
import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402

from novic_tpu.embedders.convert import convert_openclip_state_dict  # noqa: E402
from novic_tpu.embedders.eva import (  # noqa: E402
    EvaVisionConfig,
    EvaVisionTransformer,
    rope_cat_table,
)

EPS = 1e-6


def _rope_table_torch(grid, ref, head_dim):
    """Independent rope-cat table (do NOT call the implementation's
    rope_cat_table here): per-axis head_dim//4 bands at temperature 1e4,
    coordinates rescaled by ref/grid, each band's angle duplicated into an
    adjacent channel pair, rows-axis channels first, [sin | cos] concat.
    Built positionwise with explicit loops for independence."""
    bands = head_dim // 4
    table = torch.zeros(grid * grid, 2 * head_dim, dtype=torch.float64)
    for row in range(grid):
        for col in range(grid):
            n = row * grid + col
            chans = []
            for coord in (row, col):                      # y first, then x
                c = coord * ref / grid if ref else float(coord)
                for b in range(bands):
                    ang = c / (10000.0 ** (b / bands))
                    chans += [ang, ang]                   # paired channels
            a = torch.tensor(chans)
            table[n, :head_dim] = torch.sin(a)
            table[n, head_dim:] = torch.cos(a)
    return table.to(torch.float32)


def test_rope_table_cross_implementation():
    """The flax implementation's vectorized table == the loop-built one."""
    ours = rope_cat_table(3, 4, 16)
    ref = _rope_table_torch(3, 4, 16).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-7)
    ours = rope_cat_table(5, 0, 8)
    ref = _rope_table_torch(5, 0, 8).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-7)


def _apply_rope_torch(x, table):
    """x: (B, H, N, hd); table (N, 2*hd) [sin|cos]. Written with strided
    slicing (vs the JAX port's reshape/stack) for independence."""
    hd = x.shape[-1]
    sin = table[:, :hd]
    cos = table[:, hd:]
    rot = torch.stack([-x[..., 1::2], x[..., 0::2]], dim=-1).reshape(x.shape)
    return x * cos + rot * sin


class _Attn(nn.Module):
    def __init__(self, dim, heads, inner_norm, fused):
        super().__init__()
        self.heads = heads
        self.fused = fused
        if fused:
            self.qkv = nn.Linear(dim, 3 * dim, bias=False)
            self.q_bias = nn.Parameter(torch.randn(dim) * 0.02)
            self.v_bias = nn.Parameter(torch.randn(dim) * 0.02)
        else:
            self.q_proj = nn.Linear(dim, dim, bias=True)
            self.k_proj = nn.Linear(dim, dim, bias=False)
            self.v_proj = nn.Linear(dim, dim, bias=True)
        self.norm = nn.LayerNorm(dim, eps=EPS) if inner_norm else nn.Identity()
        self.proj = nn.Linear(dim, dim)

    def forward(self, x, rope):
        B, N, E = x.shape
        H = self.heads
        hd = E // H
        if self.fused:
            qkv = self.qkv(x)
            q = qkv[..., :E] + self.q_bias
            k = qkv[..., E:2 * E]
            v = qkv[..., 2 * E:] + self.v_bias
        else:
            q, k, v = self.q_proj(x), self.k_proj(x), self.v_proj(x)
        q = q.view(B, N, H, hd).transpose(1, 2)
        k = k.view(B, N, H, hd).transpose(1, 2)
        v = v.view(B, N, H, hd).transpose(1, 2)
        if rope is not None:
            q = torch.cat([q[:, :, :1], _apply_rope_torch(q[:, :, 1:], rope)], dim=2)
            k = torch.cat([k[:, :, :1], _apply_rope_torch(k[:, :, 1:], rope)], dim=2)
        attn = (q @ k.transpose(-2, -1)) / math.sqrt(hd)
        attn = attn.softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(B, N, E)
        return self.proj(self.norm(out))


class _SwiGLU(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1_g = nn.Linear(dim, hidden)
        self.fc1_x = nn.Linear(dim, hidden)
        self.norm = nn.LayerNorm(hidden, eps=EPS)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(self.norm(nn.functional.silu(self.fc1_g(x)) * self.fc1_x(x)))


class _Mlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(nn.functional.gelu(self.fc1(x)))


class _Block(nn.Module):
    def __init__(self, cfg: EvaVisionConfig):
        super().__init__()
        self.norm1 = nn.LayerNorm(cfg.width, eps=EPS)
        self.attn = _Attn(cfg.width, cfg.heads, cfg.inner_attn_norm, cfg.qkv_fused)
        self.norm2 = nn.LayerNorm(cfg.width, eps=EPS)
        self.mlp = (_SwiGLU(cfg.width, cfg.mlp_hidden) if cfg.swiglu
                    else _Mlp(cfg.width, cfg.mlp_hidden))

    def forward(self, x, rope):
        x = x + self.attn(self.norm1(x), rope)
        return x + self.mlp(self.norm2(x))


class _PatchEmbed(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.proj = nn.Conv2d(3, cfg.width, cfg.patch_size, stride=cfg.patch_size)


class _TorchEva(nn.Module):
    """Independent mirror of the documented Eva trunk, timm-style naming."""

    def __init__(self, cfg: EvaVisionConfig):
        super().__init__()
        self.cfg = cfg
        G = cfg.grid
        self.patch_embed = _PatchEmbed(cfg)
        self.cls_token = nn.Parameter(torch.randn(1, 1, cfg.width) * 0.02)
        self.pos_embed = nn.Parameter(torch.randn(1, G * G + 1, cfg.width) * 0.02)
        self.blocks = nn.ModuleList(_Block(cfg) for _ in range(cfg.layers))
        self.norm = nn.LayerNorm(cfg.width, eps=EPS)
        self.head = nn.Linear(cfg.width, cfg.embed_dim)
        rope = None
        if cfg.use_rope:
            rope = _rope_table_torch(G, cfg.ref_feat_shape, cfg.width // cfg.heads)
        self.rope = rope

    def forward(self, images):                      # (B, 3, S, S)
        x = self.patch_embed.proj(images)           # (B, E, G, G)
        x = x.flatten(2).transpose(1, 2)            # (B, N, E) row-major
        x = torch.cat([self.cls_token.expand(x.shape[0], -1, -1), x], dim=1)
        x = x + self.pos_embed
        for blk in self.blocks:
            x = blk(x, self.rope)
        return self.head(self.norm(x)[:, 0])


def _run_pair(cfg: EvaVisionConfig, seed: int):
    torch.manual_seed(seed)
    mirror = _TorchEva(cfg).eval()
    sd = {f"visual.trunk.{k}": v for k, v in mirror.state_dict().items()}
    # head under trunk (timm num_classes-style projection naming)
    v_params, _ = _convert_vision_only(sd, cfg)
    rng = np.random.default_rng(seed)
    imgs = rng.normal(size=(2, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    with torch.no_grad():
        ref = mirror(torch.from_numpy(imgs.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(EvaVisionTransformer(cfg=cfg).apply({"params": v_params}, imgs))
    assert ref.shape == ours.shape == (2, cfg.embed_dim)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def _convert_vision_only(sd, cfg):
    from novic_tpu.embedders.convert import convert_openclip_eva_vision

    return convert_openclip_eva_vision(sd, cfg), None


TINY = dict(image_size=24, patch_size=8, width=32, layers=2, heads=4,
            mlp_hidden=40, embed_dim=20, ref_feat_shape=4,
            compute_dtype="float32")


def test_eva02_swiglu_rope_subln_parity():
    """base/large-style block: rope + SwiGLU + sub-LN, separate q/k/v.
    grid (3) != ref_feat_shape (4) exercises the rope coordinate rescale."""
    _run_pair(EvaVisionConfig(**TINY, use_rope=True, swiglu=True,
                              inner_attn_norm=True, qkv_fused=False), seed=0)


def test_eva02_enormous_style_parity():
    """EVA-CLIP-E-style block: fused qkv (zero k bias), plain GELU MLP,
    no rope, no sub-LN."""
    _run_pair(EvaVisionConfig(**TINY, use_rope=False, swiglu=False,
                              inner_attn_norm=False, qkv_fused=True), seed=1)


def test_eva02_openclip_head_naming():
    """The converter also accepts open_clip's visual.head.proj.* projection
    naming (timm_proj='linear' checkpoints) and zero-fills a missing bias."""
    cfg = EvaVisionConfig(**TINY, use_rope=True, swiglu=True,
                          inner_attn_norm=True, qkv_fused=False)
    torch.manual_seed(2)
    mirror = _TorchEva(cfg).eval()
    sd = {f"visual.trunk.{k}": v for k, v in mirror.state_dict().items()}
    sd["visual.head.proj.weight"] = sd.pop("visual.trunk.head.weight")
    head_bias = sd.pop("visual.trunk.head.bias")
    with torch.no_grad():
        mirror.head.bias.zero_()
    del head_bias
    v_params, _ = _convert_vision_only(sd, cfg)
    rng = np.random.default_rng(2)
    imgs = rng.normal(size=(1, 24, 24, 3)).astype(np.float32)
    with torch.no_grad():
        ref = mirror(torch.from_numpy(imgs.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(EvaVisionTransformer(cfg=cfg).apply({"params": v_params}, imgs))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_eva02_registry_and_text_reuse():
    from novic_tpu.embedders.registry import REGISTRY, lookup

    specs = [s for s in REGISTRY if "eva02" in s]
    assert len(specs) == 4
    base = lookup("openclip:timm/eva02_base_patch16_clip_224.merged2b_s8b_b131k")
    assert base.family == "eva02" and base.tokenizer == "clip_bpe"
    assert base.vision.embed_dim == base.text.embed_dim == 512
    assert base.vision.swiglu and base.vision.use_rope
    e = lookup("openclip:timm/eva02_enormous_patch14_clip_224.laion2b_s4b_b115k")
    assert e.vision.qkv_fused and not e.vision.swiglu and not e.vision.use_rope
    assert e.vision.width == 1792 and e.vision.layers == 64
    ep = lookup("openclip:timm/eva02_enormous_patch14_plus_clip_224.laion2b_s9b_b144k")
    assert ep.text.width == 1280 and ep.text.layers == 32
    assert ep.vision.embed_dim == ep.text.embed_dim == 1024
    # text towers are stock open_clip CLIP — causal, argmax pool, gelu
    assert base.text.causal and base.text.pool == "argmax" and base.text.act == "gelu"


def test_eva02_tp_divisibility_large_hidden():
    """EVA02-L's SwiGLU hidden (int(1024*8/3)=2730) splits at TP-2 but NOT
    TP-4 — validate_tp_divisibility must refuse loudly rather than shard."""
    from novic_tpu.embedders.registry import lookup
    from novic_tpu.parallel.tp import validate_tp_divisibility

    large = lookup("openclip:timm/eva02_large_patch14_clip_224.merged2b_s4b_b131k")
    validate_tp_divisibility(large.vision, large.text, axis_size=2)
    with pytest.raises(ValueError, match="mlp_dim"):
        validate_tp_divisibility(large.vision, axis_size=4)


def test_eva02_embedder_create_smoke():
    """Full JaxEmbedder path on a tiny eva02 arch injected into the registry
    (random weights): text+image inference, unit-norm outputs."""
    import dataclasses as dc

    from novic_tpu.embedders.base import Embedder
    from novic_tpu.embedders.registry import REGISTRY, lookup

    base = lookup("openclip:timm/eva02_base_patch16_clip_224.merged2b_s8b_b131k")
    tiny = dc.replace(
        base,
        vision=EvaVisionConfig(**TINY, use_rope=True, swiglu=True,
                               inner_attn_norm=True, qkv_fused=False),
        text=dc.replace(base.text, width=32, layers=2, heads=4,
                        vocab_size=64, context_length=12, embed_dim=20),
    )
    REGISTRY["openclip:test/tiny-eva02"] = tiny
    try:
        emb = Embedder.create("openclip:test/tiny-eva02", compute_dtype="float32",
                              inference_batch_size=4, image_batch_size=4)
        assert emb.embed_dim == 20
        txt = emb.inference_text(["a photo of a cat"])
        assert txt.shape == (1, 20)
        np.testing.assert_allclose(np.linalg.norm(txt, axis=-1), 1.0, rtol=1e-5)
        rng = np.random.default_rng(0)
        out = emb.inference_image(rng.normal(size=(2, 24, 24, 3)).astype(np.float32))
        assert out.shape == (2, 20)
        np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, rtol=1e-5)
    finally:
        del REGISTRY["openclip:test/tiny-eva02"]
