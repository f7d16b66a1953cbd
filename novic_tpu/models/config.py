"""Object decoder model configuration.

Mirrors the constructor surface of the reference decoder
(reference embedding_decoder.py:43-115 + PrefixedIterDecoder kwargs :633-645),
as one frozen dataclass that is embedded into checkpoints.
"""

from __future__ import annotations

import dataclasses
from fractions import Fraction
from typing import Any


@dataclasses.dataclass(frozen=True)
class DecoderModelConfig:
    # Problem geometry (derived from embedder + target config)
    embed_dim: int                     # F: input embedding vector dimension
    vocab_size: int                    # V: target (compact) vocab size
    token_length: int                  # Cmax: target token length incl. end token

    # Model class
    model: str = "PrefixedIterDecoder"

    # Loss options (ref embedding_decoder.py:48-50)
    vocab_quant: bool = False          # Round V up to a multiple of 64 with zeroed unused rows
    num_end_loss: int = 1              # Trailing end tokens included in prediction loss (>=1)
    label_smoothing: float = 0.0

    # Architecture (ref config/train.yaml:249-308 released defaults)
    hidden_dim: int = 512              # E
    feedfwd_scale: str = "1/4"         # Feedforward dim = E * scale (exact fraction)
    mlp_seq_len: int = 4               # P: number of prefix tokens from the embedding MLP
    mlp_hidden_layer: str = "none"     # none|min|max|amean|gmean
    mlp_hidden_bias: bool = False
    mlp_hidden_norm: bool = False
    mlp_hidden_activation: str = "gelu"
    input_dropout: float = 0.1
    num_layers: int = 6
    num_heads: int = 8
    layer_dropout: float = 0.1
    layer_activation: str = "gelu"
    layer_norm_first: bool = True
    layer_bias: bool = False
    logits_bias: bool = False

    # Initialisation (ref embedding_decoder.py:203-409)
    init_bias_zero: bool = True
    init_mlp_mode: str = "balanced"     # default|balanced
    init_mlp_unit_norm: bool = False
    init_tfrm_mode: str = "balanced"    # default|open|balanced
    init_tfrm_unit_norm: bool = False
    init_tfrm_unit_postnorm: bool = True
    init_tfrm_proj_layers: bool = True
    init_zero_norm: bool = False
    init_rezero_mode: str = "none"      # none|perskip|perlayer

    # PrefixedIterDecoder specifics (ref embedding_decoder.py:633-645)
    weight_tying: bool = True
    strictly_causal: bool = False

    # TPU compute options (new; no reference analog)
    compute_dtype: str = "float32"      # float32|bfloat16 for transformer matmuls
    dropout_impl: str = "auto"          # auto|threefry|pallas dropout mask source
    # (models/layers.py FastDropout; 'auto' = packed threefry — the hardware-PRNG
    # Pallas kernel measured slower end-to-end and stays an explicit opt-in)
    matmul_precision: str = "default"   # default|high|highest: MXU passes for f32 matmuls.
    # "default" = single bf16 pass (fast, ~0.4% relative error — analogous to the
    # reference's TF32-enabled CUDA matmuls, utils.py:119-123); "highest" = exact f32,
    # used by tests to assert KV-cached == full-forward equivalence.
    attn_impl: str = "auto"             # auto|einsum|vpu: full-sequence attention formulation.
    # "einsum" = batched (B,H,Sq,Sk) MXU matmuls (XLA's natural lowering); "vpu" =
    # broadcast-multiply-reduce with scores laid out (B,Sq,Sk,H) — no head-major
    # transposes and no tiny batched matmuls, which at this model's seq lengths
    # (S <= 13) measured 45->29 ms per 61k-token forward on v5e (exp/all_bisect4.py).
    # "auto" = einsum for the train/decode paths (attention is a minor cost there);
    # the exhaustive-scoring path (generate_all) opts into vpu explicitly.

    # ---------------------------------------------------------------- derived

    @property
    def feedfwd_dim(self) -> int:
        frac = Fraction(self.feedfwd_scale)
        dim = self.hidden_dim * frac
        if dim.denominator != 1:
            raise ValueError(
                f"Feedforward dimension scaler ({frac}) must yield an integral dimension "
                f"for hidden dimension {self.hidden_dim}")
        return dim.numerator

    @property
    def head_dim(self) -> int:
        assert self.hidden_dim % self.num_heads == 0
        return self.hidden_dim // self.num_heads

    @property
    def max_seq_len(self) -> int:
        # P + Cmax - 1: end token never needs a next-token prediction
        # (ref embedding_decoder.py:648)
        return self.mlp_seq_len + self.token_length - 1

    @property
    def vocab_size_quant(self) -> int:
        # Q: optionally quantized vocab size (ref embedding_decoder.py:235)
        if self.vocab_quant:
            return ((self.vocab_size + 63) // 64) * 64
        return self.vocab_size

    def as_dict(self) -> dict[str, Any]:
        return dataclasses.asdict(self)

    @staticmethod
    def from_dict(d: dict[str, Any], **overrides) -> "DecoderModelConfig":
        d = {**d, **overrides}
        known = {f.name for f in dataclasses.fields(DecoderModelConfig)}
        return DecoderModelConfig(**{k: v for k, v in d.items() if k in known})

    def replace(self, **kwargs) -> "DecoderModelConfig":
        return dataclasses.replace(self, **kwargs)


def activation_gain(name: str, unit_std: bool) -> float:
    """Gain of an activation for balanced init (ref utils.py:84-112)."""
    if name == "tanh":
        return 0.6279 if unit_std else 1.0
    if name == "relu":
        return 0.7071067811865476  # 1/sqrt(2)
    if name == "gelu":
        return 0.6521 if unit_std else 0.5
    raise ValueError(f"Unsupported activation function: {name}")


def get_activation(name: str):
    import jax

    if name == "tanh":
        return jax.numpy.tanh
    if name == "relu":
        return jax.nn.relu
    if name == "gelu":
        # PyTorch F.gelu default is the exact (erf) formulation
        return lambda x: jax.nn.gelu(x, approximate=False)
    raise ValueError(f"Unsupported activation function: {name}")


@dataclasses.dataclass(frozen=True)
class GenerateDefaults:
    """Bundled generation defaults (subset of GenerationConfig relevant to models)."""
    temperature: float = 1.0
    length_alpha: float = 0.0
    topk: int = 1
    guide_renorm: bool = False
    vocab_per_token: bool = False
    vocab_scaler: float = 0.0
