"""Decoder building blocks: embedding MLP, positional embedding, transformer.

Faithful to the reference architecture (reference embedding_decoder.py:
EmbeddingVectorMLP :1161-1276, LearnedPosEmbedding :1279-1297,
create_embedding :228-278, create_transformer :280-409, custom ReZero layers
:1086-1158) but written TPU-first:

* Weights are stored in torch layout (out_features, in_features) so reference
  checkpoints convert by direct copy; matmuls use dot_general over the last
  axes, which XLA maps straight onto the MXU without transposition copies.
* The transformer exposes both a full-sequence path (training / teacher
  forcing) and a KV-cached single-token ``step`` path used by lax.scan
  generation — fixing the reference's biggest inefficiency (it re-runs the
  full transformer every decode step, embedding_decoder.py:779-850).
* Attention masks are additive float biases built once at trace time; shapes
  are always static (max_seq_len = P + Cmax - 1 is tiny, ~13).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from novic_tpu.models.config import DecoderModelConfig, activation_gain, get_activation
from novic_tpu.ops.dropout import hw_dropout, supports_shape

NEG_INF = -1e30  # finite -inf stand-in: keeps softmax NaN-free for fully masked rows


def _packed_keep_mask(keydata, impl: str, n: int, thresh: int):
    """Keep-mask from packed 16-bit threefry fields: one uint32 block per TWO
    elements, two 16-bit fields unpacked in-register (halves the RNG work)."""
    key = jax.random.wrap_key_data(keydata, impl=impl)
    half = (n + 1) // 2
    bits32 = jax.random.bits(key, (half,), jnp.uint32)
    t = jnp.uint32(thresh)
    return jnp.concatenate([(bits32 & 0xFFFF) < t, (bits32 >> 16) < t])[:n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _packed_dropout(x, keydata, impl: str, thresh: int, keep: float):
    """Dropout whose backward REGENERATES the keep mask from the key instead
    of saving it: the only fwd→bwd residual is the (tiny) key data, so the
    per-site bool-mask tensor never round-trips HBM between forward and
    backward. Everything is plain XLA (threefry + elementwise), so both the
    forward mask generation and the backward regeneration fuse into the
    surrounding matmul epilogues — this is the fusion-compatible version of
    the trade the Pallas kernel (ops/dropout.py) makes with prng_random_bits."""
    return _packed_dropout_fwd(x, keydata, impl, thresh, keep)[0]


def _packed_dropout_fwd(x, keydata, impl, thresh, keep):
    mask = _packed_keep_mask(keydata, impl, x.size, thresh).reshape(x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype), keydata


def _packed_dropout_bwd(impl, thresh, keep, keydata, dy):
    mask = _packed_keep_mask(keydata, impl, dy.size, thresh).reshape(dy.shape)
    return jnp.where(mask, dy / keep, 0.0).astype(dy.dtype), None


_packed_dropout.defvjp(_packed_dropout_fwd, _packed_dropout_bwd)


class FastDropout(nn.Module):
    """Dropout from packed 16-bit random fields instead of f32 uniforms.

    TPU-first: threefry work scales with the number of generated 32-bit
    blocks, and flax's dropout draws one block per element; drawing uint32
    for HALF the elements and unpacking two 16-bit fields per block halves
    the RNG work (dropout RNG measured at 21% of the train step,
    BENCH_NOTES.md). Keep probability quantizes to 1/65536 (≤1.5e-5).
    Backward regenerates the mask from the key via _packed_dropout's
    custom_vjp (no bool-mask residual; measured 260.3→254.6 ms/step).

    impl selects the mask source: 'threefry' = the packed jax.random path
    above; 'pallas' = the hardware-PRNG kernel (ops/dropout.py) that
    generates bits in VMEM and regenerates them in backward (no threefry
    compute, no keep-mask residual in HBM); 'auto' = threefry. Measured
    A/B on chip (BENCH_NOTES.md "Pallas dropout"): the kernel is
    bandwidth-optimal standalone but LOSES end-to-end (308 vs 260 ms/step)
    because each pallas_call is a fusion barrier — XLA fuses the threefry
    path into the surrounding matmul epilogues for free, and the decoder
    has 25 dropout sites per microbatch. 'pallas' stays as an explicit
    opt-in (single-device TPU only: Mosaic custom calls do not
    auto-partition under a GSPMD mesh step)."""

    rate: float
    impl: str = "auto"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.impl not in ("auto", "pallas", "threefry"):
            raise ValueError(f"Unknown dropout impl: {self.impl}")
        if deterministic or self.rate <= 0.0:
            return x
        keep = 1.0 - self.rate
        if self.impl == "pallas" and supports_shape(x.size):
            if jax.default_backend() not in ("tpu", "axon"):
                raise ValueError("dropout_impl=pallas requires a TPU backend "
                                 f"(got '{jax.default_backend()}'); use 'auto'/'threefry'")
            rng = self.make_rng("dropout")
            seed = jax.random.bits(rng, (2,), jnp.uint32)  # full 64-bit key space
            return hw_dropout(x, seed, self.rate).astype(x.dtype)
        thresh = min(int(round(keep * 65536)), 65535)
        rng = self.make_rng("dropout")
        if jnp.issubdtype(rng.dtype, jax.dtypes.prng_key):
            impl = str(jax.random.key_impl(rng))
            keydata = jax.random.key_data(rng)
        else:  # raw uint32[2] old-style key == threefry2x32 key data
            impl, keydata = "threefry2x32", rng
        return _packed_dropout(x, keydata, impl, thresh, keep)

_PRECISIONS = {"default": None, "high": "high", "highest": "highest"}


def resolve_precision(name: str):
    if name not in _PRECISIONS:
        raise ValueError(f"Unknown matmul precision: {name}")
    return _PRECISIONS[name]


def dense(x: jnp.ndarray, w: jnp.ndarray, b: Optional[jnp.ndarray] = None,
          precision=None) -> jnp.ndarray:
    """y = x @ w.T + b with torch-layout weight (out, in); contraction on last axes."""
    y = jax.lax.dot_general(x, w, (((x.ndim - 1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32, precision=precision)
    if b is not None:
        y = y + b
    return y


def normal_init(std: float):
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)
    return init


def torch_linear_default_init(fan_in: int):
    """torch.nn.Linear default: kaiming-uniform(a=sqrt(5)) == U(±1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in)
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)
    return init


def xavier_uniform_init():
    def init(key, shape, dtype=jnp.float32):
        fan_out, fan_in = shape[0], shape[1]
        bound = math.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)
    return init


def layer_norm(x: jnp.ndarray, weight: jnp.ndarray, bias: Optional[jnp.ndarray],
               eps: float = 1e-5) -> jnp.ndarray:
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps) * weight
    if bias is not None:
        y = y + bias
    return y


def causality_mask(max_seq_len: int, prefix_len: int, strictly_causal: bool) -> jnp.ndarray:
    """Additive float causal mask; prefix block is non-causal unless strictly_causal
    (ref embedding_decoder.py:651-654)."""
    i = jnp.arange(max_seq_len)[:, None]
    j = jnp.arange(max_seq_len)[None, :]
    allowed = j <= i
    if not strictly_causal:
        allowed = allowed | ((i < prefix_len) & (j < prefix_len))
    return jnp.where(allowed, 0.0, NEG_INF).astype(jnp.float32)


class EmbeddingVectorMLP(nn.Module):
    """F → (hidden?) → P·E MLP over unit-normalized embeddings
    (ref embedding_decoder.py:1161-1276 + create_mlp :203-226)."""

    cfg: DecoderModelConfig
    output_bias: bool = False

    def _sizes(self) -> tuple[int, Optional[int]]:
        cfg = self.cfg
        output_size = cfg.mlp_seq_len * cfg.hidden_dim
        hl = cfg.mlp_hidden_layer
        if hl == "none":
            hidden = None
        elif hl == "min":
            hidden = min(cfg.embed_dim, output_size)
        elif hl == "max":
            hidden = max(cfg.embed_dim, output_size)
        elif hl == "amean":
            hidden = round(((cfg.embed_dim + output_size) // 2) / 64) * 64
        elif hl == "gmean":
            hidden = round(math.sqrt(cfg.embed_dim * output_size) / 64) * 64
        else:
            raise ValueError(f"Unsupported hidden layer argument: {hl}")
        if cfg.embed_dim <= 0 or output_size <= 0 or (hidden is not None and hidden <= 0):
            raise ValueError("Embedding vector MLP has a non-positive layer size")  # ref :1210
        return output_size, hidden

    @nn.compact
    def __call__(self, embed: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        output_size, hidden_size = self._sizes()

        # Balanced-init math (ref embedding_decoder.py:203-226, :1213-1267)
        if cfg.init_mlp_mode == "default":
            balanced = None
        elif cfg.init_mlp_mode == "balanced":
            balanced = 1.0 if self.output_bias else 1.0 / math.sqrt(2)
        else:
            raise ValueError(f"Unrecognised MLP initialisation mode: {cfg.init_mlp_mode}")
        if balanced is None:
            init_output_std = None
        elif cfg.init_mlp_unit_norm:
            init_output_std = balanced / math.sqrt(cfg.hidden_dim)
        else:
            init_output_std = balanced

        def w_init(std, fan_in):
            return normal_init(std) if std is not None else torch_linear_default_init(fan_in)

        x = embed / jnp.maximum(jnp.linalg.norm(embed, axis=-1, keepdims=True), 1e-12)
        prec = resolve_precision(cfg.matmul_precision)

        if hidden_size is None:
            w1 = self.param("linear1_weight", w_init(init_output_std, cfg.embed_dim),
                            (output_size, cfg.embed_dim))
            b1 = (self.param("linear1_bias", nn.initializers.zeros, (output_size,))
                  if self.output_bias else None)
            x = dense(x, w1, b1, precision=prec)
        else:
            act = get_activation(cfg.mlp_hidden_activation)
            gain = activation_gain(cfg.mlp_hidden_activation, unit_std=not cfg.init_mlp_unit_norm)
            if balanced is not None:
                init_output_norm = balanced if cfg.init_mlp_unit_norm else balanced * math.sqrt(cfg.hidden_dim)
                hidden_std = (init_output_norm / gain) * math.sqrt(cfg.mlp_seq_len / hidden_size)
            elif cfg.init_mlp_unit_norm:
                hidden_std = math.sqrt(cfg.mlp_seq_len / hidden_size)
            else:
                hidden_std = 1.0
            w1 = self.param("linear1_weight", w_init(hidden_std if balanced is not None else None,
                                                     cfg.embed_dim), (hidden_size, cfg.embed_dim))
            b1 = (self.param("linear1_bias", nn.initializers.zeros, (hidden_size,))
                  if cfg.mlp_hidden_bias else None)
            x = dense(x, w1, b1, precision=prec)
            if cfg.mlp_hidden_norm:
                nw = self.param("norm_weight", nn.initializers.constant(hidden_std), (hidden_size,))
                nb = (self.param("norm_bias", nn.initializers.zeros, (hidden_size,))
                      if cfg.mlp_hidden_bias else None)
                x = layer_norm(x, nw, nb)
            x = act(x)
            w2 = self.param("linear2_weight", w_init(1.0 / math.sqrt(output_size), hidden_size),
                            (output_size, hidden_size))
            b2 = (self.param("linear2_bias", nn.initializers.zeros, (output_size,))
                  if self.output_bias else None)
            x = dense(x, w2, b2, precision=prec)

        return x.reshape(embed.shape[0], cfg.mlp_seq_len, cfg.hidden_dim)


class TransformerLayer(nn.Module):
    """One pre/post-LN encoder layer with optional ReZero, matching torch
    nn.TransformerEncoderLayer semantics (ref embedding_decoder.py:1086-1117)."""

    cfg: DecoderModelConfig
    layer_index: int
    postnorm_override: Optional[float] = None  # post-LN: last layer's norm2 = postnorm scale

    def setup(self):
        cfg = self.cfg
        E, FF = cfg.hidden_dim, cfg.feedfwd_dim
        bias = cfg.layer_bias

        factor = 1.0 / math.sqrt(E)
        num_layers_factor = 1.0 / math.sqrt(2 * cfg.num_layers)
        nominal_std = factor if cfg.init_tfrm_unit_norm else 1.0
        gain = activation_gain(cfg.layer_activation,
                               unit_std=not (cfg.init_tfrm_unit_norm or cfg.init_zero_norm))
        init_norm_scale = 0.0 if cfg.init_zero_norm else nominal_std

        if cfg.init_tfrm_mode == "default":
            in_proj_init = xavier_uniform_init()
            out_proj_init = torch_linear_default_init(E)
            ff1_init = torch_linear_default_init(E)
            ff2_init = torch_linear_default_init(FF)
        else:
            if cfg.init_tfrm_mode == "open":
                std_in, std_out = factor, factor
                std_ff1, std_ff2 = factor / math.sqrt(2), factor
            elif cfg.init_tfrm_mode == "balanced":
                # attn_scale estimates the multihead-attention scale factor for
                # attn_dim active attention locations (ref embedding_decoder.py:352)
                d = max(cfg.mlp_seq_len, 1)
                attn_scale = math.sqrt((1 + (nominal_std ** 4) * (d - 1) / d) / d)
                std_in = factor
                std_out = factor / attn_scale
                std_ff1 = factor
                std_ff2 = 1.0 / (math.sqrt(FF) * gain)
            else:
                raise ValueError(f"Unrecognised transformer initialisation mode: {cfg.init_tfrm_mode}")
            if cfg.init_tfrm_proj_layers:
                std_out *= num_layers_factor
                std_ff2 *= num_layers_factor
            # Released config has no biases; the bias-split variant (weight std/sqrt(2))
            # only applies when biases exist and init_bias_zero is False
            # (ref embedding_decoder.py:394-404).
            split = bias and not cfg.init_bias_zero
            s = 1.0 / math.sqrt(2) if split else 1.0
            in_proj_init = normal_init(std_in * s)
            out_proj_init = normal_init(std_out * s)
            ff1_init = normal_init(std_ff1 * s)
            ff2_init = normal_init(std_ff2 * s)

        self.in_proj_weight = self.param("self_attn_in_proj_weight", in_proj_init, (3 * E, E))
        self.in_proj_bias = self.param("self_attn_in_proj_bias", nn.initializers.zeros, (3 * E,)) if bias else None
        self.out_proj_weight = self.param("self_attn_out_proj_weight", out_proj_init, (E, E))
        self.out_proj_bias = self.param("self_attn_out_proj_bias", nn.initializers.zeros, (E,)) if bias else None
        self.linear1_weight = self.param("linear1_weight", ff1_init, (FF, E))
        self.linear1_bias = self.param("linear1_bias", nn.initializers.zeros, (FF,)) if bias else None
        self.linear2_weight = self.param("linear2_weight", ff2_init, (E, FF))
        self.linear2_bias = self.param("linear2_bias", nn.initializers.zeros, (E,)) if bias else None
        self.norm1_weight = self.param("norm1_weight", nn.initializers.constant(init_norm_scale), (E,))
        self.norm1_bias = self.param("norm1_bias", nn.initializers.zeros, (E,)) if bias else None
        norm2_scale = init_norm_scale if self.postnorm_override is None else self.postnorm_override
        self.norm2_weight = self.param("norm2_weight", nn.initializers.constant(norm2_scale), (E,))
        self.norm2_bias = self.param("norm2_bias", nn.initializers.zeros, (E,)) if bias else None

        if cfg.init_rezero_mode == "none":
            self.scale1 = self.scale2 = None
        elif cfg.init_rezero_mode == "perskip":
            self.scale1 = self.param("scale1", nn.initializers.zeros, ())
            self.scale2 = self.param("scale2", nn.initializers.zeros, ())
        elif cfg.init_rezero_mode == "perlayer":
            self.scale1 = self.param("scale1", nn.initializers.zeros, ())
            self.scale2 = self.scale1
        else:
            raise ValueError(f"Invalid ReZero specification: {cfg.init_rezero_mode}")

        self.act = get_activation(cfg.layer_activation)
        self.precision = resolve_precision(cfg.matmul_precision)
        self.attn_dropout = FastDropout(rate=cfg.layer_dropout, impl=cfg.dropout_impl)
        self.dropout1 = FastDropout(rate=cfg.layer_dropout, impl=cfg.dropout_impl)
        self.ff_dropout = FastDropout(rate=cfg.layer_dropout, impl=cfg.dropout_impl)
        self.dropout2 = FastDropout(rate=cfg.layer_dropout, impl=cfg.dropout_impl)

    # -- attention core ------------------------------------------------------

    def _qkv(self, x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        cfg = self.cfg
        qkv = dense(x, self.in_proj_weight, self.in_proj_bias, precision=self.precision)  # (B,S,3E)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        B, S, E = q.shape
        shape = (B, S, cfg.num_heads, cfg.head_dim)
        return q.reshape(shape), k.reshape(shape), v.reshape(shape)

    def _attend(self, q, k, v, attn_bias, deterministic):
        # q,k,v: (B,S[q|k],H,hd); attn_bias additive (Sq,Sk) broadcastable
        cfg = self.cfg
        if cfg.attn_impl not in ("auto", "einsum", "vpu"):
            raise ValueError(f"Unknown attn_impl: {cfg.attn_impl}")
        if cfg.attn_impl == "vpu":
            return self._attend_vpu(q, k, v, attn_bias, deterministic)
        scale = 1.0 / math.sqrt(cfg.head_dim)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k,
                            preferred_element_type=jnp.float32, precision=self.precision)
        scores = scores + attn_bias
        attn = jax.nn.softmax(scores, axis=-1)
        attn = self.attn_dropout(attn, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v,
                         preferred_element_type=jnp.float32, precision=self.precision)
        B, Sq = out.shape[0], out.shape[1]
        return out.reshape(B, Sq, cfg.hidden_dim)

    def _attend_vpu(self, q, k, v, attn_bias, deterministic):
        """Broadcast-multiply-reduce attention with scores laid out (B,Sq,Sk,H).

        At this model's sequence lengths (S <= 13) the einsum formulation lowers
        to ~B*H tiny (S,hd)x(hd,S) batched MXU matmuls plus head-major layout
        transposes of every operand; keeping the head axis minor and reducing
        over hd on the VPU instead measured 45->29 ms per 61k-token forward on
        v5e (exp/all_bisect4.py). Mathematically identical up to f32 summation
        order. Same reduction applies to the attn*v contraction."""
        cfg = self.cfg
        scale = 1.0 / math.sqrt(cfg.head_dim)
        scores = ((q * scale)[:, :, None, :, :] * k[:, None, :, :, :]).sum(axis=-1)
        scores = scores + jnp.expand_dims(attn_bias, -1)
        attn = jax.nn.softmax(scores, axis=2)
        attn = self.attn_dropout(attn, deterministic=deterministic)
        out = (attn[:, :, :, :, None] * v[:, None, :, :, :]).sum(axis=2)  # (B,Sq,H,hd)
        B, Sq = out.shape[0], out.shape[1]
        return out.reshape(B, Sq, cfg.hidden_dim)

    def _sa_block(self, x, attn_bias, deterministic):
        q, k, v = self._qkv(x)
        out = self._attend(q, k, v, attn_bias, deterministic)
        out = dense(out, self.out_proj_weight, self.out_proj_bias, precision=self.precision)
        out = self.dropout1(out, deterministic=deterministic)
        if self.scale1 is not None:
            out = out * self.scale1
        return out

    def _ff_block(self, x, deterministic):
        h = self.act(dense(x, self.linear1_weight, self.linear1_bias, precision=self.precision))
        h = self.ff_dropout(h, deterministic=deterministic)
        h = dense(h, self.linear2_weight, self.linear2_bias, precision=self.precision)
        h = self.dropout2(h, deterministic=deterministic)
        if self.scale2 is not None:
            h = h * self.scale2
        return h

    def __call__(self, x: jnp.ndarray, attn_bias: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if self.cfg.layer_norm_first:
            x = x + self._sa_block(layer_norm(x, self.norm1_weight, self.norm1_bias), attn_bias, deterministic)
            x = x + self._ff_block(layer_norm(x, self.norm2_weight, self.norm2_bias), deterministic)
        else:
            x = layer_norm(x + self._sa_block(x, attn_bias, deterministic), self.norm1_weight, self.norm1_bias)
            x = layer_norm(x + self._ff_block(x, deterministic), self.norm2_weight, self.norm2_bias)
        return x

    def step(self, x: jnp.ndarray, k_cache: jnp.ndarray, v_cache: jnp.ndarray, pos: jnp.ndarray
             ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """KV-cached single-token step (inference only, no dropout).

        x: (B,1,E) input at sequence position ``pos``; caches (B,Smax,H,hd).
        Returns (out (B,1,E), k_cache, v_cache) with caches updated at pos.
        """
        cfg = self.cfg
        if cfg.layer_norm_first:
            h = layer_norm(x, self.norm1_weight, self.norm1_bias)
        else:
            h = x
        q, k_new, v_new = self._qkv(h)
        k_cache = jax.lax.dynamic_update_slice(k_cache, k_new.astype(k_cache.dtype), (0, pos, 0, 0))
        v_cache = jax.lax.dynamic_update_slice(v_cache, v_new.astype(v_cache.dtype), (0, pos, 0, 0))
        Smax = k_cache.shape[1]
        key_bias = jnp.where(jnp.arange(Smax)[None, :] <= pos, 0.0, NEG_INF)  # (1,Smax)
        out = self._attend(q, k_cache, v_cache, key_bias, deterministic=True)
        out = dense(out, self.out_proj_weight, self.out_proj_bias, precision=self.precision)
        if self.scale1 is not None:
            out = out * self.scale1
        if cfg.layer_norm_first:
            x = x + out
            x = x + self._ff_block(layer_norm(x, self.norm2_weight, self.norm2_bias), deterministic=True)
        else:
            x = layer_norm(x + out, self.norm1_weight, self.norm1_bias)
            x = layer_norm(x + self._ff_block(x, deterministic=True), self.norm2_weight, self.norm2_bias)
        return x, k_cache, v_cache

    def step_split(self, x: jnp.ndarray, pk: jnp.ndarray, pv: jnp.ndarray,
                   tk: jnp.ndarray, tv: jnp.ndarray, step: jnp.ndarray):
        """KV-cached step with the prefix cache held at base-batch rows.

        x: (B,1,E) with B = Bb*R candidate rows; pk/pv (Bb,P,H,hd) frozen prefix
        K/V shared by the R candidates of each base sample (never gathered during
        beam candidate reordering); tk/tv (B,G,H,hd) per-candidate token caches,
        updated at slot step-1 (sequence position P+step-1). The reference
        re-forwards the whole sequence per step instead (ref
        embedding_decoder.py:880-916); here splitting keeps the beam's per-step
        gather to the token slots only and lets prefill run at Bb rows.
        """
        cfg = self.cfg
        if cfg.layer_norm_first:
            h = layer_norm(x, self.norm1_weight, self.norm1_bias)
        else:
            h = x
        q, k_new, v_new = self._qkv(h)  # (B,1,H,hd)
        tk = jax.lax.dynamic_update_slice(tk, k_new.astype(tk.dtype), (0, step - 1, 0, 0))
        tv = jax.lax.dynamic_update_slice(tv, v_new.astype(tv.dtype), (0, step - 1, 0, 0))
        B = x.shape[0]
        Bb, P = pk.shape[0], pk.shape[1]
        R = B // Bb
        G = tk.shape[1]
        H, hd = cfg.num_heads, cfg.head_dim
        scale = 1.0 / math.sqrt(hd)
        qs = (q * scale).reshape(B, H, hd)
        # Prefix scores: broadcast the shared prefix K over the R candidate rows
        sp = jnp.einsum("brhd,bphd->brhp", qs.reshape(Bb, R, H, hd), pk,
                        preferred_element_type=jnp.float32,
                        precision=self.precision).reshape(B, H, P)
        st = jnp.einsum("bhd,bkhd->bhk", qs, tk, preferred_element_type=jnp.float32,
                        precision=self.precision)
        st = st + jnp.where(jnp.arange(G)[None, None, :] <= step - 1, 0.0, NEG_INF)
        attn = jax.nn.softmax(jnp.concatenate([sp, st], axis=-1), axis=-1)  # (B,H,P+G)
        out_p = jnp.einsum("brhp,bphd->brhd", attn[:, :, :P].reshape(Bb, R, H, P), pv,
                           preferred_element_type=jnp.float32,
                           precision=self.precision).reshape(B, H, hd)
        out_t = jnp.einsum("bhk,bkhd->bhd", attn[:, :, P:], tv,
                           preferred_element_type=jnp.float32, precision=self.precision)
        out = (out_p + out_t).reshape(B, 1, cfg.hidden_dim)
        out = dense(out, self.out_proj_weight, self.out_proj_bias, precision=self.precision)
        if self.scale1 is not None:
            out = out * self.scale1
        if cfg.layer_norm_first:
            x = x + out
            x = x + self._ff_block(layer_norm(x, self.norm2_weight, self.norm2_bias), deterministic=True)
        else:
            x = layer_norm(x + out, self.norm1_weight, self.norm1_bias)
            x = layer_norm(x + self._ff_block(x, deterministic=True), self.norm2_weight, self.norm2_bias)
        return x, tk, tv

    def step_lazy(self, x: jnp.ndarray, pk: jnp.ndarray, pv: jnp.ndarray,
                  tk: jnp.ndarray, tv: jnp.ndarray, anc_bias: jnp.ndarray, step: jnp.ndarray):
        """Lazy-cache beam step: the token caches are NEVER reordered.

        Beam search's per-step candidate reorder of the (Bb*R, G, H, hd) token
        caches is pure data movement (measured at the HBM permutation floor,
        exp/beam_reorder_kernel.py). Instead, each step writes the new token's
        K/V at (row = its own candidate slot, col = step-1) and leaves history
        rows where their ORIGINAL candidates wrote them; every candidate then
        attends over all R*G slots with an additive ancestry bias selecting
        exactly its path (0 on ancestor slots, -inf elsewhere). Softmax over
        {-inf-masked} slots is mathematically identical to softmax over the
        reordered path, so beam results are unchanged (same math as the
        reference's re-forward, ref embedding_decoder.py:905-916) while the
        3x-cache-size reorder traffic per step disappears.

        x: (B,1,E) with B = Bb*R; pk/pv (Bb,P,H,hd) frozen shared prefix;
        tk/tv (B,G,H,hd) slot-stationary token caches; anc_bias
        (Bb,R,1,R*G) f32 additive scores bias (slot k = r*G + g).
        """
        cfg = self.cfg
        if cfg.layer_norm_first:
            h = layer_norm(x, self.norm1_weight, self.norm1_bias)
        else:
            h = x
        q, k_new, v_new = self._qkv(h)  # (B,1,H,hd)
        tk = jax.lax.dynamic_update_slice(tk, k_new.astype(tk.dtype), (0, step - 1, 0, 0))
        tv = jax.lax.dynamic_update_slice(tv, v_new.astype(tv.dtype), (0, step - 1, 0, 0))
        B = x.shape[0]
        Bb, P = pk.shape[0], pk.shape[1]
        R = B // Bb
        G = tk.shape[1]
        H, hd = cfg.num_heads, cfg.head_dim
        scale = 1.0 / math.sqrt(hd)
        qs = (q * scale).reshape(Bb, R, H, hd)
        sp = jnp.einsum("brhd,bphd->brhp", qs, pk,
                        preferred_element_type=jnp.float32, precision=self.precision)
        tkr = tk.reshape(Bb, R * G, H, hd)
        st = jnp.einsum("brhd,bkhd->brhk", qs, tkr,
                        preferred_element_type=jnp.float32, precision=self.precision)
        st = st + anc_bias  # broadcast over the head axis
        attn = jax.nn.softmax(jnp.concatenate([sp, st], axis=-1), axis=-1)  # (Bb,R,H,P+R*G)
        out_p = jnp.einsum("brhp,bphd->brhd", attn[:, :, :, :P], pv,
                           preferred_element_type=jnp.float32, precision=self.precision)
        out_t = jnp.einsum("brhk,bkhd->brhd", attn[:, :, :, P:], tv.reshape(Bb, R * G, H, hd),
                           preferred_element_type=jnp.float32, precision=self.precision)
        out = (out_p + out_t).reshape(B, 1, cfg.hidden_dim)
        out = dense(out, self.out_proj_weight, self.out_proj_bias, precision=self.precision)
        if self.scale1 is not None:
            out = out * self.scale1
        if cfg.layer_norm_first:
            x = x + out
            x = x + self._ff_block(layer_norm(x, self.norm2_weight, self.norm2_bias), deterministic=True)
        else:
            x = layer_norm(x + out, self.norm1_weight, self.norm1_bias)
            x = layer_norm(x + self._ff_block(x, deterministic=True), self.norm2_weight, self.norm2_bias)
        return x, tk, tv

    def extend(self, x: jnp.ndarray, pk: jnp.ndarray, pv: jnp.ndarray,
               token_bias: jnp.ndarray) -> jnp.ndarray:
        """Multi-token teacher-forced forward against a frozen shared prefix cache.

        The exhaustive-scoring path (generate_all) teacher-forces chunks of R
        targets per image; the P prefix positions are identical across a
        sample's R rows, so they are prefilled ONCE at Bb rows (prefill_split)
        and shared here — vs the full forward recomputing the prefix MLP +
        attention for every chunk (4 of 12 sequence positions at FT0 shapes).

        x: (Bb*R, T, E) token inputs at sequence positions P..P+T-1, row
        layout b*R + r (base-sample-major); pk/pv: (Bb, P, H, hd) frozen
        prefix K/V; token_bias: (T, T) additive causal bias among the token
        positions. Returns (Bb*R, T, E); writes no caches (one-shot scoring).

        Attention uses the broadcast-reduce (VPU) formulation regardless of
        cfg.attn_impl — this path exists for the large-rows/tiny-S scoring
        regime where it measured 1.8x faster (exp/all_bisect4.py).
        """
        cfg = self.cfg
        if cfg.layer_norm_first:
            h = layer_norm(x, self.norm1_weight, self.norm1_bias)
        else:
            h = x
        q, k, v = self._qkv(h)  # (A,T,H,hd)
        A, T = x.shape[0], x.shape[1]
        Bb, P = pk.shape[0], pk.shape[1]
        R = A // Bb
        scale = 1.0 / math.sqrt(cfg.head_dim)
        qs = q * scale
        st = (qs[:, :, None, :, :] * k[:, None, :, :, :]).sum(axis=-1)  # (A,T,T,H)
        st = st + token_bias[:, :, None]
        qb = qs.reshape(Bb, R, T, cfg.num_heads, cfg.head_dim)
        sp = (qb[:, :, :, None, :, :] * pk[:, None, None, :, :, :]).sum(axis=-1)  # (Bb,R,T,P,H)
        scores = jnp.concatenate([sp.reshape(A, T, P, cfg.num_heads), st], axis=2)
        attn = jax.nn.softmax(scores, axis=2)  # (A,T,P+T,H)
        ap = attn[:, :, :P, :].reshape(Bb, R, T, P, cfg.num_heads)
        out_p = (ap[..., None] * pv[:, None, None, :, :, :]).sum(axis=3)  # (Bb,R,T,H,hd)
        out_t = (attn[:, :, P:, :, None] * v[:, None, :, :, :]).sum(axis=2)  # (A,T,H,hd)
        out = out_p.reshape(A, T, cfg.hidden_dim) + out_t.reshape(A, T, cfg.hidden_dim)
        out = dense(out, self.out_proj_weight, self.out_proj_bias, precision=self.precision)
        if self.scale1 is not None:
            out = out * self.scale1
        if cfg.layer_norm_first:
            x = x + out
            x = x + self._ff_block(layer_norm(x, self.norm2_weight, self.norm2_bias), deterministic=True)
        else:
            x = layer_norm(x + out, self.norm1_weight, self.norm1_bias)
            x = layer_norm(x + self._ff_block(x, deterministic=True), self.norm2_weight, self.norm2_bias)
        return x

    def prefill(self, x: jnp.ndarray, attn_bias: jnp.ndarray, k_cache: jnp.ndarray,
                v_cache: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Multi-token forward that also fills the KV cache at positions [0, S)."""
        cfg = self.cfg
        S = x.shape[1]
        if cfg.layer_norm_first:
            h = layer_norm(x, self.norm1_weight, self.norm1_bias)
        else:
            h = x
        q, k_new, v_new = self._qkv(h)
        k_cache = jax.lax.dynamic_update_slice(k_cache, k_new.astype(k_cache.dtype), (0, 0, 0, 0))
        v_cache = jax.lax.dynamic_update_slice(v_cache, v_new.astype(v_cache.dtype), (0, 0, 0, 0))
        out = self._attend(q, k_new, v_new, attn_bias[:S, :S], deterministic=True)
        out = dense(out, self.out_proj_weight, self.out_proj_bias, precision=self.precision)
        if self.scale1 is not None:
            out = out * self.scale1
        if cfg.layer_norm_first:
            x = x + out
            x = x + self._ff_block(layer_norm(x, self.norm2_weight, self.norm2_bias), deterministic=True)
        else:
            x = layer_norm(x + out, self.norm1_weight, self.norm1_bias)
            x = layer_norm(x + self._ff_block(x, deterministic=True), self.norm2_weight, self.norm2_bias)
        return x, k_cache, v_cache


class Transformer(nn.Module):
    """Encoder stack + optional final norm (ref embedding_decoder.py:280-409)."""

    cfg: DecoderModelConfig

    def setup(self):
        cfg = self.cfg
        factor = 1.0 / math.sqrt(cfg.hidden_dim)
        postnorm_scale = factor if cfg.init_tfrm_unit_postnorm else 1.0
        # Post-LN: the final layer's norm2 plays the postnorm role and its init
        # is overridden to postnorm scale (ref embedding_decoder.py:406-407).
        self.layers = [
            TransformerLayer(
                cfg=cfg, layer_index=i, name=f"layers_{i}",
                postnorm_override=(postnorm_scale if (not cfg.layer_norm_first and
                                                      i == cfg.num_layers - 1) else None),
            )
            for i in range(cfg.num_layers)
        ]
        if cfg.layer_norm_first:
            self.norm_weight = self.param("norm_weight", nn.initializers.constant(postnorm_scale),
                                          (cfg.hidden_dim,))
            self.norm_bias = (self.param("norm_bias", nn.initializers.zeros, (cfg.hidden_dim,))
                              if cfg.layer_bias else None)
        else:
            self.norm_weight = None
            self.norm_bias = None

    def __call__(self, x: jnp.ndarray, attn_bias: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        for layer in self.layers:
            x = layer(x, attn_bias, deterministic)
        if self.norm_weight is not None:
            x = layer_norm(x, self.norm_weight, self.norm_bias)
        return x

    def prefill(self, x, attn_bias, k_caches, v_caches):
        new_k, new_v = [], []
        for i, layer in enumerate(self.layers):
            x, k, v = layer.prefill(x, attn_bias, k_caches[i], v_caches[i])
            new_k.append(k)
            new_v.append(v)
        if self.norm_weight is not None:
            x = layer_norm(x, self.norm_weight, self.norm_bias)
        return x, new_k, new_v

    def step(self, x, k_caches, v_caches, pos):
        new_k, new_v = [], []
        for i, layer in enumerate(self.layers):
            x, k, v = layer.step(x, k_caches[i], v_caches[i], pos)
            new_k.append(k)
            new_v.append(v)
        if self.norm_weight is not None:
            x = layer_norm(x, self.norm_weight, self.norm_bias)
        return x, new_k, new_v

    def step_split(self, x, pk_caches, pv_caches, tk_caches, tv_caches, step):
        """Split-cache step (see TransformerLayer.step_split)."""
        new_tk, new_tv = [], []
        for i, layer in enumerate(self.layers):
            x, tk, tv = layer.step_split(x, pk_caches[i], pv_caches[i],
                                         tk_caches[i], tv_caches[i], step)
            new_tk.append(tk)
            new_tv.append(tv)
        if self.norm_weight is not None:
            x = layer_norm(x, self.norm_weight, self.norm_bias)
        return x, new_tk, new_tv

    def extend(self, x, pk_caches, pv_caches, token_bias):
        """Prefix-cached multi-token forward (see TransformerLayer.extend)."""
        for i, layer in enumerate(self.layers):
            x = layer.extend(x, pk_caches[i], pv_caches[i], token_bias)
        if self.norm_weight is not None:
            x = layer_norm(x, self.norm_weight, self.norm_bias)
        return x

    def step_lazy(self, x, pk_caches, pv_caches, tk_caches, tv_caches, anc_bias, step):
        """Lazy-cache beam step (see TransformerLayer.step_lazy)."""
        new_tk, new_tv = [], []
        for i, layer in enumerate(self.layers):
            x, tk, tv = layer.step_lazy(x, pk_caches[i], pv_caches[i],
                                        tk_caches[i], tv_caches[i], anc_bias, step)
            new_tk.append(tk)
            new_tv.append(tv)
        if self.norm_weight is not None:
            x = layer_norm(x, self.norm_weight, self.norm_bias)
        return x, new_tk, new_tv
