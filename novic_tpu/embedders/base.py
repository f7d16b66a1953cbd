"""Embedder: the frozen CLIP-family dual-encoder abstraction.

Capability parity with the reference Embedder base class (reference
embedders.py:68-435): 'TYPE:NAME' factory, tokenizer metadata, nominal batch
sizes, lazy model load/unload context, configuration hashing for cache
compatibility, target-config creation/management, unit-norm fp32 embedding
outputs for text and images.

TPU-first: the towers are jitted flax modules (one compile per batch shape,
padded to the nominal batch size to avoid recompiles); tokenization is
host-side numpy; embeddings come back as numpy float32 unit vectors.

Also provides the 'test:<dim>' embedder: a deterministic hash-based text/image
embedder with the SimpleWordTokenizer — used by the test-suite and synthetic
cache writers exactly like the reference uses random/fake writers
(ref embedding_cache_writers.py:23-196).
"""

from __future__ import annotations

import contextlib
import hashlib
import json
import os
from typing import Any, Callable, Optional, Sequence, Union

import numpy as np

from novic_tpu.embedders.preprocess import PreprocessConfig, preprocess_pil_host
from novic_tpu.embedders.registry import EmbedderArch, lookup
from novic_tpu.text.simple import SimpleWordTokenizer
from novic_tpu.text.target import TargetConfig, TargetTokenizer, create_target_config
from novic_tpu.text.tokenizer import TextTokenizer
from novic_tpu.utils.logger import log


class Embedder:
    """Frozen dual-encoder wrapper; see module docstring."""

    @staticmethod
    def create(
        spec: str,                          # 'TYPE:NAME' (openai:/openclip:/transformers:/test:)
        *,
        tokenizer_batch_size: int = 1024,
        inference_batch_size: int = 256,
        image_batch_size: int = 128,
        load_model: bool = True,
        check: bool = False,
        weights_path: Optional[str] = None,    # converted .npz tower weights
        bpe_merges_path: Optional[str] = None, # CLIP BPE merges file (or $NOVIC_CLIP_BPE)
        tokenizer: Optional[TextTokenizer] = None,  # explicit override (tests/benches)
        compute_dtype: str = "bfloat16",
        seed: int = 0,
        lexicon: Optional[dict] = None,     # test-structured: variant -> noun matching table
    ) -> "Embedder":
        if ":" not in spec:
            raise ValueError(f"Embedder spec must be of the format 'TYPE:NAME': {spec}")
        kind, name = spec.split(":", maxsplit=1)
        if kind == "test":
            return HashEmbedder(spec=spec, embed_dim=int(name),
                                tokenizer_batch_size=tokenizer_batch_size,
                                inference_batch_size=inference_batch_size,
                                image_batch_size=image_batch_size, check=check,
                                tokenizer=tokenizer)
        if kind == "test-structured":
            from novic_tpu.embedders.structured import StructuredEmbedder, parse_structured_spec

            return StructuredEmbedder(spec=spec, lexicon=lexicon,
                                      tokenizer_batch_size=tokenizer_batch_size,
                                      inference_batch_size=inference_batch_size,
                                      image_batch_size=image_batch_size, check=check,
                                      tokenizer=tokenizer,
                                      **parse_structured_spec(spec, name))
        if kind not in ("openai", "openclip", "transformers"):
            raise ValueError(f"Unsupported embedder type: {kind}")
        return JaxEmbedder(spec=spec, arch=lookup(spec),
                           tokenizer_batch_size=tokenizer_batch_size,
                           inference_batch_size=inference_batch_size,
                           image_batch_size=image_batch_size, load_model=load_model,
                           check=check, weights_path=weights_path,
                           bpe_merges_path=bpe_merges_path, tokenizer=tokenizer,
                           compute_dtype=compute_dtype, seed=seed)

    def __init__(self, *, spec: str, configuration: dict[str, Any], tokenizer: TextTokenizer,
                 embed_dim: int, tokenizer_batch_size: int, inference_batch_size: int,
                 image_batch_size: int, check: bool):
        self.spec = spec
        self.tokenizer = tokenizer
        self.embed_dim = embed_dim
        self.embed_dtype = np.dtype(np.float32)
        self.tokenizer_batch_size = tokenizer_batch_size
        self.inference_batch_size = inference_batch_size
        self.image_batch_size = image_batch_size
        self.check = check
        self.configuration = dict(configuration)
        self.configuration["class"] = type(self).__name__
        self.target_tokenizer: Optional[TargetTokenizer] = None
        self.target_vocab: Optional[tuple[str, ...]] = None
        log.info(f"Created embedder {spec}: dim {embed_dim}, "
                 f"context {tokenizer.context_length}, vocab {tokenizer.vocab_size}")

    # -- tokenizer passthroughs (ref embedders.py contract) ------------------

    @property
    def context_length(self) -> int:
        return self.tokenizer.context_length

    @property
    def vocab_size(self) -> int:
        return self.tokenizer.vocab_size

    @property
    def cased_tokens(self) -> bool:
        return self.tokenizer.cased

    @property
    def start_token_id(self):
        return self.tokenizer.start_token_id

    @property
    def end_token_id(self):
        return self.tokenizer.end_token_id

    @property
    def pad_token_id(self):
        return self.tokenizer.pad_token_id

    @property
    def token_dtype(self):
        return self.tokenizer.token_dtype

    def tokenize(self, text, max_tokens=None, output_dict=False):
        return self.tokenizer.tokenize(text, max_tokens=max_tokens, output_dict=output_dict)

    def detokenize(self, token_ids):
        return self.tokenizer.detokenize(token_ids)

    # -- target config management --------------------------------------------

    def create_target_config(self, targets: Sequence[str], **kwargs) -> TargetConfig:
        return create_target_config(self.tokenizer, targets,
                                    batch_size=self.tokenizer_batch_size, **kwargs)

    def configure_target(self, target_config: TargetConfig, target_vocab: Sequence[str]):
        self.target_tokenizer = TargetTokenizer(self.tokenizer, target_config, check=self.check)
        self.target_vocab = tuple(target_vocab)

    @property
    def target_config(self) -> Optional[TargetConfig]:
        return self.target_tokenizer.target_config if self.target_tokenizer else None

    def tokenize_target(self, text, max_tokens=None):
        if not self.target_tokenizer:
            raise ValueError("Tokenizing a target noun requires a target configuration to be set")
        return self.target_tokenizer.tokenize_target(text, max_tokens=max_tokens)

    def detokenize_target(self, token_ids):
        if not self.target_tokenizer:
            raise ValueError("Detokenizing a target noun requires a target configuration to be set")
        return self.target_tokenizer.detokenize_target(token_ids)

    def get_tokenize_details(self, text, max_tokens=None, token_id_set=False):
        return self.tokenizer.get_tokenize_details(text, max_tokens=max_tokens,
                                                   token_id_set=token_id_set)

    # -- configuration hashing (cache compatibility, ref embedders.py:262-278) --

    def get_configuration(self, main_config: bool, target_config: bool,
                          target_exclude: Optional[set] = None,
                          target_override: Optional[dict] = None) -> dict:
        configuration = self.configuration.copy() if main_config else {}
        if target_config:
            if self.target_tokenizer is None:
                raise ValueError("Cannot get configuration including target config: none set")
            tc = self.target_tokenizer.target_config.as_jsonable()
            if target_exclude is not None:
                tc = {k: v for k, v in tc.items() if k not in target_exclude}
            if target_override is not None:
                tc.update(target_override)
            configuration["target_config"] = tc
        return configuration

    def get_configuration_hash(self, main_config: bool, target_config: bool,
                               target_exclude: Optional[set] = None,
                               target_override: Optional[dict] = None,
                               hexdigest: bool = False, algorithm: str = "sha256"
                               ) -> Union[bytes, str]:
        configuration = self.get_configuration(main_config, target_config,
                                               target_exclude, target_override)
        h = hashlib.new(algorithm,
                        json.dumps(configuration, separators=(",", ":"), sort_keys=True).encode())
        return h.hexdigest() if hexdigest else h.digest()

    # -- inference ------------------------------------------------------------

    @contextlib.contextmanager
    def inference_model(self, release: bool = True):
        """Temporarily load the towers if not loaded (ref embedders.py:280-292)."""
        if self.is_model_loaded():
            yield
        else:
            try:
                self.load_model()
                yield
            finally:
                self.unload_model()

    @contextlib.contextmanager
    def inference_mode(self):
        yield  # JAX has no global inference/AMP mode; compute dtype is baked into the towers

    def load_model(self) -> bool:
        raise NotImplementedError

    def unload_model(self) -> bool:
        raise NotImplementedError

    def is_model_loaded(self) -> bool:
        raise NotImplementedError

    def set_mesh(self, mesh) -> None:
        """Data-parallel inference over a Mesh('data'); host-side embedders
        (e.g. the hash test embedder) ignore it."""

    def inference_text(self, text: Union[str, Sequence[str]], max_tokens: Optional[int] = None
                       ) -> np.ndarray:
        """Texts → unit-norm float32 embeddings (ref embedders.py:423-426)."""
        raise NotImplementedError

    def inference_image(self, images: np.ndarray) -> np.ndarray:
        """Preprocessed (B,S,S,3) float32 images → unit-norm float32 embeddings."""
        raise NotImplementedError

    def get_image_transform(self) -> Callable:
        raise NotImplementedError


def _l2_normalize(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, dtype=np.float32)
    return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


def tower_modules(arch: EmbedderArch):
    """(vision_model, text_model) flax modules for a registry arch — the
    single family-dispatch point (used by load_model and bench.py)."""
    if arch.family == "align":
        from novic_tpu.embedders.align import BertTextTower, EfficientNetTower

        return EfficientNetTower(cfg=arch.vision), BertTextTower(cfg=arch.text)
    if arch.family == "eva02":
        from novic_tpu.embedders.eva import EvaVisionTransformer
        from novic_tpu.embedders.vit import TextTransformer

        return EvaVisionTransformer(cfg=arch.vision), TextTransformer(cfg=arch.text)
    from novic_tpu.embedders.vit import TextTransformer, VisionTransformer

    return VisionTransformer(cfg=arch.vision), TextTransformer(cfg=arch.text)


class JaxEmbedder(Embedder):
    """Jitted JAX towers for a registered CLIP-family architecture."""

    def __init__(self, *, spec: str, arch: EmbedderArch, tokenizer_batch_size: int,
                 inference_batch_size: int, image_batch_size: int, load_model: bool,
                 check: bool, weights_path: Optional[str], bpe_merges_path: Optional[str],
                 tokenizer: Optional[TextTokenizer], compute_dtype: str, seed: int):
        import dataclasses as _dc

        self.arch = arch
        if compute_dtype != arch.vision.compute_dtype:
            arch = EmbedderArch(
                vision=_dc.replace(arch.vision, compute_dtype=compute_dtype),
                text=_dc.replace(arch.text, compute_dtype=compute_dtype),
                preprocess=arch.preprocess, tokenizer=arch.tokenizer, family=arch.family)
            self.arch = arch
        self.weights_path = weights_path
        self.seed = seed
        self._vision_params = None
        self._text_params = None
        self._jit_text = None
        self._jit_image = None

        tok = tokenizer if tokenizer is not None else self._build_tokenizer(arch, bpe_merges_path)

        configuration = {
            "spec": spec,
            "family": arch.family,
            "vision": _dc.asdict(arch.vision),
            "text": _dc.asdict(arch.text),
            "preprocess": _dc.asdict(arch.preprocess),
            "weights": os.path.basename(weights_path) if weights_path else "random",
        }
        super().__init__(spec=spec, configuration=configuration, tokenizer=tok,
                         embed_dim=arch.vision.embed_dim,
                         tokenizer_batch_size=tokenizer_batch_size,
                         inference_batch_size=inference_batch_size,
                         image_batch_size=image_batch_size, check=check)
        if load_model:
            self.load_model()

    @staticmethod
    def _build_tokenizer(arch: EmbedderArch, bpe_merges_path: Optional[str]) -> TextTokenizer:
        if arch.tokenizer == "clip_bpe":
            path = bpe_merges_path or os.environ.get("NOVIC_CLIP_BPE", "")
            if path and os.path.isfile(path):
                from novic_tpu.text.clip_bpe import CLIPBPETokenizer

                return CLIPBPETokenizer(path, context_length=arch.text.context_length)
            log.warning(
                "CLIP BPE merges file not available (set NOVIC_CLIP_BPE or pass "
                "bpe_merges_path) => falling back to the word-level test tokenizer; "
                "text embeddings will NOT match released checkpoints")
        elif arch.tokenizer == "sentencepiece":
            path = bpe_merges_path or os.environ.get("NOVIC_SIGLIP_SPM", "")
            if path and os.path.isfile(path):
                from novic_tpu.text.sentencepiece import SentencePieceTokenizer

                return SentencePieceTokenizer(path, context_length=arch.text.context_length)
            log.warning(
                "SentencePiece .model asset not available (set NOVIC_SIGLIP_SPM or "
                "pass bpe_merges_path) => falling back to the word-level test "
                "tokenizer; text embeddings will NOT match released checkpoints")
        elif arch.tokenizer == "bert":
            # ALIGN: standard BERT-uncased tokenization, [SEP] KEPT as the end
            # token (the reference's AutoTokenizer path, ref embedders.py:803-815
            # — unlike CLIPA's strip-SEP convention below)
            path = bpe_merges_path or os.environ.get("NOVIC_BERT_VOCAB", "")
            if path and os.path.isfile(path):
                from novic_tpu.text.wordpiece import BertWordPieceTokenizer

                return BertWordPieceTokenizer(path, context_length=arch.text.context_length,
                                              keep_sep=True)
            log.warning(
                "BERT WordPiece vocab.txt asset not available (set NOVIC_BERT_VOCAB "
                "or pass bpe_merges_path) => falling back to the word-level test "
                "tokenizer; text embeddings will NOT match released checkpoints")
        elif arch.tokenizer == "wordpiece":
            # CLIPA: BERT-uncased WordPiece vocab.txt (ref embedders.py:617-645
            # via open_clip HFTokenizer('bert-base-uncased', strip_sep_token))
            path = bpe_merges_path or os.environ.get("NOVIC_BERT_VOCAB", "")
            if path and os.path.isfile(path):
                from novic_tpu.text.wordpiece import BertWordPieceTokenizer

                return BertWordPieceTokenizer(path, context_length=arch.text.context_length)
            log.warning(
                "BERT WordPiece vocab.txt asset not available (set NOVIC_BERT_VOCAB "
                "or pass bpe_merges_path) => falling back to the word-level test "
                "tokenizer; text embeddings will NOT match released checkpoints")
        return SimpleWordTokenizer(words=(), context_length=arch.text.context_length)

    # -- model lifecycle -------------------------------------------------------

    def set_mesh(self, mesh, mode: str = "dp") -> None:
        """Enable multi-chip inference (new TPU-first capability; the
        reference is single-device, SURVEY.md §2.13).

        mode='dp'    Mesh('data'): params replicated, batches sharded on
                     axis 0 — throughput scales with chips.
        mode='tp'    Mesh('model'): Megatron tensor parallelism — attention
                     heads + MLP hidden sharded, two ICI all-reduces per
                     block; batch replicated. Cuts single-image latency on
                     the big towers (ViT-H/SO400M).
        mode='dp_tp' 2-D Mesh('data','model'): batch on 'data', TP on
                     'model'.
        """
        if mode not in ("dp", "tp", "dp_tp"):
            raise ValueError(f"Unknown mesh mode: {mode}")
        if "tp" in mode:
            if self.arch.family == "align":
                raise ValueError(
                    "Tensor parallelism is not supported for the ALIGN conv "
                    "tower (tp_tower_shardings targets transformer params); "
                    "use mode='dp'")
            from novic_tpu.parallel.tp import validate_tp_divisibility

            axis_size = mesh.shape["model"]
            validate_tp_divisibility(self.arch.vision, self.arch.text,
                                     axis_size=axis_size)
        self._mesh = mesh
        self._mesh_mode = mode
        if self.is_model_loaded():
            self._install_jits()

    def load_model(self) -> bool:
        if self._vision_params is not None:
            return False
        import jax

        self._vision_model, self._text_model = tower_modules(self.arch)
        if self.weights_path:
            from novic_tpu.embedders.convert import load_params_npz

            v, t = load_params_npz(self.weights_path)
            self._vision_params = jax.tree.map(np.asarray, v)
            self._text_params = jax.tree.map(np.asarray, t)
            log.info(f"Loaded converted tower weights: {self.weights_path}")
        else:
            rng_v, rng_t = jax.random.split(jax.random.PRNGKey(self.seed))
            S = self.arch.vision.image_size
            dummy_img = np.zeros((1, S, S, 3), np.float32)
            dummy_tok = np.zeros((1, self.arch.text.context_length), np.int32)
            self._vision_params = jax.jit(self._vision_model.init)({"params": rng_v}, dummy_img)["params"]
            self._text_params = jax.jit(self._text_model.init)({"params": rng_t}, dummy_tok)["params"]
            log.warning("No tower weights provided => using random initialization "
                        "(perf benchmarking / testing only)")
        self._install_jits()
        return True

    def _install_jits(self):
        import jax

        mesh = getattr(self, "_mesh", None)
        mode = getattr(self, "_mesh_mode", "dp")
        kwargs_v = {}
        kwargs_t = {}
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            replicated = NamedSharding(mesh, P())
            batch = (NamedSharding(mesh, P("data")) if "dp" in mode
                     else replicated)
            if "tp" in mode:
                from novic_tpu.parallel.tp import tp_tower_shardings

                v_shard = tp_tower_shardings(self._vision_params, mesh)
                t_shard = tp_tower_shardings(self._text_params, mesh)
            else:
                v_shard = t_shard = replicated
            self._vision_params = jax.device_put(self._vision_params, v_shard)
            self._text_params = jax.device_put(self._text_params, t_shard)
            kwargs_v = dict(in_shardings=(v_shard, batch))
            kwargs_t = dict(in_shardings=(t_shard, batch))
        self._jit_image = jax.jit(lambda p, x: self._vision_model.apply({"params": p}, x),
                                  **kwargs_v)
        self._jit_text = jax.jit(lambda p, t: self._text_model.apply({"params": p}, t),
                                 **kwargs_t)

    def unload_model(self) -> bool:
        if self._vision_params is None:
            return False
        self._vision_params = self._text_params = None
        self._jit_image = self._jit_text = None
        log.info("Unloaded embedder towers")
        return True

    def is_model_loaded(self) -> bool:
        return self._vision_params is not None

    # -- inference -------------------------------------------------------------

    def _pad_batch(self, x: np.ndarray, nominal: int) -> tuple[np.ndarray, int]:
        """Pad the batch dim up to a fixed size to avoid per-shape recompiles
        (and to a multiple of the mesh size under data-parallel inference)."""
        b = x.shape[0]
        mesh = getattr(self, "_mesh", None)
        n_dev = int(mesh.devices.size) if mesh is not None else 1
        target = -(-max(b, nominal) // n_dev) * n_dev
        if b >= target or b == 0:
            return x, b
        pad = np.zeros((target - b,) + x.shape[1:], dtype=x.dtype)
        return np.concatenate([x, pad], axis=0), b

    def inference_tokens(self, tokens_dict: dict) -> np.ndarray:
        token_ids = np.asarray(tokens_dict["input_ids"])
        S = token_ids.shape[1]
        ctx = self.context_length
        if S > ctx:
            raise ValueError(f"Token sequences longer than context length: {S} > {ctx}")
        if S < ctx:
            padded = np.full((token_ids.shape[0], ctx), self.pad_token_id, dtype=token_ids.dtype)
            padded[:, :S] = token_ids
            token_ids = padded
        assert self.is_model_loaded(), "Embedder towers not loaded"
        x, b = self._pad_batch(token_ids.astype(np.int32), self.inference_batch_size)
        out = np.asarray(self._jit_text(self._text_params, x))[:b]
        return _l2_normalize(out)

    def inference_text(self, text, max_tokens=None) -> np.ndarray:
        return self.inference_tokens(self.tokenize(text, max_tokens=max_tokens, output_dict=True))

    def inference_image(self, images: np.ndarray) -> np.ndarray:
        assert self.is_model_loaded(), "Embedder towers not loaded"
        images = np.asarray(images, dtype=np.float32)
        x, b = self._pad_batch(images, self.image_batch_size)
        out = np.asarray(self._jit_image(self._vision_params, x))[:b]
        return _l2_normalize(out)

    def get_image_transform(self) -> Callable:
        cfg = self.arch.preprocess

        def transform(images):
            if not isinstance(images, (list, tuple)):
                images = [images]
            return preprocess_pil_host(images, cfg)

        return transform


class HashEmbedder(Embedder):
    """Deterministic test embedder ('test:<dim>'): unit vectors derived from a
    BLAKE2 hash of the text / image bytes. Used like the reference's random and
    photo fake cache writers for pipeline tests (ref embedding_cache_writers.py:23-103)."""

    def __init__(self, *, spec: str, embed_dim: int, tokenizer_batch_size: int,
                 inference_batch_size: int, image_batch_size: int, check: bool,
                 tokenizer=None):
        # Default word vocab is empty -> per-character fallback; callers with
        # a known noun vocabulary should pass a word-level tokenizer
        # (make_test_tokenizer) or multi-word nouns become long char targets
        tok = tokenizer if tokenizer is not None else             SimpleWordTokenizer(words=(), context_length=77)
        super().__init__(spec=spec, configuration={"spec": spec, "embed_dim": embed_dim},
                         tokenizer=tok, embed_dim=embed_dim,
                         tokenizer_batch_size=tokenizer_batch_size,
                         inference_batch_size=inference_batch_size,
                         image_batch_size=image_batch_size, check=check)
        self._loaded = True

    def load_model(self) -> bool:
        was = self._loaded
        self._loaded = True
        return not was

    def unload_model(self) -> bool:
        was = self._loaded
        self._loaded = False
        return was

    def is_model_loaded(self) -> bool:
        return self._loaded

    def _hash_embed(self, data: bytes) -> np.ndarray:
        seed = int.from_bytes(hashlib.blake2b(data, digest_size=8).digest(), "little")
        rng = np.random.default_rng(seed)
        v = rng.normal(size=(self.embed_dim,)).astype(np.float32)
        return v / np.linalg.norm(v)

    def inference_text(self, text, max_tokens=None) -> np.ndarray:
        texts = [text] if isinstance(text, str) else list(text)
        return np.stack([self._hash_embed(t.encode("utf-8")) for t in texts])

    def inference_tokens(self, tokens_dict: dict) -> np.ndarray:
        ids = np.asarray(tokens_dict["input_ids"])
        return np.stack([self._hash_embed(row.tobytes()) for row in ids])

    def inference_image(self, images: np.ndarray) -> np.ndarray:
        images = np.asarray(images)
        return np.stack([self._hash_embed(np.ascontiguousarray(img).tobytes())
                         for img in images])

    def get_image_transform(self) -> Callable:
        cfg = PreprocessConfig(size=32)

        def transform(images):
            if not isinstance(images, (list, tuple)):
                images = [images]
            return preprocess_pil_host(images, cfg)

        return transform
