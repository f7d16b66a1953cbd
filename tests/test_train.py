"""Training loop integration: loss decreases on a synthetic cache over a DP
mesh; checkpoint save/load and reference-format interop round-trips.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from novic_tpu.data.cache import CacheExpectation, EmbeddingCache, EmbeddingCacheWriter
from novic_tpu.data.noise import EmbeddingNoise
from novic_tpu.models import DecoderModelConfig, PrefixedIterDecoder, create_decoder
from novic_tpu.parallel.mesh import create_mesh
from novic_tpu.text.simple import make_test_tokenizer
from novic_tpu.text.target import TargetTokenizer, create_target_config
from novic_tpu.train.checkpoint import (
    load_checkpoint,
    params_to_torch_state_dict,
    save_checkpoint,
    torch_state_dict_to_params,
)
from novic_tpu.train.loop import TrainLoopConfig, TrainLoopState, compute_chunk_batches, train

NOUNS = ["dog", "cat", "fire truck", "sea lion", "tree", "car", "hot dog", "apple"]
F = 32


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("train")
    tok = make_test_tokenizer(NOUNS)
    tc = create_target_config(tok, NOUNS, with_start_token=False, with_end_token=True,
                              compact_ids=True, fixed_token_length=False,
                              auto_fixed_token_length=True, use_masks=True)
    tt = TargetTokenizer(tok, tc)

    # Synthetic "text embeddings": a deterministic direction per noun + jitter,
    # so the mapping embedding → noun is learnable.
    rng = np.random.default_rng(0)
    directions = rng.normal(size=(len(NOUNS), F)).astype(np.float32)
    directions /= np.linalg.norm(directions, axis=1, keepdims=True)
    N = 512
    noun_idx = rng.integers(0, len(NOUNS), size=N)
    embeds = directions[noun_idx] + 0.05 * rng.normal(size=(N, F)).astype(np.float32)
    embeds /= np.linalg.norm(embeds, axis=1, keepdims=True)
    noun_ids = (noun_idx + 1).astype(np.int32).reshape(N, 1)

    path = str(tmp / "train_cache.bin")
    with EmbeddingCacheWriter(path, num_embed=N, embed_dim=F, target_tokenizer=tt,
                              target_nouns=NOUNS, num_embed_targets=1, shuffle=True,
                              default_weights=True, seed=1) as w:
        for i in range(0, N, 64):
            w.write(embeds[i:i + 64], noun_ids[i:i + 64])
    return tmp, tok, tc, tt, path


def make_model(tc):
    cfg = DecoderModelConfig(embed_dim=F, vocab_size=tc.vocab_size, token_length=tc.token_length,
                             hidden_dim=64, feedfwd_scale="1/4", num_layers=2, num_heads=4,
                             mlp_seq_len=2, input_dropout=0.0, layer_dropout=0.0)
    return create_decoder(cfg, rng=jax.random.PRNGKey(3))


def test_training_loss_decreases(setup):
    tmp, tok, tc, tt, cache_path = setup
    cache = EmbeddingCache(cache_path, CacheExpectation(embed_dim=F, embed_dtype=np.float32,
                                                        target_config=tc))
    ds = cache.create_dataset(batch_size=64, training=True)
    ds.configure_data(ds.resolve_data_config(multi_target=False, use_weights=False))
    loader, info = ds.create_loader(batch_size=64, training=True, seed=7)

    model, params = make_model(tc)
    mesh = create_mesh(jax.devices()[:8])
    chunk_batches = 4
    C = TrainLoopConfig(chunk_batches=chunk_batches, chunk_samples=chunk_batches * 64,
                        epoch_batches=info.epoch_batches, max_chunks=6, batch_size=64,
                        init_lr=3e-3, lr_warmup=1, save_every_max=1000,
                        loss_ewa_halflife=1.0,
                        # exercise the multi-step dispatch path's
                        # (K, batch) P(None, 'data') shardings on the mesh
                        steps_per_dispatch=2)
    noise = EmbeddingNoise.create("GaussElem", vec_norm=0.5)

    with ds.loaded():
        state, S, ewa = train(model=model, params=params, dataset=ds, loader=loader,
                              loader_info=info, C=C, noise=noise, mesh=mesh)
    assert S.chunk_id == 7
    assert ewa.loss < 1.0, f"Training did not converge: loss {ewa.loss}"
    assert ewa.top1 > 0.7, f"Training did not converge: top1 {ewa.top1}"


def test_checkpoint_roundtrip(setup, tmp_path):
    tmp, tok, tc, tt, cache_path = setup
    model, params = make_model(tc)
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, params=params, cfg_flat={"action": "train", "init_lr": 1.5e-3},
                    model_config=model.cfg, target_config=tc,
                    data_config={"use_weights": False}, target_nouns=("",) + tuple(NOUNS),
                    num_invalid_target_nouns=1, train_meta={"chunk_id": 3})
    ckpt = load_checkpoint(path)
    assert ckpt["target_config"] == tc
    assert ckpt["model_config"] == model.cfg
    assert ckpt["target_nouns"] == ("",) + tuple(NOUNS)
    assert ckpt["train_meta"]["chunk_id"] == 3
    for k, v in jax.tree.leaves_with_path(params):
        pass
    flat_a = jax.tree.leaves(params)
    flat_b = jax.tree.leaves(ckpt["params"])
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_torch_state_dict_roundtrip(setup):
    """params → reference state-dict names → params is the identity, and the
    names match what the reference's PrefixedIterDecoder produces."""
    tmp, tok, tc, tt, cache_path = setup
    model, params = make_model(tc)
    sd = params_to_torch_state_dict(jax.tree.map(np.asarray, params), model.cfg)
    # Canonical reference names present
    assert "embed_mlp.mlp.0.weight" in sd
    assert "logits_linear.weight" in sd
    assert "pos_embedding.embedding.weight" in sd
    assert "transformer.layers.0.self_attn.in_proj_weight" in sd
    assert "transformer.layers.1.linear2.weight" in sd
    assert "transformer.norm.weight" in sd
    back = torch_state_dict_to_params(sd, model.cfg)
    flat_a = dict(zip(map(str, jax.tree.structure(params).flatten_up_to(params)), []))
    a_leaves = jax.tree.leaves(params)
    b_leaves = jax.tree.leaves(back)
    assert len(a_leaves) == len(b_leaves)
    for a, b in zip(a_leaves, b_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_reference_torch_checkpoint_interop(setup, tmp_path):
    """Write a reference-schema torch checkpoint and load it back through the
    torch-pickle interop path (ref train.py:1450-1473 schema)."""
    torch = pytest.importorskip("torch")
    from novic_tpu.train.checkpoint import load_reference_checkpoint, save_reference_checkpoint

    tmp, tok, tc, tt, cache_path = setup
    model, params = make_model(tc)
    cfg_flat = {f: getattr(model.cfg, f) for f in model.cfg.__dataclass_fields__}
    path = str(tmp_path / "ovod_chunk0001_test.model")
    save_reference_checkpoint(path, params=jax.tree.map(np.asarray, params),
                              model_config=model.cfg, target_config=tc,
                              target_nouns=("",) + tuple(NOUNS),
                              num_invalid_target_nouns=1, cfg_flat=cfg_flat)
    loaded = load_reference_checkpoint(path)
    assert loaded["target_config"] == tc
    assert loaded["target_nouns"] == ("",) + tuple(NOUNS)
    a_leaves = jax.tree.leaves(params)
    b_leaves = jax.tree.leaves(loaded["params"])
    assert len(a_leaves) == len(b_leaves)
    for a, b in zip(a_leaves, b_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Model config round-trips the architecture
    assert loaded["model_config"].hidden_dim == model.cfg.hidden_dim
    assert loaded["model_config"].num_layers == model.cfg.num_layers
    # The on-disk target_config must carry the reference loader's field types
    # (ref train.py:1451-1457 writes dataclasses.asdict with torch.dtype +
    # torch.Tensor values; ref infer.py:695 consumes token_dtype as a dtype).
    raw = torch.load(path, map_location="cpu", weights_only=True)
    raw_tc = raw["target_config"]
    assert isinstance(raw_tc["token_dtype"], torch.dtype)
    assert isinstance(raw_tc["mask_dtype"], torch.dtype)
    if raw_tc["compact_map"] is not None:
        assert isinstance(raw_tc["compact_map"], torch.Tensor)
        assert raw_tc["compact_map"].dtype == raw_tc["token_dtype"]
        assert isinstance(raw_tc["compact_unmap"], torch.Tensor)
    torch.full((2, tc.token_length), raw_tc["pad_token_id"],
               dtype=raw_tc["token_dtype"])  # ref infer.py:695 usage pattern


def test_accum_steps_equivalence(setup):
    """In-step microbatch accumulation (lax.scan) produces the same update as
    a single big batch when loss bases are uniform."""
    import jax.numpy as jnp

    from novic_tpu.train.optim import create_optimizer
    from novic_tpu.train.step import create_train_state, make_train_step

    tmp, tok, tc, tt, cache_path = setup
    model, params = make_model(tc)
    tx = create_optimizer(gradient_clip=0.0, weight_decay=0.0)

    rng = np.random.default_rng(11)
    B, C = 8, tc.token_length
    embed = rng.normal(size=(B, F)).astype(np.float32)
    embed /= np.linalg.norm(embed, axis=1, keepdims=True)
    # All samples same length → equal loss bases per microbatch → exact equivalence
    target = np.zeros((B, C), np.int32)
    target[:, :2] = rng.integers(1, tc.vocab_size, size=(B, 2))
    mask = np.zeros((B, C), bool)
    mask[:, 3:] = True
    batch = (embed, target, mask, None)
    key = jax.random.PRNGKey(0)

    step1 = make_train_step(model, tx, gradient_clip=0.0, accum_steps=1, donate=False)
    step2 = make_train_step(model, tx, gradient_clip=0.0, accum_steps=2, donate=False)
    s1, m1 = step1(create_train_state(params, tx), batch, 1e-3, key)
    s2, m2 = step2(create_train_state(params, tx), batch, 1e-3, key)
    assert np.isclose(float(m1["loss_sum"]), float(m2["loss_sum"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_lr_schedule_resume_semantics():
    """load_lr_state=True continues the original schedule (start_chunk=1);
    False restarts warmup + cosine horizon at the resumed chunk
    (ref train.py:1097-1146)."""
    from novic_tpu.train.optim import lr_schedule_per_chunk

    init, final, N = 1e-3, 1e-5, 20
    orig = lr_schedule_per_chunk(init, final, "cosine", 0, N)
    # Fresh schedule endpoints
    assert orig(1) == pytest.approx(init)
    assert orig(N) == pytest.approx(final)
    # Continuation: same function evaluated at the resumed chunk
    resumed = lr_schedule_per_chunk(init, final, "cosine", 0, N, start_chunk=1)
    for c in (8, 12, N):
        assert resumed(c) == pytest.approx(orig(c))
    # Fresh restart at chunk 8: back to full init_lr, horizon = remaining chunks
    fresh = lr_schedule_per_chunk(init, final, "cosine", 0, N, start_chunk=8)
    assert fresh(8) == pytest.approx(init)
    assert fresh(N) == pytest.approx(final)
    assert fresh(12) > orig(12)  # restarted schedule is above the original mid-run
    # Warmup restarts with the fresh schedule too
    warm = lr_schedule_per_chunk(init, 0.0, "const", 3, N, start_chunk=8)
    assert warm(8) == pytest.approx(init / 4)
    assert warm(11) == pytest.approx(init)


def test_orbax_checkpoint_roundtrip(tmp_path):
    """Orbax directory checkpoints round-trip the same schema as .npz and load
    through the generic load_checkpoint dispatch."""
    from novic_tpu.models.config import DecoderModelConfig
    from novic_tpu.text.target import TargetConfig
    from novic_tpu.train.checkpoint import load_checkpoint, save_checkpoint_orbax

    cfg = DecoderModelConfig(embed_dim=8, vocab_size=12, token_length=4,
                             hidden_dim=8, num_layers=1, num_heads=2)
    tc = TargetConfig(vocab_size=12, token_dtype="int32", mask_dtype="bool",
                      start_token_id=None, end_token_id=0, pad_token_id=0,
                      compact_ids=True, compact_map=np.arange(12, dtype=np.int32),
                      compact_unmap=np.arange(12, dtype=np.int32),
                      fixed_token_length=False, token_length=4, use_masks=True)
    params = {"a": np.arange(6, dtype=np.float32).reshape(2, 3),
              "nest": {"b": np.ones((4,), np.float32)}}
    opt = [np.zeros((2, 3), np.float32), np.full((4,), 7.0, np.float32)]
    path = str(tmp_path / "ckpt.orbax")
    save_checkpoint_orbax(path, params=params, cfg_flat={"init_lr": 1e-3},
                          model_config=cfg, target_config=tc, data_config={"x": 1},
                          target_nouns=("", "dog"), num_invalid_target_nouns=1,
                          opt_state_arrays=opt, train_meta={"chunk_id": 3})
    ckpt = load_checkpoint(path)
    np.testing.assert_array_equal(ckpt["params"]["a"], params["a"])
    np.testing.assert_array_equal(ckpt["params"]["nest"]["b"], params["nest"]["b"])
    np.testing.assert_array_equal(ckpt["opt_arrays"][1], opt[1])
    assert ckpt["model_config"].vocab_size == 12
    assert ckpt["target_nouns"] == ("", "dog")
    assert ckpt["cfg_flat"]["init_lr"] == 1e-3
    assert ckpt["train_meta"]["chunk_id"] == 3


def test_dp_train_step_matches_single_device(setup):
    """One train step over the 8-device DP mesh produces the same params and
    metrics as the single-device step (XLA psum gradient reduction is exact
    for a replicated batch partitioning with sum-based loss)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from novic_tpu.train.step import create_train_state, make_train_step
    from novic_tpu.train.optim import create_optimizer

    _, tok, tc, tt, path = setup
    model, params = make_model(tc)
    tx = create_optimizer(gradient_clip=1.0)

    rng = np.random.default_rng(4)
    B, C = 16, tc.token_length
    embed = rng.normal(size=(B, F)).astype(np.float32)
    embed /= np.linalg.norm(embed, axis=1, keepdims=True)
    target = np.zeros((B, C), np.int32)
    target[:, :2] = rng.integers(1, tc.vocab_size, size=(B, 2))
    mask = np.zeros((B, C), bool)
    mask[:, 3:] = True
    batch = (embed, target, mask, None)
    key = jax.random.PRNGKey(7)

    # Single device
    step1 = make_train_step(model, tx, gradient_clip=1.0, accum_steps=1, donate=False)
    s1, m1 = step1(create_train_state(params, tx), batch, 1e-3, key)

    # 8-device DP mesh
    mesh = create_mesh(jax.devices()[:8])
    replicated = NamedSharding(mesh, P())
    sharded = NamedSharding(mesh, P("data"))
    step8 = make_train_step(model, tx, gradient_clip=1.0, accum_steps=1, donate=False,
                            in_shardings=(replicated, (sharded,) * 4, None, None))
    state8 = jax.device_put(create_train_state(params, tx), replicated)
    batch8 = tuple(jax.device_put(b, sharded) if b is not None else None for b in batch)
    s8, m8 = step8(state8, batch8, 1e-3, key)

    assert np.isclose(float(m1["loss_sum"]), float(m8["loss_sum"]), rtol=1e-6)
    assert np.isclose(float(m1["grad_norm"]), float(m8["grad_norm"]), rtol=1e-5)
    # atol 1e-5: psum reduction order perturbs f32 grads at ~1e-7; a REAL
    # sharding bug (wrong psum, missing reduction) shows up at the 1e-3 scale
    # because AdamW's g/sqrt(v) normalizes update magnitudes to ~lr
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_fast_dropout_statistics():
    """FastDropout: correct keep rate (1/65536 quantization), inverted-scale
    outputs, identity when deterministic or rate=0."""
    import jax.numpy as jnp

    from novic_tpu.models.layers import FastDropout

    x = jnp.ones((64, 257))  # odd element count exercises the unpack tail
    drop = FastDropout(rate=0.25)
    y = drop.apply({}, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(0)})
    y = np.asarray(y)
    kept = y != 0.0
    assert abs(kept.mean() - 0.75) < 0.01
    np.testing.assert_allclose(y[kept], 1.0 / 0.75, rtol=1e-6)
    # Deterministic and rate-0 paths are exact identities
    y_det = drop.apply({}, x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(y_det), np.asarray(x))
    y0 = FastDropout(rate=0.0).apply({}, x, deterministic=False,
                                     rngs={"dropout": jax.random.PRNGKey(0)})
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(x))
    # Different keys give different masks
    y2 = np.asarray(drop.apply({}, x, deterministic=False,
                               rngs={"dropout": jax.random.PRNGKey(1)}))
    assert (np.asarray(y) != y2).any()


def test_native_torch_pickle_reader(tmp_path):
    """The torch-free pickle reader matches torch.load on the reference
    checkpoint schema: bf16 (widened to f32), 0-d scalars, non-contiguous
    strides, nested dicts (SURVEY hard part (e))."""
    torch = pytest.importorskip("torch")
    from novic_tpu.train.torch_pickle import load_torch_pickle

    ckpt = {
        "cfg_flat": {"init_lr": 1.5e-3, "model": "PrefixedIterDecoder"},
        "target_config": {"vocab_size": 7,
                          "compact_map": torch.arange(10, dtype=torch.int32),
                          "start_token_id": None},
        "model_state_dict": {"w": torch.randn(7, 16),
                             "wb": torch.randn(8, 4).to(torch.bfloat16),
                             "scale": torch.tensor(0.5)},
        "strided": torch.randn(4, 6).t(),
    }
    path = str(tmp_path / "ref.model")
    torch.save(ckpt, path)
    native = load_torch_pickle(path)
    ref = torch.load(path, weights_only=False)
    assert native["cfg_flat"] == ref["cfg_flat"]
    assert native["target_config"]["start_token_id"] is None
    np.testing.assert_array_equal(native["target_config"]["compact_map"],
                                  ref["target_config"]["compact_map"].numpy())
    for k, v in ref["model_state_dict"].items():
        np.testing.assert_array_equal(np.asarray(native["model_state_dict"][k], np.float32),
                                      v.float().numpy())
    np.testing.assert_array_equal(native["strided"], ref["strided"].numpy())


def test_native_torch_pickle_rejects_exotic_classes(tmp_path):
    """Classes outside the reference's TorchSaveClasses audit are refused."""
    torch = pytest.importorskip("torch")
    import pickle as _pickle

    from novic_tpu.train.torch_pickle import load_torch_pickle

    import collections

    path = str(tmp_path / "evil.model")
    # Counter is picklable but outside the audited class set
    torch.save({"x": collections.Counter(a=1)}, path)
    with pytest.raises((_pickle.UnpicklingError, AttributeError)):
        load_torch_pickle(path)


def test_native_torch_pickle_rejects_builtins_rce(tmp_path):
    """A crafted data.pkl that REDUCEs builtins.eval must be refused — the
    builtins branch is an explicit allowlist, never getattr(builtins, name)."""
    import io
    import pickle as _pickle
    import pickletools
    import zipfile

    from novic_tpu.train.torch_pickle import load_torch_pickle

    sentinel = str(tmp_path / "pwned")
    # Hand-assemble: GLOBAL builtins.eval; ('open(...,"w").close()',); REDUCE
    payload = (
        b"\x80\x02cbuiltins\neval\n"
        + b"(X" + len(arg := f"open({sentinel!r}, 'w').close()").to_bytes(4, "little")
        + arg.encode() + b"t"
        + b"R."
    )
    pickletools.dis(payload, out=io.StringIO())  # well-formed pickle
    path = str(tmp_path / "rce.model")
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("archive/data.pkl", payload)
    with pytest.raises(_pickle.UnpicklingError, match="Refusing"):
        load_torch_pickle(path)
    import os

    assert not os.path.exists(sentinel), "payload executed — RCE regression"


def test_load_reference_checkpoint_never_falls_back_on_refusal(tmp_path):
    """Files the restricted unpickler REFUSES must not be re-loaded through a
    more permissive torch.load fallback (permission laundering)."""
    import pickle as _pickle
    import zipfile

    from novic_tpu.train.checkpoint import load_reference_checkpoint

    # GLOBAL builtins.eval; ('1+1',); REDUCE
    payload = b"\x80\x02cbuiltins\neval\n(X\x03\x00\x00\x001+1tR."
    path = str(tmp_path / "refuse.train")
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("archive/data.pkl", payload)
    with pytest.raises(_pickle.UnpicklingError):
        load_reference_checkpoint(path)


def test_reference_adamw_state_conversion(setup, tmp_path):
    """Reference torch-AdamW optimizer moments convert into our optax state:
    the param-index mapping is validated against a REAL torch AdamW built
    exactly like the reference (1D no-decay group first, then ND decay group,
    each in parameters() order — ref train.py:1103-1116)."""
    torch = pytest.importorskip("torch")
    from novic_tpu.train.checkpoint import (
        load_reference_checkpoint,
        params_to_torch_state_dict,
    )

    tmp, tok, tc, tt, cache_path = setup
    model, params = make_model(tc)
    np_params = jax.tree.map(np.asarray, params)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v)).clone()
          for k, v in params_to_torch_state_dict(np_params, model.cfg).items()}
    param_keys = [k for k in sd if k != "causality_mask"]
    for k in param_keys:
        sd[k].requires_grad_(True)
    p1d = [sd[k] for k in param_keys if sd[k].dim() < 2]
    pnd = [sd[k] for k in param_keys if sd[k].dim() >= 2]
    opt = torch.optim.AdamW([{"params": p1d, "weight_decay": 0.0},
                             {"params": pnd, "weight_decay": 0.1}],
                            lr=1e-3, betas=(0.9, 0.95))
    # Distinct, recognizable gradients per param -> distinct moments
    gen = torch.Generator().manual_seed(0)
    for k in param_keys:
        sd[k].grad = torch.randn(sd[k].shape, generator=gen)
    opt.step()

    cfg_flat = {f: getattr(model.cfg, f) for f in model.cfg.__dataclass_fields__}
    cfg_flat.update(beta1=0.9, beta2=0.95, weight_decay=0.1, weight_decay_1d=False)
    ckpt = {
        "cfg_flat": cfg_flat,
        "target_config": {"vocab_size": tc.vocab_size, "token_dtype": torch.int32,
                          "mask_dtype": torch.bool, "start_token_id": None,
                          "end_token_id": 0, "pad_token_id": 0, "compact_ids": True,
                          "compact_map": torch.from_numpy(tc.compact_map),
                          "compact_unmap": torch.from_numpy(tc.compact_unmap),
                          "fixed_token_length": True, "token_length": tc.token_length,
                          "use_masks": True},
        "data_config": {},
        "model_state_dict": {k: v.detach() for k, v in sd.items()},
        "target_nouns": ("",) + tuple(NOUNS),
        "num_invalid_target_nouns": 1,
        "train_loop_state": {"chunk_id": 3},
        "optimizer_type": "torch.optim.AdamW",
        "optimizer_state_dict": opt.state_dict(),
    }
    path = str(tmp_path / "adamw.train")
    torch.save(ckpt, path)

    loaded = load_reference_checkpoint(path)
    assert loaded["opt_arrays"] is not None
    assert loaded["train_meta"]["loop_state"]["chunk_id"] == 3

    # Rebuild the optax state and compare every mu/nu leaf against the torch
    # moments by NAME (independent of the index mapping under test)
    from novic_tpu.train.loop import restore_opt_state
    from novic_tpu.train.optim import create_optimizer
    from novic_tpu.train.step import create_train_state
    from novic_tpu.train.checkpoint import torch_state_dict_to_params

    tx = create_optimizer(beta1=0.9, beta2=0.95, weight_decay=0.1,
                          weight_decay_1d=False)
    state = create_train_state(loaded["params"], tx)
    state = restore_opt_state(state, loaded["opt_arrays"])
    adam = state.opt_state.inner_state[0]
    assert int(adam.count) == 1  # one optimizer step taken
    expect_mu = torch_state_dict_to_params(
        {k: opt.state[sd[k]]["exp_avg"] for k in param_keys}, model.cfg)
    expect_nu = torch_state_dict_to_params(
        {k: opt.state[sd[k]]["exp_avg_sq"] for k in param_keys}, model.cfg)
    for a, b in zip(jax.tree.leaves(adam.mu), jax.tree.leaves(expect_mu)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
    for a, b in zip(jax.tree.leaves(adam.nu), jax.tree.leaves(expect_nu)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_adamp_matches_reference_algorithm():
    """AdamP (ref train.py:1121 optimizer=AdamP) vs an explicit numpy
    transcription of the published algorithm (timm semantics: Adam moments
    with bias correction, nesterov perturbation, channel-then-layer
    projection when max |cos(grad,param)| < delta/sqrt(row), weight decay
    scaled by wd_ratio under projection and applied before the step)."""
    import optax

    from novic_tpu.train.optim import adamp

    rng = np.random.default_rng(0)
    # 2D scale-invariant-ish param (rows ~orthogonal to grads -> projection
    # triggers), a generic 2D param with aligned grads (no projection), 1D
    params = {
        "w_si": rng.normal(size=(4, 8)).astype(np.float32),
        "w": rng.normal(size=(3, 5)).astype(np.float32),
        "b": rng.normal(size=(6,)).astype(np.float32),
    }
    grads_seq = []
    for t in range(3):
        g = {
            # orthogonalize grads to the w_si rows to force the projection path
            "w_si": rng.normal(size=(4, 8)).astype(np.float32),
            "w": (params["w"] * 0.5 + 0.05 * rng.normal(size=(3, 5))).astype(np.float32),
            "b": rng.normal(size=(6,)).astype(np.float32),
        }
        rows = params["w_si"] / np.linalg.norm(params["w_si"], axis=1, keepdims=True)
        g["w_si"] -= rows * (rows * g["w_si"]).sum(axis=1, keepdims=True)
        g["w_si"] = g["w_si"].astype(np.float32)
        grads_seq.append(g)

    LR, B1, B2, EPS, WD, DELTA, WDR = 0.01, 0.9, 0.95, 1e-8, 0.1, 0.1, 0.1

    def ref_adamp(params, grads_seq, nesterov):
        p = {k: v.astype(np.float64).copy() for k, v in params.items()}
        m = {k: np.zeros_like(v) for k, v in p.items()}
        v = {k: np.zeros_like(x) for k, x in p.items()}
        for t, grads in enumerate(grads_seq, start=1):
            for k, g in grads.items():
                g = g.astype(np.float64)
                m[k] = B1 * m[k] + (1 - B1) * g
                v[k] = B2 * v[k] + (1 - B2) * g * g
                bias1, bias2 = 1 - B1 ** t, 1 - B2 ** t
                denom = np.sqrt(v[k]) / np.sqrt(bias2) + EPS
                pert = ((B1 * m[k] + (1 - B1) * g) / denom if nesterov
                        else m[k] / denom)
                wd = 1.0
                if p[k].ndim > 1:
                    done = False
                    for view_rows in (p[k].shape[0], 1):
                        pv = p[k].reshape(view_rows, -1)
                        gv = g.reshape(view_rows, -1)
                        cos = np.abs((pv * gv).sum(1)) / (
                            np.linalg.norm(pv, axis=1) + EPS) / (
                            np.linalg.norm(gv, axis=1) + EPS)
                        if cos.max() < DELTA / np.sqrt(pv.shape[1]):
                            p_n = (pv / (np.linalg.norm(pv, axis=1, keepdims=True)
                                         + EPS)).reshape(p[k].shape)
                            radial = (p_n * pert).reshape(view_rows, -1).sum(1)
                            pert = pert - p_n * radial.reshape(
                                (view_rows,) + (1,) * (p[k].ndim - 1))
                            wd = WDR
                            done = True
                            break
                    del done
                if p[k].ndim >= 2:  # decay mask: 2D+ only (AdamW-style split)
                    p[k] *= 1 - LR * WD * wd
                p[k] -= (LR / bias1) * pert
        return p

    for nesterov in (True, False):
        tx = adamp(LR, b1=B1, b2=B2, eps=EPS, weight_decay=WD, nesterov=nesterov,
                   mask=lambda ps: jax.tree.map(lambda x: x.ndim >= 2, ps))
        state = tx.init(params)
        p = {k: jnp.asarray(v) for k, v in params.items()}
        for grads in grads_seq:
            updates, state = tx.update(
                {k: jnp.asarray(v) for k, v in grads.items()}, state, p)
            p = optax.apply_updates(p, updates)
        expect = ref_adamp(params, grads_seq, nesterov)
        for k in params:
            np.testing.assert_allclose(np.asarray(p[k]), expect[k], rtol=2e-5,
                                       atol=2e-6, err_msg=f"{k} nesterov={nesterov}")

    # The projection genuinely triggered for w_si (its trajectory differs from
    # plain AdamW under the same sequence)
    tx_adamw = optax.adamw(LR, b1=B1, b2=B2, eps=EPS, weight_decay=WD,
                           mask=lambda ps: jax.tree.map(lambda x: x.ndim >= 2, ps))
    sw = tx_adamw.init(params)
    pw = {k: jnp.asarray(v) for k, v in params.items()}
    for grads in grads_seq:
        up, sw = tx_adamw.update({k: jnp.asarray(v) for k, v in grads.items()}, sw, pw)
        pw = optax.apply_updates(pw, up)
    assert not np.allclose(np.asarray(pw["w_si"]), np.asarray(p["w_si"]), atol=1e-6)


def test_train_loop_adamp_smoke():
    """optimizer=AdamP trains through the CLI loop (loss decreases)."""
    from novic_tpu.cli.train import main as cli_main

    import glob
    import json
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        vocab = [{"id": i, "target_noun": n, "pretty_noun": n.capitalize(),
                  "singulars": [n], "plurals": [n + "s"], "singulars_freq": [2],
                  "plurals_freq": [1], "hypernyms": []}
                 for i, n in enumerate(["dog", "cat", "apple", "tree"])]
        with open(f"{d}/vocab.json", "w") as f:
            json.dump(vocab, f)
        args = ["embedder=test:32", f"vocab_path={d}/vocab.json", "prompt_path=",
                "prompt_collection=Basic", "hypernym_collection=None", "seed=2",
                f"output_dir={d}/outputs"]
        cache = f"{d}/cache.bin"
        cli_main(["action=convert_noun_dataset", f"save_embedding_cache={cache}"] + args)
        state, S, ewa = cli_main(
            ["action=train", f"embedding_dataset={cache}", "optimizer=AdamP",
             "chunk_scale=4", "max_chunks=3", "init_lr=3e-3", "batch_size=8",
             "hidden_dim=32", "num_layers=2", "num_heads=4", "mlp_seq_len=2",
             "input_dropout=0.0", "layer_dropout=0.0", "save_every_max=100",
             "save_top1_min=200"] + args)
        assert np.isfinite(ewa.loss) and ewa.top1 > 0.2


class ListLoader:
    """Minimal in-memory loader for loop-level tests."""

    def __init__(self, batches):
        self.batches = batches

    def __len__(self):
        return len(self.batches)

    def __iter__(self):
        return iter(self.batches)


def test_loop_accum_matches_big_batch(setup):
    """Loop-level gradient accumulation (accum_size loader batches -> one
    optimizer step, reference GradAccum semantics ref
    embedding_dataset.py:198-273) produces the same parameters as training on
    the pre-concatenated meta-batches, including when group members differ in
    trimmed token length (the loop pads them back, train/loop.py
    _accum_concat)."""
    tmp, tok, tc, tt, cache_path = setup
    rng = np.random.default_rng(11)
    F_, B, C_tok = F, 8, tc.token_length
    n_groups = 4

    small_batches = []
    for g in range(n_groups):
        for k in range(2):
            embed = rng.normal(size=(B, F_)).astype(np.float32)
            embed /= np.linalg.norm(embed, axis=1, keepdims=True)
            target = rng.integers(2, tc.vocab_size, size=(B, C_tok)).astype(np.int32)
            mask = np.zeros((B, C_tok), dtype=bool)
            # Equal loss basis per microbatch (C_tok-1 unmasked tokens each, so
            # mean-of-means == pooled mean): k0 keeps an explicitly masked last
            # column, k1 has it trimmed away (the dataset's dynamic trim)
            mask[:, -1] = True
            target[:, -1] = 0
            if k == 1:
                target = target[:, :C_tok - 1]
                mask = mask[:, :C_tok - 1]
            small_batches.append((embed, target, mask, None))

    big_batches = []
    for g in range(n_groups):
        a, b = small_batches[2 * g], small_batches[2 * g + 1]

        def pad(x, val):
            w = a[1].shape[1] - x.shape[1]
            return np.pad(x, ((0, 0), (0, w)), constant_values=val) if w else x

        big_batches.append((np.concatenate([a[0], b[0]]),
                            np.concatenate([a[1], pad(b[1], 0)]),
                            np.concatenate([a[2], pad(b[2], True)]), None))

    results = []
    for batches, accum, bs in ((small_batches, 2, B), (big_batches, 1, 2 * B)):
        model, params = make_model(tc)
        C = TrainLoopConfig(chunk_batches=len(batches), chunk_samples=len(batches) * bs,
                            epoch_batches=len(batches), max_chunks=1, batch_size=bs,
                            accum_size=accum, init_lr=1e-3, lr_warmup=0,
                            save_every_max=1000, loss_ewa_halflife=1.0)
        state, S, ewa = train(model=model, params=params, dataset=None,
                              loader=ListLoader(batches), loader_info=None, C=C)
        results.append((jax.tree.map(np.asarray, state.params), ewa))

    (p1, e1), (p2, e2) = results
    flat1, flat2 = jax.tree.leaves(p1), jax.tree.leaves(p2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)
    assert abs(e1.loss - e2.loss) < 1e-4


def test_multi_step_dispatch_matches_per_step(setup):
    """steps_per_dispatch > 1 (K optimizer steps per host dispatch as one
    device-resident lax.scan, train/step.py steps_per_call) is dispatch
    plumbing only: params, EWA metrics and per-step grad-norm count must
    match per-step dispatch exactly. K=3 over 4 accumulation groups also
    exercises the partial-buffer flush at chunk end, and trimmed token
    lengths exercise the _accum_stack re-padding."""
    tmp, tok, tc, tt, cache_path = setup
    rng = np.random.default_rng(23)
    F_, B, C_tok = F, 8, tc.token_length
    batches = []
    for g in range(8):
        embed = rng.normal(size=(B, F_)).astype(np.float32)
        embed /= np.linalg.norm(embed, axis=1, keepdims=True)
        target = rng.integers(2, tc.vocab_size, size=(B, C_tok)).astype(np.int32)
        mask = np.zeros((B, C_tok), dtype=bool)
        mask[:, -1] = True
        target[:, -1] = 0
        if g % 2 == 1:  # alternate trimmed widths across groups
            target = target[:, :C_tok - 1]
            mask = mask[:, :C_tok - 1]
        batches.append((embed, target, mask, None))

    results = []
    for spd in (1, 3):
        model, params = make_model(tc)
        C = TrainLoopConfig(chunk_batches=len(batches), chunk_samples=len(batches) * B,
                            epoch_batches=len(batches), max_chunks=1, batch_size=B,
                            accum_size=2, steps_per_dispatch=spd, init_lr=1e-3,
                            lr_warmup=0, save_every_max=1000, loss_ewa_halflife=1.0)
        state, S, ewa = train(model=model, params=params, dataset=None,
                              loader=ListLoader(batches), loader_info=None, C=C)
        results.append((jax.tree.map(np.asarray, state.params), ewa, S))
    (p1, e1, s1), (p2, e2, s2) = results
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)
    assert abs(e1.loss - e2.loss) < 1e-4
    assert abs(e1.top1 - e2.top1) < 1e-6
    assert (s1.batch_id, s1.sample_id) == (s2.batch_id, s2.sample_id)
