"""Data-parallel training + serving over a device mesh — runs anywhere.

On real hardware the mesh spans the TPU slice (e.g. v5e-8); without one this
example forces an 8-device virtual CPU mesh so the exact same sharded code
paths compile and execute (how the test suite and the driver's multichip
dryrun validate them).

The parallelism idiom (SURVEY.md §2.13): the 12M-param decoder is pure DP —
params replicated, batch sharded over the 'data' axis, gradient psum inserted
by XLA over ICI inside the single jitted train step. Serving shards image/
embedding batches the same way via NOVICModel.set_mesh / Embedder.set_mesh.

Run:  python examples/multichip_dp.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8").strip()

import jax

# Default to the virtual CPU mesh so the example always demonstrates real
# sharding; set NOVIC_MESH=real to run on the actual accelerator slice.
# (The platform must be pinned BEFORE the first device query initializes a
# backend — some plugins force-append themselves over the env var.)
if os.environ.get("NOVIC_MESH") != "real":
    jax.config.update("jax_platforms", "cpu")

import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from novic_tpu.data.noise import EmbeddingNoise
from novic_tpu.models import DecoderModelConfig, PrefixedIterDecoder
from novic_tpu.models.generate import generate_beam
from novic_tpu.parallel.mesh import create_mesh
from novic_tpu.train.optim import create_optimizer
from novic_tpu.train.step import create_train_state, make_train_step


def main():
    devices = jax.devices()
    mesh = create_mesh(devices)
    n = len(devices)
    print(f"mesh: {n} x {devices[0].platform} over axis 'data'")
    replicated = NamedSharding(mesh, P())
    sharded = NamedSharding(mesh, P("data"))

    cfg = DecoderModelConfig(embed_dim=128, vocab_size=512, token_length=8,
                             hidden_dim=128, num_layers=2, num_heads=4,
                             input_dropout=0.1, layer_dropout=0.1)
    decoder = PrefixedIterDecoder(cfg=cfg)
    params = jax.jit(decoder.init)({"params": jax.random.PRNGKey(0)},
                                   np.zeros((1, cfg.embed_dim), np.float32),
                                   np.zeros((1, cfg.token_length), np.int32))["params"]

    # --- DP training step: replicated params, sharded batch, psum by XLA ---
    tx = create_optimizer(gradient_clip=1.0)
    state = jax.device_put(create_train_state(params, tx), replicated)
    noise = EmbeddingNoise.create("GaussElemUniformAngle", vec_norm=0.5,
                                  angle_min=10, angle_max=30, mix_ratio=0.15)
    step = make_train_step(decoder, tx, noise=noise, gradient_clip=1.0,
                           accum_steps=1,
                           in_shardings=(replicated, (sharded,) * 4, None, None),
                           out_shardings=None)

    rng = np.random.default_rng(0)
    B = 16 * n
    embed = rng.normal(size=(B, cfg.embed_dim)).astype(np.float32)
    embed /= np.linalg.norm(embed, axis=1, keepdims=True)
    target = rng.integers(1, cfg.vocab_size, size=(B, cfg.token_length)).astype(np.int32)
    target[:, -2:] = 0
    mask = target == 0
    batch = tuple(jax.device_put(x, sharded) for x in
                  (embed, target, mask, np.ones(B, np.float32)))

    for it in range(3):
        state, metrics = step(state, batch, 1e-3, jax.random.PRNGKey(it))
        loss = float(metrics["loss_sum"]) / float(metrics["loss_basis"])
        print(f"step {it}: loss {loss:.4f}  grad_norm {float(metrics['grad_norm']):.3f}")

    # --- DP serving: batch-sharded beam decode with replicated params ------
    e = jax.device_put(embed, sharded)
    p = jax.device_put(state.params, replicated)
    tgt, pad, score = jax.jit(
        lambda p, e: generate_beam(decoder, p, e, topk=4))(p, e)
    print(f"beam-decoded {tgt.shape[0]} sharded embeddings -> "
          f"targets {tuple(tgt.shape)}, best score {float(score[:, 0].max()):.3f}")
    print("OK: replicated-params DP train + batch-sharded beam serving on the mesh")


if __name__ == "__main__":
    main()
