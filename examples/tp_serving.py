"""Tensor-parallel tower serving over a device mesh — runs anywhere.

The big CLIP-family encoders (DFN5B ViT-H, SO400M) can shard their attention
heads and MLP hidden dim over a 'model' mesh axis (Megatron column/row
parallelism, expressed purely as GSPMD parameter shardings —
novic_tpu/parallel/tp.py). That cuts single-image latency by ~the axis size
where data parallelism cannot help (one image, one stream). This example
runs the same sharded code paths on an 8-device virtual CPU mesh and checks
the TP results against single-device numerics, for both a pure ('model',)
mesh and a 2-D ('data','model') mesh.

Run:  python examples/tp_serving.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8").strip()

import jax

if os.environ.get("NOVIC_MESH") != "real":
    jax.config.update("jax_platforms", "cpu")

import dataclasses

import numpy as np
from jax.sharding import Mesh

from novic_tpu.embedders.base import Embedder
from novic_tpu.embedders.registry import lookup
from novic_tpu.parallel.mesh import create_mesh


def main():
    devices = jax.devices()[:8]
    print(f"mesh: {len(devices)} x {devices[0].platform}")

    # A ViT-H-geometry tower, shrunk so the example runs in seconds; the
    # registered DFN5B/SO400M/CLIPA archs all validate at TP-2/4/8 (heads and
    # MLP hidden divide evenly — tests/test_tp.py pins this for the registry)
    emb = Embedder.create("openclip:apple/DFN5B-CLIP-ViT-H-14", load_model=False,
                          inference_batch_size=8, image_batch_size=8)
    arch = lookup("openclip:apple/DFN5B-CLIP-ViT-H-14")
    emb.arch = dataclasses.replace(
        arch,
        vision=dataclasses.replace(arch.vision, image_size=56, patch_size=14,
                                   width=128, layers=2, heads=16, embed_dim=64,
                                   compute_dtype="float32"),
        text=dataclasses.replace(arch.text, context_length=16, vocab_size=512,
                                 width=128, layers=2, heads=16, embed_dim=64,
                                 compute_dtype="float32"))
    emb.tokenizer.context_length = emb.arch.text.context_length
    emb.load_model()

    rng = np.random.default_rng(0)
    images = rng.random((8, 56, 56, 3)).astype(np.float32)
    ref = emb.inference_image(images)

    # Pure TP: Mesh('model', 8) — params sharded, batch replicated
    tp_mesh = create_mesh(devices, axis_names=("model",))
    emb.set_mesh(tp_mesh, mode="tp")
    tp = emb.inference_image(images)
    err_tp = float(np.abs(tp - ref).max())
    print(f"TP-8   : max abs diff vs single-device {err_tp:.2e}")

    # 2-D DP x TP: Mesh(('data', 2), ('model', 4))
    mesh2d = Mesh(np.asarray(devices).reshape(2, 4), ("data", "model"))
    emb.set_mesh(mesh2d, mode="dp_tp")
    dptp = emb.inference_image(images)
    err_2d = float(np.abs(dptp - ref).max())
    print(f"DP2xTP4: max abs diff vs single-device {err_2d:.2e}")

    assert err_tp < 2e-5 and err_2d < 2e-5
    shard = emb._vision_params["blocks_0"]["attn"]["q_proj_weight"].sharding
    print(f"q_proj sharding: {shard.spec}")
    print("OK: tensor-parallel tower serving matches single-device numerics")


if __name__ == "__main__":
    main()
