"""profile_dir wiring: action=train captures a jax profiler trace of chunk 1.

The reference's only observability is wall-clock timers (SURVEY §5); the
TPU-native equivalent is an xprof trace, reachable from the config surface
(config/train.yaml profile_dir -> train/loop.py jax.profiler.start_trace).
"""

import pytest

pytestmark = pytest.mark.slow  # full-tier (pytest --full)

import glob
import json
import os

from novic_tpu.cli.train import main

VOCAB = [
    {"id": i, "target_noun": n, "pretty_noun": n.title(), "singulars": [n],
     "plurals": [n + "s"], "singulars_freq": [2], "plurals_freq": [1], "hypernyms": []}
    for i, n in enumerate(["dog", "cat", "apple", "pear"])
]


def test_train_profile_dir(tmp_path):
    with open(tmp_path / "vocab.json", "w") as f:
        json.dump(VOCAB, f)
    args = ["embedder=test:32", f"vocab_path={tmp_path}/vocab.json", "prompt_path=",
            "prompt_collection=Basic", "hypernym_collection=None", "seed=1",
            f"output_dir={tmp_path}/outputs"]
    cache = f"{tmp_path}/noun_cache.bin"
    main(["action=convert_noun_dataset", f"save_embedding_cache={cache}"] + args)
    prof = tmp_path / "trace"
    main(["action=train", f"embedding_dataset={cache}", "chunk_scale=4",
          "max_chunks=2", "batch_size=8", "hidden_dim=32", "num_layers=2",
          "num_heads=4", "mlp_seq_len=2", "input_dropout=0.0", "layer_dropout=0.0",
          "save_every_max=100", "save_top1_min=200", f"profile_dir={prof}"] + args)
    traces = glob.glob(os.path.join(prof, "**", "*.xplane.pb"), recursive=True)
    assert traces, f"no xplane trace written under {prof}"
