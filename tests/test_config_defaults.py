"""config/train.yaml sanity: parses, covers every registered action, numeric
types coerced, and the CLI dispatcher resolves every action."""

from novic_tpu.cli.train import build_action_registry
from novic_tpu.utils.config import default_config_path, load_config


def test_defaults_parse_and_types():
    cfg = load_config(default_config_path())
    assert cfg.action in build_action_registry()
    assert isinstance(cfg.init_lr, float) and cfg.init_lr == 1.5e-3
    assert isinstance(cfg.batch_size, int)
    assert isinstance(cfg.save_top1_min, float)
    assert isinstance(cfg.gencfg_topk, list)
    assert cfg.feedfwd_scale == "1/4"


def test_registry_complete():
    registry = build_action_registry()
    # Every action documented in the config header comment exists in the registry
    with open(default_config_path()) as f:
        header = f.read(1200)
    for action in registry:
        assert action in header, f"action '{action}' missing from config/train.yaml docs"


def test_override_types():
    cfg = load_config(default_config_path(),
                      ["init_lr=3e-4", "max_chunks=5", "gencfgs=[beam_k10_vnone_gn_t1_a0]"])
    assert cfg.init_lr == 3e-4 and cfg.max_chunks == 5
    assert cfg.gencfgs == ["beam_k10_vnone_gn_t1_a0"]
