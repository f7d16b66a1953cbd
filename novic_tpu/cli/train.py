"""novic_tpu train CLI: the action dispatcher.

Usage (mirrors the reference's hydra entry point, ref train.py:71-155):

    python -m novic_tpu.cli.train action=<action> key=value ...

All keys default from config/train.yaml; nested keys are dotted; +key=value
adds new keys. See config/train.yaml for the documented flag surface.
"""

from __future__ import annotations

import sys
from typing import Optional, Sequence

from novic_tpu.utils.config import default_config_path, load_config
from novic_tpu.utils.logger import log


def build_action_registry() -> dict:
    from novic_tpu.cli import actions_cache, actions_eval, actions_misc, actions_train

    return {
        "test_data_loader": actions_cache.action_test_data_loader,
        "test_embed_cache": actions_cache.action_test_embed_cache,
        "embedder_zero_shot": actions_eval.action_embedder_zero_shot,
        "cache_noun_dataset": actions_cache.action_cache_noun_dataset,
        "convert_noun_dataset": actions_cache.action_convert_noun_dataset,
        "cache_noun_multiset": actions_cache.action_cache_noun_multiset,
        "cache_captions": actions_cache.action_cache_captions,
        "cache_cls": actions_cache.action_cache_cls,
        "cache_images": actions_cache.action_cache_images,
        "merge_caches": actions_cache.action_merge_caches,
        "train": actions_train.action_train,
        "fix_checkpoints": actions_train.action_fix_checkpoints,
        "eval": actions_eval.action_eval,
        "eval_cls": actions_eval.action_eval_cls,
        "eval_cls_decoding": actions_eval.action_eval_cls_decoding,
        "infer": actions_eval.action_infer,
        "format_preds": actions_eval.action_format_preds,
        "format_metrics": actions_eval.action_format_metrics,
        "format_wandb": actions_eval.action_format_wandb,
        "collect_wiki_images": actions_misc.action_collect_wiki_images,
        "sample_images": actions_misc.action_sample_images,
        "convert_embedder": actions_misc.action_convert_embedder,
    }


def main(argv: Optional[Sequence[str]] = None):
    argv = list(sys.argv[1:] if argv is None else argv)
    config_path = None
    overrides = []
    for arg in argv:
        if arg.startswith("--config="):
            config_path = arg.split("=", 1)[1]
        elif arg in ("-h", "--help"):
            registry = build_action_registry()
            print(__doc__)
            print("Actions: " + ", ".join(sorted(registry)))
            print(f"Config defaults: {default_config_path()}")
            return None
        else:
            overrides.append(arg)
    cfg = load_config(config_path, overrides)

    if cfg.seed:
        import random as _random

        import numpy as _np

        _random.seed(cfg.seed)
        _np.random.seed(cfg.seed)

    registry = build_action_registry()
    action = registry.get(cfg.action)
    if action is None:
        raise ValueError(f"Unknown action '{cfg.action}'. Available: {', '.join(sorted(registry))}")
    log.info(f"Running action: {cfg.action}")
    return action(cfg)


if __name__ == "__main__":
    main()
