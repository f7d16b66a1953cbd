"""Flat key=value config system (capability parity with the reference's hydra surface).

The reference drives everything through hydra + config/train.yaml with CLI
``key=value`` overrides (train.py:71, config/train.yaml). We provide the same
user surface without a hydra dependency: a YAML defaults file, dotted-key CLI
overrides parsed as YAML scalars, flat-dict round-trips for checkpoint
embedding (utils_config.py:10-19), and $SOURCE/$IMAGEDIR/$EMBEDDER path-tag
substitution (train.py:62-63, 4271-4280).
"""

from __future__ import annotations

import copy
import os
from typing import Any, Sequence

import yaml

from novic_tpu.utils.misc import AttrDict, flatten_dict, unflatten_dict

# Path tags: substituted into config string values on resolution (ref train.py:62-63).
SOURCE_TAG = "$SOURCE"     # Root directory of the novic_tpu source checkout
IMAGEDIR_TAG = "$IMAGEDIR" # Configured image directory
EMBEDDER_TAG = "$EMBEDDER" # Sanitized embedder spec (for cache/checkpoint dir naming)


def source_dir() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def default_config_path(name: str = "train.yaml") -> str:
    return os.path.join(source_dir(), "config", name)


def sanitize_embedder_spec(spec: str) -> str:
    """Embedder spec → filesystem-safe tag (ref train.py usage of $EMBEDDER)."""
    return spec.replace(":", "_").replace("/", "_")


def resolve_path_tags(path: str, *, image_dir: str | None = None, embedder_spec: str | None = None) -> str:
    """Substitute $SOURCE/$IMAGEDIR/$EMBEDDER path tags (ref train.py:4271-4280)."""
    if SOURCE_TAG in path:
        path = path.replace(SOURCE_TAG, source_dir())
    if IMAGEDIR_TAG in path:
        if image_dir is None:
            raise ValueError(f"Cannot resolve {IMAGEDIR_TAG} tag without a configured image dir: {path}")
        path = path.replace(IMAGEDIR_TAG, image_dir)
    if EMBEDDER_TAG in path:
        if embedder_spec is None:
            raise ValueError(f"Cannot resolve {EMBEDDER_TAG} tag without an embedder spec: {path}")
        path = path.replace(EMBEDDER_TAG, sanitize_embedder_spec(embedder_spec))
    return os.path.expanduser(path)


_SCI_FLOAT = __import__("re").compile(r"^[-+]?(\d+\.?\d*|\.\d+)[eE][-+]?\d+$")


def _coerce_scalar(value: Any) -> Any:
    # PyYAML 1.1 misses dot-less scientific notation ('3e-3' → str); coerce it.
    if isinstance(value, str) and _SCI_FLOAT.match(value):
        return float(value)
    return value


def parse_override(override: str) -> tuple[str, Any]:
    """Parse a single ``dotted.key=value`` override; value is YAML-parsed."""
    if "=" not in override:
        raise ValueError(f"Config override must be of the form key=value: {override}")
    key, _, raw = override.partition("=")
    key = key.strip()
    if not key:
        raise ValueError(f"Config override has empty key: {override}")
    value = _coerce_scalar(yaml.safe_load(raw)) if raw != "" else None
    return key, value


def apply_overrides(cfg: dict, overrides: Sequence[str]) -> dict:
    """Apply ``key=value`` overrides to a nested config dict, in order.

    Keys must already exist in the defaults (typo protection), unless prefixed
    with ``+`` to add a new key (same semantics as hydra's ``+key=value``).
    """
    flat = flatten_dict(cfg)
    for override in overrides:
        key, value = parse_override(override)
        allow_new = key.startswith("+")
        if allow_new:
            key = key[1:]
        if not allow_new and key not in flat:
            raise KeyError(f"Unknown config key '{key}' (use +{key}=... to add a new key)")
        flat[key] = value
    return unflatten_dict(flat)


def load_config(
    config_path: str | None = None,
    overrides: Sequence[str] = (),
    base: dict | None = None,
) -> AttrDict:
    """Load YAML defaults (or ``base`` dict) and apply CLI overrides."""
    if base is not None:
        cfg = copy.deepcopy(base)
    else:
        path = config_path or default_config_path()
        with open(path, "r") as f:
            cfg = yaml.safe_load(f) or {}
    cfg = apply_overrides(cfg, overrides)
    return AttrDict.from_dict(cfg)


def config_to_flat(cfg: dict) -> dict:
    """Nested config → flat dot-keyed dict for checkpoint embedding (ref utils_config.py:10-19)."""
    return flatten_dict(dict(cfg))


def flat_to_config(flat: dict) -> AttrDict:
    return AttrDict.from_dict(unflatten_dict(dict(flat)))
