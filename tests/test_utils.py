"""Tests for novic_tpu.utils (misc + config)."""

import dataclasses

import pytest

from novic_tpu.utils import config as cfg_mod
from novic_tpu.utils import misc


def test_flatten_unflatten_roundtrip():
    d = {"a": {"b": 1, "c": {"d": [1, 2]}}, "e": "x", "f": None}
    flat = misc.flatten_dict(d)
    assert flat == {"a.b": 1, "a.c.d": [1, 2], "e": "x", "f": None}
    assert misc.unflatten_dict(flat) == d


def test_unflatten_conflict():
    with pytest.raises(ValueError):
        misc.unflatten_dict({"a": 1, "a.b": 2})


def test_attrdict():
    d = misc.AttrDict.from_dict({"a": {"b": 3}})
    assert d.a.b == 3
    d.a.c = 4
    assert d["a"]["c"] == 4
    assert d.to_dict() == {"a": {"b": 3, "c": 4}}


def test_json_dumps_compact_lists():
    obj = {"a": [1, 2, 3], "b": {"c": [4, 5]}}
    s = misc.json_dumps(obj, indent=2)
    assert "[1, 2, 3]" in s.replace("\n", "") or "[ 1, 2, 3 ]" not in s
    # Lists are on a single line
    for line in s.splitlines():
        if "[" in line:
            assert "]" in line


def test_get_canon():
    assert misc.get_canon("Fire-Truck", sanitize=False) == "fire truck"
    assert misc.get_canon("  Déjà  Vu ", sanitize=True) == "deja vu"
    assert misc.get_canon("rock 'n' roll", sanitize=False) == "rock n roll"
    assert misc.get_canon("U.S. flag", sanitize=False) == "us flag"


def test_make_indefinite():
    assert misc.make_indefinite("apple") == "an apple"
    assert misc.make_indefinite("banana") == "a banana"
    assert misc.make_indefinite("hour") == "an hour"
    assert misc.make_indefinite("university") == "a university"
    assert misc.make_indefinite("FBI agent") == "an FBI agent"
    assert misc.make_indefinite("once-used tissue") == "a once-used tissue"
    assert misc.make_indefinite("egg", suffix=" cup") == "an egg cup"


def test_format_semifix():
    assert misc.format_semifix(1.2300, 4) == "1.23"
    assert misc.format_semifix(1.0, 2) == "1"


def test_dataclass_from_dict():
    @dataclasses.dataclass
    class Foo:
        a: int
        b: str

    foo = misc.dataclass_from_dict(Foo, {"a": 1, "b": "x"})
    assert foo == Foo(1, "x")
    with pytest.raises(ValueError):
        misc.dataclass_from_dict(Foo, {"a": 1})
    with pytest.raises(ValueError):
        misc.dataclass_from_dict(Foo, {"a": 1, "b": "x", "c": 2})


def test_config_overrides():
    base = {"action": "train", "model": {"hidden_dim": 512, "num_layers": 6}}
    cfg = cfg_mod.load_config(base=base, overrides=["model.hidden_dim=256", "action=eval"])
    assert cfg.model.hidden_dim == 256
    assert cfg.action == "eval"
    assert cfg.model.num_layers == 6


def test_config_unknown_key_rejected():
    with pytest.raises(KeyError):
        cfg_mod.load_config(base={"a": 1}, overrides=["b=2"])
    cfg = cfg_mod.load_config(base={"a": 1}, overrides=["+b=2"])
    assert cfg.b == 2


def test_config_yaml_value_types():
    base = {"a": None, "b": None, "c": None, "d": None}
    cfg = cfg_mod.load_config(base=base, overrides=["a=true", "b=3.5", "c=[1,2]", "d=null"])
    assert cfg.a is True and cfg.b == 3.5 and cfg.c == [1, 2] and cfg.d is None


def test_flat_roundtrip():
    base = {"x": {"y": 1}, "z": "s"}
    flat = cfg_mod.config_to_flat(base)
    assert cfg_mod.flat_to_config(flat).to_dict() == base


def test_path_tags(tmp_path):
    p = cfg_mod.resolve_path_tags("$SOURCE/config", image_dir=None, embedder_spec=None)
    assert p.endswith("/config") and "$" not in p
    p = cfg_mod.resolve_path_tags("$IMAGEDIR/x", image_dir=str(tmp_path))
    assert p == f"{tmp_path}/x"
    p = cfg_mod.resolve_path_tags("cache_$EMBEDDER.bin", embedder_spec="openclip:timm/ViT-B-16-SigLIP")
    assert p == "cache_openclip_timm_ViT-B-16-SigLIP.bin"
    with pytest.raises(ValueError):
        cfg_mod.resolve_path_tags("$IMAGEDIR/x")


def test_set_determinism():
    import random

    import numpy as np

    from novic_tpu.utils.misc import set_determinism

    set_determinism(123)
    a = (random.random(), np.random.rand())
    set_determinism(123)
    b = (random.random(), np.random.rand())
    assert a == b


def test_nan_check():
    import numpy as np
    import pytest

    from novic_tpu.utils.misc import nan_check

    nan_check({"w": np.ones(3), "b": np.zeros(2), "i": np.arange(3)})
    with pytest.raises(FloatingPointError, match="grads"):
        nan_check({"layer": {"w": np.array([1.0, np.nan])}}, name="grads")


def test_progress_bar():
    from novic_tpu.utils.misc import ProgressBar

    with ProgressBar("test", total=10, log_every=0.0) as bar:
        for _ in range(4):
            bar.update()
        bar.pause()
        bar.update(2)
        bar.resume()
        bar.update(4)
    assert bar.n == 10


def test_metrics_logger_wandb_kwargs(monkeypatch, tmp_path):
    """entity/group/name/tags/job_type reach wandb.init; falsy values dropped
    (ref wandb_* keys, ref config/train.yaml:24-33)."""
    import sys
    import types

    calls = {}
    stub = types.ModuleType("wandb")
    stub.init = lambda **kw: calls.update(kw)
    stub.log = lambda *a, **k: None
    stub.finish = lambda: None
    monkeypatch.setitem(sys.modules, "wandb", stub)

    from novic_tpu.utils.metrics import MetricsLogger

    m = MetricsLogger(run_dir=str(tmp_path), use_wandb=True, project="p",
                      name="n", wandb_kwargs={"entity": "", "group": "g",
                                              "tags": ["a", "b"], "job_type": ""})
    m.finish()
    assert calls["project"] == "p" and calls["name"] == "n"
    assert calls["group"] == "g" and calls["tags"] == ["a", "b"]
    assert "entity" not in calls and "job_type" not in calls  # falsy dropped

    # wandb_kwargs carrying 'name' (what cli.common.wandb_init_kwargs emits
    # when wandb_name is set) must not collide with the name= parameter
    calls.clear()
    m = MetricsLogger(run_dir=str(tmp_path), use_wandb=True, project="p",
                      wandb_kwargs={"name": "from_cfg", "group": "g"})
    m.finish()
    assert calls["name"] == "from_cfg"
    calls.clear()
    m = MetricsLogger(run_dir=str(tmp_path), use_wandb=True, project="p",
                      name="explicit", wandb_kwargs={"name": "from_cfg"})
    m.finish()
    assert calls["name"] == "explicit"  # explicit param wins


def test_wandb_init_kwargs_from_cfg():
    from novic_tpu.cli.common import wandb_init_kwargs
    from novic_tpu.utils.misc import AttrDict

    cfg = AttrDict({"wandb_entity": "e", "wandb_group": "", "wandb_name": "run1",
                    "wandb_tags": "tag1 tag2", "wandb_job_type": "train"})
    kw = wandb_init_kwargs(cfg)
    assert kw["entity"] == "e" and kw["name"] == "run1"
    assert kw["tags"] == ["tag1", "tag2"] and kw["job_type"] == "train"


def test_sort_table_rows_spec():
    """'[+|-][0]<header>' table sort (ref sort_table_rows train.py:4233-4266)."""
    from novic_tpu.cli.actions_eval import sort_table_rows

    headers = ("Model", "Top-1%")
    rows = [("b", "12.5%"), ("a", "7.1%"), ("c", "101.0%")]
    sort_table_rows(rows, headers, "model")
    assert [r[0] for r in rows] == ["a", "b", "c"]
    sort_table_rows(rows, headers, "-model")
    assert [r[0] for r in rows] == ["c", "b", "a"]
    # '0' prefix: numeric parse of the first float in the cell ("7.1%" < "12.5%"
    # numerically but "12.5%" < "7.1%" lexically)
    sort_table_rows(rows, headers, "0top-1%")
    assert [r[1] for r in rows] == ["7.1%", "12.5%", "101.0%"]
    sort_table_rows(rows, headers, "-0top-1%")
    assert [r[1] for r in rows] == ["101.0%", "12.5%", "7.1%"]
    # Missing header warns and falls back to column 0
    sort_table_rows(rows, headers, "bogus")
    assert [r[0] for r in rows] == ["a", "b", "c"]
