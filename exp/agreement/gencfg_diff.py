"""GenerationConfig grid differential: our load_generation_configs /
load_generation_config vs the REFERENCE'S OWN (ref train.py:3775-3832),
imported and driven over a set of config cases.

Pins: the grid expansion order, the greedy-irrelevant-axis coercions
(topk=1, prior=none, guide renorm->plain, tau=1, alpha=0), prior-string
parsing (tok/tgt + scaler), the guided coupling for method 'all', ordered
dedup across explicit gencfgs + grid, the no-spec fallback to the default
greedy config with action kwargs, and error behavior on invalid axis values.

Usage: python exp/agreement/gencfg_diff.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REF = "/root/reference"
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from fixture_store import resolve_work  # noqa: E402

WORK = resolve_work()

sys.path.insert(0, REPO)

CASES = [
    # Reference-default grid (all six axes at their yaml defaults).
    {"name": "default_grid", "cfg": {"gencfgs_grid": True}},
    # Explicit gencfgs + grid, with duplicates across both.
    {"name": "explicit_plus_grid",
     "cfg": {"gencfgs": ["beam_k10_vnone_gn_t1_a0", "greedy_k1_vnone_gp_t1_a0"],
             "gencfgs_grid": True,
             "gencfg_method": ["greedy", "beam"], "gencfg_topk": [10],
             "gencfg_prior": ["none", "tok0.5"], "gencfg_guide": ["none", "plain"],
             "gencfg_tau": [1], "gencfg_alpha": [0]}},
    # All three methods x all three guide modes (guided coupling for 'all',
    # greedy renorm->plain coercion).
    {"name": "methods_guides",
     "cfg": {"gencfgs_grid": True,
             "gencfg_method": ["greedy", "beam", "all"], "gencfg_topk": [5],
             "gencfg_prior": ["none", "tgt0.25"],
             "gencfg_guide": ["none", "plain", "renorm"],
             "gencfg_tau": [0.5, 2], "gencfg_alpha": [0.2]}},
    # Fallback: no specs at all, action kwargs apply (eval_guided=True path).
    {"name": "fallback_kwargs", "cfg": {}, "kwargs": {"guided": True}},
    # Fallback: cfg.gencfg wins over kwargs.
    {"name": "fallback_gencfg",
     "cfg": {"gencfg": "beam_k3_vtok0.25_gr_t2_a0.5"}, "kwargs": {"guided": False}},
    # Errors: unparseable prior / invalid guide.
    {"name": "bad_prior",
     "cfg": {"gencfgs_grid": True, "gencfg_method": ["beam"], "gencfg_topk": [5],
             "gencfg_prior": ["bogus9"], "gencfg_guide": ["plain"],
             "gencfg_tau": [1], "gencfg_alpha": [0]}},
    {"name": "bad_guide",
     "cfg": {"gencfgs_grid": True, "gencfg_method": ["beam"], "gencfg_topk": [5],
             "gencfg_prior": ["none"], "gencfg_guide": ["sideways"],
             "gencfg_tau": [1], "gencfg_alpha": [0]}},
]


def log(msg: str) -> None:
    print(f"[gencfg_diff] {msg}", flush=True)


def run_ref(cases_json: str, out: str) -> list:
    from run_agreement import _make_shims

    env = dict(os.environ)
    env["PYTHONPATH"] = REF + os.pathsep + _make_shims()
    env.pop("JAX_PLATFORMS", None)
    driver = os.path.join(REPO, "exp", "agreement", "ref_driver.py")
    proc = subprocess.run(
        [sys.executable, driver, "gencfgs", "--cases-json", cases_json,
         "--out", out],
        env=env, cwd=REF, capture_output=True, text=True, timeout=600)
    sys.stdout.write(proc.stdout)
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr)
        raise RuntimeError(f"ref gencfgs failed rc={proc.returncode}")
    with open(out) as f:
        return json.load(f)


def run_ours() -> list:
    from novic_tpu.cli.actions_eval import load_generation_configs
    from novic_tpu.utils.config import default_config_path, load_config

    out = []
    for case in CASES:
        cfg = load_config(default_config_path())
        for k, v in case.get("cfg", {}).items():
            cfg[k] = v
        try:
            gencfgs = load_generation_configs(cfg, **case.get("kwargs", {}))
            out.append({"names": [g.name for g in gencfgs]})
        except ValueError as e:
            out.append({"error": str(e)})
    return out


def main() -> None:
    cases_json = os.path.join(WORK, "gencfg_diff_cases.json")
    with open(cases_json, "w") as f:
        json.dump(CASES, f)
    ref = run_ref(cases_json, os.path.join(WORK, "ref_gencfgs.json"))
    ours = run_ours()
    ok = True
    for case, r, o in zip(CASES, ref, ours):
        name = case["name"]
        if ("error" in r) != ("error" in o):
            log(f"[{name}] error-behavior mismatch: ref {r} vs ours {o}")
            ok = False
        elif "error" in r:
            log(f"[{name}] MATCH — both raise ({r['error'][:60]!r})")
        elif r["names"] != o["names"]:
            log(f"[{name}] MISMATCH: ref {len(r['names'])} vs ours "
                f"{len(o['names'])} gencfgs")
            for a, b in zip(r["names"], o["names"]):
                if a != b:
                    log(f"  first diff: ref {a} vs ours {b}")
                    break
            extra_r = [n for n in r["names"] if n not in o["names"]]
            extra_o = [n for n in o["names"] if n not in r["names"]]
            if extra_r:
                log(f"  only-ref: {extra_r[:5]}")
            if extra_o:
                log(f"  only-ours: {extra_o[:5]}")
            ok = False
        else:
            log(f"[{name}] MATCH — {len(r['names'])} gencfgs identical in order")
    if ok:
        log("ALL CASES MATCH — gencfg grid/dedup/fallback is differentially "
            "identical to the reference")
    else:
        sys.exit(1)


if __name__ == "__main__":
    main()
