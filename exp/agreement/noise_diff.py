"""Noise-augmentation distribution differential (round 3).

The noise schemes are parametric distributions over the unit sphere; torch
and jax PRNGs can never produce the same realizations, so the differential
compares DISTRIBUTIONS: for one shared unit base embedding, both stacks draw
200k noisy samples per scheme and must agree on angle mean/std, angle
quantiles (1/5/25/50/75/95/99), and output norms (always 1 after the
schemes' renormalization).

Catches formula-level divergences (wrong angle parametrization, unclamped
Gaussians, wrong mix semantics) that unit tests of our own code cannot.

Usage: python exp/agreement/noise_diff.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REF = "/root/reference"
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from fixture_store import resolve_work  # noqa: E402

WORK = resolve_work()

sys.path.insert(0, REPO)

F = 768
N = 200_000
SPECS = {
    "gauss_elem": {"scheme": "GaussElem", "vec_norm": 3.25, "angle_min": 0.0,
                   "angle_max": 0.0, "angle_std": 0.0, "mix_ratio": 0.0},
    "gauss_vec": {"scheme": "GaussVec", "vec_norm": 3.25, "angle_min": 0.0,
                  "angle_max": 0.0, "angle_std": 0.0, "mix_ratio": 0.0},
    "gauss_angle": {"scheme": "GaussAngle", "vec_norm": 0.0, "angle_min": 0.0,
                    "angle_max": 60.0, "angle_std": 10.0, "mix_ratio": 0.0},
    "uniform_angle": {"scheme": "UniformAngle", "vec_norm": 0.0,
                      "angle_min": 45.0, "angle_max": 75.0, "angle_std": 0.0,
                      "mix_ratio": 0.0},
    # The released FT0 recipe (ref README:322)
    "released_mix": {"scheme": "GaussElemUniformAngle", "vec_norm": 3.25,
                     "angle_min": 45.0, "angle_max": 75.0, "angle_std": 0.0,
                     "mix_ratio": 0.15},
}


def log(msg: str) -> None:
    print(f"[noise_diff] {msg}", flush=True)


def stats(noisy: np.ndarray, base: np.ndarray) -> dict:
    cos = np.clip(noisy @ base, -1.0, 1.0)
    angles = np.degrees(np.arccos(cos))
    norms = np.linalg.norm(noisy, axis=1)
    qs = [1, 5, 25, 50, 75, 95, 99]
    return {"angle_mean": float(angles.mean()), "angle_std": float(angles.std()),
            "angle_q": [float(x) for x in np.percentile(angles, qs)],
            "norm_mean": float(norms.mean()), "norm_std": float(norms.std())}


def main() -> None:
    rng = np.random.default_rng(11)
    base = rng.normal(size=F).astype(np.float32)
    base /= np.linalg.norm(base)
    base_npz = os.path.join(WORK, "noise_base.npz")
    np.savez(base_npz, base=base)
    spec_json = os.path.join(WORK, "noise_specs.json")
    with open(spec_json, "w") as f:
        json.dump(SPECS, f)

    # The reference driver seeds torch.manual_seed(123) and the base vector is
    # seeded above, so its stats are DETERMINISTIC per (SPECS, N, F): reuse a
    # prior run's dump when the key matches (the 1M seeded torch draws take
    # >20 min on a contended single core). NOISE_DIFF_REFRESH=1 forces re-run.
    import hashlib

    key = hashlib.sha256(
        json.dumps({"specs": SPECS, "n": N, "f": F}, sort_keys=True).encode()
    ).hexdigest()
    out = os.path.join(WORK, "ref_noise.json")
    ref = None
    if not os.environ.get("NOISE_DIFF_REFRESH"):
        try:
            with open(out) as f:
                cached = json.load(f)
            if cached.get("_meta", {}).get("key") == key:
                ref = cached
                log("reusing cached reference stats (seeded => deterministic); "
                    "NOISE_DIFF_REFRESH=1 re-runs the reference")
        except (OSError, ValueError):
            pass
    if ref is None:
        from run_agreement import _make_shims

        env = dict(os.environ)
        env["PYTHONPATH"] = REF + os.pathsep + _make_shims()
        env.pop("JAX_PLATFORMS", None)
        driver = os.path.join(REPO, "exp", "agreement", "ref_driver.py")
        proc = subprocess.run([sys.executable, driver, "noise", "--spec-json",
                               spec_json, "--base-npz", base_npz, "--num", str(N),
                               "--out", out],
                              env=env, cwd=REF, capture_output=True, text=True,
                              timeout=3600)
        sys.stdout.write(proc.stdout)
        if proc.returncode != 0:
            sys.stderr.write(proc.stderr)
            raise RuntimeError(f"ref noise failed rc={proc.returncode}")
        with open(out) as f:
            ref = json.load(f)
        ref["_meta"] = {"key": key}
        with open(out, "w") as f:
            json.dump(ref, f)
        from fixture_store import snapshot

        snapshot()  # mirror the dump durably alongside the other fixtures

    import jax

    jax.config.update("jax_platforms", "cpu")
    from novic_tpu.data.noise import EmbeddingNoise

    ok_all = True
    report = {}
    for name, kw in SPECS.items():
        noise = EmbeddingNoise.create(kw["scheme"], embed_dim=F,
                                      vec_norm=kw["vec_norm"],
                                      angle_min=kw["angle_min"],
                                      angle_max=kw["angle_max"],
                                      angle_std=kw["angle_std"],
                                      mix_ratio=kw["mix_ratio"])
        embed = np.tile(base, (N, 1))
        noisy = np.asarray(noise(jax.random.PRNGKey(42), embed))
        ours = stats(noisy, base)
        r = ref[name]
        # Sampling tolerance at N=200k: angle quantile se < 0.05deg; allow 0.2
        angle_ok = (abs(ours["angle_mean"] - r["angle_mean"]) < 0.1
                    and abs(ours["angle_std"] - r["angle_std"]) < 0.1
                    and all(abs(a - b) < 0.2
                            for a, b in zip(ours["angle_q"], r["angle_q"])))
        norm_ok = (abs(ours["norm_mean"] - r["norm_mean"]) < 1e-4
                   and abs(ours["norm_std"] - r["norm_std"]) < 1e-4)
        ok = angle_ok and norm_ok
        ok_all &= ok
        log(f"[{name}] angle ours {ours['angle_mean']:.3f}±{ours['angle_std']:.3f} "
            f"vs ref {r['angle_mean']:.3f}±{r['angle_std']:.3f}; "
            f"q50 {ours['angle_q'][3]:.3f} vs {r['angle_q'][3]:.3f}; "
            f"norm {ours['norm_mean']:.6f} vs {r['norm_mean']:.6f} -> "
            f"{'MATCH' if ok else 'MISMATCH'}")
        report[name] = {"ours": ours, "ref": r, "ok": ok}
    with open(os.path.join(WORK, "result_noise_diff.json"), "w") as f:
        json.dump(report, f, indent=1)
    if ok_all:
        log("ALL SCHEMES MATCH — noise distributions are identical to the "
            "reference's (incl. the released FT0 recipe mix)")
    else:
        sys.exit(1)


if __name__ == "__main__":
    main()
