"""Cross-implementation differentials against the reference checkout.

These execute the REFERENCE'S OWN code (imported from /root/reference with
hydra/wandb/timm/torchvision shims) on shared inputs and require exact (or
distribution-level, for RNG) agreement with this framework. They complement
the unit suite: the oracle is the reference itself, not a transcription.

Skipped when the reference checkout or the round-2 agreement fixtures are
absent (the fixtures carry the shared seeded towers + trained decoder the
eval differential needs; `python exp/agreement/run_agreement.py` builds
them).
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # full-tier (pytest --full)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
sys.path.insert(0, os.path.join(REPO, "exp", "agreement"))
from fixture_store import dumps_present, fixtures_present, resolve_work  # noqa: E402

# resolve_work() reseeds the scratch work dir from the repo-local durable
# mirror (.agreement_fixtures/) if /tmp was wiped since the fixtures were
# built, so these tests stay green across reboots.
WORK = resolve_work()

needs_reference = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not present")


@pytest.fixture(scope="module")
def agreement_fixtures():
    """Self-building prerequisite: the shared seeded towers + trained decoder.

    The durable mirror (.agreement_fixtures/, ~32 MB) is gitignored, so a
    fresh checkout has neither it nor the /tmp scratch copy — rebuild once
    here (run_agreement.py phases assets/tokens/embeds/train + the
    reference-side labels/labels_extra decode dumps score_diff compares
    against, ~15 min CPU) instead of skipping; the build self-snapshots
    into the mirror so every later run is instant."""
    if fixtures_present(WORK) and dumps_present(WORK):
        return WORK
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "exp", "agreement", "run_agreement.py"),
         "--phases", "assets,tokens,embeds,train,labels,labels_extra"],
        capture_output=True, text=True, timeout=3600, env=env, cwd=REPO)
    assert proc.returncode == 0, \
        f"fixture build failed:\n{proc.stdout[-3000:]}\n{proc.stderr[-2000:]}"
    assert fixtures_present(resolve_work())
    return WORK


def run_diff(script: str, timeout: int = 1500) -> str:
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # scripts pin their own platforms
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "exp", "agreement", script)],
        capture_output=True, text=True, timeout=timeout, env=env, cwd=REPO)
    assert proc.returncode == 0, \
        f"{script} failed:\n{proc.stdout[-3000:]}\n{proc.stderr[-2000:]}"
    return proc.stdout


@needs_reference
def test_noun_dataset_differential(agreement_fixtures):
    out = run_diff("noun_diff.py")
    assert "ALL CASES MATCH" in out


@needs_reference
def test_gencfg_grid_differential(agreement_fixtures):
    out = run_diff("gencfg_diff.py", timeout=900)
    assert "ALL CASES MATCH" in out


@needs_reference
def test_cache_writer_stream_differential(agreement_fixtures):
    out = run_diff("writers_diff.py", timeout=1200)
    assert "ALL MATCH" in out


@needs_reference
def test_noise_differential(agreement_fixtures):
    # First build draws 1M seeded torch samples (>20 min on a contended
    # single core); later runs reuse the durably-mirrored dump in seconds.
    out = run_diff("noise_diff.py", timeout=3000)
    assert "ALL SCHEMES MATCH" in out


@needs_reference
def test_eval_differential(agreement_fixtures):
    out = run_diff("eval_diff.py", timeout=2400)
    assert "ALL CASES MATCH" in out


@needs_reference
def test_prediction_scoring_differential(agreement_fixtures):
    out = run_diff("score_preds_diff.py", timeout=600)
    assert "MATCH — format_preds categorisation" in out


@needs_reference
def test_score_level_decode_differential(agreement_fixtures):
    out = run_diff("score_diff.py", timeout=1500)
    assert "SCORES MATCH" in out
