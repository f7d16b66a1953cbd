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

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
sys.path.insert(0, os.path.join(REPO, "exp", "agreement"))
from fixture_store import fixtures_present, resolve_work  # noqa: E402

# resolve_work() reseeds the scratch work dir from the repo-local durable
# mirror (.agreement_fixtures/) if /tmp was wiped since the fixtures were
# built, so these tests stay green across reboots.
WORK = resolve_work()

needs_reference = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not present")
needs_fixtures = pytest.mark.skipif(
    not fixtures_present(WORK),
    reason="agreement fixtures not built (run exp/agreement/run_agreement.py)")


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
@needs_fixtures
def test_noun_dataset_differential():
    out = run_diff("noun_diff.py")
    assert "ALL CASES MATCH" in out


@needs_reference
@needs_fixtures
def test_noise_differential():
    out = run_diff("noise_diff.py")
    assert "ALL SCHEMES MATCH" in out


@needs_reference
@needs_fixtures
def test_eval_differential():
    out = run_diff("eval_diff.py", timeout=2400)
    assert "ALL CASES MATCH" in out


@needs_reference
@needs_fixtures
def test_prediction_scoring_differential():
    out = run_diff("score_preds_diff.py", timeout=600)
    assert "MATCH — format_preds categorisation" in out


@needs_reference
@needs_fixtures
def test_score_level_decode_differential():
    out = run_diff("score_diff.py", timeout=1500)
    assert "SCORES MATCH" in out
