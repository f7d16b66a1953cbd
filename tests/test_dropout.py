"""FastDropout impl plumbing + ops/dropout kernel gating.

The Pallas hardware-PRNG kernel itself is TPU-only (no CPU lowering for
`pltpu.prng_seed`), so these tests pin the CPU-visible contract: impl
selection, the threefry mask statistics, and the shape gate. The on-chip
A/B measurement lives in BENCH_NOTES.md ("Pallas dropout: measured negative
result") — 'auto' must resolve to threefry.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from novic_tpu.models.layers import FastDropout
from novic_tpu.ops.dropout import supports_shape


def _apply(impl, rate=0.25, shape=(64, 512), deterministic=False):
    mod = FastDropout(rate=rate, impl=impl)
    x = jnp.ones(shape, jnp.float32)
    return np.asarray(mod.apply({}, x, deterministic=deterministic,
                                rngs={"dropout": jax.random.PRNGKey(0)}))


def test_supports_shape():
    assert supports_shape(8 * 128)
    assert supports_shape(1024 * 512)
    assert not supports_shape(8 * 128 + 1)
    assert not supports_shape(100)


@pytest.mark.parametrize("impl", ["auto", "threefry"])
def test_threefry_mask_statistics(impl):
    rate = 0.25
    y = _apply(impl, rate=rate)
    keep = y != 0
    # Kept elements are rescaled by 1/keep_prob; dropped are exactly 0.
    np.testing.assert_allclose(y[keep], 1.0 / (1.0 - rate), rtol=1e-6)
    assert abs(keep.mean() - (1.0 - rate)) < 0.02
    # Mean preservation (unbiased estimator).
    assert abs(y.mean() - 1.0) < 0.05


def test_auto_equals_threefry():
    # On every backend, 'auto' is the threefry path (the pallas kernel is an
    # explicit opt-in — measured slower end-to-end, BENCH_NOTES.md).
    np.testing.assert_array_equal(_apply("auto"), _apply("threefry"))


def test_deterministic_passthrough_and_zero_rate():
    y = _apply("auto", deterministic=True)
    np.testing.assert_array_equal(y, 1.0)
    y = _apply("auto", rate=0.0)
    np.testing.assert_array_equal(y, 1.0)


def test_unknown_impl_raises():
    with pytest.raises(ValueError, match="dropout impl"):
        _apply("cuda")


# The kernel's on-chip correctness check (keep fraction, mean preservation,
# fwd/bwd mask identity, determinism, seed sensitivity) is a TPU-only run:
# exp/dropout_kernel_check.py. It cannot run on the CPU test mesh (no
# lowering for pltpu.prng_seed) and pytest.skip would break the suite's
# zero-skip invariant, so it lives in exp/ with the other on-chip harnesses.
