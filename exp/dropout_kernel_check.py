"""On-chip correctness check for the Pallas hardware-PRNG dropout kernel.

TPU-only companion to tests/test_dropout.py (the CPU test mesh cannot lower
`pltpu.prng_seed`). Validates: keep fraction, unbiased rescale, backward
regenerating the bit-identical mask, determinism, and seed sensitivity.

Run: python exp/dropout_kernel_check.py   (needs the axon/TPU backend)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from novic_tpu.ops.dropout import hw_dropout

assert jax.default_backend() == "tpu", f"needs TPU, got {jax.default_backend()}"

x = jnp.ones((256, 512), jnp.float32)
rate = 0.1
y = np.asarray(hw_dropout(x, jnp.uint32(42), rate))
keep = y != 0

assert abs(keep.mean() - (1 - rate)) < 0.01, keep.mean()
np.testing.assert_allclose(y[keep], 1.0 / (1 - rate), rtol=1e-6)
assert abs(y.mean() - 1.0) < 0.02, y.mean()

g = np.asarray(jax.grad(lambda x: hw_dropout(x, jnp.uint32(42), rate).sum())(x))
assert np.array_equal(g != 0, keep), "backward mask != forward mask"

y2 = np.asarray(hw_dropout(x, jnp.uint32(42), rate))
assert np.array_equal(y, y2), "not deterministic for a fixed seed"
y3 = np.asarray(hw_dropout(x, jnp.uint32(43), rate))
assert not np.array_equal(y, y3), "mask insensitive to seed"

print(f"OK  keep={keep.mean():.4f} (want {1-rate})  mean={y.mean():.5f}  "
      f"bwd-mask-identity=True  deterministic=True  seed-sensitive=True")
