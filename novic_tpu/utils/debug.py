"""Debugging utilities (parity with reference utils.py NaN hooks :201-233 and
tensor-stats show :276-291, reworked for JAX).

The reference registers forward/backward NaN-check hooks on torch modules; in
JAX the equivalents are (a) `jax.config.update("jax_debug_nans", True)` for
trap-on-NaN, (b) `checkify`-style explicit checks, and (c) these helpers for
pytree-level inspection from host code.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from novic_tpu.utils.logger import log


def enable_nan_debugging():
    """Trap on the first NaN produced by any jitted computation."""
    import jax

    jax.config.update("jax_debug_nans", True)
    log.info("jax_debug_nans enabled: computations will error on the first NaN")


def check_finite(tree: Any, name: str = "tree", raise_error: bool = True) -> bool:
    """Host-side finite check over a pytree (call on fetched values)."""
    import jax

    bad = []
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        arr = np.asarray(leaf)
        if np.issubdtype(arr.dtype, np.floating) and not np.isfinite(arr).all():
            n_bad = int((~np.isfinite(arr)).sum())
            bad.append((jax.tree_util.keystr(path), n_bad, arr.size))
    if bad:
        detail = ", ".join(f"{p}: {n}/{t} non-finite" for p, n, t in bad)
        if raise_error:
            raise FloatingPointError(f"Non-finite values in {name}: {detail}")
        log.warning(f"Non-finite values in {name}: {detail}")
        return False
    return True


def show(array: Any, prefix: str = "") -> str:
    """Tensor statistics line (ref utils.py:276-291)."""
    arr = np.asarray(array)
    if np.issubdtype(arr.dtype, np.floating):
        stats = (f"mean {arr.mean():.4g} std {arr.std():.4g} "
                 f"min {arr.min():.4g} max {arr.max():.4g} "
                 f"norm {np.linalg.norm(arr):.4g}")
    else:
        stats = f"min {arr.min()} max {arr.max()}"
    line = f"{prefix + ': ' if prefix else ''}{arr.shape} {arr.dtype} {stats}"
    log.info(line)
    return line
