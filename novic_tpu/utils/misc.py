"""Miscellaneous utilities (capability parity with reference utils.py).

Covers: dict flatten/unflatten (utils.py:356-383), AttrDict (:385-402),
list-compact JSON dump (:405-431), canonical noun forms (:323-331),
strict dataclass-from-dict (:334-344), semifix float formatting (:303-305),
a/an indefinite-article regexes (noun_dataset.py:952-968), and a
DelayKeyboardInterrupt guard (utils.py:461-481).
"""

from __future__ import annotations

import dataclasses
import json
import re
import signal
import time
import typing
import unicodedata
from typing import IO, Any

from novic_tpu.utils.logger import log

# ---------------------------------------------------------------------------
# Dict utilities
# ---------------------------------------------------------------------------


def flatten_dict(D: dict, parent_key: str | None = None) -> dict:
    """Flatten a nested string-keyed dict by dot-joining keys (ref utils.py:356-365)."""
    F = {}
    for k, v in D.items():
        assert "." not in k, f"Key may not contain a dot: {k}"
        new_key = f"{parent_key}.{k}" if parent_key else k
        if isinstance(v, dict):
            F.update(flatten_dict(v, parent_key=new_key))
        else:
            F[new_key] = v
    return F


def unflatten_dict(F: dict) -> dict:
    """Invert flatten_dict (ref utils.py:367-383)."""
    D: dict = {}
    for c, v in F.items():
        parts = c.split(".")
        cursor = D
        for part in parts[:-1]:
            if part not in cursor:
                cursor[part] = {}
            cursor = cursor[part]
            if not isinstance(cursor, dict):
                raise ValueError(f"Nesting conflict at '{part}' while inserting '{c}'")
        leaf = parts[-1]
        if leaf in cursor:
            raise ValueError(f"Nesting conflict at '{leaf}' while inserting '{c}'")
        cursor[leaf] = v
    return D


class AttrDict(dict):
    """Dict with attribute access (ref utils.py:385-402)."""

    @classmethod
    def from_dict(cls, D: dict) -> "AttrDict":
        return cls({k: cls.from_dict(v) if isinstance(v, dict) else v for k, v in D.items()})

    def to_dict(self) -> dict:
        return {k: v.to_dict() if isinstance(v, AttrDict) else v for k, v in self.items()}

    def __getattr__(self, key: str) -> Any:
        try:
            return self[key]
        except KeyError as e:
            raise AttributeError(key) from e

    def __setattr__(self, key: str, value: Any):
        self[key] = value

    def __delattr__(self, key: str):
        del self[key]


# ---------------------------------------------------------------------------
# JSON with compact lists
# ---------------------------------------------------------------------------


def _json_default(o):
    """Serialize numpy scalars/arrays that leak into result dicts."""
    import numpy as _np

    if isinstance(o, _np.generic):
        return o.item()
    if isinstance(o, _np.ndarray):
        return o.tolist()
    raise TypeError(f"Object of type {type(o).__name__} is not JSON serializable")


def json_dumps(obj: Any, *, indent: int | str | None = None, **kwargs) -> str:
    """Dump JSON without indentation inside lists (ref utils.py:405-427);
    numpy scalars/arrays serialize natively."""
    kwargs.setdefault("default", _json_default)
    lines: list[str] = []
    line_parts: list[str] = []
    open_lists = 0
    for line in json.dumps(obj, indent=indent, **kwargs).splitlines():
        line_content = line.strip()
        if not line_content:
            continue
        if line_content[0] == "]":
            open_lists -= 1
        if line_content[-1] == "[":
            open_lists += 1
        if open_lists > 0:
            part = line_content if line_parts else line
            line_parts.append(part + " " if part[-1] == "," else part)
        elif line_parts:
            line_parts.append(line_content)
            lines.append("".join(line_parts))
            line_parts.clear()
        else:
            lines.append(line)
    assert open_lists == 0
    return "\n".join(lines)


def json_dump(obj: Any, fp: IO[str], *, indent: int | str | None = None, **kwargs):
    fp.write(json_dumps(obj, indent=indent, **kwargs))


# ---------------------------------------------------------------------------
# Canonical noun forms
# ---------------------------------------------------------------------------

ALLOWED_CHARS_CANON = frozenset("abcdefghijklmnopqrstuvwxyz0123456789 ")


def sanitize_ascii(text: str) -> str:
    """Best-effort unicode→ascii transliteration (stand-in for unidecode)."""
    normalized = unicodedata.normalize("NFKD", text)
    return normalized.encode("ascii", "ignore").decode("ascii")


def get_canon(noun: str, sanitize: bool) -> str:
    """Canonical form of a noun for class-name alignment (ref utils.py:323-331)."""
    if sanitize:
        noun = sanitize_ascii(" ".join(noun.split()))
    canon = noun.lower()
    canon = canon.replace("'", "").replace(".", "")
    canon = " ".join(part for part in re.split(r"[\s/-]+", canon) if part)
    if set(canon) - ALLOWED_CHARS_CANON:
        log.warning(f"Canonicalization produced bad chars: {canon}")
    return canon


# ---------------------------------------------------------------------------
# Indefinite articles (a/an), precompiled-regex fast path
# ---------------------------------------------------------------------------

INDEFINITE_REGEXES = (
    (re.compile(r"^[AEFHILMNORSX][B-Z][A-Z]?\b"), "an "),
    (re.compile(r"^([aefhilmnorsx][.-]|hour)", re.IGNORECASE), "an "),
    (re.compile(r"^([a-z][.-]|e[uw]|onc?e\b|uni|u[bcfghjkqrst][aeiou])", re.IGNORECASE), "a "),
    (re.compile(r"^[aeiou]", re.IGNORECASE), "an "),
)


def make_indefinite(noun: str, suffix: str | None = None) -> str:
    """Prefix a noun with a/an (ref noun_dataset.py:952-968); far faster than inflect."""
    for regexen, article in INDEFINITE_REGEXES:
        if regexen.match(noun):
            break
    else:
        article = "a "
    return f"{article}{noun}{suffix}" if suffix is not None else article + noun


# ---------------------------------------------------------------------------
# Dataclass helpers
# ---------------------------------------------------------------------------


def format_semifix(value: float, precision: int) -> str:
    """Fixed-precision float format without trailing zeros (ref utils.py:303-305)."""
    return f"{value:.{precision}f}".rstrip("0").rstrip(".")


def dataclass_from_dict(cls, state: dict[str, Any]):
    """Strictly construct a dataclass from a dict: keys must match fields one-to-one
    (ref utils.py:334-344)."""
    fields = dataclasses.fields(cls)
    field_names = set(field.name for field in fields)
    state_names = set(state.keys())
    if field_names != state_names:
        raise ValueError(
            f"Cannot construct {cls.__qualname__} from dict that does not include exactly all "
            f"the fields as keys => Dict is missing {sorted(field_names - state_names)} and has "
            f"{sorted(state_names - field_names)} extra"
        )
    field_types = typing.get_type_hints(cls)
    for field in fields:
        value = state[field.name]
        expected = field_types[field.name]
        if isinstance(expected, type) and not isinstance(value, expected):
            log.warning(
                f"{cls.__qualname__} field '{field.name}' should be type {expected} "
                f"but got {type(value).__qualname__}: {value}"
            )
    return cls(**state)


# ---------------------------------------------------------------------------
# Signal handling
# ---------------------------------------------------------------------------


class DelayKeyboardInterrupt:
    """Context manager delaying SIGINT until exit (ref utils.py:461-481)."""

    def __enter__(self):
        self._received: tuple | None = None
        self._old_handler = signal.signal(signal.SIGINT, self._handler)
        return self

    def _handler(self, sig, frame):
        self._received = (sig, frame)
        log.warning("Keyboard interrupt received => Delaying until safe")

    def __exit__(self, exc_type, exc_val, exc_tb):
        signal.signal(signal.SIGINT, self._old_handler)
        if self._received is not None:
            old_handler = self._old_handler
            if callable(old_handler):
                old_handler(*self._received)
        return False


def set_determinism(seed: int) -> None:
    """Seed every host-side RNG (ref utils.py:126-147 set_determinism).

    JAX device computation is deterministic by construction (explicit PRNG
    keys, no cudnn-style nondeterministic kernels to disable); what remains
    is the host side: python random (epoch offsets, writer shuffles fall back
    to it) and numpy's legacy global state. Functions taking an explicit
    seed/rng stay unaffected, as in the reference.
    """
    import random as _random

    import numpy as _np

    _random.seed(seed)
    _np.random.seed(seed % (2 ** 32))


def nan_check(tree, name: str = "tree") -> None:
    """Assert every array leaf of a pytree is finite (the reference's NaN
    forward/backward debugging hooks, ref utils.py:201-233, recast for JAX:
    call on params/grads/metrics after materialization; for in-jit tracing
    use jax.config.update('jax_debug_nans', True) instead)."""
    import jax as _jax
    import numpy as _np

    bad = []
    for path, leaf in _jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = _np.asarray(leaf)
        if arr.dtype.kind == "f" and not _np.isfinite(arr).all():
            bad.append(_jax.tree_util.keystr(path))
    if bad:
        raise FloatingPointError(f"Non-finite values in {name}: {bad[:10]}"
                                 + ("..." if len(bad) > 10 else ""))


class ProgressBar:
    """Minimal pause-able progress reporter (ref utils.py:540-572): rate +
    ETA lines through the logger (no tqdm dependency; logs are the UI here).
    pause()/resume() suppress output, e.g. around interleaved prints."""

    def __init__(self, desc: str, total: int, unit: str = "it",
                 log_every: float = 5.0):
        self.desc = desc
        self.total = total
        self.unit = unit
        self.log_every = log_every
        self.n = 0
        self._paused = False
        self._start = time.perf_counter()
        self._last_log = self._start

    def update(self, n: int = 1) -> None:
        self.n += n
        now = time.perf_counter()
        if not self._paused and (now - self._last_log >= self.log_every
                                 or self.n >= self.total):
            rate = self.n / max(now - self._start, 1e-9)
            eta = (self.total - self.n) / max(rate, 1e-9)
            log.info(f"{self.desc}: {self.n}/{self.total} {self.unit} "
                     f"({rate:.1f}/s, ETA {eta:.0f}s)")
            self._last_log = now

    def pause(self) -> None:
        self._paused = True

    def resume(self) -> None:
        self._paused = False
        self._last_log = 0.0  # log on next update

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        if self.n < self.total:
            log.info(f"{self.desc}: stopped at {self.n}/{self.total} {self.unit}")
        return False
