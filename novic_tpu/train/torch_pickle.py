"""Native reader for torch.save checkpoints — no torch dependency.

The reference's checkpoints pickle only builtin + torch tensor/dtype classes
(ref utils.py:484-537 TorchSaveClasses audit), which makes a restricted
unpickler safe and sufficient: tensors reconstruct as numpy arrays straight
from the zip archive's storage records (SURVEY.md hard part (e) — torch-pickle
interop without torch as a hard dependency).

Supports the modern zip format (torch >= 1.6: ``<name>/data.pkl`` +
``<name>/data/<storage_key>``). Falls back to ``torch.load`` for anything it
cannot handle (legacy format, exotic classes) when torch is importable.
"""

from __future__ import annotations

import pickle
import zipfile
from typing import Any

import numpy as np

# torch storage typename → numpy dtype
_STORAGE_DTYPES = {
    "FloatStorage": np.float32,
    "DoubleStorage": np.float64,
    "HalfStorage": np.float16,
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
    "BFloat16Storage": None,  # handled specially (numpy has no bfloat16)
}

_DTYPE_NAMES = {
    "torch.float32": np.float32, "torch.float": np.float32,
    "torch.float64": np.float64, "torch.double": np.float64,
    "torch.float16": np.float16, "torch.half": np.float16,
    "torch.int64": np.int64, "torch.long": np.int64,
    "torch.int32": np.int32, "torch.int": np.int32,
    "torch.int16": np.int16, "torch.short": np.int16,
    "torch.int8": np.int8, "torch.uint8": np.uint8,
    "torch.bool": np.bool_,
}


class _Storage:
    """A lazily-sliced raw storage from the checkpoint archive."""

    def __init__(self, data: bytes, dtype, bf16: bool):
        self.data = data
        self.dtype = dtype
        self.bf16 = bf16


class _TorchDtype:
    def __init__(self, name: str):
        self.name = name  # e.g. 'torch.float32'

    def __repr__(self):
        return self.name


def _rebuild_tensor_v2(storage: _Storage, storage_offset, size, stride,
                       requires_grad=False, backward_hooks=None, metadata=None):
    if storage.bf16:
        # numpy has no bfloat16: widen to float32 by zero-extending the low bits
        u16 = np.frombuffer(storage.data, dtype=np.uint16)
        arr = (u16.astype(np.uint32) << 16).view(np.float32)
        itemsize = 4
    else:
        arr = np.frombuffer(storage.data, dtype=storage.dtype)
        itemsize = arr.dtype.itemsize
    arr = arr[storage_offset:]
    if size:
        arr = np.lib.stride_tricks.as_strided(
            arr, shape=tuple(size), strides=tuple(s * itemsize for s in stride))
    else:
        arr = arr[:1].reshape(())
    return np.ascontiguousarray(arr)


def _rebuild_from_type_v2(func, new_type, args, state):
    return func(*args)


class _Unpickler(pickle.Unpickler):
    """Restricted unpickler: builtins + the torch reconstruction shims."""

    def __init__(self, file, load_storage):
        super().__init__(file)
        self._load_storage = load_storage

    def find_class(self, module: str, name: str):
        if module == "torch._utils" and name == "_rebuild_tensor_v2":
            return _rebuild_tensor_v2
        if module == "torch._utils" and name == "_rebuild_from_type_v2":
            return _rebuild_from_type_v2
        if module == "torch" and name in _STORAGE_DTYPES:
            return ("storage_type", name)
        if module == "torch" and name == "Tensor":
            return ("tensor_type", name)
        if module == "torch.serialization" and name == "_get_layout":
            return lambda *_: None
        if module == "collections" and name == "OrderedDict":
            import collections

            return collections.OrderedDict
        # Only harmless value constructors — NEVER getattr(builtins, name),
        # which would expose eval/exec/__import__ to a crafted checkpoint.
        # Basic containers/scalars arrive via native pickle opcodes and never
        # reach find_class; these are the only builtins a REDUCE can need.
        if module == "builtins" and name in ("complex", "set", "frozenset",
                                             "bytearray", "dict", "list",
                                             "tuple"):
            import builtins

            return getattr(builtins, name)
        if module == "torch" and name.startswith(("float", "int", "uint", "bool",
                                                  "bfloat", "half", "double", "long",
                                                  "short", "char", "byte")):
            return _TorchDtype(f"torch.{name}")
        raise pickle.UnpicklingError(
            f"Refusing to unpickle {module}.{name} (not in the reference's "
            f"TorchSaveClasses audit, ref utils.py:484-537)")

    def persistent_load(self, pid):
        # pid = ('storage', storage_type, key, location, numel)
        kind, storage_type, key, _location, _numel = pid
        assert kind == "storage", f"Unknown persistent id kind: {kind}"
        name = storage_type[1] if isinstance(storage_type, tuple) else storage_type
        data = self._load_storage(str(key))
        bf16 = name == "BFloat16Storage"
        return _Storage(data, _STORAGE_DTYPES.get(name, np.uint8), bf16)


def load_torch_pickle(path: str) -> Any:
    """Load a torch.save zip checkpoint with numpy tensors — no torch import."""
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        pkl_name = next(n for n in names if n.endswith("/data.pkl"))
        prefix = pkl_name[: -len("data.pkl")]

        def load_storage(key: str) -> bytes:
            return zf.read(f"{prefix}data/{key}")

        with zf.open(pkl_name) as f:
            return _Unpickler(f, load_storage).load()
