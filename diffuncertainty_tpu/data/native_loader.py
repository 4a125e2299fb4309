"""ctypes bridge to the native npy batch loader (``native/npy_batch_loader.cpp``).

Reads a batch of same-shaped npy files straight into one contiguous numpy
buffer with a C++ thread pool — no per-worker processes, no pickling, no
GIL in the read path (the reference relies on torch DataLoader worker
processes for this). Auto-builds the shared object with ``make`` on first use
when a toolchain is available; callers fall back to numpy when unavailable.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_SO_PATH = _NATIVE_DIR / "libnpy_batch_loader.so"
_lib = None
_tried = False


def _load_lib():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _SO_PATH.exists():
        try:
            subprocess.run(
                ["make", "-s"], cwd=_NATIVE_DIR, check=True, capture_output=True
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_SO_PATH))
        lib.npy_load_batch.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_void_p,
            ctypes.c_longlong, ctypes.c_int, ctypes.c_int,
        ]
        lib.npy_load_batch.restype = ctypes.c_int
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def native_available() -> bool:
    return _load_lib() is not None


def load_batch(
    paths: list[str | Path],
    slot_shape: tuple[int, ...],
    *,
    dtype: str = "float32",  # float32 | int32
    num_threads: int = 8,
    out: np.ndarray | None = None,
) -> np.ndarray:
    """Read ``paths`` into a (N, *slot_shape) array; every file must contain
    exactly ``prod(slot_shape)`` elements (uint8 images are scaled by 1/255
    for float32 slots, matching the dataset loader)."""
    lib = _load_lib()
    n = len(paths)
    np_dtype = np.float32 if dtype == "float32" else np.int32
    if out is None:
        out = np.empty((n, *slot_shape), np_dtype)
    assert out.dtype == np_dtype and out.shape[0] == n and out.flags["C_CONTIGUOUS"]
    slot_elems = int(np.prod(slot_shape))

    if lib is None:
        for i, p in enumerate(paths):
            arr = np.load(p)
            if arr.dtype == np.uint8 and dtype == "float32":
                arr = arr.astype(np.float32) / 255.0
            out[i] = arr.astype(np_dtype).reshape(slot_shape)
        return out

    blob = b"\0".join(str(p).encode() for p in paths) + b"\0"
    rc = lib.npy_load_batch(
        blob, n, out.ctypes.data_as(ctypes.c_void_p), slot_elems,
        0 if dtype == "float32" else 1, num_threads,
    )
    if rc != 0:
        raise IOError(
            f"native npy_load_batch failed on '{paths[rc - 100]}'"
            if rc >= 100 else f"native npy_load_batch error {rc}"
        )
    return out
