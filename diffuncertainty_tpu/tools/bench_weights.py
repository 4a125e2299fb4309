"""Flat .npz (de)serialization for flax param pytrees.

Used for the benchmark checkpoint assets (``assets/``): a single
git-friendly file instead of an orbax directory tree. Keys are '/'-joined
dict paths; values are the raw arrays.

Storage precision: ``save_params_npz(..., dtype="float16")`` stores float
leaves as float16 (halves the repo cost of each asset; ~6e-4 relative
rounding on weights, quality-neutral at these model/task scales — measured
deltas are recorded next to each asset's quality block). ``load_params_npz``
promotes float16 leaves back to float32, so callers always see float32
params regardless of the storage precision.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def save_params_npz(params, path: str | Path, *, dtype: str | None = None) -> Path:
    """Save a nested-dict param pytree as one .npz file.

    ``dtype``: optional storage dtype for floating-point leaves (e.g.
    ``"float16"``); non-float leaves are stored as-is.
    """
    flat: dict[str, np.ndarray] = {}

    def walk(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, prefix + (str(k),))
        else:
            arr = np.asarray(node)
            if dtype is not None and np.issubdtype(arr.dtype, np.floating):
                arr = arr.astype(dtype)
            flat["/".join(prefix)] = arr

    walk(params, ())
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path, **flat)
    return path


def load_params_npz(path: str | Path) -> dict:
    """Rebuild the nested-dict param pytree from :func:`save_params_npz`.

    float16-stored leaves (repo-size storage precision) are promoted to
    float32 — model params are float32 everywhere in this framework.
    """
    out: dict = {}
    with np.load(path) as data:
        for key in data.files:
            arr = data[key]
            if arr.dtype == np.float16:
                arr = arr.astype(np.float32)
            node = out
            parts = key.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = arr
    return out
