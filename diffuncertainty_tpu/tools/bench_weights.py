"""Flat .npz (de)serialization for flax param pytrees.

Used for the benchmark checkpoint asset (``assets/``): a single
git-friendly file instead of an orbax directory tree. Keys are '/'-joined
dict paths; values are the raw arrays.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def save_params_npz(params, path: str | Path) -> Path:
    """Save a nested-dict param pytree as one .npz file."""
    flat: dict[str, np.ndarray] = {}

    def walk(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, prefix + (str(k),))
        else:
            flat["/".join(prefix)] = np.asarray(node)

    walk(params, ())
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path, **flat)
    return path


def load_params_npz(path: str | Path) -> dict:
    """Rebuild the nested-dict param pytree from :func:`save_params_npz`."""
    out: dict = {}
    with np.load(path) as data:
        for key in data.files:
            node = out
            parts = key.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = data[key]
    return out
