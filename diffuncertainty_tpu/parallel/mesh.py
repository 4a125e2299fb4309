"""Mesh construction and sharding specs.

The reference is strictly single-GPU (``configs/standard.yaml:50-52``); the
parallel axes it expresses as Python loops become mesh axes here:

- ``data``: batch sharding for training and inference (DP over ICI);
- ``member``: ensemble members / SWAG draws / dropout replicas — the stacked
  parameter pytrees and member-keyed vmaps shard along this axis, so a
  16-member ensemble forward is 16-way parallel across chips instead of the
  reference's sequential CPU<->GPU model hopping (``test_2D.py:711-727``).

With ``jax.jit`` + NamedSharding inputs, XLA inserts the psum/all-gather
collectives; nothing here talks to a communication library directly.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: tuple[int, ...] = None,
    axis_names: tuple[str, ...] = ("data", "member"),
    devices=None,
) -> Mesh:
    """Build a mesh; default uses all devices on the data axis."""
    devices = devices if devices is not None else jax.devices()
    if shape is None:
        shape = (len(devices), 1)
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh shape {shape} needs {n} devices, have {len(devices)}")
    dev_array = np.asarray(devices[:n]).reshape(shape)
    return Mesh(dev_array, axis_names)


def batch_sharding(mesh: Mesh, ndim: int, axis: str = "data") -> NamedSharding:
    """Shard leading (batch) dim over ``axis``, replicate the rest."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def member_sharding(mesh: Mesh, ndim: int, axis: str = "member") -> NamedSharding:
    """Shard leading (member) dim of stacked params over ``axis``."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, axis: str = "data") -> dict:
    """device_put array leaves of a batch dict with batch-dim sharding."""
    out = {}
    for k, v in batch.items():
        if hasattr(v, "ndim") and v.ndim >= 1:
            out[k] = jax.device_put(v, batch_sharding(mesh, v.ndim, axis))
        else:
            out[k] = v
    return out


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, replicated_sharding(mesh))


def shard_member_stack(tree, mesh: Mesh, axis: str = "member"):
    """device_put a stacked-parameter pytree sharded along the member axis."""
    return jax.tree.map(
        lambda p: jax.device_put(p, member_sharding(mesh, p.ndim, axis)), tree
    )
