"""Fused sliding-window inference for full-resolution frames.

The reference sidesteps large GTA/Cityscapes frames with offline downscaled
variants (``datasets/gta_cityscapes``, small/xsmall); the analogous TPU-native
capability (BASELINE "sliding-window stitching") is on-device tiled
inference: static window grid -> one batched model call over all tiles ->
weighted scatter-add stitching, all inside jit.

Blending uses a separable triangular (tent) weight per window so overlapping
predictions cross-fade; weights are renormalized exactly, so a constant
field stitches to itself bit-exactly.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def _window_offsets(size: int, window: int, stride: int) -> list[int]:
    if window >= size:
        return [0]
    offs = list(range(0, size - window + 1, stride))
    if offs[-1] != size - window:
        offs.append(size - window)
    return offs


def _tent(window: int) -> np.ndarray:
    ramp = np.minimum(np.arange(1, window + 1), np.arange(window, 0, -1)).astype(np.float64)
    return ramp / ramp.max()


def sliding_window_predict(
    apply_fn: Callable[[jnp.ndarray], jnp.ndarray],
    images: jnp.ndarray,
    *,
    window: int,
    stride: int | None = None,
    out_channels: int | None = None,
    mesh=None,
) -> jnp.ndarray:
    """Tile (B, H, W, C) into windows, predict, and stitch to (B, H, W, C_out).

    ``apply_fn`` maps (N, window, window, C) -> (N, window, window, C_out)
    and is called once on the full tile stack (vmap/batching inside belongs
    to the caller's jitted function).

    ``mesh``: optional ``jax.sharding.Mesh`` with a "data" axis — the tile
    stack (the natural SPMD axis of full-frame inference: 105 tiles per
    512x1024 frame) is sharded over it, so one frame's windows run on all
    chips in parallel and XLA all-gathers the per-tile predictions for the
    stitch. The stack is zero-padded to a multiple of the axis size (padding
    tiles are dropped before stitching), keeping any tile count valid.
    """
    b, h, w, _ = images.shape
    stride = stride or window // 2
    ys = _window_offsets(h, window, stride)
    xs = _window_offsets(w, window, stride)

    tiles = []
    for y in ys:
        for x in xs:
            tiles.append(jax.lax.dynamic_slice(
                images, (0, y, x, 0), (b, window, window, images.shape[-1])
            ))
    tile_stack = jnp.concatenate(tiles, axis=0)  # (n_tiles*B, win, win, C)
    if mesh is not None:
        from ..parallel.mesh import batch_sharding

        n = tile_stack.shape[0]
        pad = (-n) % mesh.shape["data"]
        if pad:
            tile_stack = jnp.concatenate(
                [tile_stack,
                 jnp.zeros((pad,) + tile_stack.shape[1:], tile_stack.dtype)])
        tile_stack = jax.lax.with_sharding_constraint(
            tile_stack, batch_sharding(mesh, tile_stack.ndim))
        preds = apply_fn(tile_stack)
        if pad:
            preds = preds[:n]
    else:
        preds = apply_fn(tile_stack)
    c_out = preds.shape[-1]

    weight_2d = jnp.asarray(np.outer(_tent(window), _tent(window)), preds.dtype)
    acc = jnp.zeros((b, h, w, c_out), preds.dtype)
    norm = jnp.zeros((b, h, w, 1), preds.dtype)
    idx = 0
    for y in ys:
        for x in xs:
            tile_pred = preds[idx * b : (idx + 1) * b] * weight_2d[None, :, :, None]
            acc = jax.lax.dynamic_update_slice(
                acc,
                jax.lax.dynamic_slice(acc, (0, y, x, 0), (b, window, window, c_out))
                + tile_pred,
                (0, y, x, 0),
            )
            norm = jax.lax.dynamic_update_slice(
                norm,
                jax.lax.dynamic_slice(norm, (0, y, x, 0), (b, window, window, 1))
                + weight_2d[None, :, :, None],
                (0, y, x, 0),
            )
            idx += 1
    return acc / jnp.maximum(norm, 1e-8)
