"""2x spatial up/down-sampling matching torch interpolation semantics.

Reference: ``uncertainty_modeling/models/diff_unet2D_module.py:868-939``.
``Upsample`` uses ``F.interpolate(scale_factor=2)`` with mode ``nearest`` (old
skip scheme) or ``bilinear`` with the torch default ``align_corners=False``
(new scheme); ``Downsample`` without conv uses ``AvgPool2d(2)``.

Layout is NHWC. For integer 2x factors, torch ``nearest`` duplicates each
pixel, and ``bilinear(align_corners=False)`` uses half-pixel-center sampling —
both reproduced here with explicit gathers/weights rather than
``jax.image.resize`` so the semantics are locked down.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def upsample2x(x: jnp.ndarray, method: str = "nearest") -> jnp.ndarray:
    """Upsample ``(B, H, W, C)`` by 2x."""
    if method == "nearest":
        x = jnp.repeat(x, 2, axis=1)
        x = jnp.repeat(x, 2, axis=2)
        return x
    if method == "bilinear":
        return _upsample2x_bilinear(x)
    raise NotImplementedError(method)


def _upsample2x_bilinear(x: jnp.ndarray) -> jnp.ndarray:
    """Exact torch bilinear x2, align_corners=False.

    Output pixel o samples input coordinate (o + 0.5)/2 - 0.5, clamped to the
    edge. For scale 2 this means output 2i mixes input (i-1, i) with weights
    (0.25, 0.75) and output 2i+1 mixes (i, i+1) with (0.75, 0.25), with edge
    clamping. Implemented as a separable pad+weighted-sum, which XLA fuses into
    a couple of cheap VPU passes.
    """

    def axis_up(a: jnp.ndarray, axis: int) -> jnp.ndarray:
        # pad with edge values: neighbors at -1 and n
        pad_width = [(0, 0)] * a.ndim
        pad_width[axis] = (1, 1)
        ap = jnp.pad(a, pad_width, mode="edge")
        n = a.shape[axis]
        prev = lax.slice_in_dim(ap, 0, n, axis=axis)  # a[i-1]
        cur = lax.slice_in_dim(ap, 1, n + 1, axis=axis)  # a[i]
        nxt = lax.slice_in_dim(ap, 2, n + 2, axis=axis)  # a[i+1]
        even = 0.25 * prev + 0.75 * cur
        odd = 0.75 * cur + 0.25 * nxt
        # interleave even/odd along axis
        stacked = jnp.stack([even, odd], axis=axis + 1)
        new_shape = list(a.shape)
        new_shape[axis] = 2 * n
        return stacked.reshape(new_shape)

    x = axis_up(x, 1)
    x = axis_up(x, 2)
    return x


def downsample_avgpool2x(x: jnp.ndarray) -> jnp.ndarray:
    """AvgPool2d(kernel=2, stride=2) on ``(B, H, W, C)``."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.mean(axis=(2, 4))
