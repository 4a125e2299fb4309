"""Batched affine warps on device (TTA inversion, train-time augmentation).

The reference does TTA inversion with per-image cv2.warpAffine calls on CPU
(``test_2D.py:174-288``), forcing GPU->CPU round-trips per batch. Here the
warp is an XLA gather + weighted sum over the whole batch, so augment ->
forward -> inverse-warp stays on device inside one jitted program.

Semantics matched to cv2:
- matrices are 2x3 **dst->src** maps (cv2 uses WARP_INVERSE_MAP internally;
  callers compose/invert on the host or with tiny 3x3 device math)
- bilinear: BORDER_REPLICATE == clamping source indices (out-of-range sample
  points collapse onto the edge pixel); BORDER_CONSTANT fills with a value
- nearest: cv2 rounds half up after the affine map
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def invert_affine(m: jnp.ndarray) -> jnp.ndarray:
    """Invert a (..., 2, 3) affine matrix (cv2.invertAffineTransform)."""
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    det = a * e - b * d
    ia = e / det
    ib = -b / det
    id_ = -d / det
    ie = a / det
    ic = -(ia * c + ib * f)
    if_ = -(id_ * c + ie * f)
    row0 = jnp.stack([ia, ib, ic], axis=-1)
    row1 = jnp.stack([id_, ie, if_], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def rotation_matrix(
    angle_deg: jnp.ndarray, scale: jnp.ndarray, center_xy: tuple[float, float]
) -> jnp.ndarray:
    """cv2.getRotationMatrix2D semantics; batched over leading axes -> (..., 2, 3)."""
    angle = jnp.deg2rad(angle_deg)
    alpha = scale * jnp.cos(angle)
    beta = scale * jnp.sin(angle)
    cx, cy = center_xy
    row0 = jnp.stack([alpha, beta, (1 - alpha) * cx - beta * cy], axis=-1)
    row1 = jnp.stack([-beta, alpha, beta * cx + (1 - alpha) * cy], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def hflip_matrix(width: int) -> jnp.ndarray:
    """x -> W-1-x as a 2x3 affine."""
    return jnp.asarray([[-1.0, 0.0, width - 1.0], [0.0, 1.0, 0.0]], jnp.float32)


def compose_affine(m2: jnp.ndarray, m1: jnp.ndarray) -> jnp.ndarray:
    """Compose (..., 2, 3) maps: result(x) = m2(m1(x))."""
    a = jnp.concatenate(
        [m1, jnp.broadcast_to(jnp.asarray([[0.0, 0.0, 1.0]], m1.dtype), m1.shape[:-2] + (1, 3))],
        axis=-2,
    )
    return jnp.einsum("...ij,...jk->...ik", m2, a)


def warp_affine(
    images: jnp.ndarray,
    dst_to_src: jnp.ndarray,
    *,
    interpolation: str = "bilinear",
    border_mode: str = "replicate",
    border_value: float = 0.0,
) -> jnp.ndarray:
    """Warp (B, H, W, C) by per-image (B, 2, 3) dst->src affine matrices."""
    b, h, w, c = images.shape
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")  # (H, W)
    ones = jnp.ones_like(gx)
    dst = jnp.stack([gx, gy, ones], axis=-1)  # (H, W, 3)
    src = jnp.einsum("bij,hwj->bhwi", dst_to_src.astype(jnp.float32), dst)  # (B,H,W,2) xy
    sx, sy = src[..., 0], src[..., 1]

    if interpolation == "nearest":
        ix = jnp.floor(sx + 0.5).astype(jnp.int32)
        iy = jnp.floor(sy + 0.5).astype(jnp.int32)
        inside = (ix >= 0) & (ix <= w - 1) & (iy >= 0) & (iy <= h - 1)
        ixc = jnp.clip(ix, 0, w - 1)
        iyc = jnp.clip(iy, 0, h - 1)
        gathered = _gather2d(images, iyc, ixc)
        if border_mode == "constant":
            gathered = jnp.where(inside[..., None], gathered, border_value)
        return gathered

    if interpolation != "bilinear":
        raise NotImplementedError(interpolation)

    # single (2, 2, C)-patch gather per output pixel: 4x fewer gather
    # descriptors with 4x payload than four per-corner gathers — TPU gather
    # cost is descriptor-bound at these tiny row sizes (profiled ~3.7 GB/s
    # with per-corner take_along_axis). Border semantics come from a 1-pixel
    # pad ring so every in-range-adjacent corner is fetchable in one slice:
    # - replicate: clamp the sample point into the valid square, pad the
    #   right/bottom edge (for the +1 corners) with edge values
    # - constant: pad all sides with border_value (covers corners exactly one
    #   pixel outside); sample points >1px outside have all 4 corners outside
    #   and are masked to border_value afterwards
    if border_mode == "replicate":
        sx_eff = jnp.clip(sx, 0.0, w - 1.0)
        sy_eff = jnp.clip(sy, 0.0, h - 1.0)
        padded = jnp.pad(images, ((0, 0), (0, 1), (0, 1), (0, 0)), mode="edge")
        shift = 0
    elif border_mode == "constant":
        sx_eff, sy_eff = sx, sy
        padded = jnp.pad(
            images, ((0, 0), (1, 1), (1, 1), (0, 0)),
            mode="constant", constant_values=border_value,
        )
        shift = 1
    else:
        raise NotImplementedError(border_mode)

    x0 = jnp.floor(sx_eff)
    y0 = jnp.floor(sy_eff)
    fx = (sx_eff - x0)[..., None]
    fy = (sy_eff - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    patches = _gather_patches2x2(padded, y0i + shift, x0i + shift)  # (B,H,W,2,2,C)
    top = patches[..., 0, 0, :] * (1 - fx) + patches[..., 0, 1, :] * fx
    bot = patches[..., 1, 0, :] * (1 - fx) + patches[..., 1, 1, :] * fx
    out = top * (1 - fy) + bot * fy
    if border_mode == "constant":
        far_outside = (x0i < -1) | (x0i >= w) | (y0i < -1) | (y0i >= h)
        out = jnp.where(far_outside[..., None], border_value, out)
    return out


def _gather2d(images: jnp.ndarray, iy: jnp.ndarray, ix: jnp.ndarray) -> jnp.ndarray:
    """images (B,H,W,C), iy/ix (B,H,W) -> (B,H,W,C)."""
    b, h, w, c = images.shape
    flat = images.reshape(b, h * w, c)
    idx = iy * w + ix  # (B,H,W)
    return jnp.take_along_axis(flat, idx.reshape(b, h * w, 1), axis=1).reshape(b, h, w, c)


def _gather_patches2x2(padded: jnp.ndarray, iy: jnp.ndarray, ix: jnp.ndarray) -> jnp.ndarray:
    """padded (B,H+1,W+1,C), iy/ix (B,Ho,Wo) -> (B,Ho,Wo,2,2,C) patches."""
    b, hp, wp, c = padded.shape
    ho, wo = iy.shape[1], iy.shape[2]
    starts = jnp.stack([iy.reshape(b, -1), ix.reshape(b, -1)], axis=-1)  # (B,N,2)
    out = jax.lax.gather(
        padded,
        starts,
        jax.lax.GatherDimensionNumbers(
            offset_dims=(2, 3, 4),
            collapsed_slice_dims=(),
            start_index_map=(1, 2),
            operand_batching_dims=(0,),
            start_indices_batching_dims=(0,),
        ),
        slice_sizes=(1, 2, 2, c),
        mode=jax.lax.GatherScatterMode.CLIP,
    )  # (B, N, 2, 2, C)
    return out.reshape(b, ho, wo, 2, 2, c)
