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

import functools

import jax
import jax.numpy as jnp
import numpy as np


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


@functools.lru_cache(maxsize=None)
def separable_margins(
    rotation_limit: float, smin: float, smax: float, flip_possible: bool,
    height: int, width: int,
) -> tuple[int, int]:
    """Static bounds on the separable warp's per-pass translation (pixels).

    For the flip/rotate/scale transform family (the training-augment and TTA
    geometric pipelines): enumerates an angle grid x scale extremes x flip,
    forward and inverse maps, with host numpy; offsets are affine in the row
    index so corners suffice per matrix. 5% headroom + 2 px guard. Cached —
    call with static (config) floats.
    """
    angles = np.linspace(-rotation_limit, rotation_limit, 65)
    scales = np.linspace(max(smin, 1e-3), smax, 9)
    cx, cy = (width - 1) / 2.0, (height - 1) / 2.0
    flips = (False, True) if flip_possible else (False,)
    e_x = e_y = 1.0
    for ang in angles:
        a = np.deg2rad(ang)
        for sc in scales:
            alpha, beta = sc * np.cos(a), sc * np.sin(a)
            rot = np.array(
                [[alpha, beta, (1 - alpha) * cx - beta * cy],
                 [-beta, alpha, beta * cx + (1 - alpha) * cy],
                 [0.0, 0.0, 1.0]]
            )
            for flip in flips:
                fm = np.array([[-1.0, 0.0, width - 1.0], [0.0, 1.0, 0.0], [0, 0, 1.0]])
                fwd = rot @ fm if flip else rot
                for m in (fwd, np.linalg.inv(fwd)):
                    (m00, m01, m02), (m10, m11, m12) = m[0], m[1]
                    # the warp centers the per-image offset inside the
                    # interpolation matrix; only the per-row residual
                    # slope*(row - center)/scale hits the gather margin
                    s_a = m00 - m01 * m10 / m11
                    e_x = max(e_x, abs(m01 / m11) * (height - 1) / 2 / abs(s_a))
                    e_y = max(e_y, abs(m10 / m11) * (width - 1) / 2)
    return int(np.ceil(e_x * 1.05)) + 2, int(np.ceil(e_y * 1.05)) + 2


def warp_affine_separable(
    images: jnp.ndarray,
    dst_to_src: jnp.ndarray,
    *,
    interpolation: str = "bilinear",
    border_mode: str = "replicate",
    border_value: float = 0.0,
    margin_x: int | None = None,
    margin_y: int | None = None,
) -> jnp.ndarray:
    """Two-pass (separable) bilinear affine warp of (B, H, W, C) images.

    TPU-fast alternative to :func:`warp_affine`: instead of one gather with a
    (2,2,C)-patch payload per output pixel (4.2M descriptors for a 256x128^2
    stack, descriptor-bound at C=2/3 minor-axis payloads — 23% of the round-1
    inference profile), the warp is decomposed Catmull/Smith-style into an
    X pass then a Y pass. Each 1-D pass splits into

    - a per-image *scale* resample expressed as a small batched matmul with a
      bilinear interpolation matrix (rides the MXU), widened by a static
      ``margin`` so every translated sample point stays in range, and
    - a per-row *fractional translation*: one contiguous row-slice gather
      (descriptors per row, full-lane payloads) plus a two-tap lerp.

    Derivation: with dst->src map ``[[m00,m01,m02],[m10,m11,m12]]`` (xy
    convention, as cv2), ``out[v,u] = in(m10*u + m11*v + m12, m00*u + m01*v
    + m02)`` factors as an X pass ``tmp[y,u] = in(y, sA*u + cA(y))`` with
    ``sA = m00 - m01*m10/m11``, ``cA(y) = (m01/m11)*y + m02 - m01*m12/m11``
    followed by a Y pass ``out[v,u] = tmp(m11*v + m10*u + m12, u)``.
    Requires ``|m11| > 0`` (rotations away from 90°; always true for TTA).

    Semantics vs :func:`warp_affine`:
    - each pass interpolates bilinearly, so the result is a *double*
      interpolation — matching the reference's sequential cv2 warps
      (``test_2D.py:174-288`` replays one warp per recorded transform) rather
      than the single composed resample; exact when either pass is
      integer-aligned (identity, flips, integer shifts).
    - ``constant`` border (only ``border_value=0.0`` supported): out-of-range
      taps contribute exact zero weight in each pass, reproducing
      zero-padding semantics exactly.
    - ``replicate``: source coordinates are clamped per pass, which is the
      same separable clamping the single-pass warp applies to sx/sy.

    ``margin_x/y`` bound ``|cA/sA|`` / ``|cB/sB|`` (the per-row translation
    in pixels). They must be static ints; defaults of W and H are always
    safe for warps that keep the image in frame. :func:`separable_margins`
    computes tight bounds from a static flip/rotate/scale config.

    ``interpolation="nearest"``: each pass *selects* (0/1 interpolation
    matrix + rounded translation tap), so values are preserved exactly —
    safe for integer label masks. Differs from the composed-map nearest of
    :func:`warp_affine` only where the x source coordinate, evaluated at the
    rounded (instead of exact) y row, crosses a .5 boundary — a <= |m01/m11|/2
    px perturbation that can flip the choice between two adjacent pixels.
    """
    b, h, w, c = images.shape
    if interpolation not in ("bilinear", "nearest"):
        raise NotImplementedError(interpolation)
    nearest = interpolation == "nearest"
    if border_mode == "constant" and border_value != 0.0:
        raise NotImplementedError("separable constant border supports value 0 only")
    if border_mode not in ("constant", "replicate"):
        raise NotImplementedError(border_mode)
    replicate = border_mode == "replicate"
    orig_dtype = images.dtype

    m = dst_to_src.astype(jnp.float32)
    m00, m01, m02 = m[:, 0, 0], m[:, 0, 1], m[:, 0, 2]
    m10, m11, m12 = m[:, 1, 0], m[:, 1, 1], m[:, 1, 2]
    s_a = m00 - m01 * m10 / m11
    off0_a = m02 - m01 * m12 / m11
    slope_a = m01 / m11
    s_b = m11
    off0_b = m12
    slope_b = m10

    e_x = int(margin_x) if margin_x is not None else w
    e_y = int(margin_y) if margin_y is not None else h

    x = jnp.transpose(images.astype(jnp.float32), (0, 3, 1, 2))  # (B,C,H,W)
    # X pass: rows are (c, y); per-row offset varies with y
    rows = x.reshape(b, c * h, w)
    rows = _resample_rows_1d(rows, s_a, off0_a, slope_a, n_rep=c, n_rows=h,
                             margin=e_x, replicate=replicate, l_out=w,
                             nearest=nearest)
    # Y pass on the transposed tensor: rows are (c, u); offsets vary with u
    xt = jnp.transpose(rows.reshape(b, c, h, w), (0, 1, 3, 2))  # (B,C,W,H)
    rows = xt.reshape(b, c * w, h)
    rows = _resample_rows_1d(rows, s_b, off0_b, slope_b, n_rep=c, n_rows=w,
                             margin=e_y, replicate=replicate, l_out=h,
                             nearest=nearest)
    out = jnp.transpose(rows.reshape(b, c, w, h), (0, 3, 2, 1))  # (B,H,W,C)
    if not replicate and nearest:
        # nearest selection already yields exact 0 outside the frame (the 0/1
        # interpolation matrix has all-zero columns for out-of-range rounded
        # coords); no bleed to mask
        return out.astype(orig_dtype)
    if not replicate:
        # Exact far-outside zeroing (same rule as warp_affine): the scaled
        # translate taps are spaced |s| apart, which would otherwise bleed
        # edge values up to 1 px past the frame.
        gy, gx = jnp.meshgrid(
            jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32),
            indexing="ij",
        )
        sx = m00[:, None, None] * gx + m01[:, None, None] * gy + m02[:, None, None]
        sy = m10[:, None, None] * gx + m11[:, None, None] * gy + m12[:, None, None]
        x0 = jnp.floor(sx)
        y0 = jnp.floor(sy)
        far = (x0 < -1) | (x0 >= w) | (y0 < -1) | (y0 >= h)
        out = jnp.where(far[..., None], 0.0, out)
    return out.astype(orig_dtype)


def _resample_rows_1d(
    rows: jnp.ndarray,
    scale: jnp.ndarray,
    off0: jnp.ndarray,
    off_slope: jnp.ndarray,
    *,
    n_rep: int,
    n_rows: int,
    margin: int,
    replicate: bool,
    l_out: int,
    nearest: bool = False,
) -> jnp.ndarray:
    """Per-row 1-D affine resample: out[b,r,u] = rows[b,r](scale_b*u + off_b(row)).

    rows (B, n_rep*n_rows, L_in) with row index r = rep*n_rows + row;
    off_b(row) = off0_b + off_slope_b*row. Scale first (interpolation-matrix
    matmul over a margin-widened output), then per-row fractional translation
    by off/scale (contiguous slice gather + 2-tap lerp). ``nearest`` swaps
    the bilinear weights for 0/1 selection (round-half-up, cv2 semantics) and
    rounds the translation tap — pure value selection, label-safe.
    """
    b, r, l_in = rows.shape
    e = margin
    mid = l_out + 2 * e
    # Absorb the per-image center-row offset into the interpolation matrix
    # (it is traced per-image anyway), so the per-row gather shift carries
    # only the residual off_slope*(row - center)/scale — this keeps the
    # static margin small even for flips, whose offsets are ~W.
    off_mid = off0 + off_slope * ((n_rows - 1) / 2.0)  # (B,)
    j = jnp.arange(mid, dtype=jnp.float32)
    coord = scale[:, None] * (j[None] - e) + off_mid[:, None]  # (B, mid)
    if replicate:
        coord = jnp.clip(coord, 0.0, l_in - 1.0)
    wk = jnp.arange(l_in, dtype=jnp.float32)

    row_idx = jnp.arange(n_rows, dtype=jnp.float32)
    residual = off_slope[:, None] * (row_idx[None] - (n_rows - 1) / 2.0)
    shift = residual / scale[:, None]  # (B, n_rows)
    shift = jnp.broadcast_to(shift[:, None, :], (b, n_rep, n_rows)).reshape(b, r)

    if nearest:
        # Selection at the scale stage: sc[j] holds pixel round(coord(j)).
        # The translation stage then picks, per output lane u, between taps
        # u+k and u+k+1 (sources scale*(u+k)+off_mid and one |scale| further).
        # The *true* nearest pixel index round(scale*(u+shift)+off_mid) is
        # computable elementwise, so compare it against tap0's pixel index
        # and advance to tap1 iff tap0 is not it — exact whenever |scale|<=1
        # (consecutive taps then cover every integer index); for |scale|>1
        # (downscale) a skipped index can be off by one pixel, the same
        # resampling-grid approximation the bilinear path makes.
        k = jnp.floor(shift)
        rc = jnp.floor(coord + 0.5)
        kmat = (rc[:, None, :] == wk[None, :, None]).astype(rows.dtype)
        sc = jnp.einsum("brw,bwj->brj", rows, kmat)  # (B, R, mid)
        starts = jnp.clip(k.astype(jnp.int32) + e, 0, 2 * e)
        shifted = _barrel_shift_rows(sc, starts, 2 * e)

        u = jnp.arange(l_out, dtype=jnp.float32)
        scale_r = jnp.broadcast_to(scale[:, None], (b, r))[..., None]
        off_r = jnp.broadcast_to(off_mid[:, None], (b, r))[..., None]
        src_tap0 = scale_r * (u[None, None] + k[..., None]) + off_r
        src_true = scale_r * (u[None, None] + shift[..., None]) + off_r
        if replicate:
            src_tap0 = jnp.clip(src_tap0, 0.0, l_in - 1.0)
            src_true = jnp.clip(src_true, 0.0, l_in - 1.0)
        take_next = jnp.floor(src_true + 0.5) != jnp.floor(src_tap0 + 0.5)
        return jnp.where(take_next, shifted[..., 1 : l_out + 1],
                         shifted[..., :l_out])

    # (B, L_in, mid) bilinear weights; out-of-range coords get all-zero columns
    kmat = jnp.maximum(0.0, 1.0 - jnp.abs(coord[:, None, :] - wk[None, :, None]))
    sc = jnp.einsum("brw,bwj->brj", rows, kmat)  # (B, R, mid)

    k = jnp.floor(shift)
    frac = (shift - k)[..., None]
    starts = jnp.clip(k.astype(jnp.int32) + e, 0, 2 * e)  # (B, R), >=0 by margin
    shifted = _barrel_shift_rows(sc, starts, 2 * e)
    return (1.0 - frac) * shifted[..., :l_out] + frac * shifted[..., 1 : l_out + 1]


def _barrel_shift_rows(x: jnp.ndarray, s: jnp.ndarray, max_s: int) -> jnp.ndarray:
    """Per-row left shift: out[..., j] = x[..., j + s] for j < M - s.

    x (B, R, M), s (B, R) int32 in [0, max_s]. TPU gathers with per-row
    dynamic minor-axis starts legalize to sequential dynamic-slice loops
    (measured ~0.2 GB/s); a barrel shifter — ceil(log2(max_s+1)) rounds of
    static roll + elementwise select — keeps the whole translate on the VPU
    with ~2 log(E) streaming passes instead. Wrapped-around lanes only land
    at j > M-1-s, beyond what callers read (margin guarantee).
    """
    import numpy as np

    nbits = max(1, int(np.ceil(np.log2(max_s + 1)))) if max_s > 0 else 0
    for p in range(nbits):
        rolled = jnp.roll(x, -(1 << p), axis=-1)
        bit = ((s >> p) & 1).astype(bool)[..., None]
        x = jnp.where(bit, rolled, x)
    return x


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
