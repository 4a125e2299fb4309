"""Test-time augmentation, fully on device and invertible by construction.

The reference's TTA backend (``test_2D.py:76-288``) replays albumentations
transforms per image on CPU and inverts them with cv2 warps — whitelisted to
{HorizontalFlip, Rotate, RandomScale, Affine}. The TPU redesign samples the
geometric parameters itself (same distributions as the training pipeline:
flip p, rotation limit, scale limit — ``configs/data/lidc64.yaml:33-60``),
composes them into ONE affine matrix per image, warps input with the forward
map (constant-0 border like training) and predictions with the exact inverse
(BORDER_REPLICATE bilinear like the reference inversion), then renormalizes
the class simplex (``test_2D.py:188-194``).

Two warp backends (``TTAConfig.separable_warp``): the default two-pass
separable warp (``ops/warp.py::warp_affine_separable`` — matmul scale +
row-slice-gather translate per axis, the TPU-fast path; double interpolation
like the reference's sequential cv2 warps), or the single composed-resample
gather warp (one interpolation, exact oracle parity with scipy, but
descriptor-bound on TPU).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.warp import (
    compose_affine,
    hflip_matrix,
    invert_affine,
    rotation_matrix,
    separable_margins,
    warp_affine,
    warp_affine_separable,
)


@dataclasses.dataclass(frozen=True)
class TTAConfig:
    hflip_p: float = 0.5
    rotation_limit: float = 22.5  # degrees, uniform in [-limit, limit]
    scale_limit: tuple[float, float] = (-0.2, 0.2)  # factor = 1 + U[lo, hi]
    augment_mult: float = 1.0  # scales the magnitude knobs (augment_mult)
    separable_warp: bool = True  # two-pass MXU warp (ops/warp.py); False ->
    # the single composed-resample gather warp (exact but descriptor-bound)

    @property
    def effective(self) -> "TTAConfig":
        m = self.augment_mult
        if m == 1.0:
            return self
        return TTAConfig(
            hflip_p=min(1.0, self.hflip_p * m),
            rotation_limit=self.rotation_limit * m,
            scale_limit=(self.scale_limit[0] * m, self.scale_limit[1] * m),
            augment_mult=1.0,
            separable_warp=self.separable_warp,
        )


class TTAParams(NamedTuple):
    forward: jnp.ndarray  # (B, 2, 3) src->dst forward affine
    inverse: jnp.ndarray  # (B, 2, 3) forward of the inverse == dst->src of fwd
    separable: bool = False  # static: route warps through the two-pass kernel
    margin_x: int = 0  # static per-pass translation bounds for the separable
    margin_y: int = 0  # warp, computed from the (static) TTAConfig limits


def sample_tta_params(
    cfg: TTAConfig, rng: jax.Array, batch: int, height: int, width: int
) -> TTAParams:
    eff = cfg.effective
    k_flip, k_rot, k_scale = jax.random.split(rng, 3)
    flip = jax.random.bernoulli(k_flip, eff.hflip_p, (batch,))
    angle = jax.random.uniform(
        k_rot, (batch,), minval=-eff.rotation_limit, maxval=eff.rotation_limit
    )
    lo, hi = eff.scale_limit
    scale = 1.0 + jax.random.uniform(k_scale, (batch,), minval=lo, maxval=hi)

    center = ((width - 1) / 2.0, (height - 1) / 2.0)
    rot = rotation_matrix(angle, scale, center)  # (B,2,3) rotate+scale about center
    flip_m = jnp.broadcast_to(hflip_matrix(width), (batch, 2, 3))
    ident = jnp.broadcast_to(jnp.asarray([[1.0, 0, 0], [0, 1.0, 0]]), (batch, 2, 3))
    maybe_flip = jnp.where(flip[:, None, None], flip_m, ident)
    forward = compose_affine(rot, maybe_flip)  # flip first, then rotate/scale
    if eff.separable_warp:
        m_x, m_y = separable_margins(
            float(eff.rotation_limit), 1.0 + float(lo), 1.0 + float(hi),
            eff.hflip_p > 0.0, height, width,
        )
    else:
        m_x = m_y = 0
    return TTAParams(
        forward=forward, inverse=invert_affine(forward),
        separable=eff.separable_warp, margin_x=m_x, margin_y=m_y,
    )


def apply_tta(images: jnp.ndarray, params: TTAParams) -> jnp.ndarray:
    """Warp the input batch by the forward transform (training-style border)."""
    # warp_affine wants dst->src; forward transform's dst->src is its inverse
    if params.separable:
        return warp_affine_separable(
            images, params.inverse, border_mode="constant",
            margin_x=params.margin_x, margin_y=params.margin_y,
        )
    return warp_affine(
        images, params.inverse, interpolation="bilinear",
        border_mode="constant", border_value=0.0,
    )


def invert_tta(probs: jnp.ndarray, params: TTAParams, eps: float = 1e-12) -> jnp.ndarray:
    """Warp predictions back and renormalize the class simplex."""
    if params.separable:
        restored = warp_affine_separable(
            probs, params.forward, border_mode="replicate",
            margin_x=params.margin_x, margin_y=params.margin_y,
        )
    else:
        restored = warp_affine(
            probs, params.forward, interpolation="bilinear", border_mode="replicate"
        )
    normalizer = jnp.sum(restored, axis=-1, keepdims=True)
    safe = jnp.clip(normalizer, min=eps)
    return jnp.where(normalizer > eps, restored / safe, restored)
