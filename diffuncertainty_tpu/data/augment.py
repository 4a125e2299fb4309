"""Jittable, batched train-time augmentation pipeline.

The reference composes albumentations CPU transforms per image
(``configs/data/lidc64.yaml:33-60``: HFlip, Rotate, RandomScale,
PadIfNeeded+CenterCrop, GaussNoise, Normalize). Here the geometric steps are
fused into ONE batched affine warp on device (flip . rotate . center-scale,
constant-0 border like the reference's ``border_mode: 0``), masks warp with
nearest interpolation, noise and normalization are elementwise — the whole
pipeline is a few fused XLA ops per batch instead of per-image Python.

``augment_mult`` scales the magnitude knobs (``apply_mult_keys``:
HFlip.p, Rotate.limit, RandomScale.scale_limit, GaussNoise.var_limit) —
``augment_mult: 0`` disables augmentation, matching
``torch_dataloader.py:92-152``.
"""

from __future__ import annotations

import dataclasses
import re

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


# Geometric transforms this pipeline (and the TTA inversion built on it)
# implements. The reference TTA whitelist additionally carries Affine
# (``test_2D.py:56-73``); this pipeline samples its own flip/rotate/scale
# parameters and cannot represent an arbitrary Affine (shear/translate), so
# Affine is REJECTED rather than silently narrowed.
SUPPORTED_GEOMETRIC_TRANSFORMS = frozenset({"HorizontalFlip", "Rotate", "RandomScale"})
# Intensity / crop / container entries the pipeline handles (or safely
# ignores for TTA-inversion purposes): these carry no sampled geometry that
# a prediction warp would need to invert.
KNOWN_NONGEOMETRIC_TRANSFORMS = frozenset({
    "Normalize", "GaussNoise", "PadIfNeeded", "CenterCrop", "RandomCrop",
    "RandomBrightnessContrast", "ColorJitter", "RandomGamma", "GaussianBlur",
    "Blur", "MedianBlur", "MotionBlur", "Sharpen", "CLAHE", "Equalize",
    "Posterize", "Solarize", "ToFloat", "FromFloat", "ToTensorV2", "ToTensor",
    "OneOf", "Compose", "SomeOf", "Sequential", "Lambda", "NoOp",
})


def _looks_like_transform_name(key: str) -> bool:
    # albumentations class names are CamelCase (or end in a digit, e.g. D4);
    # config section keys are ALL-CAPS (TRAIN/VAL/TEST) and parameter keys
    # are snake_case — neither matches
    return bool(re.match(r"^[A-Z][a-z0-9][A-Za-z0-9]*$", key))


def check_geometric_transform_support(transforms, context: str = "augmentation config") -> None:
    """Reject reference-style transform trees this pipeline cannot express.

    ``transforms`` is an albumentations-style nested structure (lists of
    ``{Name: {params...}}`` dicts, e.g. the reference's
    ``data.augmentations.TRAIN`` — ``configs/data/lidc64.yaml:33-60``).
    WHITELIST semantics: a transform name passes only if it is one of the
    supported geometric transforms {HorizontalFlip, Rotate, RandomScale}
    (whose parameters the batched affine pipeline and the TTA inversion
    sample themselves) or a known non-geometric entry (Normalize, GaussNoise,
    crops, ...). Anything else — Affine, VerticalFlip, ElasticTransform, or
    a transform this table has never seen — raises: dropping it silently
    would change what TTA samples vs what training saw.
    """
    found: list[str] = []

    def walk(node) -> None:
        if isinstance(node, dict):
            for name, body in node.items():
                if (
                    _looks_like_transform_name(name)
                    and name not in SUPPORTED_GEOMETRIC_TRANSFORMS
                    and name not in KNOWN_NONGEOMETRIC_TRANSFORMS
                ):
                    found.append(name)
                walk(body)
        elif isinstance(node, (list, tuple)):
            for item in node:
                walk(item)

    walk(transforms)
    if found:
        raise ValueError(
            f"{context} contains transforms this pipeline cannot represent "
            f"or invert (or does not recognize): {sorted(set(found))}; "
            f"supported geometric transforms: "
            f"{sorted(SUPPORTED_GEOMETRIC_TRANSFORMS)}; known non-geometric "
            f"pass-through entries: {sorted(KNOWN_NONGEOMETRIC_TRANSFORMS)}"
        )


@dataclasses.dataclass(frozen=True)
class TrainAugmentConfig:
    hflip_p: float = 0.5
    rotation_limit: float = 22.5
    scale_limit: tuple[float, float] = (-0.2, 0.2)
    gauss_noise_var_limit: tuple[float, float] = (0.2, 0.44)
    gauss_noise_p: float = 0.5
    mean: tuple[float, ...] = (0.485, 0.456, 0.406)
    std: tuple[float, ...] = (0.229, 0.224, 0.225)
    augment_mult: float = 1.0
    separable_warp: bool = True  # two-pass MXU warp (ops/warp.py) instead of
    # the composed-gather warp: measured 9.0 ms -> sub-ms per train batch on
    # v5e (16% of the 57 ms train step was the augment warp). Bilinear images
    # get the double-interpolation semantics documented on
    # warp_affine_separable; masks stay exact nearest selections (off by at
    # most the resampling-grid pixel when |scale|>1). False -> the
    # single-resample composed warp.

    @property
    def effective(self) -> "TrainAugmentConfig":
        m = self.augment_mult
        if m == 1.0:
            return self
        return dataclasses.replace(
            self,
            hflip_p=min(1.0, self.hflip_p * m),
            rotation_limit=self.rotation_limit * m,
            scale_limit=(self.scale_limit[0] * m, self.scale_limit[1] * m),
            gauss_noise_var_limit=(
                self.gauss_noise_var_limit[0] * m,
                self.gauss_noise_var_limit[1] * m,
            ),
            augment_mult=1.0,
        )


def normalize_batch(images: jnp.ndarray, cfg: TrainAugmentConfig) -> jnp.ndarray:
    """(x - mean) / std with max_pixel_value=1 (albumentations Normalize)."""
    c = images.shape[-1]
    mean = jnp.asarray(cfg.mean, images.dtype)
    std = jnp.asarray(cfg.std, images.dtype)
    if mean.shape[0] == 1 and c > 1:
        mean = jnp.broadcast_to(mean, (c,))
        std = jnp.broadcast_to(std, (c,))
    return (images - mean) / std


def augment_batch(
    cfg: TrainAugmentConfig,
    rng: jax.Array,
    images: jnp.ndarray,
    masks: jnp.ndarray,
    *,
    normalize: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Apply the train pipeline to (B, H, W, C) images and (B, H, W) int masks.

    Returns augmented (images, masks); masks warp with nearest interpolation
    and constant-0 border (the reference's ``mask_value: 0``).
    """
    eff = cfg.effective
    b, h, w, _ = images.shape
    k_flip, k_rot, k_scale, k_noise_p, k_noise_var, k_noise = jax.random.split(rng, 6)

    flip = jax.random.bernoulli(k_flip, eff.hflip_p, (b,))
    angle = jax.random.uniform(k_rot, (b,), minval=-eff.rotation_limit, maxval=eff.rotation_limit)
    lo, hi = eff.scale_limit
    scale = 1.0 + jax.random.uniform(k_scale, (b,), minval=lo, maxval=hi)

    center = ((w - 1) / 2.0, (h - 1) / 2.0)
    rot = rotation_matrix(angle, scale, center)
    flip_m = jnp.broadcast_to(hflip_matrix(w), (b, 2, 3))
    ident = jnp.broadcast_to(jnp.asarray([[1.0, 0, 0], [0, 1.0, 0]]), (b, 2, 3))
    forward = compose_affine(rot, jnp.where(flip[:, None, None], flip_m, ident))
    dst_to_src = invert_affine(forward)

    masks_f = masks[..., None].astype(jnp.float32)
    if eff.separable_warp:
        m_x, m_y = separable_margins(
            float(eff.rotation_limit), 1.0 + float(lo), 1.0 + float(hi),
            eff.hflip_p > 0.0, h, w,
        )
        images = warp_affine_separable(images, dst_to_src, border_mode="constant",
                                       margin_x=m_x, margin_y=m_y)
        masks_w = warp_affine_separable(masks_f, dst_to_src,
                                        interpolation="nearest",
                                        border_mode="constant",
                                        margin_x=m_x, margin_y=m_y)
    else:
        images = warp_affine(images, dst_to_src, interpolation="bilinear",
                             border_mode="constant", border_value=0.0)
        masks_w = warp_affine(masks_f, dst_to_src, interpolation="nearest",
                              border_mode="constant", border_value=0.0)
    masks = masks_w[..., 0].astype(masks.dtype)

    # GaussNoise: sigma = sqrt(var) with var ~ U(var_limit), applied with p
    nlo, nhi = eff.gauss_noise_var_limit
    var = jax.random.uniform(k_noise_var, (b,), minval=nlo, maxval=nhi)
    sigma = jnp.sqrt(jnp.maximum(var, 0.0))
    apply_noise = jax.random.bernoulli(k_noise_p, eff.gauss_noise_p, (b,))
    noise = jax.random.normal(k_noise, images.shape, images.dtype)
    scale_b = jnp.where(apply_noise, sigma, 0.0)[:, None, None, None]
    images = images + noise * scale_b

    if normalize:
        images = normalize_batch(images, eff)
    return images, masks
