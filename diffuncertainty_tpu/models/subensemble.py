"""Masked sub-ensembles: N binary channel masks over a trained net (C1-EU).

Reference: ``uncertainty_modeling/models/masked_subensemble.py`` (mask layers,
Gumbel-softmax relaxation, pairwise-IoU diversity, size penalty) and the
load-time dense-member expansion at ``unc_mod_utils/test_utils.py:548-731``.

TPU-native design: masks are a *pytree parallel to the params tree* — for
every dense/conv kernel, input/output channel mask logits of shape (M, C).
Nothing is wrapped or replaced at the module level:

- soft (training) masks: per-layer Gumbel relaxation applied to a *copy* of
  the frozen base params — the masked forward is the plain model forward
  with perturbed weights, so it jits once and vmaps over members;
- hard materialization multiplies kernels by ``logits >= 0`` channel masks
  with keep-ratio renormalization, producing a stacked (M, ...) params tree
  that drops into the existing params_stack sampler.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def _is_maskable(leaf_dict: dict) -> bool:
    k = leaf_dict.get("kernel")
    return k is not None and hasattr(k, "ndim") and k.ndim in (2, 4)


def _iter_maskable(params: Any, prefix=()):
    """Yield (path tuple, layer dict) for every dense/conv layer dict."""
    if isinstance(params, dict):
        if _is_maskable(params):
            yield prefix, params
        else:
            for key, val in params.items():
                yield from _iter_maskable(val, prefix + (key,))


def _kernel_io(kernel: jnp.ndarray) -> tuple[int, int]:
    return kernel.shape[-2], kernel.shape[-1]  # HWIO / (in, out)


def init_mask_logits(params: Any, num_masks: int) -> dict:
    """Zero-initialized mask logits (reference ``use_zero_init`` default)."""
    masks = {}
    for path, layer in _iter_maskable(params):
        cin, cout = _kernel_io(layer["kernel"])
        masks["/".join(path)] = {
            "in": jnp.zeros((num_masks, cin), jnp.float32),
            "out": jnp.zeros((num_masks, cout), jnp.float32),
        }
    return masks


def _rescale(mask: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    return 1.0 / jnp.maximum(jnp.mean(mask.astype(jnp.float32)), eps)


def _apply_masks_to_layer(layer: dict, in_mask, out_mask, normalize: bool) -> dict:
    kernel = layer["kernel"]
    shape_in = (1,) * (kernel.ndim - 2) + (-1, 1)
    shape_out = (1,) * (kernel.ndim - 2) + (1, -1)
    masked = kernel * in_mask.reshape(shape_in) * out_mask.reshape(shape_out)
    if normalize:
        masked = masked * (_rescale(in_mask) * _rescale(out_mask))
    out = dict(layer)
    out["kernel"] = masked.astype(kernel.dtype)
    if "bias" in layer and layer["bias"] is not None:
        bias = layer["bias"] * out_mask
        if normalize:
            bias = bias * _rescale(out_mask)
        out["bias"] = bias.astype(layer["bias"].dtype)
    return out


def _map_layers(params: Any, fn, prefix=()):
    if isinstance(params, dict):
        if _is_maskable(params):
            return fn(prefix, params)
        return {k: _map_layers(v, fn, prefix + (k,)) for k, v in params.items()}
    return params


def masked_params(
    params: Any,
    mask_logits: dict,
    member: int,
    *,
    hard: bool = True,
    rng: jax.Array | None = None,
    temp: float = 1.0,
    rows_only: bool = False,
    normalize: bool = True,
) -> Any:
    """Base params with member ``member``'s masks applied.

    ``hard=False`` uses the Gumbel-softmax relaxation over [logit, -logit]
    (``masked_subensemble.py:38-47``) — requires ``rng``.
    """

    def fn(path, layer):
        key = "/".join(path)
        if key not in mask_logits:
            return layer
        in_l = mask_logits[key]["in"][member]
        out_l = mask_logits[key]["out"][member]
        if hard:
            in_m = jnp.ones_like(in_l) if rows_only else (in_l >= 0.0).astype(in_l.dtype)
            out_m = (out_l >= 0.0).astype(out_l.dtype)
        else:
            import zlib

            k = jax.random.fold_in(rng, zlib.crc32(key.encode()) % (2**31))
            k_in, k_out = jax.random.split(k)

            def gumbel_binary(logits, kk):
                g = jax.random.gumbel(kk, (2,) + logits.shape)
                z = jnp.stack([logits, -logits]) + g
                return jax.nn.softmax(z / temp, axis=0)[0]

            in_m = jnp.ones_like(in_l) if rows_only else gumbel_binary(in_l, k_in)
            out_m = gumbel_binary(out_l, k_out)
        return _apply_masks_to_layer(layer, in_m, out_m, normalize)

    return _map_layers(params, fn)


def materialize_members(
    params: Any, mask_logits: dict, num_masks: int, *,
    rows_only: bool = False, normalize: bool = True,
) -> Any:
    """Stacked (M, ...) dense member params for the params_stack sampler."""
    members = [
        masked_params(params, mask_logits, m, hard=True,
                      rows_only=rows_only, normalize=normalize)
        for m in range(num_masks)
    ]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *members)


# --------------------------------------------------------------------------
# mask-training objectives (masked_subensemble.py:500-556)
# --------------------------------------------------------------------------

def _soft_binary_weights(mask_logits: dict, key: str, rows_only: bool) -> jnp.ndarray:
    in_l = mask_logits[key]["in"]
    out_l = mask_logits[key]["out"]
    in_p = jnp.ones_like(in_l) if rows_only else jax.nn.sigmoid(in_l * 2.0)
    out_p = jax.nn.sigmoid(out_l * 2.0)
    m = in_l.shape[0]
    return (out_p[:, :, None] * in_p[:, None, :]).reshape(m, -1)


def _hard_binary_weights(mask_logits: dict, key: str, rows_only: bool) -> jnp.ndarray:
    in_l = mask_logits[key]["in"]
    out_l = mask_logits[key]["out"]
    in_m = jnp.ones_like(in_l) if rows_only else (in_l >= 0).astype(jnp.float32)
    out_m = (out_l >= 0).astype(jnp.float32)
    m = in_l.shape[0]
    return (out_m[:, :, None] * in_m[:, None, :]).reshape(m, -1)


def mean_pairwise_iou(mask_logits: dict, *, hard: bool = False, rows_only: bool = False) -> jnp.ndarray:
    """Mean pairwise IoU of member weight-masks, accumulated across layers."""
    inter_acc = None
    union_acc = None
    for key in mask_logits:
        w = (_hard_binary_weights if hard else _soft_binary_weights)(
            mask_logits, key, rows_only
        )
        if w.shape[0] <= 1:
            continue
        inter = w @ w.T
        sums = jnp.sum(w, axis=1, keepdims=True)
        union = sums + sums.T - inter
        inter_acc = inter if inter_acc is None else inter_acc + inter
        union_acc = union if union_acc is None else union_acc + union
    if inter_acc is None:
        return jnp.zeros(())
    m = inter_acc.shape[0]
    iu, ju = jnp.triu_indices(m, k=1)
    return jnp.mean(inter_acc[iu, ju] / (union_acc[iu, ju] + 1e-8))


def submodel_size_penalty(
    mask_logits: dict, target_fraction: float, *, rows_only: bool = False
) -> jnp.ndarray:
    """Per-layer mean ReLU(expected_fill - target)."""
    penalties = []
    for key in mask_logits:
        w = _soft_binary_weights(mask_logits, key, rows_only)
        expected = jnp.sum(w, axis=1) / w.shape[1]
        penalties.append(jnp.mean(jax.nn.relu(expected - target_fraction)))
    if not penalties:
        return jnp.zeros(())
    return jnp.mean(jnp.stack(penalties))


def compute_mask_stats(mask_logits: dict, *, rows_only: bool = False) -> dict:
    """Offline checkpoint inspector (``models/subensemble_mask_stats.py:9-100``):
    per-member sparsity, global fill, and the pairwise hard-IoU matrix."""
    import numpy as np

    total_active = None
    total_weights = 0
    inter_acc = None
    union_acc = None
    for key in mask_logits:
        w = np.asarray(_hard_binary_weights(mask_logits, key, rows_only))
        active = w.sum(axis=1)
        total_active = active if total_active is None else total_active + active
        total_weights += w.shape[1]
        inter = w @ w.T
        sums = w.sum(axis=1, keepdims=True)
        union = sums + sums.T - inter
        inter_acc = inter if inter_acc is None else inter_acc + inter
        union_acc = union if union_acc is None else union_acc + union
    if total_active is None:
        return {"num_masks": 0}
    m = len(total_active)
    iou = inter_acc / np.maximum(union_acc, 1e-8)
    iu, ju = np.triu_indices(m, k=1)
    return {
        "num_masks": m,
        "fill_fraction_per_member": (total_active / total_weights).tolist(),
        "mean_fill_fraction": float(np.mean(total_active / total_weights)),
        "mean_pairwise_iou": float(iou[iu, ju].mean()) if m > 1 else 1.0,
        "pairwise_iou_matrix": iou.tolist(),
    }
