"""Offline sub-ensemble mask trainer.

Reference: ``uncertainty_modeling/models/extract_sub_ensemble.py:487-800`` —
given a trained checkpoint, learn N binary channel masks with Gumbel-softmax
relaxation + temperature annealing, optimizing task loss + diversity
(pairwise IoU) + size penalty, base weights frozen. Materialized members are
saved as a stacked params checkpoint consumable by the params_stack sampler.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import subensemble as se
from ..models.factory import BuiltModel
from .losses import _masked_ce, _select_random_rater


@dataclasses.dataclass
class SubensembleConfig:
    num_masks: int = 10
    steps: int = 200
    learning_rate: float = 1e-2
    temp_start: float = 2.0
    temp_end: float = 0.3
    diversity_coeff: float = 1.0
    size_coeff: float = 1.0
    target_fraction: float = 0.5
    rows_only: bool = False
    normalize: bool = True
    ignore_index: int = -1
    seed: int = 0


def train_subensemble_masks(
    built: BuiltModel,
    params: Any,
    batches: list[dict],
    cfg: SubensembleConfig,
) -> dict:
    """Learn mask logits over frozen ``params``; returns the mask pytree.

    ``batches`` is a list of {'image', 'seg'} numpy/jnp dicts cycled over for
    ``cfg.steps`` optimization steps.
    """
    if built.au_type != "softmax":
        raise NotImplementedError("sub-ensemble mask training supports softmax models")
    base = params["params"] if "params" in params else params
    masks = se.init_mask_logits(base, cfg.num_masks)
    tx = optax.adam(cfg.learning_rate)
    opt_state = tx.init(masks)
    module = built.module

    def member_loss(mask_logits, member, batch, rng, temp):
        soft = se.masked_params(
            base, mask_logits, member, hard=False, rng=rng, temp=temp,
            rows_only=cfg.rows_only, normalize=cfg.normalize,
        )
        out = module.apply({"params": soft}, batch["image"])
        target = _select_random_rater(batch["seg"], jax.random.fold_in(rng, 3))
        return _masked_ce(out.logits, target,
                          cfg.ignore_index if cfg.ignore_index != 0 else None)

    def total_loss(mask_logits, batch, rng, temp):
        keys = jax.random.split(rng, cfg.num_masks)
        task = jnp.mean(
            jnp.stack([
                member_loss(mask_logits, m, batch, keys[m], temp)
                for m in range(cfg.num_masks)
            ])
        )
        div = se.mean_pairwise_iou(mask_logits, hard=False, rows_only=cfg.rows_only)
        size = se.submodel_size_penalty(
            mask_logits, cfg.target_fraction, rows_only=cfg.rows_only
        )
        loss = task + cfg.diversity_coeff * div + cfg.size_coeff * size
        return loss, {"task": task, "iou": div, "size": size}

    @jax.jit
    def step(mask_logits, opt_state, batch, rng, temp):
        (loss, aux), grads = jax.value_and_grad(total_loss, has_aux=True)(
            mask_logits, batch, rng, temp
        )
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(mask_logits, updates), opt_state, loss, aux

    rng = jax.random.key(cfg.seed)
    for i in range(cfg.steps):
        frac = i / max(cfg.steps - 1, 1)
        temp = cfg.temp_start * (cfg.temp_end / cfg.temp_start) ** frac
        batch = batches[i % len(batches)]
        jbatch = {
            "image": jnp.asarray(batch["image"]),
            "seg": jnp.asarray(batch["seg"]),
        }
        rng, key = jax.random.split(rng)
        masks, opt_state, loss, aux = step(
            masks, opt_state, jbatch, key, jnp.asarray(temp, jnp.float32)
        )
    return masks


def materialize_for_inference(params: Any, masks: dict, num_masks: int,
                              rows_only: bool = False, normalize: bool = True) -> Any:
    """Stacked variables dict for the params_stack sampler."""
    base = params["params"] if "params" in params else params
    stacked = se.materialize_members(
        base, masks, num_masks, rows_only=rows_only, normalize=normalize
    )
    return {"params": stacked}
