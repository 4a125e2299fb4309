"""Per-AU-type training losses.

Provenance (``uncertainty_modeling/lightning_experiment.py``):

- softmax (:646-661): ``ignore_index != 0`` -> masked CE; else SoftDice on
  softmax + CE;
- ssn (:446-486): Monte-Carlo log-likelihood: S rsamples of the logit
  distribution, per-pixel CE, summed log-prob per sample, logsumexp over S
  minus log S, mean over batch;
- diffusion (:489-509, 583-592): one-hot target with ignore mask zeroed and
  a loss_mask over valid pixels, then the diffusion weighted-MSE step;
- prob_unet (:510-535, 594-620): random-rater target, posterior ELBO with
  beta warm-up plus L2 regularizer on prior/posterior/fcomb.

Every loss is a pure function ``(params, batch, rng, extra) -> (loss, aux)``
that branches at trace time on the AU type.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..metrics.dice import soft_dice_loss
from ..models import ssn as ssn_lib
from ..models.factory import BuiltModel
from ..models.prob_unet import elbo_loss, kl_diag_gaussians, sample_latent


def _masked_ce(logits: jnp.ndarray, target: jnp.ndarray, ignore_index: int | None):
    """Cross entropy on NHWC logits vs (B, H, W) targets, mean over valid."""
    c = logits.shape[-1]
    logp = jax.nn.log_softmax(logits, axis=-1)
    safe = jnp.clip(target, 0, c - 1)
    picked = jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    if ignore_index is not None:
        valid = (target != ignore_index).astype(logits.dtype)
        return -jnp.sum(picked * valid) / jnp.maximum(jnp.sum(valid), 1.0)
    return -jnp.mean(picked)


def _select_random_rater(seg: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
    """(B, R, H, W) -> (B, H, W) random rater per element (train-time AU)."""
    if seg.ndim == 3:
        return seg
    b, r = seg.shape[:2]
    idx = jax.random.randint(rng, (b,), 0, r)
    return jnp.take_along_axis(seg, idx[:, None, None, None], axis=1)[:, 0]


def make_loss_fn(
    built: BuiltModel,
    *,
    ignore_index: int = -1,
    n_aleatoric_samples: int = 10,
    ssn_mean_only: bool = False,
) -> Callable:
    """Build ``loss_fn(params, batch, rng, sched) -> (loss, aux_dict)``.

    ``batch`` carries ``image`` (B,H,W,C) preprocessed inputs and ``seg``
    (B,H,W) or (B,R,H,W) integer labels. ``sched`` is a dict of traced
    per-epoch scalars (currently ``beta`` for prob-U-Net warm-up).
    ``ssn_mean_only`` is static (the SSN pretraining phase changes the graph);
    the trainer re-jits once when the phase flips.
    """
    au = built.au_type
    module = built.module
    num_classes = built.num_classes
    # reference convention: ignore_index != 0 -> use CE with ignore;
    # "no ignore" is expressed as 0 in their configs (lightning :646-655)
    use_ignore = ignore_index != 0
    ce_ignore = ignore_index if use_ignore else None

    is_hrnet = built.backbone == "hrnet"

    def _apply(params, *args, rng=None, **kw):
        rngs = {"dropout": rng} if (built.needs_dropout_rng and rng is not None) else None
        return module.apply(params, *args, rngs=rngs, **kw)

    def _apply_train(params, model_state, x, rng=None, **kw):
        """Forward in train mode; returns (out, updated_model_state)."""
        rngs = {"dropout": rng} if (built.needs_dropout_rng and rng is not None) else None
        if is_hrnet:
            out, updated = module.apply(
                {**params, **(model_state or {})}, x, True,
                rngs=rngs, mutable=["batch_stats"], **kw,
            )
            return out, dict(updated)
        return module.apply(params, x, rngs=rngs, **kw), None

    if au == "softmax":

        def loss_fn(params, batch, rng, sched, model_state=None):
            out, new_ms = _apply_train(params, model_state, batch["image"], rng=rng)
            logits = out.logits
            target = _select_random_rater(batch["seg"], jax.random.fold_in(rng, 1))
            if use_ignore:
                loss = _masked_ce(logits, target, ce_ignore)
            else:
                probs = jax.nn.softmax(logits, axis=-1)
                loss = soft_dice_loss(probs, target) + _masked_ce(logits, target, None)
            aux = {"loss": loss}
            if new_ms is not None:
                aux["model_state"] = new_ms
            return loss, aux

    elif au == "ssn":

        def loss_fn(params, batch, rng, sched, model_state=None):
            k_drop, k_rater, k_sample = jax.random.split(rng, 3)
            target = _select_random_rater(batch["seg"], k_rater)
            out, new_ms = _apply_train(
                params, model_state, batch["image"], rng=k_drop, mean_only=ssn_mean_only
            )
            dist = ssn_lib.build_distribution(
                out.ssn_mean, out.ssn_cov_diag, out.ssn_cov_factor
            )
            flat = ssn_lib.sample_n(dist, k_sample, n_aleatoric_samples)  # (S,B,N)
            b, h, w, c = out.logits.shape
            s = n_aleatoric_samples
            logits_s = flat.reshape(s, b, h, w, c)
            logp = jax.nn.log_softmax(logits_s, axis=-1)
            safe = jnp.clip(target, 0, c - 1)
            picked = jnp.take_along_axis(
                logp, jnp.broadcast_to(safe[None, ..., None], (s, b, h, w, 1)), axis=-1
            )[..., 0]
            if use_ignore:
                valid = (target != ce_ignore).astype(picked.dtype)[None]
                per_sample_logprob = jnp.sum(picked * valid, axis=(2, 3))  # (S,B)
            else:
                per_sample_logprob = jnp.sum(picked, axis=(2, 3))
            loglik = jnp.mean(
                jax.scipy.special.logsumexp(per_sample_logprob, axis=0) - jnp.log(s)
            )
            loss = -loglik
            aux = {"loss": loss, "cov_failed": jnp.mean(dist.cov_failed.astype(jnp.float32))}
            if new_ms is not None:
                aux["model_state"] = new_ms
            return loss, aux

    elif au == "diffusion":

        def loss_fn(params, batch, rng, sched, model_state=None):
            k_drop, k_rater, k_diff = jax.random.split(rng, 3)
            target = _select_random_rater(batch["seg"], k_rater)
            if use_ignore:
                ignore_mask = target == ce_ignore
                safe_target = jnp.where(ignore_mask, 0, target)
            else:
                ignore_mask = jnp.zeros_like(target, dtype=bool)
                safe_target = target
            one_hot = jax.nn.one_hot(safe_target, num_classes, dtype=batch["image"].dtype)
            valid = (~ignore_mask).astype(one_hot.dtype)[..., None]
            loss_mask = jnp.broadcast_to(valid, one_hot.shape)
            one_hot = one_hot * loss_mask

            def model_fn(x_with_im, t):
                return _apply(params, x_with_im, t, rng=k_drop).logits

            loss, _ = built.diffusion.train_loss_step(
                model_fn, one_hot, batch["image"], k_diff,
                loss_mask=loss_mask if use_ignore else None,
            )
            return loss, {"loss": loss}

    elif au == "prob_unet":
        spec = built.prob_unet_spec

        def loss_fn(params, batch, rng, sched, model_state=None):
            k_drop, k_rater, k_z = jax.random.split(rng, 3)
            target = _select_random_rater(batch["seg"], k_rater)
            if use_ignore:
                safe_target = jnp.where(target == ce_ignore, 0, target)
            else:
                safe_target = target
            segm_onehot = jax.nn.one_hot(safe_target, num_classes, dtype=batch["image"].dtype)
            if use_ignore:
                segm_onehot = jnp.where(
                    (target == ce_ignore)[..., None], 0.0, segm_onehot
                )
            out = _apply(params, batch["image"], segm_onehot, rng=k_drop)
            z_post = sample_latent(out.posterior, k_z)
            logits = _apply(params, out.features, z_post, rng=k_drop, method=module.decode)
            kl = kl_diag_gaussians(out.posterior, out.prior)
            beta = sched.get("beta", spec.beta) if isinstance(sched, dict) else spec.beta
            neg_elbo, recon, mean_kl = elbo_loss(
                logits, target, kl, beta, ignore_index=ce_ignore if use_ignore else None
            )
            # L2 on prior/posterior/fcomb (reference regularization_loss)
            reg = sum(
                jnp.sum(p**2)
                for name in ("prior", "posterior", "fcomb")
                for p in jax.tree.leaves(params["params"].get(name, {}))
            )
            loss = neg_elbo + spec.regularizer_coeff * reg
            return loss, {"loss": loss, "recon": recon, "kl": mean_kl}

    else:
        raise ValueError(au)

    return loss_fn
