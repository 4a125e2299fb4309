"""Probabilistic U-Net on DiffUnet backbones (Flax).

Reference: ``diff_unet2D_module.py:1032-1351`` — a full DiffUnet produces
decoder features; encoder-only DiffUnets parameterize axis-aligned Gaussian
prior/posterior latents (dim 6 by default) from globally-pooled bottleneck
features; ``Fcomb`` fuses features with a tiled latent through 1x1 convs.

Functional redesign: the module returns distribution parameters; sampling,
ELBO and the beta warm-up schedule live in pure functions / the train loop,
with explicit PRNG keys so ``vmap`` over keys replaces the reference's
``sample_multiple`` Python loop (``diff_unet2D_module.py:1156-1165``).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.specs import ProbUnetSpec
from .unet import DiffUnet, MemberConv


class LatentParams(NamedTuple):
    mu: jnp.ndarray  # (B, L)
    log_sigma: jnp.ndarray  # (B, L)

    @property
    def sigma(self) -> jnp.ndarray:
        return jnp.exp(self.log_sigma)


class ProbUnetOutput(NamedTuple):
    features: jnp.ndarray  # (B, H, W, F) decoder features of the base unet
    prior: LatentParams
    posterior: LatentParams | None
    logits: jnp.ndarray | None  # decode(features, z) when z was passed


def sample_latent(params: LatentParams, rng: jax.Array) -> jnp.ndarray:
    eps = jax.random.normal(rng, params.mu.shape, params.mu.dtype)
    return params.mu + params.sigma * eps


def kl_diag_gaussians(post: LatentParams, prior: LatentParams) -> jnp.ndarray:
    """KL(post || prior) for diagonal Gaussians, summed over latent dims; (B,)."""
    var_ratio = jnp.exp(2.0 * (post.log_sigma - prior.log_sigma))
    t1 = ((post.mu - prior.mu) / prior.sigma) ** 2
    return 0.5 * jnp.sum(
        var_ratio + t1 - 1.0 - 2.0 * (post.log_sigma - prior.log_sigma), axis=-1
    )


class LatentEncoder(nn.Module):
    """Encoder-only DiffUnet -> global pool -> 1x1 conv -> (mu, log_sigma)."""

    encoder: DiffUnet
    latent_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> LatentParams:
        feats = self.encoder(x).features  # (B, h, w, C)
        pooled = jnp.mean(feats, axis=(1, 2), keepdims=True)
        # MemberConv's 1x1-as-matmul path: same param tree as nn.Conv, but
        # safe under member-sharded vmap (see MemberConv docstring)
        params = MemberConv(
            2 * self.latent_dim,
            (1, 1),
            kernel_init=nn.initializers.kaiming_normal(),
            bias_init=nn.initializers.normal(stddev=1e-2),
            name="param_head",
        )(pooled)[:, 0, 0, :]
        mu, log_sigma = jnp.split(params, 2, axis=-1)
        return LatentParams(mu, log_sigma)


class Fcomb(nn.Module):
    """1x1-conv fusion of features and a tiled latent (``:1032-1062``)."""

    num_classes: int
    hidden_channels: int
    num_layers: int = 4

    @nn.compact
    def __call__(self, features: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
        b, h, w, _ = features.shape
        latent = jnp.broadcast_to(z[:, None, None, :], (b, h, w, z.shape[-1]))
        fused = jnp.concatenate([features, latent], axis=-1)
        for i in range(max(0, self.num_layers - 1)):
            fused = MemberConv(self.hidden_channels, (1, 1), name=f"body_{i}")(fused)
            fused = jax.nn.relu(fused)
        return MemberConv(self.num_classes, (1, 1), name="head")(fused)


class ProbUnet(nn.Module):
    """The assembled probabilistic U-Net.

    ``__call__`` runs base features + prior (and posterior when ``segm`` is
    given); ``decode`` turns (features, z) into logits. The split keeps the
    expensive feature pass out of the per-sample loop: N latent samples reuse
    one backbone forward, exactly like the reference — but the N decodes are
    a ``vmap`` instead of a list comprehension.
    """

    base: DiffUnet
    prior: LatentEncoder
    posterior: LatentEncoder
    fcomb: Fcomb
    latent_dim: int

    def __call__(
        self,
        patch: jnp.ndarray,
        segm: jnp.ndarray | None = None,
        z: jnp.ndarray | None = None,
    ) -> ProbUnetOutput:
        features = self.base(patch).features
        prior = self.prior(patch)
        posterior = None
        if segm is not None:
            posterior = self.posterior(jnp.concatenate([patch, segm], axis=-1))
        logits = self.fcomb(features, z) if z is not None else None
        return ProbUnetOutput(features, prior, posterior, logits)

    def init_input_latent(self, batch: int) -> jnp.ndarray:
        """Zero latent for ``init`` so all submodule params (incl. fcomb) are
        created in one pass — flax only materialises executed modules."""
        return jnp.zeros((batch, self.latent_dim))

    def decode(self, features: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
        return self.fcomb(features, z)


def _scale_channel_mult(channel_mult, scale: float):
    """``diff_unet2D_module.py:1272-1284``: round, floor at 1, first stays 1."""
    if scale is None or abs(scale - 1.0) < 1e-6:
        return tuple(channel_mult)
    if scale <= 0:
        raise ValueError("channel-mult scale must be > 0")
    out = []
    for i, v in enumerate(channel_mult):
        sv = max(1, int(round(v * scale)))
        out.append(1 if i == 0 else sv)
    return tuple(out)


def build_prob_unet(base_kwargs: dict[str, Any], spec: ProbUnetSpec) -> ProbUnet:
    """Assemble the three scaled DiffUnets + fcomb (``:1287-1351``)."""
    if base_kwargs.get("diffusion", False):
        raise ValueError("Probabilistic UNet does not support diffusion training")
    channel_mult = tuple(base_kwargs["channel_mult"])
    in_ch = int(base_kwargs["in_channels"])
    out_ch = int(base_kwargs["out_channels"])

    def cfg(scale, in_channels=None, encoder_only=False):
        kw = dict(base_kwargs)
        kw.update(
            channel_mult=_scale_channel_mult(channel_mult, scale),
            diffusion=False,
            ssn=False,
            encoder_only=encoder_only,
        )
        if in_channels is not None:
            kw["in_channels"] = in_channels
        return kw

    base = DiffUnet(**cfg(spec.unet_channel_mult))
    prior_enc = DiffUnet(**cfg(spec.prior_channel_mult, encoder_only=True))
    post_enc = DiffUnet(
        **cfg(spec.posterior_channel_mult, in_channels=in_ch + out_ch, encoder_only=True)
    )
    mc = int(base_kwargs["model_channels"])
    return ProbUnet(
        base=base,
        prior=LatentEncoder(prior_enc, spec.latent_dim),
        posterior=LatentEncoder(post_enc, spec.latent_dim),
        fcomb=Fcomb(num_classes=out_ch, hidden_channels=mc, num_layers=max(1, spec.num_fcomb_convs)),
        latent_dim=spec.latent_dim,
    )


def elbo_loss(
    logits: jnp.ndarray,
    target: jnp.ndarray,
    kl: jnp.ndarray,
    beta: float,
    ignore_index: int | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(-elbo, recon_ce, mean_kl); reference ``:1177-1202``."""
    num_classes = logits.shape[-1]
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    safe_target = jnp.clip(target, 0, num_classes - 1)
    picked = jnp.take_along_axis(log_probs, safe_target[..., None], axis=-1)[..., 0]
    if ignore_index is not None and ignore_index >= 0:
        valid = (target != ignore_index).astype(logits.dtype)
        recon = -jnp.sum(picked * valid) / jnp.maximum(jnp.sum(valid), 1.0)
    else:
        recon = -jnp.mean(picked)
    mean_kl = jnp.mean(kl)
    neg_elbo = recon + beta * mean_kl
    return neg_elbo, recon, mean_kl
