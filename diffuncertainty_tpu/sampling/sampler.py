"""PredictionSampler: the fused (members x samples x batch) softmax stack.

This is the TPU-native replacement for the reference's inference hot loop
(``test_2D.py:1121-1280`` ``_build_batch_predictions``), which runs Python
loops over models (with CPU<->GPU model hopping), n_pred diffusion
trajectories, and TTA rounds. Here the whole thing is ONE jitted program:

- the member axis is ``vmap`` over stacked parameter pytrees (deep ensembles,
  SWAG draws, materialized sub-ensembles) or over per-member dropout keys;
- the sample axis is ``vmap`` over PRNG keys (SSN draws, prob-U-Net latents,
  diffusion start noise, TTA transform parameters);
- diffusion timesteps are a ``lax.scan`` inside each trajectory.

Grouping semantics match the reference exactly:

- every member contributes one *group* of samples: generative AU types and
  softmax+TTA give ``n_pred`` samples per group; plain softmax gives 1;
- ``multiple_generative`` (more than one generative member and not
  ``direct_au``): groups stay per-member. Otherwise each sample becomes its
  own singleton group (``test_2D.py:1160-1180``);
- the downstream "softmax_pred" P-axis is the stack of per-group means
  (``test_2D.py:1277``), which feeds the C2 measures and BMA-GED; grouped GED
  consumes the raw groups;
- ``same_dropout`` reuses one dropout key per member across all its samples
  (seeded dropout, ``seeded_dropout.py:42-210``);
- ``discretize`` one-hots each sample's argmax before averaging.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..models import ssn as ssn_lib
from ..models.factory import BuiltModel
from ..models.prob_unet import sample_latent
from ..models.unet import DiffUnet
from .tta import TTAConfig, apply_tta, invert_tta, sample_tta_params


@dataclasses.dataclass(frozen=True)
class SamplerSpec:
    n_pred: int = 10
    n_members: int = 1
    member_mode: str = "single"  # single | params_stack | dropout
    member_chunk: int | None | str = "auto"  # chunk the member vmap:
    # an int runs members through lax.map in blocks of that size (HBM
    # ceiling — SURVEY §7: a fused (members x samples x B x H x W x C)
    # diffusion stack can exceed HBM); None -> fully vectorized vmap.
    # "auto" (default) resolves to 1 for params_stack on TPU and None
    # elsewhere: vmap lowers stacked-weight convs to feature-grouped convs
    # whose cost GROWS with group count on v5e — measured 16-member
    # unet16@128 ensemble+TTA bf16: chunk1 86.6 img/s > chunk2 83.3 >
    # chunk4 78.9 > full vmap 73.6 — so a member-scan of plain dense
    # programs is both fastest and lowest-memory.
    # "auto" resolves at CALL time (jit-trace time), not at build time, so
    # samplers built before mesh/distributed setup cannot bake in a stale
    # strategy. Eager calls with concrete stacked params key on the ACTUAL
    # member-axis sharding (sharded -> vmap; unsharded on TPU -> scan);
    # traced calls fall back to trace-time backend/device_count. The
    # production runner resolves "auto" explicitly from its mesh decision
    # (perf-only: every strategy is numerically pinned by tests).
    tta: bool = False
    tta_config: TTAConfig = TTAConfig()
    same_dropout: bool = False
    discretize: bool = False
    direct_au: bool = False
    flat_fold: bool = True  # fold (member, sample) rounds into the batch axis
    # for shared-param members (TPU-fast, distributionally identical; see the
    # flat-row-path note in make_sampler). False -> nested-vmap structure.
    member_fold: bool = False  # params_stack only: execute stacked members as
    # member-batched matmuls on folded rows (ops/member_fold.py) instead of
    # vmap. Opt-in: measured 6.5x SLOWER than the vmap grouped-conv lowering
    # on v5e for the 16-member unet16@128 ensemble+TTA workload (11.2 vs 73.6
    # img/s, and ~5x the compile time) — the im2col patch/tap traffic costs
    # more than the grouped conv saves. Kept for regimes where the grouped
    # conv degenerates (it is numerically pinned to the vmap path by tests).
    # Ignored (normal chunk/vmap execution applies) when its conditions are
    # unmet: DiffUnet backbone only, no same_dropout, not prob_unet.
    external_generative_members: int = 0  # generative members contributed by
    # sibling samplers in a heterogeneous ensemble; counted into the global
    # multiple_generative decision (reference test_2D.py:1149-1160)
    diffusion_num_steps: int | None = None  # None -> model default
    diffusion_sampler: str | None = None


class PredictionStack(NamedTuple):
    groups: jnp.ndarray  # (G, S, B, H, W, C) softmax samples
    group_means: jnp.ndarray  # (G, B, H, W, C) — the reference's "softmax_pred"
    mean: jnp.ndarray  # (B, H, W, C)


class SamplerMeta(NamedTuple):
    """Static (non-traced) structure of the stack a sampler emits."""

    n_groups: int
    samples_per_group: int
    group_is_generative: tuple  # tuple of bools, length n_groups


def make_sampler(built: BuiltModel, spec: SamplerSpec) -> Callable:
    """Build ``fn(params, images, rng) -> PredictionStack``.

    ``params``: a single param pytree (member_mode single/dropout) or a
    stacked pytree with leading member axis (member_mode params_stack).
    ``images``: (B, H, W, C_in) preprocessed inputs. The returned fn is pure
    and jittable; wrap in ``jax.jit`` (or pjit with a (data, member) mesh) at
    the call site.
    """
    au = built.au_type
    module = built.module
    n_pred = spec.n_pred
    needs_dropout = built.needs_dropout_rng

    # per-member sample count (group size) — reference: generative AU and
    # softmax+TTA produce n_pred; plain softmax produces 1
    member_is_generative = built.is_generative or (au == "softmax" and spec.tta)
    samples_per_member = n_pred if member_is_generative else 1

    num_steps = spec.diffusion_num_steps or built.diffusion_num_steps
    sampler_type = spec.diffusion_sampler or built.diffusion_sampler_type

    # Member-folded stacked-ensemble execution (opt-in, see SamplerSpec
    # .member_fold): rebuild the module with ``members=M`` so the stacked
    # params apply as member-batched im2col matmuls on member-major folded
    # rows (ops/member_fold.py) instead of vmap's feature-grouped convs.
    fold_module = None
    if (
        spec.member_fold
        and spec.member_mode == "params_stack"
        and not spec.same_dropout
        and isinstance(module, DiffUnet)
        and module.members == 0
        and au != "prob_unet"
    ):
        fold_module = module.clone(members=spec.n_members)
    apply_module = fold_module if fold_module is not None else module

    def _resolve_chunk(params) -> int | None:
        """Resolve the member execution strategy at call (trace) time.

        Stacked-ensemble members on a single TPU run fastest as a member-scan
        (chunk 1) — grouped-conv vmap measured slower (see
        SamplerSpec.member_chunk) — but a member axis sharded over a mesh must
        stay vmapped (a scan would serialize what the mesh parallelizes).
        """
        if fold_module is not None:
            return None  # folded execution replaces both vmap and chunking
        if spec.member_chunk != "auto":
            return spec.member_chunk
        if spec.member_mode != "params_stack":
            return None
        leaf = next(iter(jax.tree.leaves(params)), None)
        if (
            isinstance(leaf, jax.Array)
            and not isinstance(leaf, jax.core.Tracer)
            and hasattr(leaf, "sharding")
        ):
            # concrete stack: key on the actual member-axis sharding
            if leaf.sharding.shard_shape(leaf.shape)[0] != leaf.shape[0]:
                return None  # member axis sharded -> vmap
            return 1 if jax.default_backend() == "tpu" else None
        # traced call (sharding unknowable): trace-time topology fallback —
        # multi-device processes may shard the member axis, keep vmap there
        return (
            1
            if jax.default_backend() == "tpu" and jax.device_count() == 1
            else None
        )

    # static view for program-shape decisions that cannot wait for call time:
    # "auto" yields chunk=None for every non-params_stack mode
    static_chunk: int | None = (
        None if spec.member_chunk == "auto" else spec.member_chunk
    )

    def _apply(params, *args, dropout_key=None, method=None, **kw):
        rngs = {"dropout": dropout_key} if (needs_dropout and dropout_key is not None) else None
        if method is None:
            return apply_module.apply(params, *args, rngs=rngs, **kw)
        return apply_module.apply(params, *args, rngs=rngs, method=method, **kw)

    # ---- per-member group builders: (params, member_rng, images) -> (S,B,H,W,C)
    def softmax_group(params, member_rng, images):
        kd, ks = jax.random.split(member_rng)
        if not spec.tta:
            logits = _apply(params, images, dropout_key=kd).logits
            probs = jax.nn.softmax(logits, axis=-1)
            return probs[None]  # (1, B, H, W, C)

        b, h, w, _ = images.shape

        def one_round(key):
            k_tta, k_drop = jax.random.split(key)
            tta_params = sample_tta_params(spec.tta_config, k_tta, b, h, w)
            aug = apply_tta(images, tta_params)
            dk = kd if spec.same_dropout else k_drop
            logits = _apply(params, aug, dropout_key=dk).logits
            probs = jax.nn.softmax(logits, axis=-1)
            return invert_tta(probs, tta_params)

        return jax.vmap(one_round)(jax.random.split(ks, n_pred))

    def ssn_group(params, member_rng, images):
        kd, ks = jax.random.split(member_rng)
        out = _apply(params, images, dropout_key=kd)
        dist = ssn_lib.build_distribution(out.ssn_mean, out.ssn_cov_diag, out.ssn_cov_factor)
        flat = ssn_lib.sample_n(dist, ks, n_pred)  # (S, B, N)
        b, h, w, c = out.logits.shape
        logits = flat.reshape(n_pred, b, h, w, c)
        return jax.nn.softmax(logits, axis=-1)

    def diffusion_group(params, member_rng, images):
        kd, ks = jax.random.split(member_rng)
        b, h, w, _ = images.shape
        c = built.num_classes

        def model_fn(x_with_im, t, step_key):
            dk = kd if spec.same_dropout else step_key
            return _apply(params, x_with_im, t, dropout_key=dk).logits

        def one_traj(key):
            k_init, k_loop = jax.random.split(key)
            x_init = jax.random.normal(k_init, (b, h, w, c), images.dtype)
            x0 = built.diffusion.sample_loop(
                model_fn, x_init, images, num_steps, rng=k_loop,
                sampler_type=sampler_type, model_takes_rng=True,
            )
            return x0

        # NOTE: model final_act=softmax for diffusion configs; x0 is already
        # a simplex-ish field but the reference still treats samples directly
        # as softmax_pred (the model emits softmax outputs by construction).
        return jax.vmap(one_traj)(jax.random.split(ks, n_pred))

    def prob_unet_group(params, member_rng, images):
        kd, ks = jax.random.split(member_rng)
        out = _apply(params, images, dropout_key=kd)

        def one_sample(key):
            z = sample_latent(out.prior, key)
            logits = _apply(params, out.features, z, dropout_key=kd, method=module.decode)
            return jax.nn.softmax(logits, axis=-1)

        return jax.vmap(one_sample)(jax.random.split(ks, n_pred))

    group_fn = {
        "softmax": softmax_group,
        "ssn": ssn_group,
        "diffusion": diffusion_group,
        "prob_unet": prob_unet_group,
    }[au]

    n_members = spec.n_members if spec.member_mode != "single" else 1

    # ---- flat row path: fold (member, sample) into the batch axis ----------
    # Shared-parameter members (MC-dropout replicas / TTA rounds / fresh
    # trajectories) differ only by PRNG draws, and every stochastic op in the
    # stack (ChannelDropout masks, TTA params, SSN/prob-unet/diffusion noise)
    # draws independently per batch row. Folding M*S rounds into one big batch
    # is therefore distributionally identical to nested vmaps, but hands XLA a
    # plain 4-D NHWC program — no 6-D (M,S,B,...) tensors, whose awkward tiled
    # layouts caused the data-formatting copies in the round-1 device profile.
    # vmap is kept where it is semantically required: stacked params
    # (params_stack) and per-member mask reuse (same_dropout).

    def _tile_rows(images, rows):
        b = images.shape[0]
        tiled = jnp.broadcast_to(images[None], (rows,) + images.shape)
        return tiled.reshape((rows * b,) + images.shape[1:])

    def flat_softmax(params, rng, images):
        b, h, w, _ = images.shape
        rows = n_members * samples_per_member
        k_drop, k_tta = jax.random.split(rng)
        x = _tile_rows(images, rows)
        tta_params = None
        if spec.tta:
            tta_params = sample_tta_params(spec.tta_config, k_tta, rows * b, h, w)
            x = apply_tta(x, tta_params)
        logits = _apply(params, x, dropout_key=k_drop).logits
        probs = jax.nn.softmax(logits, axis=-1)
        if spec.tta:
            probs = invert_tta(probs, tta_params)
        return probs.reshape(n_members, samples_per_member, b, h, w, probs.shape[-1])

    def flat_ssn(params, rng, images):
        b, h, w, _ = images.shape
        kd, ks = jax.random.split(rng)
        out = _apply(params, _tile_rows(images, n_members), dropout_key=kd)
        dist = ssn_lib.build_distribution(out.ssn_mean, out.ssn_cov_diag, out.ssn_cov_factor)
        flat = ssn_lib.sample_n(dist, ks, n_pred)  # (S, M*B, N)
        c = out.logits.shape[-1]
        logits = flat.reshape(n_pred, n_members, b, h, w, c)
        return jnp.moveaxis(jax.nn.softmax(logits, axis=-1), 0, 1)

    def flat_diffusion(params, rng, images):
        b, h, w, _ = images.shape
        c = built.num_classes
        rows = n_members * n_pred
        k_init, k_loop = jax.random.split(rng)
        imgs = _tile_rows(images, rows)
        x_init = jax.random.normal(k_init, (rows * b, h, w, c), images.dtype)

        def model_fn(x_with_im, t, step_key):
            return _apply(params, x_with_im, t, dropout_key=step_key).logits

        x0 = built.diffusion.sample_loop(
            model_fn, x_init, imgs, num_steps, rng=k_loop,
            sampler_type=sampler_type, model_takes_rng=True,
        )
        return x0.reshape(n_members, n_pred, b, h, w, c)

    def flat_prob_unet(params, rng, images):
        b, h, w, _ = images.shape
        kd, ks = jax.random.split(rng)
        out = _apply(params, _tile_rows(images, n_members), dropout_key=kd)

        def _tile_pred(p):
            tiled = jnp.broadcast_to(p[None], (n_pred,) + p.shape)
            return tiled.reshape((n_pred * p.shape[0],) + p.shape[1:])

        feats = _tile_pred(out.features)
        prior = jax.tree.map(_tile_pred, out.prior)
        z = sample_latent(prior, ks)
        logits = _apply(params, feats, z, dropout_key=kd, method=module.decode)
        c = logits.shape[-1]
        probs = jax.nn.softmax(logits, axis=-1)
        return jnp.moveaxis(probs.reshape(n_pred, n_members, b, h, w, c), 0, 1)

    flat_fn = {
        "softmax": flat_softmax,
        "ssn": flat_ssn,
        "diffusion": flat_diffusion,
        "prob_unet": flat_prob_unet,
    }[au]
    use_flat = (
        spec.flat_fold
        and spec.member_mode in ("single", "dropout")
        and not spec.same_dropout
        and static_chunk is None
    ) or fold_module is not None
    generative_count = (
        (n_members if member_is_generative else 0) + spec.external_generative_members
    )
    multiple_generative = generative_count > 1 and not spec.direct_au
    split_into_singletons = member_is_generative and not multiple_generative

    if split_into_singletons:
        meta = SamplerMeta(
            n_groups=n_members * samples_per_member,
            samples_per_group=1,
            group_is_generative=tuple([built.is_generative] * (n_members * samples_per_member)),
        )
    else:
        meta = SamplerMeta(
            n_groups=n_members,
            samples_per_group=samples_per_member,
            # softmax+TTA groups are tagged non-generative (test_2D.py:1246)
            group_is_generative=tuple([built.is_generative] * n_members),
        )

    def sampler(params, images, rng):
        if use_flat:
            return _finalize(flat_fn(params, rng, images))
        chunk = _resolve_chunk(params)
        member_keys = jax.random.split(rng, n_members)
        if spec.member_mode == "params_stack":
            if chunk:
                groups = jax.lax.map(
                    lambda args: group_fn(args[0], args[1], images),
                    (params, member_keys), batch_size=min(chunk, n_members),
                )
            else:
                groups = jax.vmap(group_fn, in_axes=(0, 0, None))(params, member_keys, images)
        elif spec.member_mode == "dropout":
            if chunk:
                groups = jax.lax.map(
                    lambda k: group_fn(params, k, images),
                    member_keys, batch_size=min(chunk, n_members),
                )
            else:
                groups = jax.vmap(group_fn, in_axes=(None, 0, None))(params, member_keys, images)
        else:
            groups = group_fn(params, member_keys[0], images)[None]
        return _finalize(groups)

    def _finalize(groups):
        # groups: (M, S, B, H, W, C)
        if spec.discretize:
            c = groups.shape[-1]
            groups = jax.nn.one_hot(jnp.argmax(groups, axis=-1), c, dtype=groups.dtype)

        if split_into_singletons:
            # each sample becomes its own singleton group (test_2D.py:1160-1180)
            m, s = groups.shape[0], groups.shape[1]
            groups = groups.reshape(m * s, 1, *groups.shape[2:])

        group_means = jnp.mean(groups, axis=1)
        mean = jnp.mean(group_means, axis=0)
        return PredictionStack(groups, group_means, mean)

    sampler.meta = meta
    return sampler
