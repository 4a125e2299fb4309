"""Uncertainty-inference orchestration (the reference Tester, re-designed).

Reference: ``test_2D.py:291-1459``. Differences by design:

- EU member expansion produces a *stacked parameter pytree* (deep ensembles:
  stack checkpoints; SWAG: ``swag.sample_members``; masked sub-ensembles:
  materialized members), fed to one vmapped sampler — not a Python list of
  modules hopped between CPU and GPU (``:711-727``);
- sampling, C2 heatmaps, dice/GED/NLL all run inside two jitted programs per
  batch (sampler + batch_metrics); the host only does npy IO and JSON/PNG
  writing;
- checkpoints are self-describing (config embedded), so the runner needs only
  paths + runtime flags, like the reference CLI;
- multi-chip: a (data, member) ``jax.sharding.Mesh`` over all visible devices
  (auto-sized, or ``InferenceConfig.mesh_shape``) shards batches over ``data``
  and stacked-member parameter pytrees over ``member``; XLA inserts the
  collectives. Single chip runs the identical program unsharded. Numerical
  equivalence across partitionings is pinned by ``tests/test_parallel.py``
  (sampler level) and ``tests/test_infer.py`` (whole-job outputs).
"""

from __future__ import annotations

import dataclasses
import time
from pathlib import Path
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.checkpoint import load_checkpoint
from ..core.config import ExperimentConfig
from ..data.augment import TrainAugmentConfig, normalize_batch
from ..data.dataset import MultiRaterDataset
from ..data.loader import BatchLoader
from ..models import swag as swag_lib
from ..models.factory import BuiltModel, build_model
from ..parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate,
    shard_member_stack,
)
from ..sampling.sampler import SamplerSpec, make_sampler
from ..sampling.tta import TTAConfig
from .batch_metrics import make_batch_metrics
from .results import ResultsWriter, result_split_dir


@dataclasses.dataclass
class InferenceConfig:
    n_pred: int = 10
    n_models: int = 10
    tta: bool = False
    same_dropout: bool = False
    discretize: bool = False
    direct_au: bool = False
    use_ema: bool = False
    batch_size: int = 16
    seed: int = 123
    metrics_compute: tuple[str, ...] = ("dice", "ged", "ged_bma")
    save_likelihood: bool = True
    save_outputs: bool = True
    skip_existing: bool = False
    diffusion_num_steps: int | None = None
    diffusion_sampler: str | None = None
    swag_scale: float = 1.0
    swag_blockwise: bool = False
    data_input_dir: str | None = None
    save_dir: str | None = None
    version: str = "version_0"
    # member execution strategy, forwarded to SamplerSpec.member_chunk:
    # "auto" (default) lets the sampler pick; an int N bounds peak activation
    # memory by running members in chunks of N instead of the fully-fused
    # flat-fold program. Needed when members x n_pred x batch rows through an
    # attention stage exceed HBM (e.g. 4 members x 8 pred x batch 16 at a
    # 1024-token bottleneck = 8 GB fp32 attention matrices on one v5e).
    member_chunk: int | str | None = "auto"
    # (data, member) mesh over all visible devices. None -> auto: single
    # device runs unsharded; multiple devices get the largest usable
    # (data, member) factorization (see _resolve_mesh). [1, 1] forces
    # single-device execution regardless of visible devices.
    mesh_shape: tuple[int, int] | None = None


def _resolve_mesh(
    mesh_shape: tuple[int, int] | None,
    batch_size: int,
    stacked_members: Sequence[int],
) -> "jax.sharding.Mesh | None":
    """Build the inference (data, member) mesh.

    The reference expands EU members host-side and loops them over one GPU
    (``test_2D.py:605-727``); here the same axes become mesh dimensions:
    batches shard over ``data`` and stacked-member parameter pytrees over
    ``member`` (numerical equivalence proven in ``tests/test_parallel.py``).

    Auto heuristic (mesh_shape None, >1 device): among factorizations
    (d, m) of <= device_count with ``batch_size % d == 0`` and m == 1 or
    m dividing EVERY stacked source's member count (a heterogeneous job may
    carry several stacked sources and each one's stack must split evenly over
    the member axis), pick the one using the most devices, tie-broken toward
    the larger data axis (batch work exists for every source; member work
    only for stacked ones). Returns None when only one device is usable
    (explicit [1,1], or nothing divides).
    """

    def _member_ok(m: int) -> bool:
        if m == 1:
            return True
        return bool(stacked_members) and all(n % m == 0 for n in stacked_members)

    n_dev = jax.device_count()
    if mesh_shape is not None:
        d, m = int(mesh_shape[0]), int(mesh_shape[1])
        if d * m <= 1:
            return None
        if batch_size % d != 0:
            raise ValueError(
                f"batch_size {batch_size} not divisible by mesh data axis {d}")
        if not _member_ok(m):
            raise ValueError(
                f"mesh member axis {m} must divide every stacked source's "
                f"member count (have {list(stacked_members)})")
        return make_mesh((d, m), ("data", "member"))
    if n_dev <= 1:
        return None
    best = (1, 1)
    for d in range(1, n_dev + 1):
        if batch_size % d != 0:
            continue
        m_max = n_dev // d
        for m in range(1, m_max + 1):
            if not _member_ok(m):
                continue
            if (d * m, d) > (best[0] * best[1], best[0]):
                best = (d, m)
    if best == (1, 1):
        return None
    return make_mesh(best, ("data", "member"))


class UncertaintyInference:
    """Load checkpoint(s), expand EU members, run fused prediction+metrics."""

    def __init__(self, checkpoint_paths: Sequence[str | Path], icfg: InferenceConfig):
        self.icfg = icfg
        if not checkpoint_paths:
            raise ValueError("at least one checkpoint path required")
        states, configs, metas = [], [], []
        for p in checkpoint_paths:
            s, c, m = load_checkpoint(p)
            states.append(s)
            configs.append(c)
            metas.append(m)
        self.cfg: ExperimentConfig = configs[0]
        self.epoch = int(metas[0]["epoch"])
        self.built: BuiltModel = build_model(self.cfg)

        def pick_params(state: dict) -> Any:
            if icfg.use_ema:
                if "ema_params" not in state:
                    raise ValueError("use_ema requested but checkpoint has no ema_params")
                return state["ema_params"]
            if "params" in state:
                return state["params"]
            # ema-only scheduled snapshot
            return state["ema_params"]

        params_list = [pick_params(s) for s in states]

        def make_spec(member_mode, n_members, force_singletons):
            aug = self.cfg.data.augmentations
            return SamplerSpec(
                n_pred=icfg.n_pred,
                n_members=n_members,
                member_mode=member_mode,
                tta=icfg.tta,
                tta_config=TTAConfig(
                    hflip_p=aug.hflip_p,
                    rotation_limit=aug.rotation_limit,
                    scale_limit=tuple(aug.scale_limit),
                    augment_mult=aug.augment_mult if aug.augment_mult > 0 else 1.0,
                ),
                same_dropout=icfg.same_dropout,
                discretize=icfg.discretize,
                direct_au=icfg.direct_au or force_singletons,
                diffusion_num_steps=icfg.diffusion_num_steps,
                diffusion_sampler=icfg.diffusion_sampler,
                member_chunk=icfg.member_chunk,
            )

        def expand_eu(built_i, cfg_i, state_i, params_i):
            """One checkpoint -> (params, member_mode, n_members)."""
            eu = built_i.eu_type
            if eu in ("swag", "swag_diag"):
                swag_raw = state_i.get("swag_state")
                if swag_raw is None:
                    raise ValueError("SWAG checkpoint lacks swag_state")
                swag_state = swag_lib.SwagState(
                    n_models=jnp.asarray(swag_raw["n_models"]),
                    mean=swag_raw["mean"],
                    sq_mean=swag_raw["sq_mean"],
                    dev=swag_raw.get("dev"),
                )
                drawn = swag_lib.sample_members(
                    swag_state,
                    jax.random.key(icfg.seed),
                    icfg.n_models,
                    max_num_models=cfg_i.eu_method.swag.max_snapshots,
                    scale=icfg.swag_scale,
                    use_low_rank=(eu == "swag"),
                    blockwise=icfg.swag_blockwise,
                    var_clamp=cfg_i.eu_method.swag.min_variance,
                )
                return drawn, "params_stack", icfg.n_models
            if eu == "dropout":
                return params_i, "dropout", icfg.n_models
            return params_i, "single", 1

        # multi-checkpoint jobs: the stacked fast path requires identical
        # architecture (au_type + leaf SHAPES, not just tree structure) AND
        # trivial EU on every member — a SWAG/dropout checkpoint needs its
        # own per-source expansion even when the param tree matches
        def _shape_key(c, p):
            return (
                c.model.au_type,
                c.eu_method.name,
                str(jax.tree.map(lambda x: tuple(x.shape), p)),
            )

        all_trivial_eu = all(
            build_model(c).eu_type in ("none", "ensemble") for c in configs
        ) if len(params_list) > 1 else True
        structures = {_shape_key(c, p) for c, p in zip(configs, params_list)}
        homogeneous_ensemble = (
            len(params_list) > 1 and len(structures) == 1 and all_trivial_eu
        )

        if len(params_list) > 1:
            classes = {c.network.out_channels for c in configs}
            if len(classes) != 1:
                raise ValueError(
                    f"ensemble checkpoints disagree on num_classes: {sorted(classes)}"
                )

        self.sources: list[dict] = []
        if homogeneous_ensemble:
            stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *params_list)
            spec = make_spec("params_stack", len(params_list), False)
            self.sources.append({"built": self.built, "params": stacked, "spec": spec})
        elif len(params_list) == 1:
            p, mode, n = expand_eu(self.built, self.cfg, states[0], params_list[0])
            spec = make_spec(mode, n, False)
            self.sources.append({"built": self.built, "params": p, "spec": spec})
        else:
            # heterogeneous ensemble (reference ensemble grouping of mixed
            # checkpoints, test_utils.py:296-376): one sampler per source,
            # groups concatenated. Group sizes must stay rectangular across
            # sources: when every member is an n_pred sampler (generative or
            # TTA'd softmax) and there is more than one such member, keep
            # per-member groups like the reference's multiple_generative
            # mode; any plain-softmax member in the mix forces per-sample
            # singleton groups instead (the reference's torch.stack would
            # simply crash on that mix).
            builts = [build_model(c) for c in configs]
            expanded = [
                expand_eu(b, c, s, p)
                for b, c, s, p in zip(builts, configs, states, params_list)
            ]
            member_counts = [n for _, _, n in expanded]
            member_sizes = [
                icfg.n_pred if (b.is_generative or (b.au_type == "softmax" and icfg.tta)) else 1
                for b in builts
            ]
            gen_members = sum(
                n for n, sz in zip(member_counts, member_sizes) if sz > 1
            )
            uniform_npred = len(set(member_sizes)) == 1 and member_sizes[0] > 1
            keep_member_groups = uniform_npred and gen_members > 1 and not icfg.direct_au
            for built_i, (p, mode, n), sz in zip(builts, expanded, member_sizes):
                spec = make_spec(mode, n, not keep_member_groups)
                if keep_member_groups:
                    # sibling generative members count toward the global
                    # multiple_generative decision inside each sampler
                    own = n if sz > 1 else 0
                    spec = dataclasses.replace(
                        spec, external_generative_members=gen_members - own
                    )
                self.sources.append({"built": built_i, "params": p, "spec": spec})

        # production mesh: batches shard over "data", stacked members over
        # "member" (the sharded-equivalence contract of tests/test_parallel.py)
        stacked_counts = [
            src["spec"].n_members
            for src in self.sources
            if src["spec"].member_mode == "params_stack"
        ]
        self.mesh = _resolve_mesh(icfg.mesh_shape, icfg.batch_size, stacked_counts)
        if self.mesh is not None:
            member_dim = self.mesh.shape["member"]
            for src in self.sources:
                if src["spec"].member_mode == "params_stack" and member_dim > 1:
                    src["params"] = shard_member_stack(src["params"], self.mesh)
                else:
                    src["params"] = replicate(src["params"], self.mesh)

        member_sharded = self.mesh is not None and self.mesh.shape["member"] > 1
        for src in self.sources:
            spec = src["spec"]
            if spec.member_chunk == "auto" and spec.member_mode == "params_stack":
                # resolve from the runner's own mesh decision: a member axis
                # sharded over the mesh must stay vmapped; unsharded stacks on
                # TPU run fastest as a member-scan (SamplerSpec.member_chunk)
                resolved = (
                    None
                    if member_sharded
                    else (1 if jax.default_backend() == "tpu" else None)
                )
                src["spec"] = spec = dataclasses.replace(spec, member_chunk=resolved)
            src["sampler"] = make_sampler(src["built"], src["spec"])
            src["jit_sampler"] = jax.jit(src["sampler"])

        # combined static meta across sources (sizes equal by construction)
        from ..sampling.sampler import SamplerMeta

        metas_ = [src["sampler"].meta for src in self.sources]
        assert len({m.samples_per_group for m in metas_}) == 1
        self.meta = SamplerMeta(
            n_groups=sum(m.n_groups for m in metas_),
            samples_per_group=metas_[0].samples_per_group,
            group_is_generative=tuple(
                g for m in metas_ for g in m.group_is_generative
            ),
        )
        # backwards-compatible single-source accessors
        self.spec = self.sources[0]["spec"]
        self.sampler = self.sources[0]["sampler"]
        self.params = self.sources[0]["params"]
        self._jit_sampler = self.sources[0]["jit_sampler"]

        aug = self.cfg.data.augmentations
        self.aug_cfg = TrainAugmentConfig(
            mean=tuple(aug.mean), std=tuple(aug.std)
        )
        self.metrics_fn = make_batch_metrics(
            num_classes=self.built.num_classes,
            ignore_index=self.cfg.data.ignore_index,
            meta=self.meta,
            compute_dice="dice" in icfg.metrics_compute,
            compute_ged="ged" in icfg.metrics_compute,
            compute_ged_bma="ged_bma" in icfg.metrics_compute,
            compute_likelihood=icfg.save_likelihood,
        )

    def _shard_images(self, images):
        """Shard the batch axis over the mesh's data dimension (no-op when
        unmeshed or the batch does not divide, e.g. raw-prediction singles)."""
        if self.mesh is None or images.shape[0] % self.mesh.shape["data"] != 0:
            return images
        return jax.device_put(images, batch_sharding(self.mesh, images.ndim))

    def _sample_stack(self, images, key):
        """Run all sources and concatenate their group stacks."""
        images = self._shard_images(images)
        if len(self.sources) == 1:
            return self._jit_sampler(self.params, images, key)
        from ..sampling.sampler import PredictionStack

        stacks = [
            src["jit_sampler"](src["params"], images, jax.random.fold_in(key, i))
            for i, src in enumerate(self.sources)
        ]
        groups = jnp.concatenate([s.groups for s in stacks], axis=0)
        group_means = jnp.concatenate([s.group_means for s in stacks], axis=0)
        return PredictionStack(groups, group_means, jnp.mean(group_means, axis=0))

    # ---- data -------------------------------------------------------------

    def _dataset(self, split: str) -> MultiRaterDataset:
        data_dir = self.icfg.data_input_dir or self.cfg.data.data_input_dir
        splits_path = self.cfg.data.splits_path or (
            Path(data_dir) / "splits" / self.cfg.data.split_name / "firstCycle" / "splits.pkl"
        )
        return MultiRaterDataset(
            splits_path, data_dir, split=split,
            data_fold_id=self.cfg.data.data_fold_id,
            return_all_raters=True,
        )

    # ---- run --------------------------------------------------------------

    def split_dir(self, split: str) -> Path:
        save_dir = self.icfg.save_dir or self.cfg.save_dir
        return result_split_dir(
            save_dir, self.cfg.auto_exp_name, self.icfg.n_pred,
            self.icfg.version, self.epoch, self.icfg.use_ema, split,
        )

    def run_split(self, split: str) -> dict:
        icfg = self.icfg
        out_dir = self.split_dir(split)
        if icfg.skip_existing and (out_dir / "metrics.json").exists():
            return {"skipped": True, "split": split}
        ds = self._dataset(split)
        loader = BatchLoader(ds, icfg.batch_size, shuffle=False)
        rng = jax.random.key(icfg.seed)
        n_images = 0
        t0 = time.time()
        # context manager: aborts the async write pool if the loop raises,
        # flushes (join + metrics.json) on success
        with ResultsWriter(out_dir, binary=self.built.num_classes == 2) as writer:
            n_images = self._run_split_loop(loader, writer, rng)
        elapsed = time.time() - t0
        return {
            "split": split,
            "n_images": n_images,
            "seconds": elapsed,
            "images_per_sec": n_images / elapsed if elapsed > 0 else float("nan"),
            "out_dir": str(out_dir),
        }

    def _run_split_loop(self, loader, writer, rng) -> int:
        icfg = self.icfg
        n_images = 0
        for batch in loader:
            rng, key = jax.random.split(rng)
            images = normalize_batch(jnp.asarray(batch["image"]), self.aug_cfg)
            stack = self._sample_stack(images, key)
            gt = self._shard_images(jnp.asarray(batch["seg"]))
            results = self.metrics_fn(stack, gt, jnp.asarray(batch["num_raters"]))
            results = jax.device_get(results)
            valid = np.asarray(batch["valid"])
            gt_np = np.asarray(batch["seg"])
            for i in np.nonzero(valid)[0]:
                image_id = batch["image_id"][i]
                dataset_name = batch["dataset"][i]
                metrics = {
                    k: float(np.asarray(results[k][i]))
                    for k in ("dice", "ged", "ged_bma", "max_dice_pred",
                              "max_dice_gt", "major_dice")
                    if k in results
                }
                writer.add_metrics(image_id, dataset_name, metrics)
                if icfg.save_likelihood and "mean_NLL" in results:
                    n_r = int(batch["num_raters"][i])
                    rec = {
                        "gt_model_NLL": np.asarray(results["gt_model_NLL"][i])[:n_r].tolist(),
                        "gt_NLL": np.asarray(results["gt_NLL"][i])[:n_r].tolist(),
                        "mean_NLL": float(results["mean_NLL"][i]),
                    }
                    if "gen_NLL" in results:
                        rec["gen_NLL"] = float(results["gen_NLL"][i])
                    writer.add_likelihood(image_id, dataset_name, rec)
                if icfg.save_outputs:
                    ign = self.cfg.data.ignore_index
                    ignore_mask = (
                        (gt_np[i][0] == ign) if ign is not None and ign != 0 else None
                    )
                    writer.save_prediction(
                        image_id,
                        np.asarray(results["group_idx"][i]),
                        np.asarray(results["mean_idx"][i]),
                        ignore_mask,
                    )
                    heatmaps = {
                        k: np.asarray(v[i]) for k, v in results["heatmaps"].items()
                    }
                    writer.save_uncertainty(image_id, heatmaps)
                n_images += 1
        return n_images

    def run(self, splits: Sequence[str]) -> list[dict]:
        return [self.run_split(s) for s in splits]

    # ---- raw prediction access (notebooks / visualization) ----------------

    def collect_raw_predictions(
        self,
        split: str,
        *,
        num_images: int | None = None,
        prefer_nonempty: bool = True,
        seed: int | None = None,
    ) -> dict:
        """Unreduced prediction stacks for a (sampled) subset of a split.

        Reference ``test_2D.py:1299-1430``: seeded random image selection
        with resampling toward images whose raters have the largest label
        area; returns host arrays {image_id, image, gt, groups, mean}.
        """
        ds = self._dataset(split)
        rng = np.random.default_rng(self.icfg.seed if seed is None else seed)
        idxs = np.arange(len(ds))
        if num_images is not None and num_images < len(ds):
            if prefer_nonempty:
                areas = np.array([
                    float(np.sum(ds.load(int(i))["seg"])) for i in idxs
                ])
                order = np.argsort(areas)[::-1]
                pool = order[: max(num_images * 3, num_images)]
                idxs = rng.choice(pool, size=num_images, replace=False)
            else:
                idxs = rng.choice(idxs, size=num_images, replace=False)
        records = []
        key = jax.random.key(self.icfg.seed)
        for i in idxs:
            sample = ds.load(int(i))
            key, sub = jax.random.split(key)
            images = normalize_batch(
                jnp.asarray(sample["image"][None]), self.aug_cfg
            )
            stack = self._sample_stack(images, sub)
            records.append({
                "image_id": sample["image_id"],
                "image": np.asarray(sample["image"]),
                "gt": np.asarray(sample["seg"]),
                "groups": np.asarray(stack.groups[:, :, 0]),  # (G,S,H,W,C)
                "mean": np.asarray(stack.mean[0]),
            })
        return {"split": split, "records": records,
                "group_is_generative": self.meta.group_is_generative}
