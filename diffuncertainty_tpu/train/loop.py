"""Training loop: jitted step, EMA, SWAG collection, checkpoints, val.

Replaces the reference's pytorch-lightning Trainer + LightningExperiment +
callbacks (``main.py``, ``lightning_experiment.py``, ``callbacks.py``) with a
plain JAX loop:

- one jitted ``train_step`` fusing forward, loss, grad, clip-by-global-norm,
  AdamW, and the EMA lerp (decay-average with first-step copy, matching
  ``_ema_avg_fn`` at ``lightning_experiment.py:312-321``);
- SWAG snapshots at epoch end over the reference schedule
  (``start = (max_epochs-1) - freq*(K-1)``, every ``freq``,
  ``:340-359, 369-372``);
- scheduled small checkpoints (linear/exponential epochs, EMA-only when
  configured) + ``last`` full state each validation epoch
  (``callbacks.py:15-183``);
- graceful wall-clock stop (``callbacks.py:186-226``);
- data parallelism: batches sharded over the mesh "data" axis; with
  replicated params, XLA inserts the gradient all-reduce.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.checkpoint import save_checkpoint, scheduled_epochs
from ..core.config import ExperimentConfig
from ..metrics.dice import dice_bin, dice_multiclass_micro
from ..models import swag as swag_lib
from ..models.factory import BuiltModel, build_model
from ..parallel.distributed import global_batch, is_primary
from ..parallel.mesh import make_mesh, shard_batch, replicate
from .losses import make_loss_fn


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any  # {"params": ...}
    opt_state: Any
    ema_params: Any  # None when EMA disabled
    model_state: Any = None  # {"batch_stats": ...} for BN backbones, else {}


class Trainer:
    def __init__(
        self,
        cfg: ExperimentConfig,
        built: BuiltModel | None = None,
        workdir: str | Path | None = None,
    ):
        self.cfg = cfg
        self.built = built or build_model(cfg)
        self.workdir = Path(
            workdir
            if workdir is not None
            else Path(cfg.save_dir) / cfg.auto_exp_name / str(cfg.version or "version_0")
        )
        self.workdir.mkdir(parents=True, exist_ok=True)
        # self-describing run dir (reference main.py:138-143 hparams.yaml export)
        try:
            import yaml

            (self.workdir / "hparams.yaml").write_text(
                yaml.safe_dump(cfg.to_dict(), sort_keys=False)
            )
        except Exception:  # noqa: BLE001 — best-effort, never block training
            pass
        self.mesh = make_mesh(tuple(cfg.trainer.mesh_shape), tuple(cfg.trainer.mesh_axis_names)) \
            if int(np.prod(cfg.trainer.mesh_shape)) > 1 else None

        self.tx = self._build_tx(cfg.trainer.lr_schedule_total_steps or None)
        self.track_ema = cfg.ema.track_ema_weights
        self.ema_decay = cfg.ema.ema_decay
        from ..data.augment import TrainAugmentConfig

        aug = cfg.data.augmentations
        self.aug_cfg = TrainAugmentConfig(
            hflip_p=aug.hflip_p,
            rotation_limit=aug.rotation_limit,
            scale_limit=tuple(aug.scale_limit),
            gauss_noise_var_limit=tuple(aug.gauss_noise_var_limit),
            gauss_noise_p=aug.gauss_noise_p,
            mean=tuple(aug.mean),
            std=tuple(aug.std),
            augment_mult=aug.augment_mult,
        )

        swag_cfg = cfg.eu_method.swag
        self.swag_enabled = swag_cfg.enabled
        self.swag_state = None
        if self.swag_enabled:
            freq = max(1, swag_cfg.snapshot_frequency)
            span = freq * max(swag_cfg.max_snapshots - 1, 0)
            self.swag_start_epoch = max(cfg.trainer.max_epochs - 1 - span, 0)
            self.swag_freq = freq
        self._jitted_steps: dict[bool, Any] = {}
        self._jitted_eval = None
        self._metrics_file = self.workdir / "metrics.jsonl"
        self._logger = None  # built lazily so tests constructing many
        # Trainers don't spawn TB writers they never log to

    def _build_tx(self, total_steps: int | None):
        cfg = self.cfg
        lr: Any = cfg.trainer.learning_rate
        if cfg.trainer.lr_schedule != "none":
            # optax schedules count optimizer STEPS; when the caller gave no
            # explicit total, fit() derives epochs * steps_per_epoch and
            # rebuilds before the first step (reference passes
            # datamodule.max_steps() with interval="step")
            total = total_steps or max(cfg.trainer.max_epochs, 1)
            if cfg.trainer.lr_schedule == "linear":
                lr = optax.linear_schedule(cfg.trainer.learning_rate, 0.0, total)
            elif cfg.trainer.lr_schedule == "cosine":
                lr = optax.cosine_decay_schedule(cfg.trainer.learning_rate, total)
            else:
                raise ValueError(cfg.trainer.lr_schedule)
        return optax.chain(
            optax.clip_by_global_norm(cfg.trainer.gradient_clip_val),
            optax.adamw(lr, weight_decay=cfg.trainer.weight_decay),
        )

    # ---- state ------------------------------------------------------------

    def init_state(self, rng: jax.Array, sample_batch: dict) -> TrainState:
        built = self.built
        img = jnp.asarray(sample_batch["image"][:1])
        rngs = {"params": rng}
        if built.needs_dropout_rng:
            rngs["dropout"] = jax.random.fold_in(rng, 1)
        if built.au_type == "diffusion":
            x = jnp.zeros(img.shape[:-1] + (built.module.in_channels,), img.dtype)
            variables = built.module.init(rngs, x, jnp.zeros((1,)))
        elif built.au_type == "prob_unet":
            segm = jnp.zeros(img.shape[:-1] + (built.num_classes,), img.dtype)
            variables = built.module.init(
                rngs, img, segm, built.module.init_input_latent(1)
            )
        elif built.has_batch_stats:
            variables = built.module.init(rngs, img, True)
        else:
            variables = built.module.init(rngs, img)
        params = {"params": variables["params"]}
        model_state = {k: v for k, v in variables.items() if k != "params"}
        opt_state = self.tx.init(params)
        ema = jax.tree.map(jnp.copy, params) if self.track_ema else None
        if self.swag_enabled:
            self.swag_state = swag_lib.init(
                params, self.cfg.eu_method.swag.max_snapshots,
                diag_only=self.cfg.eu_method.swag.diag_only,
            )
        state = TrainState(jnp.zeros((), jnp.int32), params, opt_state, ema, model_state)
        if self.mesh is not None:
            state = replicate(state, self.mesh)
        return state

    # ---- jitted step -------------------------------------------------------

    def _make_step(self, ssn_mean_only: bool):
        loss_fn = make_loss_fn(
            self.built,
            ignore_index=self.cfg.data.ignore_index,
            n_aleatoric_samples=self.cfg.model.n_aleatoric_samples,
            ssn_mean_only=ssn_mean_only,
        )
        if self.cfg.trainer.remat:
            # rematerialize the forward under grad: trade FLOPs for HBM
            loss_fn = jax.checkpoint(loss_fn, static_argnums=())
        ema_decay = self.ema_decay
        track_ema = self.track_ema
        aug_cfg = self.aug_cfg

        def step(state: TrainState, batch, rng, sched):
            from ..data.augment import augment_batch, normalize_batch

            k_aug, rng = jax.random.split(rng)
            images, seg = batch["image"], batch["seg"]
            if seg.ndim == 3:
                # single-rater training: full augment pipeline (geometric +
                # noise + normalize), the reference TRAIN compose
                images, seg = augment_batch(aug_cfg, k_aug, images, seg)
            else:
                # multi-rater targets: normalize only (geometric warps of the
                # rater stack are not applied)
                images = normalize_batch(images, aug_cfg)
            batch = {"image": images, "seg": seg}
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, batch, rng, sched, state.model_state
            )
            updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            if track_ema:
                w = jnp.where(state.step == 0, 0.0, ema_decay)
                ema = jax.tree.map(
                    lambda e, p: w * e + (1.0 - w) * p, state.ema_params, params
                )
            else:
                ema = state.ema_params
            aux = dict(aux)
            model_state = aux.pop("model_state", state.model_state)
            aux["grad_norm"] = optax.global_norm(grads)
            return TrainState(state.step + 1, params, opt_state, ema, model_state), aux

        return jax.jit(step, donate_argnums=(0,))

    def _get_step(self, ssn_mean_only: bool):
        if ssn_mean_only not in self._jitted_steps:
            self._jitted_steps[ssn_mean_only] = self._make_step(ssn_mean_only)
        return self._jitted_steps[ssn_mean_only]

    # ---- epoch-level schedule ---------------------------------------------

    def _sched_for_epoch(self, epoch: int) -> dict:
        sched = {}
        if self.built.au_type == "prob_unet":
            spec = self.built.prob_unet_spec
            sched["beta"] = jnp.asarray(spec.beta_at_epoch(epoch), jnp.float32)
        return sched

    def _maybe_collect_swag(self, params, epoch: int) -> bool:
        if not self.swag_enabled:
            return False
        if int(self.swag_state.n_models) >= self.cfg.eu_method.swag.max_snapshots:
            return False
        if epoch < self.swag_start_epoch:
            return False
        if (epoch - self.swag_start_epoch) % self.swag_freq != 0:
            return False
        self.swag_state = jax.jit(
            swag_lib.collect, static_argnames=("max_num_models",)
        )(self.swag_state, params, max_num_models=self.cfg.eu_method.swag.max_snapshots)
        return True

    # ---- validation --------------------------------------------------------

    def _mean_prediction(self, params, images, rng):
        """Deterministic-ish mean prediction per AU type for val dice."""
        built = self.built
        if built.au_type in ("softmax", "ssn"):
            out = built.module.apply(
                params, images,
                rngs={"dropout": rng} if built.needs_dropout_rng else None,
            )
            return jax.nn.softmax(out.logits, axis=-1)
        if built.au_type == "prob_unet":
            rngs = {"dropout": rng} if built.needs_dropout_rng else None
            out = built.module.apply(params, images, rngs=rngs)
            logits = built.module.apply(
                params, out.features, out.prior.mu, rngs=rngs,
                method=built.module.decode,
            )
            return jax.nn.softmax(logits, axis=-1)
        # diffusion: one sampled trajectory
        def model_fn(x, t, key):
            rngs = {"dropout": key} if built.needs_dropout_rng else None
            return built.module.apply(params, x, t, rngs=rngs).logits

        b, h, w, _ = images.shape
        k1, k2 = jax.random.split(rng)
        x_init = jax.random.normal(k1, (b, h, w, built.num_classes), images.dtype)
        x0 = built.diffusion.sample_loop(
            model_fn, x_init, images, self.built.diffusion_num_steps, rng=k2,
            sampler_type=self.built.diffusion_sampler_type, model_takes_rng=True,
        )
        return x0

    def evaluate(self, state: TrainState, val_loader, *, epoch: int, use_ema: bool = False) -> dict:
        base = state.ema_params if (use_ema and self.track_ema) else state.params
        params = {**base, **(state.model_state or {})}
        if self._jitted_eval is None:
            loss_fn = make_loss_fn(
                self.built,
                ignore_index=self.cfg.data.ignore_index,
                n_aleatoric_samples=self.cfg.model.n_aleatoric_samples,
                ssn_mean_only=False,
            )
            # jit once; rebuilding per epoch would recompile the full (for
            # diffusion: scanned) program every validation pass
            self._jitted_eval = (jax.jit(loss_fn), jax.jit(self._mean_prediction))
        loss_j, pred_j = self._jitted_eval
        from ..data.augment import normalize_batch
        losses, dices, geds = [], [], []
        rng = jax.random.key(self.cfg.seed + 1000 + epoch)
        num_classes = self.built.num_classes
        ged_ign = (
            self.cfg.data.ignore_index
            if self.cfg.data.ignore_index is not None and self.cfg.data.ignore_index >= 0
            else None
        )
        for i, batch in enumerate(val_loader):
            rng, k1, k2 = jax.random.split(rng, 3)
            jbatch = {
                "image": normalize_batch(jnp.asarray(batch["image"]), self.aug_cfg),
                "seg": jnp.asarray(batch["seg"]),
            }
            if self.mesh is not None:
                # validation runs data-sharded like the train step; the
                # per-image metrics below gather to host either way
                jbatch = global_batch(jbatch, self.mesh)
            sched = self._sched_for_epoch(epoch)
            loss, _ = loss_j(
                {"params": params["params"]}, jbatch, k1, sched, state.model_state
            )
            probs = pred_j(params, jbatch["image"], k2)
            pred_idx = jnp.argmax(probs, axis=-1)
            seg = jbatch["seg"]
            if seg.ndim == 3:
                seg = seg[:, None]
            if num_classes == 2:
                d = dice_bin(pred_idx[:, None], seg)  # (B, R)
            else:
                d = dice_multiclass_micro(
                    pred_idx[:, None], seg, num_classes,
                    ignore_index=self.cfg.data.ignore_index,
                )
            valid = np.asarray(batch["valid"])
            losses.append(float(loss))
            dices.extend(np.asarray(jnp.mean(d, axis=1))[valid].tolist())
            # per-image multi-rater GED of the (single) mean prediction
            # (reference validation_step :855-891)
            if seg.shape[1] > 1 and num_classes == 2:
                from ..metrics.ged import ged_binary

                for b_idx in np.nonzero(valid)[0]:
                    g = ged_binary(probs[b_idx][None], seg[b_idx], ignore_index=ged_ign)
                    geds.append(float(g["ged"]))
        out = {"val_loss": float(np.mean(losses)), "val_dice": float(np.mean(dices))}
        if geds:
            out["val_ged"] = float(np.mean(geds))
        return out

    # ---- fit ---------------------------------------------------------------

    def fit(self, train_loader, val_loader=None, *, train_eval_loader=None,
            resume_state: TrainState | None = None,
            start_epoch: int = 0) -> TrainState:
        cfg = self.cfg
        t_start = time.time()
        shutdown_after = cfg.ckpt_save_freq.shutdown_timer if cfg.ckpt_save_freq.do_shutdown else None

        if (
            cfg.trainer.lr_schedule != "none"
            and cfg.trainer.lr_schedule_total_steps == 0
            and resume_state is None
        ):
            total = cfg.trainer.max_epochs * max(len(train_loader), 1)
            self.tx = self._build_tx(total)
            self._jitted_steps.clear()

        state = resume_state
        rng = jax.random.key(cfg.seed)
        sched_ckpt_epochs = set(
            scheduled_epochs(
                max_epochs=cfg.trainer.max_epochs,
                use_linear=cfg.ckpt_save_freq.use_linear_saving,
                linear_freq=cfg.ckpt_save_freq.linear_freq,
                use_exponential=cfg.ckpt_save_freq.use_exponential_saving,
                exponent_base=cfg.ckpt_save_freq.exponent_base,
                exponential_start=cfg.ckpt_save_freq.exponential_start,
            )
        )

        for epoch in range(start_epoch, cfg.trainer.max_epochs):
            train_loader.set_epoch(epoch)
            ssn_mean_only = (
                self.built.au_type == "ssn"
                and epoch < self.cfg.model.ssn_pretrain_epochs
            )
            step_fn = self._get_step(ssn_mean_only)
            sched = self._sched_for_epoch(epoch)
            epoch_losses = []
            for batch in train_loader:
                if state is None:
                    state = self.init_state(jax.random.fold_in(rng, 7919), batch)
                rng, step_key = jax.random.split(rng)
                jbatch = {
                    "image": jnp.asarray(batch["image"]),
                    "seg": jnp.asarray(batch["seg"]),
                }
                if self.mesh is not None:
                    # single-process: device_put with batch sharding;
                    # multi-host: per-process local rows assembled into one
                    # globally-sharded array (parallel/distributed.py)
                    jbatch = global_batch(jbatch, self.mesh)
                state, aux = step_fn(state, jbatch, step_key, sched)
                epoch_losses.append(aux["loss"])

            train_loss = float(jnp.mean(jnp.stack(epoch_losses)))
            log = {"epoch": epoch, "train_loss": train_loss}

            self._maybe_collect_swag(state.params, epoch)

            if val_loader is not None and (epoch + 1) % cfg.trainer.val_every_n_epochs == 0:
                log.update(self.evaluate(state, val_loader, epoch=epoch))
                if train_eval_loader is not None:
                    tm = self.evaluate(state, train_eval_loader, epoch=epoch)
                    log.update({f"train_eval_{k.removeprefix('val_')}": v
                                for k, v in tm.items()})
            self._log(log)

            if epoch in sched_ckpt_epochs:
                self._save_scheduled(state, epoch)
            last_freq = max(1, cfg.ckpt_save_freq.last_every_n_epochs)
            saved_last = (epoch + 1) % last_freq == 0 or epoch == cfg.trainer.max_epochs - 1
            if saved_last:
                self._save_last(state, epoch)

            if shutdown_after is not None and time.time() - t_start > shutdown_after:
                if not saved_last:  # don't lose the tail when stopping early
                    self._save_last(state, epoch)
                self._log({"epoch": epoch, "event": "graceful_shutdown"})
                break
        if self._logger is not None:
            # tensorboardX writes through an async queue; close so the last
            # epoch's scalars are on disk when fit returns (re-created lazily
            # if anything logs afterwards)
            self._logger.close()
            self._logger = None
        return state

    # ---- checkpoint/save helpers -------------------------------------------

    def _ckpt_dir(self) -> Path:
        return self.workdir / "checkpoints"

    def _full_state_dict(self, state: TrainState) -> dict:
        ms = state.model_state or {}
        d = {
            # merge non-param collections (batch_stats) so checkpoints stay
            # drop-in variable dicts for module.apply at inference time
            "params": {**state.params, **ms},
            "opt_state": state.opt_state,
            "step": state.step,
        }
        if state.ema_params is not None:
            d["ema_params"] = {**state.ema_params, **ms}
        if self.swag_state is not None:
            d["swag_state"] = {
                "n_models": self.swag_state.n_models,
                "mean": self.swag_state.mean,
                "sq_mean": self.swag_state.sq_mean,
                **({"dev": self.swag_state.dev} if self.swag_state.dev is not None else {}),
            }
        return d

    def _save_last(self, state: TrainState, epoch: int) -> None:
        if not is_primary():
            return  # multi-host: params are replicated; process 0 writes
        save_checkpoint(
            self._ckpt_dir() / "last", self._full_state_dict(state), self.cfg,
            epoch=epoch, kind="full",
        )

    def _save_scheduled(self, state: TrainState, epoch: int) -> None:
        if not is_primary():
            return
        ms = state.model_state or {}
        if self.cfg.ema.only_save_ema and state.ema_params is not None:
            payload = {"ema_params": {**state.ema_params, **ms}}
            kind = "ema_only"
        else:
            payload = {"params": {**state.params, **ms}}
            if state.ema_params is not None:
                payload["ema_params"] = {**state.ema_params, **ms}
            kind = "weights"
        save_checkpoint(
            self._ckpt_dir() / f"epoch_{epoch:06d}", payload, self.cfg,
            epoch=epoch, kind=kind,
        )

    def _log(self, record: dict) -> None:
        if not is_primary():
            return  # multi-host: metric records are identical on every process
        if self._logger is None:
            from ..utils.loggers import MetricLogger

            self._logger = MetricLogger(self.workdir, self.cfg.trainer.loggers)
        self._logger.log(record)
