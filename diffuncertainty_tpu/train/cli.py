"""Training CLI.

Usage (mirrors the reference's hydra launcher, ``uncertainty_modeling/main.py``):

    python -m diffuncertainty_tpu.train data=lidc64 network=unet16 \
        model=diffusion eu_method=dropout trainer.max_epochs=320 \
        data.data_input_dir=/path/to/lidc64

Group selections (``data= network= model= eu_method=``) pick YAML files from
``diffuncertainty_tpu/configs/<group>/``; every other ``a.b=c`` token is a
dotted override. Env overrides ``DATASET_LOCATION`` / ``EXPERIMENT_LOCATION``
relocate data/save dirs (``main.py:95-105``); ``resume_from=<ckpt>`` restores
full state; ``ckpt_path=<ckpt>`` loads weights only.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import jax
import numpy as np

from ..core.checkpoint import load_checkpoint
from ..core.config import ExperimentConfig, apply_overrides, load_config
from ..data.dataset import MultiRaterDataset
from ..data.loader import BatchLoader
from .loop import Trainer, TrainState


def parse_args(argv: list[str]) -> tuple[ExperimentConfig, dict]:
    groups = {"data": "lidc64", "network": "unet16", "model": "softmax", "eu_method": "none"}
    special: dict = {"resume_from": None, "ckpt_path": None}
    overrides = []
    for tok in argv:
        if "=" not in tok:
            raise SystemExit(f"Arguments must be key=value, got '{tok}'")
        key, val = tok.split("=", 1)
        if key in groups:
            groups[key] = val
        elif key in special:
            special[key] = val
        else:
            overrides.append(tok)
    cfg = load_config(**groups, overrides=overrides)

    # env-var relocation (reference main.py:95-105)
    if os.environ.get("DATASET_LOCATION"):
        cfg = apply_overrides(
            cfg, [f"data.data_input_dir={os.environ['DATASET_LOCATION']}/{cfg.data.name}"]
        )
    if os.environ.get("EXPERIMENT_LOCATION"):
        cfg = apply_overrides(cfg, [f"save_dir={os.environ['EXPERIMENT_LOCATION']}"])
    # cluster job id becomes the run version when unset (main.py:104-105)
    if cfg.version is None and os.environ.get("LSB_JOBID"):
        cfg = apply_overrides(cfg, [f"version={os.environ['LSB_JOBID']}"])
    return cfg, special


def _subset_dataset(ds: MultiRaterDataset, keep: set[int]) -> None:
    """Restrict a dataset index in place to the given positions."""
    ds.image_paths = [p for i, p in enumerate(ds.image_paths) if i in keep]
    ds.label_paths = [p for i, p in enumerate(ds.label_paths) if i in keep]
    ds.image_ids = [p for i, p in enumerate(ds.image_ids) if i in keep]
    ds.sample_datasets = [p for i, p in enumerate(ds.sample_datasets) if i in keep]


def build_loaders(cfg: ExperimentConfig):
    data_dir = Path(cfg.data.data_input_dir)
    splits_path = cfg.data.splits_path or (
        data_dir / "splits" / cfg.data.split_name / "firstCycle" / "splits.pkl"
    )
    train_ds = MultiRaterDataset(
        splits_path, data_dir, split="train",
        data_fold_id=cfg.data.data_fold_id,
        return_all_raters=False, single_rater=cfg.data.single_rater,
    )
    from ..data.dataset import load_splits

    fold = load_splits(splits_path)[cfg.data.data_fold_id]
    if "val" in fold:
        val_ds = MultiRaterDataset(
            splits_path, data_dir, split="val",
            data_fold_id=cfg.data.data_fold_id, return_all_raters=True,
        )
    else:
        # no explicit val split: carve validation_ratio off the train set
        # deterministically (reference BaseDataModule validation_ratio)
        val_ds = MultiRaterDataset(
            splits_path, data_dir, split="train",
            data_fold_id=cfg.data.data_fold_id, return_all_raters=True,
        )
        n = len(train_ds)
        n_val = max(1, int(round(n * cfg.data.validation_ratio)))
        rng = np.random.default_rng(cfg.seed)
        val_idx = set(rng.choice(n, n_val, replace=False).tolist())
        _subset_dataset(val_ds, val_idx)
        _subset_dataset(train_ds, set(range(n)) - val_idx)
    # multi-host: each process loads only its strided shard of every epoch
    # (parallel/distributed.py). Single-process this is None -> full data.
    # batch_size is HOST-LOCAL: the global batch is batch_size * n_processes.
    from ..parallel.distributed import loader_shard

    shard = loader_shard()
    train_loader = BatchLoader(
        train_ds, cfg.data.batch_size, shuffle=True, seed=cfg.seed,
        drop_last=True, process_shard=shard,
    )
    val_loader = BatchLoader(val_ds, cfg.data.val_batch_size, process_shard=shard)
    train_eval_loader = None
    if cfg.data.evaluate_training_data:
        # mirror a RANDOM val-sized train subset for train-metric tracking
        # (reference BaseDataModule: np.random.permutation subset,
        # torch_dataloader.py:348)
        mirror = MultiRaterDataset(
            splits_path, data_dir, split="train",
            data_fold_id=cfg.data.data_fold_id, return_all_raters=True,
        )
        mirror_rng = np.random.default_rng((cfg.seed, 17))
        train_id_set = set(train_ds.image_ids)
        candidates = [i for i, iid in enumerate(mirror.image_ids) if iid in train_id_set]
        n_keep = min(max(1, len(val_ds)), len(candidates))
        keep_idx = set(
            int(i) for i in mirror_rng.choice(candidates, n_keep, replace=False)
        )
        _subset_dataset(mirror, keep_idx)
        train_eval_loader = BatchLoader(mirror, cfg.data.val_batch_size)
    return train_loader, val_loader, train_eval_loader


def main(argv: list[str] | None = None) -> None:
    # multi-host rendezvous FIRST (before any backend touch): no-op unless a
    # coordinator is configured (DU_COORDINATOR / managed-pod autodetection)
    from ..parallel.distributed import initialize_distributed, process_info

    if initialize_distributed():
        idx, count = process_info()
        print(f"distributed: process {idx}/{count}, "
              f"{jax.device_count()} global devices")
    from ..utils import enable_compile_cache

    enable_compile_cache()
    cfg, special = parse_args(argv if argv is not None else sys.argv[1:])
    np.random.seed(cfg.seed)
    print(f"Experiment: {cfg.auto_exp_name} (seed {cfg.seed})")
    trainer = Trainer(cfg)
    train_loader, val_loader, train_eval_loader = build_loaders(cfg)

    resume_state = None
    start_epoch = 0
    if special["resume_from"]:
        state_d, _, meta = load_checkpoint(special["resume_from"])
        import jax.numpy as jnp

        # checkpoints merge non-param collections (batch_stats) into the
        # saved variables dict; split them back out for the TrainState
        variables = state_d["params"]
        params = {"params": variables["params"]}
        model_state = {k: v for k, v in variables.items() if k != "params"}
        ema = state_d.get("ema_params")
        if ema is not None:
            ema = {"params": ema["params"]}
        resume_state = TrainState(
            step=jnp.asarray(state_d["step"]),
            params=params,
            opt_state=state_d["opt_state"],
            ema_params=ema,
            model_state=model_state,
        )
        start_epoch = int(meta["epoch"]) + 1
        print(f"Resuming from epoch {start_epoch}")
    elif special["ckpt_path"]:
        state_d, _, _ = load_checkpoint(special["ckpt_path"])
        sample = next(iter(val_loader))
        resume_state = trainer.init_state(jax.random.key(cfg.seed), sample)
        resume_state = resume_state._replace(
            params=state_d.get("params", state_d.get("ema_params"))
        )
        print("Loaded weights (fresh optimizer state)")

    trainer.fit(train_loader, val_loader, train_eval_loader=train_eval_loader,
                resume_state=resume_state, start_epoch=start_epoch)
    print(f"Done. Checkpoints at {trainer.workdir / 'checkpoints'}")


if __name__ == "__main__":
    main()
