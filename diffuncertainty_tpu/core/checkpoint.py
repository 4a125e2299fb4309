"""Self-describing checkpoints (orbax) + the experiment directory contract.

The reference embeds hydra hparams inside Lightning ckpts so inference can
rebuild everything from the file alone (``test_utils.py:523-736``), tags
results ``e{epoch}[_ema]``, and keeps ``last.ckpt`` plus scheduled epoch
snapshots (``callbacks.py:15-183``). Here:

- a checkpoint is an orbax directory of array pytrees plus ``config.json``
  (the full ExperimentConfig dict) and ``meta.json`` (epoch, kind);
- ``last`` holds full state (params, ema, swag, opt_state); scheduled
  snapshots hold weights-only (EMA-only when configured, mirroring
  ``only_save_ema``).
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from .config import ExperimentConfig


def checkpoint_epoch_tag(epoch: int, ema: bool) -> str:
    """``global_utils/checkpoint_format.py:8-26`` result-dir naming."""
    return f"e{epoch}_ema" if ema else f"e{epoch}"


def save_checkpoint(
    path: str | Path,
    state: dict[str, Any],
    config: ExperimentConfig,
    *,
    epoch: int,
    kind: str = "full",
) -> Path:
    """Write ``state`` (a dict of array pytrees; None values dropped)."""
    path = Path(path).resolve()
    if path.exists():
        shutil.rmtree(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    state = {k: v for k, v in state.items() if v is not None}
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, state)
    (path / "config.json").write_text(json.dumps(config.to_dict(), indent=2))
    (path / "meta.json").write_text(json.dumps({"epoch": epoch, "kind": kind}))
    return path


def load_checkpoint(path: str | Path) -> tuple[dict[str, Any], ExperimentConfig, dict]:
    """Read (state, config, meta) from a checkpoint directory.

    Leaves are restored as host numpy arrays: callers place them on whatever
    device/mesh the current run uses (resume does ``jnp.asarray``; inference
    shards stacked members). Restoring with the checkpoint's recorded
    shardings instead would be unsafe across topology changes — the exact
    case a self-describing checkpoint must survive.
    """
    path = Path(path).resolve()
    with ocp.PyTreeCheckpointer() as ckptr:
        meta_tree = ckptr.metadata(path).item_metadata
        restore_args = jax.tree.map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta_tree
        )
        state = ckptr.restore(
            path, args=ocp.args.PyTreeRestore(restore_args=restore_args)
        )
    config = ExperimentConfig.from_dict(json.loads((path / "config.json").read_text()))
    meta = json.loads((path / "meta.json").read_text())
    return state, config, meta


def is_checkpoint_dir(path: str | Path) -> bool:
    return (Path(path) / "config.json").exists() and (Path(path) / "meta.json").exists()


def scheduled_epochs(
    *,
    max_epochs: int,
    use_linear: bool,
    linear_freq: int,
    use_exponential: bool,
    exponent_base: float,
    exponential_start: int,
) -> list[int]:
    """Epochs at which to snapshot (``callbacks.py:15-132``)."""
    epochs: set[int] = set()
    if use_linear and linear_freq > 0:
        e = linear_freq
        while e < max_epochs:
            epochs.add(e)
            e += linear_freq
    if use_exponential and exponential_start > 0 and exponent_base > 1:
        e = float(exponential_start)
        while e < max_epochs:
            epochs.add(int(round(e)))
            e *= exponent_base
    return sorted(epochs)
