"""Training-metric logger backends: JSONL (canonical), TensorBoard, W&B.

The reference logs to TensorBoard by default with optional Weights & Biases
(``/root/reference/uncertainty_modeling/configs/standard.yaml:29-42``). Here
the JSONL stream (``metrics.jsonl``) is the canonical, always-on record the
evaluation/plotting stack consumes; TensorBoard mirrors every scalar via
tensorboardX so standard TB tooling works, and W&B is attached when the
package is importable and requested.
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Any, Optional, Sequence

logger = logging.getLogger(__name__)


class MetricLogger:
    """Multiplex scalar records to the configured backends.

    ``log(record)`` takes a flat dict; non-numeric values are kept in the
    JSONL stream but skipped by TB/W&B. ``step`` defaults to the record's
    ``step`` (or ``epoch``) field.
    """

    def __init__(
        self,
        workdir: str | Path,
        backends: Sequence[str] = ("jsonl", "tensorboard"),
        *,
        echo: bool = True,
        wandb_init: Optional[dict] = None,
    ):
        self.workdir = Path(workdir)
        self.workdir.mkdir(parents=True, exist_ok=True)
        self.backends = tuple(backends)
        self.echo = echo
        self._jsonl_path = self.workdir / "metrics.jsonl"
        self._tb = None
        self._wandb = None
        self._step = 0

        if "tensorboard" in self.backends:
            try:
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(logdir=str(self.workdir / "tb"))
            except Exception as exc:  # pragma: no cover - missing backend
                logger.warning("tensorboard backend unavailable: %s", exc)
        if "wandb" in self.backends:
            try:  # pragma: no cover - wandb not installed in CI image
                import wandb

                self._wandb = wandb.init(dir=str(self.workdir), **(wandb_init or {}))
            except Exception as exc:
                logger.warning("wandb backend unavailable: %s", exc)

    def log(self, record: dict[str, Any], step: int | None = None) -> None:
        if step is None:
            step = int(record.get("step", record.get("epoch", self._step)))
        self._step = max(self._step, step + 1)

        if "jsonl" in self.backends:
            with open(self._jsonl_path, "a") as f:
                f.write(json.dumps(record) + "\n")
        scalars = {
            k: float(v) for k, v in record.items()
            if isinstance(v, (int, float)) and not isinstance(v, bool)
            and k not in ("step", "epoch")  # these become the TB x-axis
        }
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, v, global_step=step)
            # records arrive at epoch cadence; flush so readers (and crashed
            # runs) always see the latest scalars
            self._tb.flush()
        if self._wandb is not None:  # pragma: no cover
            self._wandb.log(scalars, step=step)
        if self.echo:
            printable = ", ".join(
                f"{k}={v:.5g}" if isinstance(v, float) else f"{k}={v}"
                for k, v in record.items()
            )
            print(f"[train] {printable}")

    def flush(self) -> None:
        if self._tb is not None:
            self._tb.flush()

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
        if self._wandb is not None:  # pragma: no cover
            self._wandb.finish()
