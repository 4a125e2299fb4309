"""Config spec dataclasses shared by core.config and the model zoo.

Kept dependency-free so ``core.config`` never imports the models package
(breaking the config <-> models import cycle). Model modules re-export these
for their public API.
"""

from __future__ import annotations

import dataclasses
from typing import Any


@dataclasses.dataclass(frozen=True)
class DropoutSpec:
    """Structured MC-dropout configuration.

    Mirrors the normalized dict from
    ``diff_unet2D_module.py:_normalize_dropout_cfg`` (lines 102-139).
    ``probability_values[d]`` is the rate at depth ``d`` (clamped to the last
    entry for deeper stages).
    """

    enabled: bool = False
    probability_values: tuple[float, ...] = (0.0,)
    encoder: bool = True
    mid: bool = True
    decoder: bool = True
    skip_connections: bool = False
    residual_connections: bool = False
    per_block: bool = True

    @staticmethod
    def from_config(cfg: Any, default_rate: float = 0.0) -> "DropoutSpec":
        if cfg is None:
            return DropoutSpec(
                enabled=default_rate > 0.0,
                probability_values=(float(default_rate),),
            )
        if isinstance(cfg, DropoutSpec):
            return cfg
        cfg = {str(k).lower(): v for k, v in dict(cfg).items()}
        enabled = bool(cfg.get("enabled", True))
        prob = cfg.get("probability", default_rate)
        if isinstance(prob, str):
            values = tuple(float(tok) for tok in prob.split(",") if tok.strip())
        elif isinstance(prob, (list, tuple)):
            values = tuple(float(v) for v in prob)
        else:
            values = (float(prob),)
        if not enabled:
            values = (0.0,)
        for v in values:
            if not 0.0 <= v <= 1.0:
                raise ValueError("dropout probabilities must lie in [0, 1]")
        return DropoutSpec(
            enabled=enabled,
            probability_values=values,
            encoder=bool(cfg.get("encoder", True)),
            mid=bool(cfg.get("mid", True)),
            decoder=bool(cfg.get("decoder", True)),
            skip_connections=bool(cfg.get("skip_connections", False)),
            residual_connections=bool(cfg.get("residual_connections", False)),
            per_block=bool(cfg.get("per_block", True)),
        )

    def rate_at_depth(self, depth: int) -> float:
        if not self.probability_values:
            return 0.0
        idx = min(max(0, int(depth)), len(self.probability_values) - 1)
        return float(self.probability_values[idx])

    def stage_rate(self, stage: str, depth: int) -> float:
        on = {"encoder": self.encoder, "mid": self.mid, "decoder": self.decoder}[stage]
        return self.rate_at_depth(depth) if on else 0.0

    @property
    def max_rate(self) -> float:
        return max(self.probability_values) if self.probability_values else 0.0




@dataclasses.dataclass(frozen=True)
class ProbUnetSpec:
    """Config block mirroring ``configs/model/prob_unet.yaml``."""

    latent_dim: int = 6
    beta: float = 10.0
    beta_warmup_epochs: int = 0
    regularizer_coeff: float = 1e-5
    num_fcomb_convs: int = 4
    unet_channel_mult: float = 0.75
    prior_channel_mult: float = 0.5
    posterior_channel_mult: float = 0.5

    def beta_at_epoch(self, epoch: int) -> float:
        if self.beta_warmup_epochs <= 0:
            return self.beta
        progress = min(1.0, max(0.0, float(epoch + 1) / self.beta_warmup_epochs))
        return self.beta * progress


