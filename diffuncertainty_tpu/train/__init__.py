"""Training runtime: losses, jitted step, EMA, SWAG hooks, checkpoints."""

from .losses import make_loss_fn
from .loop import Trainer, TrainState

__all__ = ["make_loss_fn", "Trainer", "TrainState"]
