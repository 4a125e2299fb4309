"""Core: configuration, PRNG discipline, mesh/sharding helpers, checkpoints."""

from .config import ExperimentConfig, load_config

__all__ = ["ExperimentConfig", "load_config"]
