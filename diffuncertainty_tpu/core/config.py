"""Typed configuration system with composable groups.

Replaces the reference's Hydra tree (``uncertainty_modeling/configs/``) with
plain dataclasses + YAML group files + dotted CLI overrides. The four groups
survive: ``data`` / ``network`` / ``model`` / ``eu_method``; their YAML files
live in ``diffuncertainty_tpu/configs/<group>/<name>.yaml`` and patch the
defaults exactly like the reference's ``# @package _global_`` files patch
``standard.yaml``.

Configs are round-trippable (``to_dict``/``from_dict``) so checkpoints stay
self-describing like the reference's hparams-in-ckpt contract
(``test_utils.py:523-736``).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any

import yaml

from .specs import DropoutSpec, ProbUnetSpec


# --------------------------------------------------------------------------
# group dataclasses
# --------------------------------------------------------------------------

@dataclasses.dataclass
class NetworkConfig:
    """C0 backbone hyperparameters (mirrors ``configs/network/*.yaml``)."""

    name: str = "unet"
    nickname: str = "unet_s"
    backbone: str = "diff_unet"  # diff_unet | hrnet
    in_channels: int = 3
    out_channels: int = 2  # == num_classes
    model_channels: int = 32
    num_res_blocks: tuple[int, ...] = (2, 2, 2, 2)
    num_middle_res_blocks: int = 2
    channel_mult: tuple[int, ...] = (1, 2, 4, 8)
    attention_resolutions: tuple[int, ...] = (-2, -1)
    num_heads: int = 4
    num_heads_upsample: int = -1
    use_scale_shift_norm: bool = False
    conv_resample: bool = True
    new_upsample_method: bool = False
    one_skip_per_reso: bool = False
    mlp_attn: bool = False
    act: str = "silu"
    final_act: str = "none"
    dropout: float = 0.0
    # HRNet-specific knobs (used when backbone == "hrnet")
    hrnet_width: int = 18
    hrnet_pretrained: str | None = None


@dataclasses.dataclass
class DiffusionConfig:
    """``DIFFUSION_KWARGS`` block (``configs/model/diffusion.yaml``)."""

    schedule_name: str = "cosine"
    input_scale: float = 0.1
    model_pred_type: str = "X"
    weights_type: str = "uniform"
    sampler_type: str = "uniform_low_d"
    var_type: str = "large"
    loss_type: str = "MSE"
    logsnr_min: float = -10.0
    logsnr_max: float = 10.0
    decouple_loss_weights: bool = False


@dataclasses.dataclass
class DiffusionSampling:
    num_steps: int = 10
    sampler: str = "ddpm"


@dataclasses.dataclass
class ModelConfig:
    """C1 prediction-model group."""

    au_type: str = "softmax"  # softmax | ssn | diffusion | prob_unet
    nickname: str = "au=softmax"
    ssn_rank: int = 10
    ssn_eps: float = 1e-5
    ssn_pretrain_epochs: int = 0
    n_aleatoric_samples: int = 10
    diffusion: DiffusionConfig = dataclasses.field(default_factory=DiffusionConfig)
    diffusion_sampling: DiffusionSampling = dataclasses.field(default_factory=DiffusionSampling)
    prob_unet: ProbUnetSpec = dataclasses.field(default_factory=ProbUnetSpec)


@dataclasses.dataclass
class SwagConfig:
    enabled: bool = False
    snapshot_frequency: int = 1
    max_snapshots: int = 20
    min_variance: float = 1e-30
    diag_only: bool = True


@dataclasses.dataclass
class EUConfig:
    """Epistemic-uncertainty group (``configs/eu_method/*.yaml``)."""

    name: str = "none"  # none | dropout | swag | swag_diag | ensemble | subensemble
    nickname: str = "eu=none"
    dropout: DropoutSpec = dataclasses.field(default_factory=DropoutSpec)
    swag: SwagConfig = dataclasses.field(default_factory=SwagConfig)


@dataclasses.dataclass
class AugmentationsConfig:
    """Jittable train-time augmentation pipeline parameters.

    Mirrors the knobs of ``configs/data/lidc64.yaml:augmentations`` that the
    TTA whitelist supports (HFlip / Rotate / RandomScale / pad / crop /
    GaussNoise / Normalize). ``augment_mult`` scales the magnitude keys.
    """

    hflip_p: float = 0.5
    rotation_limit: float = 22.5
    scale_limit: tuple[float, float] = (-0.2, 0.2)
    gauss_noise_var_limit: tuple[float, float] = (0.2, 0.44)
    gauss_noise_p: float = 0.5
    height: int = 64
    width: int = 64
    mean: tuple[float, ...] = (0.485, 0.456, 0.406)
    std: tuple[float, ...] = (0.229, 0.224, 0.225)
    augment_mult: float = 0.0


@dataclasses.dataclass
class DataConfig:
    name: str = "lidc64"
    nickname: str = "lidc64"
    data_input_dir: str = ""
    num_classes: int = 2
    ignore_index: int = -1
    batch_size: int = 64
    val_batch_size: int = 64
    data_fold_id: int = 0
    split_name: str = "ood_aug"
    splits_path: str = ""  # default: {dir}/splits/{split_name}/firstCycle/splits.pkl
    num_raters: int = 4
    single_rater: bool = False
    evaluate_all_raters: bool = True
    evaluate_training_data: bool = True  # mirror a train subset at val time
    validation_ratio: float = 0.1
    augmentations: AugmentationsConfig = dataclasses.field(default_factory=AugmentationsConfig)


@dataclasses.dataclass
class EMAConfig:
    track_ema_weights: bool = True
    only_save_ema: bool = True
    ema_decay: float = 0.999


@dataclasses.dataclass
class CheckpointScheduleConfig:
    use_linear_saving: bool = False
    use_exponential_saving: bool = False
    linear_freq: int = 10
    exponent_base: float = 2.0
    exponential_start: int = 10
    full_last_ckpt: bool = True
    last_every_n_epochs: int = 1  # 'last' checkpoint cadence. Saving pulls
    # the full train state device->host; on the tunneled chip that transfer
    # dominates short epochs, so bulk jobs raise this. The final epoch always
    # saves regardless.
    shutdown_timer: float = 82800.0
    do_shutdown: bool = False


@dataclasses.dataclass
class TrainerConfig:
    max_epochs: int = 320
    learning_rate: float = 1e-4
    weight_decay: float = 0.0
    gradient_clip_val: float = 0.5
    precision: str = "fp32"  # fp32 | bf16 (compute dtype; params stay fp32)
    remat: bool = False  # jax.checkpoint the loss forward (HBM for FLOPs)
    lr_schedule: str = "none"  # none | linear | cosine (reference lr_scheduler)
    lr_schedule_total_steps: int = 0  # 0 -> derived from epochs * steps/epoch
    val_every_n_epochs: int = 1
    mesh_shape: tuple[int, ...] = (1, 1)  # (data, member) device mesh
    mesh_axis_names: tuple[str, ...] = ("data", "member")
    loggers: tuple[str, ...] = ("jsonl", "tensorboard")  # + "wandb" optional
    # (reference: TB default, wandb opt-in — configs/standard.yaml:29-42;
    # metrics.jsonl is the canonical stream the eval stack reads)


@dataclasses.dataclass
class ExperimentConfig:
    exp_name: str | None = None
    version: str | None = None
    seed: int = 123
    save_dir: str = "./saves"
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    network: NetworkConfig = dataclasses.field(default_factory=NetworkConfig)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    eu_method: EUConfig = dataclasses.field(default_factory=EUConfig)
    trainer: TrainerConfig = dataclasses.field(default_factory=TrainerConfig)
    ema: EMAConfig = dataclasses.field(default_factory=EMAConfig)
    ckpt_save_freq: CheckpointScheduleConfig = dataclasses.field(
        default_factory=CheckpointScheduleConfig
    )

    @property
    def auto_exp_name(self) -> str:
        """``<data>_<network>_<model>_<eu>`` like ``main.py:107-123``."""
        if self.exp_name:
            return self.exp_name
        return "_".join(
            [self.data.nickname, self.network.nickname, self.model.nickname, self.eu_method.nickname]
        )

    def to_dict(self) -> dict:
        return _dataclass_to_dict(self)

    @staticmethod
    def from_dict(d: dict) -> "ExperimentConfig":
        return _merge_into_dataclass(ExperimentConfig(), d)


# --------------------------------------------------------------------------
# dict <-> dataclass plumbing
# --------------------------------------------------------------------------

def _dataclass_to_dict(obj: Any) -> Any:
    if dataclasses.is_dataclass(obj):
        return {f.name: _dataclass_to_dict(getattr(obj, f.name)) for f in dataclasses.fields(obj)}
    if isinstance(obj, (list, tuple)):
        return [_dataclass_to_dict(v) for v in obj]
    return obj


def _coerce(value: Any, template: Any, field_type: Any = None) -> Any:
    if isinstance(template, tuple) or (value is not None and isinstance(value, list) and isinstance(template, tuple)):
        return tuple(value) if value is not None else value
    if isinstance(value, list):
        return tuple(value)
    return value


def _merge_into_dataclass(obj: Any, updates: dict) -> Any:
    """Return a copy of dataclass ``obj`` with (nested) dict updates applied."""
    if not dataclasses.is_dataclass(obj):
        raise TypeError(f"cannot merge into non-dataclass {type(obj)!r}")
    field_map = {f.name: f for f in dataclasses.fields(obj)}
    kwargs: dict[str, Any] = {}
    for key, value in updates.items():
        if key not in field_map:
            raise KeyError(
                f"Unknown config key '{key}' for {type(obj).__name__}; "
                f"valid keys: {sorted(field_map)}"
            )
        current = getattr(obj, key)
        if dataclasses.is_dataclass(current) and isinstance(value, dict):
            kwargs[key] = _merge_into_dataclass(current, value)
        else:
            kwargs[key] = _coerce(value, current)
    return dataclasses.replace(obj, **kwargs)


def _parse_scalar(text: str) -> Any:
    return yaml.safe_load(text)


def apply_overrides(cfg: ExperimentConfig, overrides: list[str]) -> ExperimentConfig:
    """Apply ``a.b.c=value`` dotted overrides (values parsed as YAML)."""
    for item in overrides:
        if "=" not in item:
            raise ValueError(f"Override '{item}' is not of the form key=value")
        path, raw = item.split("=", 1)
        value: Any = _parse_scalar(raw)
        keys = path.split(".")
        nested: dict = {keys[-1]: value}
        for k in reversed(keys[:-1]):
            nested = {k: nested}
        cfg = _merge_into_dataclass(cfg, nested)
    return cfg


# --------------------------------------------------------------------------
# group file loading
# --------------------------------------------------------------------------

def _configs_root() -> Path:
    return Path(__file__).resolve().parent.parent / "configs"


def _load_group_yaml(group: str, name: str) -> dict:
    path = _configs_root() / group / f"{name}.yaml"
    if not path.exists():
        available = sorted(p.stem for p in (_configs_root() / group).glob("*.yaml"))
        raise FileNotFoundError(
            f"No config '{name}' in group '{group}'; available: {available}"
        )
    with open(path) as f:
        return yaml.safe_load(f) or {}


def load_config(
    data: str = "lidc64",
    network: str = "unet16",
    model: str = "softmax",
    eu_method: str = "none",
    overrides: list[str] | None = None,
) -> ExperimentConfig:
    """Compose the four groups over the defaults, then apply overrides.

    Group YAMLs may patch any part of the tree (top-level keys are config
    sections), matching the reference's global-package Hydra semantics —
    e.g. ``eu_method/dropout.yaml`` also patches ``network.dropout``.
    """
    cfg = ExperimentConfig()
    for group, name in (
        ("data", data),
        ("network", network),
        ("model", model),
        ("eu_method", eu_method),
    ):
        patch = _load_group_yaml(group, name)
        cfg = _merge_into_dataclass(cfg, patch)
    if overrides:
        cfg = apply_overrides(cfg, overrides)
    # tie network output channels to the dataset's class count (the
    # ``${oc.select:data.num_classes}`` interpolation in unet yamls)
    if cfg.network.out_channels != cfg.data.num_classes:
        cfg = _merge_into_dataclass(
            cfg, {"network": {"out_channels": cfg.data.num_classes}}
        )
    return cfg
