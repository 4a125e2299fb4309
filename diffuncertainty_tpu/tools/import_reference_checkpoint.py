"""Convert a reference Lightning ``.ckpt`` into this framework's checkpoint.

Usage:
    python -m diffuncertainty_tpu.tools.import_reference_checkpoint \
        --ckpt /path/to/last.ckpt --out saves/imported/checkpoints/last

Reads the torch checkpoint (CPU), translates the embedded hydra
``hyper_parameters`` into an ``ExperimentConfig`` (the self-describing-
checkpoint contract, ``test_utils.py:523-736``), maps the DiffUnet weights
through ``core/torch_import.py`` (raw and EMA), and writes an orbax
checkpoint the inference runner consumes directly.
"""

from __future__ import annotations

import argparse
from pathlib import Path
from typing import Any

import jax
import numpy as np

from ..core.checkpoint import save_checkpoint
from ..core.config import ExperimentConfig, apply_overrides
from ..core.torch_import import import_torch_state_dict, strip_prefixes
from ..data.augment import check_geometric_transform_support
from ..models.factory import build_model


def translate_hparams(hparams: dict) -> ExperimentConfig:
    """Best-effort reference-hydra-hparams -> ExperimentConfig translation."""
    cfg = ExperimentConfig()
    model_cfg = {}
    net = (
        hparams.get("model", {}).get("cfg", {}).get("MODEL")
        or hparams.get("network", {}).get("cfg", {}).get("MODEL")
        or {}
    )
    net = {str(k).lower(): v for k, v in dict(net).items()}
    overrides = []

    def ov(key, value):
        overrides.append(f"{key}={value}")

    if net:
        if "in_channels" in net:
            ov("network.in_channels", net["in_channels"])
        if "out_channels" in net:
            ov("network.out_channels", net["out_channels"])
            ov("data.num_classes", net["out_channels"])
        for src, dst in [
            ("model_channels", "network.model_channels"),
            ("num_middle_res_blocks", "network.num_middle_res_blocks"),
            ("final_act", "network.final_act"),
            ("num_heads", "network.num_heads"),
            ("num_heads_upsample", "network.num_heads_upsample"),
            ("use_scale_shift_norm", "network.use_scale_shift_norm"),
            ("new_upsample_method", "network.new_upsample_method"),
            ("one_skip_per_reso", "network.one_skip_per_reso"),
            ("mlp_attn", "network.mlp_attn"),
            ("act", "network.act"),
            ("dropout", "network.dropout"),
        ]:
            if src in net:
                ov(dst, net[src])
        for src, dst in [
            ("num_res_blocks", "network.num_res_blocks"),
            ("channel_mult", "network.channel_mult"),
            ("attention_resolutions", "network.attention_resolutions"),
        ]:
            if src in net:
                ov(dst, str(list(net[src])).replace(" ", ""))
        if net.get("diffusion"):
            ov("model.au_type", "diffusion")
            # reference stores in_channels BEFORE the x_t concat
        elif net.get("ssn"):
            ov("model.au_type", "ssn")
            if "ssn_rank" in net:
                ov("model.ssn_rank", net["ssn_rank"])
        if net.get("swag"):
            ov("eu_method.name", "swag")
            ov("eu_method.swag.enabled", "true")
    data = hparams.get("data", {})
    if isinstance(data, dict):
        for src, dst in [
            ("name", "data.name"),
            ("num_classes", "data.num_classes"),
            ("ignore_index", "data.ignore_index"),
            ("data_input_dir", "data.data_input_dir"),
        ]:
            if src in data:
                ov(dst, data[src])
        aug = data.get("augmentations")
        if isinstance(aug, dict):
            # guard: geometric transforms outside {flip, rotate, scale} in
            # the training pipeline would be silently dropped by the TTA
            # knob sampler — reject them instead (test_2D.py:56-73 whitelist)
            check_geometric_transform_support(
                aug.get("TRAIN"), context="reference data.augmentations.TRAIN"
            )
            for src, dst in [
                ("rotation_limit", "data.augmentations.rotation_limit"),
                ("gauss_noise_p", "data.augmentations.gauss_noise_p"),
                ("height", "data.augmentations.height"),
                ("width", "data.augmentations.width"),
                ("augment_mult", "data.augmentations.augment_mult"),
            ]:
                if src in aug:
                    ov(dst, aug[src])
            for src, dst in [
                ("scale_limit", "data.augmentations.scale_limit"),
                ("gauss_noise_var_limit", "data.augmentations.gauss_noise_var_limit"),
                ("mean", "data.augmentations.mean"),
                ("std", "data.augmentations.std"),
            ]:
                if src in aug:
                    ov(dst, str(list(aug[src])).replace(" ", ""))
            hflip_p = _find_transform_param(aug.get("TRAIN"), "HorizontalFlip", "p")
            if hflip_p is not None:
                ov("data.augmentations.hflip_p", hflip_p)
    return apply_overrides(cfg, overrides)


def _find_transform_param(transforms, name: str, param: str):
    """First ``{name: {param: ...}}`` value in an albumentations-style tree."""
    if isinstance(transforms, dict):
        for k, body in transforms.items():
            if k == name and isinstance(body, dict) and param in body:
                return body[param]
            hit = _find_transform_param(body, name, param)
            if hit is not None:
                return hit
    elif isinstance(transforms, (list, tuple)):
        for item in transforms:
            hit = _find_transform_param(item, name, param)
            if hit is not None:
                return hit
    return None


def convert(
    ckpt_path: str | Path,
    out_path: str | Path,
    config: ExperimentConfig | None = None,
    epoch: int | None = None,
) -> Path:
    import torch

    payload = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    hparams = payload.get("hyper_parameters", {})
    cfg = config or translate_hparams(dict(hparams))
    built = build_model(cfg)
    if type(built.module).__name__ != "DiffUnet":
        raise NotImplementedError(
            "reference checkpoint import currently supports DiffUnet backbones"
        )

    state_dict = payload.get("state_dict", payload)
    raw_np = {
        k: v.detach().numpy() for k, v in strip_prefixes(state_dict, use_ema=False).items()
        if hasattr(v, "detach")
    }

    # init a params skeleton
    import jax.numpy as jnp

    b = 1
    size = 32
    if built.au_type == "diffusion":
        x = jnp.zeros((b, size, size, built.module.in_channels))
        skeleton = built.module.init(jax.random.key(0), x, jnp.zeros((b,)))
    else:
        x = jnp.zeros((b, size, size, built.module.in_channels))
        skeleton = built.module.init(jax.random.key(0), x)

    params = import_torch_state_dict(built.module, skeleton, raw_np)
    state: dict[str, Any] = {"params": params}

    ema_np = {
        k: v.detach().numpy()
        for k, v in strip_prefixes(state_dict, use_ema=True).items()
        if hasattr(v, "detach") and k in raw_np
    }
    if ema_np and any(k.startswith("ema_model.") for k in state_dict):
        state["ema_params"] = import_torch_state_dict(built.module, skeleton, ema_np)
    elif "ema_state_dict" in payload:
        ema_sd = {
            k: v.detach().numpy()
            for k, v in strip_prefixes(payload["ema_state_dict"], use_ema=False).items()
            if hasattr(v, "detach")
        }
        ema_sd = {k[len("module."):] if k.startswith("module.") else k: v for k, v in ema_sd.items()}
        ema_sd.pop("n_averaged", None)
        if ema_sd:
            state["ema_params"] = import_torch_state_dict(built.module, skeleton, ema_sd)

    ep = epoch if epoch is not None else int(payload.get("epoch", 0))
    return save_checkpoint(out_path, state, cfg, epoch=ep, kind="imported")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--epoch", type=int, default=None)
    args = p.parse_args(argv)
    out = convert(args.ckpt, args.out, epoch=args.epoch)
    print(f"Imported -> {out}")


if __name__ == "__main__":
    main()
