"""PyTorch DiffUnet checkpoint importer.

Maps a reference ``DiffUnet`` state dict (``diff_unet2D_module.py:141-647``)
onto this framework's Flax parameter tree, enabling the <1e-5 output-parity
requirement against reference checkpoints (BASELINE.md).

The mapping mirrors the constructor bookkeeping exactly: torch
``input_blocks[i]`` / ``middle_block[k]`` / ``output_blocks[i]`` sequences to
flax ``enc{j}_res`` / ``mid{k}_res`` / ``dec{j}_res`` (+ ``_attn``), with
tensor-layout transforms:

- Conv2d ``(O, I, kh, kw)`` -> HWIO ``(kh, kw, I, O)``;
- Conv1d 1x1 (attention qkv/proj) ``(O, I, 1)`` -> Dense ``(I, O)``;
- Linear ``(O, I)`` -> Dense ``(I, O)``;
- GroupNorm weight/bias -> scale/bias.

Inputs are plain numpy arrays keyed by torch names (load the ``.ckpt`` with
``torch.load`` and strip the ``model.`` / ``ema_model.module.`` prefixes as
the reference does, ``test_utils.py:618-668``).
"""

from __future__ import annotations

from typing import Callable

import numpy as np

from ..models.unet import DiffUnet


def _conv2d(w):  # OIHW -> HWIO
    return np.transpose(w, (2, 3, 1, 0))


def _conv1d(w):  # (O, I, 1) -> (I, O)
    return np.transpose(w[..., 0], (1, 0))


def _linear(w):  # (O, I) -> (I, O)
    return np.transpose(w, (1, 0))


def _ident(w):
    return w


class _Mapping:
    def __init__(self):
        self.entries: list[tuple[str, tuple[str, ...], Callable]] = []

    def add(self, torch_key: str, flax_path: str, transform=_ident):
        self.entries.append((torch_key, tuple(flax_path.split(".")), transform))

    def conv(self, torch_prefix: str, flax_name: str):
        self.add(f"{torch_prefix}.weight", f"{flax_name}.kernel", _conv2d)
        self.add(f"{torch_prefix}.bias", f"{flax_name}.bias")

    def conv1d(self, torch_prefix: str, flax_name: str):
        self.add(f"{torch_prefix}.weight", f"{flax_name}.kernel", _conv1d)
        self.add(f"{torch_prefix}.bias", f"{flax_name}.bias")

    def linear(self, torch_prefix: str, flax_name: str):
        self.add(f"{torch_prefix}.weight", f"{flax_name}.kernel", _linear)
        self.add(f"{torch_prefix}.bias", f"{flax_name}.bias")

    def gn(self, torch_prefix: str, flax_name: str):
        self.add(f"{torch_prefix}.weight", f"{flax_name}.scale")
        self.add(f"{torch_prefix}.bias", f"{flax_name}.bias")


def build_mapping(model: DiffUnet) -> _Mapping:
    """Enumerate (torch key, flax path, transform) for a DiffUnet config."""
    m = _Mapping()
    nres = model.num_res_blocks
    if isinstance(nres, int):
        nres = (nres,) * len(model.channel_mult)
    attn_res = model._resolved_attention_resolutions()
    spec = model.dropout_spec
    n_levels = len(model.channel_mult)

    def map_resblock(tp: str, fp: str, stage: str, depth: int):
        rate = spec.stage_rate(stage, depth)
        # in_layers: [GN, act, (dropout), conv]
        conv_idx = 3 if (not spec.per_block and rate > 0.0) else 2
        m.gn(f"{tp}.in_layers.0", f"{fp}.in_norm")
        m.conv(f"{tp}.in_layers.{conv_idx}", f"{fp}.in_conv")
        if model.diffusion:
            m.linear(f"{tp}.emb_layers.1", f"{fp}.emb_proj")
        m.gn(f"{tp}.out_layers.0", f"{fp}.out_norm")
        m.conv(f"{tp}.out_layers.3", f"{fp}.out_conv")
        # skip conv present only when channels change; emitted lazily via
        # optional keys (resolved at import time if both sides have them)
        m.conv(f"{tp}.skip_connection", f"{fp}.skip_conv")

    def map_mlpblock(tp: str, fp: str):
        m.gn(f"{tp}.in_layers.0", f"{fp}.in_norm")
        m.conv(f"{tp}.in_layers.1", f"{fp}.in_conv")
        if model.diffusion:
            m.linear(f"{tp}.emb_layers", f"{fp}.emb_proj")
        m.conv(f"{tp}.out_layers.1", f"{fp}.out_conv")
        m.conv(f"{tp}.skip_connection", f"{fp}.skip_conv")

    def map_attention(tp: str, fp: str):
        m.gn(f"{tp}.norm", f"{fp}.norm")
        m.conv1d(f"{tp}.qkv", f"{fp}.qkv")
        m.conv1d(f"{tp}.proj_out", f"{fp}.proj_out")

    def map_block(tp_seq: str, fp_base: str, stage: str, depth: int):
        """One TimestepEmbedSequential: (MLP|Res)Block [+ Attention]."""
        if depth in attn_res and model.mlp_attn:
            map_mlpblock(f"{tp_seq}.0", f"{fp_base}_mlp")
            map_attention(f"{tp_seq}.1", f"{fp_base}_attn")
        elif depth in attn_res:
            map_resblock(f"{tp_seq}.0", f"{fp_base}_res", stage, depth)
            map_attention(f"{tp_seq}.1", f"{fp_base}_attn")
        else:
            map_resblock(f"{tp_seq}.0", f"{fp_base}_res", stage, depth)

    # ---- time embedding ----
    if model.diffusion:
        m.linear("time_embed.0", "time_embed_0")
        m.linear("time_embed.2", "time_embed_1")

    # ---- encoder ----
    m.conv("input_blocks.0.0", "input_conv")
    torch_i = 1
    block_idx = 0
    resolution = 0
    for level in range(n_levels):
        for _ in range(nres[level]):
            map_block(f"input_blocks.{torch_i}", f"enc{block_idx}", "encoder", resolution)
            torch_i += 1
            block_idx += 1
        if level != n_levels - 1:
            resolution += 1
            dp = f"input_blocks.{torch_i}.0"
            if model.conv_resample:
                m.conv(f"{dp}.op", f"down{resolution}.op")
            m.conv(f"{dp}.channel_mapper", f"down{resolution}.channel_mapper")
            torch_i += 1

    # ---- middle ----
    n_mid = model.num_middle_res_blocks
    if resolution in attn_res:
        for i in range(n_mid - 1):
            if model.mlp_attn:
                map_mlpblock(f"middle_block.{2 * i}", f"mid{i}_mlp")
            else:
                map_resblock(f"middle_block.{2 * i}", f"mid{i}_res", "mid", resolution)
            map_attention(f"middle_block.{2 * i + 1}", f"mid{i}_attn")
        last = 2 * (n_mid - 1)
        if model.mlp_attn:
            map_mlpblock(f"middle_block.{last}", f"mid{n_mid - 1}_mlp")
        else:
            map_resblock(f"middle_block.{last}", f"mid{n_mid - 1}_res", "mid", resolution)
    else:
        for i in range(n_mid):
            map_resblock(f"middle_block.{i}", f"mid{i}_res", "mid", resolution)

    if model.encoder_only:
        return m

    # ---- decoder ----
    block_idx = 0
    for level, mult, n_res in zip(
        reversed(range(n_levels)), model.channel_mult[::-1], nres[::-1]
    ):
        for i in range(n_res + 1):
            depth = resolution
            tp = f"output_blocks.{block_idx}"
            if depth in attn_res and model.mlp_attn:
                map_mlpblock(f"{tp}.0", f"dec{block_idx}_mlp")
                map_attention(f"{tp}.1", f"dec{block_idx}_attn")
                up_pos = 2
            elif depth in attn_res:
                map_resblock(f"{tp}.0", f"dec{block_idx}_res", "decoder", depth)
                map_attention(f"{tp}.1", f"dec{block_idx}_attn")
                up_pos = 2
            else:
                map_resblock(f"{tp}.0", f"dec{block_idx}_res", "decoder", depth)
                up_pos = 1
            if level and i == n_res:
                resolution -= 1
                up = f"{tp}.{up_pos}"
                m.conv(f"{up}.channel_mapper", f"up{resolution}.channel_mapper")
                if model.conv_resample:
                    m.conv(f"{up}.conv", f"up{resolution}.conv")
            block_idx += 1

    # ---- heads ----
    m.gn("out.1", "out_norm")
    m.conv("out.3", "out_conv")
    if model.ssn:
        m.gn("ssn_cov_head.1", "ssn_cov_norm")
        m.conv("ssn_cov_head.3", "ssn_cov_conv")
        m.gn("ssn_factor_head.1", "ssn_factor_norm")
        m.conv("ssn_factor_head.3", "ssn_factor_conv")
    return m


def import_torch_state_dict(
    model: DiffUnet, flax_params: dict, state_dict: dict[str, np.ndarray]
) -> dict:
    """Fill a flax params dict (from ``model.init``) with torch weights.

    Entries present on only one side raise, except optional skip/channel
    convs which exist conditionally on both sides — for those, present-on-
    neither is fine, present-on-one raises.
    """
    import jax.numpy as jnp

    params = flax_params["params"] if "params" in flax_params else flax_params
    out = _deep_copy_structure(params)
    consumed: set[str] = set()
    mapping = build_mapping(model)
    for torch_key, flax_path, transform in mapping.entries:
        node = out
        ok = True
        for k in flax_path[:-1]:
            if k not in node:
                ok = False
                break
            node = node[k]
        ok = ok and flax_path[-1] in node
        have_torch = torch_key in state_dict
        if not ok and not have_torch:
            continue  # optional layer absent on both sides
        if ok != have_torch:
            raise KeyError(
                f"Mapping mismatch: torch '{torch_key}' present={have_torch}, "
                f"flax '{'.'.join(flax_path)}' present={ok}"
            )
        w = transform(np.asarray(state_dict[torch_key]))
        expect = node[flax_path[-1]].shape
        if tuple(w.shape) != tuple(expect):
            raise ValueError(
                f"Shape mismatch for {torch_key} -> {'.'.join(flax_path)}: "
                f"{w.shape} vs {expect}"
            )
        node[flax_path[-1]] = jnp.asarray(w)
        consumed.add(torch_key)

    def _allowed_unused(k: str) -> bool:
        if k.startswith("diffusion_process"):
            return True
        # torch ResBlock/MLPBlock construct emb_layers unconditionally; they
        # are dead parameters when diffusion=False (emb is never passed)
        if not model.diffusion and ".emb_layers" in k:
            return True
        return False

    unused = {k for k in state_dict if k not in consumed and not _allowed_unused(k)}
    if unused:
        raise KeyError(f"Unmapped torch parameters: {sorted(unused)[:8]} ...")
    return {"params": out} if "params" in flax_params else out


def _deep_copy_structure(d):
    if isinstance(d, dict):
        return {k: _deep_copy_structure(v) for k, v in d.items()}
    return d


def strip_prefixes(state_dict: dict, use_ema: bool = False) -> dict:
    """Strip Lightning prefixes like the reference loader
    (``test_utils.py:618-668``): ``model.`` or ``ema_model.module.``."""
    prefix = "ema_model.module." if use_ema else "model."
    out = {}
    for k, v in state_dict.items():
        if k.startswith(prefix):
            out[k[len(prefix):]] = v
    if not out:  # already bare
        out = dict(state_dict)
    # drop AveragedModel bookkeeping
    out.pop("n_averaged", None)
    return out
