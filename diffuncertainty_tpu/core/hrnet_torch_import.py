"""PyTorch HRNet checkpoint importer (ImageNet-pretrained or reference ckpts).

Maps reference ``HighResolutionNet`` state dicts
(``uncertainty_modeling/models/hrnet_module.py:408-838`` / the HRNetV2
seg_hrnet layout its ImageNet weights use) onto the Flax ``models/hrnet.py``
tree. Conv kernels transpose OIHW -> HWIO; BatchNorm splits into params
(weight->scale, bias) and batch_stats (running_mean/var).

The reference's ``load_weights`` tolerates shape mismatches (pretrained heads
vs task heads); ``import_hrnet_state_dict(strict=False)`` reproduces that:
mismatched or missing entries are skipped and reported.
"""

from __future__ import annotations

import numpy as np

from ..models.hrnet import HRNet


def _conv2d(w):
    return np.transpose(w, (2, 3, 1, 0))


def build_hrnet_mapping(model: HRNet) -> list[tuple[str, tuple[str, ...], object]]:
    """(torch key, (collection, *path), transform) entries."""
    spec = model.spec
    entries: list[tuple[str, tuple[str, ...], object]] = []

    def conv(tp, fp):
        entries.append((f"{tp}.weight", ("params",) + tuple(fp.split("/")) + ("kernel",), _conv2d))

    def conv_biased(tp, fp):
        conv(tp, fp)
        entries.append((f"{tp}.bias", ("params",) + tuple(fp.split("/")) + ("bias",), None))

    def bn(tp, fp):
        entries.append((f"{tp}.weight", ("params",) + tuple(fp.split("/")) + ("scale",), None))
        entries.append((f"{tp}.bias", ("params",) + tuple(fp.split("/")) + ("bias",), None))
        entries.append((f"{tp}.running_mean", ("batch_stats",) + tuple(fp.split("/")) + ("mean",), None))
        entries.append((f"{tp}.running_var", ("batch_stats",) + tuple(fp.split("/")) + ("var",), None))

    # stem
    conv("conv1", "stem_conv1")
    bn("bn1", "stem_bn1")
    conv("conv2", "stem_conv2")
    bn("bn2", "stem_bn2")

    # layer1: 4 bottlenecks; block 0 has a downsample
    for b in range(4):
        base = f"layer1.{b}"
        fp = f"layer1_block{b}"
        for c in ("conv1", "conv2", "conv3"):
            conv(f"{base}.{c}", f"{fp}/{c}")
        for n in ("bn1", "bn2", "bn3"):
            bn(f"{base}.{n}", f"{fp}/{n}")
        if b == 0:
            conv(f"{base}.downsample.0", f"{fp}/down_conv")
            bn(f"{base}.downsample.1", f"{fp}/down_bn")

    # transitions + stages
    prev_channels = [4 * spec.stage1_channels]
    for stage_idx, channels in enumerate(spec.stage_channels):
        t = stage_idx + 1
        for i, ch in enumerate(channels):
            if i < len(prev_channels):
                if prev_channels[i] != ch:
                    conv(f"transition{t}.{i}.0", f"t{stage_idx}_{i}_conv")
                    bn(f"transition{t}.{i}.1", f"t{stage_idx}_{i}_bn")
            else:  # new branch: single stride-2 conv chain element
                conv(f"transition{t}.{i}.0.0", f"t{stage_idx}_{i}_conv")
                bn(f"transition{t}.{i}.0.1", f"t{stage_idx}_{i}_bn")
        n_branches = len(channels)
        for m in range(spec.num_modules[stage_idx]):
            mod_t = f"stage{stage_idx + 2}.{m}"
            mod_f = f"stage{stage_idx + 2}_mod{m}"
            for i in range(n_branches):
                for blk in range(spec.num_blocks):
                    bt = f"{mod_t}.branches.{i}.{blk}"
                    bf = f"{mod_f}/branch{i}_block{blk}"
                    conv(f"{bt}.conv1", f"{bf}/conv1")
                    bn(f"{bt}.bn1", f"{bf}/bn1")
                    conv(f"{bt}.conv2", f"{bf}/conv2")
                    bn(f"{bt}.bn2", f"{bf}/bn2")
            if n_branches > 1:
                for i in range(n_branches):
                    for j in range(n_branches):
                        if j == i:
                            continue
                        if j > i:
                            conv(f"{mod_t}.fuse_layers.{i}.{j}.0", f"{mod_f}/fuse{i}_{j}_conv")
                            bn(f"{mod_t}.fuse_layers.{i}.{j}.1", f"{mod_f}/fuse{i}_{j}_bn")
                        else:
                            for k in range(i - j):
                                conv(
                                    f"{mod_t}.fuse_layers.{i}.{j}.{k}.0",
                                    f"{mod_f}/fuse{i}_{j}_down{k}_conv",
                                )
                                bn(
                                    f"{mod_t}.fuse_layers.{i}.{j}.{k}.1",
                                    f"{mod_f}/fuse{i}_{j}_down{k}_bn",
                                )
        prev_channels = list(channels)

    # heads
    conv_biased("last_layer.0", "last_conv1")
    bn("last_layer.1", "last_bn")
    conv_biased("last_layer.3", "last_conv2")
    if model.ssn:
        conv_biased("cov_factor_conv.0", "ssn_factor_conv1")
        bn("cov_factor_conv.1", "ssn_factor_bn")
        conv_biased("cov_factor_conv.3", "ssn_factor_conv2")
    return entries


def import_hrnet_state_dict(
    model: HRNet,
    variables: dict,
    state_dict: dict[str, np.ndarray],
    *,
    strict: bool = True,
) -> dict:
    """Fill ``variables`` ({"params", "batch_stats"}) with torch weights."""
    import jax.numpy as jnp

    out = _copy(variables)
    consumed: set[str] = set()
    skipped: list[str] = []
    for torch_key, path, transform in build_hrnet_mapping(model):
        node = out
        ok = True
        for k in path[:-1]:
            if not isinstance(node, dict) or k not in node:
                ok = False
                break
            node = node[k]
        ok = ok and isinstance(node, dict) and path[-1] in node
        have = torch_key in state_dict
        if not ok or not have:
            if strict and ok != have:
                raise KeyError(
                    f"Mapping mismatch: torch '{torch_key}' present={have}, "
                    f"flax '{'/'.join(path)}' present={ok}"
                )
            if have:
                skipped.append(torch_key)
            continue
        w = np.asarray(state_dict[torch_key])
        if transform is not None:
            w = transform(w)
        expect = node[path[-1]].shape
        if tuple(w.shape) != tuple(expect):
            if strict:
                raise ValueError(
                    f"Shape mismatch {torch_key} -> {'/'.join(path)}: {w.shape} vs {expect}"
                )
            skipped.append(torch_key)
            continue
        node[path[-1]] = jnp.asarray(w)
        consumed.add(torch_key)

    if strict:
        unused = {
            k for k in state_dict
            if k not in consumed and "num_batches_tracked" not in k
        }
        if unused:
            raise KeyError(f"Unmapped torch parameters: {sorted(unused)[:8]} ...")
    return out


def _copy(d):
    if isinstance(d, dict):
        return {k: _copy(v) for k, v in d.items()}
    return d
