"""HRNetV2 segmentation backbone (C0 alternative) in Flax, NHWC.

Re-designed from ``uncertainty_modeling/models/hrnet_module.py:98-838``:
multi-branch high-resolution network — stem of two stride-2 convs, a
Bottleneck stage, then three stages of parallel branches at 1/4..1/32
resolution with SUM fuse layers (stride-2 conv chains downward, 1x1 conv +
bilinear upsample upward, align_corners=False), final 4-branch concat +
1x1 conv head, bilinear upsample to input size. Per-stage MC-dropout flags
and a final-features dropout mirror the reference's structured dropout; the
SSN variant reuses the ``last_layer`` weights for mean and diagonal heads
(a reference quirk kept deliberately, ``:640-688``).

Size presets (``configs/network/hrnet-{s,m}.yaml``): width w in {24, 48},
stage1 bottleneck channels {32, 64}, modules (1, 1, 4, 3), 4 blocks/branch.

BatchNorm uses running statistics (flax ``batch_stats`` collection);
training steps must thread ``mutable=["batch_stats"]``.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .unet import ChannelDropout, MemberConv, UnetOutput

_BN_MOMENTUM = 0.9  # flax convention: torch momentum 0.1


def _bn(name: str, dtype=None):
    # dtype = compute dtype; params/running stats stay fp32 (param_dtype)
    return nn.BatchNorm(
        use_running_average=None, momentum=_BN_MOMENTUM, epsilon=1e-5, name=name,
        dtype=dtype,
    )


def _conv(ch: int, k: int, stride: int = 1, name: str | None = None, dtype=None):
    if k == 1:
        # 1x1 as channel matmul (stride = subsample): identical math and
        # param tree, but safe under member-sharded vmap where XLA
        # miscompiles the grouped-conv lowering of a vmapped 1x1 lax.conv
        # (see MemberConv in models/unet.py)
        return MemberConv(ch, (1, 1), strides=stride, use_bias=False,
                          name=name, dtype=dtype)
    pad = ((k // 2, k // 2), (k // 2, k // 2))
    return nn.Conv(ch, (k, k), strides=(stride, stride), padding=pad,
                   use_bias=False, name=name, dtype=dtype)


def _upsample_to(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Bilinear resize (align_corners=False) to (h, w)."""
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[-1]), method="bilinear")


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dropout: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        residual = x
        dt = self.dtype
        out = _conv(self.planes, 3, self.stride, "conv1", dtype=dt)(x)
        out = _bn("bn1", dtype=dt)(out, use_running_average=not train)
        out = jax.nn.relu(out)
        if self.dropout > 0.0:
            out = ChannelDropout(self.dropout, name="dropout")(out)
        out = _conv(self.planes, 3, 1, "conv2", dtype=dt)(out)
        out = _bn("bn2", dtype=dt)(out, use_running_average=not train)
        if self.stride != 1 or x.shape[-1] != self.planes:
            residual = _conv(self.planes, 1, self.stride, "down_conv", dtype=dt)(x)
            residual = _bn("down_bn", dtype=dt)(residual, use_running_average=not train)
        return jax.nn.relu(out + residual)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    expansion: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        residual = x
        dt = self.dtype
        out = _conv(self.planes, 1, 1, "conv1", dtype=dt)(x)
        out = jax.nn.relu(_bn("bn1", dtype=dt)(out, use_running_average=not train))
        out = _conv(self.planes, 3, self.stride, "conv2", dtype=dt)(out)
        out = jax.nn.relu(_bn("bn2", dtype=dt)(out, use_running_average=not train))
        out = _conv(self.planes * self.expansion, 1, 1, "conv3", dtype=dt)(out)
        out = _bn("bn3", dtype=dt)(out, use_running_average=not train)
        if self.stride != 1 or x.shape[-1] != self.planes * self.expansion:
            residual = _conv(self.planes * self.expansion, 1, self.stride, "down_conv", dtype=dt)(x)
            residual = _bn("down_bn", dtype=dt)(residual, use_running_average=not train)
        return jax.nn.relu(out + residual)


class HRModule(nn.Module):
    """One HighResolutionModule: per-branch blocks + SUM fusion."""

    num_channels: tuple[int, ...]
    num_blocks: int = 4
    dropout: tuple[float, ...] | None = None
    dtype: Any = None

    @nn.compact
    def __call__(self, xs: list[jnp.ndarray], train: bool) -> list[jnp.ndarray]:
        n = len(self.num_channels)
        # branches
        ys = []
        for i, x in enumerate(xs):
            rate = self.dropout[i] if self.dropout else 0.0
            for b in range(self.num_blocks):
                x = BasicBlock(self.num_channels[i], dropout=rate,
                               name=f"branch{i}_block{b}", dtype=self.dtype)(x, train)
            ys.append(x)
        if n == 1:
            return ys
        # fusion: out_i = relu(sum_j f_ij(y_j))
        outs = []
        for i in range(n):
            h, w = ys[i].shape[1], ys[i].shape[2]
            acc = None
            for j in range(n):
                if j == i:
                    t = ys[j]
                elif j > i:  # lower resolution -> 1x1 conv + upsample
                    t = _conv(self.num_channels[i], 1, 1, f"fuse{i}_{j}_conv", dtype=self.dtype)(ys[j])
                    t = _bn(f"fuse{i}_{j}_bn", dtype=self.dtype)(t, use_running_average=not train)
                    t = _upsample_to(t, h, w)
                else:  # higher resolution -> chain of stride-2 convs
                    t = ys[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        ch = self.num_channels[i] if last else self.num_channels[j]
                        t = _conv(ch, 3, 2, f"fuse{i}_{j}_down{k}_conv", dtype=self.dtype)(t)
                        t = _bn(f"fuse{i}_{j}_down{k}_bn", dtype=self.dtype)(t, use_running_average=not train)
                        if not last:
                            t = jax.nn.relu(t)
                acc = t if acc is None else acc + t
            outs.append(jax.nn.relu(acc))
        return outs


@dataclasses.dataclass(frozen=True)
class HRNetSpec:
    width: int = 24  # hrnet-s: 24 (stage1 32); hrnet-m: 48 (stage1 64)
    stage1_channels: int = 32
    num_modules: tuple[int, int, int] = (1, 4, 3)  # stages 2..4
    num_blocks: int = 4
    stage_dropout: tuple[float, ...] = (0.0, 0.0, 0.0, 0.0)
    final_dropout: float = 0.0

    @property
    def stage_channels(self):
        w = self.width
        return ((w, 2 * w), (w, 2 * w, 4 * w), (w, 2 * w, 4 * w, 8 * w))


class HRNet(nn.Module):
    num_classes: int
    spec: HRNetSpec = HRNetSpec()
    ssn: bool = False
    ssn_rank: int = 10
    ssn_eps: float = 1e-5
    dtype: Any = None  # compute dtype; params/BN stats stay fp32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False, *, mean_only: bool = False) -> UnetOutput:
        spec = self.spec
        dt = self.dtype
        orig_dtype = x.dtype
        if dt is not None:
            x = x.astype(dt)
        in_h, in_w = x.shape[1], x.shape[2]
        # stem: two stride-2 convs
        h = _conv(64, 3, 2, "stem_conv1", dtype=dt)(x)
        h = jax.nn.relu(_bn("stem_bn1", dtype=dt)(h, use_running_average=not train))
        h = _conv(64, 3, 2, "stem_conv2", dtype=dt)(h)
        h = jax.nn.relu(_bn("stem_bn2", dtype=dt)(h, use_running_average=not train))
        # layer1: 4 bottlenecks
        for b in range(4):
            h = Bottleneck(spec.stage1_channels, name=f"layer1_block{b}", dtype=dt)(h, train)

        # transitions + stages
        branches = [h]
        for stage_idx, channels in enumerate(spec.stage_channels):
            new_branches = []
            for i, ch in enumerate(channels):
                if i < len(branches):
                    src = branches[i]
                    if src.shape[-1] != ch:
                        t = _conv(ch, 3, 1, f"t{stage_idx}_{i}_conv", dtype=dt)(src)
                        t = jax.nn.relu(_bn(f"t{stage_idx}_{i}_bn", dtype=dt)(t, use_running_average=not train))
                        new_branches.append(t)
                    else:
                        new_branches.append(src)
                else:  # new lower-resolution branch from the last existing one
                    t = _conv(ch, 3, 2, f"t{stage_idx}_{i}_conv", dtype=dt)(branches[-1])
                    t = jax.nn.relu(_bn(f"t{stage_idx}_{i}_bn", dtype=dt)(t, use_running_average=not train))
                    new_branches.append(t)
            n_mod = spec.num_modules[stage_idx]
            drop = tuple(
                spec.stage_dropout[i] if i < len(spec.stage_dropout) else 0.0
                for i in range(len(channels))
            ) if stage_idx >= 1 else None  # reference: DROPOUT only on stages 3/4
            for m in range(n_mod):
                new_branches = HRModule(
                    tuple(channels), spec.num_blocks, dropout=drop,
                    name=f"stage{stage_idx + 2}_mod{m}", dtype=dt,
                )(new_branches, train)
            branches = new_branches

        # final dropout on branch features (elementwise, always live)
        if spec.final_dropout > 0.0:
            rng = self.make_rng("dropout")
            keys = jax.random.split(rng, len(branches))
            keep = 1.0 - spec.final_dropout
            branches = [
                jnp.where(jax.random.bernoulli(k, keep, b.shape), b / keep, 0.0)
                for k, b in zip(keys, branches)
            ]

        # concat at 1/4 resolution
        h0, w0 = branches[0].shape[1], branches[0].shape[2]
        feats = jnp.concatenate(
            [branches[0]] + [_upsample_to(b, h0, w0) for b in branches[1:]], axis=-1
        )

        feats = feats.astype(orig_dtype)  # heads keep input-dtype numerics

        def last_layer(name: str, out_ch: int):
            # torch nn.Conv2d defaults: both head convs carry a bias
            t = MemberConv(feats.shape[-1], (1, 1), name=f"{name}_conv1")(feats)
            t = jax.nn.relu(_bn(f"{name}_bn")(t, use_running_average=not train))
            return MemberConv(out_ch, (1, 1), name=f"{name}_conv2")(t)

        logits_low = last_layer("last", self.num_classes)
        logits = _upsample_to(logits_low, in_h, in_w)

        if not self.ssn:
            return UnetOutput(logits=logits, features=feats)

        # SSN: the reference reuses last_layer for mean AND cov (hrnet :640-660)
        b = logits.shape[0]
        mean = logits.reshape(b, -1)
        cov_diag_low = jax.nn.softplus(logits_low) + self.ssn_eps
        cov_diag = _upsample_to(cov_diag_low, in_h, in_w)
        cov_diag = jnp.nan_to_num(cov_diag, nan=1.0, posinf=1e6, neginf=self.ssn_eps)
        cov_diag = jnp.clip(cov_diag, min=self.ssn_eps).reshape(b, -1)
        if mean_only:
            cov_factor = jnp.zeros((b, mean.shape[1], self.ssn_rank), mean.dtype)
        else:
            factor_low = last_layer("ssn_factor", self.num_classes * self.ssn_rank)
            factor = _upsample_to(factor_low, in_h, in_w)
            factor = factor.reshape(b, in_h, in_w, self.ssn_rank, self.num_classes)
            factor = factor.transpose(0, 1, 2, 4, 3)
            cov_factor = factor.reshape(b, -1, self.ssn_rank)
        return UnetOutput(
            logits=logits, features=feats, ssn_mean=mean,
            ssn_cov_diag=cov_diag, ssn_cov_factor=cov_factor,
        )
