"""ADM-style 2D U-Net ("DiffUnet") in Flax, TPU-native NHWC layout.

Re-designed from the reference architecture at
``uncertainty_modeling/models/diff_unet2D_module.py:141-1029`` (DiffUnet,
ResBlock, MLPBlock, AttentionBlock, Upsample, Downsample):

- ResBlocks with GroupNorm32 (float32-internal), SiLU/ReLU/GELU, optional
  scale-shift time conditioning, zero-initialised output convs.
- QKV self-attention at configurable downsample resolutions (negative indices
  wrap), with the legacy ADM head split and ``1/sqrt(sqrt(ch))`` scaling.
- Two skip schemes: concat (default) vs add (``new_upsample_method``, with
  ``one_skip_per_reso`` keeping only the pre-downsample skips).
- Structured MC-dropout: per-depth probability list; encoder/mid/decoder/
  skip/residual placement flags; ``per_block`` single-vs-double dropout.
  Dropout is *always* live when the rate is positive (reference MC_Dropout2d
  forces ``training=True``), driven by the explicit ``'dropout'`` PRNG
  collection — so vmapping over rng keys yields i.i.d. MC samples, and reusing
  a key reproduces the reference's seeded-dropout members.
- Optional SSN heads (low-rank multivariate-normal over flattened logits) and
  ``encoder_only`` mode (prob-U-Net latent encoders).

Everything is static-shape and trace-once: one XLA program per (batch-shape,
flags) combination.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
from flax.linen import dtypes as nn_dtypes
import jax
import jax.numpy as jnp
from jax import lax

from ..core.specs import DropoutSpec
from ..ops.norm import group_norm_32, num_groups_for
from ..ops.attention import qkv_attention
from ..ops.member_fold import member_conv2d, member_dense
from ..ops.resample import upsample2x, downsample_avgpool2x
from ..ops.time_embed import timestep_embedding


@dataclasses.dataclass
class UnetOutput:
    """Forward results; unused fields are None."""

    logits: jnp.ndarray | None = None
    features: jnp.ndarray | None = None
    ssn_mean: jnp.ndarray | None = None  # (B, N) flattened logits mean
    ssn_cov_diag: jnp.ndarray | None = None  # (B, N)
    ssn_cov_factor: jnp.ndarray | None = None  # (B, N, rank)


jax.tree_util.register_dataclass(
    UnetOutput,
    data_fields=["logits", "features", "ssn_mean", "ssn_cov_diag", "ssn_cov_factor"],
    meta_fields=[],
)


def _act_fn(name: str):
    name = name.lower()
    if name == "silu":
        return jax.nn.silu
    if name == "relu":
        return jax.nn.relu
    if name == "gelu":
        return lambda x: jax.nn.gelu(x, approximate=False)
    raise ValueError(f"Unsupported activation: {name}")


def _stacked_init(init, members: int):
    """Adapt a param initializer to a leading member axis (fan computed on the
    per-member shape, one key per member)."""

    def f(key, shape, dtype=jnp.float32):
        keys = jax.random.split(key, members)
        return jax.vmap(lambda k: init(k, shape[1:], dtype))(keys)

    return f


class MemberConv(nn.Module):
    """``nn.Conv`` twin (same param tree: ``kernel`` HWIO + ``bias``) with an
    optional member-folded mode.

    ``members == 0``: identical math to ``nn.Conv`` (same ``lax.conv`` call,
    dtype promotion, bias add) — fp32 reference parity is preserved bit-wise.
    ``members == M``: params carry a leading ``(M, ...)`` axis (a stacked
    ensemble pytree) and inputs are member-major folded rows ``(M*B, H, W,
    C)``; the conv runs as a member-batched im2col matmul
    (``ops/member_fold.py``) instead of vmap's slow grouped conv.
    """

    features: int
    kernel_size: tuple[int, int] = (3, 3)
    strides: int = 1
    padding: int = 0  # symmetric spatial padding (torch Conv2d(k, p))
    kernel_init: Any = nn.initializers.lecun_normal()
    bias_init: Any = nn.initializers.zeros_init()
    use_bias: bool = True
    dtype: Any = None
    members: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = self.kernel_size
        cin = x.shape[-1]
        lead = (self.members,) if self.members else ()
        kinit = (_stacked_init(self.kernel_init, self.members) if self.members
                 else self.kernel_init)
        kernel = self.param("kernel", kinit, lead + (kh, kw, cin, self.features))
        bias = (self.param("bias", self.bias_init, lead + (self.features,))
                if self.use_bias else None)
        if bias is None:
            x, kernel = nn_dtypes.promote_dtype(x, kernel, dtype=self.dtype)
        else:
            x, kernel, bias = nn_dtypes.promote_dtype(
                x, kernel, bias, dtype=self.dtype)
        if self.members:
            return member_conv2d(x, kernel, bias, stride=self.strides, pad=self.padding)
        if kh == kw == 1 and self.padding == 0:
            # 1x1 convs as channel matmuls (strided 1x1 = subsample + matmul).
            # Not just an MXU nicety: under vmap over stacked member params +
            # a member-sharded mesh axis, XLA's SPMD partitioner MISCOMPILES
            # the feature-grouped conv that a vmapped 1x1 lax.conv lowers to
            # (wrong values; repro pinned in tests/test_parallel.py::
            # test_member_sharded_vmap_conv1x1_miscompile_guard); the
            # dot_general lowering partitions correctly, and kxk>1 grouped
            # convs are unaffected.
            if self.strides > 1:
                x = x[:, :: self.strides, :: self.strides, :]
            y = lax.dot_general(x, kernel[0, 0], (((x.ndim - 1,), (0,)), ((), ())))
        else:
            y = lax.conv_general_dilated(
                x,
                kernel,
                (self.strides, self.strides),
                ((self.padding, self.padding), (self.padding, self.padding)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if bias is None:
            return y
        return y + bias.reshape((1,) * (y.ndim - 1) + (-1,))


class MemberDense(nn.Module):
    """``nn.Dense`` twin (params ``kernel``/``bias``) with member-folded mode."""

    features: int
    kernel_init: Any = nn.initializers.lecun_normal()
    dtype: Any = None
    members: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        lead = (self.members,) if self.members else ()
        kinit = (_stacked_init(self.kernel_init, self.members)
                 if self.members else self.kernel_init)
        kernel = self.param("kernel", kinit, lead + (cin, self.features))
        bias = self.param("bias", nn.initializers.zeros_init(), lead + (self.features,))
        x, kernel, bias = nn_dtypes.promote_dtype(x, kernel, bias, dtype=self.dtype)
        if self.members:
            return member_dense(x, kernel, bias)
        y = lax.dot_general(x, kernel, (((x.ndim - 1,), (0,)), ((), ())))
        return y + bias.reshape((1,) * (y.ndim - 1) + (-1,))


def conv3x3(features: int, *, strides: int = 1, zero_init: bool = False, name=None,
            dtype=None, members: int = 0):
    init = nn.initializers.zeros_init() if zero_init else nn.initializers.lecun_normal()
    return MemberConv(
        features,
        (3, 3),
        strides=strides,
        padding=1,
        kernel_init=init,
        name=name,
        dtype=dtype,
        members=members,
    )


def conv1x1(features: int, *, zero_init: bool = False, name=None, dtype=None,
            members: int = 0):
    init = nn.initializers.zeros_init() if zero_init else nn.initializers.lecun_normal()
    return MemberConv(features, (1, 1), padding=0, kernel_init=init, name=name,
                      dtype=dtype, members=members)


class GroupNorm32(nn.Module):
    """Learned-affine GroupNorm with float32 internals (see ops/norm.py).

    With ``members == M`` the affine params carry a leading member axis and
    batch rows are member-major folded blocks; the statistics are row-local
    either way.
    """

    members: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        lead = (self.members,) if self.members else ()
        scale = self.param("scale", nn.initializers.ones_init(), lead + (c,))
        bias = self.param("bias", nn.initializers.zeros_init(), lead + (c,))
        return group_norm_32(x, scale, bias, num_groups=num_groups_for(c))


class ChannelDropout(nn.Module):
    """torch ``F.dropout2d(training=True)``: zero whole channels, scale 1/(1-p).

    Always live when ``rate > 0`` (MC-dropout semantics); uses the 'dropout'
    rng collection.
    """

    rate: float

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.rate <= 0.0:
            return x
        rng = self.make_rng("dropout")
        keep = 1.0 - self.rate
        mask_shape = (x.shape[0],) + (1,) * (x.ndim - 2) + (x.shape[-1],)
        mask = jax.random.bernoulli(rng, keep, mask_shape)
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


class ResBlock(nn.Module):
    """Residual block, reference ``diff_unet2D_module.py:941-1029``."""

    out_channels: int
    dropout: float = 0.0
    use_conv_skip: bool = False
    use_scale_shift_norm: bool = False
    act: str = "silu"
    per_block: bool = True
    residual_dropout: float = 0.0
    dtype: Any = None  # compute dtype for convs/denses (params stay fp32)
    members: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray, emb: jnp.ndarray | None = None) -> jnp.ndarray:
        act = _act_fn(self.act)
        mm = self.members
        c_in = x.shape[-1]
        h = GroupNorm32(name="in_norm", members=mm)(x)
        h = act(h)
        if (not self.per_block) and self.dropout > 0.0:
            h = ChannelDropout(self.dropout, name="in_dropout")(h)
        h = conv3x3(self.out_channels, name="in_conv", dtype=self.dtype, members=mm)(h)

        if emb is not None:
            emb_dim = 2 * self.out_channels if self.use_scale_shift_norm else self.out_channels
            emb_out = MemberDense(emb_dim, name="emb_proj", dtype=self.dtype,
                                  members=mm)(act(emb)).astype(h.dtype)
            emb_out = emb_out[:, None, None, :]
            if self.use_scale_shift_norm:
                scale, shift = jnp.split(emb_out, 2, axis=-1)
                h = GroupNorm32(name="out_norm", members=mm)(h) * (1 + scale) + shift
                h = act(h)
                h = ChannelDropout(self.dropout, name="out_dropout")(h)
                h = conv3x3(self.out_channels, zero_init=True, name="out_conv",
                            dtype=self.dtype, members=mm)(h)
            else:
                h = h + emb_out
                h = GroupNorm32(name="out_norm", members=mm)(h)
                h = act(h)
                h = ChannelDropout(self.dropout, name="out_dropout")(h)
                h = conv3x3(self.out_channels, zero_init=True, name="out_conv",
                            dtype=self.dtype, members=mm)(h)
        else:
            h = GroupNorm32(name="out_norm", members=mm)(h)
            h = act(h)
            h = ChannelDropout(self.dropout, name="out_dropout")(h)
            h = conv3x3(self.out_channels, zero_init=True, name="out_conv",
                        dtype=self.dtype, members=mm)(h)

        if self.out_channels == c_in:
            skip = x
        elif self.use_conv_skip:
            skip = conv3x3(self.out_channels, name="skip_conv", dtype=self.dtype,
                           members=mm)(x)
        else:
            skip = conv1x1(self.out_channels, name="skip_conv", dtype=self.dtype,
                           members=mm)(x)
        skip = ChannelDropout(self.residual_dropout, name="residual_dropout")(skip)
        return skip + h


class MLPBlock(nn.Module):
    """SiD-style MLP block, reference ``diff_unet2D_module.py:682-748``."""

    out_channels: int
    expansion_factor: int = 4
    dropout: float = 0.0
    use_scale_shift_norm: bool = False
    act: str = "silu"
    dtype: Any = None
    members: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray, emb: jnp.ndarray | None = None) -> jnp.ndarray:
        act = _act_fn(self.act)
        mm = self.members
        c_in = x.shape[-1]
        c = self.expansion_factor * c_in
        h = GroupNorm32(name="in_norm", members=mm)(x)
        h = conv1x1(c, name="in_conv", dtype=self.dtype, members=mm)(h)
        h = act(h)
        if emb is not None:
            emb_dim = 2 * c if self.use_scale_shift_norm else c
            emb_out = MemberDense(emb_dim, name="emb_proj", dtype=self.dtype,
                                  members=mm)(emb).astype(h.dtype)
            emb_out = emb_out[:, None, None, :]
            if self.use_scale_shift_norm:
                scale, shift = jnp.split(emb_out, 2, axis=-1)
                h = h * (1 + scale) + shift
            else:
                h = h + emb_out
        h = ChannelDropout(self.dropout, name="dropout")(h)
        h = conv1x1(self.out_channels, name="out_conv", dtype=self.dtype, members=mm)(h)
        if self.out_channels == c_in:
            skip = x
        else:
            skip = conv1x1(self.out_channels, name="skip_conv", dtype=self.dtype,
                           members=mm)(x)
        return skip + h


class AttentionBlock(nn.Module):
    """Spatial self-attention, reference ``diff_unet2D_module.py:758-822``."""

    num_heads: int = 1
    dtype: Any = None
    members: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, hh, ww, c = x.shape
        xt = x.reshape(b, hh * ww, c)
        normed = GroupNorm32(name="norm", members=self.members)(xt)
        qkv = MemberDense(3 * c, name="qkv", dtype=self.dtype,
                          members=self.members)(normed)
        h = qkv_attention(qkv, self.num_heads)
        h = MemberDense(c, kernel_init=nn.initializers.zeros_init(),
                        name="proj_out", dtype=self.dtype,
                        members=self.members)(h)
        return (xt + h).reshape(b, hh, ww, c)


class Downsample(nn.Module):
    """Conv-stride-2 or AvgPool 2x, plus optional 1x1 channel mapper."""

    use_conv: bool
    channels_out: int | None = None
    dtype: Any = None
    members: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.use_conv:
            x = conv3x3(x.shape[-1], strides=2, name="op", dtype=self.dtype,
                        members=self.members)(x)
        else:
            x = downsample_avgpool2x(x)
        if self.channels_out is not None and self.channels_out != x.shape[-1]:
            x = conv1x1(self.channels_out, name="channel_mapper", dtype=self.dtype,
                        members=self.members)(x)
        return x


class Upsample(nn.Module):
    """Optional 1x1 channel mapper, 2x interpolation, optional conv."""

    use_conv: bool
    channels_out: int | None = None
    mode: str = "nearest"
    dtype: Any = None
    members: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.channels_out is not None and self.channels_out != x.shape[-1]:
            x = conv1x1(self.channels_out, name="channel_mapper", dtype=self.dtype,
                        members=self.members)(x)
        x = upsample2x(x, method=self.mode)
        if self.use_conv:
            x = conv3x3(x.shape[-1], name="conv", dtype=self.dtype,
                        members=self.members)(x)
        return x


def _final_act(name: str):
    name = (name or "none").lower()
    if name == "none":
        return lambda x: x
    if name == "softmax":
        return lambda x: jax.nn.softmax(x, axis=-1)
    if name == "tanh":
        return jnp.tanh
    if name == "sigmoid":
        return jax.nn.sigmoid
    raise ValueError(f"Unsupported final activation: {name}")


class DiffUnet(nn.Module):
    """The full U-Net; see module docstring for provenance."""

    in_channels: int = 4
    out_channels: int = 1
    model_channels: int = 32
    num_res_blocks: tuple[int, ...] = (1, 2, 3, 4)
    num_middle_res_blocks: int = 4
    attention_resolutions: tuple[int, ...] = (-1,)
    channel_mult: tuple[int, ...] = (1, 1, 2, 4)
    conv_resample: bool = True
    num_heads: int = 4
    num_heads_upsample: int = -1
    use_scale_shift_norm: bool = False
    diffusion: bool = False
    final_act: str = "none"
    one_skip_per_reso: bool = False
    new_upsample_method: bool = False
    mlp_attn: bool = False
    act: str = "silu"
    ssn: bool = False
    ssn_rank: int = 10
    ssn_eps: float = 1e-5
    encoder_only: bool = False
    dropout_spec: DropoutSpec = DropoutSpec()
    dtype: Any = jnp.float32  # compute dtype for conv/attention inputs
    members: int = 0  # >0: member-folded stacked-ensemble execution
    # (params carry a leading member axis; inputs are member-major folded
    # rows (members*B, H, W, C) — see ops/member_fold.py)

    def _resolved_attention_resolutions(self) -> set[int]:
        n = len(self.channel_mult)
        return {ar + n if ar < 0 else ar for ar in self.attention_resolutions}

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        timesteps: jnp.ndarray | None = None,
        *,
        mean_only: bool = False,
    ) -> UnetOutput:
        """Forward pass on NHWC input ``(B, H, W, in_channels)``.

        For diffusion models, ``x`` is ``concat([x_t, image], axis=-1)`` and
        ``timesteps`` a ``(B,)`` or scalar vector of continuous times.
        """
        spec = self.dropout_spec
        nres = tuple(self.num_res_blocks) if not isinstance(self.num_res_blocks, int) else (self.num_res_blocks,) * len(self.channel_mult)
        assert len(nres) == len(self.channel_mult)
        assert self.channel_mult[0] == 1, "channel_mult[0] must be 1"
        attn_res = self._resolved_attention_resolutions()
        act = _act_fn(self.act)
        num_heads_up = self.num_heads if self.num_heads_upsample == -1 else self.num_heads_upsample
        mc = self.model_channels

        # --- time embedding -------------------------------------------------
        if self.diffusion:
            if timesteps is None:
                raise ValueError("timesteps must be provided when diffusion=True")
            t = jnp.asarray(timesteps)
            if t.ndim == 0:
                t = jnp.broadcast_to(t, (x.shape[0],))
            emb = timestep_embedding(t, mc)
            emb = MemberDense(4 * mc, name="time_embed_0", dtype=self.dtype,
                              members=self.members)(emb)
            emb = act(emb)
            emb = MemberDense(4 * mc, name="time_embed_1", dtype=self.dtype,
                              members=self.members)(emb)
        else:
            if timesteps is not None:
                raise ValueError("timesteps must be None when diffusion=False")
            emb = None

        h = x.astype(self.dtype)

        def res_kwargs(stage: str, depth: int) -> dict:
            rate = spec.stage_rate(stage, depth)
            return dict(
                dropout=rate,
                use_scale_shift_norm=self.use_scale_shift_norm,
                act=self.act,
                per_block=spec.per_block,
                residual_dropout=rate if spec.residual_connections else 0.0,
                dtype=self.dtype,
                members=self.members,
            )

        def make_block(ch_out: int, stage: str, depth: int, heads: int, name: str):
            """One encoder/decoder stage: (MLP|Res)Block [+ Attention]."""
            kw = res_kwargs(stage, depth)
            layers = []
            if depth in attn_res and self.mlp_attn:
                layers.append(MLPBlock(ch_out, dropout=kw["dropout"],
                                       use_scale_shift_norm=self.use_scale_shift_norm,
                                       act=self.act, name=f"{name}_mlp",
                                       dtype=self.dtype, members=self.members))
            else:
                layers.append(ResBlock(ch_out, name=f"{name}_res", **kw))
            if depth in attn_res:
                layers.append(AttentionBlock(heads, name=f"{name}_attn",
                                             dtype=self.dtype, members=self.members))
            return layers

        def apply_layers(layers, h, emb):
            for layer in layers:
                if isinstance(layer, AttentionBlock):
                    h = layer(h)
                elif isinstance(layer, (ResBlock, MLPBlock)):
                    h = layer(h, emb)
                else:
                    h = layer(h)
            return h

        # --- encoder --------------------------------------------------------
        h = conv3x3(mc, name="input_conv", dtype=self.dtype, members=self.members)(h)
        hs: list = []
        skip_flags: list[bool] = [False]
        hs_pending = [h]
        resolution = 0
        ch = mc
        block_idx = 0
        for level, (mult, n_res) in enumerate(zip(self.channel_mult, nres)):
            for _ in range(n_res):
                ch = mult * mc
                layers = make_block(ch, "encoder", resolution, self.num_heads,
                                    f"enc{block_idx}")
                h = apply_layers(layers, h, emb)
                hs_pending.append(h)
                skip_flags.append(False)
                block_idx += 1
            if level != len(self.channel_mult) - 1:
                resolution += 1
                ch_out = (self.channel_mult[resolution] * mc
                          if self.new_upsample_method else None)
                skip_flags[-1] = True
                h = Downsample(self.use_downsample_conv, channels_out=ch_out,
                               name=f"down{resolution}", dtype=self.dtype,
                               members=self.members)(h)
                hs_pending.append(h)
                skip_flags.append(False)

        # which activations are kept as skips (default: all of them)
        if not self.one_skip_per_reso:
            skip_flags = [True] * len(skip_flags)
        else:
            assert self.new_upsample_method, "one_skip_per_reso requires new_upsample_method"
        # NOTE: hs_pending[i] was stored *before* downsampling for flagged
        # entries; mirror reference ordering: store the activation after each
        # input block (the pre-downsample one carries the skip flag).
        hs = [hp if flag else None for hp, flag in zip(hs_pending, skip_flags)]

        # --- middle ---------------------------------------------------------
        ch = self.channel_mult[-1] * mc
        if resolution in attn_res:
            for i in range(self.num_middle_res_blocks - 1):
                layers = make_block(ch, "mid", resolution, self.num_heads, f"mid{i}")
                h = apply_layers(layers, h, emb)
            kw = res_kwargs("mid", resolution)
            if self.mlp_attn:
                h = MLPBlock(ch, dropout=kw["dropout"],
                             use_scale_shift_norm=self.use_scale_shift_norm,
                             act=self.act,
                             name=f"mid{self.num_middle_res_blocks - 1}_mlp",
                             dtype=self.dtype, members=self.members)(h, emb)
            else:
                h = ResBlock(ch, name=f"mid{self.num_middle_res_blocks - 1}_res", **kw)(h, emb)
        else:
            for i in range(self.num_middle_res_blocks):
                h = ResBlock(ch, name=f"mid{i}_res", **res_kwargs("mid", resolution))(h, emb)

        if self.encoder_only:
            return UnetOutput(features=h.astype(x.dtype))

        # --- decoder --------------------------------------------------------
        block_idx = 0
        for level, mult, n_res in zip(
            reversed(range(len(self.channel_mult))),
            self.channel_mult[::-1],
            nres[::-1],
        ):
            for i in range(n_res + 1):
                depth = resolution
                ch = mc * mult
                skip_tensor = hs.pop()
                if skip_tensor is not None:
                    if spec.skip_connections:
                        skip_rate = spec.rate_at_depth(depth)
                        skip_tensor = ChannelDropout(
                            skip_rate, name=f"dec{block_idx}_skip_dropout"
                        )(skip_tensor)
                    if self.new_upsample_method:
                        cat_in = h + skip_tensor
                    else:
                        cat_in = jnp.concatenate([h, skip_tensor], axis=-1)
                else:
                    cat_in = h
                layers = make_block(ch, "decoder", depth, num_heads_up,
                                    f"dec{block_idx}")
                h = apply_layers(layers, cat_in, emb)
                if level and i == n_res:
                    resolution -= 1
                    ch_out = (self.channel_mult[resolution] * mc
                              if self.new_upsample_method else None)
                    h = Upsample(
                        self.conv_resample,
                        channels_out=ch_out,
                        mode="bilinear" if self.new_upsample_method else "nearest",
                        name=f"up{resolution}",
                        dtype=self.dtype,
                        members=self.members,
                    )(h)
                block_idx += 1

        features = h.astype(x.dtype)

        # --- output heads ---------------------------------------------------
        def head(out_ch: int, name: str) -> jnp.ndarray:
            g = GroupNorm32(name=f"{name}_norm", members=self.members)(features)
            g = act(g)
            return conv3x3(out_ch, zero_init=True, name=f"{name}_conv",
                           members=self.members)(g)

        logits = head(self.out_channels, "out")
        logits = _final_act(self.final_act)(logits)

        if not self.ssn:
            return UnetOutput(logits=logits, features=features)

        # SSN low-rank MVN head (reference :555-599); flattening is (H, W, C)
        # -- internally consistent; the torch importer permutes accordingly.
        b = logits.shape[0]
        mean = logits.reshape(b, -1)
        cov_logits = head(self.out_channels, "ssn_cov")
        cov_diag = jax.nn.softplus(cov_logits) + self.ssn_eps
        cov_diag = jnp.nan_to_num(cov_diag, nan=1.0, posinf=1e6, neginf=self.ssn_eps)
        cov_diag = jnp.clip(cov_diag, min=self.ssn_eps).reshape(b, -1)
        if mean_only:
            cov_factor = jnp.zeros((b, mean.shape[1], self.ssn_rank), mean.dtype)
        else:
            factor = head(self.out_channels * self.ssn_rank, "ssn_factor")
            hh, ww = factor.shape[1], factor.shape[2]
            factor = factor.reshape(b, hh, ww, self.ssn_rank, self.out_channels)
            factor = factor.transpose(0, 1, 2, 4, 3)  # (B,H,W,C,rank)
            cov_factor = factor.reshape(b, -1, self.ssn_rank)
        return UnetOutput(
            logits=logits,
            features=features,
            ssn_mean=mean,
            ssn_cov_diag=cov_diag,
            ssn_cov_factor=cov_factor,
        )

    @property
    def use_downsample_conv(self) -> bool:
        return self.conv_resample
