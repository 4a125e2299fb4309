"""Model factory: ExperimentConfig -> Flax module + AU/EU metadata.

Mirrors ``unc_mod_utils/model_factory.py`` (instantiate_network,
_infer_model_au_type :73-84, _infer_model_eu_type :97-133) and the config
surgery in ``diff_unet2D_module.py:get_seg_model`` (:1354-1416): diffusion
models get ``in_channels += out_channels`` for the x_t concat; eu_method
dropout overrides patch the network's dropout spec; AU/EU metadata is
inferred and conflicts rejected.
"""

from __future__ import annotations

import dataclasses

from ..core.config import ExperimentConfig
from .unet import DiffUnet, DropoutSpec
from .prob_unet import ProbUnet, ProbUnetSpec, build_prob_unet
from .diffusion import ContinuousGaussianDiffusion
from .hrnet import HRNet, HRNetSpec


@dataclasses.dataclass
class BuiltModel:
    module: object  # DiffUnet | ProbUnet | HRNet
    au_type: str  # softmax | ssn | diffusion | prob_unet
    eu_type: str  # none | dropout | swag | swag_diag | ensemble | subensemble
    is_generative: bool
    num_classes: int
    backbone: str = "diff_unet"  # diff_unet | hrnet
    diffusion: ContinuousGaussianDiffusion | None = None
    diffusion_num_steps: int = 10
    diffusion_sampler_type: str = "ddpm"
    prob_unet_spec: ProbUnetSpec | None = None
    dropout_spec: DropoutSpec = dataclasses.field(default_factory=DropoutSpec)

    @property
    def needs_dropout_rng(self) -> bool:
        return self.dropout_spec.max_rate > 0.0

    @property
    def has_batch_stats(self) -> bool:
        return self.backbone == "hrnet"


def _infer_eu_type(cfg: ExperimentConfig, dropout_spec: DropoutSpec) -> str:
    candidates: set[str] = set()
    explicit = cfg.eu_method.name
    allowed = {"none", "dropout", "swag", "swag_diag", "ensemble", "subensemble"}
    if explicit not in allowed:
        raise ValueError(f"Unsupported EU method '{explicit}'")
    if explicit not in ("none", "ensemble", "subensemble") :
        candidates.add(explicit)
    if cfg.eu_method.swag.enabled:
        candidates.add("swag_diag" if cfg.eu_method.swag.diag_only else "swag")
    if dropout_spec.max_rate > 0.0:
        candidates.add("dropout")
    if len(candidates) > 1:
        raise ValueError(f"Conflicting EU indicators: {sorted(candidates)}")
    if candidates:
        return candidates.pop()
    return explicit if explicit in ("ensemble", "subensemble") else "none"


def build_model(cfg: ExperimentConfig) -> BuiltModel:
    net = cfg.network
    model_cfg = cfg.model
    au_type = model_cfg.au_type
    if au_type not in ("softmax", "ssn", "diffusion", "prob_unet"):
        raise ValueError(f"Unknown AU type '{au_type}'")

    if net.backbone == "hrnet":
        # reference guard: hrnet supports softmax/ssn only (hrnet :830-835)
        if au_type in ("diffusion", "prob_unet"):
            raise ValueError(f"HRNet does not support AU type '{au_type}'")
        if cfg.eu_method.name == "dropout":
            dropout_spec = cfg.eu_method.dropout
        else:
            dropout_spec = DropoutSpec.from_config(None, default_rate=net.dropout)
        spec = HRNetSpec(
            width=net.hrnet_width,
            stage1_channels=32 if net.hrnet_width <= 24 else 64,
            final_dropout=dropout_spec.max_rate,
        )
        import jax.numpy as jnp

        module = HRNet(
            num_classes=net.out_channels,
            spec=spec,
            ssn=au_type == "ssn",
            ssn_rank=model_cfg.ssn_rank,
            ssn_eps=model_cfg.ssn_eps,
            dtype=jnp.bfloat16 if cfg.trainer.precision == "bf16" else jnp.float32,
        )
        return BuiltModel(
            module=module,
            au_type=au_type,
            eu_type=_infer_eu_type(cfg, dropout_spec),
            is_generative=au_type != "softmax",
            num_classes=net.out_channels,
            backbone="hrnet",
            dropout_spec=dropout_spec,
        )

    is_diffusion = au_type == "diffusion"
    is_ssn = au_type == "ssn"
    if is_diffusion and is_ssn:
        raise ValueError("SSN with diffusion is not supported")

    # eu_method dropout patches the network spec (eu_method/dropout.yaml)
    if cfg.eu_method.name == "dropout":
        dropout_spec = cfg.eu_method.dropout
        if dropout_spec.max_rate <= 0.0:
            raise ValueError("eu_method=dropout requires a positive dropout probability")
    else:
        dropout_spec = DropoutSpec.from_config(None, default_rate=net.dropout)

    in_channels = net.in_channels + (net.out_channels if is_diffusion else 0)
    import jax.numpy as jnp

    compute_dtype = jnp.bfloat16 if cfg.trainer.precision == "bf16" else jnp.float32
    unet_kwargs = dict(
        dtype=compute_dtype,
        in_channels=in_channels,
        out_channels=net.out_channels,
        model_channels=net.model_channels,
        num_res_blocks=tuple(net.num_res_blocks),
        num_middle_res_blocks=net.num_middle_res_blocks,
        attention_resolutions=tuple(net.attention_resolutions),
        channel_mult=tuple(net.channel_mult),
        conv_resample=net.conv_resample,
        num_heads=net.num_heads,
        num_heads_upsample=net.num_heads_upsample,
        use_scale_shift_norm=net.use_scale_shift_norm,
        diffusion=is_diffusion,
        final_act=net.final_act,
        one_skip_per_reso=net.one_skip_per_reso,
        new_upsample_method=net.new_upsample_method,
        mlp_attn=net.mlp_attn,
        act=net.act,
        ssn=is_ssn,
        ssn_rank=model_cfg.ssn_rank,
        ssn_eps=model_cfg.ssn_eps,
        dropout_spec=dropout_spec,
    )

    diffusion_proc = None
    prob_spec = None
    if au_type == "prob_unet":
        module = build_prob_unet(
            {**unet_kwargs, "dropout_spec": dropout_spec}, model_cfg.prob_unet
        )
        prob_spec = model_cfg.prob_unet
    else:
        module = DiffUnet(**unet_kwargs)
        if is_diffusion:
            diffusion_proc = ContinuousGaussianDiffusion(
                **dataclasses.asdict(model_cfg.diffusion)
            )

    eu_type = _infer_eu_type(cfg, dropout_spec)

    return BuiltModel(
        module=module,
        au_type=au_type,
        eu_type=eu_type,
        is_generative=au_type != "softmax",
        num_classes=net.out_channels,
        diffusion=diffusion_proc,
        diffusion_num_steps=model_cfg.diffusion_sampling.num_steps,
        diffusion_sampler_type=model_cfg.diffusion_sampling.sampler,
        prob_unet_spec=prob_spec,
        dropout_spec=dropout_spec,
    )
