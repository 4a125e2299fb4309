"""Train the benchmark checkpoint assets on the deterministic toy-128 set.

Reproducibly regenerates the ``assets/bench_*`` weights the benchmark
(`bench.py`) uses for its "at matched AURC/ECE" quality evaluation
(BASELINE.md; reference workload definition
``unc_mod_utils/test_utils.py:80,90,151``):

    python -m diffuncertainty_tpu.tools.train_bench_assets --model softmax
    python -m diffuncertainty_tpu.tools.train_bench_assets --model diffusion
    python -m diffuncertainty_tpu.tools.train_bench_assets --model ssn
    python -m diffuncertainty_tpu.tools.train_bench_assets --model prob_unet
    python -m diffuncertainty_tpu.tools.train_bench_assets --model hrnet
    python -m diffuncertainty_tpu.tools.train_bench_assets --model swag
    python -m diffuncertainty_tpu.tools.train_bench_assets --model ensemble

Each family trains on the toy-128 controlled fixture (seed 1234 — the same
tree ``bench.py`` evaluates) and saves EMA weights as a flat npz
(`tools/bench_weights.py`). Family notes:

- ``softmax``: unet16 + MC-dropout — the headline bench path (fp32 asset,
  it anchors the exact-vs-fast quality comparison).
- ``diffusion``: the continuous-diffusion objective (``models/diffusion.py``).
- ``ssn`` / ``prob_unet``: the remaining aleatoric prediction models
  (reference ``lightning_experiment.py:446-486,594-620``); float16 storage.
- ``hrnet``: the alternate C0 backbone with dropout — doubles as the HRNet
  training-convergence proof (reference ``hrnet_module.py:690-764``).
- ``swag``: unet16 + SWAG-diag snapshot collection over the last 30 epochs
  (reference ``swag.py:165-196`` schedule); stores the posterior MOMENTS
  (mean fp32 + per-weight std fp16), from which the bench draws 16
  distinct-weight members on-device (reference draw expansion
  ``test_2D.py:678-709``, scale=1.0) — the trained-weights quality anchor
  for the stacked-member ensemble path at ~1/16th the repo cost of 16
  full checkpoints.
- ``ensemble``: trains 16 INDEPENDENTLY-SEEDED unet16 members (the
  reference deep-ensemble protocol, ``test_utils.py:296-376`` checkpoint
  groups), evaluates the stacked 16-member ensemble+TTA with the same
  quality protocol the bench uses, and records per-member + ensemble
  metrics with the full recipe in ``assets/ensemble16_quality.json``.
  The 16 weight sets themselves (~1 GB) are deliberately NOT committed;
  the JSON + this reproducible recipe stand in for them, and the live
  bench quality for the stacked path comes from the SWAG draws above.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import sys
import tempfile
import time
from pathlib import Path

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

REPO = Path(__file__).resolve().parents[2]


def _log(msg):
    print(f"[assets] {msg}", file=sys.stderr, flush=True)


def _load_cfg(*, network="unet16", model="softmax", eu="dropout",
              epochs=400, precision="bf16", data_dir="/tmp/bench_toy128",
              seed=None, extra=()):
    from ..core.config import load_config
    from ..data.toy import generate_toy_dataset

    # num_test=256 keeps this tree identical to tools/quality.py's (shared
    # manifest); train/val draws precede test draws so assets stay valid
    toy = generate_toy_dataset(
        Path(data_dir), num_train=128, num_val=16, num_test=256,
        num_ood=16, num_raters=4, size=128, seed=1234,
    )
    overrides = [
        f"data.data_input_dir={toy}",
        "data.batch_size=16",
        "data.augmentations.height=128", "data.augmentations.width=128",
        # bench.py builds its model from the lidc128 config and normalizes
        # eval inputs with that config's (ImageNet) stats — train with the
        # same stats so the asset and the bench agree
        "data.augmentations.mean=[0.485,0.456,0.406]",
        "data.augmentations.std=[0.229,0.224,0.225]",
        f"trainer.max_epochs={epochs}",
        f"trainer.precision={precision}",
        "trainer.val_every_n_epochs=100",
        # pulling the full train state device->host every epoch dominates
        # these short 8-step epochs through the tunnel
        "ckpt_save_freq.last_every_n_epochs=100",
    ] + list(extra)
    if seed is not None:
        overrides.append(f"seed={seed}")
    return load_config(data="toy64", network=network, model=model,
                       eu_method=eu, overrides=overrides)


def _train(cfg):
    from ..train.cli import build_loaders
    from ..train.loop import Trainer

    trainer = Trainer(cfg, workdir=tempfile.mkdtemp(prefix="bench_asset_"))
    train_loader, val_loader, _ = build_loaders(cfg)
    t0 = time.time()
    state = trainer.fit(train_loader, val_loader)
    _log(f"trained {cfg.model.au_type}/{cfg.network.name} seed={cfg.seed} "
         f"in {time.time() - t0:.0f}s")
    return trainer, state


def _final_params(state):
    """EMA weights (falling back to raw) merged with non-param collections
    (batch_stats for the HRNet backbone) — the self-contained variable dict
    the samplers apply."""
    base = state.ema_params if state.ema_params is not None else state.params
    return {**base, **(state.model_state or {})}


def _param_digest(params) -> str:
    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    h = hashlib.sha256()
    for path, leaf in leaves:
        h.update(str(path).encode())
        h.update(np.ascontiguousarray(np.asarray(leaf, np.float32)).tobytes())
    return h.hexdigest()[:16]


# ---------------------------------------------------------------------------
# single-checkpoint families
# ---------------------------------------------------------------------------

FAMILIES = {
    # family: (network, model, eu, out name, storage dtype)
    "softmax": ("unet16", "softmax", "dropout", "bench_unet16_toy128.npz", None),
    "diffusion": ("unet16", "diffusion", "none", "bench_unet16_toy128_diffusion.npz", None),
    "ssn": ("unet16", "ssn", "none", "bench_unet16_toy128_ssn.npz", "float16"),
    "prob_unet": ("unet16", "prob_unet", "none", "bench_unet16_toy128_prob_unet.npz", "float16"),
    "hrnet": ("hrnet-s", "softmax", "dropout", "bench_hrnet_s_toy128.npz", "float16"),
}


def train_single(family, args):
    from .bench_weights import save_params_npz

    network, model, eu, out_name, dtype = FAMILIES[family]
    cfg = _load_cfg(network=network, model=model, eu=eu, epochs=args.epochs,
                    precision=args.precision, data_dir=args.data_dir,
                    extra=getattr(args, "extra", ()))
    _, state = _train(cfg)
    params = _final_params(state)
    out = Path(args.out) if args.out else REPO / "assets" / out_name
    save_params_npz(params, out, dtype=dtype)
    _log(f"saved {family} asset -> {out}")
    return out


# ---------------------------------------------------------------------------
# multi-class street-scene asset (GTA-style label-switch training)
# ---------------------------------------------------------------------------

def train_multiclass(args):
    """unet16 softmax+dropout on the synthetic street-scene toy, trained on
    STOCHASTICALLY SWITCHED single raters like the reference's GTA runs
    (``augmentations.py`` StochasticLabelSwitches in the train pipeline);
    consumed by bench.py's ``full_frame_multiclass`` family."""
    from ..core.config import load_config
    from ..data.cityscapes import CityscapesDataset
    from ..data.gta_toy import generate_gta_toy
    from ..data.loader import BatchLoader
    from ..train.loop import Trainer
    from .bench_weights import save_params_npz

    data_dir = Path(getattr(args, "multiclass_data_dir", "/tmp/bench_gtatoy"))
    toy = generate_gta_toy(data_dir, num_train=48, num_val=8, num_test=8,
                           train_size=(128, 128), test_size=(256, 512), seed=1234)
    splits = toy / "splits" / "default" / "firstCycle" / "splits.pkl"
    cfg = load_config(
        data="gta_toy", network="unet16", model="softmax", eu_method="dropout",
        overrides=[
            f"data.data_input_dir={toy}",
            f"trainer.max_epochs={args.epochs}",
            f"trainer.precision={args.precision}",
            "trainer.val_every_n_epochs=100",
            "ckpt_save_freq.last_every_n_epochs=100",
        ] + list(getattr(args, "extra", ())),
    )
    trainer = Trainer(cfg, workdir=tempfile.mkdtemp(prefix="bench_asset_mc_"))
    train_ds = CityscapesDataset(splits, toy, split="train", return_all_raters=False)
    t0 = time.time()
    state = trainer.fit(BatchLoader(train_ds, 16, shuffle=True, drop_last=True), None)
    _log(f"trained multiclass gta-toy in {time.time() - t0:.0f}s")
    params = _final_params(state)
    out = Path(args.out) if args.out else REPO / "assets" / "bench_unet16_gtatoy_multiclass.npz"
    save_params_npz(params, out, dtype="float16")
    _log(f"saved multiclass asset -> {out}")
    return out


# ---------------------------------------------------------------------------
# SWAG moments
# ---------------------------------------------------------------------------

def train_swag(args):
    cfg = _load_cfg(model="softmax", eu="swag_diag", epochs=args.epochs,
                    precision=args.precision, data_dir=args.data_dir,
                    extra=getattr(args, "extra", ()))
    trainer, state = _train(cfg)
    swag = trainer.swag_state
    n = int(swag.n_models)
    if n < 2:
        raise RuntimeError(f"SWAG collected only {n} snapshots")

    # moments -> (mean fp32, std fp16): std stays well inside fp16 range
    # where raw variances (~1e-8) would flush to zero as fp16 subnormals
    mean64 = jax.tree.map(lambda m: np.asarray(m, np.float64), swag.mean)
    sq64 = jax.tree.map(lambda s: np.asarray(s, np.float64), swag.sq_mean)
    std = jax.tree.map(
        lambda m, s: np.sqrt(np.maximum(s - m * m, 0.0)).astype(np.float16),
        mean64, sq64,
    )
    mean = jax.tree.map(lambda m: m.astype(np.float32), mean64)

    from .bench_weights import save_params_npz

    out = Path(args.out) if args.out else REPO / "assets" / "bench_unet16_toy128_swag.npz"
    save_params_npz({"mean": mean, "std": std, "meta": {
        "n_snapshots": np.asarray(n),
        "max_snapshots": np.asarray(cfg.eu_method.swag.max_snapshots),
    }}, out)
    _log(f"saved swag moments ({n} snapshots) -> {out}")
    return out


def swag_draw_members(asset: dict, rng, num_members: int, *, scale: float = 1.0):
    """Stacked member params from stored SWAG-diag moments.

    Matches the reference's test-time expansion (``test_2D.py:678-709``:
    ``swag.sample(scale=1.0)`` per member, diag-only fallback) — here one
    vmapped draw producing the (M, ...) stacked pytree the sampler's
    ``params_stack`` mode consumes.
    """
    mean, std = asset["mean"], asset["std"]
    leaves, treedef = jax.tree.flatten(mean)
    std_leaves = treedef.flatten_up_to(std)
    root = float(scale) ** 0.5

    def draw(key):
        keys = jax.random.split(key, len(leaves))
        return jax.tree.unflatten(treedef, [
            jnp.asarray(m) + root * jnp.asarray(s, jnp.float32)
            * jax.random.normal(k, m.shape, jnp.float32)
            for m, s, k in zip(leaves, std_leaves, keys)
        ])

    return jax.vmap(draw)(jax.random.split(rng, num_members))


# ---------------------------------------------------------------------------
# 16-member deep ensemble (recorded quality)
# ---------------------------------------------------------------------------

def train_ensemble(args):
    from ..models.factory import build_model
    from ..sampling import SamplerSpec, TTAConfig, make_sampler
    from .bench_weights import load_params_npz, save_params_npz
    from .quality import toy128_quality_eval

    n_members = args.n_members
    seeds = [args.seed_base + 37 * i for i in range(n_members)]
    members, digests = [], []
    cfg = None
    # members cache next to the toy data: the full 16-member run is ~1h on
    # one chip, so each converged member is persisted and a restarted run
    # (crash, session end) skips straight past the finished ones
    cache = Path(args.data_dir).parent / "bench_ensemble_members"
    cache.mkdir(parents=True, exist_ok=True)
    for i, seed in enumerate(seeds):
        cfg = _load_cfg(model="softmax", eu="none", epochs=args.epochs,
                        precision=args.precision, data_dir=args.data_dir,
                        seed=seed, extra=getattr(args, "extra", ()))
        mpath = cache / f"member_seed{seed}_e{args.epochs}.npz"
        if mpath.exists():
            params = jax.tree.map(np.asarray, load_params_npz(mpath))
            _log(f"member {i + 1}/{n_members} (seed {seed}) from cache {mpath}")
        else:
            _, state = _train(cfg)
            params = jax.tree.map(np.asarray, _final_params(state))
            save_params_npz(params, mpath)
        members.append(params)
        digests.append(_param_digest(params))
        _log(f"member {i + 1}/{n_members} (seed {seed}) digest {digests[-1]}")

    built = build_model(cfg)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *members)

    tta = TTAConfig(hflip_p=0.5, rotation_limit=22.5, scale_limit=(-0.2, 0.2))
    ens_sampler = make_sampler(built, SamplerSpec(
        n_pred=1, n_members=n_members, member_mode="params_stack",
        tta=True, tta_config=tta))
    q_ens = toy128_quality_eval(built, ens_sampler, stacked, cfg.data,
                                log=_log, tag="deep-ensemble16+TTA")

    # per-member quality (single member, no TTA) — the spread shows the
    # members are genuinely distinct converged models
    one_sampler = make_sampler(built, SamplerSpec(n_pred=1, n_members=1,
                                                  member_mode="single"))
    q_members = [
        toy128_quality_eval(built, one_sampler, m, cfg.data,
                            log=_log, tag=f"member{i}")
        for i, m in enumerate(members)
    ]

    record = {
        "protocol": "tools/quality.py::toy128_quality_eval on the toy-128 id split "
                    "(16 batches x 16, seed chain 777+)",
        "workload": "16 independently-seeded unet16 members, ensemble+TTA "
                    "(reference deep-ensemble checkpoint groups, test_utils.py:296-376)",
        "recipe": {
            "tool": "python -m diffuncertainty_tpu.tools.train_bench_assets --model ensemble",
            "epochs": args.epochs,
            "precision": args.precision,
            "seeds": seeds,
            "data": "toy-128 fixture seed 1234 (data/toy.py)",
        },
        "member_param_digests_sha256_16": digests,
        "ensemble_quality": q_ens,
        "member_quality": q_members,
        "member_dice_spread": {
            "min": min(q["dice"] for q in q_members),
            "max": max(q["dice"] for q in q_members),
        },
        "weights_not_committed_because":
            "16 x ~60 MB checkpoints; recipe above reproduces them "
            "deterministically. Live bench quality for the stacked-member "
            "path uses the SWAG-draw asset instead.",
    }
    out = Path(args.out) if args.out else REPO / "assets" / "ensemble16_quality.json"
    out.write_text(json.dumps(record, indent=2) + "\n")
    _log(f"recorded ensemble quality -> {out}")
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", default="diffusion",
                    choices=[*FAMILIES, "swag", "ensemble", "multiclass", "all"])
    ap.add_argument("--epochs", type=int, default=400)
    ap.add_argument("--precision", default="bf16")
    ap.add_argument("--data_dir", default="/tmp/bench_toy128")
    ap.add_argument("--n_members", type=int, default=16)
    ap.add_argument("--seed_base", type=int, default=2024)
    ap.add_argument("--out", default=None,
                    help="output path (default under assets/)")
    ap.add_argument("--extra", action="append", default=[],
                    help="additional dotted config overrides (smoke tests)")
    args = ap.parse_args(argv)

    if args.model == "all":
        for fam in ("ssn", "prob_unet", "hrnet"):
            train_single(fam, args)
        train_swag(args)
        train_ensemble(args)
    elif args.model == "swag":
        train_swag(args)
    elif args.model == "ensemble":
        train_ensemble(args)
    elif args.model == "multiclass":
        train_multiclass(args)
    else:
        train_single(args.model, args)


if __name__ == "__main__":
    main()
