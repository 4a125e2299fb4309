"""Train the benchmark checkpoint assets on the deterministic toy-128 set.

Reproducibly regenerates the ``assets/bench_*.npz`` weights the benchmark
(`bench.py`) uses for its "at matched AURC/ECE" quality evaluation
(BASELINE.md; reference workload definition
``unc_mod_utils/test_utils.py:80,90,151``):

    python -m diffuncertainty_tpu.tools.train_bench_assets --model softmax
    python -m diffuncertainty_tpu.tools.train_bench_assets --model diffusion

Trains unet16 on the toy-128 controlled fixture (seed 1234 — the same tree
``bench.py`` evaluates) and saves the EMA weights as a flat npz
(`tools/bench_weights.py`). softmax trains with MC-dropout (the headline
bench path); diffusion trains the continuous-diffusion objective (the
namesake path, ``models/diffusion.py``).
"""

from __future__ import annotations

import argparse
import sys
import tempfile
from pathlib import Path

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REPO = Path(__file__).resolve().parents[2]


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", choices=["softmax", "diffusion"], default="diffusion")
    ap.add_argument("--epochs", type=int, default=400)
    ap.add_argument("--precision", default="bf16")
    ap.add_argument("--data_dir", default="/tmp/bench_toy128")
    ap.add_argument("--out", default=None, help="npz path (default assets/bench_unet16_toy128[_diffusion].npz)")
    args = ap.parse_args(argv)

    from ..core.config import load_config
    from ..data.toy import generate_toy_dataset
    from ..train.cli import build_loaders
    from ..train.loop import Trainer
    from .bench_weights import save_params_npz

    toy = generate_toy_dataset(
        Path(args.data_dir), num_train=128, num_val=16, num_test=32,
        num_ood=16, num_raters=4, size=128, seed=1234,
    )

    eu = "dropout" if args.model == "softmax" else "none"
    cfg = load_config(
        data="toy64", network="unet16", model=args.model, eu_method=eu,
        overrides=[
            f"data.data_input_dir={toy}",
            "data.batch_size=16",
            "data.augmentations.height=128", "data.augmentations.width=128",
            # bench.py builds its model from the lidc128 config and normalizes
            # eval inputs with that config's (ImageNet) stats — train with the
            # same stats so the asset and the bench agree
            "data.augmentations.mean=[0.485,0.456,0.406]",
            "data.augmentations.std=[0.229,0.224,0.225]",
            f"trainer.max_epochs={args.epochs}",
            f"trainer.precision={args.precision}",
            "trainer.val_every_n_epochs=50",
            # pulling the full train state device->host every epoch dominates
            # these short 8-step epochs through the tunnel
            "ckpt_save_freq.last_every_n_epochs=50",
        ],
    )
    trainer = Trainer(cfg, workdir=tempfile.mkdtemp(prefix="bench_asset_"))
    train_loader, val_loader, _ = build_loaders(cfg)

    state = trainer.fit(train_loader, val_loader)
    params = state.ema_params if state.ema_params is not None else state.params

    out = Path(args.out) if args.out else (
        REPO / "assets" / (
            "bench_unet16_toy128.npz" if args.model == "softmax"
            else "bench_unet16_toy128_diffusion.npz"))
    save_params_npz(params, out)
    print(f"saved {args.model} asset -> {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
