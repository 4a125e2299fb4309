#!/usr/bin/env python
"""End-to-end demo of the full ValUES-equivalent pipeline on synthetic data.

Runs in a few minutes on CPU (or one TPU chip):

1. generate a controlled toy dataset (known aleatoric ambiguity + OoD shifts)
2. train two uncertainty methods briefly:
   - softmax AU x MC-dropout EU
   - SSN AU x none
3. run fused uncertainty inference (samples + heatmaps + metrics in one
   program) on id / ood_noise / val splits
4. evaluate: C3 aggregation, failure detection (AURC), paired OoD detection
   (AUROC), calibration (ACE/ECE), ambiguity (NCC), AL second-cycle splits
5. report: seed-grouped table + LaTeX + barplot + qualitative grids

Usage: python examples/full_pipeline_demo.py [workdir] [--epochs N] [--cpu]
"""

import argparse
import sys
from pathlib import Path

# runnable from anywhere without installation
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir", nargs="?", default="/tmp/diffunc_demo")
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--cpu", action="store_true", help="force CPU (8 virtual devices)")
    args = ap.parse_args()

    if args.cpu:
        import os

        os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
        import jax

        jax.config.update("jax_platforms", "cpu")

    from diffuncertainty_tpu.core.config import load_config
    from diffuncertainty_tpu.data import BatchLoader, MultiRaterDataset
    from diffuncertainty_tpu.data.toy import generate_toy_dataset
    from diffuncertainty_tpu.evaln import EvalRunner
    from diffuncertainty_tpu.evaln.al_splits import generate_second_cycle_splits
    from diffuncertainty_tpu.evaln.runner import run_ood_detection
    from diffuncertainty_tpu.evaln.visualization import (
        barplot, collect_results, plot_prediction_grid, task_table, to_latex,
    )
    from diffuncertainty_tpu.infer import InferenceConfig, UncertaintyInference
    from diffuncertainty_tpu.train import Trainer

    work = Path(args.workdir)
    work.mkdir(parents=True, exist_ok=True)
    print(f"== workdir {work}")

    # 1. data ---------------------------------------------------------------
    toy = generate_toy_dataset(work / "toy", num_train=48, num_val=12,
                               num_test=16, num_ood=16, size=32, seed=0)
    splits = toy / "splits" / "default" / "firstCycle" / "splits.pkl"
    print("== toy dataset generated")

    small_net = [
        "network.model_channels=8", "network.num_res_blocks=[1,1]",
        "network.channel_mult=[1,2]", "network.attention_resolutions=[-1]",
        "model.n_aleatoric_samples=4", "trainer.learning_rate=0.003",
        f"trainer.max_epochs={args.epochs}", "data.batch_size=8",
        f"save_dir={work / 'saves'}", f"data.data_input_dir={toy}",
        "data.split_name=default",
    ]

    # 2. train two methods --------------------------------------------------
    runs = {}
    for model, eu in (("softmax", "dropout"), ("ssn", "none")):
        cfg = load_config(data="toy64", network="unet4", model=model,
                          eu_method=eu, overrides=small_net)
        trainer = Trainer(cfg)
        train_ds = MultiRaterDataset(splits, toy, split="train", return_all_raters=False)
        val_ds = MultiRaterDataset(splits, toy, split="val")
        trainer.fit(
            BatchLoader(train_ds, 8, shuffle=True, drop_last=True),
            BatchLoader(val_ds, 8),
        )
        runs[f"{model}_{eu}"] = trainer.workdir / "checkpoints" / "last"
        print(f"== trained {model} x {eu}")

    # 3. inference ----------------------------------------------------------
    versions = {}
    infs = {}
    for name, ckpt in runs.items():
        icfg = InferenceConfig(n_pred=4, n_models=4, batch_size=8,
                               save_dir=str(work / "results"), use_ema=True)
        inf = UncertaintyInference([ckpt], icfg)
        for split in ("id", "ood_noise", "val"):
            summary = inf.run_split(split)
            print(f"   {name}/{split}: {summary['n_images']} images "
                  f"@ {summary['images_per_sec']:.1f} img/s")
        versions[name] = inf.split_dir("id")
        infs[name] = inf

    # 4. evaluation ---------------------------------------------------------
    def ds_for(split):
        return MultiRaterDataset(splits, toy, split=split)

    for name, inf in infs.items():
        for split in ("id", "ood_noise", "val"):
            EvalRunner(inf.split_dir(split), ds_for(split), ignore_value=-1).run(
                ["threshold", "area", "aggregation"]
            )
        EvalRunner(inf.split_dir("id"), ds_for("id"),
                   val_split_dir=inf.split_dir("val"), val_dataset=ds_for("val"),
                   ignore_value=-1).run(
            ["failure_detection", "ambiguity_modeling", "calibration"]
        )
        res = run_ood_detection(inf.split_dir("id"), inf.split_dir("ood_noise"))
        key = next(iter(res))
        auroc = res[key]["mean"]["TU"]["image_level"]["metrics"]["auroc"]
        print(f"== {name}: OoD AUROC (TU/image_level) = {auroc:.3f}")

    # AL second cycle
    queried = generate_second_cycle_splits(
        splits, infs["softmax_dropout"].split_dir("ood_noise") / "aggregated_TU.json",
        work / "second_cycle_splits.pkl", pool_split="ood_noise",
        strategy="uncertainty",
    )
    print(f"== AL: queried {len(queried)} most-uncertain pool samples for cycle 2")

    # 5. reporting ----------------------------------------------------------
    df = collect_results(versions)
    table = task_table(df, group_seeds=False)
    print(table.round(4).to_string())
    (work / "results_table.tex").write_text(to_latex(table))
    barplot(df, metric="aurc", task="failure_detection", out_path=work / "aurc.png")
    raw = infs["softmax_dropout"].collect_raw_predictions("id", num_images=3)
    plot_prediction_grid(raw, work / "prediction_grid.png")
    print(f"== artifacts: {work}/results_table.tex, aurc.png, prediction_grid.png")


if __name__ == "__main__":
    main()
