"""CLI-level tests: train CLI end-to-end, test CLI job expansion."""

import json

import numpy as np
import pytest

from diffuncertainty_tpu.data.dataset import load_splits, save_splits
from diffuncertainty_tpu.data.toy import generate_toy_dataset
from diffuncertainty_tpu.infer.cli import build_parser, prepare_jobs
from diffuncertainty_tpu.infer.cli import main as infer_main
from diffuncertainty_tpu.train.cli import build_loaders, main as train_main, parse_args


@pytest.fixture(scope="module")
def toy_dir(tmp_path_factory):
    return generate_toy_dataset(
        tmp_path_factory.mktemp("toy"), num_train=12, num_val=4, num_test=4,
        num_ood=3, size=32, seed=0,
    )


SMALL = [
    "network.model_channels=8",
    "network.num_res_blocks=[1,1]",
    "network.channel_mult=[1,2]",
    "network.attention_resolutions=[-1]",
    "trainer.max_epochs=1",
    "data.batch_size=4",
]


def test_train_cli_end_to_end(toy_dir, tmp_path):
    train_main(
        ["data=toy64", "network=unet4", "model=softmax", "eu_method=none"]
        + SMALL
        + [f"save_dir={tmp_path}", f"data.data_input_dir={toy_dir}",
           "data.split_name=default", "exp_name=cli_test", "version=v1"]
    )
    workdir = tmp_path / "cli_test" / "v1"
    assert (workdir / "checkpoints" / "last" / "config.json").exists()
    # run dir is self-describing (reference hparams.yaml export)
    import yaml

    hp = yaml.safe_load((workdir / "hparams.yaml").read_text())
    assert hp["exp_name"] == "cli_test" and hp["data"]["batch_size"] == 4
    logs = [json.loads(l) for l in (workdir / "metrics.jsonl").read_text().splitlines()]
    assert "val_dice" in logs[-1]


def test_train_cli_env_override(toy_dir, tmp_path, monkeypatch):
    monkeypatch.setenv("DATASET_LOCATION", str(toy_dir.parent))
    monkeypatch.setenv("EXPERIMENT_LOCATION", str(tmp_path))
    cfg, special = parse_args(["data=toy64"])
    assert cfg.data.data_input_dir.endswith("/toy64")
    assert cfg.save_dir == str(tmp_path)
    # cluster job id becomes the run version when unset
    monkeypatch.setenv("LSB_JOBID", "424242")
    cfg2, _ = parse_args(["data=toy64"])
    assert str(cfg2.version) == "424242"
    # explicit version wins over the env var
    cfg3, _ = parse_args(["data=toy64", "version=myrun"])
    assert cfg3.version == "myrun"


def test_validation_ratio_carving(toy_dir, tmp_path):
    """With no val split, validation_ratio carves one out of train."""
    # write a splits file with only train + id
    splits_src = toy_dir / "splits" / "default" / "firstCycle" / "splits.pkl"
    fold = dict(load_splits(splits_src)[0])
    fold.pop("val")
    noval = tmp_path / "noval_splits.pkl"
    save_splits([fold], noval)
    cfg, _ = parse_args([
        "data=toy64", f"data.data_input_dir={toy_dir}",
        f"data.splits_path={noval}", "data.validation_ratio=0.25",
        "data.batch_size=4",
    ])
    train_loader, val_loader, train_eval_loader = build_loaders(cfg)
    assert len(val_loader.dataset) == 3  # round(12 * 0.25)
    assert len(train_loader.dataset) == 9
    assert not (set(train_loader.dataset.image_ids) & set(val_loader.dataset.image_ids))
    # evaluate_training_data mirror: val-sized subset of train ids
    assert train_eval_loader is not None
    assert len(train_eval_loader.dataset) == 3
    assert set(train_eval_loader.dataset.image_ids) <= set(train_loader.dataset.image_ids)


def test_infer_cli_job_expansion(tmp_path):
    for name in ("a", "b"):
        d = tmp_path / name / "v0" / "checkpoints" / "last"
        d.mkdir(parents=True)
    args = build_parser().parse_args([
        "--checkpoint_paths", str(tmp_path / "*" / "v0" / "checkpoints" / "last"),
        "--test_split", "id", "ood_noise", "--ema_mode", "both",
    ])
    jobs = prepare_jobs(args)
    # 2 ckpts x 2 ema modes (splits stay within a job)
    assert len(jobs) == 4
    assert all(len(j["checkpoints"]) == 1 for j in jobs)
    assert {j["use_ema"] for j in jobs} == {False, True}
    assert jobs[0]["version"] == "v0"

    args2 = build_parser().parse_args([
        "--checkpoint_paths", str(tmp_path / "*" / "v0" / "checkpoints" / "last"),
        "--ensemble_mode",
    ])
    jobs2 = prepare_jobs(args2)
    assert len(jobs2) == 1 and len(jobs2[0]["checkpoints"]) == 2


def test_infer_cli_end_to_end(toy_dir, tmp_path):
    train_main(
        ["data=toy64", "network=unet4", "model=softmax", "eu_method=dropout"]
        + SMALL
        + [f"save_dir={tmp_path}", f"data.data_input_dir={toy_dir}",
           "data.split_name=default", "exp_name=cli_inf", "version=v1"]
    )
    ckpt = tmp_path / "cli_inf" / "v1" / "checkpoints" / "last"
    summaries = infer_main([
        "--checkpoint_paths", str(ckpt),
        "--test_split", "id",
        "--n_pred", "1", "--n_models", "2", "--test_batch_size", "4",
        "--save_dir", str(tmp_path / "results"),
        "--include_eval",
    ])
    assert summaries[0]["n_images"] == 4
    from pathlib import Path

    out_dir = Path(summaries[0]["out_dir"])
    assert (out_dir / "metrics.json").exists()
    assert (out_dir / "aggregated_TU.json").exists()  # include_eval chain ran
    assert (out_dir / "failure_detection.json").exists()


def test_enable_compile_cache(tmp_path, monkeypatch):
    from diffuncertainty_tpu.utils import enable_compile_cache

    target = tmp_path / "xla_cache"
    assert enable_compile_cache(str(target)) == str(target)
    assert target.is_dir()
    # env override
    monkeypatch.setenv("DU_COMPILE_CACHE", str(tmp_path / "via_env"))
    assert enable_compile_cache() == str(tmp_path / "via_env")
    # empty env disables without touching config
    monkeypatch.setenv("DU_COMPILE_CACHE", "")
    assert enable_compile_cache() is None
