#!/usr/bin/env python
"""Benchmark: N=16-sample ensemble+TTA uncertainty inference, LIDC-2D shapes.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Workload (BASELINE.json): unet16 backbone @ 128x128, 16 stochastic samples
(MC-dropout members with on-device TTA), fused C2 heatmaps — the reference's
standard inference configuration (``test_utils.py:80,90,151`` defaults scaled
to 16 samples).

``vs_baseline`` compares the fused TPU-native pipeline against the same
workload structured the way the reference runs it — a Python loop of
independent single-sample forward programs with host-side mean/entropy
reduction — on the SAME device. That isolates the framework-level speedup
(vmapped member axis + fused warps/metrics vs loop-of-forwards) from raw
hardware differences; the reference repo publishes no numbers to compare
against directly (BASELINE.md).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from diffuncertainty_tpu.core.config import load_config
from diffuncertainty_tpu.models.factory import build_model
from diffuncertainty_tpu.ops.entropy import uncertainty_heatmaps
from diffuncertainty_tpu.sampling import SamplerSpec, TTAConfig, make_sampler

BATCH = 16
HW = 128
N_SAMPLES = 16
TIMED_ITERS = 10


def main():
    cfg = load_config(
        data="lidc128", network="unet16", model="softmax", eu_method="dropout",
        overrides=["data.batch_size=%d" % BATCH],
    )
    built = build_model(cfg)

    rng = jax.random.key(0)
    images = jax.random.uniform(rng, (BATCH, HW, HW, 3), jnp.float32)
    init_rngs = {"params": rng, "dropout": jax.random.fold_in(rng, 1)}
    params = built.module.init(init_rngs, images)

    tta_cfg = TTAConfig(hflip_p=0.5, rotation_limit=22.5, scale_limit=(-0.2, 0.2))
    spec = SamplerSpec(
        n_pred=1, n_members=N_SAMPLES, member_mode="dropout",
        tta=True, tta_config=tta_cfg,
    )
    sampler = make_sampler(built, spec)

    # NOTE on timing: on the axon-tunneled TPU, jax.block_until_ready returns
    # before remote execution finishes; fetching a device-reduced SCALAR is
    # the only reliable sync, and it also keeps tunnel bandwidth out of the
    # measurement (we measure device compute, the images/sec/chip quantity).
    @jax.jit
    def fused(params, images, key):
        stack = sampler(params, images, key)
        maps = uncertainty_heatmaps(stack.group_means, sample_axis=0, class_axis=-1)
        return (
            jnp.sum(stack.mean) + jnp.sum(maps["TU"]) + jnp.sum(maps["AU"]) + jnp.sum(maps["EU"])
        )

    # ---- fused timing ----
    float(fused(params, images, jax.random.key(1)))  # compile + warm
    times = []
    for i in range(TIMED_ITERS):
        t0 = time.perf_counter()
        float(fused(params, images, jax.random.key(2 + i)))
        times.append(time.perf_counter() - t0)
    fused_p50 = float(np.percentile(times, 50))
    fused_ips = BATCH / fused_p50

    # ---- reference-structured baseline: a python loop of N independent
    # single-sample programs (the torch pipeline shape: one forward per
    # sample per batch, test_2D.py:1121-1280). Conservative in our favor:
    # the reduction stays on device instead of the reference's host-side
    # stacking, so the loop penalty measured is purely program-structure. ----
    single_spec = SamplerSpec(n_pred=1, n_members=1, member_mode="dropout",
                              tta=True, tta_config=tta_cfg)
    single = make_sampler(built, single_spec)

    @jax.jit
    def one_sample_acc(params, images, key, acc):
        return acc + single(params, images, key).mean

    @jax.jit
    def finish(acc):
        mean = acc / N_SAMPLES
        tu = -jnp.sum(jnp.where(mean > 0, mean * jnp.log(mean), 0.0), axis=-1)
        return jnp.sum(mean) + jnp.sum(tu)

    acc0 = jnp.zeros((BATCH, HW, HW, built.num_classes))
    float(finish(one_sample_acc(params, images, jax.random.key(0), acc0)))  # warm

    def looped(key):
        acc = acc0
        for i in range(N_SAMPLES):
            acc = one_sample_acc(params, images, jax.random.fold_in(key, i), acc)
        return float(finish(acc))

    looped(jax.random.key(1))  # warm path
    times_ref = []
    for i in range(max(3, TIMED_ITERS // 2)):
        t0 = time.perf_counter()
        looped(jax.random.key(10 + i))
        times_ref.append(time.perf_counter() - t0)
    ref_p50 = float(np.percentile(times_ref, 50))
    ref_ips = BATCH / ref_p50

    result = {
        "metric": "images/sec/chip, 16-sample ensemble+TTA uncertainty inference, LIDC-2D 128px",
        "value": round(fused_ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(fused_ips / ref_ips, 2),
        "p50_latency_ms": round(fused_p50 * 1000, 2),
        "baseline_images_per_sec": round(ref_ips, 2),
        "baseline_def": "same workload as a python loop of N independent single-sample programs (reference pipeline structure) on the same device, with device-side accumulation (conservative)",
        "device": str(jax.devices()[0]),
        "batch": BATCH,
        "n_samples": N_SAMPLES,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
