#!/usr/bin/env python
"""Benchmark: N=16-sample ensemble+TTA uncertainty inference, LIDC-2D shapes.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Workload (BASELINE.json): unet16 backbone @ 128x128, 16 stochastic samples
(MC-dropout members with on-device TTA), fused C2 heatmaps — the reference's
standard inference configuration (``test_utils.py:80,90,151`` scaled to 16
samples).

Timing methodology (axon-tunnel TPU): the tunnel adds ~1s RPC round-trip per
host sync and ``block_until_ready`` returns early, so each measurement chains
K batches inside one jitted ``lax.fori_loop`` ending in a scalar checksum;
per-batch time is the slope between K=1 and K=KBIG (RTT and dispatch cancel).

``vs_baseline`` compares against the same workload structured the
reference's way — a sequential loop of 16 independent single-sample
(member) programs per batch (``test_2D.py:1121-1280``), also chained and
slope-timed, so the ratio isolates the framework-level change (vmapped
member axis + fused TTA/heatmaps vs loop of forwards) from dispatch noise.
The reference's additional CPU<->GPU model hopping and cv2 host warps are
NOT charged to the baseline — the ratio is conservative.
"""

import json
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def _log(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)

from diffuncertainty_tpu.core.config import load_config
from diffuncertainty_tpu.models.factory import build_model
from diffuncertainty_tpu.ops.entropy import uncertainty_heatmaps
from diffuncertainty_tpu.sampling import SamplerSpec, TTAConfig, make_sampler

# BENCH_SMOKE=1 shrinks the workload for CI smoke runs (CPU-feasible)
_SMOKE = os.environ.get("BENCH_SMOKE") == "1"
BATCH = 4 if _SMOKE else 16
HW = 32 if _SMOKE else 128
N_SAMPLES = 4 if _SMOKE else 16
KBIG = 3 if _SMOKE else 9
REPEATS = 1 if _SMOKE else 3


def slope_time(fn_k, params, images):
    """Per-batch seconds from the K=1 vs K=KBIG slope (median of repeats)."""

    def run(k_static, seed):
        t0 = time.perf_counter()
        float(fn_k(params, images, jax.random.key(seed), k_static))
        return time.perf_counter() - t0

    # compile both K variants
    _log("compiling K=1 ...")
    t = run(1, 0)
    _log(f"K=1 compile+run {t:.1f}s; compiling K={KBIG} ...")
    t = run(KBIG, 0)
    _log(f"K={KBIG} compile+run {t:.1f}s; timing ...")
    diffs = []
    for r in range(REPEATS):
        t1 = run(1, 10 + r)
        tk = run(KBIG, 100 + r)
        diffs.append((tk - t1) / (KBIG - 1))
    return float(np.median(diffs))


def main():
    overrides = ["data.batch_size=%d" % BATCH]
    if _SMOKE:
        overrides += ["network.model_channels=8", "network.num_res_blocks=[1,1]",
                      "network.channel_mult=[1,2]", "network.attention_resolutions=[-1]"]
    cfg = load_config(
        data="lidc128", network="unet16", model="softmax", eu_method="dropout",
        overrides=overrides,
    )
    built = build_model(cfg)

    rng = jax.random.key(0)
    images = jax.random.uniform(rng, (BATCH, HW, HW, 3), jnp.float32)
    init_rngs = {"params": rng, "dropout": jax.random.fold_in(rng, 1)}
    params = built.module.init(init_rngs, images)

    tta_cfg = TTAConfig(hflip_p=0.5, rotation_limit=22.5, scale_limit=(-0.2, 0.2))
    fused_sampler = make_sampler(built, SamplerSpec(
        n_pred=1, n_members=N_SAMPLES, member_mode="dropout",
        tta=True, tta_config=tta_cfg,
    ))
    single_sampler = make_sampler(built, SamplerSpec(
        n_pred=1, n_members=1, member_mode="dropout", tta=True, tta_config=tta_cfg,
    ))

    from functools import partial

    @partial(jax.jit, static_argnums=(3,))
    def fused_k(params, images, key, k):
        def body(i, acc):
            stack = fused_sampler(params, images, jax.random.fold_in(key, i))
            maps = uncertainty_heatmaps(stack.group_means, sample_axis=0, class_axis=-1)
            return acc + jnp.sum(stack.mean) + jnp.sum(maps["TU"])
        return jax.lax.fori_loop(0, k, body, 0.0)

    @partial(jax.jit, static_argnums=(3,))
    def looped_k(params, images, key, k):
        """Reference structure: sequential member loop inside each batch."""

        def batch_body(i, acc):
            bkey = jax.random.fold_in(key, i)

            def member_body(m, mean_acc):
                s = single_sampler(params, images, jax.random.fold_in(bkey, m))
                return mean_acc + s.mean

            mean = jax.lax.fori_loop(
                0, N_SAMPLES, member_body,
                jnp.zeros((BATCH, HW, HW, built.num_classes)),
            ) / N_SAMPLES
            tu = -jnp.sum(jnp.where(mean > 0, mean * jnp.log(mean), 0.0), axis=-1)
            return acc + jnp.sum(mean) + jnp.sum(tu)

        return jax.lax.fori_loop(0, k, batch_body, 0.0)

    fused_per_batch = slope_time(fused_k, params, images)
    ref_per_batch = slope_time(looped_k, params, images)

    fused_ips = BATCH / fused_per_batch
    ref_ips = BATCH / ref_per_batch

    result = {
        "metric": "images/sec/chip, 16-sample ensemble+TTA uncertainty inference, LIDC-2D 128px",
        "value": round(fused_ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(fused_ips / ref_ips, 3),
        "p50_latency_ms": round(fused_per_batch * 1000, 2),
        "baseline_images_per_sec": round(ref_ips, 2),
        "baseline_def": "same workload as a sequential loop of 16 single-member programs per batch (reference pipeline structure), slope-timed on the same device",
        "timing": "per-batch slope between 1-batch and %d-batch device-chained runs (tunnel RTT cancels)" % KBIG,
        "device": str(jax.devices()[0]),
        "batch": BATCH,
        "n_samples": N_SAMPLES,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
