#!/usr/bin/env python
"""Benchmark: N=16-sample ensemble+TTA uncertainty inference, LIDC-2D shapes.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...};
the diffusion-sampler measurement is nested under "diffusion_sampler".

Workload (BASELINE.json): unet16 backbone @ 128x128, 16 stochastic samples
(MC-dropout members with on-device TTA), fused C2 heatmaps — the reference's
standard inference configuration (``test_utils.py:80,90,151`` scaled to 16
samples). A second line times the continuous-diffusion sampler (16 DDIM
trajectories x 10 steps, ``models/diffusion.py:366-410`` equivalent).

Quality ("at matched AURC/ECE", BASELINE.md): when the trained checkpoint
asset ``assets/bench_unet16_toy128.npz`` is present, the bench evaluates the
deterministic toy-128 test split through BOTH the exact path (fp32, XLA
attention, composed-resample TTA warp) and the fast path (bf16, VMEM Pallas
attention, separable TTA warp) and reports Dice/GED/AURC/ECE side by side —
the headline throughput is the fast path, and the deltas quantify that speed
did not change the uncertainty quality. See PARITY.md.

Timing methodology (axon-tunnel TPU): the tunnel adds ~1s RPC round-trip per
host sync and ``block_until_ready`` returns early, so each measurement chains
K batches inside one jitted ``lax.fori_loop`` ending in a scalar checksum;
per-batch time is the slope between K=1 and K=KBIG (RTT and dispatch cancel).

``vs_baseline`` compares against the same workload structured the
reference's way — a sequential loop of 16 independent single-sample
(member) programs per batch (``test_2D.py:1121-1280``), also chained and
slope-timed, so the ratio isolates the framework-level change (fused member
axis + on-device TTA/heatmaps vs loop of forwards) from dispatch noise.
The reference's additional CPU<->GPU model hopping and cv2 host warps are
NOT charged to the baseline — the ratio is conservative.

Robustness (round 5): a provisional self-contained headline is emitted as a
flushed stdout line right after the first measurements and re-emitted after
every completed family (last line wins for the driver's parser), a
wall-clock budget (``BENCH_BUDGET_S``, default 1200s) skips remaining
families instead of overrunning, the compile cache is repo-local, and
``BENCH_SMOKE=1`` forces the CPU platform so the whole path is exercisable
without the chip. The headline also carries ``mfu`` (XLA-counted FLOPs /
measured time / v5e bf16 peak).
"""

import json
import os
import sys
import time
from functools import partial
from pathlib import Path

# BENCH_SMOKE=1 shrinks the workload AND forces the CPU platform (the
# container's sitecustomize registers the axon TPU plugin regardless of env
# vars, so only jax.config can switch platforms — tests/conftest.py does the
# same). Must be decided before the backend initializes.
_SMOKE = os.environ.get("BENCH_SMOKE") == "1"

import jax

if _SMOKE:
    jax.config.update("jax_platforms", "cpu")
# Durable compile cache: /tmp does not reliably survive to the driver's
# session (BENCH_r04 hit a 553s cold compile despite a same-day warm run), so
# the cache lives in a repo-local gitignored dir. Per-session cold compiles
# can still happen when code changes invalidate entries — the provisional
# headline + wall-clock budget below make the run survive them.
jax.config.update(
    "jax_compilation_cache_dir",
    str(Path(__file__).resolve().parent / (".jax_cache_cpu" if _SMOKE else ".jax_cache")),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

# Wall-clock budget: when exceeded, remaining benchmark families are skipped
# (each skip logged + recorded) and the final headline prints with whatever
# exists, so one slow compile can never erase the round's evidence again.
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1200"))
_T0 = time.monotonic()


def _elapsed():
    return time.monotonic() - _T0


def _budget_left(need_s, tag, skipped):
    """True when ``need_s`` more seconds plausibly fit in the budget."""
    left = BUDGET_S - _elapsed()
    if left >= need_s:
        return True
    _log(f"{tag}: SKIPPED (budget: {left:.0f}s left < ~{need_s:.0f}s needed)")
    skipped.append({"family": tag, "budget_left_s": round(left, 1)})
    return False


def _log(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


from diffuncertainty_tpu.core.config import load_config
from diffuncertainty_tpu.models.factory import build_model
from diffuncertainty_tpu.ops.entropy import uncertainty_heatmaps
from diffuncertainty_tpu.sampling import SamplerSpec, TTAConfig, make_sampler

REPO = Path(__file__).resolve().parent
CKPT = REPO / "assets" / "bench_unet16_toy128.npz"

BATCH = 4 if _SMOKE else 16
HW = 32 if _SMOKE else 128
N_SAMPLES = 4 if _SMOKE else 16
KBIG = 3 if _SMOKE else 9
REPEATS = 1 if _SMOKE else 3
SMALL_NET = [
    "network.model_channels=8", "network.num_res_blocks=[1,1]",
    "network.channel_mult=[1,2]", "network.attention_resolutions=[-1]",
] if _SMOKE else []

TTA_CFG = TTAConfig(hflip_p=0.5, rotation_limit=22.5, scale_limit=(-0.2, 0.2))
TTA_EXACT = TTAConfig(hflip_p=0.5, rotation_limit=22.5, scale_limit=(-0.2, 0.2),
                      separable_warp=False)


def build(precision):
    cfg = load_config(
        data="lidc128", network="unet16", model="softmax", eu_method="dropout",
        overrides=["data.batch_size=%d" % BATCH, "trainer.precision=%s" % precision]
        + SMALL_NET,
    )
    return build_model(cfg), cfg


def slope_time(fn_k, args, tag, batch=None):
    """Per-batch seconds from the K=1 vs K=KBIG slope (median of repeats)."""
    batch = BATCH if batch is None else batch

    def run(k_static, seed):
        t0 = time.perf_counter()
        float(fn_k(*args, jax.random.key(seed), k_static))
        return time.perf_counter() - t0

    _log(f"{tag}: compiling K=1 ...")
    t = run(1, 0)
    _log(f"{tag}: K=1 compile+run {t:.1f}s; compiling K={KBIG} ...")
    t = run(KBIG, 0)
    _log(f"{tag}: K={KBIG} compile+run {t:.1f}s; timing ...")
    diffs, tks = [], []
    for r in range(REPEATS):
        t1 = run(1, 10 + r)
        tk = run(KBIG, 100 + r)
        diffs.append((tk - t1) / (KBIG - 1))
        tks.append(tk)
    per = float(np.median(diffs))
    if per <= 0:
        # host-contention noise can make the K=1 run slower than K=KBIG
        # (seen in CPU smoke runs); fall back to the chained-run mean, a
        # positive upper bound on per-batch time
        per = float(np.median(tks)) / KBIG
        _log(f"{tag}: non-positive slope (timing noise); "
             f"falling back to chained mean")
    _log(f"{tag}: {per * 1000:.1f} ms/batch -> {batch / per:.1f} img/s")
    return per


def load_asset(path, ref_params):
    """Load an npz checkpoint asset if it matches ``ref_params``' structure,
    leaf shapes, AND post-cast dtypes (a path-only check would pass a stale
    asset from an older network config and silently change bench numerics).

    Assets may be stored float16 for repo size (tools/bench_weights.py);
    loading promotes them back to float32 before the comparison.
    """
    if not path.exists() or _SMOKE:
        return None
    from diffuncertainty_tpu.tools.bench_weights import load_params_npz

    loaded = load_params_npz(path)  # promotes float16 storage to float32
    ref = {p: (v.shape, v.dtype)
           for p, v in jax.tree_util.tree_flatten_with_path(ref_params)[0]}
    got = {p: (v.shape, np.asarray(v).dtype)
           for p, v in jax.tree_util.tree_flatten_with_path(loaded)[0]}
    if ref != got:
        _log(f"{path.name}: asset structure/shape/dtype mismatch; using random init")
        return None
    return jax.tree.map(jnp.asarray, loaded)


def load_params(built, rng, images):
    """Trained checkpoint asset if present, else random init."""
    init_rngs = {"params": rng, "dropout": jax.random.fold_in(rng, 1)}
    params = built.module.init(init_rngs, images)
    loaded = load_asset(CKPT, params)
    if loaded is not None:
        return loaded, "trained(toy128)"
    return params, "random-init"


def make_fused_k(built, sampler):
    @partial(jax.jit, static_argnums=(3,))
    def fused_k(params, images, key, k):
        def body(i, acc):
            stack = sampler(params, images, jax.random.fold_in(key, i))
            maps = uncertainty_heatmaps(stack.group_means, sample_axis=0, class_axis=-1)
            return (acc + jnp.sum(stack.mean.astype(jnp.float32))
                    + jnp.sum(maps["TU"].astype(jnp.float32)))
        return jax.lax.fori_loop(0, k, body, 0.0)

    return fused_k


def make_looped_k(built, single_sampler):
    """Reference structure: sequential member loop inside each batch."""

    @partial(jax.jit, static_argnums=(3,))
    def looped_k(params, images, key, k):
        def batch_body(i, acc):
            bkey = jax.random.fold_in(key, i)

            def member_body(m, mean_acc):
                s = single_sampler(params, images, jax.random.fold_in(bkey, m))
                return mean_acc + s.mean.astype(jnp.float32)

            mean = jax.lax.fori_loop(
                0, N_SAMPLES, member_body,
                jnp.zeros((BATCH, HW, HW, built.num_classes)),
            ) / N_SAMPLES
            tu = -jnp.sum(jnp.where(mean > 0, mean * jnp.log(mean), 0.0), axis=-1)
            return acc + jnp.sum(mean) + jnp.sum(tu)

        return jax.lax.fori_loop(0, k, batch_body, 0.0)

    return looped_k


V5E_PEAK_BF16 = 197e12  # TPU v5e (v5 lite) peak bf16 FLOP/s per chip


def measure_mfu(fused_k, args, per_batch_s):
    """MFU of the headline program from XLA's own FLOP count.

    Cost-analyses the lowered K=1 fused program (the analytic-FLOPs
    equivalent of the reference's thop attention hook,
    ``diff_unet2D_module.py:824-845``, extended to the whole program) and
    divides achieved FLOP/s by the v5e bf16 peak — the single absolute
    number that lets a reader check "fast" against the roofline without
    trusting the vs_baseline ratio chain.
    """
    def _flops_from(ca):
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else None
        if not ca or "flops" not in ca:
            return None
        return float(ca["flops"])

    flops = None
    try:
        lowered = fused_k.lower(*args, jax.random.key(0), 1)
        flops = _flops_from(lowered.cost_analysis())
        if flops is None:
            # the axon backend returns None for lowered cost analysis; the
            # COMPILED executable's analysis works (and the K=1 compile is
            # already cached by the measurement that just ran)
            flops = _flops_from(lowered.compile().cost_analysis())
    except Exception as exc:  # backend without any cost analysis
        _log(f"mfu: cost analysis unavailable ({exc})")
        return None
    if flops is None:
        _log("mfu: cost analysis returned no FLOP count")
        return None
    achieved = flops / per_batch_s
    out = {
        "flops_per_batch": flops,
        "achieved_tflops": round(achieved / 1e12, 4),
        "source": "XLA HLO cost analysis of the K=1 fused program",
    }
    if not _SMOKE:
        out["mfu_vs_v5e_bf16_peak"] = round(achieved / V5E_PEAK_BF16, 4)
    _log(f"mfu: {flops / 1e9:.1f} GFLOP/batch -> "
         f"{achieved / 1e12:.2f} TFLOP/s achieved"
         + ("" if _SMOKE else f" = {achieved / V5E_PEAK_BF16:.1%} of v5e bf16 peak"))
    return out


_FAMILY_KEYS = ("ensemble_stack", "ssn", "prob_unet", "hrnet",
                "diffusion_sampler", "full_frame_multiclass")


def emit_headline(result, partial):
    """Print the compact self-contained headline as one flushed stdout line.

    Called with ``partial=True`` right after the first measurements and again
    after every completed family: the driver's parser takes the LAST line, so
    a timeout/kill at any later point still leaves the freshest parseable
    record (BENCH_r04 died in a 553s cold compile with nothing emitted).
    """
    headline = {k: result[k] for k in (
        "metric", "value", "unit", "vs_baseline", "p50_latency_ms",
        "latency_batch1_ms", "baseline_images_per_sec", "weights", "mfu")
        if k in result}
    if "vs_faithful_baseline" in result:
        headline["vs_faithful_baseline"] = result["vs_faithful_baseline"]
        headline["faithful_baseline_images_per_sec"] = (
            result["faithful_baseline"]["images_per_sec"])
    headline["families"] = {
        name: result[name]["value"]
        for name in _FAMILY_KEYS
        if isinstance(result.get(name), dict) and "value" in result[name]
    }
    headline["family_quality"] = {
        name: {m: result[name]["quality"][m]
               for m in ("dice", "ged_bma", "aurc", "ece", "dice_macro",
                         "ged_multiclass", "ncc_tu_vs_analytic")
               if m in result[name].get("quality", {})}
        for name in _FAMILY_KEYS
        if isinstance(result.get(name), dict) and "quality" in result[name]
    }
    if "quality_fast" in result:
        headline["quality"] = result["quality_fast"]
    if result.get("skipped_families"):
        headline["skipped_families"] = result["skipped_families"]
    headline["elapsed_s"] = round(_elapsed(), 1)
    if partial:
        headline["partial"] = True
    else:
        headline["detail"] = "full per-family record on the previous stdout line"
    print(json.dumps(headline), flush=True)


def quality_eval(built, sampler, params, tag, data_cfg):
    """Dice/GED/AURC/ECE on the deterministic toy-128 test split."""
    from diffuncertainty_tpu.tools.quality import toy128_quality_eval

    return toy128_quality_eval(
        built, sampler, params, data_cfg, batch=BATCH, hw=HW, log=_log, tag=tag)


def _probe_devices(timeout_s=300):
    """Fail fast when the TPU tunnel is dead.

    The tunneled axon backend can hang *indefinitely* inside device
    discovery (observed: jax.devices() blocking >20 min on a hung tunnel).
    Probe discovery in a child process first so an unreachable chip yields a
    diagnostic JSON headline + exit 1 instead of an eternal hang. Costs one
    extra device discovery (~seconds) when the chip is healthy.
    """
    import subprocess

    try:
        proc = subprocess.run(
            [sys.executable, "-c", "import jax; print(len(jax.devices()))"],
            cwd=str(REPO), timeout=timeout_s, capture_output=True, text=True,
        )
        if proc.returncode == 0:
            _log(f"device probe OK ({proc.stdout.strip()} device(s))")
            return
        err = (proc.stderr or "").strip()[-400:] or f"rc={proc.returncode}"
    except subprocess.TimeoutExpired:
        err = (f"jax.devices() did not return within {timeout_s}s — "
               "TPU tunnel unreachable/hung; benchmark needs the real chip")
    print(json.dumps({
        "metric": "images/sec/chip, 16-sample ensemble+TTA uncertainty inference, LIDC-2D 128px",
        "value": None,
        "unit": "images/sec/chip",
        "vs_baseline": None,
        "error": err,
    }))
    sys.exit(1)


def main():
    if not _SMOKE:  # smoke runs are CPU-feasible and don't need the chip
        _probe_devices()
    rng = jax.random.key(0)
    images = jax.random.uniform(rng, (BATCH, HW, HW, 3), jnp.float32)

    built32, cfg32 = build("fp32")
    built16, _ = build("bf16")
    params, weights_kind = load_params(built32, rng, images)

    spec_fused = SamplerSpec(n_pred=1, n_members=N_SAMPLES, member_mode="dropout",
                             tta=True, tta_config=TTA_CFG)
    spec_single = SamplerSpec(n_pred=1, n_members=1, member_mode="dropout",
                              tta=True, tta_config=TTA_CFG)

    fast_sampler = make_sampler(built16, spec_fused)
    fused_fast_k = make_fused_k(built16, fast_sampler)
    looped_k = make_looped_k(built16, make_sampler(built16, spec_single))

    fast_per_batch = slope_time(fused_fast_k, (params, images), "fast(bf16) fused")
    ref_per_batch = slope_time(looped_k, (params, images), "baseline loop")

    fast_ips = BATCH / fast_per_batch
    ref_ips = BATCH / ref_per_batch

    # ---- faithful baseline: charge the reference's host-side TTA warps ----
    # The device-loop baseline above inherits our on-device TTA; the actual
    # reference warps every member's input AND inverse-warps every softmax on
    # the host with cv2 (test_2D.py:174-288) while the GPU idles. Measure
    # that host cost here (per batch: N_SAMPLES fwd warps of HxWx3 inputs +
    # N_SAMPLES inverse warps of HxWxC softmaxes + simplex renorm, per
    # image) and charge it to the loop baseline. The tunnel makes timing a
    # real host<->device round-trip per member unrepresentative (~1s RTT the
    # reference never pays), so transfers and Python dispatch stay uncharged
    # — the faithful number remains conservative.
    faithful = None
    try:
        import cv2

        rng_np = np.random.default_rng(0)
        imgs_np = np.asarray(rng_np.random((BATCH, HW, HW, 3)), np.float32)
        probs_np = np.asarray(rng_np.random((BATCH, HW, HW, 2)), np.float32)
        angles = rng_np.uniform(-22.5, 22.5, (N_SAMPLES, BATCH))
        scales = 1.0 + rng_np.uniform(-0.2, 0.2, (N_SAMPLES, BATCH))

        def host_warp_batch():
            for m in range(N_SAMPLES):
                for i in range(BATCH):
                    c, s = float(np.cos(angles[m, i])), float(scales[m, i])
                    mat = np.asarray([[c * s, 0.1, 1.0], [-0.1, c * s, -1.0]])
                    cv2.warpAffine(imgs_np[i], mat, (HW, HW),
                                   flags=cv2.INTER_LINEAR,
                                   borderMode=cv2.BORDER_CONSTANT)
                    back = cv2.warpAffine(probs_np[i], mat, (HW, HW),
                                          flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP,
                                          borderMode=cv2.BORDER_REPLICATE)
                    norm = back.sum(-1, keepdims=True)
                    np.divide(back, np.clip(norm, 1e-12, None), out=back)

        host_warp_batch()  # warm
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            host_warp_batch()
        warp_per_batch = (time.perf_counter() - t0) / reps
        faithful_per_batch = ref_per_batch + warp_per_batch
        faithful = {
            "images_per_sec": round(BATCH / faithful_per_batch, 2),
            "host_warp_ms_per_batch": round(warp_per_batch * 1000, 2),
            "def": "device member-loop + measured host cv2 warp cost "
                   "(2*N_SAMPLES warps+renorm per image per batch) charged "
                   "to the loop; host<->device transfers and per-member "
                   "dispatch remain UNcharged (tunnel RTT would overcharge)",
        }
        _log(f"faithful baseline: +{warp_per_batch * 1000:.1f} ms/batch host warps "
             f"-> {BATCH / faithful_per_batch:.1f} img/s")
    except Exception as exc:  # pragma: no cover
        _log(f"faithful-baseline host warp measurement skipped: {exc}")

    result = {
        "metric": "images/sec/chip, 16-sample ensemble+TTA uncertainty inference, LIDC-2D 128px",
        "value": round(fast_ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(fast_ips / ref_ips, 3),
        "p50_latency_ms": round(fast_per_batch * 1000, 2),
        "baseline_images_per_sec": round(ref_ips, 2),
        "baseline_def": "same workload as a sequential loop of 16 single-member programs per batch (reference pipeline structure), slope-timed on the same device",
        "timing": "per-batch slope between 1-batch and %d-batch device-chained runs (tunnel RTT cancels)" % KBIG,
        "device": str(jax.devices()[0]),
        "batch": BATCH,
        "n_samples": N_SAMPLES,
        "precision": "bf16 compute (fp32 params), VMEM Pallas attention, separable TTA warp",
        "weights": weights_kind,
        "round1_images_per_sec": 20.7,  # same workload, round-1 program (BENCH_r01)
    }
    if faithful is not None:
        result["faithful_baseline"] = faithful
        result["vs_faithful_baseline"] = round(
            fast_ips / faithful["images_per_sec"], 3)

    mfu = measure_mfu(fused_fast_k, (params, images), fast_per_batch)
    if mfu is not None:
        result["mfu"] = mfu

    # the headline measurements exist — make them durable before anything
    # slower runs (provisional line; every later emit supersedes it)
    skipped = []
    result["skipped_families"] = skipped
    emit_headline(result, partial=True)

    # ---- quality at matched AURC/ECE: exact path vs fast path ----
    if weights_kind.startswith("trained") and _budget_left(240, "quality", skipped):
        # member_chunk bounds HBM: the exact path's composed-resample warp
        # materializes (M*B*H*W, 2, 2, C) f32 gather patches, which at the
        # full fused width exceeds the 16G chip (quality is speed-blind)
        exact_sampler = make_sampler(
            built32, SamplerSpec(n_pred=1, n_members=N_SAMPLES, member_mode="dropout",
                                 tta=True, tta_config=TTA_EXACT, member_chunk=4))
        q_fast = quality_eval(built16, fast_sampler, params, "fast bf16", cfg32.data)
        q_exact = quality_eval(built32, exact_sampler, params, "exact fp32", cfg32.data)
        result["quality_fast"] = q_fast
        result["quality_exact_fp32"] = q_exact
        result["quality_deltas"] = {
            k: round(abs(q_fast[k] - q_exact[k]), 5) for k in q_fast
        }
        emit_headline(result, partial=True)

    # ---- batch-1 serving latency (same 16-sample uncertainty workload) ----
    img1 = images[:1]

    @partial(jax.jit, static_argnums=(3,))
    def fused1_k(params, image, key, k):
        def body(i, acc):
            stack = fast_sampler(params, image, jax.random.fold_in(key, i))
            maps = uncertainty_heatmaps(stack.group_means, sample_axis=0,
                                        class_axis=-1)
            return (acc + jnp.sum(stack.mean.astype(jnp.float32))
                    + jnp.sum(maps["TU"].astype(jnp.float32)))
        return jax.lax.fori_loop(0, k, body, 0.0)

    if _budget_left(90, "batch-1 latency", skipped):
        lat1 = slope_time(fused1_k, (params, img1), "batch-1 latency", batch=1)
        result["latency_batch1_ms"] = round(lat1 * 1000, 2)
        emit_headline(result, partial=True)

    # ---- stacked distinct-weight ensemble (deep ensemble / SWAG draws) ----
    # member_chunk="auto" resolves to a member-scan of plain dense programs
    # on TPU — measured faster than vmap's feature-grouped convs (PARITY.md §1)
    # Trained weights: 16 distinct members drawn on-device from the SWAG-diag
    # moments asset (reference expansion test_2D.py:678-709, scale=1.0);
    # falls back to a replicated random-init stack for throughput only.
    if _budget_left(300, "ensemble stack", skipped):
        stacked = jax.tree.map(lambda x: jnp.stack([x] * N_SAMPLES), params)
        weights_stack = weights_kind
        swag_path = REPO / "assets" / "bench_unet16_toy128_swag.npz"
        if swag_path.exists() and not _SMOKE:
            from diffuncertainty_tpu.tools.bench_weights import load_params_npz
            from diffuncertainty_tpu.tools.train_bench_assets import swag_draw_members

            swag_asset = load_params_npz(swag_path)
            drawn = swag_draw_members(
                {"mean": swag_asset["mean"], "std": swag_asset["std"]},
                jax.random.key(42), N_SAMPLES)
            ref_shapes = jax.tree.map(lambda x: x.shape, stacked)
            got_shapes = jax.tree.map(lambda x: x.shape, drawn)
            if ref_shapes == got_shapes:
                stacked = drawn
                weights_stack = "trained(toy128 SWAG-diag draws, scale=1.0)"
            else:
                _log("swag asset shape mismatch; stacked path uses random init")
        stack_sampler = make_sampler(built16, SamplerSpec(
            n_pred=1, n_members=N_SAMPLES, member_mode="params_stack",
            tta=True, tta_config=TTA_CFG))
        stack_k = make_fused_k(built16, stack_sampler)
        stack_per_batch = slope_time(stack_k, (stacked, images), "ensemble stack")
        result["ensemble_stack"] = {
            "metric": "images/sec/chip, 16 distinct-weight members ensemble+TTA uncertainty inference, LIDC-2D 128px",
            "value": round(BATCH / stack_per_batch, 2),
            "unit": "images/sec/chip",
            "p50_latency_ms": round(stack_per_batch * 1000, 2),
            "execution": "member-scan over the stacked parameter pytree (member_chunk auto)",
            "weights": weights_stack,
            "note": "reference loops members with CPU<->GPU model hopping (test_2D.py:711-727)",
        }
        if weights_stack.startswith("trained"):
            result["ensemble_stack"]["quality"] = quality_eval(
                built16, stack_sampler, stacked, "ensemble stack", cfg32.data)
            result["ensemble_stack"]["quality_note"] = (
                "16 distinct-weight SWAG-diag posterior draws; independent-seed "
                "deep-ensemble quality recorded in assets/ensemble16_quality.json")
        emit_headline(result, partial=True)

    # ---- remaining C1 aleatoric paths + the alternate backbone ----
    # 16-sample throughput for SSN, prob-U-Net, and HRNet-backbone softmax so
    # no prediction-model family is perf-blind (random-init, throughput only)
    def bench_path(tag, data="lidc128", network="unet16", model="softmax",
                   eu="none", spec=None, extra=(), asset=None):
        cfg_p = load_config(
            data=data, network=network, model=model, eu_method=eu,
            overrides=["data.batch_size=%d" % BATCH, "trainer.precision=bf16"]
            + list(extra) + SMALL_NET)
        built_p = build_model(cfg_p)
        init_rngs = {"params": rng}
        if built_p.needs_dropout_rng:
            init_rngs["dropout"] = jax.random.fold_in(rng, 1)
        if built_p.au_type == "prob_unet":
            seg0 = jnp.zeros((1, HW, HW, built_p.num_classes), jnp.float32)
            variables = built_p.module.init(
                init_rngs, images[:1], seg0, built_p.module.init_input_latent(1))
        elif built_p.has_batch_stats:
            variables = built_p.module.init(init_rngs, images[:1], True)
        else:
            variables = built_p.module.init(init_rngs, images[:1])
        params_p = variables
        weights_p = "random-init (throughput only)"
        if asset is not None:
            loaded = load_asset(REPO / "assets" / asset, params_p)
            if loaded is not None:
                params_p = loaded
                weights_p = "trained(toy128)"
        sampler_p = make_sampler(built_p, spec)
        k_fn = make_fused_k(built_p, sampler_p)
        per = slope_time(k_fn, (params_p, images), tag)
        out = {
            "value": round(BATCH / per, 2),
            "unit": "images/sec/chip",
            "p50_latency_ms": round(per * 1000, 2),
            "weights": weights_p,
        }
        if weights_p.startswith("trained"):
            out["quality"] = quality_eval(built_p, sampler_p, params_p, tag,
                                          cfg_p.data)
        return out

    if _budget_left(180, "ssn x16", skipped):
        result["ssn"] = {
            "metric": "images/sec/chip, 16-sample SSN uncertainty inference, LIDC-2D 128px",
            **bench_path("ssn x16", model="ssn", asset="bench_unet16_toy128_ssn.npz",
                         spec=SamplerSpec(n_pred=N_SAMPLES, n_members=1,
                                          member_mode="single")),
            "note": "one forward + 16 low-rank MVN logit samples (reference: distribution.sample([n_pred]), test_2D.py:1171)",
        }
        emit_headline(result, partial=True)
    if _budget_left(180, "prob_unet x16", skipped):
        result["prob_unet"] = {
            "metric": "images/sec/chip, 16-sample prob-U-Net uncertainty inference, LIDC-2D 128px",
            **bench_path("prob_unet x16", model="prob_unet",
                         asset="bench_unet16_toy128_prob_unet.npz",
                         spec=SamplerSpec(n_pred=N_SAMPLES, n_members=1,
                                          member_mode="single")),
            "note": "one feature/prior forward + 16 latent draws through fcomb (reference: sample_multiple Python loop, diff_unet2D_module.py:1156-1165)",
        }
        emit_headline(result, partial=True)
    if _budget_left(240, "hrnet x16", skipped):
        result["hrnet"] = {
            "metric": "images/sec/chip, 16-sample dropout+TTA uncertainty inference, HRNet-small backbone, LIDC-2D 128px",
            **bench_path("hrnet x16", network="hrnet-s", eu="dropout",
                         asset="bench_hrnet_s_toy128.npz",
                         spec=spec_fused,
                         # SMALL_NET's unet keys don't shrink HRNet
                         extra=("network.hrnet_width=8",) if _SMOKE else ()),
            "note": "alternate C0 backbone (reference hrnet_module.py)",
        }
        emit_headline(result, partial=True)

    # ---- diffusion sampler throughput (the namesake path) ----
    if _budget_left(240, "diffusion ddim10x16", skipped):
        diff_overrides = ["data.batch_size=%d" % BATCH, "trainer.precision=bf16",
                          "model.diffusion_sampling.num_steps=10"] + SMALL_NET
        cfg_d = load_config(data="lidc128", network="unet16", model="diffusion",
                            eu_method="none", overrides=diff_overrides)
        built_d = build_model(cfg_d)
        xd = jnp.ones((1, HW, HW, built_d.module.in_channels), jnp.float32)
        params_d = built_d.module.init({"params": rng}, xd, jnp.zeros((1,)))
        diff_sampler = make_sampler(built_d, SamplerSpec(
            n_pred=N_SAMPLES, n_members=1, member_mode="single",
            diffusion_sampler="ddim", diffusion_num_steps=10,
        ))

        @partial(jax.jit, static_argnums=(3,))
        def diff_k(params, images, key, k):
            def body(i, acc):
                stack = diff_sampler(params, images, jax.random.fold_in(key, i))
                return acc + jnp.sum(stack.mean.astype(jnp.float32))
            return jax.lax.fori_loop(0, k, body, 0.0)

        weights_d = "random-init (throughput only)"
        loaded_d = load_asset(REPO / "assets" / "bench_unet16_toy128_diffusion.npz",
                              params_d)
        if loaded_d is not None:
            params_d = loaded_d
            weights_d = "trained(toy128)"

        diff_per_batch = slope_time(diff_k, (params_d, images), "diffusion ddim10x16")
        result["diffusion_sampler"] = {
            "metric": "images/sec/chip, 16-trajectory DDIM-10 diffusion uncertainty inference, LIDC-2D 128px",
            "value": round(BATCH / diff_per_batch, 2),
            "unit": "images/sec/chip",
            "p50_latency_ms": round(diff_per_batch * 1000, 2),
            "n_trajectories": N_SAMPLES,
            "num_steps": 10,
            "weights": weights_d,
            "note": "reference runs n_pred full reverse trajectories as a Python loop (test_2D.py:1195-1212); here trajectories are one fused vmapped-scan program",
        }
        if weights_d.startswith("trained"):
            result["diffusion_sampler"]["quality"] = quality_eval(
                built_d, diff_sampler, params_d, "diffusion ddim10x16", cfg_d.data)
        emit_headline(result, partial=True)

    # ---- multi-class full-frame sliding-window (GTA-style, trained) ----
    # closes the multiclass quality loop: label-switch-trained asset through
    # tiled 256x512 inference, Dice/GED vs switched references, NCC vs the
    # analytic switch map, palette-PNG roundtrip (reference GTA pipeline +
    # evaluation/utils/gta.py:15-45)
    if not _SMOKE and _budget_left(360, "full_frame_multiclass", skipped):
        try:
            cfg_mc = load_config(data="gta_toy", network="unet16",
                                 model="softmax", eu_method="dropout")
            built_mc = build_model(cfg_mc)
            x_mc = jnp.zeros((1, 128, 128, built_mc.module.in_channels), jnp.float32)
            params_mc = built_mc.module.init(
                {"params": rng, "dropout": jax.random.fold_in(rng, 5)}, x_mc)
            loaded_mc = load_asset(
                REPO / "assets" / "bench_unet16_gtatoy_multiclass.npz", params_mc)
            if loaded_mc is not None:
                from diffuncertainty_tpu.tools.multiclass_quality import (
                    gta_toy_quality_eval,
                )

                mc = gta_toy_quality_eval(
                    built_mc, loaded_mc, cfg_mc.data, frames=8,
                    frame_size=(256, 512), window=128, stride=64, members=8,
                    log=_log,
                )
                result["full_frame_multiclass"] = {
                    "metric": "frames/sec/chip, 8-member MC-dropout sliding-window"
                              " 256x512 multiclass inference (trained, GTA-style toy)",
                    "value": mc.pop("frames_per_sec"),
                    "unit": "frames/sec/chip",
                    "weights": "trained(gta-toy, label-switch)",
                    "quality": mc,
                }
            else:
                _log("multiclass asset missing/mismatched -> family skipped")
        except Exception as exc:  # noqa: BLE001 — never break the headline
            _log(f"full_frame_multiclass skipped: {exc}")

    # Full nested record first, then the compact headline as the FINAL stdout
    # line: the driver records the stdout *tail*, and round 2's single giant
    # line got its headline truncated away (BENCH_r02.json parsed:null).
    print(json.dumps(result), flush=True)
    emit_headline(result, partial=False)


if __name__ == "__main__":
    main()
