"""Device-profile capture + aggregation for the bench workloads.

Round-2 found every perf win by aggregating ``jax.profiler`` traces by HLO
category (layout copies vs convs vs gathers); this tool makes that method a
first-class, repeatable command instead of an ad-hoc notebook:

    python -m diffuncertainty_tpu.tools.profile_device --workload ensemble_stack

Workloads mirror ``bench.py`` (the reference's standard inference config,
``unc_mod_utils/test_utils.py:80,90,151`` scaled to 16 samples):

- ``fused``          — shared-weight MC-dropout members folded into batch
- ``ensemble_stack`` — 16 distinct-weight members (deep ensemble / SWAG
                       draws) over a stacked parameter pytree, executed the
                       way production does (member_chunk="auto": member-scan
                       on single-device TPU, vmap elsewhere)
- ``diffusion``      — 16-trajectory DDIM-10 fused sampler
- ``train``          — the jitted train step (fwd+loss+grad+AdamW+EMA)

Host tracing is disabled (``host_tracer_level=0``): the TensorBoard JSON
conversion truncates at 1M events and host events crowd out the device lanes.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
from pathlib import Path

import jax
import jax.numpy as jnp


def capture(fn, log_dir: str | Path) -> Path:
    """Run ``fn()`` under a device-only profiler trace; return the trace dir."""
    options = jax.profiler.ProfileOptions()
    options.host_tracer_level = 0
    jax.profiler.start_trace(str(log_dir), profiler_options=options)
    try:
        fn()
    finally:
        jax.profiler.stop_trace()
    return Path(log_dir)


def _load_trace_events(log_dir: str | Path) -> list[dict]:
    pats = sorted(
        glob.glob(str(Path(log_dir) / "**" / "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime,
    )
    if not pats:
        raise FileNotFoundError(f"no *.trace.json.gz under {log_dir}")
    with gzip.open(pats[-1], "rt") as f:
        return json.load(f).get("traceEvents", [])


def aggregate_trace(log_dir: str | Path, top: int = 25) -> dict:
    """Sum device-lane event durations by HLO category and by op name.

    Returns ``{"total_ms", "by_category": [...], "by_op": [...]}`` with
    percentage shares. Device lanes are the TensorCore PIDs (events carrying
    an ``args.hlo_category``); host lanes have none.
    """
    events = _load_trace_events(log_dir)
    by_cat: dict[str, float] = collections.defaultdict(float)
    by_op: dict[str, float] = collections.defaultdict(float)
    total = 0.0
    # control-flow wrappers (scan/while bodies) re-emit their contents as
    # separate device events — counting the wrapper double-counts the body
    skip = {"while", "conditional", "call", "fusion.control-flow"}
    for ev in events:
        if ev.get("ph") != "X":
            continue
        args = ev.get("args") or {}
        cat = args.get("hlo_category")
        if cat is None or cat in skip:
            continue
        dur = float(ev.get("dur", 0.0)) / 1000.0  # us -> ms
        total += dur
        by_cat[cat] += dur
        by_op[ev.get("name", "?")] += dur

    def _ranked(d):
        rows = sorted(d.items(), key=lambda kv: -kv[1])[:top]
        return [
            {"name": k, "ms": round(v, 3), "pct": round(100 * v / total, 1) if total else 0.0}
            for k, v in rows
        ]

    return {"total_ms": round(total, 3), "by_category": _ranked(by_cat), "by_op": _ranked(by_op)}


# ---------------------------------------------------------------- workloads


def _build(model: str, eu: str, batch: int, precision: str, extra=()):
    from ..core.config import load_config
    from ..models.factory import build_model

    cfg = load_config(
        data="lidc128", network="unet16", model=model, eu_method=eu,
        overrides=["data.batch_size=%d" % batch, "trainer.precision=%s" % precision]
        + list(extra),
    )
    return build_model(cfg)


def make_workload(name: str, batch: int = 16, hw: int = 128, n: int = 16,
                  precision: str = "bf16", steps: int = 2):
    """Return a zero-arg callable running ``steps`` compiled iterations."""
    from ..sampling import SamplerSpec, TTAConfig, make_sampler

    rng = jax.random.key(0)
    images = jax.random.uniform(rng, (batch, hw, hw, 3), jnp.float32)
    tta = TTAConfig(hflip_p=0.5, rotation_limit=22.5, scale_limit=(-0.2, 0.2))

    if name == "train":
        # the jitted train step (fwd+loss+grad+AdamW+EMA) exactly as the
        # Trainer builds it, on a synthetic single-rater batch
        import tempfile

        from ..core.config import load_config
        from ..train.loop import Trainer

        cfg = load_config(
            data="lidc128", network="unet16", model="softmax", eu_method="dropout",
            overrides=["data.batch_size=%d" % batch,
                       "trainer.precision=%s" % precision],
        )
        trainer = Trainer(cfg, workdir=tempfile.mkdtemp())
        seg = (jax.random.uniform(rng, (batch, hw, hw)) > 0.5).astype(jnp.int32)
        batch_d = {"image": images, "seg": seg}
        state = trainer.init_state(jax.random.key(0), batch_d)
        step_fn = trainer._get_step(False)
        sched = trainer._sched_for_epoch(0)

        # warm the compile cache first: the step donates its input state
        state, _ = step_fn(state, batch_d, jax.random.key(99), sched)

        def run(state=state):
            for i in range(steps):
                state, aux = step_fn(state, batch_d, jax.random.key(i), sched)
            float(aux["loss"])

        return run

    if name == "diffusion":
        built = _build("diffusion", "none", batch, precision,
                       ["model.diffusion_sampling.num_steps=10"])
        x0 = jnp.ones((1, hw, hw, built.module.in_channels), jnp.float32)
        params = built.module.init({"params": rng}, x0, jnp.zeros((1,)))
        spec = SamplerSpec(n_pred=n, n_members=1, member_mode="single",
                           diffusion_sampler="ddim", diffusion_num_steps=10)
    else:
        built = _build("softmax", "dropout", batch, precision)
        params = built.module.init(
            {"params": rng, "dropout": jax.random.fold_in(rng, 1)}, images)
        if name == "fused":
            spec = SamplerSpec(n_pred=1, n_members=n, member_mode="dropout",
                               tta=True, tta_config=tta)
        elif name == "ensemble_stack":
            params = jax.tree.map(
                lambda x: jnp.stack([x + 0.001 * m for m in range(n)]), params)
            spec = SamplerSpec(n_pred=1, n_members=n, member_mode="params_stack",
                               tta=True, tta_config=tta)
        else:
            raise ValueError(name)

    sampler = make_sampler(built, spec)

    @jax.jit
    def step(params, images, key):
        stack = sampler(params, images, key)
        return jnp.sum(stack.mean.astype(jnp.float32))

    def run():
        for i in range(steps):
            float(step(params, images, jax.random.key(i)))

    # warm the compile cache outside the trace
    float(step(params, images, jax.random.key(99)))
    return run


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--workload", default="ensemble_stack",
                    choices=["fused", "ensemble_stack", "diffusion", "train"])
    ap.add_argument("--log_dir", default="/tmp/diffunc_profile")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--hw", type=int, default=128)
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--precision", default="bf16")
    ap.add_argument("--top", type=int, default=20)
    args = ap.parse_args(argv)

    run = make_workload(args.workload, args.batch, args.hw, args.n, args.precision)
    capture(run, args.log_dir)
    agg = aggregate_trace(args.log_dir, top=args.top)
    print(json.dumps(agg, indent=2))


if __name__ == "__main__":
    main()
