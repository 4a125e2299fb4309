"""Multi-host (DCN) scaffolding: the single-process-testable contract.

SURVEY §2.5's last clause: the reference has no multi-node story at all;
the TPU-native equivalent is ``jax.distributed`` + per-process input
sharding + globally-assembled batches (``parallel/distributed.py``). A real
pod isn't available here, so these tests pin everything that is observable
in one process: the process-shard loader semantics (disjoint, covering,
lockstep-equal lengths, shared permutation), the no-op init path, and the
single-process degeneration of ``global_batch`` to a mesh-sharded put.
"""

import numpy as np
import jax
import jax.numpy as jnp

from diffuncertainty_tpu.data.loader import BatchLoader
from diffuncertainty_tpu.parallel.distributed import (
    global_batch,
    initialize_distributed,
    is_primary,
    loader_shard,
    process_info,
)
from diffuncertainty_tpu.parallel.mesh import make_mesh
import pytest

pytestmark = pytest.mark.slow


class _ArrayDataset:
    """Minimal dataset: index -> {image, seg, image_id, dataset}."""

    def __init__(self, n, hw=8):
        self.n = n
        self.hw = hw

    def __len__(self):
        return self.n

    def load(self, i, rng=None):
        img = np.full((self.hw, self.hw, 3), float(i), np.float32)
        return {
            "image": img,
            "seg": np.full((self.hw, self.hw), i % 2, np.int32),
            "image_id": f"im{i:03d}",
            "dataset": "test",
        }


def _ids_seen(loader):
    ids = []
    for batch in loader:
        valid = np.asarray(batch["valid"])
        ids.extend(np.asarray(batch["image"])[valid][:, 0, 0, 0].astype(int).tolist())
    return ids


def test_single_process_runtime_is_degenerate():
    assert initialize_distributed() is False  # no coordinator configured
    assert process_info() == (0, 1)
    assert loader_shard() is None
    assert is_primary()


def test_process_shard_partitions_the_epoch():
    """4 simulated processes: shards are disjoint (up to wrap-padding),
    cover every sample, and have identical lengths (SPMD lockstep)."""
    n, count = 21, 4
    ds = _ArrayDataset(n)
    per_proc = []
    for pidx in range(count):
        loader = BatchLoader(ds, 4, process_shard=(pidx, count), use_native=False)
        assert len(loader) == 2  # ceil(ceil(21/4)=6 / 4)
        per_proc.append(_ids_seen(loader))
    lengths = {len(ids) for ids in per_proc}
    assert lengths == {6}  # equal wrap-padded share of 21
    all_ids = [i for ids in per_proc for i in ids]
    assert set(all_ids) == set(range(n))  # full coverage
    # wrap-padding duplicates exactly ceil(21/4)*4 - 21 = 3 samples
    assert len(all_ids) - len(set(all_ids)) == 3


def test_process_shards_use_the_same_shuffle_permutation():
    """Shuffled epochs: every process derives its slice from ONE global
    (seed, epoch) permutation — union across processes is the unsharded
    epoch order, re-sliced."""
    n, count = 16, 2
    ds = _ArrayDataset(n)
    ref = BatchLoader(ds, 4, shuffle=True, seed=3, use_native=False)
    ref_order = _ids_seen(ref)
    shard_orders = []
    for pidx in range(count):
        loader = BatchLoader(ds, 4, shuffle=True, seed=3,
                             process_shard=(pidx, count), use_native=False)
        shard_orders.append(_ids_seen(loader))
    assert shard_orders[0] == ref_order[0::2]
    assert shard_orders[1] == ref_order[1::2]


def test_global_batch_single_process_matches_shard_batch():
    mesh = make_mesh((4, 2), ("data", "member"))
    batch = {
        "image": jnp.arange(8 * 4 * 4 * 3, dtype=jnp.float32).reshape(8, 4, 4, 3),
        "seg": jnp.zeros((8, 4, 4), jnp.int32),
        "image_id": ["a"] * 8,
    }
    out = global_batch(batch, mesh)
    assert out["image_id"] == batch["image_id"]  # non-arrays pass through
    np.testing.assert_array_equal(np.asarray(out["image"]), np.asarray(batch["image"]))
    shard_shapes = {s.data.shape for s in out["image"].addressable_shards}
    assert shard_shapes == {(2, 4, 4, 3)}  # 8 rows over data=4, replicated member


def test_process_shard_validates_index():
    ds = _ArrayDataset(4)
    try:
        BatchLoader(ds, 2, process_shard=(3, 2))
    except ValueError as e:
        assert "process_shard" in str(e)
    else:
        raise AssertionError("invalid process_shard accepted")


# ---------------------------------------------------------------------------
# the REAL multi-process paths: 2 local CPU processes over a rendezvous
# ---------------------------------------------------------------------------

def test_two_process_rendezvous_and_global_batch(tmp_path):
    """Spawns 2 subprocesses (tests/distributed_worker.py) that rendezvous via
    jax.distributed over localhost and exercise the NON-degenerate branches of
    parallel/distributed.py: DU_* env rendezvous, per-process loader shards,
    ``jax.make_array_from_process_local_data`` batch assembly, a cross-process
    all-reduce gradient (gloo CPU collectives), and primary-only writes."""
    import json
    import os
    import socket
    import subprocess
    import sys
    from pathlib import Path

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    worker = Path(__file__).parent / "distributed_worker.py"
    env = {k: v for k, v in os.environ.items() if not k.startswith("DU_")}
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(port), str(i), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=300)
            assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
            outs.append(json.loads(out.strip().splitlines()[-1]))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    by_pid = {o["pid"]: o for o in outs}
    assert set(by_pid) == {0, 1}
    for o in outs:
        assert o["n_devices"] == 4 and o["n_local"] == 2
        # global batch carried rows from BOTH processes (0s and 1s)
        assert abs(o["mean"] - 0.5) < 1e-6, o
        # DP gradient = 2 * E[x^2] * w over the GLOBAL batch
        assert abs(o["grad"] - 1.0) < 1e-6, o
    assert by_pid[0]["primary"] and not by_pid[1]["primary"]
    marker = tmp_path / "primary_marker.txt"
    assert marker.read_text().strip() == "written by process 0"
