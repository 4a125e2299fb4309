"""Worker for the real 2-process jax.distributed test (test_distributed.py).

Launched twice by the test with DU_COORDINATOR/DU_NUM_PROCESSES/DU_PROCESS_ID
set; exercises the multi-process branches of parallel/distributed.py:
rendezvous via initialize_distributed, per-process loader shards, global
batch assembly through jax.make_array_from_process_local_data, a tiny
data-parallel gradient step over the globally-sharded batch (cross-process
all-reduce through the gloo CPU collectives), and primary-only writes.
"""

import json
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main() -> None:
    port, pid, out_dir = sys.argv[1], int(sys.argv[2]), Path(sys.argv[3])
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ["DU_COORDINATOR"] = f"localhost:{port}"
    os.environ["DU_NUM_PROCESSES"] = "2"
    os.environ["DU_PROCESS_ID"] = str(pid)

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, str(REPO))
    from diffuncertainty_tpu.parallel.distributed import (
        global_batch,
        initialize_distributed,
        is_primary,
        loader_shard,
        process_info,
    )
    from diffuncertainty_tpu.parallel.mesh import make_mesh

    active = initialize_distributed()
    assert active, "rendezvous did not produce a multi-process runtime"
    assert process_info() == (pid, 2)
    assert jax.process_count() == 2
    assert len(jax.devices()) == 4  # 2 local CPU devices per process
    assert loader_shard() == (pid, 2)

    mesh = make_mesh((4,), ("data",))
    # each process contributes its own 2 rows; the global batch must carry 4
    local = {
        "image": np.full((2, 4, 4, 1), float(pid), np.float32),
        "seg": np.full((2, 4, 4), pid, np.int32),
        "meta": pid,  # non-array passthrough
    }
    gb = global_batch(local, mesh)
    assert gb["image"].shape == (4, 4, 4, 1), gb["image"].shape
    assert gb["seg"].shape == (4, 4, 4)
    assert gb["meta"] == pid

    # cross-process reduction: global mean sees both processes' rows
    mean = float(jax.jit(jnp.mean)(gb["image"]))
    # tiny DP gradient step on the sharded global batch (the all-reduce path)
    grad = float(
        jax.jit(jax.grad(lambda w, x: jnp.mean((x * w) ** 2)))(
            jnp.float32(1.0), gb["image"]
        )
    )

    if is_primary():
        (out_dir / "primary_marker.txt").write_text(f"written by process {pid}\n")

    print(json.dumps({
        "pid": pid,
        "mean": mean,
        "grad": grad,
        "primary": is_primary(),
        "n_devices": len(jax.devices()),
        "n_local": len(jax.local_devices()),
    }), flush=True)


if __name__ == "__main__":
    main()
