"""Multi-host (DCN) scaffolding: process init, global meshes, input assembly.

The reference is a single-process, single-GPU framework; its scaling story
stops at one device (``configs/standard.yaml:50-52``). On TPU pods the
TPU-native story is:

- every host runs THIS SAME program (SPMD);
- ``jax.distributed.initialize`` connects the hosts over DCN (coordinator
  rendezvous); afterwards ``jax.devices()`` is the *global* device list and
  a ``Mesh`` built from it spans the pod — XLA routes mesh-axis collectives
  over ICI within a slice and DCN across slices;
- each host loads only its own shard of every batch
  (``BatchLoader(process_shard=...)``) and the host-local arrays are
  assembled into one globally-sharded ``jax.Array`` with
  ``jax.make_array_from_process_local_data`` — no host ever materializes
  the global batch;
- checkpoint writes happen on process 0 only (host-local state); orbax
  handles distributed arrays natively when they arrive sharded.

Single-process (including this repo's 8-virtual-device CPU test mesh)
everything here degrades to an exact no-op / local fast path, which is what
the unit tests pin. The multi-process paths follow the documented JAX
runtime contract and are exercised end to end only on real pods.
"""

from __future__ import annotations

import os

import jax

from .mesh import shard_batch


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Connect this process to a multi-host JAX runtime (idempotent).

    Reads the standard env vars when args are None: DU_COORDINATOR /
    DU_NUM_PROCESSES / DU_PROCESS_ID (explicit rendezvous; e.g. GCE VMs),
    falling back to ``jax.distributed.initialize()``'s own auto-detection
    on managed TPU pod environments (where the TPU runtime publishes the
    topology and no arguments are needed).

    Returns True when a multi-process runtime is (already) active. Safe to
    call unconditionally at entry-point start: single-process invocations
    with no coordinator configured are a no-op.
    """
    # must not touch the backend before deciding: jax.process_count() would
    # initialise XLA and make a later jax.distributed.initialize() illegal
    if jax.distributed.is_initialized():
        return jax.process_count() > 1
    coordinator_address = coordinator_address or os.environ.get("DU_COORDINATOR")
    env_np = os.environ.get("DU_NUM_PROCESSES")
    env_pid = os.environ.get("DU_PROCESS_ID")
    # managed-pod autodetection only when the runtime actually advertises
    # MULTIPLE workers (single-chip containers also export
    # TPU_WORKER_HOSTNAMES=localhost — that is not a pod)
    hostnames = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    auto_pod = (
        len([h for h in hostnames.split(",") if h.strip()]) > 1
        or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
    )
    if coordinator_address is None and not auto_pod:
        return False  # single process, nothing to do
    kwargs = {}
    if coordinator_address is not None:
        num_processes = num_processes if num_processes is not None else env_np
        process_id = process_id if process_id is not None else env_pid
        missing = [
            name
            for name, val in (
                ("DU_NUM_PROCESSES", num_processes),
                ("DU_PROCESS_ID", process_id),
            )
            if val is None
        ]
        if missing:
            raise ValueError(
                "explicit coordinator rendezvous needs the process topology: "
                f"set {' and '.join(missing)} (or pass num_processes/process_id)"
            )
        kwargs["coordinator_address"] = coordinator_address
        kwargs["num_processes"] = int(num_processes)
        kwargs["process_id"] = int(process_id)
    jax.distributed.initialize(**kwargs)
    return jax.process_count() > 1


def process_info() -> tuple[int, int]:
    """(process_index, process_count) of the running JAX runtime."""
    return jax.process_index(), jax.process_count()


def loader_shard() -> tuple[int, int] | None:
    """The ``BatchLoader(process_shard=...)`` value for this process —
    None single-process (load everything), (index, count) on a pod."""
    idx, count = process_info()
    return None if count == 1 else (idx, count)


def global_batch(batch: dict, mesh, axis: str = "data") -> dict:
    """Assemble per-process host-local batch shards into globally-sharded
    ``jax.Array``s over ``mesh``'s data axis.

    Single-process this is exactly ``mesh.shard_batch`` (device_put with a
    batch sharding). Multi-process, each host contributes its local rows via
    ``jax.make_array_from_process_local_data`` — the resulting arrays have
    global shape ``local_rows * process_count`` along the batch dim and can
    feed the same jitted step as the single-host path.
    """
    if jax.process_count() == 1:
        return shard_batch(batch, mesh, axis)
    from jax.sharding import NamedSharding, PartitionSpec as P

    out = {}
    for k, v in batch.items():
        if hasattr(v, "ndim") and v.ndim >= 1:
            sharding = NamedSharding(mesh, P(axis, *([None] * (v.ndim - 1))))
            out[k] = jax.make_array_from_process_local_data(sharding, v)
        else:
            out[k] = v
    return out


def is_primary() -> bool:
    """True on the process that owns host-side artifact writes (checkpoint
    metadata, JSONL progress, result files)."""
    return jax.process_index() == 0
