"""Multi-host (DCN) initialization and hybrid mesh construction.

The reference is a single-process application (SURVEY §5.8: "no
elastic/cluster recovery (single process)"); the TPU-native framework
scales past one host with `jax.distributed` + a hybrid ICI x DCN mesh:

- every host runs the same program; `initialize()` wires them into one
  JAX runtime (coordinator address from args or the standard
  JAX/Cloud-TPU environment variables);
- `hybrid_mesh()` builds a mesh whose OUTER axis spans hosts (slow
  DCN collectives: data-parallel gradient psum once per step) and
  whose INNER axes stay within a host/slice (fast ICI: tensor/model
  sharding) — the layout recipe of the public scaling-book;
- shardings from parallel/mesh.py apply unchanged: XLA inserts DCN
  collectives for the outer axis and ICI collectives for inner axes.

Single-host sessions (this repo's CI, the one-chip bench host) skip
initialize() entirely — every helper degrades to the local mesh.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed for a multi-host run.

    Arguments default to the standard environment variables
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, or
    the Cloud-TPU metadata jax.distributed reads natively). Returns
    True when a multi-process runtime was initialized, False when the
    session stays single-process (no coordinator configured).
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        n = os.environ.get("JAX_NUM_PROCESSES")
        num_processes = int(n) if n else None
    if process_id is None:
        p = os.environ.get("JAX_PROCESS_ID")
        process_id = int(p) if p else None
    if not coordinator_address and num_processes in (None, 1):
        # Cloud-TPU pod slices need no explicit coordinator — a bare
        # jax.distributed.initialize() discovers it from TPU metadata.
        # Only attempt that when the environment says we ARE a pod
        # worker, since on plain hosts it raises.
        hostnames = os.environ.get("TPU_WORKER_HOSTNAMES", "")
        multi_host = len([h for h in hostnames.split(",") if h]) > 1 \
            or bool(os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"))
        if not multi_host:
            return False  # single-process session
        try:
            jax.distributed.initialize()
        except (ValueError, RuntimeError):
            return False  # metadata incomplete: stay single-process
        return jax.process_count() > 1
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)
    return True


def hybrid_mesh(axis_names: Sequence[str] = ("data", "model"),
                model_axis_size: Optional[int] = None) -> Mesh:
    """Mesh with the leading axis across hosts (DCN) and trailing axes
    within each host's devices (ICI).

    On a single host this degrades to a host-local mesh with the same
    axis names, so the caller's shardings work unchanged.
    """
    n_local = jax.local_device_count()
    n_total = jax.device_count()
    n_hosts = max(1, n_total // max(1, n_local))
    if model_axis_size is None:
        # every consumer in this repo shards batches over 'data' and
        # replicates params: default to pure data parallelism (a
        # model axis of n_local would leave the data axis at size 1
        # per host — all chips redundantly computing one batch)
        model_axis_size = 1
    model_axis_size = max(1, min(model_axis_size, n_local))
    if len(axis_names) == 1:
        return Mesh(np.array(jax.devices()), axis_names)
    try:
        from jax.experimental import mesh_utils

        if n_hosts > 1:
            devices = mesh_utils.create_hybrid_device_mesh(
                (n_local // model_axis_size, model_axis_size),
                (n_hosts, 1))
        else:
            devices = mesh_utils.create_device_mesh(
                (n_total // model_axis_size, model_axis_size))
    except (ImportError, ValueError):
        devices = np.array(jax.devices()).reshape(
            n_total // model_axis_size, model_axis_size)
    return Mesh(devices, axis_names)


def process_batch_slice(global_batch: int) -> slice:
    """Each host feeds only its slice of the global batch (per-host
    data loading; jax.make_array_from_process_local_data assembles the
    global array). Every host must contribute the SAME number of rows
    (the sharded assembly needs even shards), so the global batch is
    truncated to a multiple of the process count — callers pick
    global batches divisible by the host count to avoid dropping
    samples."""
    n = jax.process_count()
    i = jax.process_index()
    per = global_batch // n
    lo = i * per
    return slice(lo, lo + per)


def global_batch_array(mesh: Mesh, local_data, axis: str = "data"):
    """Assemble a mesh-sharded global array from per-host local data."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(axis))
    if jax.process_count() == 1:
        return jax.device_put(local_data, sharding)
    return jax.make_array_from_process_local_data(sharding, local_data)
