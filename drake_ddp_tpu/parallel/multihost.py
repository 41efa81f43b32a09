"""Multi-host (multi-process) scenario batching over a 2-D mesh.

The BASELINE.md scaling criterion asks for solves/s at 1 chip, 1 host,
and >= 2 hosts.  The reference (vincekurtz/drake_ddp) is a single-process
script with no distributed story (SURVEY.md §2.4); here, scaling past
one host is the standard JAX SPMD recipe:

- every participating process calls :func:`initialize` (a thin wrapper
  over ``jax.distributed.initialize``) so all chips of all hosts form
  one global device set,
- :func:`host_device_mesh` builds a 2-D ``(host, device)`` mesh whose
  outer axis crosses the data-center network (DCN) and whose inner axis
  rides ICI — scenario data-parallelism needs no per-step collectives,
  so only the final psum'd stats ever touch DCN,
- each process feeds its *local* scenarios via
  :func:`process_local_problem` (``jax.make_array_from_process_local_data``),
  and :func:`parallel.sharding.batched_solve` / ``batched_mpc`` — which
  are mesh-shape-agnostic — run unchanged over the 2-D mesh.

Tested with 2 real processes (gloo CPU collectives) in
tests/test_multihost.py; on TPU pods, ``initialize()`` with no
arguments autodetects the coordinator from the TPU environment.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

HOST_AXIS = "host"
DEVICE_AXIS = "device"


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids=None,
) -> None:
    """Join the multi-process runtime (idempotent).

    On Cloud TPU pods call with no arguments — the coordinator and
    process count are autodetected from the TPU metadata.  For CPU/GPU
    clusters (and the 2-process CPU test) pass all three explicitly.
    """
    import jax
    from jax._src import distributed as _distributed

    # idempotency check that does NOT touch the XLA backend
    # (jax.process_count() would initialize it, which must happen after
    # jax.distributed.initialize)
    if _distributed.global_state.client is not None:
        return  # already initialized
    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(coordinator_address=coordinator_address,
                      num_processes=num_processes,
                      process_id=process_id)
    if local_device_ids is not None:
        kwargs.update(local_device_ids=local_device_ids)
    jax.distributed.initialize(**kwargs)


def host_device_mesh(devices=None):
    """A 2-D ``(host, device)`` mesh over all global devices.

    The outer axis enumerates processes (DCN); the inner axis the
    devices local to each process (ICI).  Falls back to a ``(1, n)``
    mesh in single-process runs, so code written against this mesh runs
    unchanged on one host.
    """
    import jax
    from jax.sharding import Mesh

    if devices is None:
        devices = jax.devices()
    nproc = max(jax.process_count(), 1)
    devs = np.asarray(devices)
    if devs.size % nproc:
        raise ValueError(
            f"{devs.size} devices do not divide {nproc} processes")
    # jax.devices() orders by (process_index, local id); keep that order
    # so each mesh row is one host's local devices
    grid = devs.reshape(nproc, devs.size // nproc)
    return Mesh(grid, axis_names=(HOST_AXIS, DEVICE_AXIS))


def process_local_problem(mesh, probs_local):
    """Assemble the global sharded problem from per-process local shards.

    Every process passes its own ``(local_batch, ...)`` problem pytree;
    the result is a global jax.Array batched over
    ``local_batch * num_processes`` scenarios, sharded over both mesh
    axes, without any host gathering the full batch.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P((HOST_AXIS, DEVICE_AXIS)))
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)),
        probs_local,
    )
