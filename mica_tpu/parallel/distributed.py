"""Multi-process (multi-host) initialization and global mesh helpers.

The reference has no multi-node anything (its only parallelism is
single-process ``torch.nn.DataParallel``, train.py:234).  For TPU pods the
TPU-native path is one JAX process per host, connected through
``jax.distributed``; collectives ride ICI within a slice and DCN across
slices, inserted by XLA from the sharding annotations — the same
``Mesh((data,))`` programs in this package run unchanged on the global
device set.

Typical pod usage (per host):

    from mica_tpu.parallel import distributed
    distributed.initialize()          # env-driven on TPU pods
    mesh = distributed.global_mesh()  # all devices across all hosts
    trainer = Trainer(..., mesh=mesh)

On TPU hosts ``jax.distributed.initialize()`` discovers the coordinator
from the TPU metadata; elsewhere (CPU/GPU or tests) pass
``coordinator_address``/``num_processes``/``process_id`` explicitly.
"""

from __future__ import annotations

import logging
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

from .mesh import DATA_AXIS

logger = logging.getLogger(__name__)

_initialized = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
    shutdown_timeout_seconds: int = 900,
    heartbeat_timeout_seconds: int = 600,
    initialization_timeout: int = 600,
    backend: Optional[str] = None,
) -> None:
    """Connect this process to the distributed runtime (idempotent).

    With no arguments, relies on the environment (TPU pod metadata or the
    ``JAX_COORDINATOR_ADDRESS``/``JAX_NUM_PROCESSES``/``JAX_PROCESS_ID``
    variables jax reads).  Must be called before any jax operation that
    initializes the backend.

    The timeout defaults are deliberately far above jax's (100 s
    heartbeat / 300 s shutdown): a cold SPMD compile can take minutes and
    be asymmetric across processes (compile-cache races), and on a
    contended host the laggard's heartbeat sender can starve — a
    multi-host entry must survive worst-case compile skew, not die on it.
    """
    global _initialized
    if _initialized:
        return
    kwargs = {
        "shutdown_timeout_seconds": shutdown_timeout_seconds,
        "heartbeat_timeout_seconds": heartbeat_timeout_seconds,
        "initialization_timeout": initialization_timeout,
    }
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = list(local_device_ids)
    jax.distributed.initialize(**kwargs)
    _initialized = True
    # ``backend`` pins the platform for the post-init report.  With no pin the
    # device queries resolve the DEFAULT backend, which on mixed-plugin hosts
    # can be a different plugin than the one this process will compute on —
    # e.g. CPU gloo workers racing to open one tunneled TPU chip just to log,
    # and dying on its UNAVAILABLE instead of running (seen in CI).
    try:
        logger.info(
            "distributed runtime up: process %d/%d, %d local / %d global devices",
            jax.process_index(backend), jax.process_count(backend),
            jax.local_device_count(backend), jax.device_count(backend),
        )
    except RuntimeError as e:  # backend init failure must not kill the entry
        logger.warning("distributed runtime up (device report failed: %s)", e)


def barrier(name: str, timeout_seconds: int = 900) -> None:
    """Block until every process reaches the barrier ``name``.

    Rides the coordination service (no device collective — safe to call
    before any executable runs).  The canonical use is fencing a gloo/DCN
    collective behind AOT compilation: ``.lower(...).compile()`` on every
    process, ``barrier("compiled")``, then execute — so the collective's
    own (much shorter) rendezvous window never has to absorb compile skew.
    """
    from jax._src import distributed as _dist

    client = _dist.global_state.client
    if client is None:
        return  # single-process: nothing to synchronize
    client.wait_at_barrier(name, timeout_seconds * 1000)


def global_mesh(axis_name: str = DATA_AXIS,
                backend: Optional[str] = None) -> Mesh:
    """1-D data mesh over ALL devices across every connected process.

    Device order follows ``jax.devices()`` (grouped by process), so a
    batch sharded along ``data`` places each process's shard on its own
    local devices — host->device feeding stays local and only the
    collectives cross DCN.  ``backend`` pins the platform explicitly
    (needed on hosts where another plugin wins the default-backend
    election, e.g. CPU multi-process tests under the axon plugin).
    """
    return Mesh(np.asarray(jax.devices(backend)), (axis_name,))


def is_multiprocess(backend: Optional[str] = None) -> bool:
    return jax.process_count(backend) > 1


def make_global_batch(local_rows: "np.ndarray", mesh: Mesh,
                      global_rows: int, axis_name: str = DATA_AXIS):
    """Assemble a globally-sharded batch array from this process's rows.

    Equivalent to ``jax.make_array_from_process_local_data`` but built
    from explicit per-device shards, so it works regardless of which
    backend is the default (on mixed-plugin hosts the default backend's
    process count can disagree with the mesh's backend).
    ``local_rows`` must be this process's contiguous slice of the global
    batch, in mesh-device order.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(
        mesh, P(axis_name, *([None] * (local_rows.ndim - 1)))
    )
    devices = [d for d in mesh.devices.flat
               if d.process_index == d.client.process_index()]
    per = local_rows.shape[0] // len(devices)
    shards = [
        jax.device_put(local_rows[i * per:(i + 1) * per], d)
        for i, d in enumerate(devices)
    ]
    global_shape = (global_rows,) + tuple(local_rows.shape[1:])
    return jax.make_array_from_single_device_arrays(
        global_shape, sharding, shards
    )


def local_batch_slice(global_batch: int,
                      backend: Optional[str] = None) -> slice:
    """The [start, stop) rows of a global batch this process should feed.

    With ``global_batch`` divisible by process_count, each process
    materializes only its slice and hands jax per-device shards via
    ``make_global_batch``.
    """
    per = global_batch // jax.process_count(backend)
    start = per * jax.process_index(backend)
    return slice(start, start + per)
