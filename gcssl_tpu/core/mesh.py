"""Device mesh and sharding helpers.

The reference is single-process single-GPU (SURVEY.md §2 "Parallelism: none").
Here data parallelism is first-class: one ``jax.sharding.Mesh`` with a
``data`` axis; batches are sharded on it, parameters replicated, and XLA
inserts the psum gradient all-reduce over ICI when the jitted train step is
compiled with these shardings.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gcssl_tpu.core.config import MeshConfig


def init_distributed(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Multi-host mesh setup (SURVEY.md §7 core/: "mesh/device setup
    (jax.distributed, ...)").

    No-op (returns False) unless a coordinator address is given either as
    an argument or via ``JAX_COORDINATOR`` — the single-host path stays
    untouched.  With one, calls ``jax.distributed.initialize`` so that
    ``jax.devices()`` (and therefore :func:`make_mesh`) spans every host's
    chips and collectives ride ICI within a slice / DCN across slices.
    ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID`` supply the remaining
    coordinates when not inferrable from the TPU environment (they never
    are on CPU, which is how the two-process test drives this).
    Idempotent: a second call in an already-initialized process is a no-op.
    """
    import os

    coordinator = coordinator or os.environ.get("JAX_COORDINATOR")
    if not coordinator:
        return False
    # NOTE: must not touch jax.devices()/process_count() here — any backend
    # query before initialize() is an error by JAX's own contract
    if jax.distributed.is_initialized():
        return True  # already initialized
    env_np = os.environ.get("JAX_NUM_PROCESSES")
    env_pid = os.environ.get("JAX_PROCESS_ID")
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes
        if num_processes is not None
        else (int(env_np) if env_np else None),
        process_id=process_id
        if process_id is not None
        else (int(env_pid) if env_pid else None),
    )
    return True


def make_mesh(cfg: MeshConfig | None = None, devices=None) -> Mesh:
    cfg = cfg or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    if cfg.num_devices is not None:
        devices = devices[: cfg.num_devices]
    return Mesh(np.asarray(devices), (cfg.data_axis,))


def data_sharding(mesh: Mesh, axis: str | None = None) -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    axis = axis or mesh.axis_names[0]
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Device-put a pytree of host arrays with the batch axis sharded."""
    sh = data_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
