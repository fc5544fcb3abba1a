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
