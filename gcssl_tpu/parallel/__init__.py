"""Parallelism: data-parallel wrappers and explicit-collective utilities."""

from gcssl_tpu.parallel.data_parallel import (
    replicate,
    shard_along_batch,
    cross_replica_mean,
    make_shard_map_step,
)

__all__ = [
    "replicate",
    "shard_along_batch",
    "cross_replica_mean",
    "make_shard_map_step",
]
