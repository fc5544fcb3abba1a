"""Parallelism: data-parallel wrappers and explicit-collective utilities."""

from gcssl_tpu.parallel.data_parallel import (
    replicate,
    shard_along_batch,
    cross_replica_mean,
    make_shard_map_step,
    make_detector_dp_step,
)
from gcssl_tpu.parallel.fold_parallel import (
    make_fold_mesh,
    make_fold_train_step,
    train_folds,
)

__all__ = [
    "replicate",
    "shard_along_batch",
    "cross_replica_mean",
    "make_shard_map_step",
    "make_detector_dp_step",
    "make_fold_mesh",
    "make_fold_train_step",
    "train_folds",
]
