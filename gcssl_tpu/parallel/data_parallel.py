"""Data-parallel primitives over the TPU mesh.

Two styles, both ICI-native (SURVEY.md §2 "Parallelism" / §5 "Distributed
communication backend"):

1. *Sharding-inference DP* (the default used by the trainers): params
   replicated + batch sharded via ``NamedSharding``; XLA inserts the psum
   grad all-reduce when compiling the jitted step.  Zero step-code changes.
2. *Explicit shard_map DP* (this module): wrap any per-shard grad function
   with an explicit ``jax.lax.pmean`` over the 'data' axis.  Useful when the
   collective placement must be pinned (e.g. interleaving with Pallas
   kernels that carry their own collectives).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def replicate(tree, mesh: Mesh):
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def shard_along_batch(tree, mesh: Mesh, axis: str | None = None):
    axis = axis or mesh.axis_names[0]
    sh = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def cross_replica_mean(tree, axis_name: str = "data"):
    """pmean a pytree across the data axis (use inside shard_map/pmap)."""
    return jax.tree.map(partial(jax.lax.pmean, axis_name=axis_name), tree)


def make_shard_map_step(grad_fn, mesh: Mesh, axis: str = "data"):
    """Lift ``grad_fn(params, batch) -> (loss, grads)`` to an explicit
    data-parallel step: each shard computes its grads, then loss and grads
    are pmean'd over ICI.

    Returns a jitted function with params replicated and batch sharded.
    """
    def per_shard(params, batch):
        loss, grads = grad_fn(params, batch)
        loss = jax.lax.pmean(loss, axis_name=axis)
        grads = cross_replica_mean(grads, axis)
        return loss, grads

    mapped = jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped)


def make_detector_dp_step(cfg, model, tx, mesh: Mesh, axis: str = "data"):
    """Explicit data-parallel detector train step over a 1-D mesh.

    The batch dim of every data arg is sharded over ``axis``; the step core
    (train/detector.py:make_detector_step_core) psums loss normalizers,
    grads and metric scalars over it, so the returned state/metrics are the
    exact full-batch update (replicated).  Complements the fold-parallel
    trainer: this scales ONE detector across chips, that one scales K
    independent folds."""
    import functools

    from gcssl_tpu.train.detector import make_detector_step_core

    core = make_detector_step_core(cfg, model, tx, grad_axis=axis)

    @functools.partial(jax.jit, donate_argnums=(0,), static_argnums=(6,))
    def _step(state, images4_u8, boxes4, mask4, weights, lr, use_mosaic):
        return jax.shard_map(
            functools.partial(core, use_mosaic=use_mosaic),
            mesh=mesh,
            in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )(state, images4_u8, boxes4, mask4, weights, lr)

    def step(state, images4_u8, boxes4, mask4, weights, lr,
             use_mosaic: bool = True):
        return _step(state, images4_u8, boxes4, mask4, weights, lr,
                     bool(use_mosaic))

    return step
