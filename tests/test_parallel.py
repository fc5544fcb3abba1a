"""Explicit shard_map data-parallel path on the 8-device CPU mesh."""

import numpy as np

import jax
import jax.numpy as jnp

from gcssl_tpu.core import make_mesh
from gcssl_tpu.parallel import (
    make_shard_map_step,
    replicate,
    shard_along_batch,
)


class TestShardMapDP:
    def test_grads_match_single_device(self):
        mesh = make_mesh()
        params = {"w": jnp.asarray(np.random.default_rng(0).normal(0, 1, (4, 2)),
                                   jnp.float32)}
        batch = {
            "x": jnp.asarray(np.random.default_rng(1).normal(0, 1, (16, 4)),
                             jnp.float32),
            "y": jnp.asarray(np.random.default_rng(2).normal(0, 1, (16, 2)),
                             jnp.float32),
        }

        def grad_fn(params, batch):
            def loss_fn(p):
                pred = batch["x"] @ p["w"]
                return jnp.mean((pred - batch["y"]) ** 2)

            return jax.value_and_grad(loss_fn)(params)

        # single device reference
        ref_loss, ref_grads = grad_fn(params, batch)

        step = make_shard_map_step(grad_fn, mesh)
        p_repl = replicate(params, mesh)
        b_shard = shard_along_batch(batch, mesh)
        loss, grads = step(p_repl, b_shard)

        np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(grads["w"]), np.asarray(ref_grads["w"]), rtol=1e-5
        )
