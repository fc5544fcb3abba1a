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


class TestShardMapMore:
    def test_uneven_final_batch_weights(self):
        """Padded samples (weight 0) must not change the pmean'd loss/grads
        vs the unpadded single-device computation."""
        mesh = make_mesh()
        rng = np.random.default_rng(3)
        params = {"w": jnp.asarray(rng.normal(0, 1, (4, 2)), jnp.float32)}
        n_real, n_pad = 11, 5  # 16 total over 8 devices, 5 garbage slots
        x = rng.normal(0, 1, (16, 4)).astype(np.float32)
        y = rng.normal(0, 1, (16, 2)).astype(np.float32)
        w = np.zeros(16, np.float32)
        w[:n_real] = 1.0
        x[n_real:] = 1e6  # garbage in padded slots

        def grad_fn(params, batch):
            def loss_fn(p):
                pred = batch["x"] @ p["w"]
                per = jnp.sum((pred - batch["y"]) ** 2, axis=-1)
                # weighted sum / GLOBAL real count (psum'd outside the mean)
                return jnp.sum(per * batch["w"]) / n_real * 8.0

            return jax.value_and_grad(loss_fn)(params)

        def ref_fn(p):
            pred = x[:n_real] @ p["w"]
            return jnp.mean(jnp.sum((pred - y[:n_real]) ** 2, axis=-1))

        ref_loss, ref_grads = jax.value_and_grad(ref_fn)(params)

        step = make_shard_map_step(grad_fn, mesh)
        from gcssl_tpu.parallel import replicate, shard_along_batch

        loss, grads = step(
            replicate(params, mesh),
            shard_along_batch(
                {"x": jnp.asarray(x), "y": jnp.asarray(y), "w": jnp.asarray(w)},
                mesh,
            ),
        )
        np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(grads["w"]), np.asarray(ref_grads["w"]), rtol=1e-4
        )

    def test_wgan_fused_step_dp_equivalence(self):
        """The fused WGAN-GP step under 8-way sharding-inference DP produces
        the same metrics as the same step on one device."""
        from gcssl_tpu.core import CalibratorConfig, apply_overrides
        from gcssl_tpu.core.mesh import data_sharding, replicated_sharding
        from gcssl_tpu.train import DeviceData, create_train_state, make_train_step
        from jax.sharding import Mesh

        cfg = apply_overrides(
            CalibratorConfig(),
            {
                "data.img_size": 16, "data.canvas_size": 32,
                "train.batch_size": 8, "train.n_critic": 1,
                "train.compute_dtype": "float32",
                "model.generator_type": "simple",
            },
        )
        rng = np.random.default_rng(0)
        n, m, s, c = 16, 2, 16, 32
        boxes = np.column_stack(
            [rng.uniform(0.4, 0.6, (n, 2)), rng.uniform(0.2, 0.3, (n, 2))]
        ).astype(np.float32)
        data = DeviceData(
            pred_patch=jnp.asarray(rng.integers(0, 255, (n, s, s, 3)), jnp.uint8),
            gt_patch=jnp.asarray(rng.integers(0, 255, (n, s, s, 3)), jnp.uint8),
            delta=jnp.asarray(rng.normal(0, 0.1, (n, 4)), jnp.float32),
            pred_box=jnp.asarray(boxes),
            gt_box=jnp.asarray(
                np.clip(boxes + rng.normal(0, 0.02, (n, 4)), 0.05, 0.95),
                jnp.float32,
            ),
            canvas_idx=jnp.asarray(rng.integers(0, m, n), jnp.int32),
            canvases=jnp.asarray(rng.integers(0, 255, (m, c, c, 3)), jnp.uint8),
            canvas_wh=jnp.asarray(np.tile([[64.0, 48.0]], (m, 1)), jnp.float32),
        )
        idx = jnp.arange(8, dtype=jnp.int32)
        w = jnp.ones(8, jnp.float32)

        def run(sharded: bool):
            state, g_model, d_model = create_train_state(
                cfg, jax.random.PRNGKey(0)
            )
            step = make_train_step(cfg, g_model, d_model)
            st, dat, ix, ww = state, data, idx, w
            if sharded:
                mesh = make_mesh()
                repl, dsh = replicated_sharding(mesh), data_sharding(mesh)
                st = jax.tree.map(lambda x: jax.device_put(x, repl), st)
                dat = jax.tree.map(lambda x: jax.device_put(x, repl), dat)
                ix = jax.device_put(ix, dsh)
                ww = jax.device_put(ww, dsh)
            _, metrics = step(st, dat, ix, ww, jnp.float32(1e-4))
            return jax.device_get(metrics)

        m1 = run(False)
        m8 = run(True)
        for k in m1:
            np.testing.assert_allclose(m1[k], m8[k], rtol=2e-4, err_msg=k)
