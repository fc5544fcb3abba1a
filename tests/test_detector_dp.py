"""Data-parallel detector training: psum'd loss/grad exactness vs the
full-batch computation, DP-step replica sync, and fold×data 2-D meshes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from gcssl_tpu.core.config import DetectorConfig
from gcssl_tpu.parallel import make_detector_dp_step, make_fold_mesh
from gcssl_tpu.train.detector import (
    create_detector_state,
    detection_loss,
    detection_loss_tal,
)


def tiny_cfg(**over):
    d = dict(
        img_size=64, width_mult=0.25, depth_mult=0.33, batch_size=4,
        compute_dtype="float32", max_boxes=4, mosaic=False, epochs=1,
        warmup_epochs=0, close_mosaic_epochs=0, patience=50, seed=0,
    )
    d.update(over)
    return DetectorConfig(**d)


def _batch(n=4, size=64, seed=0):
    rng = np.random.default_rng(seed)
    images = jnp.asarray(
        rng.uniform(0, 1, (n, size, size, 3)).astype(np.float32)
    )
    boxes = jnp.asarray(rng.uniform(0.3, 0.7, (n, 2, 4)).astype(np.float32))
    mask = jnp.asarray(rng.uniform(size=(n, 2)) > 0.3)
    weights = jnp.ones((n,), jnp.float32)
    return images, boxes, mask, weights


@pytest.mark.parametrize("which", ["tal", "focal"])
def test_sharded_loss_psums_to_full_batch(which):
    """psum(per-shard loss with axis_name) == full-batch loss, and the
    psum'd per-shard grads == full-batch grads (the invariant the DP step
    relies on)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    cfg = tiny_cfg(assigner="tal" if which == "tal" else "fcos")
    state, model, _ = create_detector_state(cfg, jax.random.PRNGKey(0))
    images, boxes, mask, weights = _batch(n=4)

    def loss_of(params, images, boxes, mask, weights, axis_name=None):
        outs = model.apply({"params": params}, images)
        if which == "tal":
            c, b = detection_loss_tal(
                outs, boxes, mask, cfg.img_size, weights, axis_name=axis_name
            )
        else:
            c, b = detection_loss(
                outs, boxes, mask, cfg.img_size, weights, axis_name=axis_name
            )
        return c + b

    full_loss, full_grads = jax.value_and_grad(loss_of)(
        state.params, images, boxes, mask, weights
    )

    mesh = Mesh(np.asarray(jax.devices()[:2]), ("data",))

    def per_shard(params, images, boxes, mask, weights):
        loss, grads = jax.value_and_grad(loss_of)(
            params, images, boxes, mask, weights, axis_name="data"
        )
        return jax.lax.psum((loss, grads), "data")

    sh_loss, sh_grads = jax.jit(jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(), P("data"), P("data"), P("data"), P("data")),
        out_specs=(P(), P()),
        check_vma=False,
    ))(state.params, images, boxes, mask, weights)

    np.testing.assert_allclose(
        np.asarray(sh_loss), np.asarray(full_loss), rtol=1e-5
    )
    for a, b in zip(jax.tree.leaves(sh_grads), jax.tree.leaves(full_grads)):
        # accumulation-order noise: the full batch reduces 4 terms in one
        # sum, the sharded path 2+2 then psum
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=5e-5
        )


class TestDetectorDpStep:
    def test_replicas_stay_bitwise_in_sync(self):
        """Two DP steps on 4 shards: every device's copy of params / opt /
        EMA / rng is identical afterwards (the update is built to be
        shard-invariant)."""
        if len(jax.devices()) < 4:
            pytest.skip("needs 4 devices")
        cfg = tiny_cfg(batch_size=4)
        mesh = Mesh(np.asarray(jax.devices()[:4]), ("data",))
        state, model, tx = create_detector_state(cfg, jax.random.PRNGKey(0))
        step = make_detector_dp_step(cfg, model, tx, mesh)

        rng = np.random.default_rng(7)
        bs = 4
        im4 = jnp.asarray(rng.integers(0, 255, (bs, 4, 64, 64, 3)), jnp.uint8)
        b4 = jnp.asarray(rng.uniform(0.3, 0.7, (bs, 4, 2, 4)), jnp.float32)
        m4 = jnp.ones((bs, 4, 2), bool)
        w = jnp.ones((bs,), jnp.float32)
        for _ in range(2):
            state, metrics = step(
                state, im4, b4, m4, w, jnp.float32(1e-3), use_mosaic=True
            )
        assert np.isfinite(float(metrics["loss"]))

        desync = 0
        for leaf in jax.tree.leaves(state.params) + [state.rng]:
            shards = [np.asarray(s.data) for s in leaf.addressable_shards]
            for s in shards[1:]:
                if not np.array_equal(s, shards[0]):
                    desync += 1
        assert desync == 0, f"{desync} leaves desynced across replicas"

    def test_padded_slots_do_not_change_update(self):
        """Weight-0 batch slots are padding: garbage images/boxes there
        must not change the DP update (loss normalizers and grads are
        weighted before the psum)."""
        if len(jax.devices()) < 2:
            pytest.skip("needs 2 devices")
        cfg = tiny_cfg(batch_size=4)
        mesh = Mesh(np.asarray(jax.devices()[:2]), ("data",))

        rng = np.random.default_rng(11)
        bs = 4
        im4 = rng.integers(0, 255, (bs, 4, 64, 64, 3)).astype(np.uint8)
        b4 = rng.uniform(0.3, 0.7, (bs, 4, 2, 4)).astype(np.float32)
        m4 = np.ones((bs, 4, 2), bool)
        w = np.asarray([1, 1, 1, 0], np.float32)  # slot 3 = padding

        im4_g, b4_g = im4.copy(), b4.copy()
        im4_g[3] = rng.integers(0, 255, (4, 64, 64, 3))
        b4_g[3] = rng.uniform(0.1, 0.9, (4, 2, 4))

        losses = []
        for imgs, boxes in ((im4, b4), (im4_g, b4_g)):
            state, model, tx = create_detector_state(
                cfg, jax.random.PRNGKey(0)
            )
            step = make_detector_dp_step(cfg, model, tx, mesh)
            state, metrics = step(
                state, jnp.asarray(imgs), jnp.asarray(boxes),
                jnp.asarray(m4), jnp.asarray(w), jnp.float32(1e-3),
                use_mosaic=False,
            )
            losses.append(float(metrics["loss"]))
            params = jax.device_get(state.params)
            if len(losses) == 1:
                ref_params = params
        assert losses[0] == pytest.approx(losses[1], rel=1e-6)
        for a, b in zip(jax.tree.leaves(ref_params), jax.tree.leaves(params)):
            np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)

    def test_train_detector_dp_end_to_end(self):
        """The public trainer with dp=4: epoch histories + val eval finite,
        params leave init, and the returned state's replicas are in sync."""
        if len(jax.devices()) < 4:
            pytest.skip("needs 4 devices")
        from gcssl_tpu.pipeline.detect import train_detector
        from tests.test_fold_parallel import synth_arrays

        cfg = tiny_cfg(batch_size=4, epochs=2, ema_decay=0.9)
        arrays = synth_arrays(n=8)
        val = synth_arrays(n=4, seed=1)
        state0, _, _ = create_detector_state(cfg, jax.random.PRNGKey(cfg.seed))
        state, _, history = train_detector(cfg, arrays, val, dp=4)
        assert len(history) == 2
        assert all(np.isfinite(r["loss"]) for r in history)
        assert all("map50" in r for r in history)
        moved = any(
            not np.allclose(a, b)
            for a, b in zip(jax.tree.leaves(jax.device_get(state.params)),
                            jax.tree.leaves(jax.device_get(state0.params)))
        )
        assert moved
        for leaf in jax.tree.leaves(state.params):
            shards = [np.asarray(s.data) for s in leaf.addressable_shards]
            assert all(np.array_equal(s, shards[0]) for s in shards[1:])

    def test_train_detector_dp_batch_divisibility(self):
        if len(jax.devices()) < 2:
            pytest.skip("needs 2 devices")
        from gcssl_tpu.pipeline.detect import train_detector
        from tests.test_fold_parallel import synth_arrays

        cfg = tiny_cfg(batch_size=3)
        with pytest.raises(ValueError, match="not divisible"):
            train_detector(cfg, synth_arrays(n=6), dp=2)

    def test_fold_by_data_mesh_step(self):
        """2 folds x 4-way DP on 8 devices: one fold-parallel step runs,
        metrics are per-fold and finite, and each fold's params stay in
        sync across its data group."""
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 devices")
        from jax.sharding import NamedSharding

        from gcssl_tpu.parallel.fold_parallel import (
            _stack, make_fold_train_step,
        )

        cfg = tiny_cfg(batch_size=4)
        k, bs = 2, cfg.batch_size
        mesh = make_fold_mesh(k, data=4)
        assert mesh.shape == {"fold": 2, "data": 4}
        st, model, tx = create_detector_state(cfg, jax.random.PRNGKey(0))
        states = _stack([jax.tree.map(jnp.copy, st) for _ in range(k)])
        states = jax.device_put(states, NamedSharding(mesh, P("fold")))
        vstep = make_fold_train_step(cfg, model, tx, mesh)

        rng = np.random.default_rng(3)
        im4 = jnp.asarray(
            rng.integers(0, 255, (k, bs, 4, 64, 64, 3)), jnp.uint8
        )
        b4 = jnp.asarray(rng.uniform(0.3, 0.7, (k, bs, 4, 2, 4)), jnp.float32)
        m4 = jnp.ones((k, bs, 4, 2), bool)
        w = jnp.ones((k, bs), jnp.float32)
        states, met = vstep(
            states, im4, b4, m4, w, jnp.float32(1e-3), use_mosaic=True
        )
        met = jax.device_get(met)
        assert met["loss"].shape == (k,) and np.isfinite(met["loss"]).all()
        # folds trained on different data -> different losses
        assert abs(met["loss"][0] - met["loss"][1]) > 1e-7


class TestPredictDp:
    def test_predict_arrays_dp_matches_single_device(self):
        """DP inference is pure data parallelism — per-image results must be
        IDENTICAL to the single-device run (same boxes, scores, and order),
        including the padded final batch."""
        if len(jax.devices()) < 4:
            pytest.skip("needs 4 devices")
        from gcssl_tpu.pipeline.detect import predict_arrays
        from gcssl_tpu.train.detector import make_detector_predict
        from tests.test_fold_parallel import synth_arrays

        cfg = tiny_cfg()
        state, model, _ = create_detector_state(cfg, jax.random.PRNGKey(0))
        predict_fn = make_detector_predict(cfg, model)
        arrays = synth_arrays(n=10)  # 3 batches of 4, last padded
        params = jax.device_get(state.params)
        kw = dict(conf_thr=0.01, iou_thr=0.7, batch_size=4)
        b1, s1 = predict_arrays(predict_fn, params, arrays, **kw)
        b4, s4 = predict_arrays(predict_fn, params, arrays, dp=4, **kw)
        assert len(b1) == len(b4) == 10
        for i in range(10):
            np.testing.assert_allclose(b4[i], b1[i], rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(s4[i], s1[i], rtol=1e-5, atol=1e-6)

    def test_predict_arrays_dp_batch_divisibility(self):
        if len(jax.devices()) < 2:
            pytest.skip("needs 2 devices")
        from gcssl_tpu.pipeline.detect import predict_arrays
        from gcssl_tpu.train.detector import make_detector_predict
        from tests.test_fold_parallel import synth_arrays

        cfg = tiny_cfg()
        state, model, _ = create_detector_state(cfg, jax.random.PRNGKey(0))
        predict_fn = make_detector_predict(cfg, model)
        with pytest.raises(ValueError, match="not divisible"):
            predict_arrays(predict_fn, state.params, synth_arrays(n=6),
                           conf_thr=0.01, iou_thr=0.7, batch_size=3, dp=2)
