"""Masked-reconstruction pretraining tests: loss learns, masking only
scores hidden patches, backbone grafts into detector."""

import numpy as np

import jax
import jax.numpy as jnp

from gcssl_tpu.core.config import DetectorConfig
from gcssl_tpu.train.detector import create_detector_state
from gcssl_tpu.train.pretrain import (
    PATCH,
    _normalize_patches,
    pretrain_backbone,
    transfer_backbone,
)


def small_cfg():
    return DetectorConfig(
        img_size=64, width_mult=0.25, depth_mult=0.33, compute_dtype="float32"
    )


class TestPretrain:
    def test_normalize_patches_zero_mean_unit_var(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)), jnp.float32)
        z = np.asarray(_normalize_patches(x, 64 // PATCH))
        blocks = z.reshape(2, 2, PATCH, 2, PATCH, 3)
        mu = blocks.mean(axis=(2, 4, 5))
        sd = blocks.std(axis=(2, 4, 5))
        np.testing.assert_allclose(mu, 0.0, atol=1e-4)
        np.testing.assert_allclose(sd, 1.0, atol=1e-2)

    def test_reconstruction_loss_decreases(self):
        cfg = small_cfg()
        # structured images (stripes of varying phase): reconstruction from
        # context is learnable
        rng = np.random.default_rng(0)
        t = np.arange(96, dtype=np.float32)
        imgs = []
        for i in range(64):
            phase = rng.uniform(0, np.pi)
            freq = rng.uniform(0.1, 0.3)
            row = 127 + 120 * np.sin(freq * t + phase)
            img = np.broadcast_to(row[None, :, None], (96, 96, 3))
            imgs.append(img)
        imgs = np.stack(imgs).astype(np.uint8)
        recs = []
        pretrain_backbone(
            cfg, imgs, epochs=8, img_size=64, batch_size=16, lr=2e-3,
            warmup_epochs=1, log_fn=recs.append,
        )
        assert recs[-1]["loss"] < recs[0]["loss"] * 0.8, (
            f"no learning: {recs[0]['loss']:.3f} -> {recs[-1]['loss']:.3f}"
        )
        assert np.isfinite(recs[-1]["loss"])

    def test_transfer_backbone_shapes(self):
        cfg = small_cfg()
        rng = np.random.default_rng(1)
        imgs = rng.integers(0, 255, (8, 96, 96, 3), dtype=np.uint8)
        bb = pretrain_backbone(cfg, imgs, epochs=1, img_size=64, batch_size=8)
        state, model, _ = create_detector_state(cfg, jax.random.PRNGKey(0))
        params = transfer_backbone(jax.device_get(state.params), bb)
        # grafted tree must still run the detector forward
        outs = model.apply({"params": params}, jnp.zeros((1, 64, 64, 3)))
        assert len(outs) == 3
        # and the backbone leaves must be the pretrained ones
        a = jax.tree.leaves(params["backbone"])[0]
        b = jax.tree.leaves(bb)[0]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_saved_backbone_grafts_via_init_from(self, tmp_path):
        from gcssl_tpu.pipeline.detect import train_detector
        from gcssl_tpu.data.detection import DetectionArrays

        cfg = small_cfg()
        rng = np.random.default_rng(2)
        imgs = rng.integers(0, 255, (8, 96, 96, 3), dtype=np.uint8)
        bb = pretrain_backbone(
            cfg, imgs, epochs=1, img_size=64, batch_size=8,
            save_dir=tmp_path / "pre",
        )
        tr = DetectionArrays(
            images=rng.integers(0, 255, (4, 64, 64, 3), dtype=np.uint8),
            boxes=np.tile(
                np.asarray([[0.5, 0.5, 0.4, 0.4]], np.float32), (4, 1, 1)
            ).reshape(4, 1, 4),
            cls=np.zeros((4, 1), np.int32),
            mask=np.ones((4, 1), bool),
            names=[f"i{k}" for k in range(4)],
            orig_wh=np.tile([64, 64], (4, 1)).astype(np.float32),
            img_size=64,
        )
        cfg2 = DetectorConfig(
            img_size=64, width_mult=0.25, batch_size=4,
            compute_dtype="float32", epochs=1, warmup_epochs=0, mosaic=False,
        )
        state, model, hist = train_detector(
            cfg2, tr, None, max_epochs=1,
            init_from=tmp_path / "pre" / "backbone.msgpack",
        )
        first = jax.tree.leaves(jax.device_get(state.params)["backbone"])[0]
        assert np.isfinite(np.asarray(first)).all()
        # grafted leaf actually came from the pretrained backbone is hard to
        # assert post-step; instead check graft rejects a bogus file
        import pytest

        bogus = tmp_path / "bogus.msgpack"
        from flax import serialization

        bogus.write_bytes(serialization.to_bytes({"params": {"nope": np.zeros(3)}}))
        with pytest.raises(ValueError):
            train_detector(
                cfg2, tr, None, max_epochs=1, init_from=bogus
            )
