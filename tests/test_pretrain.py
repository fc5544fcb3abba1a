"""RotNet pretraining tests: learns rotations, backbone grafts into detector."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gcssl_tpu.core.config import DetectorConfig
from gcssl_tpu.train.detector import create_detector_state
from gcssl_tpu.train.pretrain import pretrain_backbone, transfer_backbone


def small_cfg():
    return DetectorConfig(
        img_size=64, width_mult=0.25, depth_mult=0.33, compute_dtype="float32"
    )


class TestPretrain:
    def test_learns_rotation_task(self):
        cfg = small_cfg()
        # oriented gradient images: rotation is easily learnable
        rng = np.random.default_rng(0)
        base = np.linspace(0, 255, 64, dtype=np.float32)
        imgs = np.broadcast_to(base[None, :, None, None], (64, 64, 64, 3))
        imgs = (imgs + rng.normal(0, 10, imgs.shape)).clip(0, 255).astype(np.uint8)
        recs = []
        pretrain_backbone(
            cfg, imgs, epochs=6, img_size=64, batch_size=16, lr=1e-3,
            log_fn=recs.append,
        )
        assert recs[-1]["acc"] > 0.6, f"rotation acc too low: {recs[-1]}"

    def test_transfer_backbone_shapes(self):
        cfg = small_cfg()
        rng = np.random.default_rng(1)
        imgs = rng.integers(0, 255, (8, 64, 64, 3), dtype=np.uint8)
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
