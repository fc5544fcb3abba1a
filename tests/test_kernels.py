"""Pallas kernel tests (interpret mode on CPU; the real TPU path is
exercised by bench/kernels scripts on hardware)."""

import numpy as np
import pytest

import jax.numpy as jnp

from gcssl_tpu.kernels import fused_instance_norm_act
from gcssl_tpu.kernels.instance_norm import _reference_impl


class TestFusedInstanceNorm:
    @pytest.mark.parametrize("slope", [0.0, 0.2, 1.0])
    def test_matches_reference(self, slope):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(0, 3, (2, 16, 16, 8)), jnp.float32)
        got = fused_instance_norm_act(x, negative_slope=slope, interpret=True)
        want = _reference_impl(x, slope, 1e-5)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def test_normalizes_stats(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(5, 2, (1, 32, 32, 4)), jnp.float32)
        out = np.asarray(fused_instance_norm_act(x, 1.0, interpret=True))
        # slope 1.0 = identity activation: per-channel stats ~ N(0,1)
        np.testing.assert_allclose(out.mean(axis=(1, 2)), 0.0, atol=1e-4)
        np.testing.assert_allclose(out.std(axis=(1, 2)), 1.0, atol=1e-2)

    def test_gradient_matches_reference(self):
        import jax

        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(0, 2, (2, 8, 8, 4)), jnp.float32)

        def f_fused(x):
            return jnp.sum(fused_instance_norm_act(x, 0.2) ** 2)

        def f_ref(x):
            return jnp.sum(_reference_impl(x, 0.2, 1e-5) ** 2)

        g1 = np.asarray(jax.grad(f_fused)(x))
        g2 = np.asarray(jax.grad(f_ref)(x))
        np.testing.assert_allclose(g1, g2, atol=1e-4)

    def test_fallback_on_cpu(self):
        # without interpret on CPU the jnp fallback runs — same numbers
        x = jnp.asarray(np.random.default_rng(2).normal(0, 1, (2, 8, 8, 4)),
                        jnp.float32)
        got = fused_instance_norm_act(x, 0.2)
        want = _reference_impl(x, 0.2, 1e-5)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


class TestFusedCanvasCrop:
    def _inputs(self, b=2, c=96):
        rng = np.random.default_rng(7)
        canv = rng.integers(0, 256, (b, c, c, 3), dtype=np.uint8)
        wh = rng.integers(60, 400, (b, 2)).astype(np.float32)
        boxes = np.stack(
            [rng.uniform(0.25, 0.75, b), rng.uniform(0.25, 0.75, b),
             rng.uniform(0.08, 0.5, b), rng.uniform(0.08, 0.5, b)], -1
        ).astype(np.float32)
        return jnp.asarray(canv), jnp.asarray(wh), jnp.asarray(boxes)

    @pytest.mark.parametrize("softness", [0.0, 1.0])
    def test_matches_pure_jax_crop(self, softness):
        from gcssl_tpu.kernels.crop import fused_canvas_crop
        from gcssl_tpu.train.wgan_gp import _canvas_crop

        canv, wh, boxes = self._inputs()
        want = _canvas_crop(canv, wh, boxes, 32, edge_softness=softness)
        got = fused_canvas_crop(
            canv, wh, boxes, 32, edge_softness=softness, interpret=True
        )
        # bf16 MXU sampling: keep within one 8-bit quantization step
        # (1/127.5) of the f32 reference path
        err = np.abs(np.asarray(want) - np.asarray(got))
        assert err.max() < 1.0 / 127.5, err.max()

    def test_degenerate_box_is_gray(self):
        from gcssl_tpu.kernels.crop import fused_canvas_crop
        from gcssl_tpu.ops.patches import GRAY_FILL_NORM

        canv, wh, boxes = self._inputs()
        # box entirely inside the letterbox pad of a very wide image: the
        # clipped crop rect collapses -> whole patch is gray fill
        wh = jnp.asarray([[400.0, 60.0]] * 2, jnp.float32)
        boxes = jnp.asarray([[0.5, -2.0, 0.05, 0.05]] * 2, jnp.float32)
        got = fused_canvas_crop(canv, wh, boxes, 32, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), GRAY_FILL_NORM, atol=2e-2
        )

    def test_refined_patches_fast_path(self):
        import jax

        from gcssl_tpu.train.wgan_gp import _refined_patches

        canv, wh, boxes = self._inputs()
        deltas = jnp.asarray(
            np.random.default_rng(9).normal(0, 0.05, (2, 4)), jnp.float32
        )
        fallback = jnp.zeros((2, 32, 32, 3), jnp.float32)
        slow = _refined_patches(
            canv, wh, boxes, deltas, fallback, 32, 1.0, smooth=True
        )
        # interpret-mode pallas is routed through the same flag the train
        # step uses on TPU
        import gcssl_tpu.kernels.crop as kc

        orig = kc._crop_batch_cm

        def patched(params, cv, out_size, softness, fill, interpret):
            return orig(params, cv, out_size, softness, fill, True)

        kc._crop_batch_cm = patched
        try:
            fast = _refined_patches(
                canv, wh, boxes, deltas, fallback, 32, 1.0, smooth=True,
                fast=True,
            )
        finally:
            kc._crop_batch_cm = orig
        assert np.abs(np.asarray(slow) - np.asarray(fast)).max() < 1.0 / 127.5
