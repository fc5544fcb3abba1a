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
