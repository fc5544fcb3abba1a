"""Shape/param/behavior tests for the calibrator model zoo."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gcssl_tpu.models import (
    GeneratorUNet,
    GeneratorSimpleRegressor,
    PatchCritic,
    build_generator,
)


def n_params(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


@pytest.fixture(scope="module")
def patch_batch():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.uniform(-1, 1, (2, 128, 128, 3)), jnp.float32)


class TestGeneratorUNet:
    def test_output_shape_and_range(self, patch_batch):
        model = GeneratorUNet(delta_scale=0.3)
        variables = model.init(jax.random.PRNGKey(0), patch_batch)
        out = model.apply(variables, patch_batch)
        assert out.shape == (2, 4)
        assert float(jnp.max(jnp.abs(out))) <= 0.3 + 1e-6

    def test_param_count_matches_reference(self, patch_batch):
        # Reference: 6,294,788 params (SURVEY.md §6, computed from models.py
        # with InstanceNorm affine=False contributing none).  Our NHWC build
        # uses identical channel widths/kernels -> identical count.
        model = GeneratorUNet()
        variables = model.init(jax.random.PRNGKey(0), patch_batch)
        assert n_params(variables["params"]) == 6_294_788

    def test_dropout_active_in_training(self, patch_batch):
        model = GeneratorUNet()
        variables = model.init(jax.random.PRNGKey(0), patch_batch)
        a = model.apply(
            variables, patch_batch, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(1)},
        )
        b = model.apply(
            variables, patch_batch, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(2)},
        )
        assert not np.allclose(np.asarray(a), np.asarray(b))


class TestGeneratorSimple:
    def test_output_shape(self, patch_batch):
        model = GeneratorSimpleRegressor(delta_scale=0.3)
        variables = model.init(jax.random.PRNGKey(0), patch_batch)
        out = model.apply(variables, patch_batch)
        assert out.shape == (2, 4)

    def test_param_count_matches_reference(self, patch_batch):
        # Reference: 4,833,412 params (SURVEY.md §6).
        model = GeneratorSimpleRegressor()
        variables = model.init(jax.random.PRNGKey(0), patch_batch)
        assert n_params(variables["params"]) == 4_833_412

    def test_factory(self):
        assert isinstance(build_generator("simple", 0.3), GeneratorSimpleRegressor)
        assert isinstance(build_generator("unet", 0.3), GeneratorUNet)


class TestPatchCritic:
    def test_score_map_7x7(self, patch_batch):
        model = PatchCritic(spectral_norm=False)
        variables = model.init(jax.random.PRNGKey(0), patch_batch, patch_batch)
        out = model.apply(variables, patch_batch, patch_batch)
        # 128 -> 64 -> 32 -> 16 -> 8 -> (k4 s1 p1) 7
        assert out.shape == (2, 7, 7, 1)

    def test_param_count_matches_reference(self, patch_batch):
        # Reference: 2,767,808 params (SURVEY.md §6).
        model = PatchCritic(spectral_norm=False)
        variables = model.init(jax.random.PRNGKey(0), patch_batch, patch_batch)
        assert n_params(variables["params"]) == 2_767_808

    def test_spectral_norm_bounds_lipschitz(self, patch_batch):
        model = PatchCritic(spectral_norm=True)
        variables = model.init(jax.random.PRNGKey(0), patch_batch, patch_batch)
        # scale all params 10x: with SN the output must NOT scale 10^4x
        big = jax.tree.map(lambda p: p * 10.0, variables["params"])
        out1 = model.apply(
            {"params": variables["params"], "batch_stats": variables["batch_stats"]},
            patch_batch, patch_batch,
        )
        out2 = model.apply(
            {"params": big, "batch_stats": variables["batch_stats"]},
            patch_batch, patch_batch,
        )
        ratio = float(jnp.abs(out2).mean() / (jnp.abs(out1).mean() + 1e-9))
        # 4 SN'd convs absorb 10x each; only the last (non-SN) conv scales.
        assert ratio < 100.0

    def test_update_stats_mutates_u(self, patch_batch):
        model = PatchCritic(spectral_norm=True)
        variables = model.init(jax.random.PRNGKey(0), patch_batch, patch_batch)
        _, mutated = model.apply(
            variables, patch_batch, patch_batch,
            update_stats=True, mutable=["batch_stats"],
        )
        before = jax.tree.leaves(variables["batch_stats"])
        after = jax.tree.leaves(mutated["batch_stats"])
        assert any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(before, after)
        )
