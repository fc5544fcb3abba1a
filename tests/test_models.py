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


class TestViTGAN:
    """Bytecode-only reference variant rebuilt TPU-native
    (models/vit_gan.py; /root/reference/cgan/__pycache__/
    model_trans.cpython-313.pyc — Generator_ViT / Discriminator_ViT)."""

    def test_generator_shapes_and_scale(self):
        from gcssl_tpu.models.vit_gan import GeneratorViT

        g = GeneratorViT(delta_scale=0.3, embed_dim=64, depth=2, num_heads=2)
        x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (2, 32, 32, 3)),
                        jnp.float32)
        params = g.init(jax.random.PRNGKey(0), x)["params"]
        out = g.apply({"params": params}, x)
        assert out.shape == (2, 4)
        assert float(jnp.abs(out).max()) <= 0.3 + 1e-6  # tanh * delta_scale

    def test_critic_cls_head_and_pair_sensitivity(self):
        from gcssl_tpu.models.vit_gan import CriticViT

        d = CriticViT(embed_dim=64, depth=2, num_heads=2)
        rng = np.random.default_rng(1)
        a = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)), jnp.float32)
        b = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)), jnp.float32)
        params = d.init(jax.random.PRNGKey(0), a, b)["params"]
        s_ab = d.apply({"params": params}, a, b)
        s_aa = d.apply({"params": params}, a, a)
        assert s_ab.shape == (2, 1)
        # the critic must read the OTHER patch, not just pred
        assert not np.allclose(np.asarray(s_ab), np.asarray(s_aa))

    def test_critic_supports_second_order_grads(self):
        # WGAN-GP differentiates the critic twice; ViT path has no
        # custom_vjp so jvp-of-vjp must work
        from gcssl_tpu.models.vit_gan import CriticViT

        d = CriticViT(embed_dim=32, depth=1, num_heads=2)
        rng = np.random.default_rng(2)
        a = jnp.asarray(rng.uniform(-1, 1, (1, 32, 32, 3)), jnp.float32)
        params = d.init(jax.random.PRNGKey(0), a, a)["params"]

        def critic_sum(x):
            return jnp.sum(d.apply({"params": params}, x, x))

        def gp(x):
            g = jax.grad(critic_sum)(x)
            return jnp.sum(jnp.sqrt(jnp.sum(g**2) + 1e-12))

        val, grads = jax.value_and_grad(
            lambda x: gp(x))(a)
        assert np.isfinite(float(val))
        assert np.isfinite(np.asarray(grads)).all()

    def test_factory_selects_vit(self):
        from gcssl_tpu.models.generators import build_generator
        from gcssl_tpu.models.vit_gan import GeneratorViT

        assert isinstance(build_generator("vit", 0.3), GeneratorViT)
