"""PatchGAN Wasserstein critic for (pred_patch, other_patch) pairs.

Contract from /root/reference/cgan/models.py:222-258: channel-concat the two
patches (6 ch), 4 stride-2 conv blocks 6->64->128->256->512 (first without
norm) with optional spectral norm on the strided convs, LeakyReLU(0.2), then
a final stride-1 k4 p1 conv -> 1 channel, no sigmoid (WGAN critic).  A
128x128 input yields a 7x7 score map (the reference's docstring says ~14x14;
7x7 is what its strides actually produce — SURVEY.md C7).

Spectral norm is one power-iteration per call with stats in the
``batch_stats`` collection (torch updates u on every training forward; pass
``update_stats=True`` from train steps only).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from gcssl_tpu.models.layers import instance_norm, pix2pix_kernel_init


class PatchCritic(nn.Module):
    spectral_norm: bool = True
    base: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        pred_patch: jax.Array,
        other_patch: jax.Array,
        *,
        update_stats: bool = False,
    ) -> jax.Array:
        x = jnp.concatenate([pred_patch, other_patch], axis=-1).astype(self.dtype)
        b = self.base
        for i, ch in enumerate((b, b * 2, b * 4, b * 8)):
            conv = nn.Conv(
                ch,
                (4, 4),
                strides=(2, 2),
                padding=((1, 1), (1, 1)),
                use_bias=True,
                kernel_init=pix2pix_kernel_init(),
                dtype=self.dtype,
            )
            if self.spectral_norm:
                x = nn.SpectralNorm(conv)(x, update_stats=update_stats)
            else:
                x = conv(x)
            # NOTE: the critic deliberately uses the plain XLA norm path, not
            # the fused Pallas kernel — WGAN-GP differentiates the critic
            # twice (grad of the gradient penalty), and custom_vjp ops do not
            # support the jvp-of-vjp that second-order autodiff requires.
            if i > 0:
                x = instance_norm(x)
            x = nn.leaky_relu(x, 0.2)
        # final stride-1 conv -> scalar score map, no sigmoid (WGAN)
        x = nn.Conv(
            1,
            (4, 4),
            strides=(1, 1),
            padding=((1, 1), (1, 1)),
            use_bias=False,
            kernel_init=pix2pix_kernel_init(),
            dtype=self.dtype,
        )(x)
        return x.astype(jnp.float32)
