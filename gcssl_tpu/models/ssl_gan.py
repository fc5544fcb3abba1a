"""Classification GAN-SSL model family (BASELINE.json configs).

The generic core behind "GAN-calibrated semi-supervised learning" in its
classification form (Salimans et al. 2016 "Improved Techniques for Training
GANs" style): a DCGAN-ish generator and a K+1-class discriminator whose
softmax over K real classes + 1 fake class yields both a classifier and a
real/fake critic; unlabeled data trains the marginal real-ness, generated
data trains fake-ness, and feature matching stabilizes G.

TPU-first: NHWC, bf16 compute, GroupNorm in D (no batch-stat sync under DP),
transposed convs sized to powers of two so XLA tiles cleanly on the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class DCGANGenerator(nn.Module):
    """latent z -> (S, S, C) image in (-1, 1); S must be 32 or 28-crop of 32."""

    img_size: int = 32
    channels: int = 3
    base: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array, *, train: bool = True) -> jax.Array:
        b = self.base
        s0 = self.img_size // 8  # 4 for 32px
        x = nn.Dense(s0 * s0 * b * 4, dtype=self.dtype)(z)
        x = x.reshape(z.shape[0], s0, s0, b * 4)
        for ch in (b * 2, b, b // 2):
            x = nn.ConvTranspose(
                ch, (4, 4), strides=(2, 2), padding="SAME", dtype=self.dtype
            )(x)
            x = nn.GroupNorm(num_groups=min(32, ch), dtype=self.dtype)(x)
            x = nn.relu(x)
        x = nn.Conv(self.channels, (3, 3), padding="SAME", dtype=self.dtype)(x)
        return jnp.tanh(x.astype(jnp.float32))


class KPlusOneDiscriminator(nn.Module):
    """Conv classifier with K+1 logits; also exposes penultimate features
    for the feature-matching loss."""

    num_classes: int = 10
    base: int = 96
    dropout: float = 0.3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, *, train: bool = True
    ) -> tuple[jax.Array, jax.Array]:
        b = self.base
        x = x.astype(self.dtype)
        for i, (ch, stride) in enumerate(
            ((b, 1), (b, 2), (b * 2, 1), (b * 2, 2), (b * 2, 1))
        ):
            x = nn.Conv(ch, (3, 3), strides=(stride, stride),
                        padding="SAME", dtype=self.dtype)(x)
            x = nn.GroupNorm(num_groups=min(32, ch), dtype=self.dtype)(x)
            x = nn.leaky_relu(x, 0.2)
            if i in (1, 3):
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
        features = jnp.mean(x.astype(jnp.float32), axis=(1, 2))  # (B, 2b)
        logits = nn.Dense(self.num_classes + 1)(features)
        return logits, features


class WideResNetDiscriminator(nn.Module):
    """WRN-28-k-capacity K+1 discriminator (BASELINE.json config 4: wider D
    for CIFAR-100-scale SSL).  depth = 6n+4 with n blocks per group; widths
    (16, 16k, 32k, 64k); GroupNorm + SiLU (batch-stat-free under DP)."""

    num_classes: int = 100
    widen_factor: int = 2
    n_blocks: int = 4  # 28-layer equivalent: n = (28 - 4) / 6 = 4
    dropout: float = 0.3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, *, train: bool = True
    ) -> tuple[jax.Array, jax.Array]:
        k = self.widen_factor
        x = x.astype(self.dtype)
        x = nn.Conv(16, (3, 3), padding="SAME", use_bias=False, dtype=self.dtype)(x)

        def block(x, ch, stride):
            residual = x
            y = nn.GroupNorm(num_groups=min(16, x.shape[-1]), dtype=self.dtype)(x)
            y = nn.silu(y)
            y = nn.Conv(ch, (3, 3), strides=(stride, stride), padding="SAME",
                        use_bias=False, dtype=self.dtype)(y)
            y = nn.GroupNorm(num_groups=min(16, ch), dtype=self.dtype)(y)
            y = nn.silu(y)
            y = nn.Dropout(self.dropout, deterministic=not train)(y)
            y = nn.Conv(ch, (3, 3), padding="SAME", use_bias=False,
                        dtype=self.dtype)(y)
            if residual.shape != y.shape:
                residual = nn.Conv(
                    ch, (1, 1), strides=(stride, stride), use_bias=False,
                    dtype=self.dtype,
                )(residual)
            return residual + y

        for gi, ch in enumerate((16 * k, 32 * k, 64 * k)):
            for b in range(self.n_blocks):
                x = block(x, ch, stride=2 if (b == 0 and gi > 0) else 1)
        x = nn.GroupNorm(num_groups=16, dtype=self.dtype)(x)
        x = nn.silu(x)
        features = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        logits = nn.Dense(self.num_classes + 1)(features)
        return logits, features


def real_class_logsumexp(logits: jax.Array) -> jax.Array:
    """log sum_k exp(logit_k) over the K real classes — the 'realness' logit
    used by the K+1 SSL objective (fake logit is the last column)."""
    return jax.nn.logsumexp(logits[..., :-1], axis=-1)
