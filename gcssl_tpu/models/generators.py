"""Calibrator generators: U-Net and simple CNN regressor -> 4-D box delta.

Architectural contract from /root/reference/cgan/models.py:

* GeneratorUNet (:89-141): 4 down blocks 3->64->128->256->512 (first without
  norm, last with dropout 0.5), 4 up blocks with skip concat, global average
  pool -> Dense(64->4) -> tanh -> * delta_scale.
* GeneratorSimpleRegressor (:147-216): VGG-style 4 double-conv blocks with
  InstanceNorm+ReLU and max-pool, head 512->256->64->4 with dropout 0.5 and
  tanh * delta_scale.

NHWC, bf16-friendly.  Inputs are (B, S, S, 3) patches in (-1, 1); outputs
(B, 4) deltas in (-delta_scale, delta_scale).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from gcssl_tpu.models.layers import (
    ConvDown,
    ConvUp,
    instance_norm_act,
    pix2pix_kernel_init,
)


class GeneratorUNet(nn.Module):
    delta_scale: float = 0.3
    base: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        b = self.base
        x = x.astype(self.dtype)
        d1 = ConvDown(b, normalize=False, dtype=self.dtype)(x, deterministic=deterministic)          # S/2
        d2 = ConvDown(b * 2, dtype=self.dtype)(d1, deterministic=deterministic)                      # S/4
        d3 = ConvDown(b * 4, dtype=self.dtype)(d2, deterministic=deterministic)                      # S/8
        d4 = ConvDown(b * 8, dropout=0.5, dtype=self.dtype)(d3, deterministic=deterministic)         # S/16

        u1 = ConvUp(b * 4, dropout=0.5, dtype=self.dtype)(d4, deterministic=deterministic)
        u1 = jnp.concatenate([u1, d3], axis=-1)                  # 256+256
        u2 = ConvUp(b * 2, dropout=0.5, dtype=self.dtype)(u1, deterministic=deterministic)
        u2 = jnp.concatenate([u2, d2], axis=-1)                  # 128+128
        u3 = ConvUp(b, dtype=self.dtype)(u2, deterministic=deterministic)
        u3 = jnp.concatenate([u3, d1], axis=-1)                  # 64+64
        u4 = ConvUp(b, dtype=self.dtype)(u3, deterministic=deterministic)  # back to S, 64ch (no skip)

        pooled = jnp.mean(u4.astype(jnp.float32), axis=(1, 2))   # (B, 64)
        delta = nn.Dense(4, kernel_init=pix2pix_kernel_init())(pooled)
        return jnp.tanh(delta) * self.delta_scale


class GeneratorSimpleRegressor(nn.Module):
    delta_scale: float = 0.3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        x = x.astype(self.dtype)

        def double_conv(x, ch):
            for _ in range(2):
                x = nn.Conv(
                    ch, (3, 3), padding=((1, 1), (1, 1)),
                    kernel_init=pix2pix_kernel_init(), dtype=self.dtype,
                )(x)
                x = instance_norm_act(x, 0.0)
            return nn.max_pool(x, (2, 2), strides=(2, 2))

        for ch in (64, 128, 256, 512):
            x = double_conv(x, ch)

        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))  # (B, 512)
        x = nn.relu(nn.Dense(256, kernel_init=pix2pix_kernel_init())(x))
        x = nn.Dropout(0.5, deterministic=deterministic)(x)
        x = nn.relu(nn.Dense(64, kernel_init=pix2pix_kernel_init())(x))
        x = nn.Dropout(0.5, deterministic=deterministic)(x)
        delta = nn.Dense(4, kernel_init=pix2pix_kernel_init())(x)
        return jnp.tanh(delta) * self.delta_scale


def build_generator(generator_type: str, delta_scale: float, dtype=jnp.float32):
    """Factory matching /root/reference/cgan/cgan_train_enhanced.py:26-31,
    plus the bytecode-only ViT variant (models/vit_gan.py)."""
    if generator_type == "simple":
        return GeneratorSimpleRegressor(delta_scale=delta_scale, dtype=dtype)
    if generator_type == "vit":
        from gcssl_tpu.models.vit_gan import GeneratorViT

        return GeneratorViT(delta_scale=delta_scale, dtype=dtype)
    return GeneratorUNet(delta_scale=delta_scale, dtype=dtype)
