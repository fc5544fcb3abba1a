"""Shared building blocks: InstanceNorm, pix2pix init, conv block helpers.

NHWC layout throughout (TPU-native); parameters in float32, compute
optionally bfloat16 (MXU).  Reference semantics:

* InstanceNorm2d(affine=False): /root/reference/cgan/models.py:59,74 —
  per-sample per-channel normalization over H,W, eps 1e-5, no learnable
  scale/bias (torch default affine=False, so the reference's norm layers
  contribute zero parameters).
* pix2pix N(0, 0.02) conv init: /root/reference/cgan/models.py:37-48.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def pix2pix_kernel_init(std: float = 0.02):
    """Conv kernel init ~ N(0, 0.02) (pix2pix / reference weights_init_normal)."""
    return nn.initializers.normal(stddev=std)


def instance_norm(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """InstanceNorm without affine params; stats accumulated in f32.

    x: (B, H, W, C) -> same shape/dtype.
    """
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=(1, 2), keepdims=True)
    out = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return out.astype(x.dtype)


def instance_norm_act(x: jax.Array, negative_slope: float) -> jax.Array:
    """InstanceNorm + (Leaky)ReLU via the fused Pallas kernel on TPU
    (kernels/instance_norm.py; jnp fallback elsewhere, identical numerics).

    Default OFF (opt in with GCSSL_PALLAS_NORM=1): measured end-to-end on
    v5e, the standalone kernel wins in isolation (up to +57% bandwidth,
    tests/test_kernels.py + kernels/instance_norm.py docstring) but LOSES
    inside the full fused WGAN-GP training graph (1358 vs 2487 img/s) —
    XLA fuses the norm into the conv epilogue, and the custom_vjp boundary
    blocks that fusion.  Measure per workload.
    """
    import os

    if os.environ.get("GCSSL_PALLAS_NORM", "0") != "1":
        x32 = instance_norm(x)
        return jnp.where(x32 >= 0, x32, x32 * negative_slope).astype(x.dtype)
    from gcssl_tpu.kernels import fused_instance_norm_act

    return fused_instance_norm_act(x, negative_slope)


class ConvDown(nn.Module):
    """Conv(k4, s2, p1, no bias) [+ InstanceNorm] + LeakyReLU(0.2) [+ Dropout].

    The reference's ``UNetDown`` (/root/reference/cgan/models.py:54-66).
    """

    features: int
    normalize: bool = True
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        x = nn.Conv(
            self.features,
            (4, 4),
            strides=(2, 2),
            padding=((1, 1), (1, 1)),
            use_bias=False,
            kernel_init=pix2pix_kernel_init(),
            dtype=self.dtype,
        )(x)
        if self.normalize:
            x = instance_norm_act(x, 0.2)
        else:
            x = nn.leaky_relu(x, 0.2)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return x


class ConvUp(nn.Module):
    """ConvTranspose(k4, s2, no bias) + InstanceNorm + ReLU [+ Dropout].

    The reference's ``UNetUp`` (/root/reference/cgan/models.py:68-83); the
    skip concat happens in the caller.
    """

    features: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        x = nn.ConvTranspose(
            self.features,
            (4, 4),
            strides=(2, 2),
            padding="SAME",
            use_bias=False,
            kernel_init=pix2pix_kernel_init(),
            dtype=self.dtype,
        )(x)
        x = instance_norm_act(x, 0.0)  # norm + ReLU fused
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return x
