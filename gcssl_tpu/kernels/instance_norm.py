"""Fused InstanceNorm + activation as a Pallas TPU kernel (with custom VJP).

Every conv block in the calibrator G/D does InstanceNorm (per-sample,
per-channel stats over HxW) followed by (Leaky)ReLU
(/root/reference/cgan/models.py:54-83,235-243).  Unfused, that's three
HBM round-trips over the activation tensor; this kernel does one read + one
write per sample: the whole (H, W, C) slab sits in VMEM, the VPU computes
both the reduction and the normalized/activated output in place.  Measured
on v5e: 274-292 GB/s vs 201-262 GB/s for the XLA fusion (+11-36%).

Grid: one program per batch sample.  The compiler double-buffers input and
output blocks, so live VMEM ~ 4x the slab; slabs over the budget (or non-TPU
backends) fall back to the jnp implementation with identical numerics.

Custom VJP: the backward is the standard instance-norm gradient with the
activation mask folded in, recomputing stats from the saved input — a single
XLA fusion, so it needs no kernel of its own.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Per-sample slab limit.  The compiler double-buffers both the input and the
# output block, so live VMEM is ~4x the slab; 16 MB scoped limit / 4 -> keep
# slabs at <= 2 MB (measured: 2 MB slabs run, 4 MB slabs OOM scoped vmem).
VMEM_BUDGET_BYTES = 2 * 1024 * 1024


def pallas_available() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _reference_impl(x: jax.Array, negative_slope: float, eps: float) -> jax.Array:
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=(1, 2), keepdims=True)
    out = (x32 - mean) * jax.lax.rsqrt(var + eps)
    out = jnp.where(out >= 0, out, out * negative_slope)
    return out.astype(x.dtype)


def _kernel(x_ref, o_ref, *, negative_slope: float, eps: float):
    x = x_ref[...].astype(jnp.float32)  # (1, H, W, C) block
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    centered = x - mean
    var = jnp.mean(centered * centered, axis=(1, 2), keepdims=True)
    out = centered * jax.lax.rsqrt(var + eps)
    out = jnp.where(out >= 0.0, out, out * negative_slope)
    o_ref[...] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("negative_slope", "eps", "interpret"))
def _forward(x, negative_slope, eps, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = x.shape
    slab_bytes = h * w * c * 4
    if not interpret and (not pallas_available() or slab_bytes > VMEM_BUDGET_BYTES):
        return _reference_impl(x, negative_slope, eps)

    kernel = functools.partial(_kernel, negative_slope=negative_slope, eps=eps)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def fused_instance_norm_act(
    x: jax.Array,
    negative_slope: float = 0.0,
    eps: float = 1e-5,
    interpret: bool = False,
) -> jax.Array:
    """InstanceNorm (no affine) + LeakyReLU(negative_slope) on (B, H, W, C).

    negative_slope=0 gives plain ReLU; 1.0 gives identity (norm only).
    Differentiable (custom VJP); Pallas on TPU, jnp fallback elsewhere.
    """
    return _forward(x, negative_slope, eps, interpret)


def _fwd(x, negative_slope, eps, interpret):
    return _forward(x, negative_slope, eps, interpret), x


def _bwd(negative_slope, eps, interpret, x, g):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    centered = x32 - mean
    var = jnp.mean(centered * centered, axis=(1, 2), keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    x_hat = centered * rstd
    g32 = g.astype(jnp.float32)
    # fold the LeakyReLU mask (activation input is x_hat itself)
    g_pre = jnp.where(x_hat >= 0, g32, g32 * negative_slope)
    m1 = jnp.mean(g_pre, axis=(1, 2), keepdims=True)
    m2 = jnp.mean(g_pre * x_hat, axis=(1, 2), keepdims=True)
    dx = rstd * (g_pre - m1 - x_hat * m2)
    return (dx.astype(x.dtype),)


fused_instance_norm_act.defvjp(_fwd, _bwd)
