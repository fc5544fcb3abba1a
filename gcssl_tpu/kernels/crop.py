"""Fused uint8-canvas crop + letterbox + bicubic resize + normalize (Pallas).

The calibrator's fused train step crops five 128x128 patch batches per step
out of the letterboxed uint8 canvases (pred, gt, and three refined crops —
train/wgan_gp.py).  Four of the five are *forward-only* (data inputs or under
``stop_gradient``), so they need no VJP — only the generator-step refined
crop keeps the differentiable pure-JAX path (`ops/patches.crop_letterbox`).

The pure-JAX path pays for generality: ``normalize_patch`` materializes each
448x448x3 canvas as f32 (2.4 MB of HBM write+read per sample vs 0.6 MB for
the raw uint8), and `jax.image.scale_and_translate` runs two f32 (HIGHEST
precision) dense matmuls against it.  This kernel fuses the whole producer:
the uint8 canvas block is DMA'd to VMEM once, converted in-register, both
separable resampling passes run on the MXU in bf16 (the u8-128 shift keeps
canvas values integer-exact in bf16), and the gray letterbox mask + (-1, 1)
normalization are applied before the single 128x128x3 output write.

Numerics: weights replicate `jax._src.image.scale.compute_weight_mat`
(Keys cubic, antialias) exactly in f32; only the two matmuls run in bf16
(inputs exact, weights ~3 decimal digits), so patches differ from the
pure-JAX path by <~1e-2 in (-1, 1) space — below the reference's own PIL
quantization (1/127.5 per 8-bit step).

Layout: canvases arrive channel-major (B, 3, C, C) so every in-kernel slice
is a well-tiled 2D (C, C) plane (a trailing dim of 3 would waste 42x lane
padding); output is (B, 3, S, S), transposed back to NHWC by the wrapper.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from gcssl_tpu.kernels.instance_norm import pallas_available
from gcssl_tpu.ops.patches import GRAY_FILL_NORM

_EPS_GUARD = 1000.0 * float(np.finfo(np.float32).eps)


def _weight_mat(origin, side, out_size: int, in_size: int, transposed: bool):
    """Keys-cubic antialias resampling weights + per-output source centers.

    Exact port of jax._src.image.scale.compute_weight_mat for
    scale = out/side, translation = -origin * scale (the crop transform of
    ops/patches.crop_letterbox), built from broadcasted iotas so it lowers
    inside a Pallas kernel.  ``transposed=False`` emits (out, in) with
    centers (out, 1); ``transposed=True`` emits (in, out) with centers
    (1, out) — built directly in that orientation because Mosaic cannot
    legalize an in-kernel transpose.
    """
    inv_scale = side / out_size
    kernel_scale = jnp.maximum(inv_scale, 1.0)
    shape = (in_size, out_size) if transposed else (out_size, in_size)
    out_dim, in_dim = (1, 0) if transposed else (0, 1)
    # TPU iota must be integer; widen to f32 after
    o = jax.lax.broadcasted_iota(jnp.int32, shape, out_dim).astype(jnp.float32)
    i = jax.lax.broadcasted_iota(jnp.int32, shape, in_dim).astype(jnp.float32)
    sample_f = (o + 0.5) * inv_scale + origin - 0.5
    x = jnp.abs(sample_f - i) / kernel_scale
    w = ((1.5 * x - 2.5) * x) * x + 1.0
    w = jnp.where(x >= 1.0, ((-0.5 * x + 2.5) * x - 4.0) * x + 2.0, w)
    w = jnp.where(x >= 2.0, 0.0, w)
    tot = jnp.sum(w, axis=in_dim, keepdims=True)
    w = jnp.where(
        jnp.abs(tot) > _EPS_GUARD, w / jnp.where(tot != 0.0, tot, 1.0), 0.0
    )
    valid = (sample_f >= -0.5) & (sample_f <= in_size - 0.5)
    w = jnp.where(valid, w, 0.0)
    # source-pixel centers of each output position: sample_f + 0.5
    # (constant along the input axis; keep one input row/column)
    centers = (sample_f[:1, :] if transposed else sample_f[:, :1]) + 0.5
    return w, centers


def _crop_kernel(p_ref, cv_ref, o_ref, *, out_size: int, in_size: int,
                 softness: float, fill: float):
    from jax.experimental import pallas as pl

    i = pl.program_id(0)
    sx = p_ref[i, 0]
    sy = p_ref[i, 1]
    side = p_ref[i, 2]
    x1 = p_ref[i, 3]
    x2 = p_ref[i, 4]
    y1 = p_ref[i, 5]
    y2 = p_ref[i, 6]

    # wy: (S, C) out-major; wxT: (C, S) in-major; src_y (S, 1), src_x (1, S)
    wy, src_y = _weight_mat(sy, side, out_size, in_size, transposed=False)
    wxT, src_x = _weight_mat(sx, side, out_size, in_size, transposed=True)

    if softness > 0.0:
        t = softness
        row_w = jax.nn.sigmoid((src_y - y1) / t) * jax.nn.sigmoid((y2 - src_y) / t)
        col_w = jax.nn.sigmoid((src_x - x1) / t) * jax.nn.sigmoid((x2 - src_x) / t)
        mask = row_w * col_w  # (S, 1) * (1, S) -> (S, S)
    else:
        row_in = (src_y >= y1) & (src_y <= y2)
        col_in = (src_x >= x1) & (src_x <= x2)
        mask = (row_in & col_in).astype(jnp.float32)

    wy16 = wy.astype(jnp.bfloat16)
    wx16 = wxT.astype(jnp.bfloat16)
    for ch in range(3):
        # u8 - 128 is integer in [-128, 127]: exact in bf16.  (Mosaic has no
        # direct u8->f32 cast; widen through int32 first.)
        plane = cv_ref[0, ch].astype(jnp.int32).astype(jnp.float32)
        plane = (plane - 128.0).astype(jnp.bfloat16)
        t1 = jax.lax.dot_general(
            wy16, plane, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (S out_y, C in_x)
        t2 = jax.lax.dot_general(
            t1.astype(jnp.bfloat16), wx16, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (S out_y, S out_x)
        patch = t2 * (1.0 / 127.5) + fill  # == sample(normalize(u8) - fill) + fill
        o_ref[0, ch] = patch * mask + fill * (1.0 - mask)


@functools.partial(
    jax.jit,
    static_argnames=("out_size", "softness", "fill", "interpret"),
)
def _crop_batch_cm(params, canvases_cm, out_size, softness, fill, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, _, c, _ = canvases_cm.shape
    kernel = functools.partial(
        _crop_kernel, out_size=out_size, in_size=c,
        softness=softness, fill=fill,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, 3, out_size, out_size), jnp.float32),
        grid=(b,),
        in_specs=[
            # whole (B, 7) scalar table in SMEM; kernel indexes by program_id
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3, c, c), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 3, out_size, out_size), lambda i: (i, 0, 0, 0)),
        interpret=interpret,
    )(params, canvases_cm)


def crop_params(canvas_side: int, canvas_wh, boxes):
    """Per-sample (B, 7) crop scalars [sx, sy, side, x1, x2, y1, y2].

    Mirrors the coordinate math of train/wgan_gp._canvas_crop +
    ops/patches.crop_letterbox: original-frame normalized cxcywh boxes are
    mapped into the letterboxed canvas, clipped against the true image
    region, and squared up (canvas-pixel units).
    """
    W = canvas_wh[..., 0]
    H = canvas_wh[..., 1]
    side_img = jnp.maximum(W, H)
    pad_x = (side_img - W) / 2
    pad_y = (side_img - H) / 2
    k = canvas_side / side_img
    # box in canvas pixels
    px = (boxes[..., 0] * W + pad_x) * k
    py = (boxes[..., 1] * H + pad_y) * k
    pw = boxes[..., 2] * W * k
    ph = boxes[..., 3] * H * k
    bx1, by1 = pad_x * k, pad_y * k
    bx2, by2 = (pad_x + W) * k, (pad_y + H) * k
    x1 = jnp.clip(px - pw / 2, bx1, bx2)
    x2 = jnp.clip(px + pw / 2, bx1, bx2)
    y1 = jnp.clip(py - ph / 2, by1, by2)
    y2 = jnp.clip(py + ph / 2, by1, by2)
    cw = x2 - x1
    ch = y2 - y1
    side = jnp.maximum(jnp.maximum(cw, ch), 1e-3)
    sx = x1 - (side - cw) / 2
    sy = y1 - (side - ch) / 2
    return jnp.stack([sx, sy, side, x1, x2, y1, y2], axis=-1)


def fused_canvas_crop(
    canvases,      # (B, C, C, 3) uint8 NHWC
    canvas_wh,     # (B, 2) original (W, H)
    boxes,         # (B, 4) original-frame normalized cxcywh
    out_size: int,
    edge_softness: float = 0.0,
    fill: float = GRAY_FILL_NORM,
    interpret: bool = False,
) -> jax.Array:
    """Forward-only fused twin of train/wgan_gp._canvas_crop.

    Returns (B, S, S, 3) f32 patches in (-1, 1).  NOT differentiable w.r.t.
    ``boxes`` — callers must be forward-only paths (data crops or
    stop-gradient'd critic inputs).
    """
    params = crop_params(canvases.shape[1], canvas_wh, boxes)
    cv_cm = jnp.transpose(canvases, (0, 3, 1, 2))
    out = _crop_batch_cm(
        params, cv_cm, out_size, float(edge_softness), float(fill), interpret
    )
    return jnp.transpose(out, (0, 2, 3, 1))


def fast_crop_available() -> bool:
    return pallas_available()
