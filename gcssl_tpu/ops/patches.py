"""Device-side differentiable patch extraction (crop -> square pad -> resize).

The reference does this on the host with PIL, twice per critic step and once
per generator step, forcing a device->host->device round trip in the middle of
every training step (/root/reference/cgan/cgan_train_enhanced.py:37-137) and
killing the adversarial gradient (the PIL crop is non-differentiable).

TPU-native replacement: a single ``jax.image.scale_and_translate`` call per
patch.  The crop rectangle, square padding and bicubic resize compose into one
affine sampling, which XLA lowers to two separable matmuls (MXU-friendly) —
and it is differentiable w.r.t. the *box coordinates*, making the WGAN
adversarial term actually train the generator.

Crop semantics mirror ``CalibratorDataset._letterbox``
(/root/reference/cgan/dataset.py:103-124): clip the box to the image, pad the
crop to a square with gray (128/255), bicubic-resize to ``out_size``.
Differences, by design: continuous (sub-pixel) crop edges instead of PIL's
int() truncation, and zero-weight renormalized edge taps instead of PIL
blending into literal gray pixels at the 1-2 px crop border.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# Gray 128 after ToTensor+Normalize((0.5,)*3, (0.5,)*3): (128/255 - 0.5)/0.5
GRAY_FILL_NORM = (128.0 / 255.0 - 0.5) / 0.5
# Gray 128 in [0, 1] space
GRAY_FILL_UNIT = 128.0 / 255.0


def normalize_patch(x: jax.Array) -> jax.Array:
    """uint8/float [0,255] image -> (-1, 1), matching torchvision
    ToTensor + Normalize([0.5]*3, [0.5]*3) (/root/reference/cgan/dataset.py:50-53)."""
    return (x.astype(jnp.float32) / 255.0 - 0.5) / 0.5


def crop_letterbox(
    image: jax.Array,
    box_cxcywh: jax.Array,
    out_size: int,
    fill: float = GRAY_FILL_NORM,
    method: str = "cubic",
    edge_softness: float = 0.0,
    bounds: jax.Array | None = None,
) -> jax.Array:
    """Crop normalized box from (H, W, C) image, square-pad, resize to out_size.

    Args:
        image: (H, W, C) float image (any value range; ``fill`` must be in the
            same range).
        box_cxcywh: (4,) normalized box.
        out_size: output side length (static).
        fill: padding value (defaults to gray-128 in (-1,1) space).
        edge_softness: width (in *source* pixels) of a sigmoid blend between
            crop content and gray padding at the crop boundary.  0 = hard
            mask (max fidelity to the reference's PIL crop).  > 0 restores a
            nonzero gradient w.r.t. the crop boundary itself — without it,
            the box dimension that does NOT set the square side only moves
            the hard mask edge and gets zero gradient.  Training crops use a
            soft edge so the adversarial signal reaches all four box coords.

    Returns:
        (out_size, out_size, C) patch.  Differentiable w.r.t. both image and
        box coordinates.
    """
    h_img, w_img = image.shape[0], image.shape[1]
    cx, cy, w, h = box_cxcywh[0], box_cxcywh[1], box_cxcywh[2], box_cxcywh[3]
    px, py = cx * w_img, cy * h_img
    pw, ph = w * w_img, h * h_img
    if bounds is None:
        bx1, by1 = 0.0, 0.0
        bx2, by2 = float(w_img), float(h_img)
    else:
        # pixel-space clip rect — e.g. the true image region inside a
        # letterboxed canvas, so gray canvas pads behave like image edges
        bx1, by1, bx2, by2 = bounds[0], bounds[1], bounds[2], bounds[3]
    x1 = jnp.clip(px - pw / 2, bx1, bx2)
    x2 = jnp.clip(px + pw / 2, bx1, bx2)
    y1 = jnp.clip(py - ph / 2, by1, by2)
    y2 = jnp.clip(py + ph / 2, by1, by2)
    cw = x2 - x1
    ch = y2 - y1
    side = jnp.maximum(jnp.maximum(cw, ch), 1e-3)
    # Symmetric square padding around the crop (reference pads with
    # pad//2 on the leading side; continuous coords make it exactly centered).
    sx = x1 - (side - cw) / 2
    sy = y1 - (side - ch) / 2
    scale = out_size / side
    scales = jnp.stack([scale, scale])
    translation = jnp.stack([-sy * scale, -sx * scale])
    shifted = image.astype(jnp.float32) - fill
    out = jax.image.scale_and_translate(
        shifted,
        (out_size, out_size, image.shape[2]),
        (0, 1),
        scales,
        translation,
        method=method,
        antialias=True,
    )
    out = out + fill
    # Gray out everything outside the crop rect: the sampler reads from the
    # *full* image, but the letterbox padding must be gray even where the
    # image extends beyond the crop (reference pads the cropped patch itself).
    centers = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * (side / out_size)
    src_y = sy + centers
    src_x = sx + centers
    if edge_softness > 0.0:
        t = edge_softness
        row_w = jax.nn.sigmoid((src_y - y1) / t) * jax.nn.sigmoid((y2 - src_y) / t)
        col_w = jax.nn.sigmoid((src_x - x1) / t) * jax.nn.sigmoid((x2 - src_x) / t)
        mask = row_w[:, None] * col_w[None, :]
        return out * mask[..., None] + fill * (1.0 - mask[..., None])
    row_in = (src_y >= y1) & (src_y <= y2)
    col_in = (src_x >= x1) & (src_x <= x2)
    mask = row_in[:, None] & col_in[None, :]
    return jnp.where(mask[..., None], out, fill)


@partial(jax.jit, static_argnames=("out_size", "method", "edge_softness"))
def crop_letterbox_batch(
    images: jax.Array,
    boxes_cxcywh: jax.Array,
    out_size: int,
    fill: float | jax.Array = GRAY_FILL_NORM,
    method: str = "cubic",
    edge_softness: float = 0.0,
) -> jax.Array:
    """vmapped ``crop_letterbox``: (B, H, W, C) x (B, 4) -> (B, S, S, C)."""
    fill_arr = jnp.broadcast_to(jnp.asarray(fill, jnp.float32), (images.shape[0],))
    return jax.vmap(
        lambda im, bx, fl: crop_letterbox(im, bx, out_size, fl, method, edge_softness)
    )(images, boxes_cxcywh, fill_arr)


def letterbox_image(
    image: jax.Array,
    out_size: int,
    fill: float = GRAY_FILL_NORM,
    method: str = "cubic",
) -> jax.Array:
    """Pad a full (H, W, C) image to square and resize to (S, S, C).

    Device equivalent of /root/reference/cgan/inference.py:51-57.
    """
    h_img, w_img = image.shape[0], image.shape[1]
    full_box = jnp.asarray([0.5, 0.5, 1.0, 1.0], jnp.float32)
    del h_img, w_img
    return crop_letterbox(image, full_box, out_size, fill, method)
