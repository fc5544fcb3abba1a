"""Tests for the device-side differentiable crop-letterbox.

Numerical-equivalence tests against a PIL oracle reproducing the reference's
host-side letterbox (/root/reference/cgan/dataset.py:103-124), plus
differentiability checks (the whole point of the rebuild).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gcssl_tpu.ops import crop_letterbox, crop_letterbox_batch, normalize_patch
from gcssl_tpu.ops.patches import GRAY_FILL_UNIT


def pil_letterbox_oracle(img_u8, box_cxcywh, out_size):
    """Reference-equivalent crop->square-pad->bicubic-resize via PIL."""
    PIL = pytest.importorskip("PIL")
    from PIL import Image, ImageOps

    img = Image.fromarray(img_u8)
    W, H = img.size
    cx, cy, w, h = box_cxcywh
    px, py, pw, ph = cx * W, cy * H, w * W, h * H
    x1 = max(0, px - pw / 2)
    y1 = max(0, py - ph / 2)
    x2 = min(W, px + pw / 2)
    y2 = min(H, py + ph / 2)
    crop = img.crop((int(x1), int(y1), int(x2), int(y2)))
    pad_w = max(crop.height - crop.width, 0)
    pad_h = max(crop.width - crop.height, 0)
    padding = (pad_w // 2, pad_h // 2, pad_w - pad_w // 2, pad_h - pad_h // 2)
    sq = ImageOps.expand(crop, padding, fill=(128, 128, 128))
    return np.asarray(sq.resize((out_size, out_size), Image.BICUBIC), np.float32)


def make_test_image(h=240, w=320, seed=0):
    rng = np.random.default_rng(seed)
    # smooth-ish image so sub-pixel crop differences stay small
    base = rng.uniform(0, 255, (h // 8, w // 8, 3))
    img = np.kron(base, np.ones((8, 8, 1)))
    return img.astype(np.uint8)


class TestCropLetterbox:
    def test_matches_pil_oracle(self):
        img = make_test_image()
        box = [0.5, 0.5, 0.4, 0.25]
        want = pil_letterbox_oracle(img, box, 128) / 255.0
        got = np.asarray(
            crop_letterbox(
                jnp.asarray(img, jnp.float32) / 255.0,
                jnp.asarray(box),
                128,
                fill=GRAY_FILL_UNIT,
            )
        )
        # sub-pixel edges + PIL int truncation -> allow small mean error
        assert np.abs(got - want).mean() < 0.03
        assert got.shape == (128, 128, 3)

    def test_padding_is_gray(self):
        # A very wide box -> top/bottom bands must be gray fill.
        img = np.full((200, 400, 3), 255, np.uint8)
        got = np.asarray(
            crop_letterbox(
                jnp.asarray(img, jnp.float32) / 255.0,
                jnp.asarray([0.5, 0.5, 0.8, 0.1]),
                128,
                fill=GRAY_FILL_UNIT,
            )
        )
        # box is 320x20 px -> square side 320 -> image occupies middle 8 rows
        np.testing.assert_allclose(got[:40], GRAY_FILL_UNIT, atol=1e-3)
        np.testing.assert_allclose(got[-40:], GRAY_FILL_UNIT, atol=1e-3)
        np.testing.assert_allclose(got[64], 1.0, atol=1e-3)

    def test_box_clipping_at_image_edge(self):
        img = make_test_image()
        box = [0.02, 0.5, 0.2, 0.2]  # extends past left edge -> clipped
        want = pil_letterbox_oracle(img, box, 128) / 255.0
        got = np.asarray(
            crop_letterbox(
                jnp.asarray(img, jnp.float32) / 255.0,
                jnp.asarray(box),
                128,
                fill=GRAY_FILL_UNIT,
            )
        )
        assert np.abs(got - want).mean() < 0.06

    def test_batch_version(self):
        img = jnp.asarray(make_test_image(), jnp.float32) / 255.0
        imgs = jnp.stack([img, img])
        boxes = jnp.asarray([[0.5, 0.5, 0.3, 0.3], [0.3, 0.4, 0.2, 0.25]])
        out = crop_letterbox_batch(imgs, boxes, 128, fill=GRAY_FILL_UNIT)
        assert out.shape == (2, 128, 128, 3)
        single = crop_letterbox(img, boxes[1], 128, fill=GRAY_FILL_UNIT)
        np.testing.assert_allclose(np.asarray(out[1]), np.asarray(single), atol=1e-5)

    def test_differentiable_wrt_box(self):
        """The rebuild's key property: gradient flows into box coords."""
        img = jnp.asarray(make_test_image(), jnp.float32) / 255.0

        def loss(box):
            patch = crop_letterbox(img, box, 64, fill=GRAY_FILL_UNIT)
            return jnp.mean(patch**2)

        g = jax.grad(loss)(jnp.asarray([0.5, 0.5, 0.3, 0.3]))
        g = np.asarray(g)
        assert np.isfinite(g).all()
        assert np.abs(g).max() > 0.0

    def test_soft_edge_restores_short_side_gradient(self):
        # Width-dominated crop: with a hard mask d/dh is exactly 0 (only the
        # mask boundary moves); edge_softness > 0 must give a nonzero dh.
        img = jnp.asarray(make_test_image(480, 640, seed=4), jnp.float32) / 255.0
        box = jnp.asarray([0.5, 0.5, 0.2, 0.2])  # pw=128 > ph=96 px

        def loss(b, soft):
            p = crop_letterbox(img, b, 64, fill=GRAY_FILL_UNIT, edge_softness=soft)
            return jnp.mean(p**2)

        g_hard = np.asarray(jax.grad(loss)(box, 0.0))
        g_soft = np.asarray(jax.grad(loss)(box, 1.0))
        assert g_hard[3] == 0.0
        assert abs(g_soft[3]) > 0.0
        assert np.isfinite(g_soft).all()

    def test_soft_edge_close_to_hard(self):
        img = jnp.asarray(make_test_image(), jnp.float32) / 255.0
        box = jnp.asarray([0.5, 0.5, 0.4, 0.25])
        hard = np.asarray(crop_letterbox(img, box, 128, fill=GRAY_FILL_UNIT))
        soft = np.asarray(
            crop_letterbox(img, box, 128, fill=GRAY_FILL_UNIT, edge_softness=1.0)
        )
        assert np.abs(hard - soft).mean() < 0.02

    def test_normalize_patch(self):
        x = jnp.asarray([[0, 128, 255]], jnp.uint8)
        got = np.asarray(normalize_patch(x))
        np.testing.assert_allclose(
            got, [[-1.0, (128 / 255 - 0.5) / 0.5, 1.0]], atol=1e-6
        )
