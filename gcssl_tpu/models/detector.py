"""Single-class anchor-free detector (TPU-native replacement for the
reference's Ultralytics YOLOv8 dependency — /root/reference/train.py:11-22,
kfold_train_and_pseudo.py:94-128, Two-stage pseudo-labeling.py:45-57).

Architecture: compact CSP-flavored backbone (width/depth multipliers like the
reference's 's'/'m' scales) + FPN neck + decoupled FCOS-style head predicting
per-cell class logits and l/t/r/b box distances at strides 8/16/32.

TPU-first choices: NHWC, GroupNorm (no cross-replica batch-stat sync needed
under data parallelism), SiLU, bf16 compute with f32 params, fully static
shapes (each level emits its dense H*W*1 grid; filtering/NMS happen later on
padded fixed-size sets).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

STRIDES = (8, 16, 32)


def _num_groups(features: int, cap: int = 32) -> int:
    """Largest divisor of ``features`` that is <= cap (GroupNorm needs
    groups | channels; non-power-of-two widths like 48 at width_mult 0.75
    are not divisible by a fixed 32)."""
    for g in range(min(cap, features), 0, -1):
        if features % g == 0:
            return g
    return 1


class ConvBlock(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = self.kernel // 2
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            use_bias=False,
            dtype=self.dtype,
        )(x)
        x = nn.GroupNorm(num_groups=_num_groups(self.features), dtype=self.dtype)(x)
        return nn.silu(x)


class Bottleneck(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = ConvBlock(self.features, 3, dtype=self.dtype)(x)
        y = ConvBlock(self.features, 3, dtype=self.dtype)(y)
        return x + y


class Stage(nn.Module):
    """Downsample + n residual bottlenecks (CSP-lite)."""

    features: int
    depth: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ConvBlock(self.features, 3, stride=2, dtype=self.dtype)(x)
        for _ in range(self.depth):
            x = Bottleneck(self.features, dtype=self.dtype)(x)
        return x


class Backbone(nn.Module):
    width: Sequence[int]
    depth: Sequence[int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ConvBlock(self.width[0], 3, stride=2, dtype=self.dtype)(x)  # /2
        x = Stage(self.width[1], self.depth[0], dtype=self.dtype)(x)    # /4
        c3 = Stage(self.width[2], self.depth[1], dtype=self.dtype)(x)   # /8
        c4 = Stage(self.width[3], self.depth[2], dtype=self.dtype)(c3)  # /16
        c5 = Stage(self.width[4], self.depth[3], dtype=self.dtype)(c4)  # /32
        return c3, c4, c5


class FPN(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, c3, c4, c5):
        p5 = ConvBlock(self.features, 1, dtype=self.dtype)(c5)
        up5 = jax.image.resize(
            p5, (p5.shape[0], c4.shape[1], c4.shape[2], p5.shape[3]), "nearest"
        )
        p4 = ConvBlock(self.features, 1, dtype=self.dtype)(c4) + up5
        up4 = jax.image.resize(
            p4, (p4.shape[0], c3.shape[1], c3.shape[2], p4.shape[3]), "nearest"
        )
        p3 = ConvBlock(self.features, 1, dtype=self.dtype)(c3) + up4
        p3 = ConvBlock(self.features, 3, dtype=self.dtype)(p3)
        p4 = ConvBlock(self.features, 3, dtype=self.dtype)(p4)
        p5 = ConvBlock(self.features, 3, dtype=self.dtype)(p5)
        return p3, p4, p5


class Head(nn.Module):
    """Decoupled head: per-cell class logits + ltrb distances (in stride
    units, softplus-positive)."""

    num_classes: int
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats):
        outs = []
        cls_tower = [ConvBlock(self.features, 3, dtype=self.dtype) for _ in range(2)]
        box_tower = [ConvBlock(self.features, 3, dtype=self.dtype) for _ in range(2)]
        cls_conv = nn.Conv(
            self.num_classes, (1, 1),
            bias_init=nn.initializers.constant(-4.59),  # prior p~0.01
            dtype=self.dtype,
        )
        box_conv = nn.Conv(4, (1, 1), dtype=self.dtype)
        for f in feats:
            c = f
            for m in cls_tower:
                c = m(c)
            b = f
            for m in box_tower:
                b = m(b)
            cls_logits = cls_conv(c).astype(jnp.float32)
            ltrb = jax.nn.softplus(box_conv(b).astype(jnp.float32))
            outs.append((cls_logits, ltrb))
        return outs


class Detector(nn.Module):
    """Full detector.  __call__ returns per-level (cls_logits, ltrb)."""

    num_classes: int = 1
    width_mult: float = 0.5
    depth_mult: float = 0.33
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        def w(c):
            return max(16, int(round(c * self.width_mult / 8)) * 8)

        def d(n):
            return max(1, round(n * self.depth_mult))

        self.backbone = Backbone(
            width=(w(64), w(128), w(256), w(512), w(1024)),
            depth=(d(3), d(6), d(6), d(3)),
            dtype=self.dtype,
        )
        self.neck = FPN(features=w(256), dtype=self.dtype)
        self.head = Head(
            num_classes=self.num_classes, features=w(256), dtype=self.dtype
        )

    def __call__(self, images):
        """images: (B, S, S, 3) float in [0, 1] -> list of 3 level outputs."""
        c3, c4, c5 = self.backbone(images)
        feats = self.neck(c3, c4, c5)
        return self.head(feats)


def decode_level(
    cls_logits: jax.Array, ltrb: jax.Array, stride: int, img_size: int
) -> tuple[jax.Array, jax.Array]:
    """Dense decode of one level -> (scores (B, HW, C), boxes (B, HW, 4) cxcywh
    normalized to [0, 1])."""
    b, h, w, c = cls_logits.shape
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) * stride
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) * stride
    cy, cx = jnp.meshgrid(ys, xs, indexing="ij")
    d = ltrb * stride  # distances in pixels
    x1 = cx[None] - d[..., 0]
    y1 = cy[None] - d[..., 1]
    x2 = cx[None] + d[..., 2]
    y2 = cy[None] + d[..., 3]
    boxes = jnp.stack(
        [(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1
    ) / img_size
    scores = jax.nn.sigmoid(cls_logits)
    return scores.reshape(b, h * w, c), boxes.reshape(b, h * w, 4)


def decode_all(outs, img_size: int):
    """Concatenate all levels -> (scores (B, N, C), boxes (B, N, 4))."""
    scores, boxes = [], []
    for (cls_logits, ltrb), stride in zip(outs, STRIDES):
        s, bx = decode_level(cls_logits, ltrb, stride, img_size)
        scores.append(s)
        boxes.append(bx)
    return jnp.concatenate(scores, axis=1), jnp.concatenate(boxes, axis=1)


def flat_logits(outs):
    """Concatenate raw per-level class logits -> (B, N, C)."""
    return jnp.concatenate(
        [c.reshape(c.shape[0], -1, c.shape[-1]) for c, _ in outs], axis=1
    )


def anchor_grid(img_size: int):
    """All-level cell centers -> (anchors (N, 2) normalized xy,
    strides (N,) float px)."""
    pts, sts = [], []
    for stride in STRIDES:
        h = w = img_size // stride
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) * stride / img_size
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) * stride / img_size
        cy, cx = jnp.meshgrid(ys, xs, indexing="ij")
        pts.append(jnp.stack([cx.reshape(-1), cy.reshape(-1)], axis=-1))
        sts.append(jnp.full((h * w,), float(stride), jnp.float32))
    return jnp.concatenate(pts, axis=0), jnp.concatenate(sts, axis=0)
