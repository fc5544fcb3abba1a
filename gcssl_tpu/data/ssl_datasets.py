"""Datasets for the classification GAN-SSL configs.

Zero-egress environment: torchvision downloads are unavailable, so loaders
accept (a) pre-exported ``.npz`` files (keys: x_train, y_train, x_test,
y_test — uint8 HWC images), or (b) a procedurally generated synthetic set
with class-dependent structure (for tests/CI and smoke runs).  The SSL split
helper mirrors the standard protocol: N labeled per run (class-balanced),
rest unlabeled.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

import numpy as np


@dataclass
class SSLSplits:
    x_lab: np.ndarray    # (Nl, S, S, C) float32 in (-1, 1)
    y_lab: np.ndarray    # (Nl,) int32
    x_unlab: np.ndarray  # (Nu, S, S, C)
    x_val: np.ndarray
    y_val: np.ndarray
    x_test: np.ndarray
    y_test: np.ndarray


def normalize_images(x_u8: np.ndarray) -> np.ndarray:
    """uint8 HWC -> float32 (-1, 1)."""
    return (x_u8.astype(np.float32) / 255.0 - 0.5) / 0.5


def synthetic_classification_set(
    num_classes: int = 10,
    img_size: int = 32,
    channels: int = 3,
    n_train: int = 2000,
    n_test: int = 500,
    seed: int = 0,
    hard: bool = True,
    mix_max: float = 0.45,
    noise_lo: float = 0.5,
    noise_hi: float = 1.1,
    label_noise: float = 0.05,
):
    """Structured synthetic images: each class is a distinct frequency/phase
    pattern — learnable by a small convnet, cheap to generate.

    ``hard`` (default) layers in the factors that keep a benchmark
    informative (round 2's easy variant saturated at acc 1.0, measuring
    nothing): per-sample nuisance (phase/frequency jitter, spatial shift,
    amplitude), class overlap (each sample is a convex mix with a random
    *other* class's pattern, mix weight < 0.5 so the true class stays
    Bayes-identifiable), a class-independent distractor pattern, strong
    per-sample noise, per-sample contrast normalization (a global normalize
    leaks class identity through batch statistics), and ``label_noise``
    flipped train labels (test labels stay clean).  ``hard=False`` keeps
    the legacy easy set for fast unit tests."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:img_size, 0:img_size] / img_size

    def pattern(cls, n, phase_jit=0.0, freq_jit=0.0):
        # class -> unique (freq_x, freq_y, phase) triple; injective well past
        # 100 classes (CIFAR-100 config) unlike the round-1 5x4 grid
        freq = 1 + cls % 5 + freq_jit
        freq_y = 1 + (cls // 5) % 4 + freq_jit
        phase = (cls // 20) * 2 * np.pi / 7 + cls * 0.05 + phase_jit
        return np.sin(2 * np.pi * freq * xx[None] + phase[..., None, None]) * np.cos(
            2 * np.pi * freq_y * yy[None] + 0.5 * phase[..., None, None]
        )

    def render_easy(cls, n):
        base = pattern(cls, n, np.zeros(n), 0.0)
        imgs = base[..., None] + 0.4 * rng.normal(
            0, 1, (n, img_size, img_size, channels)
        )
        imgs = (imgs - imgs.min()) / (imgs.max() - imgs.min() + 1e-9)
        return (imgs * 255).astype(np.uint8)

    def render_hard(cls, n):
        # nuisance: per-sample phase/frequency jitter
        base = pattern(cls, n,
                       rng.uniform(-0.6, 0.6, n), rng.uniform(-0.25, 0.25))
        # class overlap: convex mix with a random other class's pattern
        other = (cls + rng.integers(1, num_classes, n)) % num_classes
        alpha = rng.uniform(0.0, mix_max, n)[:, None, None]
        mixed = np.empty_like(base)
        for o in np.unique(other):
            m = other == o
            mixed[m] = pattern(int(o), int(m.sum()),
                               rng.uniform(-0.6, 0.6, int(m.sum())), 0.0)
        base = (1 - alpha) * base + alpha * mixed
        # nuisance: amplitude + spatial shift (pattern phase-rolls cleanly)
        base *= rng.uniform(0.55, 1.0, n)[:, None, None]
        for i in range(n):  # np.roll has no batched shift; n is small
            base[i] = np.roll(base[i], tuple(rng.integers(0, img_size, 2)),
                              axis=(0, 1))
        # class-independent distractor at a frequency outside the class grid
        dfreq = rng.uniform(6.0, 9.0, n)[:, None, None]
        dphase = rng.uniform(0, 2 * np.pi, n)[:, None, None]
        base = base + 0.5 * np.sin(2 * np.pi * dfreq * xx[None] + dphase)
        imgs = base[..., None] + rng.uniform(noise_lo, noise_hi, n)[
            :, None, None, None
        ] * rng.normal(0, 1, (n, img_size, img_size, channels))
        # per-sample contrast normalization
        lo = imgs.min(axis=(1, 2, 3), keepdims=True)
        hi = imgs.max(axis=(1, 2, 3), keepdims=True)
        imgs = (imgs - lo) / (hi - lo + 1e-9)
        return (imgs * 255).astype(np.uint8)

    render = render_hard if hard else render_easy
    per_train = n_train // num_classes
    per_test = n_test // num_classes
    x_train = np.concatenate([render(c, per_train) for c in range(num_classes)])
    y_train = np.repeat(np.arange(num_classes), per_train).astype(np.int32)
    x_test = np.concatenate([render(c, per_test) for c in range(num_classes)])
    y_test = np.repeat(np.arange(num_classes), per_test).astype(np.int32)
    if hard:
        # draws consumed even at label_noise=0 so the same seed yields the
        # same images/permutation regardless of the noise setting
        flip = rng.random(len(y_train)) < label_noise
        alt = (y_train + rng.integers(1, num_classes, len(y_train))) % num_classes
        y_train = np.where(flip, alt, y_train).astype(np.int32)
    perm = rng.permutation(len(x_train))
    return x_train[perm], y_train[perm], x_test, y_test


def load_npz_dataset(path: str | Path):
    """Load a pre-exported dataset: x_train/y_train/x_test/y_test uint8 HWC."""
    z = np.load(path)
    return z["x_train"], z["y_train"], z["x_test"], z["y_test"]


def make_ssl_splits(
    x_train: np.ndarray,
    y_train: np.ndarray,
    x_test: np.ndarray,
    y_test: np.ndarray,
    num_labeled: int,
    num_classes: int,
    val_fraction: float = 0.1,
    seed: int = 42,
) -> SSLSplits:
    """Class-balanced labeled subset; remainder is the unlabeled pool; a
    slice of the labeled pool doubles as the calibration/validation split."""
    rng = np.random.default_rng(seed)
    per_class = num_labeled // num_classes
    lab_idx = []
    for c in range(num_classes):
        cls_idx = np.where(y_train == c)[0]
        lab_idx.append(rng.choice(cls_idx, per_class, replace=False))
    lab_idx = np.concatenate(lab_idx)
    rng.shuffle(lab_idx)
    unlab_mask = np.ones(len(x_train), bool)
    unlab_mask[lab_idx] = False

    n_val = max(num_classes, int(val_fraction * len(lab_idx)))
    val_idx, lab_idx = lab_idx[:n_val], lab_idx[n_val:]

    if x_train.ndim == 3:
        x_train = x_train[..., None]
        x_test = x_test[..., None]
    norm = normalize_images
    return SSLSplits(
        x_lab=norm(x_train[lab_idx]),
        y_lab=y_train[lab_idx].astype(np.int32),
        x_unlab=norm(x_train[unlab_mask]),
        x_val=norm(x_train[val_idx]),
        y_val=y_train[val_idx].astype(np.int32),
        x_test=norm(x_test),
        y_test=y_test.astype(np.int32),
    )
