"""Probability calibration: ECE and temperature scaling.

The calibration metrics for the classification GAN-SSL configs
(BASELINE.json: "calibrated pseudo-label confidence — temperature scaling /
softmax calibration of discriminator logits ... per-epoch accuracy and ECE").
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def expected_calibration_error(
    probs: np.ndarray, labels: np.ndarray, n_bins: int = 15
) -> float:
    """Standard ECE: confidence-binned |accuracy - confidence| weighted mean.

    probs: (N, K) predicted class probabilities; labels: (N,) int.
    """
    probs = np.asarray(probs)
    labels = np.asarray(labels)
    conf = probs.max(axis=1)
    pred = probs.argmax(axis=1)
    correct = (pred == labels).astype(np.float64)
    bins = np.linspace(0.0, 1.0, n_bins + 1)
    ece = 0.0
    n = len(labels)
    for i in range(n_bins):
        lo, hi = bins[i], bins[i + 1]
        mask = (conf > lo) & (conf <= hi) if i else (conf >= lo) & (conf <= hi)
        if mask.any():
            ece += mask.mean() * abs(correct[mask].mean() - conf[mask].mean())
    del n
    return float(ece)


def fit_temperature(
    logits: np.ndarray, labels: np.ndarray, steps: int = 200, lr: float = 0.01
) -> float:
    """Fit a single temperature minimizing NLL on held-out logits
    (Guo et al. 2017).  Optimizes log-T by gradient descent under jit."""
    logits_j = jnp.asarray(logits, jnp.float32)
    labels_j = jnp.asarray(labels, jnp.int32)

    def nll(log_t):
        scaled = logits_j / jnp.exp(log_t)
        logp = jax.nn.log_softmax(scaled, axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, labels_j[:, None], axis=1))

    grad_fn = jax.jit(jax.value_and_grad(nll))
    log_t = jnp.asarray(0.0)
    for _ in range(steps):
        _, g = grad_fn(log_t)
        log_t = log_t - lr * g
    return float(jnp.exp(log_t))


def apply_temperature(logits: np.ndarray, temperature: float) -> np.ndarray:
    """Temperature-scaled softmax probabilities."""
    scaled = jnp.asarray(logits, jnp.float32) / temperature
    return np.asarray(jax.nn.softmax(scaled, axis=-1))
