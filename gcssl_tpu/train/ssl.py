"""Classification GAN-SSL training (K+1 discriminator + feature matching).

The classification instantiation of GAN-calibrated SSL (BASELINE.json):
one fused jitted step performs

    D update: supervised CE on labeled (K+1 logits), unsupervised
              real-vs-fake terms on unlabeled and generated batches
    G update: feature matching ||E f(x_u) - E f(G(z))||^2

followed (outside the loop) by temperature-scaled calibration of the
classifier head for pseudo-labeling (eval/calibration.py).

TPU-first: labeled + unlabeled + latent batches processed in one compiled
step; data-parallel via the same replicated-params/sharded-batch recipe as
the calibrator trainer.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from gcssl_tpu.core.config import SSLClassifierConfig
from gcssl_tpu.models.ssl_gan import (
    DCGANGenerator,
    KPlusOneDiscriminator,
    WideResNetDiscriminator,
    real_class_logsumexp,
)


class SSLTrainState(struct.PyTreeNode):
    g_params: Any
    d_params: Any
    g_opt: Any
    d_opt: Any
    rng: jax.Array
    step: jax.Array


def create_ssl_state(cfg: SSLClassifierConfig, rng: jax.Array):
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    channels = 1 if cfg.dataset in ("mnist", "digits") else 3
    g_model = DCGANGenerator(
        img_size=cfg.img_size, channels=channels, base=cfg.g_base, dtype=dtype
    )
    if cfg.d_arch == "wrn":
        d_model = WideResNetDiscriminator(
            num_classes=cfg.num_classes, widen_factor=cfg.d_widen_factor,
            dtype=dtype,
        )
    else:
        d_model = KPlusOneDiscriminator(
            num_classes=cfg.num_classes, base=cfg.d_base, dtype=dtype
        )
    tx = optax.chain(
        optax.clip_by_global_norm(5.0),
        optax.scale_by_adam(b1=cfg.beta1, b2=cfg.beta2),
    )

    # one jitted init program (eager flax init is minutes through the
    # tunneled TPU path — see wgan_gp.create_train_state)
    @jax.jit
    def _init(rng):
        rng, gr, dr = jax.random.split(rng, 3)
        z = jnp.zeros((1, cfg.latent_dim), jnp.float32)
        x = jnp.zeros((1, cfg.img_size, cfg.img_size, channels), jnp.float32)
        g_params = g_model.init({"params": gr}, z)["params"]
        d_params = d_model.init({"params": dr, "dropout": dr}, x)["params"]
        return SSLTrainState(
            g_params=g_params,
            d_params=d_params,
            g_opt=tx.init(g_params),
            d_opt=tx.init(d_params),
            rng=rng,
            step=jnp.asarray(0, jnp.int32),
        )

    return _init(rng), g_model, d_model, tx


def make_ssl_train_step(cfg: SSLClassifierConfig, g_model, d_model, tx,
                        resident: bool = False):
    """One fused G+D step.

    ``resident=False``: step(state, x_lab, y_lab, x_unlab, lr) on host-fed
    batches.  ``resident=True``: step(state, x_lab_all, y_lab_all,
    x_unlab_all, li, ui, lr) gathers batches by index from HBM-resident
    arrays inside the compiled step — steady-state training then has zero
    host->device traffic (decisive on remote-attached TPUs)."""

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step_resident(state, x_lab_all, y_lab_all, x_unlab_all, li, ui, lr):
        return _step_body(
            state, x_lab_all[li], y_lab_all[li], x_unlab_all[ui], lr
        )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: SSLTrainState, x_lab, y_lab, x_unlab, lr):
        return _step_body(state, x_lab, y_lab, x_unlab, lr)

    def _step_body(state: SSLTrainState, x_lab, y_lab, x_unlab, lr):
        rng, z1_rng, z2_rng, d1_rng, d2_rng, d3_rng, d4_rng = jax.random.split(
            state.rng, 7
        )
        b = x_unlab.shape[0]
        z_d = jax.random.normal(z1_rng, (b, cfg.latent_dim))
        z_g = jax.random.normal(z2_rng, (b, cfg.latent_dim))

        # ---- D update ----
        fake_d = jax.lax.stop_gradient(g_model.apply({"params": state.g_params}, z_d))

        def d_loss_fn(d_params):
            lab_logits, _ = d_model.apply(
                {"params": d_params}, x_lab, train=True, rngs={"dropout": d1_rng}
            )
            unlab_logits, _ = d_model.apply(
                {"params": d_params}, x_unlab, train=True, rngs={"dropout": d2_rng}
            )
            fake_logits, _ = d_model.apply(
                {"params": d_params}, fake_d, train=True, rngs={"dropout": d3_rng}
            )
            # supervised CE over the K+1 softmax
            logp = jax.nn.log_softmax(lab_logits, axis=-1)
            l_sup = -jnp.mean(jnp.take_along_axis(logp, y_lab[:, None], axis=1))
            # unlabeled: real-ness = logsumexp(K) vs full logsumexp
            lse_real_u = real_class_logsumexp(unlab_logits)
            lse_all_u = jax.nn.logsumexp(unlab_logits, axis=-1)
            l_unlab = -jnp.mean(lse_real_u - lse_all_u)
            # generated: fake class (index K)
            logp_f = jax.nn.log_softmax(fake_logits, axis=-1)
            l_fake = -jnp.mean(logp_f[:, -1])
            return l_sup + 0.5 * (l_unlab + l_fake), (l_sup, l_unlab, l_fake)

        (d_loss, (l_sup, l_unlab, l_fake)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True
        )(state.d_params)
        d_updates, d_opt = tx.update(d_grads, state.d_opt, state.d_params)
        d_params = optax.apply_updates(
            state.d_params, jax.tree.map(lambda u: -lr * u, d_updates)
        )

        # ---- G update: feature matching ----
        _, feat_real = d_model.apply(
            {"params": d_params}, x_unlab, train=True, rngs={"dropout": d4_rng}
        )
        feat_real_mean = jax.lax.stop_gradient(jnp.mean(feat_real, axis=0))

        def g_loss_fn(g_params):
            fake = g_model.apply({"params": g_params}, z_g)
            _, feat_fake = d_model.apply(
                {"params": d_params}, fake, train=True, rngs={"dropout": d4_rng}
            )
            fm = jnp.mean((jnp.mean(feat_fake, axis=0) - feat_real_mean) ** 2)
            return cfg.feature_matching_weight * fm

        g_loss, g_grads = jax.value_and_grad(g_loss_fn)(state.g_params)
        g_updates, g_opt = tx.update(g_grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(
            state.g_params, jax.tree.map(lambda u: -lr * u, g_updates)
        )

        new_state = state.replace(
            g_params=g_params, d_params=d_params,
            g_opt=g_opt, d_opt=d_opt, rng=rng, step=state.step + 1,
        )
        return new_state, {
            "loss_D": d_loss, "loss_G": g_loss,
            "loss_sup": l_sup, "loss_unlab": l_unlab, "loss_fake": l_fake,
        }

    return step_resident if resident else step


def make_classify_fn(cfg: SSLClassifierConfig, d_model):
    """Classifier over the K real classes (fake logit dropped), returning
    logits for calibration."""

    @jax.jit
    def classify(d_params, x):
        logits, _ = d_model.apply({"params": d_params}, x, train=False)
        return logits[:, : cfg.num_classes]

    return classify


def train_ssl_classifier(
    cfg: SSLClassifierConfig,
    x_lab: np.ndarray,   # (Nl, S, S, C) float in (-1, 1)
    y_lab: np.ndarray,   # (Nl,)
    x_unlab: np.ndarray, # (Nu, S, S, C)
    x_val: np.ndarray | None = None,
    y_val: np.ndarray | None = None,
    log_fn=None,
    max_epochs: int | None = None,
):
    """Epoch loop; returns (state, models, history).  Accuracy/ECE computed
    per epoch when a validation split is given."""
    from gcssl_tpu.eval.calibration import expected_calibration_error

    state, g_model, d_model, tx = create_ssl_state(cfg, jax.random.PRNGKey(cfg.seed))
    step_fn = make_ssl_train_step(cfg, g_model, d_model, tx, resident=True)
    classify = make_classify_fn(cfg, d_model)

    rng = np.random.default_rng(cfg.seed)
    nl, nu = len(x_lab), len(x_unlab)
    bs = cfg.batch_size
    # one-time upload; every step gathers its batches by index on device
    x_lab_dev = jnp.asarray(x_lab)
    y_lab_dev = jnp.asarray(y_lab, jnp.int32)
    x_unlab_dev = jnp.asarray(x_unlab)
    steps_per_epoch = max(1, nu // bs)
    history = []
    for epoch in range(1, (max_epochs or cfg.epochs) + 1):
        accum = []
        for _ in range(steps_per_epoch):
            li = jnp.asarray(rng.integers(0, nl, bs), jnp.int32)
            ui = jnp.asarray(rng.integers(0, nu, bs), jnp.int32)
            state, metrics = step_fn(
                state, x_lab_dev, y_lab_dev, x_unlab_dev, li, ui,
                jnp.float32(cfg.lr),
            )
            accum.append(metrics)
        fetched = jax.device_get(accum)
        rec = {"epoch": epoch}
        rec.update(
            {k: float(np.mean([m[k] for m in fetched])) for k in fetched[0]}
        )
        if x_val is not None:
            logits = np.concatenate(
                [
                    np.asarray(classify(state.d_params, jnp.asarray(x_val[i : i + 256])))
                    for i in range(0, len(x_val), 256)
                ]
            )
            pred = logits.argmax(axis=1)
            probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
            rec["val_acc"] = float((pred == y_val).mean())
            rec["val_ece"] = expected_calibration_error(probs, y_val)
        history.append(rec)
        if log_fn:
            log_fn(rec)
    return state, (g_model, d_model), history


def pseudo_label_unlabeled(
    cfg: SSLClassifierConfig,
    d_model,
    d_params,
    x_unlab: np.ndarray,
    x_val: np.ndarray,
    y_val: np.ndarray,
    conf_thr: float = 0.95,
):
    """Calibrated pseudo-labeling: fit temperature on val logits, threshold
    calibrated confidence on the unlabeled pool.  Returns (indices, labels,
    confidences, temperature)."""
    from gcssl_tpu.eval.calibration import apply_temperature, fit_temperature

    classify = make_classify_fn(cfg, d_model)
    val_logits = np.concatenate(
        [
            np.asarray(classify(d_params, jnp.asarray(x_val[i : i + 256])))
            for i in range(0, len(x_val), 256)
        ]
    )
    temp = fit_temperature(val_logits, y_val) if cfg.temperature_scaling else 1.0
    logits = np.concatenate(
        [
            np.asarray(classify(d_params, jnp.asarray(x_unlab[i : i + 256])))
            for i in range(0, len(x_unlab), 256)
        ]
    )
    probs = apply_temperature(logits, temp)
    conf = probs.max(axis=1)
    keep = conf >= conf_thr
    return np.where(keep)[0], probs.argmax(axis=1)[keep], conf[keep], temp
