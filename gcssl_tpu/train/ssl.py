"""Classification GAN-SSL training (K+1 discriminator + feature matching).

The classification instantiation of GAN-calibrated SSL (BASELINE.json):
one fused jitted step performs

    D update: supervised CE on labeled (K+1 logits), unsupervised
              real-vs-fake terms on unlabeled and generated batches
    G update: feature matching ||E f(x_u) - E f(G(z))||^2

followed (outside the loop) by temperature-scaled calibration of the
classifier head for pseudo-labeling (eval/calibration.py).

TPU-first: labeled + unlabeled + latent batches processed in one compiled
step with HBM-resident data; data-parallel via the calibrator trainer's
recipe (train/wgan_gp.py): params + resident arrays replicated over the
mesh 'data' axis, per-step batch *indices* sharded on it — XLA partitions
the gathered batch and inserts the gradient psum over ICI.  The epoch loop
carries best/last checkpoints (core/checkpoint.py), crash resume, optional
early stop on val accuracy, and warmup+cosine LR — none of which the
reference's classification-SSL analogue has (SURVEY.md §5).
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

    def _augment(rng, x):
        """Device-side pad-4 random crop (+ optional hflip): the standard
        small-image recipe (WRN/CIFAR), fused into the compiled step so the
        resident arrays stay pristine in HBM."""
        if cfg.aug == "none":
            return x
        r_flip, r_oy, r_ox = jax.random.split(rng, 3)
        bsz, s, _, c = x.shape
        if cfg.aug == "crop_flip":
            flip = jax.random.bernoulli(r_flip, 0.5, (bsz,))
            x = jnp.where(flip[:, None, None, None], x[:, :, ::-1, :], x)
        pad = 4
        xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        oy = jax.random.randint(r_oy, (bsz,), 0, 2 * pad + 1)
        ox = jax.random.randint(r_ox, (bsz,), 0, 2 * pad + 1)

        def crop(img, oy_i, ox_i):
            return jax.lax.dynamic_slice(img, (oy_i, ox_i, 0), (s, s, c))

        return jax.vmap(crop)(xp, oy, ox)

    def _step_body(state: SSLTrainState, x_lab, y_lab, x_unlab, lr):
        rng, z1_rng, z2_rng, d1_rng, d2_rng, d3_rng, d4_rng, a1_rng, a2_rng = \
            jax.random.split(state.rng, 9)
        x_lab = _augment(a1_rng, x_lab)
        x_unlab = _augment(a2_rng, x_unlab)
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
    save_dir=None,
    resume: bool = False,
    mesh=None,
    dp: int = 0,
):
    """Epoch loop; returns (state, models, history).  Accuracy/ECE computed
    per epoch when a validation split is given.

    ``dp``: data-parallel width (0 = single device).  Params + resident
    arrays are replicated over a 1-D 'data' mesh and per-step batch indices
    sharded on it — identical math to dp=0, gradient psum over ICI.
    ``save_dir``: enables best (val_acc) + periodic 'last' checkpoints
    (core/checkpoint.py); ``resume=True`` restores 'last' and continues.
    ``cfg.patience`` > 0 adds early stop on val accuracy."""
    from gcssl_tpu.eval.calibration import expected_calibration_error

    state, g_model, d_model, tx = create_ssl_state(cfg, jax.random.PRNGKey(cfg.seed))
    step_fn = make_ssl_train_step(cfg, g_model, d_model, tx, resident=True)
    classify = make_classify_fn(cfg, d_model)

    repl = dsh = None
    if dp and dp > 1:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        if mesh is None:
            devs = jax.devices()
            if len(devs) < dp:
                raise ValueError(f"dp={dp} needs {dp} devices, have {len(devs)}")
            mesh = Mesh(np.asarray(devs[:dp]), ("data",))
        if cfg.batch_size % dp:
            raise ValueError(
                f"batch_size {cfg.batch_size} not divisible by dp={dp}")
        repl = NamedSharding(mesh, P())
        dsh = NamedSharding(mesh, P("data"))
        state = jax.tree.map(lambda x: jax.device_put(x, repl), state)

    rng = np.random.default_rng(cfg.seed)
    nl, nu = len(x_lab), len(x_unlab)
    bs = cfg.batch_size
    # one-time upload; every step gathers its batches by index on device
    _put = (lambda x: jax.device_put(x, repl)) if repl is not None else jnp.asarray
    x_lab_dev = _put(jnp.asarray(x_lab))
    y_lab_dev = _put(jnp.asarray(y_lab, jnp.int32))
    x_unlab_dev = _put(jnp.asarray(x_unlab))
    _idx = (lambda a: jax.device_put(jnp.asarray(a, jnp.int32), dsh)) \
        if dsh is not None else (lambda a: jnp.asarray(a, jnp.int32))
    steps_per_epoch = max(1, nu // bs)
    n_epochs = max_epochs or cfg.epochs

    def lr_at(epoch: int) -> float:
        if cfg.lr_schedule != "cosine":
            return cfg.lr
        if cfg.warmup_epochs and epoch <= cfg.warmup_epochs:
            return cfg.lr * epoch / cfg.warmup_epochs
        t = (epoch - cfg.warmup_epochs) / max(1, n_epochs - cfg.warmup_epochs)
        return cfg.lr * 0.5 * (1.0 + float(np.cos(np.pi * min(t, 1.0))))

    ckpt = None
    history: list[dict] = []
    best_acc, bad_epochs, start_epoch = -1.0, 0, 1
    if save_dir is not None:
        from pathlib import Path

        from gcssl_tpu.core.checkpoint import CheckpointManager

        ckpt = CheckpointManager(Path(save_dir))
        if resume and ckpt.exists("last"):
            state = ckpt.restore("last", jax.device_get(state))
            if repl is not None:
                state = jax.tree.map(lambda x: jax.device_put(x, repl), state)
            meta = ckpt.metadata("last")
            start_epoch = int(meta.get("epoch", 0)) + 1
            bad_epochs = int(meta.get("bad_epochs", 0))
            if ckpt.exists("best"):
                best_acc = float(ckpt.metadata("best").get("val_acc", -1.0))
            hist_path = Path(save_dir) / "history.json"
            if hist_path.exists():
                import json as _json

                history = _json.loads(hist_path.read_text())

    # advance the host batch-index stream to the resume point so a resumed
    # run sees the same index sequence an uninterrupted one would
    for _ in range((start_epoch - 1) * steps_per_epoch):
        rng.integers(0, nl, bs)
        rng.integers(0, nu, bs)

    for epoch in range(start_epoch, n_epochs + 1):
        accum = []
        lr = lr_at(epoch)
        for _ in range(steps_per_epoch):
            li = _idx(rng.integers(0, nl, bs))
            ui = _idx(rng.integers(0, nu, bs))
            state, metrics = step_fn(
                state, x_lab_dev, y_lab_dev, x_unlab_dev, li, ui,
                jnp.float32(lr),
            )
            accum.append(metrics)
        fetched = jax.device_get(accum)
        rec = {"epoch": epoch, "lr": lr}
        rec.update(
            {k: float(np.mean([m[k] for m in fetched])) for k in fetched[0]}
        )
        if x_val is not None:
            d_eval = state.d_params
            if repl is not None:
                d_eval = jax.device_get(d_eval)
            logits = np.concatenate(
                [
                    np.asarray(classify(d_eval, jnp.asarray(x_val[i : i + 256])))
                    for i in range(0, len(x_val), 256)
                ]
            )
            pred = logits.argmax(axis=1)
            probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
            rec["val_acc"] = float((pred == y_val).mean())
            rec["val_ece"] = expected_calibration_error(probs, y_val)
            if rec["val_acc"] > best_acc:
                best_acc, bad_epochs = rec["val_acc"], 0
                if ckpt:
                    ckpt.save("best", jax.device_get(state),
                              {"epoch": epoch, "val_acc": rec["val_acc"],
                               "val_ece": rec["val_ece"]})
            else:
                bad_epochs += 1
        history.append(rec)
        if log_fn:
            log_fn(rec)
        if ckpt and (epoch % max(1, cfg.ckpt_every_epochs) == 0
                     or epoch == n_epochs):
            import json as _json
            from pathlib import Path

            ckpt.save("last", jax.device_get(state),
                      {"epoch": epoch, "bad_epochs": bad_epochs})
            (Path(save_dir) / "history.json").write_text(
                _json.dumps(history))
        if cfg.patience and x_val is not None and bad_epochs >= cfg.patience:
            break
    if ckpt and history:
        import json as _json
        from pathlib import Path

        ckpt.save("last", jax.device_get(state),
                  {"epoch": history[-1]["epoch"], "bad_epochs": bad_epochs})
        (Path(save_dir) / "history.json").write_text(_json.dumps(history))
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
