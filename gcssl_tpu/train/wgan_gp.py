"""Fused WGAN-GP calibrator training: one jitted step does it all.

The reference step (/root/reference/cgan/cgan_train_enhanced.py:288-374)
crosses the host boundary 3x per step to re-crop refined patches with PIL
(its dominant cost, SURVEY.md §3.4) and its adversarial term consequently
carries no gradient into G.  Here the whole thing —

    n_critic x [ D(pred, gt) vs D(pred, refined-crop(G(pred))),
                 gradient penalty via jax.grad through D ]
    + 1 x     [ EIoU regression + adversarial term through a
                differentiable on-device refined crop ]

— is ONE compiled XLA program.  Batches are gathered on device from the
HBM-resident dataset (see data/calibrator.py), so steady-state training has
no host->device traffic at all.  Data parallelism: params replicated, batch
sharded over the mesh 'data' axis; XLA inserts the psum gradient all-reduce
over ICI.

Faithfulness switches (config):
* ``adversarial_gradient=False`` stop-gradients the refined crop,
  reproducing the reference's EIoU-only G training exactly.
* ``crop_edge_softness=0`` makes training crops hard-edged like PIL.
"""

from __future__ import annotations

import functools
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import FrozenDict

from gcssl_tpu.core.config import CalibratorConfig
from gcssl_tpu.models import PatchCritic, build_generator
from gcssl_tpu.ops.boxes import (
    delta_apply,
    eiou_loss,
    iou_elementwise,
    smooth_clamp,
)
from gcssl_tpu.ops.patches import GRAY_FILL_NORM, crop_letterbox, normalize_patch


class CalibratorTrainState(struct.PyTreeNode):
    g_params: Any
    d_params: Any
    d_stats: Any          # spectral-norm power-iteration vectors
    g_opt: Any
    d_opt: Any
    rng: jax.Array
    step: jax.Array
    g_ema: Any = None     # EMA of g_params (cfg.train.g_ema_decay > 0)


def eval_g_params(cfg: CalibratorConfig, state: CalibratorTrainState):
    """G parameters to use for validation/inference (EMA when enabled)."""
    if cfg.train.g_ema_decay > 0 and state.g_ema is not None:
        return state.g_ema
    return state.g_params


class DeviceData(struct.PyTreeNode):
    """HBM-resident dataset (uint8 patches/canvases + f32 targets).

    In ``device_patches`` mode the pred/gt patch arrays are (N, 1, 1, 3)
    placeholders and patches are cropped on device from the canvases inside
    the step (10x less host->device traffic)."""

    pred_patch: jax.Array  # (N, S, S, 3) u8 (or (N, 1, 1, 3) placeholder)
    gt_patch: jax.Array    # (N, S, S, 3) u8 (or placeholder)
    delta: jax.Array       # (N, 4)
    pred_box: jax.Array    # (N, 4)
    gt_box: jax.Array      # (N, 4)
    canvas_idx: jax.Array  # (N,) i32
    canvases: jax.Array    # (M, C, C, 3) u8
    canvas_wh: jax.Array   # (M, 2)

    @classmethod
    def from_arrays(cls, arrays, indices=None, device_patches: bool = False) -> "DeviceData":
        sl = slice(None) if indices is None else indices
        if device_patches:
            n = len(arrays.delta[sl])
            pred_patch = jnp.zeros((n, 1, 1, 3), jnp.uint8)
            gt_patch = jnp.zeros((n, 1, 1, 3), jnp.uint8)
        else:
            pred_patch = jnp.asarray(arrays.pred_patch[sl])
            gt_patch = jnp.asarray(arrays.gt_patch[sl])
        return cls(
            pred_patch=pred_patch,
            gt_patch=gt_patch,
            delta=jnp.asarray(arrays.delta[sl]),
            pred_box=jnp.asarray(arrays.pred_box[sl]),
            gt_box=jnp.asarray(arrays.gt_box[sl]),
            canvas_idx=jnp.asarray(arrays.canvas_idx[sl]),
            canvases=jnp.asarray(arrays.canvases),
            canvas_wh=jnp.asarray(arrays.canvas_wh),
        )


def _make_optimizer(clip_norm: float, b1: float, b2: float):
    """clip-by-global-norm -> Adam direction; LR applied in-step (so the
    host-side plateau scheduler can change it without recompiling)."""
    return optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.scale_by_adam(b1=b1, b2=b2),
    )


def create_train_state(
    cfg: CalibratorConfig, rng: jax.Array
) -> tuple[CalibratorTrainState, Any, Any]:
    """Initialize G, D, and both optimizers. Returns (state, g_model, d_model)."""
    dtype = jnp.bfloat16 if cfg.train.compute_dtype == "bfloat16" else jnp.float32
    g_model = build_generator(cfg.model.generator_type, cfg.model.delta_scale, dtype)
    if getattr(cfg.model, "discriminator_type", "patch") == "vit":
        from gcssl_tpu.models.vit_gan import CriticViT

        d_model = CriticViT(dtype=dtype)
    else:
        d_model = PatchCritic(spectral_norm=cfg.model.spectral_norm, dtype=dtype)

    s = cfg.data.img_size
    tx = _make_optimizer(cfg.train.grad_clip_norm, cfg.train.beta1, cfg.train.beta2)

    # one jitted (and persistently-cacheable) program for the whole init:
    # eager flax init dispatches hundreds of individual ops, which costs
    # ~2 min through the tunneled TPU path (measured round 3) vs ~10 s for
    # a single compiled program
    @jax.jit
    def _init(rng):
        rng, g_rng, d_rng = jax.random.split(rng, 3)
        dummy = jnp.zeros((1, s, s, 3), jnp.float32)
        g_vars = g_model.init(g_rng, dummy)
        d_vars = d_model.init(d_rng, dummy, dummy)
        g_params = g_vars["params"]
        d_params = d_vars["params"]
        d_stats = d_vars.get("batch_stats", FrozenDict({}))
        return CalibratorTrainState(
            g_params=g_params,
            d_params=d_params,
            d_stats=d_stats,
            g_opt=tx.init(g_params),
            d_opt=tx.init(d_params),
            rng=rng,
            step=jnp.asarray(0, jnp.int32),
            g_ema=jax.tree.map(lambda p: p + 0.0, g_params),
        )

    return _init(rng), g_model, d_model


def _canvas_crop(
    canvases: jax.Array,   # (B, C, C, 3) u8
    canvas_wh: jax.Array,  # (B, 2)
    boxes: jax.Array,      # (B, 4) original-frame normalized cxcywh
    img_size: int,
    edge_softness: float = 0.0,
) -> jax.Array:
    """Crop-letterbox normalized original-frame boxes out of letterboxed
    canvases, clipping against the true image region (gray canvas pads act
    like image edges, matching the reference's crop of the raw image)."""
    W = canvas_wh[..., 0]
    H = canvas_wh[..., 1]
    side = jnp.maximum(W, H)
    pad_x = (side - W) / 2
    pad_y = (side - H) / 2
    c = canvases.shape[1]
    box_c = jnp.stack(
        [
            (boxes[..., 0] * W + pad_x) / side,
            (boxes[..., 1] * H + pad_y) / side,
            boxes[..., 2] * W / side,
            boxes[..., 3] * H / side,
        ],
        axis=-1,
    )
    k = c / side
    bounds = jnp.stack(
        [pad_x * k, pad_y * k, (pad_x + W) * k, (pad_y + H) * k], axis=-1
    )

    def crop_one(canvas, box, bnd):
        return crop_letterbox(
            normalize_patch(canvas), box, img_size,
            fill=GRAY_FILL_NORM, edge_softness=edge_softness, bounds=bnd,
        )

    return jax.vmap(crop_one)(canvases, box_c, bounds)


def _refined_patches(
    canvases: jax.Array,      # (B, C, C, 3) u8 gathered
    canvas_wh: jax.Array,     # (B, 2) original (W, H)
    pred_box: jax.Array,      # (B, 4) original-frame normalized
    deltas: jax.Array,        # (B, 4)
    pred_patch: jax.Array,    # (B, S, S, 3) normalized floats (fallback)
    img_size: int,
    edge_softness: float,
    smooth: bool,
    fast: bool = False,
) -> jax.Array:
    """Differentiable twin of ``get_refined_patch_batch``
    (/root/reference/cgan/cgan_train_enhanced.py:37-137).

    Applies deltas, clamps the refined box (cx,cy in [0.1,0.9], w,h in
    [0.05,0.8] — :81-84), crops from the letterboxed canvas with the true
    image region as clip bounds, and falls back to the pred patch when the
    crop would be degenerate (<10 px a side — :92-100).
    """
    refined = delta_apply(pred_box, deltas, training=smooth)
    if smooth:
        cx = smooth_clamp(refined[..., 0], 0.1, 0.9)
        cy = smooth_clamp(refined[..., 1], 0.1, 0.9)
        w = smooth_clamp(refined[..., 2], 0.05, 0.8)
        h = smooth_clamp(refined[..., 3], 0.05, 0.8)
    else:
        cx = jnp.clip(refined[..., 0], 0.1, 0.9)
        cy = jnp.clip(refined[..., 1], 0.1, 0.9)
        w = jnp.clip(refined[..., 2], 0.05, 0.8)
        h = jnp.clip(refined[..., 3], 0.05, 0.8)

    W = canvas_wh[..., 0]
    H = canvas_wh[..., 1]
    # validity in original pixels (clipped rect at least 10 px a side)
    x1 = jnp.maximum(0.0, (cx - w / 2) * W)
    x2 = jnp.minimum(W, (cx + w / 2) * W)
    y1 = jnp.maximum(0.0, (cy - h / 2) * H)
    y2 = jnp.minimum(H, (cy + h / 2) * H)
    valid = (x2 - x1 >= 10.0) & (y2 - y1 >= 10.0)

    boxes = jnp.stack([cx, cy, w, h], axis=-1)
    if fast:
        # forward-only Pallas producer (callers must be under stop_gradient)
        from gcssl_tpu.kernels.crop import fused_canvas_crop

        patches = fused_canvas_crop(
            canvases, canvas_wh, boxes, img_size, edge_softness
        )
    else:
        patches = _canvas_crop(canvases, canvas_wh, boxes, img_size, edge_softness)
    return jnp.where(valid[:, None, None, None], patches, pred_patch)


def make_train_step(cfg: CalibratorConfig, g_model, d_model):
    """Build the single fused jitted G+D train step.

    Signature: step(state, data: DeviceData, idx (B,), weights (B,), lr) ->
    (state, metrics).  ``idx`` selects the batch from the resident dataset;
    ``weights`` masks padded samples in the final partial batch.
    """
    tcfg = cfg.train
    img_size = cfg.data.img_size
    tx = _make_optimizer(tcfg.grad_clip_norm, tcfg.beta1, tcfg.beta2)

    def wmean(x, w):
        # masked mean over batch (+ any score-map dims)
        extra = x.ndim - 1
        wb = w.reshape(w.shape + (1,) * extra)
        denom = jnp.maximum(jnp.sum(w), 1e-6) * np.prod(x.shape[1:]) if extra else jnp.maximum(jnp.sum(w), 1e-6)
        return jnp.sum(x * wb) / denom

    def d_apply(params, stats, a, b, update_stats=False):
        variables = {"params": params, "batch_stats": stats}
        if update_stats:
            out, mut = d_model.apply(
                variables, a, b, update_stats=True, mutable=["batch_stats"]
            )
            return out, mut["batch_stats"]
        return d_model.apply(variables, a, b), stats

    def gen_apply(params, x, rng, train: bool):
        if train:
            return g_model.apply(
                {"params": params}, x, deterministic=False, rngs={"dropout": rng}
            )
        return g_model.apply({"params": params}, x)

    device_patches = cfg.data.device_patches
    fast_crop = bool(getattr(tcfg, "fast_crop", False))
    if fast_crop:
        from gcssl_tpu.kernels.crop import fast_crop_available, fused_canvas_crop

        fast_crop = fast_crop_available()

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: CalibratorTrainState, data: DeviceData, idx, weights, lr):
        delta_true = data.delta[idx]
        pred_box = data.pred_box[idx]
        ci = data.canvas_idx[idx]
        canvases = data.canvases[ci]
        canvas_wh = data.canvas_wh[ci]
        if device_patches and fast_crop:
            # forward-only producers: pred/gt crops depend on data only
            pred_patch = fused_canvas_crop(canvases, canvas_wh, pred_box, img_size)
            gt_patch = fused_canvas_crop(
                canvases, canvas_wh, data.gt_box[idx], img_size
            )
        elif device_patches:
            pred_patch = _canvas_crop(canvases, canvas_wh, pred_box, img_size)
            gt_patch = _canvas_crop(canvases, canvas_wh, data.gt_box[idx], img_size)
        else:
            pred_patch = normalize_patch(data.pred_patch[idx])
            gt_patch = normalize_patch(data.gt_patch[idx])

        rng = state.rng
        d_params, d_stats, d_opt = state.d_params, state.d_stats, state.d_opt
        metrics = {
            "loss_D": 0.0, "loss_gp": 0.0, "wasserstein_distance": 0.0,
        }

        # ---- critic updates (n_critic, unrolled at trace time) ----
        for _ in range(tcfg.n_critic):
            rng, drop_rng, alpha_rng, flip_rng = jax.random.split(rng, 4)
            # fake inputs: G in train mode (dropout active), detached
            delta_fake = jax.lax.stop_gradient(
                gen_apply(state.g_params, pred_patch, drop_rng, train=True)
            )
            refined = jax.lax.stop_gradient(
                _refined_patches(
                    canvases, canvas_wh, pred_box, delta_fake, pred_patch,
                    img_size, tcfg.crop_edge_softness,
                    smooth=tcfg.adversarial_gradient,
                    fast=fast_crop,
                )
            )
            if tcfg.critic_flip_aug:
                # joint hflip of the whole (pred, gt, refined) triple per
                # sample: the critic sees geometry-consistent pairs but
                # can't memorize absolute pixel layouts
                fl = jax.random.bernoulli(flip_rng, 0.5, (pred_patch.shape[0],))
                fl = fl[:, None, None, None]
                d_pred = jnp.where(fl, jnp.flip(pred_patch, axis=2), pred_patch)
                d_gt = jnp.where(fl, jnp.flip(gt_patch, axis=2), gt_patch)
                d_ref = jnp.where(fl, jnp.flip(refined, axis=2), refined)
            else:
                d_pred, d_gt, d_ref = pred_patch, gt_patch, refined
            alpha = jax.random.uniform(alpha_rng, (pred_patch.shape[0], 1, 1, 1))

            def d_loss_fn(params, stats):
                real, stats = d_apply(params, stats, d_pred, d_gt, update_stats=True)
                fake, stats = d_apply(params, stats, d_pred, d_ref, update_stats=True)
                wd = wmean(real, weights) - wmean(fake, weights)

                # gradient penalty (losses.py:185-232): joint grad norm over
                # both interpolated inputs, target 1
                ip = alpha * d_pred + (1 - alpha) * d_pred
                io = alpha * d_gt + (1 - alpha) * d_ref
                ip = jax.lax.stop_gradient(ip)
                io = jax.lax.stop_gradient(io)

                def critic_sum(p_in, o_in):
                    out, _ = d_apply(params, stats, p_in, o_in)
                    return jnp.sum(out)

                gp_p, gp_o = jax.grad(critic_sum, argnums=(0, 1))(ip, io)
                gn = jnp.sqrt(
                    jnp.sum(gp_p.reshape(gp_p.shape[0], -1) ** 2, axis=1)
                    + jnp.sum(gp_o.reshape(gp_o.shape[0], -1) ** 2, axis=1)
                    + 1e-12
                )
                gp = wmean((gn - 1.0) ** 2, weights)
                loss = -wd + tcfg.lambda_gp * gp
                return loss, (wd, gp, stats)

            (d_loss, (wd, gp, d_stats)), d_grads = jax.value_and_grad(
                d_loss_fn, has_aux=True
            )(d_params, d_stats)
            updates, d_opt = tx.update(d_grads, d_opt, d_params)
            d_params = optax.apply_updates(
                d_params, jax.tree.map(lambda u: -lr * u, updates)
            )
            metrics["loss_D"] += d_loss / tcfg.n_critic
            metrics["loss_gp"] += gp / tcfg.n_critic
            metrics["wasserstein_distance"] += wd / tcfg.n_critic

        # ---- generator update ----
        rng, g_drop_rng = jax.random.split(rng)

        def g_loss_fn(g_params):
            delta_pred = gen_apply(g_params, pred_patch, g_drop_rng, train=True)
            calibrated = delta_apply(pred_box, delta_pred, training=True)
            gt_boxes = delta_apply(pred_box, delta_true, training=True)
            g_w = weights
            if tcfg.iou_reweight > 0:
                # more gradient to pairs with more correction headroom
                iou0 = iou_elementwise(pred_box, gt_boxes)
                fac = 1.0 + tcfg.iou_reweight * (1.0 - iou0)
                fac = fac / jnp.maximum(wmean(fac, weights), 1e-6)
                g_w = weights * jax.lax.stop_gradient(fac)
            loss_iou = tcfg.lambda_iou * eiou_loss(calibrated, gt_boxes, g_w)

            refined = _refined_patches(
                canvases, canvas_wh, pred_box, delta_pred, pred_patch,
                img_size, tcfg.crop_edge_softness,
                smooth=tcfg.adversarial_gradient,
            )
            if not tcfg.adversarial_gradient:
                # reference-faithful: host PIL crop carried no gradient
                refined = jax.lax.stop_gradient(refined)
            fake, _ = d_apply(d_params, d_stats, pred_patch, refined)
            loss_wgan = -wmean(fake, weights)
            adv_w = 1.0 if not tcfg.adversarial_gradient else tcfg.lambda_adv
            return loss_iou + adv_w * loss_wgan, (loss_iou, loss_wgan)

        (g_loss, (loss_iou, loss_wgan)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(state.g_params)
        g_updates, g_opt = tx.update(g_grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(
            state.g_params, jax.tree.map(lambda u: -lr * u, g_updates)
        )

        if tcfg.g_ema_decay > 0:
            d_ema = tcfg.g_ema_decay
            # decay warmup so early EMA isn't dominated by the random init
            d_eff = jnp.minimum(d_ema, (1.0 + state.step) / (10.0 + state.step))
            g_ema = jax.tree.map(
                lambda e, p: e * d_eff + p * (1 - d_eff), state.g_ema, g_params
            )
        else:
            g_ema = state.g_ema

        metrics.update(loss_G=g_loss, loss_iou=loss_iou, loss_wgan=loss_wgan)
        new_state = state.replace(
            g_params=g_params,
            d_params=d_params,
            d_stats=d_stats,
            g_opt=g_opt,
            d_opt=d_opt,
            rng=rng,
            step=state.step + 1,
            g_ema=g_ema,
        )
        return new_state, metrics

    return step


def make_eval_step(cfg: CalibratorConfig, g_model):
    """Validation: IoU before/after calibration vs reconstructed GT boxes
    (cgan_train_enhanced.py:394-420 — note the reference compares against
    ``apply_delta(pred_box, delta_true, training=False)``, not the raw GT)."""

    device_patches = cfg.data.device_patches

    @jax.jit
    def eval_step(g_params, data: DeviceData, idx, weights):
        pred_box = data.pred_box[idx]
        if device_patches:
            ci = data.canvas_idx[idx]
            pred_patch = _canvas_crop(
                data.canvases[ci], data.canvas_wh[ci], pred_box, cfg.data.img_size
            )
        else:
            pred_patch = normalize_patch(data.pred_patch[idx])
        delta_true = data.delta[idx]
        delta_pred = g_model.apply({"params": g_params}, pred_patch)
        calibrated = delta_apply(pred_box, delta_pred, training=False)
        gt_boxes = delta_apply(pred_box, delta_true, training=False)
        iou_before = iou_elementwise(pred_box, gt_boxes)
        iou_after = iou_elementwise(calibrated, gt_boxes)
        return (
            jnp.sum(iou_before * weights),
            jnp.sum(iou_after * weights),
            jnp.sum(weights),
        )

    return eval_step


def make_sample_fn(cfg: CalibratorConfig, g_model):
    """(pred, refined, gt) patch triplets for sample grids
    (cgan_train_enhanced.py:377-392)."""

    @jax.jit
    def sample(g_params, data: DeviceData, idx):
        pred_box = data.pred_box[idx]
        ci = data.canvas_idx[idx]
        if cfg.data.device_patches:
            pred_patch = _canvas_crop(
                data.canvases[ci], data.canvas_wh[ci], pred_box, cfg.data.img_size
            )
            gt_patch = _canvas_crop(
                data.canvases[ci], data.canvas_wh[ci], data.gt_box[idx],
                cfg.data.img_size,
            )
        else:
            pred_patch = normalize_patch(data.pred_patch[idx])
            gt_patch = normalize_patch(data.gt_patch[idx])
        deltas = g_model.apply({"params": g_params}, pred_patch)
        refined = _refined_patches(
            data.canvases[ci], data.canvas_wh[ci], pred_box, deltas,
            pred_patch, cfg.data.img_size, 0.0, smooth=False,
        )
        return pred_patch, refined, gt_patch

    return sample


def _batch_indices(n: int, batch_size: int, rng: np.random.Generator | None):
    """Static-shape batches: shuffled (or sequential) indices padded to a
    multiple of batch_size, with 0/1 weights for the padding tail."""
    order = rng.permutation(n) if rng is not None else np.arange(n)
    n_batches = max(1, -(-n // batch_size))
    padded = np.resize(order, n_batches * batch_size)  # wraps; weights mask the wrap
    weights = np.zeros(n_batches * batch_size, np.float32)
    weights[:n] = 1.0
    for b in range(n_batches):
        sl = slice(b * batch_size, (b + 1) * batch_size)
        yield padded[sl].astype(np.int32), weights[sl]


def train_calibrator(
    cfg: CalibratorConfig,
    arrays,
    *,
    mesh=None,
    log_fn=None,
    max_epochs: int | None = None,
    resume: bool = False,
    release_path=None,
    release_min_s: float = 900.0,
):
    """Full training loop: epochs, validation delta-IoU, plateau LR, early
    stop, best checkpointing, history JSON — the reference's main() contract
    (cgan_train_enhanced.py:139-551) minus W&B, plus resumability
    (``resume=True`` restores the full train state from save_dir/'last').

    ``release_path``: when set, the generator's eval params are exported as
    a git-trackable release file (core/release.py) whenever val ΔIoU
    improves, at most every ``release_min_s`` seconds — full train states
    are gitignored and do not survive workspace resets.

    Returns (final_state, history: list[dict]).
    """
    import json
    from pathlib import Path

    from gcssl_tpu.core.checkpoint import CheckpointManager
    from gcssl_tpu.core.mesh import data_sharding, make_mesh, replicated_sharding
    from gcssl_tpu.data.calibrator import train_val_split
    from gcssl_tpu.train.schedule import ReduceLROnPlateau

    from gcssl_tpu.obs.samples import save_sample_grid

    tcfg = cfg.train
    rng = jax.random.PRNGKey(tcfg.seed)
    state, g_model, d_model = create_train_state(cfg, rng)
    step_fn = make_train_step(cfg, g_model, d_model)
    eval_fn = make_eval_step(cfg, g_model)
    sample_fn = make_sample_fn(cfg, g_model)

    mesh = mesh or make_mesh(cfg.mesh)
    repl = replicated_sharding(mesh)
    dsh = data_sharding(mesh)

    n = len(arrays)
    train_idx, val_idx = train_val_split(n, cfg.data.val_split, tcfg.seed)
    data = DeviceData.from_arrays(arrays, device_patches=cfg.data.device_patches)
    data = jax.tree.map(lambda x: jax.device_put(x, repl), data)
    state = jax.tree.map(lambda x: jax.device_put(x, repl), state)

    sched_g = ReduceLROnPlateau(
        initial_lr=tcfg.lr, factor=tcfg.plateau_factor,
        patience=tcfg.plateau_patience,
    )
    wandb_run = None
    if tcfg.wandb:
        from dataclasses import asdict

        from gcssl_tpu.obs.wandb_export import WandbExporter

        wandb_run = WandbExporter(
            tcfg.save_dir, project="gcssl-tpu-calibrator", config=asdict(cfg)
        )
    tb_watch = None
    if tcfg.watch_every_epochs:
        from gcssl_tpu.obs.tensorboard import TBWriter

        tb_watch = TBWriter(Path(tcfg.save_dir) / "tb")
    bad_epochs = 0
    ckpt = CheckpointManager(Path(tcfg.save_dir))
    np_rng = np.random.default_rng(tcfg.seed)

    history: list[dict] = []
    best_delta_iou = -1.0
    last_release = time.monotonic()
    start_epoch = 1
    # resume an interrupted run (the reference cannot — SURVEY.md §5)
    if resume and ckpt.exists("last"):
        state = jax.tree.map(
            lambda x: jax.device_put(x, repl),
            ckpt.restore("last", jax.device_get(state)),
        )
        meta = ckpt.metadata("last")
        start_epoch = int(meta.get("epoch", 0)) + 1
        # restore host-side scheduler state (LR plateau + early-stop counter)
        if "lr" in meta:
            sched_g.lr = float(meta["lr"])
            sched_g.best = float(meta.get("sched_best", float("-inf")))
            sched_g.num_bad_epochs = int(meta.get("sched_bad_epochs", 0))
            bad_epochs = int(meta.get("bad_epochs", 0))
        best_delta_iou = float(ckpt.metadata("best").get("delta_iou", -1.0)) if ckpt.exists("best") else -1.0
        hist_path = Path(tcfg.save_dir) / "training_history.json"
        if hist_path.exists():
            history = json.loads(hist_path.read_text())

    n_epochs = max_epochs or tcfg.n_epochs
    for epoch in range(start_epoch, n_epochs + 1):
        # keep metrics on device during the epoch: converting per-step would
        # force a host sync every step and stall the dispatch pipeline
        metric_accum = []
        for idx, w in _batch_indices(len(train_idx), tcfg.batch_size, np_rng):
            bidx = jax.device_put(jnp.asarray(train_idx[idx]), dsh)
            bw = jax.device_put(jnp.asarray(w), dsh)
            state, metrics = step_fn(state, data, bidx, bw, jnp.float32(sched_g.lr))
            metric_accum.append(metrics)
        fetched = jax.device_get(metric_accum)
        n_steps = max(1, len(fetched))
        stats = {
            k: float(sum(m[k] for m in fetched)) / n_steps
            for k in ("loss_G", "loss_D", "loss_iou", "loss_wgan", "loss_gp",
                      "wasserstein_distance")
        }

        # validation: accumulate per-batch sums on device, fetch ONCE per
        # epoch (a float() per batch would host-sync every dispatch — slow
        # through a thin host<->device link)
        val_accum = []
        g_eval = eval_g_params(cfg, state)
        for idx, w in _batch_indices(len(val_idx), tcfg.batch_size, None):
            bidx = jax.device_put(jnp.asarray(val_idx[idx]), dsh)
            bw = jax.device_put(jnp.asarray(w), dsh)
            val_accum.append(eval_fn(g_eval, data, bidx, bw))
        vals = jax.device_get(val_accum)
        sb = float(sum(v[0] for v in vals))
        sa = float(sum(v[1] for v in vals))
        sw = float(sum(v[2] for v in vals))
        mean_iou_before = sb / max(1.0, sw)
        mean_iou_after = sa / max(1.0, sw)
        delta_iou = mean_iou_after - mean_iou_before

        # sample grids (reference: first batch of every 10th epoch, :377)
        if tcfg.sample_every_epochs and (epoch - 1) % tcfg.sample_every_epochs == 0:
            sidx = (
                jax.device_put(jnp.asarray(train_idx[:4].astype(np.int32)), repl)
                if len(train_idx) >= 4 else None
            )
            if sidx is not None:
                p, r, g = jax.device_get(sample_fn(g_eval, data, sidx))
                save_sample_grid(
                    Path(tcfg.save_dir) / "samples" / f"epoch_{epoch}.png", p, r, g
                )

        if tb_watch is not None and epoch % tcfg.watch_every_epochs == 0:
            tb_watch.watch(jax.device_get(state.g_params), epoch, "G")
            tb_watch.watch(jax.device_get(state.d_params), epoch, "D")

        sched_g.step(delta_iou)
        record = {
            "epoch": epoch,
            "delta_iou": delta_iou,
            "mean_iou_before": mean_iou_before,
            "mean_iou_after": mean_iou_after,
            **stats,
        }
        history.append(record)
        if log_fn:
            log_fn(record)
        if wandb_run is not None:
            wandb_run.log(record)

        if not np.isfinite([stats["loss_G"], stats["loss_D"]]).all():
            break

        if delta_iou > best_delta_iou + tcfg.early_stop.min_delta:
            best_delta_iou = delta_iou
            ckpt.save(
                "best", jax.device_get(state),
                {"epoch": epoch, "delta_iou": delta_iou},
            )
            if release_path and (
                time.monotonic() - last_release >= release_min_s
            ):
                from gcssl_tpu.core.release import save_release

                save_release(
                    jax.device_get(eval_g_params(cfg, state)), release_path,
                    {"kind": "calibrator_g", "epoch": epoch,
                     "delta_iou": delta_iou, "snapshot": True},
                    compresslevel=1,
                )
                last_release = time.monotonic()
            bad_epochs = 0
        else:
            bad_epochs += 1
            if bad_epochs >= tcfg.early_stop.patience:
                break

        if tcfg.ckpt_every_epochs and epoch % tcfg.ckpt_every_epochs == 0:
            ckpt.save(
                "last", jax.device_get(state),
                {"epoch": epoch, "lr": sched_g.lr, "sched_best": sched_g.best,
                 "sched_bad_epochs": sched_g.num_bad_epochs,
                 "bad_epochs": bad_epochs},
            )
            (Path(tcfg.save_dir) / "training_history.json").write_text(
                json.dumps(history, indent=2)
            )

    out_root = Path(tcfg.save_dir)
    out_root.mkdir(parents=True, exist_ok=True)
    (out_root / "training_history.json").write_text(json.dumps(history, indent=2))
    if wandb_run is not None:
        wandb_run.finish({"best_delta_iou": best_delta_iou})
    ckpt.save(
        "last", jax.device_get(state),
        {"epoch": history[-1]["epoch"] if history else 0,
         "lr": sched_g.lr, "sched_best": sched_g.best,
         "sched_bad_epochs": sched_g.num_bad_epochs, "bad_epochs": bad_epochs},
    )
    if release_path and history and ckpt.exists("best"):
        # final snapshot of the run's best G: the in-loop release is
        # time-throttled (release_min_s), so a best improvement inside the
        # throttle window would otherwise never reach the tracked file
        from gcssl_tpu.core.release import export_calibrator_g

        export_calibrator_g(tcfg.save_dir, release_path, cfg)
    return state, history
