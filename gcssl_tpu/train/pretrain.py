"""Self-supervised backbone pretraining on the unlabeled pool
(masked-image reconstruction).

The reference detector starts from COCO-pretrained YOLOv8 weights
(/root/reference/train.py:11, kfold_train_and_pseudo.py:20) — unavailable
offline.  The substitute: pretrain the detector backbone on the 11k
unlabeled images by reconstructing masked image patches (MAE-style
objective adapted to a dense conv backbone): random 32 px patches are
replaced with mid-gray, the backbone runs on the masked image, a light
FPN-ish decoder predicts the pixels of every patch, and the loss is L2 on
the masked patches against per-patch-normalized targets.

Round-1 note: rotation prediction (RotNet) was tried first and learned
nothing on this data (crowd scenes have weak canonical-orientation cues at
the whole-image level — loss stayed at chance ln 4); reconstruction gives
a dense, unambiguous signal instead.

TPU-first: the image pack is HBM-resident uint8 (one host->device upload,
then hundreds of epochs gather batches by index on device); random
crop + hflip aug, masking, forward/backward all live in one compiled step.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn
from flax import struct

from gcssl_tpu.core.config import DetectorConfig
from gcssl_tpu.models.detector import Backbone, ConvBlock

PATCH = 32          # masked patch edge in px
GRAY = 0.447        # fill value for masked patches (dataset mean-ish)


class MaskedRecon(nn.Module):
    """Detector backbone + tiny top-down decoder predicting 8x8x3 pixels
    per /8 cell (so gradients reach every backbone stage through c5)."""

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
        f = w(256)
        self.lat5 = ConvBlock(f, 1, dtype=self.dtype)
        self.lat4 = ConvBlock(f, 1, dtype=self.dtype)
        self.lat3 = ConvBlock(f, 1, dtype=self.dtype)
        self.fuse = ConvBlock(f, 3, dtype=self.dtype)
        self.out = nn.Dense(8 * 8 * 3)

    def __call__(self, images):
        c3, c4, c5 = self.backbone(images)
        p = self.lat5(c5)
        p = jax.image.resize(
            p, (p.shape[0], c4.shape[1], c4.shape[2], p.shape[3]), "nearest"
        ) + self.lat4(c4)
        p = jax.image.resize(
            p, (p.shape[0], c3.shape[1], c3.shape[2], p.shape[3]), "nearest"
        ) + self.lat3(c3)
        p = self.fuse(p)
        b, h, w, _ = p.shape
        px = self.out(p.astype(jnp.float32))           # (B, H, W, 192)
        px = px.reshape(b, h, w, 8, 8, 3)
        px = px.transpose(0, 1, 3, 2, 4, 5)            # (B, H, 8, W, 8, 3)
        return px.reshape(b, h * 8, w * 8, 3)          # full-res prediction


class PretrainState(struct.PyTreeNode):
    params: Any
    opt: Any
    rng: jax.Array
    step: jax.Array


def create_pretrain_state(cfg: DetectorConfig, img_size: int, rng: jax.Array,
                          weight_decay: float = 0.05):
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    model = MaskedRecon(cfg.width_mult, cfg.depth_mult, dtype)
    tx = optax.chain(
        optax.clip_by_global_norm(5.0),
        optax.scale_by_adam(),
        optax.add_decayed_weights(weight_decay),
    )

    # one jitted init program (eager flax init is minutes through the
    # tunneled TPU path — see wgan_gp.create_train_state)
    @jax.jit
    def _init(rng):
        rng, init_rng = jax.random.split(rng)
        params = model.init(
            init_rng, jnp.zeros((1, img_size, img_size, 3))
        )["params"]
        return PretrainState(params=params, opt=tx.init(params), rng=rng,
                             step=jnp.asarray(0, jnp.int32))

    return _init(rng), model, tx


def _normalize_patches(x, grid):
    """Per-PATCH normalization of targets (the MAE trick): (B,S,S,3) ->
    same shape, each PATCH-sized block standardized over its own pixels."""
    b, s, _, c = x.shape
    g = grid
    blocks = x.reshape(b, g, PATCH, g, PATCH, c)
    mu = blocks.mean(axis=(2, 4, 5), keepdims=True)
    var = blocks.var(axis=(2, 4, 5), keepdims=True)
    return ((blocks - mu) / jnp.sqrt(var + 1e-5)).reshape(b, s, s, c)


def make_pretrain_step(model, tx, view_size: int, mask_ratio: float = 0.5):
    grid = view_size // PATCH

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: PretrainState, images_dev, idx, lr):
        rng = jax.random.fold_in(state.rng, state.step)
        r_crop, r_flip, r_mask = jax.random.split(rng, 3)
        imgs = images_dev[idx].astype(jnp.float32) / 255.0  # (B, S0, S0, 3)
        b, s0 = imgs.shape[0], imgs.shape[1]

        # random crop to the view size + hflip, on device
        max_off = s0 - view_size
        offs = jax.random.randint(r_crop, (b, 2), 0, max_off + 1)
        imgs = jax.vmap(
            lambda im, o: jax.lax.dynamic_slice(
                im, (o[0], o[1], 0), (view_size, view_size, 3)
            )
        )(imgs, offs)
        flip = jax.random.bernoulli(r_flip, 0.5, (b,))
        imgs = jnp.where(flip[:, None, None, None], jnp.flip(imgs, axis=2), imgs)

        # patch mask: True = hidden
        pmask = jax.random.bernoulli(r_mask, mask_ratio, (b, grid, grid))
        pix_mask = jnp.repeat(jnp.repeat(pmask, PATCH, axis=1), PATCH, axis=2)
        masked = jnp.where(pix_mask[..., None], GRAY, imgs)

        target = _normalize_patches(imgs, grid)

        def loss_fn(params):
            pred = model.apply({"params": params}, masked)
            err = (pred - target) ** 2
            msum = jnp.maximum(jnp.sum(pix_mask), 1.0) * 3
            loss = jnp.sum(err * pix_mask[..., None]) / msum
            # visible-region loss as a free metric (not optimized target)
            vsum = jnp.maximum(jnp.sum(1.0 - pix_mask), 1.0) * 3
            vis = jnp.sum(err * (1.0 - pix_mask[..., None])) / vsum
            return loss, vis

        (loss, vis), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt = tx.update(grads, state.opt, state.params)
        params = optax.apply_updates(
            state.params, jax.tree.map(lambda u: -lr * u, updates)
        )
        return state.replace(params=params, opt=opt, rng=rng,
                             step=state.step + 1), {"loss": loss, "vis_mse": vis}

    return step


def pretrain_backbone(
    cfg: DetectorConfig,
    images_u8: np.ndarray,
    epochs: int = 200,
    img_size: int = 224,
    batch_size: int = 256,
    lr: float = 4e-4,
    mask_ratio: float = 0.5,
    warmup_epochs: int = 10,
    log_fn=None,
    save_dir=None,
):
    """Train masked reconstruction; returns the backbone params subtree (to
    graft into a detector init via ``transfer_backbone`` / ``init_from``).

    ``images_u8``: (N, S0, S0, 3) uint8 resident pack, S0 > img_size so the
    random crop has room (e.g. 256 -> 224 views)."""
    state, model, tx = create_pretrain_state(
        cfg, img_size, jax.random.PRNGKey(cfg.seed)
    )
    step_fn = make_pretrain_step(model, tx, img_size, mask_ratio)
    images_dev = jnp.asarray(images_u8)
    n = len(images_u8)
    rng = np.random.default_rng(cfg.seed)
    steps = max(1, n // batch_size)
    total = epochs * steps
    warm = warmup_epochs * steps
    gstep = 0
    for epoch in range(1, epochs + 1):
        perm = rng.permutation(n)
        accum = []
        for b in range(steps):
            if gstep < warm:
                cur_lr = lr * (gstep + 1) / max(1, warm)
            else:
                t = (gstep - warm) / max(1, total - warm)
                cur_lr = lr * 0.5 * (1 + np.cos(np.pi * t))
            idx = jnp.asarray(perm[b * batch_size:(b + 1) * batch_size], jnp.int32)
            state, m = step_fn(state, images_dev, idx, jnp.float32(cur_lr))
            accum.append(m)
            gstep += 1
        fetched = jax.device_get(accum)
        rec = {"epoch": epoch, "lr": cur_lr,
               **{kk: float(np.mean([m[kk] for m in fetched])) for kk in fetched[0]}}
        if log_fn:
            log_fn(rec)
        if save_dir is not None and epoch % 20 == 0:
            _save_backbone(save_dir, state)
    if save_dir is not None:
        _save_backbone(save_dir, state)
    return jax.device_get(state.params)["backbone"]


def _save_backbone(save_dir, state):
    from pathlib import Path

    from flax import serialization

    d = Path(save_dir)
    d.mkdir(parents=True, exist_ok=True)
    payload = {"params": {"backbone": jax.device_get(state.params)["backbone"]}}
    (d / "backbone.msgpack").write_bytes(serialization.to_bytes(payload))


def transfer_backbone(detector_params, backbone_params):
    """Graft pretrained backbone weights into a fresh detector param tree."""
    out = dict(detector_params)
    out["backbone"] = backbone_params
    return out
