"""Self-supervised backbone pretraining on the unlabeled pool (RotNet).

The reference detector starts from COCO-pretrained YOLOv8 weights
(/root/reference/train.py:11, kfold_train_and_pseudo.py:20) — unavailable
offline.  The semi-supervised substitute: pretrain the detector backbone on
the 11k unlabeled images with rotation prediction (Gidaris et al. 2018) —
a fully self-supervised 4-way classification task — then initialize
detection training from it.

TPU-first: the image pack is device-resident; each step gathers a batch by
index, applies the four rotations on device, and trains backbone + linear
head in one compiled program.
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
from gcssl_tpu.models.detector import Backbone


class RotNet(nn.Module):
    """Detector backbone + GAP + 4-way rotation head."""

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
        self.head = nn.Dense(4)

    def __call__(self, images):
        _, _, c5 = self.backbone(images)
        pooled = jnp.mean(c5.astype(jnp.float32), axis=(1, 2))
        return self.head(pooled)


class PretrainState(struct.PyTreeNode):
    params: Any
    opt: Any
    rng: jax.Array
    step: jax.Array


def create_pretrain_state(cfg: DetectorConfig, img_size: int, rng: jax.Array):
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    model = RotNet(cfg.width_mult, cfg.depth_mult, dtype)
    rng, init_rng = jax.random.split(rng)
    params = model.init(init_rng, jnp.zeros((1, img_size, img_size, 3)))["params"]
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.scale_by_adam())
    return PretrainState(params=params, opt=tx.init(params), rng=rng,
                         step=jnp.asarray(0, jnp.int32)), model, tx


def make_pretrain_step(model, tx):
    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: PretrainState, images_dev, idx, lr):
        rng = jax.random.fold_in(state.rng, state.step)
        imgs = images_dev[idx].astype(jnp.float32) / 255.0
        # all four rotations of every image per step (Gidaris et al. 2018 §3:
        # dense rotation supervision converges far faster than sampling one)
        x = jnp.concatenate(
            [imgs, jnp.rot90(imgs, 1, (1, 2)), jnp.rot90(imgs, 2, (1, 2)),
             jnp.rot90(imgs, 3, (1, 2))], axis=0,
        )  # (4B, S, S, 3)
        k = jnp.repeat(jnp.arange(4, dtype=jnp.int32), imgs.shape[0])

        def loss_fn(params):
            logits = model.apply({"params": params}, x)
            logp = jax.nn.log_softmax(logits)
            loss = -jnp.mean(jnp.take_along_axis(logp, k[:, None], axis=1))
            acc = jnp.mean((jnp.argmax(logits, axis=1) == k).astype(jnp.float32))
            return loss, acc

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt = tx.update(grads, state.opt, state.params)
        params = optax.apply_updates(
            state.params, jax.tree.map(lambda u: -lr * u, updates)
        )
        return state.replace(params=params, opt=opt, rng=rng,
                             step=state.step + 1), {"loss": loss, "acc": acc}

    return step


def pretrain_backbone(
    cfg: DetectorConfig,
    images_u8: np.ndarray,
    epochs: int = 30,
    img_size: int = 256,
    batch_size: int = 32,
    lr: float = 1e-3,
    log_fn=None,
):
    """Train RotNet; returns the backbone params subtree (to graft into a
    detector init via ``transfer_backbone``)."""
    state, model, tx = create_pretrain_state(cfg, img_size, jax.random.PRNGKey(cfg.seed))
    step_fn = make_pretrain_step(model, tx)
    images_dev = jnp.asarray(images_u8)
    n = len(images_u8)
    rng = np.random.default_rng(cfg.seed)
    steps = max(1, n // batch_size)
    for epoch in range(1, epochs + 1):
        perm = rng.permutation(n)
        accum = []
        for b in range(steps):
            idx = jnp.asarray(perm[b * batch_size:(b + 1) * batch_size], jnp.int32)
            state, m = step_fn(state, images_dev, idx, jnp.float32(lr))
            accum.append(m)
        fetched = jax.device_get(accum)
        rec = {"epoch": epoch,
               **{kk: float(np.mean([m[kk] for m in fetched])) for kk in fetched[0]}}
        if log_fn:
            log_fn(rec)
    return jax.device_get(state.params)["backbone"]


def transfer_backbone(detector_params, backbone_params):
    """Graft pretrained backbone weights into a fresh detector param tree."""
    out = dict(detector_params)
    out["backbone"] = backbone_params
    return out
