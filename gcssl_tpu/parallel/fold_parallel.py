"""Fold-parallel k-fold training: all K fold detectors in ONE jitted program.

The reference trains its 5 cross-pseudo-labeling folds sequentially, 400
epochs each (/root/reference/kfold_train_and_pseudo.py:94-128).  TPU-native
redesign (SURVEY.md §2 C4 "fold loop can fan out across TPU slices"): stack
the K fold train-states on a leading axis sharded over a ``fold`` mesh
axis and ``shard_map`` the single-fold step core
(train/detector.py:make_detector_step_core) over it — each device runs the
UNCHANGED single-fold graph on its own fold, so K folds train in the
wall-clock of one, with zero collectives (folds are independent; the only
shared tensor is the replicated source-image pool).

Fold semantics mirror the sequential path (pipeline/kfold.py): identical
model init per fold (same seed — the sequential path reuses ``cfg.seed``
for every fold too), per-fold epoch shuffles from fold-local numpy RNGs,
per-fold early-stop bookkeeping on val mAP50.  Folds whose train split is
smaller than the largest run wrap their epoch permutation so every fold
executes the same number of steps per epoch (static shapes; with the
reference's 500/5 split all folds are equal and no wrapping occurs).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gcssl_tpu.core.config import DetectorConfig
from gcssl_tpu.train.detector import (
    create_detector_state,
    make_detector_predict,
    make_detector_step_core,
)


def make_fold_mesh(k: int, data: int = 1, devices=None) -> Mesh:
    """A ``('fold',)`` mesh over the first ``k`` devices, or a 2-D
    ``('fold', 'data')`` mesh over ``k*data`` devices when ``data > 1``
    (each fold trains data-parallel across its own ``data`` device group)."""
    devices = list(devices if devices is not None else jax.devices())
    if len(devices) < k * data:
        raise ValueError(
            f"fold mesh needs {k * data} devices, have {len(devices)}"
        )
    if data == 1:
        return Mesh(np.asarray(devices[:k]), ("fold",))
    return Mesh(
        np.asarray(devices[: k * data]).reshape(k, data), ("fold", "data")
    )


def _stack(trees):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def _index(tree, i):
    return jax.tree.map(lambda x: x[i], tree)


def make_fold_train_step(cfg: DetectorConfig, model, tx, mesh: Mesh):
    """jit(shard_map(step_core)) over the fold axis.

    Each device holds one fold's shard (leading dim 1 locally) and runs the
    UNCHANGED single-fold step graph on it — no vmap'd grouped convolutions,
    no cross-fold collectives (folds are independent).  ``shard_map`` is the
    natural expression of "K isolated programs on K device groups".

    On a 2-D ``('fold', 'data')`` mesh each fold additionally trains
    data-parallel across its ``data`` group: the batch dim is sharded over
    'data', the step core psums grads/metrics over it (grad_axis), and the
    fold's train-state stays replicated within the group by construction."""
    has_data = "data" in mesh.axis_names
    core = make_detector_step_core(
        cfg, model, tx, grad_axis="data" if has_data else None
    )
    spec, rspec = P("fold"), P()
    bspec = P("fold", "data") if has_data else P("fold")

    def _local(states, images4_u8, boxes4, mask4, weights, lr, use_mosaic):
        # local block: leading fold dim of size 1 on every sharded arg
        s = jax.tree.map(lambda x: x[0], states)
        s2, metrics = core(
            s, images4_u8[0], boxes4[0], mask4[0], weights[0], lr,
            use_mosaic=use_mosaic,
        )
        expand = lambda t: jax.tree.map(lambda x: jnp.asarray(x)[None], t)
        return expand(s2), expand(metrics)

    @functools.partial(jax.jit, donate_argnums=(0,), static_argnums=(6,))
    def _vstep(states, images4_u8, boxes4, mask4, weights, lr, use_mosaic):
        return jax.shard_map(
            functools.partial(_local, use_mosaic=use_mosaic),
            mesh=mesh,
            in_specs=(spec, bspec, bspec, bspec, bspec, rspec),
            out_specs=(spec, spec),
            check_vma=False,
        )(states, images4_u8, boxes4, mask4, weights, lr)

    def vstep(states, images4_u8, boxes4, mask4, weights, lr,
              use_mosaic: bool = True):
        return _vstep(states, images4_u8, boxes4, mask4, weights, lr,
                      bool(use_mosaic))

    return vstep


def train_folds(
    cfg: DetectorConfig,
    arrays,                      # DetectionArrays over the FULL labeled pool
    folds: list[tuple[np.ndarray, np.ndarray]],  # (train_idx, infer_idx) per fold
    val_arrays=None,
    mesh: Mesh | None = None,
    max_epochs: int | None = None,
    log_fn=None,
    data_parallel: int = 1,
) -> tuple[list[Any], list[list[dict]], Any]:
    """Train all folds simultaneously.

    ``data_parallel``: devices per fold — builds the 2-D ('fold', 'data')
    mesh so each fold's batch additionally shards over its own device
    group (cfg.batch_size must divide by it).

    Returns ``(best_eval_params_per_fold, history_per_fold, model)`` where
    best params are host trees (EMA when enabled), selected per fold by val
    mAP50 exactly like the sequential trainer (pipeline/detect.py:232-242).
    """
    k = len(folds)
    mesh = mesh or make_fold_mesh(k, data=data_parallel)
    if "data" in mesh.axis_names and cfg.batch_size % mesh.shape["data"]:
        raise ValueError(
            f"batch_size {cfg.batch_size} not divisible by data axis "
            f"{mesh.shape['data']}"
        )
    if mesh.shape["fold"] != k:
        raise ValueError(f"mesh fold axis {mesh.shape['fold']} != {k} folds")

    states, model, tx = [], None, None
    for _ in range(k):
        st, model, tx = create_detector_state(cfg, jax.random.PRNGKey(cfg.seed))
        states.append(st)
    states = _stack(states)
    states = jax.device_put(states, NamedSharding(mesh, P("fold")))

    vstep = make_fold_train_step(cfg, model, tx, mesh)
    predict_fn = make_detector_predict(
        cfg, model, max_out=max(300, cfg.max_boxes), pre_nms_topk=700
    )

    repl = NamedSharding(mesh, P())
    images = jax.device_put(jnp.asarray(arrays.images), repl)
    gt_boxes = jax.device_put(jnp.asarray(arrays.boxes), repl)
    gt_mask = jax.device_put(jnp.asarray(arrays.mask), repl)

    fold_ns = [len(tr) for tr, _ in folds]
    bs = cfg.batch_size
    steps_per_epoch = max(1, -(-max(fold_ns) // bs))
    n_epochs = max_epochs or cfg.epochs
    warmup = cfg.warmup_epochs * steps_per_epoch
    total = n_epochs * steps_per_epoch

    def lr_at(step):
        if step < warmup:
            return cfg.lr * (step + 1) / max(1, warmup)
        t = (step - warmup) / max(1, total - warmup)
        return cfg.lr * 0.5 * (1 + np.cos(np.pi * t))

    rngs = [np.random.default_rng(cfg.seed) for _ in range(k)]
    histories: list[list[dict]] = [[] for _ in range(k)]
    best_map50 = [-1.0] * k
    bad_epochs = [0] * k
    best_params: list[Any] = [None] * k
    gstep = 0

    for epoch in range(1, n_epochs + 1):
        use_mosaic = bool(
            cfg.mosaic and epoch <= n_epochs - cfg.close_mosaic_epochs
        )
        # per-fold epoch permutation, wrapped to the common step count
        fold_orders, fold_w = [], []
        for f in range(k):
            tr = folds[f][0]
            order = rngs[f].permutation(len(tr))
            w = np.zeros(steps_per_epoch * bs, np.float32)
            w[: len(tr)] = 1.0
            fold_orders.append(tr[np.resize(order, steps_per_epoch * bs)])
            fold_w.append(w)

        accum = []
        for b in range(steps_per_epoch):
            sl = slice(b * bs, (b + 1) * bs)
            idx4 = np.stack([
                np.stack(
                    [fold_orders[f][sl]]
                    + [folds[f][0][rngs[f].integers(0, fold_ns[f], bs)]
                       for _ in range(3)],
                    axis=1,
                )
                for f in range(k)
            ]).astype(np.int32)                         # (K, B, 4)
            w = np.stack([fold_w[f][sl] for f in range(k)])
            i4 = jnp.asarray(idx4)
            states, metrics = vstep(
                states, images[i4], gt_boxes[i4], gt_mask[i4],
                jnp.asarray(w), jnp.float32(lr_at(gstep)),
                use_mosaic=use_mosaic,
            )
            accum.append(metrics)
            gstep += 1
        fetched = jax.device_get(accum)

        eval_p = states.ema_params if cfg.ema_decay > 0 else states.params
        val_ms = None
        if val_arrays is not None:
            from gcssl_tpu.pipeline.detect import evaluate_on

            val_ms = [
                evaluate_on(predict_fn, _index(eval_p, f), val_arrays)
                for f in range(k)
            ]
        for f in range(k):
            rec = {
                "fold": f + 1, "epoch": epoch, "lr": lr_at(gstep - 1),
                **{m: float(np.mean([s[m][f] for s in fetched]))
                   for m in fetched[0]},
            }
            if val_ms is not None:
                m = val_ms[f]
                rec.update(map50=m.map50, map50_95=m.map50_95,
                           precision=m.precision, recall=m.recall)
                if m.map50 > best_map50[f]:
                    best_map50[f], bad_epochs[f] = m.map50, 0
                    best_params[f] = jax.device_get(_index(eval_p, f))
                else:
                    bad_epochs[f] += 1
            histories[f].append(rec)
            if log_fn:
                log_fn(rec)
        if val_arrays is not None and all(b >= cfg.patience for b in bad_epochs):
            break

    for f in range(k):
        if best_params[f] is None:  # no val: final params
            eval_p = states.ema_params if cfg.ema_decay > 0 else states.params
            best_params[f] = jax.device_get(_index(eval_p, f))
    return best_params, histories, model
