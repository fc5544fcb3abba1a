"""Detector orchestration: train with early stopping on val mAP50, batched
prediction to YOLO-txt trees.

Replaces the reference's Ultralytics calls:
* training — /root/reference/train.py:11-22 (imgsz 640, epochs 400,
  patience 20, batch 32, early-stopped on fitness)
* prediction — /root/reference/Two-stage pseudo-labeling.py:50,79 and
  kfold_train_and_pseudo.py:115-128 (save_txt, save_conf)
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from gcssl_tpu.core.config import DetectorConfig
from gcssl_tpu.data.detection import (
    DetectionArrays,
    load_detection_tree,
    map_boxes_from_letterbox,
)
from gcssl_tpu.data.yolo import save_yolo_txt
from gcssl_tpu.eval.map import DetMetrics, evaluate_detections
from gcssl_tpu.train.detector import (
    create_detector_state,
    make_detector_predict,
    make_detector_train_step,
)


def _batches(n, bs, rng=None):
    if n == 0:
        return
    order = rng.permutation(n) if rng is not None else np.arange(n)
    nb = -(-n // bs)
    padded = np.resize(order, nb * bs)
    w = np.zeros(nb * bs, np.float32)
    w[:n] = 1.0
    for b in range(nb):
        sl = slice(b * bs, (b + 1) * bs)
        yield padded[sl].astype(np.int32), w[sl]


def predict_arrays(
    predict_fn,
    params,
    arrays: DetectionArrays,
    conf_thr: float,
    iou_thr: float,
    tta: bool = False,
    batch_size: int = 16,
    chunk_size: int = 2048,
    fuse: bool = False,
    dp: int = 1,
):
    """Run batched prediction; returns per-image (boxes cxcywh letterboxed
    frame, scores) lists.

    Images are device_put once per ``chunk_size`` slice and batches gathered
    by index on device — on links where host->device bandwidth is scarce,
    per-batch uploads would dominate wall time.  Chunking bounds HBM use so
    reference-scale pools (11k images x 640px = 13.5 GB) fit: each chunk's
    resident copy is dropped before the next uploads.

    ``dp``: shard each batch over the first ``dp`` devices (1-D 'data'
    mesh, params replicated) — sharding propagation partitions the whole
    predict graph (backbone, decode, per-image NMS) with no collectives in
    the hot path; per-image results are independent, so dp>1 output is
    identical to dp=1."""
    # Pin params on device ONCE.  Checkpoint restore returns a numpy tree;
    # passing that straight in re-uploads every param on every batch — at
    # reference scale (11k images / 690 batches) that is ~100 GB of host
    # staging for an m-scale detector, and the relay client never returns
    # those buffers (measured: ~param-size RSS growth per execution,
    # scripts/mem_probe_predict.py), which OOM'd the two-stage pass.
    batch_sh = None
    if dp > 1:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        devs = jax.devices()
        if len(devs) < dp:
            raise ValueError(f"dp={dp} needs {dp} devices, have {len(devs)}")
        if batch_size % dp:
            raise ValueError(
                f"batch_size {batch_size} not divisible by dp={dp}"
            )
        mesh = Mesh(np.asarray(devs[:dp]), ("data",))
        batch_sh = NamedSharding(mesh, P("data"))
        params = jax.device_put(params, NamedSharding(mesh, P()))
    else:
        params = jax.device_put(params)
    out_boxes, out_scores = [], []
    n = len(arrays)
    for c0 in range(0, max(n, 1), chunk_size):
        chunk = arrays.images[c0 : c0 + chunk_size]
        m = len(chunk)
        if m == 0:
            break
        images_dev = jnp.asarray(chunk)
        # dispatch every batch first, fetch once: a device_get per batch
        # would host-sync each dispatch and serialize the pipeline
        pending = []
        for idx, w in _batches(m, batch_size):
            imgs = images_dev[jnp.asarray(idx)]
            if batch_sh is not None:
                # scatter the gathered batch over the data mesh (ICI, cheap);
                # the jitted predict then runs SPMD-partitioned on all shards
                imgs = jax.device_put(imgs, batch_sh)
            pending.append((predict_fn(params, imgs, conf_thr, iou_thr, tta, fuse), w))
        for (boxes, scores, valid), w in [
            (jax.device_get(p), w) for p, w in pending
        ]:
            for k in range(len(w)):
                if w[k] == 0:
                    continue
                v = valid[k]
                out_boxes.append(boxes[k][v])
                out_scores.append(scores[k][v])
        images_dev.delete()
    return out_boxes, out_scores


def evaluate_on(predict_fn, params, arrays: DetectionArrays,
                conf_thr: float = 0.001, iou_thr: float = 0.7,
                tta: bool = False, fuse: bool = False) -> DetMetrics:
    pred_boxes, pred_scores = predict_arrays(
        predict_fn, params, arrays, conf_thr, iou_thr, tta=tta, fuse=fuse
    )
    gts = [arrays.boxes[i][arrays.mask[i]] for i in range(len(arrays))]
    return evaluate_detections(pred_boxes, pred_scores, gts)


def train_detector(
    cfg: DetectorConfig,
    train_arrays: DetectionArrays,
    val_arrays: DetectionArrays | None = None,
    save_dir: str | Path | None = None,
    log_fn=None,
    max_epochs: int | None = None,
    resume: bool = False,
    init_from: str | Path | None = None,
    dp: int = 1,
    release_path: str | Path | None = None,
    release_min_s: float = 900.0,
    on_eval=None,
):
    """Epoch loop with warmup+cosine LR and early stop on the selection
    metric (``cfg.select``: strict val mAP50, or Ultralytics-protocol
    fitness 0.1*mAP50 + 0.9*mAP50-95 — the rule behind the reference
    teacher's best.pt); patience from config, mirroring Ultralytics'
    patience=20.

    ``on_eval``: optional callback ``(epoch, rec, eval_params_host)``
    invoked after every val evaluation with the host copy of the params
    being evaluated (EMA when enabled) — lets callers keep rolling
    top-k snapshots for post-run checkpoint averaging without the trainer
    owning that policy.

    ``init_from``: path to a .msgpack checkpoint whose top-level dict has a
    'params' entry; any subtree whose name matches the fresh detector params
    (e.g. a self-supervised pretrained 'backbone') is grafted in.

    ``dp``: train data-parallel over the first ``dp`` devices (1-D 'data'
    mesh, parallel/data_parallel.py:make_detector_dp_step — exact full-batch
    updates via in-loss psum'd normalizers).  The image/box stores are kept
    replicated so each device gathers its mosaic sources locally; only the
    gradient all-reduce rides ICI.

    ``release_path``: when set, a params-only bf16 release snapshot
    (core/release.py) is written there whenever val mAP50 improves, at most
    every ``release_min_s`` seconds — full train-state checkpoints are
    gitignored and do not survive workspace resets, so long unattended runs
    need a git-trackable progress artifact."""
    import time as _time

    from gcssl_tpu.core.release import save_release
    from gcssl_tpu.core.checkpoint import CheckpointManager

    state, model, tx = create_detector_state(cfg, jax.random.PRNGKey(cfg.seed))
    if init_from:
        from flax import serialization

        blob = Path(init_from).read_bytes()
        if blob[:2] == b"\x1f\x8b":  # gzipped release file (core/release.py)
            import gzip

            blob = gzip.decompress(blob)
        raw = serialization.msgpack_restore(blob)
        src = raw.get("params", raw)

        def graft(dst, sub):
            merged, used = {}, 0
            for k, v in dst.items():
                if k in sub:
                    if isinstance(v, dict):
                        merged[k], u = graft(v, sub[k])
                        used += u
                    elif np.shape(v) == np.shape(sub[k]):
                        # cast to the fresh state's dtype: bf16 release
                        # snapshots must not leak half precision into an
                        # f32 train state (optimizer was built for f32)
                        merged[k] = jnp.asarray(sub[k], dtype=np.asarray(v).dtype)
                        used += 1
                    else:
                        merged[k] = v
                else:
                    merged[k] = v
            return merged, used

        params, n_used = graft(jax.device_get(state.params), src)
        if n_used == 0:
            raise ValueError(f"init_from {init_from}: no matching param leaves")
        # independent buffers for ema (sharing them would double-donate the
        # same buffer in the donated train step)
        state = state.replace(
            params=jax.tree.map(jnp.asarray, params),
            ema_params=jax.tree.map(lambda x: jnp.array(x, copy=True), params),
        )
    repl = None
    if dp > 1:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        from gcssl_tpu.parallel.data_parallel import make_detector_dp_step

        devs = jax.devices()
        if len(devs) < dp:
            raise ValueError(f"dp={dp} needs {dp} devices, have {len(devs)}")
        if cfg.batch_size % dp:
            raise ValueError(
                f"batch_size {cfg.batch_size} not divisible by dp={dp}"
            )
        mesh = Mesh(np.asarray(devs[:dp]), ("data",))
        repl = NamedSharding(mesh, P())
        state = jax.tree.map(lambda x: jax.device_put(x, repl), state)
        step_fn = make_detector_dp_step(cfg, model, tx, mesh)
    else:
        step_fn = make_detector_train_step(cfg, model, tx)
    # crowd-dense val images need a bigger detection budget than the
    # pipeline's default max_boxes cap for a faithful AP at high recall
    predict_fn = make_detector_predict(
        cfg, model, max_out=max(300, cfg.max_boxes), pre_nms_topk=700
    )

    n = len(train_arrays)
    rng = np.random.default_rng(cfg.seed)
    _put = (lambda x: jax.device_put(x, repl)) if repl else jnp.asarray
    images = _put(train_arrays.images)
    gt_boxes = _put(train_arrays.boxes)
    gt_mask = _put(train_arrays.mask)

    steps_per_epoch = max(1, -(-n // cfg.batch_size))
    n_epochs = max_epochs or cfg.epochs
    warmup = cfg.warmup_epochs * steps_per_epoch
    total = n_epochs * steps_per_epoch

    def lr_at(step):
        if step < warmup:
            return cfg.lr * (step + 1) / max(1, warmup)
        t = (step - warmup) / max(1, total - warmup)
        return cfg.lr * 0.5 * (1 + np.cos(np.pi * t))

    ckpt = CheckpointManager(save_dir) if save_dir else None
    history = []
    best_sel, bad_epochs = -1.0, 0
    last_release = _time.monotonic()
    start_epoch = 1
    if resume and ckpt and ckpt.exists("last"):
        state = ckpt.restore("last", jax.device_get(state))
        start_epoch = int(ckpt.metadata("last").get("epoch", 0)) + 1
        if ckpt.exists("best"):
            bm = ckpt.metadata("best")
            best_sel = float(bm.get("select_value", bm.get("map50", -1.0)))
    gstep = (start_epoch - 1) * steps_per_epoch
    for epoch in range(start_epoch, n_epochs + 1):
        use_mosaic = bool(
            cfg.mosaic and epoch <= n_epochs - cfg.close_mosaic_epochs
        )
        accum = []
        for idx, w in _batches(n, cfg.batch_size, rng):
            # mosaic needs 4 sources per output: shuffled order + 3 random
            idx4 = np.stack(
                [idx] + [rng.integers(0, n, len(idx)) for _ in range(3)], axis=1
            ).astype(np.int32)
            i4 = jnp.asarray(idx4)
            state, metrics = step_fn(
                state,
                images[i4],
                gt_boxes[i4],
                gt_mask[i4],
                jnp.asarray(w),
                jnp.float32(lr_at(gstep)),
                use_mosaic=use_mosaic,
            )
            accum.append(metrics)
            gstep += 1
        fetched = jax.device_get(accum)
        rec = {
            "epoch": epoch,
            "lr": lr_at(gstep - 1),
            "mosaic": use_mosaic,
            **{k: float(np.mean([m[k] for m in fetched])) for k in fetched[0]},
        }
        if val_arrays is not None:
            eval_params = state.ema_params if cfg.ema_decay > 0 else state.params
            if repl is not None:
                # replicas are bitwise-synced; eval single-device on a host
                # pull so the plain-jit predict doesn't see mesh-committed
                # params mixed with default-device images
                eval_params = jax.device_get(eval_params)
            m = evaluate_on(predict_fn, eval_params, val_arrays)
            rec.update(
                map50=m.map50, map50_95=m.map50_95,
                precision=m.precision, recall=m.recall,
                map50_u=m.map50_u, map50_95_u=m.map50_95_u,
            )
            sel = (0.1 * m.map50_u + 0.9 * m.map50_95_u
                   if cfg.select == "fitness" else m.map50)
            if on_eval is not None:
                on_eval(epoch, rec, jax.device_get(eval_params))
            if sel > best_sel:
                best_sel, bad_epochs = sel, 0
                if ckpt:
                    ckpt.save("best", jax.device_get(state),
                              {"epoch": epoch, "map50": m.map50,
                               "map50_95": m.map50_95,
                               "map50_u": m.map50_u,
                               "map50_95_u": m.map50_95_u,
                               "select": cfg.select, "select_value": sel})
                if release_path and (
                    _time.monotonic() - last_release >= release_min_s
                ):
                    save_release(
                        jax.device_get(eval_params),
                        release_path,
                        {"kind": "detector", "epoch": epoch,
                         "map50": m.map50, "snapshot": True,
                         "width_mult": cfg.width_mult,
                         "depth_mult": cfg.depth_mult},
                        compresslevel=1, dtype=jnp.bfloat16,
                    )
                    last_release = _time.monotonic()
            else:
                bad_epochs += 1
        history.append(rec)
        if log_fn:
            log_fn(rec)
        if ckpt and epoch % 10 == 0:
            ckpt.save("last", jax.device_get(state), {"epoch": epoch})
        if val_arrays is not None and bad_epochs >= cfg.patience:
            break

    # history can be empty when a resume starts past the final epoch (the
    # run already completed and the supervisor relaunched it): nothing ran,
    # so save nothing — overwriting 'last'/results.json with an empty run
    # would clobber the completed artifacts and crash on history[-1]
    if ckpt and history:
        ckpt.save("last", jax.device_get(state), {"epoch": history[-1]["epoch"]})
        (Path(save_dir) / "results.json").write_text(json.dumps(history, indent=2))
    if release_path and ckpt and history and ckpt.exists("best"):
        # final snapshot of the run's best (the throttle above may have
        # skipped the last improvement)
        from gcssl_tpu.core.release import export_detector

        export_detector(
            save_dir, release_path, cfg,
            extra_meta={"width_mult": cfg.width_mult,
                        "depth_mult": cfg.depth_mult},
        )
    return state, model, history


def predict_to_tree(
    cfg: DetectorConfig,
    predict_fn,
    params,
    images_dir: str | Path,
    out_labels_dir: str | Path,
    conf_thr: float,
    iou_thr: float,
    tta: bool = False,
    image_list=None,
    save_conf: bool = True,
    fuse: bool = False,
    dp: int = 1,
) -> int:
    """Predict a directory (or list) of images and write YOLO txt files in
    the ORIGINAL image frame (inverse letterbox), with confidences —
    the save_txt/save_conf contract of the reference's Ultralytics calls."""
    arrays = load_detection_tree(
        images_dir, cfg.img_size, cfg.max_boxes,
        labels_dir="/nonexistent", image_list=image_list,
    )
    pred_boxes, pred_scores = predict_arrays(
        predict_fn, params, arrays, conf_thr, iou_thr, tta, fuse=fuse, dp=dp
    )
    out_labels_dir = Path(out_labels_dir)
    total = 0
    for i, name in enumerate(arrays.names):
        w, h = arrays.orig_wh[i]
        boxes = map_boxes_from_letterbox(pred_boxes[i], float(w), float(h))
        boxes = np.clip(boxes, 0.0, 1.0)
        keep = (boxes[:, 2] > 0) & (boxes[:, 3] > 0)
        boxes, scores = boxes[keep], pred_scores[i][keep]
        save_yolo_txt(
            out_labels_dir / f"{name}.txt",
            np.zeros(len(boxes), np.int32),
            boxes,
            scores if save_conf else None,
        )
        total += len(boxes)
    return total
