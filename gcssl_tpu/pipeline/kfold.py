"""Stage 2b: k-fold cross pseudo-labeling.

Twin of /root/reference/kfold_train_and_pseudo.py: split the labeled train
images into K folds (shuffled, seeded — sklearn-KFold-compatible index
arithmetic), train a detector on K-1 folds, predict the held-out fold at a
low threshold (conf 0.1, NMS IoU 0.9, save_conf), then merge all folds'
pseudo-labels (+ optionally images) into ``merged_pseudo/``.

The reference runs five full Ultralytics trainings sequentially; here each
fold's training is our jitted detector trainer, and folds can fan out across
mesh slices in a multi-slice deployment.
"""

from __future__ import annotations

import shutil
from pathlib import Path

import numpy as np

from gcssl_tpu.core.config import DetectorConfig, PseudoLabelConfig
from gcssl_tpu.data.detection import load_detection_tree
from gcssl_tpu.data.yolo import list_images
from gcssl_tpu.pipeline.detect import (
    make_detector_predict,
    predict_to_tree,
    train_detector,
)
from gcssl_tpu.train.detector import eval_params


def kfold_split(n: int, k: int, seed: int = 42):
    """sklearn KFold(shuffle=True, random_state=seed)-compatible splits."""
    rng = np.random.RandomState(seed)
    idx = np.arange(n)
    rng.shuffle(idx)
    fold_sizes = np.full(k, n // k, int)
    fold_sizes[: n % k] += 1
    current = 0
    for fs in fold_sizes:
        test = idx[current : current + fs]
        train = np.concatenate([idx[:current], idx[current + fs :]])
        yield np.sort(train), np.sort(test)
        current += fs


def kfold_pseudo_label(
    det_cfg: DetectorConfig,
    pl_cfg: PseudoLabelConfig,
    train_images_dir: str | Path,
    val_dir: str | Path | None,
    output_root: str | Path,
    copy_images: bool = True,
    max_epochs: int | None = None,
    log_fn=None,
    init_from: str | Path | None = None,
    fold_parallel: bool = False,
    mesh=None,
    fold_dp: int = 1,
    dp: int = 1,
) -> Path:
    """Run all folds; returns the merged_pseudo directory.

    ``fold_parallel=True`` trains every fold simultaneously in one jitted
    program over a ``fold`` mesh axis (parallel/fold_parallel.py) instead of
    the sequential fold loop — K trainings in the wall-clock of one on a
    K-device (or K×M) mesh.

    ``dp``: data-parallel devices for the SEQUENTIAL path (each fold's
    training and held-out prediction run dp-wide) — the right axis when
    devices < K; with devices >= K prefer ``fold_parallel`` (+``fold_dp``)."""
    train_images_dir = Path(train_images_dir)
    output_root = Path(output_root)
    img_paths = list_images(train_images_dir)
    n = len(img_paths)

    val_arrays = (
        load_detection_tree(val_dir, det_cfg.img_size, det_cfg.max_boxes)
        if val_dir
        else None
    )

    if fold_parallel:
        return _kfold_parallel(
            det_cfg, pl_cfg, train_images_dir, output_root, img_paths,
            val_arrays, copy_images, max_epochs, log_fn, mesh, fold_dp,
        )

    for fold, (train_idx, infer_idx) in enumerate(
        kfold_split(n, pl_cfg.kfolds, seed=42), start=1
    ):
        fold_root = output_root / f"fold_{fold:02d}"
        pseudo_dir = fold_root / "pseudo_labels" / "pred" / "labels"
        if (fold_root / "done.txt").exists():
            continue  # crash-resume: this fold already trained + predicted
        pseudo_dir.mkdir(parents=True, exist_ok=True)

        train_list = [img_paths[i] for i in train_idx]
        infer_list = [img_paths[i] for i in infer_idx]
        (fold_root / "train_list.txt").write_text(
            "\n".join(str(p) for p in train_list) + "\n"
        )
        (fold_root / "infer_list.txt").write_text(
            "\n".join(str(p) for p in infer_list) + "\n"
        )

        arrays = load_detection_tree(
            train_images_dir.parent, det_cfg.img_size, det_cfg.max_boxes,
            image_list=train_list,
        )
        state, model, _ = train_detector(
            det_cfg, arrays, val_arrays,
            save_dir=fold_root / "train", log_fn=log_fn, max_epochs=max_epochs,
            init_from=init_from, dp=dp,
        )
        predict_fn = make_detector_predict(det_cfg, model)
        predict_to_tree(
            det_cfg, predict_fn, eval_params(det_cfg, state),
            train_images_dir, pseudo_dir,
            conf_thr=pl_cfg.kfold_conf, iou_thr=pl_cfg.kfold_iou_nms,
            image_list=infer_list, save_conf=True, dp=dp,
        )
        (fold_root / "done.txt").write_text("ok\n")

    return _merge_folds(output_root, img_paths, copy_images)


def _kfold_parallel(
    det_cfg, pl_cfg, train_images_dir, output_root, img_paths,
    val_arrays, copy_images, max_epochs, log_fn, mesh, fold_dp=1,
):
    """All folds in one stacked program; same on-disk artifacts as the
    sequential path (fold_*/train_list.txt, pseudo label trees, merged)."""
    import json

    import jax

    from gcssl_tpu.parallel.fold_parallel import train_folds

    n = len(img_paths)
    folds = list(kfold_split(n, pl_cfg.kfolds, seed=42))
    arrays = load_detection_tree(
        train_images_dir.parent, det_cfg.img_size, det_cfg.max_boxes,
        image_list=img_paths,
    )
    best_params, histories, model = train_folds(
        det_cfg, arrays, folds, val_arrays=val_arrays, mesh=mesh,
        max_epochs=max_epochs, log_fn=log_fn, data_parallel=fold_dp,
    )
    predict_fn = make_detector_predict(det_cfg, model)
    for fold, (train_idx, infer_idx) in enumerate(folds, start=1):
        fold_root = output_root / f"fold_{fold:02d}"
        pseudo_dir = fold_root / "pseudo_labels" / "pred" / "labels"
        pseudo_dir.mkdir(parents=True, exist_ok=True)
        fold_root.joinpath("train_list.txt").write_text(
            "\n".join(str(img_paths[i]) for i in train_idx) + "\n"
        )
        fold_root.joinpath("infer_list.txt").write_text(
            "\n".join(str(img_paths[i]) for i in infer_idx) + "\n"
        )
        (fold_root / "train").mkdir(parents=True, exist_ok=True)
        (fold_root / "train" / "results.json").write_text(
            json.dumps(histories[fold - 1], indent=2)
        )
        predict_to_tree(
            det_cfg, predict_fn, jax.device_put(best_params[fold - 1]),
            train_images_dir, pseudo_dir,
            conf_thr=pl_cfg.kfold_conf, iou_thr=pl_cfg.kfold_iou_nms,
            image_list=[img_paths[i] for i in infer_idx], save_conf=True,
        )
        (fold_root / "done.txt").write_text("ok\n")
    return _merge_folds(output_root, img_paths, copy_images)


def _merge_folds(output_root: Path, img_paths, copy_images: bool) -> Path:
    merged = output_root / "merged_pseudo"
    merged_labels = merged / "labels"
    merged_labels.mkdir(parents=True, exist_ok=True)
    if copy_images:
        (merged / "images").mkdir(parents=True, exist_ok=True)
    for pred_labels in output_root.glob("fold_*/pseudo_labels/pred/labels"):
        for txt in pred_labels.glob("*.txt"):
            shutil.move(str(txt), merged_labels / txt.name)
    if copy_images:
        for p in img_paths:
            if (merged_labels / f"{p.stem}.txt").exists():
                shutil.copy2(p, merged / "images" / p.name)
    return merged
