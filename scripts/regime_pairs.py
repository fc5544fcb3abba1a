"""Build REGIME-MATCHED calibrator pairs from the k-fold detectors.

Round-2 finding: a calibrator trained on conf-0.1/NMS-0.9 k-fold pairs
(the reference's recipe, kfold_train_and_pseudo.py:115-128) transfers
negatively to the loop's stage-2 labels — it wrecks already-good boxes
(raw IoU>=0.7 bucket: dIoU -0.10 to -0.16) because its training pairs are
far sloppier than the TTA/conf>=0.40 boxes it calibrates at inference.

Fix: re-predict each fold's held-out images with the SAME predict regime
the two-stage pipeline uses (TTA, conf 0.40, NMS IoU 0.4) so the pair
distribution matches the deployment distribution, then train the
calibrator on those pairs.

Usage: python scripts/regime_pairs.py [out_root]
Writes {images, labels_gt, labels_pred} under out_root (default
runs/kfold_r2/regime_pairs).
"""

import json
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DATA = Path("/root/reference/datasets/500_100_100")
KFOLD = Path("runs/kfold_r2")


def main():
    import jax

    from gcssl_tpu.core.checkpoint import CheckpointManager
    from gcssl_tpu.core.config import DetectorConfig
    from gcssl_tpu.pipeline.detect import make_detector_predict, predict_to_tree
    from gcssl_tpu.train.detector import create_detector_state, eval_params

    out = Path(sys.argv[1] if len(sys.argv) > 1 else KFOLD / "regime_pairs")
    pred_dir = out / "labels_pred"
    pred_dir.mkdir(parents=True, exist_ok=True)
    (out / "images").mkdir(exist_ok=True)
    (out / "labels_gt").mkdir(exist_ok=True)

    det_cfg = DetectorConfig()
    state, model, _ = create_detector_state(det_cfg, jax.random.PRNGKey(0))
    template = jax.device_get(state)
    predict_fn = make_detector_predict(det_cfg, model)

    total = 0
    for fold_root in sorted(KFOLD.glob("fold_*")):
        mgr = CheckpointManager(fold_root / "train")
        which = "best" if mgr.exists("best") else "last"
        st = mgr.restore(which, template)
        infer_list = [
            Path(line)
            for line in (fold_root / "infer_list.txt").read_text().splitlines()
            if line.strip()
        ]
        n = predict_to_tree(
            det_cfg, predict_fn, eval_params(det_cfg, st),
            DATA / "train" / "images", pred_dir,
            conf_thr=0.40, iou_thr=0.4, tta=True,
            image_list=infer_list, save_conf=True,
        )
        total += n
        print(f"{fold_root.name}: {n} boxes", flush=True)

    kept = 0
    for txt in pred_dir.glob("*.txt"):
        stem = txt.stem
        gt = DATA / "train" / "labels" / f"{stem}.txt"
        if not gt.exists():
            continue
        shutil.copy2(gt, out / "labels_gt" / gt.name)
        for ext in (".jpg", ".png", ".jpeg"):
            src = DATA / "train" / "images" / (stem + ext)
            if src.exists():
                shutil.copy2(src, out / "images" / src.name)
                kept += 1
                break
    summary = {"pred_boxes": total, "images_with_preds": kept}
    (out / "summary.json").write_text(json.dumps(summary, indent=1))
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
