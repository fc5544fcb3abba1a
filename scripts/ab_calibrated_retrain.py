"""Detector-level A/B of the GAN calibrator in the sloppy-pair regime.

Usage: python scripts/ab_calibrated_retrain.py [key=value ...]

Round-2 finding (REPORT_r2.md): patch-conditioned box refinement pays only
when the pair-generation regime is sloppier than the deployment regime; on
matched regimes it is neutral-to-negative, so the SSL loop retrains on raw
stage-2 labels.  The one question left open: in the sloppy regime itself —
the reference's own k-fold recipe (conf 0.1, NMS IoU 0.9,
kfold_train_and_pseudo.py:115-128), where the self-trained calibrator
demonstrably improves matched pairs — does that IoU gain cash out as
detector mAP?  This script answers it with a detector-level number:

  1. (Re)train the self-calibrator on OUR k-fold pairs
     (runs/kfold_r2/cgan_pairs; round 2 measured val dIoU +0.068 on these
     but the checkpoint died with a workspace reset).
  2. Calibrate the k-fold merged pseudo labels of the 500 train images.
  3. Build two training trees over the same images/boxes differing ONLY in
     box geometry: raw k-fold boxes vs calibrated boxes (both filtered at
     the same confidence, conf column stripped).
  4. Train an identical detector on each; report val mAP50 for both.

Every stage is artifact-gated and resume-safe.  Output:
runs/ab_calib/result.json {raw_map50, calibrated_map50, delta}.
Reference parity: stage 4 of plan.md:87-95 (cgan/inference.py applied to
pseudo-labels before the retrain).
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DATA = Path("/root/reference/datasets/500_100_100")
PAIRS = Path("runs/kfold_r2/cgan_pairs")
MERGED = Path("runs/kfold_r2/merged_pseudo/labels")
WORK = Path("runs/ab_calib")
CALIB_DIR = Path("runs/calib_self2")
CALIB_RELEASE = Path("weights/calibrator_self_g.msgpack.gz")


def say(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def filter_and_strip(src_dir: Path, dst_dir: Path, conf_thr: float) -> int:
    """Keep rows with conf >= thr; write training-format rows (no conf)."""
    dst_dir.mkdir(parents=True, exist_ok=True)
    kept = 0
    for txt in sorted(src_dir.glob("*.txt")):
        rows = []
        for line in txt.read_text().splitlines():
            p = line.split()
            if len(p) >= 6 and float(p[5]) < conf_thr:
                continue
            if p:
                rows.append(" ".join(p[:5]))
        (dst_dir / txt.name).write_text("\n".join(rows) + ("\n" if rows else ""))
        kept += len(rows)
    return kept


def link_images(labels_dir: Path, tree_dir: Path) -> int:
    """images/ of the tree = train images that have a label file."""
    img_dir = tree_dir / "images"
    img_dir.mkdir(parents=True, exist_ok=True)
    n = 0
    for txt in sorted(labels_dir.glob("*.txt")):
        src = DATA / "train" / "images" / f"{txt.stem}.jpg"
        dst = img_dir / src.name
        if src.exists() and not dst.exists():
            os.symlink(src, dst)
        n += dst.exists()
    return n


def main():
    import jax

    from gcssl_tpu.core.config import (
        CalibratorConfig, DetectorConfig, apply_overrides, load_config,
    )

    o = {}
    for kv in sys.argv[1:]:
        k, v = kv.split("=", 1)
        try:
            v = json.loads(v)
        except json.JSONDecodeError:
            pass
        o[k] = v
    conf_thr = float(o.pop("conf_thr", 0.25))
    calib_epochs = int(o.pop("calib_epochs", 200))
    det_epochs = int(o.pop("det_epochs", 150))
    init_from = o.pop(
        "init_from",
        "runs/mae_11k_m/backbone.msgpack"
        if Path("runs/mae_11k_m/backbone.msgpack").exists()
        else "weights/mae_backbone_m.msgpack.gz",
    )
    det_cfg = apply_overrides(DetectorConfig(), {
        "width_mult": 0.75, "depth_mult": 0.67, "batch_size": 16,
        "lr": 5e-4, "epochs": det_epochs, "patience": 30,
        "aug_dtype": "bfloat16", **o,
    })
    WORK.mkdir(parents=True, exist_ok=True)

    # ---- 1. self-calibrator on our k-fold pairs ----
    ccfg_path = Path("configs/calibrator_r2.yaml")
    ccfg = load_config(str(ccfg_path)) if ccfg_path.exists() else CalibratorConfig()
    if not (CALIB_RELEASE.exists() or
            (CALIB_DIR / "best.msgpack").exists()):
        from dataclasses import replace

        from gcssl_tpu.data.calibrator import load_or_build
        from gcssl_tpu.train.wgan_gp import train_calibrator

        if not (PAIRS / "images").exists():
            os.symlink(DATA / "train" / "images", PAIRS / "images")
        say(f"training self-calibrator on {PAIRS} ({calib_epochs} ep)...")
        arrays = load_or_build(
            PAIRS, ccfg.data.iou_threshold, ccfg.data.img_size,
            ccfg.data.canvas_size, cache_dir=WORK / "pair_cache",
            skip_patches=ccfg.data.device_patches,
        )
        say(f"pairs: {len(arrays)}")
        tcfg = replace(ccfg.train, n_epochs=calib_epochs,
                       save_dir=str(CALIB_DIR))
        ccfg = replace(ccfg, train=tcfg)
        train_calibrator(
            ccfg, arrays, resume=True, release_path=CALIB_RELEASE,
            log_fn=lambda r: r["epoch"] % 20 == 0
            and say(f"calib ep {r['epoch']} dIoU {r.get('delta_iou', 0):.4f}"),
        )
    say("self-calibrator ready")

    # ---- 2. calibrate the merged k-fold labels ----
    cal_labels = WORK / "labels_calibrated"
    if not (cal_labels / ".done").exists():
        from gcssl_tpu.pipeline.calibrate import (
            calibrate_tree, load_calibrator_from_checkpoint,
        )

        src = CALIB_DIR if (CALIB_DIR / "best.msgpack").exists() else CALIB_RELEASE
        cal = load_calibrator_from_checkpoint(src, cfg=ccfg, max_boxes=128)
        say(f"calibrating {MERGED} with {src}...")
        n = calibrate_tree(cal, DATA / "train" / "images", MERGED, cal_labels)
        say(f"calibrated {n} boxes")
        (cal_labels / ".done").write_text(str(n))

    # ---- 3. arm trees ----
    arms = {}
    for arm, src in (("raw", MERGED), ("calibrated", cal_labels)):
        tree = WORK / f"tree_{arm}"
        if not (tree / ".done").exists():
            kept = filter_and_strip(src, tree / "labels", conf_thr)
            n_img = link_images(tree / "labels", tree)
            say(f"arm {arm}: {kept} boxes over {n_img} images (conf>={conf_thr})")
            (tree / ".done").write_text(f"{kept} {n_img}")
        else:
            # images/ are symlinks under runs/**/images/ (gitignored): a
            # workspace reset deletes them while labels + .done survive —
            # re-link unconditionally (idempotent) so the arm never trains
            # on an empty tree (round-2 loop_m corruption class)
            n_img = link_images(tree / "labels", tree)
            n_lbl = len(list((tree / "labels").glob("*.txt")))
            if n_img != n_lbl:
                raise RuntimeError(
                    f"arm {arm}: {n_lbl} labels but only {n_img} images "
                    f"re-linked under {tree}"
                )
        arms[arm] = tree

    # ---- 4. train both arms ----
    result = {}
    for arm, tree in arms.items():
        run_dir = WORK / f"det_{arm}"
        best_meta = run_dir / "best.json"
        marker = run_dir / ".ab_done"
        if not marker.exists():
            from gcssl_tpu.pipeline.iterate import retrain_on_merged

            say(f"training arm {arm} ({det_epochs} ep)...")
            _, _, hist = retrain_on_merged(
                det_cfg, tree, DATA / "val", run_dir,
                log_fn=lambda r: r["epoch"] % 10 == 0
                and say(f"{arm} ep {r['epoch']} map50 {r.get('map50', -1):.4f}"),
                init_from=init_from, resume=True,
            )
            marker.write_text("done")
        meta = json.loads(best_meta.read_text()) if best_meta.exists() else {}
        result[f"{arm}_map50"] = meta.get("map50")
        result[f"{arm}_epoch"] = meta.get("epoch")

    result["delta_map50"] = (
        round(result["calibrated_map50"] - result["raw_map50"], 4)
        if result.get("calibrated_map50") is not None
        and result.get("raw_map50") is not None else None
    )
    result["conf_thr"] = conf_thr
    (WORK / "result.json").write_text(json.dumps(result, indent=1))
    say(f"A/B RESULT: {json.dumps(result)}")


if __name__ == "__main__":
    main()
