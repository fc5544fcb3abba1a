"""Stratified calibration A/B (VERDICT r4 #5): apply the GAN calibrator
only where it helps, detector-level comparison against the raw arm.

Usage: python scripts/ab_stratified_calib.py [key=value ...]

Round-4 closed the all-boxes question: calibrating EVERY k-fold pseudo-box
was a wash at the detector level (raw 0.4374 vs calibrated 0.4375,
runs/ab_calib/result.json).  The one follow-up: the calibrator's gain is
concentrated in strata (low-conf / small / crowded boxes — the sloppy tail
its WGAN pairs over-represent), and calibrating the good boxes hurts them
(regression-to-the-mean).  This script:

  1. Fits a stratum rule from OBSERVABLE features only (confidence,
     sqrt-area, max-overlap with same-image boxes) on the k-fold train
     pool, where GT is known: keep calibrated geometry in buckets whose
     mean per-box IoU delta vs GT is positive with support >= min_n.
  2. Builds a mixed label tree: calibrated geometry in winning buckets,
     raw elsewhere (same files, same boxes, same conf column).
  3. Trains ONE detector arm with settings identical to the round-4 A/B
     (same epochs/patience/conf/init) and compares val mAP50 to the
     recorded raw arm.

Reference contract: cgan/inference.py:94-180 (stage-4 calibration applied
before the retrain).  Output: runs/ab_calib_strat/result.json.
"""

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DATA = Path("/root/reference/datasets/500_100_100")
MERGED = Path("runs/kfold_r2/merged_pseudo/labels")   # raw k-fold labels
CAL = Path("runs/ab_calib/labels_calibrated")         # all-boxes calibrated
GT = DATA / "train" / "labels"
RAW_RESULT = Path("runs/ab_calib/result.json")
WORK = Path("runs/ab_calib_strat")


def say(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def iou_mat(a, b):
    ax1, ay1 = a[:, 0] - a[:, 2] / 2, a[:, 1] - a[:, 3] / 2
    ax2, ay2 = a[:, 0] + a[:, 2] / 2, a[:, 1] + a[:, 3] / 2
    bx1, by1 = b[:, 0] - b[:, 2] / 2, b[:, 1] - b[:, 3] / 2
    bx2, by2 = b[:, 0] + b[:, 2] / 2, b[:, 1] + b[:, 3] / 2
    ix = np.maximum(0, np.minimum(ax2[:, None], bx2[None]) - np.maximum(ax1[:, None], bx1[None]))
    iy = np.maximum(0, np.minimum(ay2[:, None], by2[None]) - np.maximum(ay1[:, None], by1[None]))
    inter = ix * iy
    ua = (ax2 - ax1) * (ay2 - ay1)
    ub = (bx2 - bx1) * (by2 - by1)
    return inter / np.maximum(ua[:, None] + ub[None] - inter, 1e-9)


CONF_EDGES = [0.0, 0.3, 0.6, 1.01]
SIZE_EDGES = [0.0, 0.10, 0.25, 10.0]
OVL_EDGES = [0.0, 0.10, 1.01]


def bucket_of(conf, size, ovl) -> tuple[int, int, int]:
    return (int(np.digitize(conf, CONF_EDGES) - 1),
            int(np.digitize(size, SIZE_EDGES) - 1),
            int(np.digitize(ovl, OVL_EDGES) - 1))


def load_rows(path: Path):
    """YOLO rows as (cls, box4, conf|None) keeping file order."""
    rows = []
    for line in path.read_text().splitlines():
        p = line.split()
        if len(p) >= 5:
            rows.append((p[0], np.asarray(list(map(float, p[1:5]))),
                         float(p[5]) if len(p) > 5 else None))
    return rows


def main() -> int:
    o = dict(kv.split("=", 1) for kv in sys.argv[1:])
    min_n = int(o.pop("min_n", 50))
    det_epochs = int(o.pop("det_epochs", 100))
    patience = int(o.pop("patience", 25))
    conf_thr = float(o.pop("conf_thr", 0.25))
    WORK.mkdir(parents=True, exist_ok=True)

    if not (CAL.exists() and MERGED.exists()):
        say(f"missing inputs: {MERGED} / {CAL} — run the round-4 A/B first")
        return 2

    # ---- 1. fit the stratum rule on observable features ----
    rule_path = WORK / "strata.json"
    if not rule_path.exists():
        stats: dict[tuple, list] = {}
        n_boxes = 0
        for f in sorted(MERGED.glob("*.txt")):
            g, c = GT / f.name, CAL / f.name
            if not (g.exists() and c.exists()):
                continue
            raw = load_rows(f)
            cal = load_rows(c)
            grows = load_rows(g)
            if not raw or not grows or len(raw) != len(cal):
                continue
            rb = np.stack([r[1] for r in raw])
            cb = np.stack([r[1] for r in cal])
            gb = np.stack([r[1] for r in grows])
            m = iou_mat(rb, gb)
            j = m.argmax(1)
            riou = m.max(1)
            ciou = iou_mat(cb, gb)[np.arange(len(cb)), j]
            self_iou = iou_mat(rb, rb)
            np.fill_diagonal(self_iou, 0.0)
            ovl = self_iou.max(1) if len(rb) > 1 else np.zeros(len(rb))
            for k in range(len(raw)):
                conf = raw[k][2] if raw[k][2] is not None else 1.0
                size = float(np.sqrt(max(rb[k, 2] * rb[k, 3], 0.0)))
                b = bucket_of(conf, size, float(ovl[k]))
                stats.setdefault(b, []).append(float(ciou[k] - riou[k]))
                n_boxes += 1
        rule = {}
        for b, deltas in sorted(stats.items()):
            d = np.asarray(deltas)
            rule[str(list(b))] = {
                "n": int(len(d)), "mean_delta_iou": round(float(d.mean()), 5),
                "use_calibrated": bool(len(d) >= min_n and d.mean() > 0),
            }
        rule_path.write_text(json.dumps(
            {"edges": {"conf": CONF_EDGES, "size": SIZE_EDGES,
                       "ovl": OVL_EDGES},
             "min_n": min_n, "total_boxes": n_boxes, "buckets": rule},
            indent=1))
    rule = json.loads(rule_path.read_text())
    winning = [b for b, r in rule["buckets"].items() if r["use_calibrated"]]
    say(f"strata: {len(winning)}/{len(rule['buckets'])} buckets take the "
        f"calibrated box: {winning}")
    if not winning:
        (WORK / "result.json").write_text(json.dumps({
            "verdict": "no stratum helps — calibration transfer negative "
                       "at every observable stratum",
            "strata": rule,
        }, indent=1))
        say("no winning stratum; question closed negative")
        return 0

    # ---- 2. mixed label tree ----
    lab_dir = WORK / "labels_strat"
    if not (lab_dir / ".done").exists():
        lab_dir.mkdir(parents=True, exist_ok=True)
        n_cal = n_raw = 0
        for f in sorted(MERGED.glob("*.txt")):
            c = CAL / f.name
            if not c.exists():
                continue
            raw = load_rows(f)
            cal = load_rows(c)
            if len(raw) != len(cal):
                continue
            rb = np.stack([r[1] for r in raw]) if raw else np.zeros((0, 4))
            self_iou = iou_mat(rb, rb) if len(rb) else np.zeros((0, 0))
            if len(rb):
                np.fill_diagonal(self_iou, 0.0)
            out = []
            for k, (cls, box, conf) in enumerate(raw):
                size = float(np.sqrt(max(box[2] * box[3], 0.0)))
                ovl = float(self_iou[k].max()) if len(rb) > 1 else 0.0
                b = bucket_of(conf if conf is not None else 1.0, size, ovl)
                use_cal = rule["buckets"].get(str(list(b)), {}).get(
                    "use_calibrated", False)
                geom = cal[k][1] if use_cal else box
                n_cal += use_cal
                n_raw += not use_cal
                row = [cls] + [f"{v:.6f}" for v in geom]
                if conf is not None:
                    row.append(f"{conf:.6f}")
                out.append(" ".join(row))
            (lab_dir / f.name).write_text(
                "\n".join(out) + ("\n" if out else ""))
        (lab_dir / ".done").write_text(f"{n_cal} calibrated, {n_raw} raw")
    say(f"mixed tree: {(lab_dir / '.done').read_text()}")

    # ---- 3. train the stratified arm (settings identical to round-4 A/B) --
    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from ab_calibrated_retrain import filter_and_strip, link_images

    tree = WORK / "tree_strat"
    if not (tree / ".done").exists():
        kept = filter_and_strip(lab_dir, tree / "labels", conf_thr)
        n_img = link_images(tree / "labels", tree)
        say(f"strat arm: {kept} boxes over {n_img} images (conf>={conf_thr})")
        (tree / ".done").write_text(f"{kept} {n_img}")
    else:
        n_img = link_images(tree / "labels", tree)
        n_lbl = len(list((tree / "labels").glob("*.txt")))
        if n_img != n_lbl:
            raise RuntimeError(f"strat arm: {n_lbl} labels, {n_img} images")

    from gcssl_tpu.core.config import DetectorConfig, apply_overrides

    init_from = ("runs/mae_11k_m/backbone.msgpack"
                 if Path("runs/mae_11k_m/backbone.msgpack").exists()
                 else "weights/mae_backbone_m.msgpack.gz")
    det_cfg = apply_overrides(DetectorConfig(), {
        "width_mult": 0.75, "depth_mult": 0.67, "batch_size": 16,
        "lr": 5e-4, "epochs": det_epochs, "patience": patience,
        "aug_dtype": "bfloat16", **{k: json.loads(v) if v[:1].isdigit() else v
                                    for k, v in o.items()},
    })
    run_dir = WORK / "det_strat"
    if not (run_dir / ".ab_done").exists():
        from gcssl_tpu.pipeline.iterate import retrain_on_merged

        say(f"training stratified arm ({det_epochs} ep)...")
        retrain_on_merged(
            det_cfg, tree, DATA / "val", run_dir,
            log_fn=lambda r: r["epoch"] % 10 == 0
            and say(f"strat ep {r['epoch']} map50 {r.get('map50', -1):.4f}"),
            init_from=init_from, resume=True,
        )
        (run_dir / ".ab_done").write_text("done")

    meta = json.loads((run_dir / "best.json").read_text())
    raw = json.loads(RAW_RESULT.read_text()) if RAW_RESULT.exists() else {}
    result = {
        "strat_map50": meta.get("map50"), "strat_epoch": meta.get("epoch"),
        "raw_map50": raw.get("raw_map50"),
        "all_calibrated_map50": raw.get("calibrated_map50"),
        "delta_vs_raw": (round(meta["map50"] - raw["raw_map50"], 4)
                         if raw.get("raw_map50") else None),
        "winning_buckets": winning,
        "conf_thr": conf_thr,
    }
    (WORK / "result.json").write_text(json.dumps(result, indent=1))
    say(f"RESULT: {json.dumps(result)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
