"""Retrain-schedule A/B: short low-LR fine-tune vs the 300-epoch recipe.

Usage: python scripts/ft_retrain_ab.py [key=value ...]

Round-3 finding (VERDICT weak #3): the loop retrain peaked at epoch 15 of
300 (0.5587 mAP50, runs/loop_m/retrain/results.json) and then slid
monotonically — a warmup+cosine schedule sized for from-scratch training is
wrong for re-fitting a teacher-labeled 4,525-image merge.  This A/B holds
the DATA fixed (the exact runs/loop_m/merged tree that produced 0.5587) and
changes only the regime:

  scratch arm (already measured, round 3): MAE-backbone init, 300 ep,
      lr 5e-4 -> best 0.5587 @ ep15.
  ft arm (this script): full-detector init from the teacher that generated
      the labels (weights/detector_m_mae.msgpack.gz, 0.5365), short cosine
      (default 70 ep), lr 2e-4, late mosaic-off.

Output: runs/loop_m_ft/ab_result.json {ft_map50, scratch_map50, winner} —
read by scripts/run_loop_iter.py to pick the regime for loop_m2/m3.
Reference parity: the retrain step of plan.md:87-95; the reference reuses
its from-scratch recipe here too (train.py:11-22), which is exactly the
choice being tested.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DATA = Path("/root/reference/datasets/500_100_100")
MERGED = Path("runs/loop_m/merged")
WORK = Path("runs/loop_m_ft")
SCRATCH_RESULT = Path("runs/loop_m/loop_result.json")


def say(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    from gcssl_tpu.core.config import DetectorConfig, apply_overrides
    from gcssl_tpu.pipeline.iterate import retrain_on_merged

    o = {}
    for kv in sys.argv[1:]:
        k, v = kv.split("=", 1)
        try:
            v = json.loads(v)
        except json.JSONDecodeError:
            pass
        o[k] = v
    init_from = o.pop("init_from", "weights/detector_m_mae.msgpack.gz")
    cfg = apply_overrides(DetectorConfig(), {
        "width_mult": 0.75, "depth_mult": 0.67, "batch_size": 16,
        "lr": 2e-4, "epochs": 70, "patience": 70,
        "warmup_epochs": 2, "close_mosaic_epochs": 20,
        "aug_dtype": "bfloat16", **o,
    })

    # guard: the A/B is meaningless on a different tree than the scratch arm
    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from run_loop_r2 import pair_tree_ok, repair_pair_tree

    scratch = json.loads(SCRATCH_RESULT.read_text())
    expect = scratch["merged_images"]
    if not pair_tree_ok(MERGED, expect):
        say(f"merged tree invalid — repairing from dataset pools")
        # merged = 500 labeled train images + stage-2 pseudo images; both
        # source pools still exist, so stems resolve from either
        import shutil

        tmp_pool = WORK / "_pool"
        tmp_pool.mkdir(parents=True, exist_ok=True)
        for src in (DATA / "train" / "images", DATA / "unlabels" / "images"):
            for p in src.glob("*"):
                dst = tmp_pool / p.name
                if not dst.exists():
                    dst.symlink_to(p)
        ok = repair_pair_tree(MERGED, tmp_pool, expect)
        shutil.rmtree(tmp_pool)
        if not ok:
            raise RuntimeError(f"cannot reconstitute {MERGED} ({expect} pairs)")

    WORK.mkdir(parents=True, exist_ok=True)
    result_path = WORK / "ab_result.json"
    if not result_path.exists():
        say(f"ft arm: init={init_from} ep={cfg.epochs} lr={cfg.lr} "
            f"close_mosaic={cfg.close_mosaic_epochs}")
        t0 = time.time()
        _, _, hist = retrain_on_merged(
            cfg, MERGED, DATA / "val", WORK,
            log_fn=lambda r: r["epoch"] % 10 == 0
            and say(f"ft ep {r['epoch']} map50 {r.get('map50', -1):.4f}"),
            init_from=init_from, resume=True,
            release_path=Path("weights") / "detector_loop_m_ft.msgpack.gz",
        )
        meta = json.loads((WORK / "best.json").read_text())
        best_row = max(hist, key=lambda r: r.get("map50", -1)) if hist else {}
        result = {
            "ft_map50": meta.get("map50"),
            "ft_map50_95": best_row.get("map50_95"),
            "ft_epoch": meta.get("epoch"),
            "ft_wall_s": round(time.time() - t0, 1),
            "ft_epochs_budget": cfg.epochs,
            "ft_lr": cfg.lr,
            "scratch_map50": scratch["retrained_best_map50"],
            "scratch_epoch": scratch["retrained_best_epoch"],
        }
        result["winner"] = (
            "ft" if (result["ft_map50"] or 0) >= result["scratch_map50"]
            else "scratch"
        )
        result_path.write_text(json.dumps(result, indent=1))
    say(f"AB RESULT: {result_path.read_text()}")


if __name__ == "__main__":
    main()
