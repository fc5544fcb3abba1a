"""Polish fine-tune: short, cool LR pass of the BEST release on the newest
merge (fresh pseudo-label composition the weights never trained on).

Usage: python scripts/ft_polish.py [key=value ...]

Round-4 context: the protocol-matched gap to the reference teacher is
0.0016 mAP50 (loop_m 0.5650 vs 0.5666 Ultralytics-protocol,
runs/rescore_val.json) and the schedule A/B showed fine-tune gains arrive
in the first handful of epochs.  This stage spends ~25 min on a gentle
(lr 1e-4, 30 ep, mosaic mostly off) pass from the best weights over the
loop_m3 merge; both AP protocols are reported for whatever it finds.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DATA = Path("/root/reference/datasets/500_100_100")
MERGED = Path("runs/loop_m3/merged")
WORK = Path("runs/ft_polish")


def say(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main() -> int:
    import jax

    from gcssl_tpu.core.config import DetectorConfig, apply_overrides
    from gcssl_tpu.core.release import load_release
    from gcssl_tpu.data.detection import load_detection_tree
    from gcssl_tpu.pipeline.detect import evaluate_on
    from gcssl_tpu.pipeline.iterate import retrain_on_merged
    from gcssl_tpu.train.detector import create_detector_state, make_detector_predict

    o = dict(kv.split("=", 1) for kv in sys.argv[1:])
    init = o.pop("init", "weights/detector_loop_m.msgpack.gz")
    cfg = apply_overrides(DetectorConfig(), {
        "width_mult": 0.75, "depth_mult": 0.67, "batch_size": 16,
        "lr": float(o.pop("lr", 1e-4)), "epochs": int(o.pop("epochs", 30)),
        "patience": 30, "warmup_epochs": 1, "close_mosaic_epochs": 25,
        "aug_dtype": "bfloat16", **o,
    })

    # reset-safety: reconstitute the merged tree like the loop driver does
    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from run_loop_r2 import pair_tree_ok, repair_pair_tree

    if not pair_tree_ok(MERGED):
        import shutil

        tmp_pool = WORK / "_pool"
        tmp_pool.mkdir(parents=True, exist_ok=True)
        for src in (DATA / "train" / "images", DATA / "unlabels" / "images"):
            for p in src.glob("*"):
                dst = tmp_pool / p.name
                if not dst.exists():
                    dst.symlink_to(p)
        ok = repair_pair_tree(MERGED, tmp_pool)
        shutil.rmtree(tmp_pool)
        if not ok:
            say(f"cannot reconstitute {MERGED}; aborting")
            return 2

    WORK.mkdir(parents=True, exist_ok=True)
    result_path = WORK / "result.json"
    if not result_path.exists():
        say(f"polish: init={init} ep={cfg.epochs} lr={cfg.lr}")
        retrain_on_merged(
            cfg, MERGED, DATA / "val", WORK,
            log_fn=lambda r: r["epoch"] % 5 == 0
            and say(f"polish ep {r['epoch']} map50 {r.get('map50', -1):.4f}"),
            init_from=init, resume=True,
            release_path=Path("weights") / "detector_polish.msgpack.gz",
        )
        # re-score the best checkpoint under BOTH AP protocols
        params, meta = load_release(Path("weights/detector_polish.msgpack.gz"))
        _, model, _ = create_detector_state(cfg, jax.random.PRNGKey(0))
        predict = make_detector_predict(cfg, model, max_out=300, pre_nms_topk=700)
        val = load_detection_tree(DATA / "val", cfg.img_size, cfg.max_boxes)
        m = evaluate_on(predict, params, val)
        result = {
            "init": init, "epochs": cfg.epochs, "lr": cfg.lr,
            "best_epoch": meta.get("epoch"),
            "map50_strict": m.map50, "map50_95_strict": m.map50_95,
            "map50_ultralytics": m.map50_u,
            "map50_95_ultralytics": m.map50_95_u,
            "reference": {"map50": 0.5666, "map50_95": 0.2088},
        }
        result_path.write_text(json.dumps(result, indent=1))
    say(f"POLISH RESULT: {result_path.read_text()}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
