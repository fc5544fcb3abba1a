"""Re-score detector releases on val (or another split) under BOTH AP formulas.

Usage: python scripts/rescore_val.py out.json w=weights/a.msgpack.gz [w=...]
           [split=val|test]

The committed history's map50/map50_95 numbers use strict 101-point
right-step AP (eval/map.py:_ap_from_pr).  The reference's headline numbers
(result/person/results.csv: 0.5666 / 0.2088) are Ultralytics numbers —
trapz over the linearly-interpolated PR envelope with a (0, 1.0) sentinel
(_ap_ultralytics), which reads systematically higher on identical
predictions.  This script puts our models on the reference's own scale:
one val predict pass per release, both formulas from the same predictions.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DATA = Path("/root/reference/datasets/500_100_100")


def main() -> int:
    import jax

    from gcssl_tpu.core.config import DetectorConfig
    from gcssl_tpu.core.release import load_release
    from gcssl_tpu.data.detection import load_detection_tree
    from gcssl_tpu.pipeline.detect import evaluate_on
    from gcssl_tpu.train.detector import create_detector_state, make_detector_predict

    out_path = Path(sys.argv[1])
    paths = [a.split("=", 1)[1] for a in sys.argv[2:] if a.startswith("w=")]
    split = next((a.split("=", 1)[1] for a in sys.argv[2:]
                  if a.startswith("split=")), "val")

    rows = []
    predict = model = None
    cfg = None
    val = None
    for p in paths:
        params, meta = load_release(p)
        wm = float(meta.get("width_mult") or 0.75)
        dm = float(meta.get("depth_mult") or 0.67)
        if cfg is None or (cfg.width_mult, cfg.depth_mult) != (wm, dm):
            cfg = DetectorConfig(width_mult=wm, depth_mult=dm, batch_size=16)
            _, model, _ = create_detector_state(cfg, jax.random.PRNGKey(0))
            predict = make_detector_predict(cfg, model, max_out=300,
                                            pre_nms_topk=700)
            val = load_detection_tree(DATA / split, cfg.img_size, cfg.max_boxes)
        t0 = time.time()
        m = evaluate_on(predict, params, val)
        rows.append({
            "release": p, "release_map50_meta": meta.get("map50"),
            "map50_strict": m.map50, "map50_95_strict": m.map50_95,
            "map50_ultralytics": m.map50_u, "map50_95_ultralytics": m.map50_95_u,
            "wall_s": round(time.time() - t0, 1),
        })
        print(json.dumps(rows[-1]), flush=True)
    ref = {"map50": 0.5666, "map50_95": 0.2088,
           "source": "/root/reference/result/person/results.csv rows 86/102 "
                     "(Ultralytics-formula numbers; VAL-split numbers — the "
                     "reference never reports test)"}
    out = {"reference": ref, "split": split, "models": rows}
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
