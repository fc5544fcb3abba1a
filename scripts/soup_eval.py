"""Weight-space model soup of loop-chain students: average k same-init
releases, evaluate val mAP under the standard protocol.

Usage: python scripts/soup_eval.py out.json w1=weights/a.msgpack.gz [w2=...] \
           [alphas=0.5,0.5]

Both loop_m and loop_m2 retrains start from the SAME MAE backbone init
(scripts/run_loop_iter.py scratch regime), differing only in their pseudo-
label merges — the classic model-soup setting (Wortsman et al.: averaging
fine-tunes from one init often beats the best single model).  The
reference has no analogue; this is a pure capability add.  Eval protocol
matches pipeline/detect.evaluate_on defaults (conf 0.001 / NMS IoU 0.7 /
max_det 300 — the Ultralytics val contract, BASELINE.md).
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DATA = Path("/root/reference/datasets/500_100_100")


def main() -> int:
    import jax
    import numpy as np

    from gcssl_tpu.core.config import DetectorConfig
    from gcssl_tpu.core.release import load_release
    from gcssl_tpu.data.detection import load_detection_tree
    from gcssl_tpu.pipeline.detect import evaluate_on
    from gcssl_tpu.train.detector import create_detector_state, make_detector_predict

    out_path = Path(sys.argv[1])
    o = dict(kv.split("=", 1) for kv in sys.argv[2:])
    paths = [v for k, v in sorted(o.items()) if k.startswith("w")]
    alphas = [float(a) for a in o.get("alphas", "").split(",") if a] or None
    if alphas is None:
        alphas = [1.0 / len(paths)] * len(paths)
    assert len(alphas) == len(paths) and abs(sum(alphas) - 1.0) < 1e-6

    trees, metas = [], []
    for p in paths:
        params, meta = load_release(p)
        trees.append(params)
        metas.append({"path": p, "map50": meta.get("map50"),
                      "width_mult": meta.get("width_mult"),
                      "depth_mult": meta.get("depth_mult")})
    wm = float(metas[0].get("width_mult") or 0.75)
    dm = float(metas[0].get("depth_mult") or 0.67)
    # averaging weights across architectures is meaningless — refuse early
    assert all((m.get("width_mult") or wm, m.get("depth_mult") or dm)
               == (wm, dm) for m in metas), \
        f"soup members differ in (width, depth): {metas}"
    cfg = DetectorConfig(width_mult=wm, depth_mult=dm, batch_size=16)

    def avg(*leaves):
        acc = sum(a * np.asarray(l, np.float32) for a, l in zip(alphas, leaves))
        return acc.astype(np.asarray(leaves[0]).dtype) \
            if np.asarray(leaves[0]).dtype != np.float32 else acc

    soup = jax.tree.map(avg, *trees)
    _, model, _ = create_detector_state(cfg, jax.random.PRNGKey(0))
    predict = make_detector_predict(cfg, model, max_out=300, pre_nms_topk=700)
    val = load_detection_tree(DATA / "val", cfg.img_size, cfg.max_boxes)

    t0 = time.time()
    results = {"members": metas, "alphas": alphas}
    m = evaluate_on(predict, soup, val)
    results["soup"] = {"map50": m.map50, "map50_95": m.map50_95,
                      "precision": m.precision, "recall": m.recall}
    results["wall_s"] = round(time.time() - t0, 1)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text(json.dumps(results, indent=1))
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
