"""A/B detector eval across TTA variants: plain / hflip / +fuse / +scales.

Usage: python scripts/eval_tta_variants.py <weights(.gz|ckpt dir)> <out.json>
           [key=value overrides: width_mult, depth_mult, data_dir, scales]

Measures val mAP50/50-95 for each inference-time variant on the same
weights so eval-time wins (weighted box fusion — ops/nms.py:nms_fused,
multi-scale TTA — train/detector.py:make_detector_predict) can be enabled
where they pay. The reference's only eval-time option is Ultralytics
augment=True (hflip+scale TTA with plain NMS merging).
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DATA = Path("/root/reference/datasets/500_100_100")


def main():
    import jax

    from gcssl_tpu.core.checkpoint import CheckpointManager
    from gcssl_tpu.core.config import DetectorConfig, apply_overrides
    from gcssl_tpu.core.release import is_release_file, load_release
    from gcssl_tpu.data.detection import load_detection_tree
    from gcssl_tpu.pipeline.detect import evaluate_on
    from gcssl_tpu.train.detector import (
        create_detector_state,
        eval_params,
        make_detector_predict,
    )

    weights = sys.argv[1]
    out_path = Path(sys.argv[2])
    o = {}
    for kv in sys.argv[3:]:
        k, v = kv.split("=", 1)
        try:
            v = json.loads(v)
        except json.JSONDecodeError:
            pass
        o[k] = v
    data_dir = Path(o.pop("data_dir", str(DATA / "val")))
    scales = tuple(o.pop("scales", (0.75, 1.25)))
    only = o.pop("variants", None)  # e.g. variants='["tta_fuse"]'
    cfg = apply_overrides(DetectorConfig(), o)

    state, model, _ = create_detector_state(cfg, jax.random.PRNGKey(0))
    if is_release_file(weights):
        params, meta = load_release(weights)
        print(f"release weights: {meta}", flush=True)
    else:
        mgr = CheckpointManager(weights)
        which = "best" if mgr.exists("best") else "last"
        state = mgr.restore(which, jax.device_get(state))
        params = eval_params(cfg, state)
    params = jax.device_put(params)

    arrays = load_detection_tree(data_dir, cfg.img_size, cfg.max_boxes)
    print(f"val: {len(arrays)} images", flush=True)

    variants = {
        "plain": dict(tta=False, fuse=False, scales=()),
        "tta": dict(tta=True, fuse=False, scales=()),
        "tta_fuse": dict(tta=True, fuse=True, scales=()),
        "tta_scales": dict(tta=True, fuse=False, scales=scales),
        "tta_scales_fuse": dict(tta=True, fuse=True, scales=scales),
    }
    if only:
        variants = {k: variants[k] for k in only}
    results = json.loads(out_path.read_text()) if out_path.exists() else {}
    for name, v in variants.items():
        predict_fn = make_detector_predict(
            cfg, model, max_out=300, pre_nms_topk=700, tta_scales=v["scales"]
        )
        t0 = time.time()
        m = evaluate_on(predict_fn, params, arrays, tta=v["tta"], fuse=v["fuse"])
        results[name] = {
            "map50": m.map50, "map50_95": m.map50_95,
            "precision": m.precision, "recall": m.recall,
            "wall_s": round(time.time() - t0, 1),
        }
        print(f"{name}: map50 {m.map50:.4f} map50-95 {m.map50_95:.4f} "
              f"({results[name]['wall_s']}s)", flush=True)
        out_path.write_text(json.dumps(results, indent=1))
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
