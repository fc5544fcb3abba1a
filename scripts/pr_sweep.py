"""Precision/recall vs confidence for a trained detector on the val split.

Usage: python scripts/pr_sweep.py <weights_dir> [out_json] [key=value ...]

The pseudo-labeling loop pays only if high-confidence predictions are
high-precision (the reference's conf 0.85 kept 12.8% of images —
Two-stage pseudo-labeling.py:7).  This measures, with TTA exactly as the
pseudo-labeler runs it, precision/recall at a threshold sweep so the loop's
conf_high is chosen from data rather than copied from the reference.
"""

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DATA = Path("/root/reference/datasets/500_100_100")


def greedy_match(pred, gt, iou_thr=0.5):
    """1:1 greedy by score order; returns matched flags for preds."""
    if len(pred) == 0:
        return np.zeros(0, bool)
    if len(gt) == 0:
        return np.zeros(len(pred), bool)
    p = np.asarray(pred, np.float32)
    g = np.asarray(gt, np.float32)
    p_xy = np.concatenate([p[:, :2] - p[:, 2:4] / 2, p[:, :2] + p[:, 2:4] / 2], 1)
    g_xy = np.concatenate([g[:, :2] - g[:, 2:4] / 2, g[:, :2] + g[:, 2:4] / 2], 1)
    tl = np.maximum(p_xy[:, None, :2], g_xy[None, :, :2])
    br = np.minimum(p_xy[:, None, 2:], g_xy[None, :, 2:])
    inter = np.prod(np.clip(br - tl, 0, None), -1)
    iou = inter / np.maximum(
        np.prod(p[:, 2:4], -1)[:, None] + np.prod(g[:, 2:4], -1)[None, :] - inter,
        1e-9,
    )
    taken = np.zeros(len(g), bool)
    matched = np.zeros(len(p), bool)
    for i in range(len(p)):
        j = int(np.argmax(np.where(taken, -1.0, iou[i])))
        if iou[i, j] >= iou_thr and not taken[j]:
            taken[j] = True
            matched[i] = True
    return matched


def main():
    import jax

    from gcssl_tpu.core.checkpoint import CheckpointManager
    from gcssl_tpu.core.config import DetectorConfig, apply_overrides
    from gcssl_tpu.data.detection import load_detection_tree, map_boxes_from_letterbox
    from gcssl_tpu.pipeline.detect import predict_arrays
    from gcssl_tpu.train.detector import (
        create_detector_state,
        eval_params,
        make_detector_predict,
    )

    weights_dir = sys.argv[1]
    out_json = sys.argv[2] if len(sys.argv) > 2 else f"{weights_dir}/pr_sweep.json"
    overrides = {}
    for kv in sys.argv[3:]:
        k, v = kv.split("=", 1)
        try:
            v = json.loads(v)
        except json.JSONDecodeError:
            pass
        overrides[k] = v
    tta = bool(overrides.pop("tta", True))
    fuse = bool(overrides.pop("fuse", False))
    cfg = apply_overrides(DetectorConfig(), overrides)

    from gcssl_tpu.core.release import is_release_file, load_release

    state, model, _ = create_detector_state(cfg, jax.random.PRNGKey(0))
    if is_release_file(weights_dir):
        params, _meta = load_release(weights_dir)
        params = jax.device_put(params)
    else:
        mgr = CheckpointManager(weights_dir)
        which = "best" if mgr.exists("best") else "last"
        state = mgr.restore(which, jax.device_get(state))
        params = eval_params(cfg, state)
    predict_fn = make_detector_predict(cfg, model, max_out=300, pre_nms_topk=700)

    val = load_detection_tree(str(DATA / "val"), cfg.img_size, cfg.max_boxes)
    # low floor threshold; sweep applied on scores afterwards
    boxes, scores = predict_arrays(
        predict_fn, params, val,
        conf_thr=0.05, iou_thr=0.45, tta=tta, fuse=fuse,
    )
    gts = [val.boxes[i][val.mask[i]] for i in range(len(val))]

    sweep = []
    for thr in [0.25, 0.4, 0.5, 0.6, 0.7, 0.75, 0.8, 0.85, 0.9, 0.92, 0.95]:
        tp = fp = fn = 0
        for b, s, g in zip(boxes, scores, gts):
            keep = s >= thr
            bb = b[keep][np.argsort(-s[keep])]
            m = greedy_match(bb, g)
            tp += int(m.sum())
            fp += int((~m).sum())
            fn += len(g) - int(m.sum())
        p = tp / max(1, tp + fp)
        r = tp / max(1, tp + fn)
        sweep.append({"conf": thr, "precision": round(p, 4),
                      "recall": round(r, 4), "tp": tp, "fp": fp, "fn": fn})
        print(sweep[-1], flush=True)
    Path(out_json).write_text(json.dumps(sweep, indent=1))


if __name__ == "__main__":
    main()
