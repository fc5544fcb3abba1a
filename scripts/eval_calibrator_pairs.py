"""Raw-GT calibration gain over ALL matched pairs of the reference pool.

Loads the cached pair pack (the same 18,523-pair index the reference's
CalibratorDataset builds from datasets/500_100_100/cgan — dataset.py:128-153),
runs the trained G (EMA weights) on every pred patch, applies the
inference-clamped delta (inference.py:60-88 semantics) and reports mean IoU
vs GT before/after.  This is the VERDICT #6 acceptance number: the gain the
calibrator delivers on the full pool, not just its val split.

Usage: python scripts/eval_calibrator_pairs.py <ckpt_dir> [config.yaml]
Prints one JSON line.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gcssl_tpu.core.checkpoint import CheckpointManager
    from gcssl_tpu.core.config import CalibratorConfig, load_config
    from gcssl_tpu.data.calibrator import load_or_build
    from gcssl_tpu.ops.boxes import delta_apply, iou_elementwise
    from gcssl_tpu.train import create_train_state
    from gcssl_tpu.train.wgan_gp import _canvas_crop, eval_g_params

    ckpt_dir = sys.argv[1]
    cfg = (
        load_config(sys.argv[2])
        if len(sys.argv) > 2 and Path(sys.argv[2]).exists()
        else CalibratorConfig()
    )
    arrays = load_or_build(
        "/root/reference/datasets/500_100_100/cgan",
        cfg.data.iou_threshold, cfg.data.img_size, cfg.data.canvas_size,
        cache_dir="/root/repo/.gcssl_cache", skip_patches=True,
    )
    state, g_model, _ = create_train_state(cfg, jax.random.PRNGKey(0))
    mgr = CheckpointManager(ckpt_dir)
    which = "best" if mgr.exists("best") else "last"
    state = mgr.restore(which, jax.device_get(state))
    g_params = jax.device_put(eval_g_params(cfg, state))
    s = cfg.data.img_size

    canvases = jax.device_put(arrays.canvases)
    canvas_wh = jax.device_put(arrays.canvas_wh)

    @jax.jit
    def run(g_params, pred_box, gt_box, ci, canvases, canvas_wh):
        cv = canvases[ci]
        wh = canvas_wh[ci]
        patch = _canvas_crop(cv, wh, pred_box, s)
        delta = g_model.apply({"params": g_params}, patch)
        refined = delta_apply(pred_box, delta, training=False)
        return (
            iou_elementwise(pred_box, gt_box),
            iou_elementwise(refined, gt_box),
        )

    n = len(arrays.delta)
    bs = 256
    before = np.zeros(n, np.float64)
    after = np.zeros(n, np.float64)
    for i in range(0, n, bs):
        sl = slice(i, min(i + bs, n))
        pb = jnp.asarray(arrays.pred_box[sl])
        gb = jnp.asarray(arrays.gt_box[sl])
        ci = jnp.asarray(arrays.canvas_idx[sl])
        # pad final batch to the jit shape
        pad = bs - (sl.stop - sl.start)
        if pad:
            pb = jnp.pad(pb, ((0, pad), (0, 0)))
            gb = jnp.pad(gb, ((0, pad), (0, 0)))
            ci = jnp.pad(ci, (0, pad))
        b, a = run(g_params, pb, gb, ci, canvases, canvas_wh)
        before[sl] = np.asarray(b)[: sl.stop - sl.start]
        after[sl] = np.asarray(a)[: sl.stop - sl.start]
    print(json.dumps({
        "ckpt": str(ckpt_dir), "which": which, "pairs": n,
        "mean_iou_before": round(float(before.mean()), 4),
        "mean_iou_after": round(float(after.mean()), 4),
        "gain": round(float((after - before).mean()), 4),
        "frac_improved": round(float(((after - before) > 0).mean()), 4),
    }))


if __name__ == "__main__":
    main()
