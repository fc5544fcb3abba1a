"""Verify the predict-path leak fix: device-pinned params vs numpy tree."""

import gc
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DATA = Path("/root/reference/datasets/500_100_100")


def rss_gb():
    for line in open("/proc/self/status"):
        if line.startswith("VmRSS"):
            return int(line.split()[1]) / 1e6
    return -1.0


def say(msg):
    print(f"[{time.strftime('%H:%M:%S')}] RSS {rss_gb():6.2f} GB | {msg}",
          flush=True)


def main():
    iters = 32
    bs = 16

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gcssl_tpu.core.config import DetectorConfig, apply_overrides
    from gcssl_tpu.core.checkpoint import CheckpointManager
    from gcssl_tpu.data.detection import load_detection_tree, list_images
    from gcssl_tpu.train.detector import (
        create_detector_state,
        eval_params,
        make_detector_predict,
    )

    det_cfg = apply_overrides(
        DetectorConfig(), {"width_mult": 0.75, "depth_mult": 0.67}
    )
    state, model, _ = create_detector_state(det_cfg, jax.random.PRNGKey(0))
    mgr = CheckpointManager("runs/det_m_mae")
    state = mgr.restore("best", jax.device_get(state))
    params_np = eval_params(det_cfg, state)
    predict_fn = make_detector_predict(det_cfg, model, max_out=300,
                                       pre_nms_topk=700)
    say("teacher loaded (numpy tree)")

    paths = list_images(DATA / "unlabels" / "images")
    arrays = load_detection_tree(
        DATA / "unlabels" / "images", det_cfg.img_size, det_cfg.max_boxes,
        labels_dir="/nonexistent", image_list=paths[: iters * bs],
    )
    images_dev = jnp.asarray(arrays.images)
    imgs0 = images_dev[jnp.asarray(np.arange(bs))]

    params_dev = jax.device_put(params_np)
    r = predict_fn(params_dev, imgs0, 0.75, 0.4, True)
    jax.block_until_ready(r)
    del r
    gc.collect()
    say("compiled")

    r0, t0 = rss_gb(), time.time()
    for i in range(iters):
        imgs = images_dev[jnp.asarray(np.arange(i * bs, (i + 1) * bs))]
        out = jax.device_get(predict_fn(params_dev, imgs, 0.75, 0.4, True))
        del imgs, out
    gc.collect()
    say(f"pinned params x{iters}: {rss_gb()-r0:+.2f} GB ({time.time()-t0:.0f}s)")


if __name__ == "__main__":
    main()
