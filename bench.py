"""Benchmark: fused WGAN-GP G+D train-step throughput on real TPU hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference's committed CGAN run processed its train split at
~53 images/sec on an RTX 2070 (run 3pffojdl: 6716 s for 24 epochs over
0.8 * 18,523 = 14,818 samples/epoch — /root/reference/cgan/wandb/
run-20250718_183815-3pffojdl/files/wandb-summary.json, matching
cgan/runs/exp/training_history.json).  Each "image" is one calibrator pair
through n_critic=2 critic updates + 1 generator update (reference step
semantics, cgan_train_enhanced.py:288-374).
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_IMGS_PER_SEC = 53.0  # RTX 2070, reference committed run


def main() -> None:
    import jax
    import jax.numpy as jnp

    from gcssl_tpu.core import CalibratorConfig, apply_overrides
    from gcssl_tpu.train import DeviceData, create_train_state, make_train_step

    cfg = apply_overrides(
        CalibratorConfig(),
        {
            # reference training shapes: 128x128 patches, batch 128, UNet G
            "train.batch_size": 128,
            "train.n_critic": 2,
            "model.generator_type": "unet",
        },
    )
    state, g_model, d_model = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(cfg, g_model, d_model)

    # synthetic resident dataset with realistic shapes — generated ON device
    # (the tunneled host->device path runs at ~1 MB/s; uploading 400 MB of
    # synthetic bytes would dominate the bench wall-time)
    n, m = 4096, 64
    s, c = cfg.data.img_size, cfg.data.canvas_size
    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 8)
    boxes = jnp.concatenate(
        [
            jax.random.uniform(ks[0], (n, 2), minval=0.3, maxval=0.7),
            jax.random.uniform(ks[1], (n, 2), minval=0.15, maxval=0.4),
        ],
        axis=1,
    )
    data = DeviceData(
        pred_patch=jax.random.randint(ks[2], (n, s, s, 3), 0, 255, jnp.uint8),
        gt_patch=jax.random.randint(ks[3], (n, s, s, 3), 0, 255, jnp.uint8),
        delta=jax.random.normal(ks[4], (n, 4)) * 0.1,
        pred_box=boxes,
        gt_box=jnp.clip(boxes + jax.random.normal(ks[7], (n, 4)) * 0.02, 0.05, 0.95),
        canvas_idx=jax.random.randint(ks[5], (n,), 0, m, jnp.int32),
        canvases=jax.random.randint(ks[6], (m, c, c, 3), 0, 255, jnp.uint8),
        canvas_wh=jnp.tile(jnp.asarray([[640.0, 480.0]]), (m, 1)),
    )
    rng = np.random.default_rng(0)

    b = cfg.train.batch_size
    w = jnp.ones(b, jnp.float32)
    lr = jnp.float32(2e-4)
    perm = rng.permutation(n)

    def batch_idx(i):
        sl = perm[(i * b) % (n - b) : (i * b) % (n - b) + b]
        return jnp.asarray(sl, jnp.int32)

    # warmup / compile.  NOTE: on the axon-tunneled TPU, block_until_ready
    # returns before remote execution completes — only a data fetch (D2H)
    # reliably forces it, so timings below always end with a scalar fetch.
    state, metrics = step(state, data, batch_idx(0), w, lr)
    float(metrics["loss_G"])

    n_steps = 30
    t0 = time.perf_counter()
    for i in range(1, n_steps + 1):
        state, metrics = step(state, data, batch_idx(i), w, lr)
    float(metrics["loss_G"])  # chained through every step's state
    dt = time.perf_counter() - t0

    imgs_per_sec = n_steps * b / dt
    print(
        json.dumps(
            {
                "metric": "calibrator_train_images_per_sec_per_chip",
                "value": round(imgs_per_sec, 2),
                "unit": "images/sec/chip (WGAN-GP G+D step, batch 128, n_critic 2)",
                "vs_baseline": round(imgs_per_sec / BASELINE_IMGS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
