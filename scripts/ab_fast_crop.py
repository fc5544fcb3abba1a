"""A/B the Pallas fused crop producer inside the real fused WGAN-GP step.

Runs the exact round-2 recipe step (device_patches, critic flip aug, EMA)
on the real cached pack with train.fast_crop off vs on, same shapes as
training (batch 128, n_critic 2), and prints one JSON line with both
throughputs.  Decides VERDICT #7: ship on-by-default only on a real win.

Usage: python scripts/ab_fast_crop.py [steps]
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def bench(fast: bool, arrays, steps: int) -> float:
    import jax
    import jax.numpy as jnp

    from gcssl_tpu.core.config import apply_overrides, load_config
    from gcssl_tpu.train.wgan_gp import DeviceData, create_train_state, make_train_step

    cfg = load_config("configs/calibrator_r2.yaml")
    cfg = apply_overrides(cfg, {"train.fast_crop": fast})
    state, g_model, d_model = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(cfg, g_model, d_model)
    data = DeviceData.from_arrays(arrays, device_patches=cfg.data.device_patches)
    b = cfg.train.batch_size
    n = int(data.delta.shape[0])
    idx = jnp.arange(b) % n
    w = jnp.ones((b,), jnp.float32)
    lr = jnp.asarray(cfg.train.lr, jnp.float32)

    # NOTE: on the axon-tunneled TPU block_until_ready returns before remote
    # execution completes — a scalar fetch is the only reliable fence
    # (same methodology as bench.py).
    state, m = step(state, data, idx, w, lr)  # compile
    float(m["loss_G"])
    t0 = time.perf_counter()
    for i in range(steps):
        state, m = step(state, data, (idx + i * b) % n, w, lr)
    float(m["loss_G"])  # chained through every step's donated state
    dt = (time.perf_counter() - t0) / steps
    del state
    return b / dt


def main():
    from gcssl_tpu.data.calibrator import load_or_build

    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    arrays = load_or_build(
        "/root/reference/datasets/500_100_100/cgan",
        0.25, 128, 448,
        cache_dir="/root/repo/.gcssl_cache", skip_patches=True,
    )
    slow = bench(False, arrays, steps)
    fast = bench(True, arrays, steps)
    print(json.dumps({
        "metric": "fast_crop_ab",
        "imgs_per_sec_pure_jax": round(slow, 1),
        "imgs_per_sec_pallas": round(fast, 1),
        "speedup": round(fast / slow, 4),
    }))


if __name__ == "__main__":
    main()
