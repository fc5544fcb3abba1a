"""A/B the detector train step's throughput levers on real hardware.

Usage: python scripts/ab_det_step.py [out.json]

Variants (same m-scale arch unless noted):
  base16      — the round-2 recipe: batch 16, mosaic on (bf16 compute)
  base32      — batch 32 (MXU utilization vs the reference-matching 16)
  no_mosaic   — batch 16, mosaic off (isolates the mosaic's cost share:
                4 full-res scale_and_translate resamples per sample in f32)

Each variant reports img/s and MFU (XLA cost-model FLOPs / step time /
v5e bf16 peak). Timings force remote completion with a scalar fetch
(the axon relay returns from block_until_ready early — see bench.py).
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def measure(cfg_kw, n_steps=20):
    import jax
    import jax.numpy as jnp

    from gcssl_tpu.core.config import DetectorConfig
    from gcssl_tpu.train.detector import (
        create_detector_state, make_detector_train_step,
    )
    from bench import _aot, peak_flops_bf16

    cfg = DetectorConfig(width_mult=0.75, depth_mult=0.67, **cfg_kw)
    state, model, tx = create_detector_state(cfg, jax.random.PRNGKey(0))
    step = make_detector_train_step(cfg, model, tx)

    b, s, mb = cfg.batch_size, cfg.img_size, cfg.max_boxes
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    images4 = jax.random.randint(ks[0], (b, 4, s, s, 3), 0, 255, jnp.uint8)
    wh = jax.random.uniform(ks[1], (b, 4, mb, 2), minval=0.05, maxval=0.3)
    cxy = jax.random.uniform(ks[2], (b, 4, mb, 2), minval=0.2, maxval=0.8)
    boxes4 = jnp.concatenate([cxy, wh], axis=-1)
    mask4 = jnp.broadcast_to(
        jnp.arange(mb)[None, None, :] < 8, (b, 4, mb)
    )
    weights = jnp.ones(b, jnp.float32)
    lr = jnp.float32(1e-3)
    # AOT-compile once (use_mosaic is static, so the compiled executable is
    # called without it); _aot also yields XLA cost-model FLOPs for MFU
    step_c, flops = _aot(step, state, images4, boxes4, mask4, weights, lr,
                         use_mosaic=cfg.mosaic)
    state, metrics = step_c(state, images4, boxes4, mask4, weights, lr)
    float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = step_c(state, images4, boxes4, mask4, weights, lr)
    float(metrics["loss"])
    dt = time.perf_counter() - t0
    out = {"imgs_per_sec": round(n_steps * b / dt, 1),
           "step_ms": round(dt / n_steps * 1e3, 1)}
    if flops:
        out["mfu"] = round(flops / (dt / n_steps) / peak_flops_bf16(), 4)
        out["tflops_per_step"] = round(flops / 1e12, 3)
    return out


def main():
    out_path = Path(sys.argv[1]) if len(sys.argv) > 1 else Path(
        "runs/det_m_mae/ab_step.json"
    )
    results = {}
    variants = [
        ("base16", dict(batch_size=16)),
        ("base32", dict(batch_size=32)),
        ("no_mosaic", dict(batch_size=16, mosaic=False)),
        ("aug_bf16", dict(batch_size=16, aug_dtype="bfloat16")),
        ("copy_paste", dict(batch_size=16, copy_paste=0.5)),
        ("aug_bf16_cp", dict(batch_size=16, aug_dtype="bfloat16",
                             copy_paste=0.5)),
    ]
    for name, kw in variants:
        results[name] = measure(kw)
        print(f"{name}: {results[name]}", flush=True)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text(json.dumps(results, indent=1))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
