"""Roofline profile of the fused WGAN-GP calibrator step (VERDICT r4 #7).

Usage: python scripts/profile_wgan_step.py [out_dir]

The calibrator train step measures MFU 0.4485 vs the detector's 0.501.
This script decides whether that is a fixable gap or the bandwidth-bound
ceiling, by measuring the SAME step (reference shapes: 128px patches,
batch 128, UNet G, n_critic 2) plus targeted ablations:

  full         the production step (G+D, GP, device re-crop from canvases)
  n_critic_1   marginal cost of one critic iteration (incl. its GP
               double-backward — lambda_gp=0 would NOT compile it out,
               the gp metric is a live output)
  small_canvas canvas_size 128 (vs 448): isolates the re-crop gather cost
  batch_256    if MFU rises with batch, the 128-batch step is
               launch/bandwidth-limited, not compute-saturated

For each variant: step wall time, XLA cost_analysis flops + bytes
accessed, MFU vs peak bf16, and HBM-bandwidth utilization vs the chip's
peak — the two roofline axes.  A jax.profiler trace of the full step is
saved for xprof/TensorBoard inspection.

Output: runs/profile_wgan/summary.json
"""

import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

PEAK_HBM_GBPS = {
    # public spec numbers, GB/s per chip
    "v5 lite": 819.0, "v5e": 819.0, "v5litepod": 819.0,
    "v4": 1228.0, "v5p": 2765.0, "v6 lite": 1640.0, "v6e": 1640.0,
}


def peak_hbm_bps() -> float:
    import jax

    kind = jax.devices()[0].device_kind.lower()
    for key, val in PEAK_HBM_GBPS.items():
        if key in kind:
            return val * 1e9
    return 819.0e9


def build_step(overrides: dict):
    import jax
    import jax.numpy as jnp

    from gcssl_tpu.core import CalibratorConfig, apply_overrides
    from gcssl_tpu.train import DeviceData, create_train_state, make_train_step

    cfg = apply_overrides(
        CalibratorConfig(),
        {"train.batch_size": 128, "train.n_critic": 2,
         "model.generator_type": "unet", **overrides},
    )
    state, g_model, d_model = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(cfg, g_model, d_model)

    n, m = 2048, 32
    s, c = cfg.data.img_size, cfg.data.canvas_size
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    boxes = jnp.concatenate(
        [jax.random.uniform(ks[0], (n, 2), minval=0.3, maxval=0.7),
         jax.random.uniform(ks[1], (n, 2), minval=0.15, maxval=0.4)], axis=1)
    data = DeviceData(
        pred_patch=jax.random.randint(ks[2], (n, s, s, 3), 0, 255, jnp.uint8),
        gt_patch=jax.random.randint(ks[3], (n, s, s, 3), 0, 255, jnp.uint8),
        delta=jax.random.normal(ks[4], (n, 4)) * 0.1,
        pred_box=boxes,
        gt_box=jnp.clip(boxes + jax.random.normal(ks[7], (n, 4)) * 0.02,
                        0.05, 0.95),
        canvas_idx=jax.random.randint(ks[5], (n,), 0, m, jnp.int32),
        canvases=jax.random.randint(ks[6], (m, c, c, 3), 0, 255, jnp.uint8),
        canvas_wh=jnp.tile(jnp.asarray([[640.0, 480.0]]), (m, 1)),
    )
    b = cfg.train.batch_size
    idx = jnp.arange(b, dtype=jnp.int32)
    w = jnp.ones(b, jnp.float32)
    return step, state, data, idx, w


def measure(name: str, overrides: dict, n_steps: int = 12) -> dict:
    import jax.numpy as jnp

    from bench import _aot, peak_flops_bf16

    step, state, data, idx, w = build_step(overrides)
    lr = jnp.float32(2e-4)
    compiled = step.lower(state, data, idx, w, lr).compile()
    flops = bytes_acc = None
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0)) or None
        bytes_acc = float(ca.get("bytes accessed", 0.0)) or None
    except Exception:
        pass
    state, metrics = compiled(state, data, idx, w, lr)
    float(metrics["loss_G"])  # force (tunnel: only D2H is trustworthy)
    dt = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            state, metrics = compiled(state, data, idx, w, lr)
        float(metrics["loss_G"])
        dt = min(dt, time.perf_counter() - t0)
    per_step = dt / n_steps
    rec = {"variant": name, "overrides": overrides,
           "step_ms": round(per_step * 1e3, 2),
           "imgs_per_sec": round(128 / per_step, 1)}
    if flops:
        rec["tflops_per_step"] = round(flops / 1e12, 3)
        rec["mfu"] = round(flops / per_step / peak_flops_bf16(), 4)
    if bytes_acc:
        rec["gbytes_accessed_per_step"] = round(bytes_acc / 1e9, 3)
        rec["hbm_bw_utilization"] = round(
            bytes_acc / per_step / peak_hbm_bps(), 4)
    print(json.dumps(rec), flush=True)
    return rec


def main() -> int:
    out_dir = Path(sys.argv[1] if len(sys.argv) > 1 else "runs/profile_wgan")
    out_dir.mkdir(parents=True, exist_ok=True)

    variants = [
        ("full", {}),
        ("n_critic_1", {"train.n_critic": 1}),
        ("small_canvas", {"data.canvas_size": 128}),
        ("batch_256", {"train.batch_size": 256}),
    ]
    rows = [measure(name, ov) for name, ov in variants]

    # profiler trace of the full step for xprof inspection
    try:
        import jax.numpy as jnp

        from gcssl_tpu.obs.profiling import profile_trace

        step, state, data, idx, w = build_step({})
        lr = jnp.float32(2e-4)
        state, m = step(state, data, idx, w, lr)
        float(m["loss_G"])
        with profile_trace(out_dir / "trace"):
            for _ in range(3):
                state, m = step(state, data, idx, w, lr)
            float(m["loss_G"])
        trace_ok = True
    except Exception as e:  # trace is best-effort on the tunneled backend
        print(f"trace failed: {e}", flush=True)
        trace_ok = False

    full = rows[0]
    verdict = {}
    if "mfu" in full and "hbm_bw_utilization" in full:
        bound = ("bandwidth" if full["hbm_bw_utilization"] > full["mfu"]
                 else "compute")
        verdict = {
            "bound": bound,
            "note": (f"full step: MFU {full['mfu']} vs HBM-BW utilization "
                     f"{full['hbm_bw_utilization']} — the larger axis is the "
                     "roofline wall"),
        }
    summary = {"variants": rows, "verdict": verdict, "trace": trace_ok,
               "measured_at": time.strftime("%Y-%m-%dT%H:%M:%S")}
    (out_dir / "summary.json").write_text(json.dumps(summary, indent=1))
    print(f"wrote {out_dir/'summary.json'}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
