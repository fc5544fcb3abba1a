"""Piecewise timing of the detector train step (MFU work, round 3).

Usage: python scripts/profile_det_step.py [key=value ...]

Times each stage of the fused step as its own jitted program on the real
chip: augmentation pipeline, model forward, forward+backward, optimizer
update, and TAL assignment — so the MFU gap (41% at round 2 on the m-arch)
can be attributed instead of guessed.  Writes runs/det_m_mae/profile.json.

The stage timings do not sum exactly to the fused step (XLA fuses across
stage boundaries inside the real step), but they bound where the time goes.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def timeit(fn, *args, n=20, fetch=None, **kw):
    """Median-free simple wall timing: warmup once, then n calls; a D2H
    fetch of ``fetch(out)`` forces remote completion (axon tunnel)."""
    out = fn(*args, **kw)
    _force(out if fetch is None else fetch(out))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    _force(out if fetch is None else fetch(out))
    return (time.perf_counter() - t0) / n * 1e3  # ms


def _force(x):
    """Force remote completion with a SCALAR D2H: device_get of a whole
    array drags it through the ~MB/s axon tunnel (a 39 MB image batch
    reads as ~250 ms/step of phantom time); a device-side sum reduces the
    fetch to 4 bytes while still fencing everything upstream."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(jnp.sum(leaf.astype(jnp.float32))))


def main():
    import jax
    import jax.numpy as jnp

    from bench import _aot, peak_flops_bf16
    from gcssl_tpu.core.config import DetectorConfig, apply_overrides
    from gcssl_tpu.models.detector import anchor_grid, decode_all, flat_logits
    from gcssl_tpu.train.assign import tal_assign
    from gcssl_tpu.train.detector import (
        augment_batch,
        create_detector_state,
        detection_loss_tal,
        make_detector_train_step,
        mosaic_batch,
    )

    o = {}
    for kv in sys.argv[1:]:
        k, v = kv.split("=", 1)
        try:
            v = json.loads(v)
        except json.JSONDecodeError:
            pass
        o[k] = v
    out_path = Path(o.pop("out", "runs/det_m_mae/profile.json"))
    cfg = apply_overrides(
        DetectorConfig(),
        {"batch_size": 16, "width_mult": 0.75, "depth_mult": 0.67,
         "aug_dtype": "bfloat16", **o},
    )
    state, model, tx = create_detector_state(cfg, jax.random.PRNGKey(0))

    b, s, mb = cfg.batch_size, cfg.img_size, cfg.max_boxes
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    images4 = jax.random.randint(ks[0], (b, 4, s, s, 3), 0, 255, jnp.uint8)
    wh = jax.random.uniform(ks[1], (b, 4, mb, 2), minval=0.05, maxval=0.3)
    cxy = jax.random.uniform(ks[2], (b, 4, mb, 2), minval=0.2, maxval=0.8)
    boxes4 = jnp.concatenate([cxy, wh], axis=-1)
    mask4 = jnp.broadcast_to(jnp.arange(mb)[None, None, :] < 8, (b, 4, mb))
    weights = jnp.ones(b, jnp.float32)
    lr = jnp.float32(1e-3)
    aug_dt = jnp.bfloat16 if cfg.aug_dtype == "bfloat16" else jnp.float32

    report = {"cfg": {"batch": b, "width": cfg.width_mult,
                      "depth": cfg.depth_mult, "aug_dtype": cfg.aug_dtype}}

    # ---- aug pipeline only (mosaic + photometric, bf16) ----
    @jax.jit
    def aug_only(rng, images4_u8, boxes4, mask4):
        imgs = images4_u8.astype(aug_dt) / jnp.asarray(255.0, aug_dt)
        r1, r2 = jax.random.split(rng)
        images, boxes, mask = mosaic_batch(
            r1, imgs, boxes4, mask4,
            zoom_range=(cfg.zoom_min, cfg.zoom_max),
            max_out_boxes=cfg.mosaic_max_boxes)
        return augment_batch(r2, images, boxes, mask)

    rng = jax.random.PRNGKey(2)
    aug_c, aug_flops = _aot(aug_only, rng, images4, boxes4, mask4)
    ms = timeit(aug_c, rng, images4, boxes4, mask4)
    report["aug_only"] = {"ms": round(ms, 2),
                          "tflops": round((aug_flops or 0) / 1e12, 3)}
    images, boxes, mask = aug_c(rng, images4, boxes4, mask4)
    images = images.astype(aug_dt)

    # ---- model forward only ----
    @jax.jit
    def fwd(params, images):
        return model.apply({"params": params}, images)

    fwd_c, fwd_flops = _aot(fwd, state.params, images)
    ms = timeit(fwd_c, state.params, images, fetch=lambda o: o[0][0])
    report["fwd_only"] = {"ms": round(ms, 2),
                          "tflops": round((fwd_flops or 0) / 1e12, 3),
                          "mfu": round((fwd_flops or 0) / (ms / 1e3)
                                       / peak_flops_bf16(), 4)}

    # ---- forward + loss (incl. TAL assignment), no grad ----
    def loss_fn(params, images, boxes, mask):
        outs = model.apply({"params": params}, images)
        cls_l, box_l = detection_loss_tal(
            outs, boxes, mask, cfg.img_size, weights,
            topk=cfg.tal_topk, cls_weight=cfg.cls_weight,
            box_weight=cfg.box_weight)
        return cls_l + box_l

    fl_c, fl_flops = _aot(jax.jit(loss_fn), state.params, images, boxes, mask)
    ms = timeit(fl_c, state.params, images, boxes, mask)
    report["fwd_loss"] = {"ms": round(ms, 2),
                          "tflops": round((fl_flops or 0) / 1e12, 3)}

    # ---- forward + backward (grads), no optimizer ----
    vg_c, vg_flops = _aot(jax.jit(jax.value_and_grad(loss_fn)),
                          state.params, images, boxes, mask)
    ms = timeit(vg_c, state.params, images, boxes, mask,
                fetch=lambda o: o[0])
    report["fwd_bwd"] = {"ms": round(ms, 2),
                         "tflops": round((vg_flops or 0) / 1e12, 3),
                         "mfu": round((vg_flops or 0) / (ms / 1e3)
                                      / peak_flops_bf16(), 4)}
    _, grads = vg_c(state.params, images, boxes, mask)

    # ---- optimizer + EMA only ----
    @jax.jit
    def opt_only(state, grads, lr):
        import optax

        updates, opt = tx.update(grads, state.opt, state.params)
        params = optax.apply_updates(
            state.params, jax.tree.map(lambda u: -lr * u, updates))
        ema = jax.tree.map(lambda e, p: e * 0.9995 + p * 0.0005,
                           state.ema_params, params)
        return state.replace(params=params, ema_params=ema, opt=opt)

    opt_c, _ = _aot(opt_only, state, grads, lr)
    ms = timeit(opt_c, state, grads, lr, fetch=lambda o: o.step)
    report["opt_ema_only"] = {"ms": round(ms, 2)}

    # ---- TAL assignment only (on precomputed dense preds) ----
    outs = fwd_c(state.params, images)
    scores, pboxes = decode_all(outs, cfg.img_size)
    anchors, _ = anchor_grid(cfg.img_size)
    probs = scores[..., 0]

    @jax.jit
    def assign_only(pboxes, probs, boxes, mask):
        return jax.vmap(
            lambda pb, pp, gb, gm: tal_assign(pb, pp, gb, gm, anchors,
                                              topk=cfg.tal_topk)
        )(pboxes, probs, boxes, mask)

    as_c, _ = _aot(assign_only, pboxes, probs, boxes, mask)
    ms = timeit(as_c, pboxes, probs, boxes, mask, fetch=lambda o: o[0])
    report["tal_assign_only"] = {"ms": round(ms, 2)}

    # ---- full fused step (LAST: donate_argnums=(0,) consumes the state
    # buffers on every call, so timing must chain state through the loop
    # and nothing downstream may touch `state` afterwards) ----
    step = make_detector_train_step(cfg, model, tx)
    step_c, flops = _aot(step, state, images4, boxes4, mask4, weights, lr,
                         use_mosaic=True)
    st, metrics = step_c(state, images4, boxes4, mask4, weights, lr)
    _force(metrics["loss"])
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        st, metrics = step_c(st, images4, boxes4, mask4, weights, lr)
    _force(metrics["loss"])
    ms = (time.perf_counter() - t0) / n * 1e3
    report["full_step"] = {
        "ms": round(ms, 2), "tflops": round((flops or 0) / 1e12, 3),
        "mfu": round((flops or 0) / (ms / 1e3) / peak_flops_bf16(), 4),
        "imgs_per_sec": round(b / (ms / 1e3), 1),
    }

    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text(json.dumps(report, indent=1))
    print(json.dumps(report, indent=1), flush=True)


if __name__ == "__main__":
    main()
