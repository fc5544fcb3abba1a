"""AOT model export for serving: self-contained StableHLO artifacts.

The reference has no deployment story at all — "serving" a trained model
means keeping the Python source of `cgan/models.py` + a `G_best.pth` around
and re-instantiating torch modules (/root/reference/cgan/inference.py:104-147).
This module gives the framework a real one: `jax.export` ahead-of-time
lowers a jitted inference function to versioned StableHLO with the trained
parameters baked in as constants, serialized into a single artifact file.
Loading needs NO model code, no config, no separate weights — just jax —
and runs on whatever backend the consumer has (exports target both `tpu`
and `cpu` lowering platforms).

Artifacts are batch-polymorphic by default (a symbolic leading dim via
`jax.export.symbolic_shape`), so one file serves every batch size; pass a
fixed ``batch`` to pin it (e.g. to freeze a serving bucket).

Container format (single file, dependency-free):

    magic  b"GCSSLAOT1\\n"            (10 bytes)
    u32    little-endian meta length
    bytes  meta JSON (kind, arch, thresholds, io specs, jax version)
    bytes  jax.export serialized Exported (carries its own versioning)
"""

from __future__ import annotations

import json
import struct
from pathlib import Path
from typing import Any, Callable, Sequence

import numpy as np

import jax
import jax.numpy as jnp

_MAGIC = b"GCSSLAOT1\n"

# Lower for both platforms unless told otherwise: artifacts exported on the
# TPU host must stay loadable on CPU-only consumers (and vice versa).
DEFAULT_PLATFORMS = ("cpu", "tpu")


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------

def save_artifact(path: str | Path, blob: bytes, meta: dict) -> Path:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    meta_b = json.dumps(meta, default=str).encode()
    tmp = path.with_name(path.name + ".tmp")
    with open(tmp, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<I", len(meta_b)))
        f.write(meta_b)
        f.write(blob)
    tmp.replace(path)
    return path


def read_artifact(path: str | Path) -> tuple[dict, bytes]:
    """Returns (meta dict, serialized Exported bytes)."""
    data = Path(path).read_bytes()
    if not data.startswith(_MAGIC):
        raise ValueError(f"{path}: not a gcssl AOT artifact (bad magic)")
    off = len(_MAGIC)
    (meta_len,) = struct.unpack_from("<I", data, off)
    off += 4
    meta = json.loads(data[off : off + meta_len].decode())
    return meta, data[off + meta_len :]


class ServedModel:
    """A loaded artifact: ``meta`` + a callable running the exported graph.

    Calling compiles the embedded StableHLO for the *current* backend on
    first use per concrete shape (symbolic-batch artifacts recompile per
    batch size, like any jit)."""

    def __init__(self, exported, meta: dict):
        self._exported = exported
        self.meta = meta
        # jit the call wrapper ONCE: a bare Exported.call re-traces on every
        # invocation (measured ~1 s/call overhead at batch 16) and bypasses
        # the persistent compilation cache; under jit each concrete shape
        # compiles once and lands in JAX_COMPILATION_CACHE_DIR like any
        # other jitted program
        self._call = jax.jit(exported.call)

    @classmethod
    def load(cls, path: str | Path) -> "ServedModel":
        meta, blob = read_artifact(path)
        return cls(jax.export.deserialize(bytearray(blob)), meta)

    def __call__(self, *args):
        return self._call(*args)

    @property
    def in_avals(self):
        return self._exported.in_avals


def load_model(path: str | Path) -> ServedModel:
    return ServedModel.load(path)


# ---------------------------------------------------------------------------
# generic export
# ---------------------------------------------------------------------------

def export_fn(
    fn: Callable,
    arg_specs: Sequence[jax.ShapeDtypeStruct],
    path: str | Path,
    meta: dict,
    platforms: Sequence[str] | None = DEFAULT_PLATFORMS,
) -> Path:
    """AOT-lower ``fn`` at ``arg_specs`` (which may carry symbolic dims)
    and write a self-contained artifact.  Any params referenced by closure
    are baked into the module as constants."""
    exported = jax.export.export(
        jax.jit(fn), platforms=list(platforms) if platforms else None
    )(*arg_specs)
    meta = dict(meta)
    meta.setdefault("format", "gcssl-aot-v1")
    meta["jax_version"] = jax.__version__
    meta["platforms"] = list(platforms) if platforms else None
    meta["in_avals"] = [str(a) for a in exported.in_avals]
    meta["out_avals"] = [str(a) for a in exported.out_avals]
    return save_artifact(path, exported.serialize(), meta)


def _batch_dim(batch: int | None):
    if batch is not None:
        return int(batch)
    (b,) = jax.export.symbolic_shape("b")
    return b


# ---------------------------------------------------------------------------
# model-specific exporters
# ---------------------------------------------------------------------------

def _cast_params(params: Any, params_dtype: str | None) -> Any:
    """Optionally cast float params to a storage dtype before baking them
    into the artifact (bfloat16 halves artifact size; the compute path is
    bf16 on TPU anyway, so only the weight quantization changes)."""
    params = jax.device_get(params)
    if params_dtype is None:
        return params
    dt = jnp.dtype(params_dtype)
    return jax.tree.map(
        lambda x: x.astype(dt) if np.issubdtype(x.dtype, np.floating) else x,
        params,
    )


def export_detector_predict(
    cfg,
    params: Any,
    path: str | Path,
    conf_thr: float = 0.25,
    iou_thr: float = 0.45,
    tta: bool = False,
    fuse: bool = False,
    tta_scales: tuple[float, ...] = (),
    batch: int | None = None,
    pre_nms_topk: int = 300,
    max_out: int | None = None,
    params_dtype: str | None = None,
    platforms: Sequence[str] | None = DEFAULT_PLATFORMS,
) -> Path:
    """Export the full batched predict — backbone, FPN/head, decode,
    (optional hflip/scale TTA), confidence threshold, NMS/WBF — as ONE
    graph: uint8 images (b, S, S, 3) -> (boxes (b, K, 4) normalized cxcywh
    in the letterboxed frame, scores (b, K), valid (b, K)).

    Thresholds are frozen into the artifact (they are trace-time statics in
    make_detector_predict); export one artifact per serving operating point.
    The detection budget is frozen too: the defaults (pre_nms_topk 300,
    max_out = cfg.max_boxes) match the pipeline predict path; for
    crowd-dense mAP eval parity export with the eval budget used by
    pipeline/detect.py:train_detector (pre_nms_topk=700,
    max_out=max(300, cfg.max_boxes))."""
    from gcssl_tpu.models.detector import Detector
    from gcssl_tpu.train.detector import make_detector_predict

    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    model = Detector(
        num_classes=cfg.num_classes,
        width_mult=cfg.width_mult,
        depth_mult=cfg.depth_mult,
        dtype=dtype,
    )
    predict = make_detector_predict(
        cfg, model, max_out=max_out, pre_nms_topk=pre_nms_topk,
        tta_scales=tta_scales,
    )
    params = _cast_params(params, params_dtype)  # host constants

    def fn(images_u8):
        return predict(params, images_u8, conf_thr, iou_thr, tta, fuse)

    b = _batch_dim(batch)
    spec = jax.ShapeDtypeStruct((b, cfg.img_size, cfg.img_size, 3), jnp.uint8)
    meta = {
        "kind": "detector_predict",
        "img_size": cfg.img_size,
        "num_classes": cfg.num_classes,
        "width_mult": cfg.width_mult,
        "depth_mult": cfg.depth_mult,
        "conf_thr": conf_thr,
        "iou_thr": iou_thr,
        "tta": tta,
        "fuse": fuse,
        "tta_scales": list(tta_scales),
        "pre_nms_topk": pre_nms_topk,
        "max_out": max_out or cfg.max_boxes,
        "batch": batch,
        "params_dtype": params_dtype,
        "inputs": "uint8 images (b, S, S, 3), letterboxed RGB",
        "outputs": "boxes (b,K,4) cxcywh normalized; scores (b,K); valid (b,K)",
    }
    return export_fn(fn, (spec,), path, meta, platforms)


def export_calibrator(
    cfg,
    g_params: Any,
    path: str | Path,
    batch: int | None = None,
    platforms: Sequence[str] | None = DEFAULT_PLATFORMS,
) -> Path:
    """Export the calibration forward pass — generator G on letterboxed
    patches + the inference-clamp delta application
    (/root/reference/cgan/inference.py:69-89 semantics) — as ONE graph:
    (patches f32 (b, s, s, 3) in (-1, 1), pred boxes (b, 4) cxcywh) ->
    refined boxes (b, 4).

    Patch letterboxing stays with the caller (ops.patches.crop_letterbox on
    device, or any host resizer producing the same (-1,1) 128x128 layout).
    """
    from gcssl_tpu.models.generators import build_generator
    from gcssl_tpu.ops.boxes import delta_apply_inference

    g_model = build_generator(
        cfg.model.generator_type, cfg.model.delta_scale, jnp.float32
    )
    g_params = jax.device_get(g_params)
    s = cfg.data.img_size

    def fn(patches, boxes):
        deltas = g_model.apply({"params": g_params}, patches)
        return delta_apply_inference(boxes, deltas)

    b = _batch_dim(batch)
    specs = (
        jax.ShapeDtypeStruct((b, s, s, 3), jnp.float32),
        jax.ShapeDtypeStruct((b, 4), jnp.float32),
    )
    meta = {
        "kind": "calibrator",
        "img_size": s,
        "generator_type": cfg.model.generator_type,
        "delta_scale": cfg.model.delta_scale,
        "batch": batch,
        "inputs": "patches f32 (b,s,s,3) in (-1,1); pred boxes (b,4) cxcywh",
        "outputs": "refined boxes (b,4) cxcywh (inference clamps)",
    }
    return export_fn(fn, specs, path, meta, platforms)


def as_predict_fn(served: ServedModel) -> Callable:
    """Adapt a detector_predict artifact to the framework's
    ``predict_fn(params, images, conf_thr, iou_thr, tta, fuse)`` contract so
    every consumer of the live predict path (pipeline/detect.py
    predict_arrays / predict_to_tree / evaluate_on, two-stage, k-fold) can
    run from a served artifact with zero model code.

    The artifact's operating point is frozen at export; ``params`` is
    ignored (baked in) and threshold/TTA arguments must match the meta —
    a mismatch raises rather than silently serving the wrong thresholds.

    The detection BUDGET (pre_nms_topk / max_out in the meta) is frozen
    too and is not expressible through this contract's arguments: an
    artifact exported with the pipeline defaults returns fewer boxes per
    crowd-dense image than train_detector's val-eval predict (which uses
    pre_nms_topk=700, max_out>=300) — for mAP-eval parity, export with
    that budget (export_detector_predict(..., pre_nms_topk=700,
    max_out=max(300, cfg.max_boxes)))."""
    meta = served.meta
    if meta.get("kind") != "detector_predict":
        raise ValueError(f"not a detector_predict artifact: {meta.get('kind')}")

    def fn(params, images, conf_thr, iou_thr, tta=False, fuse=False):
        frozen = {
            "conf_thr": meta.get("conf_thr"), "iou_thr": meta.get("iou_thr"),
            "tta": meta.get("tta"), "fuse": meta.get("fuse"),
        }
        asked = {"conf_thr": conf_thr, "iou_thr": iou_thr,
                 "tta": bool(tta), "fuse": bool(fuse)}
        bad = {k for k, v in frozen.items() if v is not None and v != asked[k]}
        if bad:
            raise ValueError(
                f"artifact operating point differs on {sorted(bad)}: "
                f"frozen {frozen} vs requested {asked}; re-export for this point"
            )
        return served(images)

    return fn


def smoke_check(path: str | Path, batch: int = 2) -> dict:
    """Load an artifact and run it on zeros; returns output shapes.  The
    cheap end-to-end proof that the file serves on this host's backend."""
    m = ServedModel.load(path)
    args = []
    for aval in m.in_avals:
        shape = tuple(
            batch if not isinstance(d, int) else d for d in aval.shape
        )
        args.append(np.zeros(shape, aval.dtype))
    out = m(*args)
    return {
        "kind": m.meta.get("kind"),
        "out_shapes": [tuple(np.asarray(o).shape) for o in jax.tree.leaves(out)],
    }
