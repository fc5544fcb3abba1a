"""Params-only release weights: small, git-tracked inference checkpoints.

Full train-state checkpoints (runs/**/*.msgpack: params + EMA + both
optimizer states + RNG) are multi-hundred-MB and gitignored, which means
they do not survive a workspace reset — round 2 lost the trained teacher
detector and MAE backbone that way and had to retrain both.  A release file
keeps only what inference needs (the EMA/eval params) as gzipped flax
msgpack under ``weights/`` (tracked), with a JSON metadata header entry.

The reference ships the analogous artifact as ``G_best.pth``
(/root/reference/cgan/cgan_train_enhanced.py:483-489); release files are
the framework-wide equivalent for every model family.
"""

from __future__ import annotations

import gzip
import json
from pathlib import Path
from typing import Any

import jax
from flax import serialization


def save_release(params: Any, out_path: str | Path, metadata: dict | None = None,
                 compresslevel: int = 6, dtype=None) -> Path:
    """Write {"meta": json-str, "params": pytree} as gzipped msgpack.

    ``dtype`` (e.g. jnp.bfloat16) casts float leaves before writing —
    halves in-training snapshot size/time; consumers cast back on load."""
    import numpy as np

    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    params = jax.device_get(params)
    if dtype is not None:
        params = jax.tree.map(
            lambda x: x.astype(dtype)
            if np.issubdtype(np.asarray(x).dtype, np.floating) else x,
            params,
        )
    payload = {
        "meta": json.dumps(metadata or {}, default=str),
        "params": params,
    }
    tmp = out_path.with_suffix(".tmp")
    with gzip.open(tmp, "wb", compresslevel=compresslevel) as f:
        f.write(serialization.to_bytes(payload))
    tmp.replace(out_path)
    return out_path


def load_release(path: str | Path) -> tuple[Any, dict]:
    """Returns (params pytree, metadata dict).

    Float leaves are cast back to float32: snapshots are written in bf16
    (save_release dtype=...) and every consumer (teacher predict, export,
    AOT serving) assumes f32 params — without this cast a bf16 snapshot
    silently ran inference in bf16 end to end."""
    import numpy as np

    with gzip.open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    params = jax.tree.map(
        lambda x: x.astype(np.float32)
        if np.issubdtype(np.asarray(x).dtype, np.floating)
        and np.asarray(x).dtype != np.float32 else x,
        payload["params"],
    )
    return params, json.loads(payload.get("meta", "{}"))


def is_release_file(path: str | Path) -> bool:
    p = Path(path)
    return p.is_file() and p.suffix == ".gz"


def export_detector(ckpt_dir: str | Path, out_path: str | Path, cfg=None,
                    which: str = "best", extra_meta: dict | None = None) -> Path:
    """Export a detector train-state checkpoint's eval (EMA) params.

    ``extra_meta`` records e.g. width_mult/depth_mult so consumers know
    which architecture the params belong to (restore still requires the
    matching DetectorConfig overrides)."""
    import jax.numpy as jnp  # noqa: F401  (state init touches the backend)

    from gcssl_tpu.core.checkpoint import CheckpointManager
    from gcssl_tpu.core.config import DetectorConfig
    from gcssl_tpu.train.detector import create_detector_state, eval_params

    cfg = cfg or DetectorConfig()
    state, _, _ = create_detector_state(cfg, jax.random.PRNGKey(0))
    mgr = CheckpointManager(ckpt_dir)
    state = mgr.restore(which, jax.device_get(state))
    meta = dict(mgr.metadata(which))
    meta["kind"] = "detector"
    meta.update(extra_meta or {})
    return save_release(eval_params(cfg, state), out_path, meta)


def export_calibrator_g(ckpt_dir: str | Path, out_path: str | Path, cfg=None,
                        which: str = "best") -> Path:
    """Export the calibrator generator's eval (EMA) params."""
    from gcssl_tpu.core.checkpoint import CheckpointManager
    from gcssl_tpu.core.config import CalibratorConfig
    from gcssl_tpu.train import create_train_state
    from gcssl_tpu.train.wgan_gp import eval_g_params

    cfg = cfg or CalibratorConfig()
    state, _, _ = create_train_state(cfg, jax.random.PRNGKey(0))
    mgr = CheckpointManager(ckpt_dir)
    state = mgr.restore(which, jax.device_get(state))
    meta = dict(mgr.metadata(which))
    meta["kind"] = "calibrator_g"
    return save_release(eval_g_params(cfg, state), out_path, meta)


def export_raw_msgpack(src: str | Path, out_path: str | Path,
                       metadata: dict | None = None) -> Path:
    """Wrap an existing params-only msgpack (e.g. an MAE backbone.msgpack)."""
    raw = serialization.msgpack_restore(Path(src).read_bytes())
    params = raw.get("params", raw)
    return save_release(params, out_path, metadata)
