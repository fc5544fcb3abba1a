"""Round-2 detector training run: TAL assignment + scale-preserving mosaic.

Usage: python scripts/train_det_v2.py <save_dir> [key=value overrides...]

Trains on the reference dataset's labeled split (500 images) with val-mAP50
early stopping, logging per-epoch records to <save_dir>/results.json and a
live train.log. Designed for long unattended TPU runs (resume-safe).
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from gcssl_tpu.core.config import DetectorConfig, apply_overrides
from gcssl_tpu.data.detection import load_detection_tree
from gcssl_tpu.pipeline.detect import train_detector

DATA = Path("/root/reference/datasets/500_100_100")


def main():
    save_dir = Path(sys.argv[1])
    overrides = {}
    for kv in sys.argv[2:]:
        k, v = kv.split("=", 1)
        try:
            v = json.loads(v)
        except json.JSONDecodeError:
            pass
        overrides[k] = v
    train_dir = overrides.pop("train_dir", str(DATA / "train"))
    resume = bool(overrides.pop("resume", False))
    init_from = overrides.pop("init_from", None)
    cfg = apply_overrides(DetectorConfig(), overrides)
    save_dir.mkdir(parents=True, exist_ok=True)
    log = open(save_dir / "train.log", "a")

    def say(msg):
        print(msg, flush=True)
        print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=log, flush=True)

    say(f"config: {cfg}")
    t0 = time.time()
    train = load_detection_tree(train_dir, cfg.img_size, cfg.max_boxes)
    val = load_detection_tree(str(DATA / "val"), cfg.img_size, cfg.max_boxes)
    say(f"loaded train={len(train)} val={len(val)} in {time.time()-t0:.0f}s")

    last_t = [time.time()]

    def log_fn(rec):
        dt = time.time() - last_t[0]
        last_t[0] = time.time()
        say(
            f"ep {rec['epoch']} loss {rec.get('loss', 0):.3f} "
            f"map50 {rec.get('map50', -1):.4f} "
            f"P {rec.get('precision', -1):.3f} R {rec.get('recall', -1):.3f} "
            f"({dt:.0f}s)"
        )

    state, model, history = train_detector(
        cfg, train, val, save_dir=save_dir, log_fn=log_fn,
        resume=resume, init_from=init_from,
        # bf16 progress snapshots: full train states are gitignored and
        # die with the workspace (core/release.py).  Distinct "_snapshot"
        # name: a resume-after-reset restarts best_map50 at -1 and an
        # early-epoch snapshot must never clobber the curated release.
        release_path=Path("weights") / f"detector_{save_dir.name}_snapshot.msgpack.gz",
    )
    if history:
        best = max(history, key=lambda r: r.get("map50", -1))
        say(f"BEST map50 {best.get('map50'):.4f} @ep{best['epoch']}")
        # curated release: only overwrite when this run's best beats the
        # existing release's recorded map50
        from gcssl_tpu.core.release import export_detector, is_release_file, load_release

        rel_path = Path("weights") / f"detector_{save_dir.name}.msgpack.gz"
        prev = (load_release(rel_path)[1].get("map50", -1)
                if is_release_file(rel_path) else -1)
        cur = best.get("map50") or -1
        if cur >= (prev or -1):
            export_detector(save_dir, rel_path, cfg, extra_meta={
                "width_mult": cfg.width_mult, "depth_mult": cfg.depth_mult})
            say(f"release exported: {rel_path} (map50 {cur:.4f} >= prev {prev})")
        else:
            say(f"release kept: existing {rel_path} map50 {prev} > {cur:.4f}")


if __name__ == "__main__":
    main()
