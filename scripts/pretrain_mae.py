"""Masked-reconstruction backbone pretraining on the 11k unlabeled pool.

Usage: python scripts/pretrain_mae.py <save_dir> [key=value overrides...]

Builds a HBM-resident 256px uint8 pack of the unlabeled images (native C++
decode+letterbox, PIL fallback), then runs ``pretrain_backbone`` (MAE-style
masked patch reconstruction, gcssl_tpu/train/pretrain.py) and writes
``backbone.msgpack`` checkpoints for the detector's ``init_from``.

Replaces the reference's COCO-pretrained YOLOv8 init (/root/reference/
train.py:11) which is unavailable offline.
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from gcssl_tpu.core.config import DetectorConfig, apply_overrides

DATA = Path("/root/reference/datasets/500_100_100")
PACK = 256  # stored pack edge; random-cropped to the view size on device


def build_pack(image_dir: Path, cache: Path) -> np.ndarray:
    from gcssl_tpu.data.detection import load_image_pack

    t0 = time.time()
    images = load_image_pack(image_dir, PACK, cache=cache)
    print(f"pack ready: {images.shape} in {time.time()-t0:.0f}s", flush=True)
    return images


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
    epochs = int(overrides.pop("epochs", 150))
    img_size = int(overrides.pop("img_size", 224))
    batch_size = int(overrides.pop("batch_size", 256))
    lr = float(overrides.pop("lr", 4e-4))
    mask_ratio = float(overrides.pop("mask_ratio", 0.5))
    image_dir = Path(overrides.pop("image_dir", str(DATA / "unlabels" / "images")))
    cfg = apply_overrides(DetectorConfig(), overrides)
    save_dir.mkdir(parents=True, exist_ok=True)
    log = open(save_dir / "train.log", "a")

    def say(msg):
        print(msg, flush=True)
        print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=log, flush=True)

    cache = Path("runs/_cache") / f"pack256_{image_dir.parent.name}_{image_dir.name}.npz"
    images = build_pack(image_dir, cache)
    say(f"pretrain: {len(images)} images, view {img_size}, batch {batch_size}, "
        f"epochs {epochs}, lr {lr}, mask {mask_ratio}")

    from gcssl_tpu.train.pretrain import pretrain_backbone

    hist = []
    t_last = [time.time()]

    def log_fn(rec):
        dt = time.time() - t_last[0]
        t_last[0] = time.time()
        hist.append(rec)
        say(f"ep {rec['epoch']} loss {rec['loss']:.4f} vis {rec['vis_mse']:.4f} "
            f"lr {rec['lr']:.2e} ({dt:.0f}s)")
        (save_dir / "results.json").write_text(json.dumps(hist, indent=1))

    pretrain_backbone(
        cfg, images, epochs=epochs, img_size=img_size, batch_size=batch_size,
        lr=lr, mask_ratio=mask_ratio, log_fn=log_fn, save_dir=save_dir,
    )
    say("pretrain done")


if __name__ == "__main__":
    main()
