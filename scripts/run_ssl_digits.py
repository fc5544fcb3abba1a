"""GAN-SSL classification on REAL data: the sklearn (UCI) handwritten
digits set — the one real image-classification dataset available in this
zero-egress environment.

Usage: python scripts/run_ssl_digits.py [epochs] [num_labeled] [compute_dtype]

(compute_dtype=float32 for CPU smoke runs — bf16 is emulated and ~10x
slower on the host; the TPU default stays bfloat16.)

1,797 real 8x8 grayscale digit scans (10 classes), nearest-upsampled to
32x32 so the BASELINE.json mnist_100-style recipe applies unchanged:
100 labeled / ~1,200 unlabeled / 500 held-out test, K+1-class
discriminator + feature matching, temperature-scaled calibration.
Complements runs/ssl_* (full synthetic schedule runs) with a real-data
acc/ECE trajectory — VERDICT r1 missing #5.

Writes runs/ssl_digits_real/results.json in the run_ssl_configs.py format.
"""

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # sitecustomize pre-imports jax with the axon TPU plugin; honoring the
    # env var needs the config update too (see tests/conftest.py)
    import jax

    jax.config.update("jax_platforms", "cpu")


def digits_arrays(seed: int = 0):
    """Real digits -> (x_train u8 (N,32,32), y_train, x_test, y_test)."""
    from sklearn.datasets import load_digits

    d = load_digits()
    x = np.kron(d.images, np.ones((4, 4)))          # 8x8 -> 32x32 nearest
    x = np.round(x * (255.0 / 16.0)).clip(0, 255).astype(np.uint8)
    y = d.target.astype(np.int32)
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(x))
    x, y = x[order], y[order]
    n_test = 500
    return x[n_test:], y[n_test:], x[:n_test], y[:n_test]


def main():
    from gcssl_tpu.core.config import SSLClassifierConfig
    from gcssl_tpu.data.ssl_datasets import make_ssl_splits
    from gcssl_tpu.eval.calibration import expected_calibration_error
    from gcssl_tpu.train.ssl import (
        make_classify_fn,
        pseudo_label_unlabeled,
        train_ssl_classifier,
    )
    import jax
    import jax.numpy as jnp

    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    num_labeled = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    compute_dtype = sys.argv[3] if len(sys.argv) > 3 else "bfloat16"
    save_dir = Path("runs/ssl_digits_real")
    if (save_dir / "results.json").exists():
        print("[digits] already done, skipping", flush=True)
        return
    save_dir.mkdir(parents=True, exist_ok=True)

    cfg = SSLClassifierConfig(
        dataset="digits", num_classes=10, num_labeled=num_labeled,
        epochs=epochs, d_arch="conv", compute_dtype=compute_dtype,
    )
    splits = make_ssl_splits(*digits_arrays(), num_labeled, 10)
    print(f"[digits] REAL data: lab={len(splits.x_lab)} "
          f"unlab={len(splits.x_unlab)} val={len(splits.x_val)} "
          f"test={len(splits.x_test)} epochs={cfg.epochs}", flush=True)

    hist = []
    t0 = time.time()

    def log_fn(rec):
        hist.append(rec)
        if rec["epoch"] % 10 == 0 or rec["epoch"] == 1:
            print(f"[digits] ep {rec['epoch']} acc "
                  f"{rec.get('val_acc', -1):.4f} ece "
                  f"{rec.get('val_ece', -1):.4f} ({time.time()-t0:.0f}s)",
                  flush=True)

    state, (g_model, d_model), history = train_ssl_classifier(
        cfg, splits.x_lab, splits.y_lab, splits.x_unlab,
        splits.x_val, splits.y_val, log_fn=log_fn,
    )

    classify = make_classify_fn(cfg, d_model)
    logits = np.concatenate([
        np.asarray(classify(state.d_params, jnp.asarray(splits.x_test[i:i+256])))
        for i in range(0, len(splits.x_test), 256)
    ])
    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
    test_acc = float((logits.argmax(1) == splits.y_test).mean())
    test_ece = expected_calibration_error(probs, splits.y_test)
    idx, labels, confs, temp = pseudo_label_unlabeled(
        cfg, d_model, state.d_params, splits.x_unlab,
        splits.x_val, splits.y_val,
    )
    summary = {
        "config": {"name": "digits_real", "dataset": "sklearn digits (real)",
                   "num_classes": 10, "num_labeled": num_labeled,
                   "channels": 1, "epochs": cfg.epochs, "d_arch": "conv"},
        "test_acc": test_acc, "test_ece": test_ece,
        "temperature": float(temp),
        "pseudo_kept": int(len(idx)),
        "pseudo_pool": int(len(splits.x_unlab)),
        "wall_s": round(time.time() - t0, 1),
        "history": history,
    }
    (save_dir / "results.json").write_text(json.dumps(summary, indent=1))
    print(f"[digits] DONE test_acc {test_acc:.4f} ece {test_ece:.4f} "
          f"T {temp:.3f} kept {len(idx)}/{len(splits.x_unlab)} "
          f"({summary['wall_s']}s)", flush=True)


if __name__ == "__main__":
    main()
