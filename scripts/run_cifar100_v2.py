"""cifar100_10k with a real schedule (VERDICT r4 #4).

Usage: python scripts/run_cifar100_v2.py [key=value ...]

Round-4's cifar100_10k row (0.189±0.003 acc, raw ECE 0.373) ran the WRN
arm with the conv-arch rows' settings: constant LR, no augmentation, 150
epochs, 200 samples/class.  This run gives the 100-class problem the
standard treatment:

  * warmup + cosine LR (train/ssl.py lr_schedule)
  * pad-4 random-crop augmentation (aug="crop"; hflip is wrong here — the
    synthetic classes are oriented frequency/phase patterns and a mirror
    maps between classes)
  * WRN widen_factor 4 (capacity for 100 classes)
  * double the pool: 40k train (400/class), same 10k labeled budget
  * 300 epochs, early stop patience 60, best-val_acc checkpoint
  * seeds=2, temperature-scaled test ECE alongside raw

Writes runs/ssl_cifar100_v2/results.json in the same shape as the
round-4 rows (runs/ssl_cifar100_10k) for direct comparison.
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

WORK = Path("runs/ssl_cifar100_v2")


def main() -> int:
    import jax
    import jax.numpy as jnp

    from gcssl_tpu.core.config import SSLClassifierConfig
    from gcssl_tpu.data.ssl_datasets import (
        make_ssl_splits,
        synthetic_classification_set,
    )
    from gcssl_tpu.eval.calibration import (
        apply_temperature,
        expected_calibration_error,
    )
    from gcssl_tpu.train.ssl import (
        make_classify_fn,
        pseudo_label_unlabeled,
        train_ssl_classifier,
    )

    o = dict(kv.split("=", 1) for kv in sys.argv[1:])
    n_seeds = int(o.pop("seeds", 2))
    epochs = int(o.pop("epochs", 300))
    n_train = int(o.pop("n_train", 40000))
    widen = int(o.pop("widen", 4))

    res_path = WORK / "results.json"
    if res_path.exists():
        print("already done", flush=True)
        return 0
    WORK.mkdir(parents=True, exist_ok=True)

    cfg = SSLClassifierConfig(
        dataset="cifar100", num_classes=100, num_labeled=10000,
        epochs=epochs, d_arch="wrn", d_widen_factor=widen,
        lr_schedule="cosine", warmup_epochs=5, aug="crop",
        patience=60, ckpt_every_epochs=10,
    )
    per_seed = []
    t0 = time.time()
    for seed in range(n_seeds):
        data = synthetic_classification_set(
            num_classes=100, channels=3, n_train=n_train, n_test=2000,
            seed=seed,
        )
        splits = make_ssl_splits(*data, cfg.num_labeled, cfg.num_classes,
                                 seed=42 + seed)
        print(f"[c100v2] seed {seed}: lab={len(splits.x_lab)} "
              f"unlab={len(splits.x_unlab)} ep={cfg.epochs} widen={widen}",
              flush=True)

        def log_fn(rec):
            if rec["epoch"] % 10 == 0 or rec["epoch"] == 1:
                print(f"[c100v2] s{seed} ep {rec['epoch']} acc "
                      f"{rec.get('val_acc', -1):.4f} ece "
                      f"{rec.get('val_ece', -1):.4f} lr {rec['lr']:.2e} "
                      f"({time.time()-t0:.0f}s)", flush=True)

        state, (g_model, d_model), history = train_ssl_classifier(
            cfg, splits.x_lab, splits.y_lab, splits.x_unlab,
            splits.x_val, splits.y_val, log_fn=log_fn,
            save_dir=WORK / f"seed{seed}", resume=True,
        )
        # evaluate the BEST checkpoint (early stop keeps training past it)
        from gcssl_tpu.core.checkpoint import CheckpointManager

        ckpt = CheckpointManager(WORK / f"seed{seed}")
        if ckpt.exists("best"):
            state = ckpt.restore("best", jax.device_get(state))

        classify = make_classify_fn(cfg, d_model)
        logits = np.concatenate([
            np.asarray(classify(state.d_params,
                                jnp.asarray(splits.x_test[i:i + 256])))
            for i in range(0, len(splits.x_test), 256)
        ])
        probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
        test_acc = float((logits.argmax(1) == splits.y_test).mean())
        test_ece = expected_calibration_error(probs, splits.y_test)
        idx, labels, confs, temp = pseudo_label_unlabeled(
            cfg, d_model, state.d_params, splits.x_unlab,
            splits.x_val, splits.y_val,
        )
        test_ece_cal = expected_calibration_error(
            apply_temperature(logits, temp), splits.y_test)
        per_seed.append({
            "seed": seed, "test_acc": test_acc, "test_ece": test_ece,
            "test_ece_cal": test_ece_cal, "temperature": float(temp),
            "best_epoch": int(ckpt.metadata("best").get("epoch", -1)),
            "epochs_run": history[-1]["epoch"] if history else 0,
            "pseudo_kept": int(len(idx)),
            "pseudo_pool": int(len(splits.x_unlab)),
        })
        print(f"[c100v2] s{seed} DONE acc {test_acc:.4f} ece {test_ece:.4f} "
              f"ece_cal {test_ece_cal:.4f} T {temp:.3f}", flush=True)

    accs = np.array([r["test_acc"] for r in per_seed])
    summary = {
        "config": {"dataset": "cifar100", "num_classes": 100,
                   "num_labeled": 10000, "d_arch": "wrn",
                   "d_widen_factor": widen, "epochs": epochs,
                   "lr_schedule": "cosine", "aug": "crop",
                   "n_train": n_train},
        "synthetic_hard": True,
        "baseline_round4": {"test_acc": 0.189, "test_ece": 0.373,
                            "source": "runs/ssl_cifar100_10k/results.json"},
        "n_seeds": n_seeds,
        "test_acc": round(float(accs.mean()), 4),
        "test_acc_std": round(float(accs.std()), 4),
        "test_ece": round(float(np.mean([r["test_ece"] for r in per_seed])), 4),
        "test_ece_cal": round(
            float(np.mean([r["test_ece_cal"] for r in per_seed])), 4),
        "wall_s": round(time.time() - t0, 1),
        "seeds": per_seed,
    }
    res_path.write_text(json.dumps(summary, indent=1))
    print(f"[c100v2] DONE acc {summary['test_acc']}±{summary['test_acc_std']} "
          f"ece_cal {summary['test_ece_cal']} ({summary['wall_s']}s)",
          flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
