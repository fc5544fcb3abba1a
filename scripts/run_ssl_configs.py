"""Run the five BASELINE.json SSL classification configs to completion.

Usage: python scripts/run_ssl_configs.py [epochs_override]

Zero-egress environment: no MNIST/SVHN/CIFAR downloads exist, so each config
runs on the structured synthetic set (class-dependent frequency/phase
patterns, gcssl_tpu/data/ssl_datasets.py) at the config's label budget,
class count, channel count, and full epoch schedule.  Real datasets drop in
via --npz on the train-ssl CLI when available.

Writes runs/ssl_<name>/results.json with per-epoch val_acc / val_ece and a
final test acc/ECE + calibrated pseudo-label summary per config.
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CONFIGS = [
    # name, yaml preset fields (BASELINE.json configs[0..4])
    dict(name="mnist_100", dataset="mnist", num_classes=10, num_labeled=100,
         channels=1, epochs=120, d_arch="conv"),
    dict(name="svhn_1000", dataset="svhn", num_classes=10, num_labeled=1000,
         channels=3, epochs=150, d_arch="conv"),
    dict(name="cifar10_4000", dataset="cifar10", num_classes=10,
         num_labeled=4000, channels=3, epochs=200, d_arch="conv"),
    dict(name="cifar100_10k", dataset="cifar100", num_classes=100,
         num_labeled=10000, channels=3, epochs=150, d_arch="wrn"),
    dict(name="imagenet32", dataset="imagenet32", num_classes=10,
         num_labeled=1000, channels=3, epochs=100, d_arch="conv"),
]


def main():
    from gcssl_tpu.core.config import SSLClassifierConfig
    from gcssl_tpu.data.ssl_datasets import (
        make_ssl_splits,
        normalize_images,
        synthetic_classification_set,
    )
    from gcssl_tpu.eval.calibration import expected_calibration_error
    from gcssl_tpu.train.ssl import (
        make_classify_fn,
        pseudo_label_unlabeled,
        train_ssl_classifier,
    )
    import jax
    import jax.numpy as jnp

    epochs_override, n_seeds = None, 1
    for arg in sys.argv[1:]:
        if arg.startswith("seeds="):
            n_seeds = int(arg.split("=", 1)[1])
        else:
            epochs_override = int(arg)
    for spec in CONFIGS:
        name = spec["name"]
        save_dir = Path("runs") / f"ssl_{name}"
        res_path = save_dir / "results.json"
        if res_path.exists():
            # round-2 results ran on the saturated easy synthetic sets
            # (acc 1.0 measured nothing) — only skip a HARD-variant run
            try:
                done = json.loads(res_path.read_text()).get("synthetic_hard")
            except (ValueError, OSError):
                done = False
            if done:
                print(f"[{name}] already done (hard set), skipping",
                      flush=True)
                continue
            print(f"[{name}] stale easy-set result — re-running on the "
                  "hard set", flush=True)
        save_dir.mkdir(parents=True, exist_ok=True)
        cfg = SSLClassifierConfig(
            dataset=spec["dataset"], num_classes=spec["num_classes"],
            num_labeled=spec["num_labeled"],
            epochs=epochs_override or spec["epochs"], d_arch=spec["d_arch"],
        )
        # unlabeled-heavy pool sized to keep full-epoch wall time sane;
        # imagenet32 config is the unlabeled-heaviest (BASELINE configs[4])
        n_train = 30000 if spec["dataset"] == "imagenet32" else 20000
        per_seed = []
        t0 = time.time()
        for seed in range(n_seeds):
            data = synthetic_classification_set(
                num_classes=cfg.num_classes, channels=spec["channels"],
                n_train=n_train, n_test=2000, seed=seed,
            )
            splits = make_ssl_splits(*data, cfg.num_labeled, cfg.num_classes,
                                     seed=42 + seed)
            print(f"[{name}] seed {seed}: lab={len(splits.x_lab)} "
                  f"unlab={len(splits.x_unlab)} epochs={cfg.epochs} "
                  f"d_arch={cfg.d_arch}", flush=True)

            hist = []

            def log_fn(rec):
                hist.append(rec)
                if rec["epoch"] % 10 == 0 or rec["epoch"] == 1:
                    print(f"[{name}] s{seed} ep {rec['epoch']} acc "
                          f"{rec.get('val_acc', -1):.4f} ece "
                          f"{rec.get('val_ece', -1):.4f} "
                          f"({time.time()-t0:.0f}s)", flush=True)

            state, (g_model, d_model), history = train_ssl_classifier(
                cfg, splits.x_lab, splits.y_lab, splits.x_unlab,
                splits.x_val, splits.y_val, log_fn=log_fn,
            )

            # final test metrics + calibrated pseudo-labeling summary
            classify = make_classify_fn(cfg, d_model)
            logits = np.concatenate([
                np.asarray(classify(state.d_params,
                                    jnp.asarray(splits.x_test[i:i+256])))
                for i in range(0, len(splits.x_test), 256)
            ])
            probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
            test_acc = float((logits.argmax(1) == splits.y_test).mean())
            test_ece = expected_calibration_error(probs, splits.y_test)
            idx, labels, confs, temp = pseudo_label_unlabeled(
                cfg, d_model, state.d_params, splits.x_unlab,
                splits.x_val, splits.y_val,
            )
            # ECE after the framework's own deliverable — the val-fitted
            # temperature (round-3 verdict #8: raw ECE alone is not the
            # calibrated system's number)
            from gcssl_tpu.eval.calibration import apply_temperature

            test_ece_cal = expected_calibration_error(
                apply_temperature(logits, temp), splits.y_test)
            per_seed.append({
                "seed": seed,
                "test_acc": test_acc, "test_ece": test_ece,
                "test_ece_cal": test_ece_cal,
                "temperature": float(temp),
                "pseudo_kept": int(len(idx)),
                "pseudo_pool": int(len(splits.x_unlab)),
                "history": history,
            })
            print(f"[{name}] s{seed} DONE test_acc {test_acc:.4f} ece "
                  f"{test_ece:.4f} T {temp:.3f} kept "
                  f"{len(idx)}/{len(splits.x_unlab)}", flush=True)

        accs = np.array([r["test_acc"] for r in per_seed])
        eces = np.array([r["test_ece"] for r in per_seed])
        eces_cal = np.array([r["test_ece_cal"] for r in per_seed])
        summary = {
            "config": {k: v for k, v in spec.items()},
            "synthetic_hard": True,
            "epochs_run": cfg.epochs,
            "n_seeds": n_seeds,
            # mean over seeds; per-seed detail in "seeds"
            "test_acc": round(float(accs.mean()), 4),
            "test_acc_std": round(float(accs.std()), 4),
            "test_ece": round(float(eces.mean()), 4),
            "test_ece_std": round(float(eces.std()), 4),
            "test_ece_cal": round(float(eces_cal.mean()), 4),
            "test_ece_cal_std": round(float(eces_cal.std()), 4),
            "wall_s": round(time.time() - t0, 1),
            "seeds": per_seed,
        }
        (save_dir / "results.json").write_text(json.dumps(summary, indent=1))
        print(f"[{name}] DONE acc {summary['test_acc']}±"
              f"{summary['test_acc_std']} ece {summary['test_ece']}±"
              f"{summary['test_ece_std']} ({summary['wall_s']}s)", flush=True)


if __name__ == "__main__":
    main()
