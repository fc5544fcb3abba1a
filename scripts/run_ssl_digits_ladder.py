"""Real-data SSL ladder: sklearn digits at 20/50/100 labels x 3 seeds.

Usage: python scripts/run_ssl_digits_ladder.py [epochs] [compute_dtype]

The round-2 synthetic SSL benchmarks saturated (acc 1.0 rows measure
nothing), so the informative axis is this real-data ladder: how test
accuracy and ECE respond to the label budget, with seed error bars.  Each
cell is resume-safe (skipped when its results file exists); the summary is
recomputed from whatever cells exist.

Split protocol (documented, consistent across cells): 500 test / 100 val
(fixed, shared by every budget — used for model selection + temperature
scaling only, never trained on) / ``num_labeled`` class-balanced training
labels from the remaining ~1,200 / rest unlabeled.

Writes runs/ssl_digits_ladder/cell_<n>_<seed>.json per cell and
runs/ssl_digits_ladder/results.json with mean +/- std per budget.
"""

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

BUDGETS = (20, 50, 100)
SEEDS = (0, 1, 2)


def ladder_splits(num_labeled: int, seed: int):
    from gcssl_tpu.data.ssl_datasets import SSLSplits, normalize_images
    from scripts.run_ssl_digits import digits_arrays

    # data order fixed by seed 0 so test/val are IDENTICAL across cells;
    # the cell seed only draws the labeled subset (and training RNG)
    x_train, y_train, x_test, y_test = digits_arrays(seed=0)
    x_val, y_val = x_train[:100], y_train[:100]
    x_pool, y_pool = x_train[100:], y_train[100:]

    rng = np.random.default_rng(seed)
    per_class = num_labeled // 10
    lab_idx = np.concatenate([
        rng.choice(np.where(y_pool == c)[0], per_class, replace=False)
        for c in range(10)
    ])
    rng.shuffle(lab_idx)
    unlab_mask = np.ones(len(x_pool), bool)
    unlab_mask[lab_idx] = False

    def norm(x):
        return normalize_images(x[..., None] if x.ndim == 3 else x)

    return SSLSplits(
        x_lab=norm(x_pool[lab_idx]), y_lab=y_pool[lab_idx].astype(np.int32),
        x_unlab=norm(x_pool[unlab_mask]),
        x_val=norm(x_val), y_val=y_val.astype(np.int32),
        x_test=norm(x_test), y_test=y_test.astype(np.int32),
    )


def run_cell(num_labeled: int, seed: int, epochs: int, compute_dtype: str,
             out_path: Path) -> dict:
    import jax
    import jax.numpy as jnp

    from gcssl_tpu.core.config import SSLClassifierConfig
    from gcssl_tpu.eval.calibration import expected_calibration_error
    from gcssl_tpu.train.ssl import make_classify_fn, train_ssl_classifier

    cfg = SSLClassifierConfig(
        dataset="digits", num_classes=10, num_labeled=num_labeled,
        epochs=epochs, d_arch="conv", compute_dtype=compute_dtype, seed=seed,
    )
    splits = ladder_splits(num_labeled, seed)
    t0 = time.time()
    state, (g_model, d_model), history = train_ssl_classifier(
        cfg, splits.x_lab, splits.y_lab, splits.x_unlab,
        splits.x_val, splits.y_val,
    )
    from gcssl_tpu.eval.calibration import apply_temperature, fit_temperature

    classify = make_classify_fn(cfg, d_model)

    def batched_logits(x):
        return np.concatenate([
            np.asarray(classify(state.d_params, jnp.asarray(x[i:i + 256])))
            for i in range(0, len(x), 256)
        ])

    logits = batched_logits(splits.x_test)
    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
    # round-3 verdict #8: raw ECE degraded with the label budget (0.106 at
    # 100 labels) while the 120-epoch single run sat at 0.032 — report the
    # framework's actual deliverable too: temperature fitted on the shared
    # 100-image val split (never trained on), applied to test logits
    val_logits = batched_logits(splits.x_val)
    temp = fit_temperature(val_logits, splits.y_val)
    probs_cal = apply_temperature(logits, temp)
    cell = {
        "num_labeled": num_labeled, "seed": seed, "epochs": epochs,
        "test_acc": float((logits.argmax(1) == splits.y_test).mean()),
        "test_ece": expected_calibration_error(probs, splits.y_test),
        "test_ece_cal": expected_calibration_error(probs_cal, splits.y_test),
        "temperature": float(temp),
        "wall_s": round(time.time() - t0, 1),
    }
    # keep logits for offline calibration reanalysis (small: N x 10 f32)
    np.savez_compressed(out_path.with_suffix(".npz"),
                        test_logits=logits, val_logits=val_logits,
                        y_test=splits.y_test, y_val=splits.y_val)
    out_path.write_text(json.dumps(cell, indent=1))
    return cell


def summarize(save_dir: Path) -> dict:
    rows = []
    for f in sorted(save_dir.glob("cell_*.json")):
        rows.append(json.loads(f.read_text()))
    summary = {"dataset": "sklearn digits (real)", "protocol":
               "500 test / 100 shared val / budget labeled / rest unlabeled",
               "budgets": {}}
    for budget in BUDGETS:
        cells = [r for r in rows if r["num_labeled"] == budget]
        if not cells:
            continue
        accs = np.array([c["test_acc"] for c in cells])
        eces = np.array([c["test_ece"] for c in cells])
        row = {
            "n_seeds": len(cells),
            "acc_mean": round(float(accs.mean()), 4),
            "acc_std": round(float(accs.std()), 4),
            "ece_mean": round(float(eces.mean()), 4),
            "ece_std": round(float(eces.std()), 4),
        }
        cal = [c["test_ece_cal"] for c in cells if "test_ece_cal" in c]
        if cal:
            row["ece_cal_mean"] = round(float(np.mean(cal)), 4)
            row["ece_cal_std"] = round(float(np.std(cal)), 4)
        summary["budgets"][str(budget)] = row
    return summary


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    compute_dtype = sys.argv[2] if len(sys.argv) > 2 else "bfloat16"
    save_dir = Path("runs/ssl_digits_ladder")
    save_dir.mkdir(parents=True, exist_ok=True)

    for budget in BUDGETS:
        for seed in SEEDS:
            cell_path = save_dir / f"cell_{budget}_{seed}.json"
            if cell_path.exists():
                # a cell from the pre-calibration version of this script is
                # stale: it lacks the temperature-scaled ECE (round-3 #8)
                if "test_ece_cal" in json.loads(cell_path.read_text()):
                    print(f"[ladder] skip {budget}x{seed} (done)", flush=True)
                    continue
                print(f"[ladder] re-run {budget}x{seed} (no test_ece_cal)",
                      flush=True)
            print(f"[ladder] run budget={budget} seed={seed}", flush=True)
            cell = run_cell(budget, seed, epochs, compute_dtype, cell_path)
            print(f"[ladder] {budget}x{seed}: acc {cell['test_acc']:.4f} "
                  f"ece {cell['test_ece']:.4f} ({cell['wall_s']}s)", flush=True)

    summary = summarize(save_dir)
    (save_dir / "results.json").write_text(json.dumps(summary, indent=1))
    print(json.dumps(summary, indent=1), flush=True)


if __name__ == "__main__":
    main()
