"""Round-2 full-scale SSL loop on the reference dataset (resume-safe).

Usage: python scripts/run_loop_r2.py <work_dir> [key=value ...]

Stages (each skipped when its artifact already exists):
  1. PR sweep on val (TTA) -> pick conf_high = lowest threshold with
     precision >= target_precision (default 0.85).
  2. Two-stage pseudo-labeling over ALL unlabeled images (reference ran
     11,031 — Two-stage pseudo-labeling.py:7-13).
  3. Pseudo-label quality vs the held-back GT of the unlabeled pool.
  4. Calibrate stage-2 labels with the WGAN calibrator; quality again.
  5. Merge calibrated pseudo pairs + 500 labeled; retrain detector
     (MAE-pretrained init); report val mAP50 delta vs the teacher.

Mirrors /root/reference/datasets/500_100_100/two_stage tree layout.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DATA = Path("/root/reference/datasets/500_100_100")


def say(msg, log=[None]):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def pair_tree_ok(root: Path, expect: int | None = None) -> bool:
    """A pseudo-label pair tree is valid iff images and labels are non-empty
    and 1:1 (and match the recorded count when given).  Round 2's m-scale
    loop was corrupted by gating on the counts marker alone: a workspace
    reset left 4,025 labels with 0 images and the merge silently shrank."""
    imgs = {p.stem for p in (root / "images").glob("*") if p.is_file()}
    lbls = {p.stem for p in (root / "labels").glob("*.txt")}
    if not imgs or imgs != lbls:
        return False
    return expect is None or len(imgs) == expect


def repair_pair_tree(root: Path, source_images: Path,
                     expect: int | None = None) -> bool:
    """Reconstitute a pair tree whose images/ was wiped by a workspace reset.

    Pseudo-label .txt files are small and git-committed; the images beside
    them are verbatim copies of dataset files selected by stem.  When every
    label's source image still exists in the pool, re-copying them restores
    the exact tree without re-running the (expensive) predict stage.
    Returns True iff the tree is valid afterwards."""
    import shutil

    lbls = sorted((root / "labels").glob("*.txt"))
    if not lbls or (expect is not None and len(lbls) != expect):
        return False
    # deterministic on duplicate stems (a.jpg vs a.png): lexicographically
    # smallest name wins regardless of glob order
    by_stem: dict[str, Path] = {}
    for p in sorted(Path(source_images).glob("*")):
        if p.is_file() and (p.stem not in by_stem
                            or p.name < by_stem[p.stem].name):
            by_stem[p.stem] = p
    img_dir = root / "images"
    img_dir.mkdir(parents=True, exist_ok=True)
    have = {p.stem for p in img_dir.glob("*") if p.is_file()}
    # validate EVERY stem resolves before copying anything: repair must
    # fail atomically, never leave a half-copied images/ tree
    missing = [l.stem for l in lbls
               if l.stem not in have and l.stem not in by_stem]
    if missing:
        say(f"repair_pair_tree: {len(missing)} label stem(s) have no pool "
            f"source (first: {missing[:3]}) — not repairing")
        return False
    copied = 0
    for lbl in lbls:
        if lbl.stem in have:
            continue
        src = by_stem[lbl.stem]
        shutil.copy2(src, img_dir / src.name)
        copied += 1
    if copied:
        say(f"repair_pair_tree: re-copied {copied} images into {img_dir}")
    return pair_tree_ok(root, expect)


def select_top_pseudo(labels_dir: Path, out_dir: Path, n: int) -> Path:
    """Copy ``n`` pseudo label files into ``out_dir``: ranked by mean box
    confidence when a conf column exists (k-fold labels), otherwise a
    seed-42 uniform sample (two-stage labels are conf-less — they mirror
    the reference's no-conf txt format, Two-stage pseudo-labeling.py:27-31).
    Deterministic either way.  Returns ``out_dir``."""
    import shutil

    import numpy as np

    scored, have_conf = [], False
    for txt in sorted(labels_dir.glob("*.txt")):
        confs = []
        for line in txt.read_text().splitlines():
            p = line.split()
            if len(p) >= 6:
                confs.append(float(p[5]))
        if confs:
            have_conf = True
        scored.append((-(sum(confs) / len(confs)) if confs else 0.0,
                       txt.stem, txt))
    if have_conf:
        scored.sort()
        keep = [txt for _, _, txt in scored[:n]]
    else:
        order = np.random.default_rng(42).permutation(len(scored))
        keep = [scored[i][2] for i in order[:n]]
    if out_dir.exists():
        shutil.rmtree(out_dir)
    out_dir.mkdir(parents=True)
    for txt in keep:
        shutil.copy2(txt, out_dir / txt.name)
    return out_dir


def main():
    import jax

    from gcssl_tpu.core.checkpoint import CheckpointManager
    from gcssl_tpu.core.config import (
        CalibratorConfig,
        DetectorConfig,
        PseudoLabelConfig,
        apply_overrides,
        load_config,
    )
    from gcssl_tpu.train.detector import (
        create_detector_state,
        eval_params,
        make_detector_predict,
    )

    work = Path(sys.argv[1])
    work.mkdir(parents=True, exist_ok=True)
    o = {}
    for kv in sys.argv[2:]:
        k, v = kv.split("=", 1)
        try:
            v = json.loads(v)
        except json.JSONDecodeError:
            pass
        o[k] = v
    weights_dir = o.pop("weights_dir", "runs/det_v2_mae")
    calib_dir = o.pop("calib_dir", "runs/calib_r2")
    calib_cfg_path = o.pop("calib_config", "configs/calibrator_r2.yaml")
    init_from = o.pop("init_from", "runs/mae_11k_long/backbone.msgpack")
    target_precision = float(o.pop("target_precision", 0.85))
    forced_conf_high = o.pop("conf_high", None)
    if forced_conf_high is not None:
        forced_conf_high = float(forced_conf_high)
    labels_src = o.pop("labels_src", "calibrated")
    # calibration transfer to stage-2 labels measured neutral-to-negative
    # (REPORT_r2.md), so when retraining on raw labels the calibrate pass
    # is diagnostic only and skipped by default; force with calibrate=1.
    do_calibrate = bool(o.pop("calibrate", labels_src != "raw"))
    retrain_epochs = int(o.pop("retrain_epochs", 300))
    conf_low = float(o.pop("conf_low", 0.40))
    min_recall = float(o.pop("min_recall", 0.10))
    # HBM budget cap: the trainer keeps the whole merge device-resident
    # (ARCHITECTURE §3); 7,602 images x 640² u8 OOM'd the 16 GB v5e
    # (round 4, loop_m3 first attempt).  When the pseudo pool exceeds the
    # cap, keep the top max_pseudo files by mean box confidence.
    max_pseudo = o.pop("max_pseudo", None)
    max_pseudo = int(max_pseudo) if max_pseudo is not None else None
    det_cfg = apply_overrides(DetectorConfig(), o)

    # ---- load teacher (train-state ckpt dir or params-only release file) ----
    from gcssl_tpu.core.release import is_release_file, load_release

    state, model, _ = create_detector_state(det_cfg, jax.random.PRNGKey(0))
    if is_release_file(weights_dir):
        teacher_params, meta = load_release(weights_dir)
        teacher_map50 = meta.get("map50")
    else:
        mgr = CheckpointManager(weights_dir)
        which = "best" if mgr.exists("best") else "last"
        state = mgr.restore(which, jax.device_get(state))
        teacher_params = eval_params(det_cfg, state)
        teacher_map50 = mgr.metadata(which).get("map50")
    predict_fn = make_detector_predict(det_cfg, model, max_out=300, pre_nms_topk=700)
    say(f"teacher: {weights_dir} map50={teacher_map50}")

    # ---- 1. PR sweep -> conf_high ----
    sweep_path = work / "pr_sweep.json"
    if not sweep_path.exists():
        import subprocess

        say("running PR sweep on val...")
        # forward detector-arch overrides so non-default widths restore
        fwd = [f"{k}={json.dumps(v)}" if not isinstance(v, str) else f"{k}={v}"
               for k, v in o.items()]
        rc = subprocess.run(
            [sys.executable, "scripts/pr_sweep.py", weights_dir, str(sweep_path)]
            + fwd
        ).returncode
        if rc != 0:
            raise RuntimeError("pr_sweep failed")
    sweep = json.loads(sweep_path.read_text())
    if forced_conf_high is not None:
        conf_high = forced_conf_high
    else:
        # precision >= target alone is a knife-edge: round 4's 0.5587
        # teacher hit P0.86/R0.02 at conf 0.85 — technically "eligible" but
        # the pseudo-label pool collapses to ~2% of boxes and the retrain
        # iteration degenerates.  Volume matters as much as purity
        # (round 3: P0.81/R0.26 at 0.75 -> 4,025 kept images -> +0.022
        # mAP50), so eligibility also requires a recall floor.
        eligible = [s for s in sweep if s["precision"] >= target_precision
                    and s["recall"] >= min_recall]
        live = [s for s in sweep if s["tp"] + s["fp"] >= 20]
        if eligible:
            conf_high = min(s["conf"] for s in eligible)
        elif any(s["recall"] >= min_recall for s in live):
            # no threshold reaches target precision at usable volume: the
            # highest-precision point that still clears the recall floor
            conf_high = max((s for s in live if s["recall"] >= min_recall),
                            key=lambda s: s["precision"])["conf"]
        elif live:
            # confidence ceiling below any usable volume: best-precision
            # live point (original fallback)
            conf_high = max(live, key=lambda s: s["precision"])["conf"]
        else:
            # totally collapsed teacher: no sweep point reached 20 raw
            # detections — a diagnosable failure beats a ValueError
            raise RuntimeError(
                "PR sweep degenerate: no confidence point yielded >= 20 "
                f"detections on val (teacher collapse?). Sweep: {sweep}"
            )
    say(f"conf_high={conf_high} (target precision {target_precision}); sweep: "
        + ", ".join(f"{s['conf']}:P{s['precision']:.2f}/R{s['recall']:.2f}"
                    for s in sweep))

    # ---- 2. two-stage over the full pool ----
    two_dir = work / "two_stage"
    counts_path = work / "two_stage_counts.json"
    stage2_high = two_dir / "stage2" / "high"
    if counts_path.exists():
        # gate on the real artifacts, not the marker: the tree must hold
        # exactly the recorded number of image+label pairs
        rec = json.loads(counts_path.read_text())
        if not pair_tree_ok(stage2_high, rec.get("stage2_high")) and \
                repair_pair_tree(stage2_high, DATA / "unlabels" / "images",
                                 rec.get("stage2_high")):
            # images/ wiped by a reset but the committed labels + dataset
            # pool fully determine the tree — repaired in place; downstream
            # merged/ is rebuilt below because its own images died too
            say(f"two-stage artifacts under {stage2_high} repaired from the "
                "unlabeled pool")
        if not pair_tree_ok(stage2_high, rec.get("stage2_high")):
            say(f"two-stage artifacts INVALID under {stage2_high} "
                f"(expected {rec.get('stage2_high')} pairs) — re-running")
            import shutil

            counts_path.unlink()
            shutil.rmtree(two_dir, ignore_errors=True)
            # everything downstream of the corrupt tree is equally corrupt:
            # a surviving retrain/ checkpoint would be silently resumed
            shutil.rmtree(work / "merged", ignore_errors=True)
            shutil.rmtree(work / "retrain", ignore_errors=True)
            shutil.rmtree(work / "calibrated", ignore_errors=True)
            for stale in ("pseudo_quality.json", "calibrated_quality.json",
                          "loop_result.json"):
                (work / stale).unlink(missing_ok=True)
    if not counts_path.exists():
        from gcssl_tpu.pipeline.two_stage import two_stage_pseudo_label

        pl_cfg = PseudoLabelConfig(conf_high=conf_high, conf_low=conf_low)
        say(f"two-stage over {DATA/'unlabels'} (full pool)...")
        t0 = time.time()
        counts = two_stage_pseudo_label(
            det_cfg, pl_cfg, predict_fn, teacher_params,
            DATA / "unlabels" / "images", two_dir,
        )
        counts["wall_s"] = round(time.time() - t0, 1)
        counts["conf_high"] = conf_high
        if not pair_tree_ok(stage2_high, counts.get("stage2_high")):
            raise RuntimeError(
                f"two-stage finished but {stage2_high} is not a valid "
                f"1:1 pair tree of {counts.get('stage2_high')} items"
            )
        counts_path.write_text(json.dumps(counts, indent=1))
    counts = json.loads(counts_path.read_text())
    say(f"two-stage counts: {counts}")

    # ---- 3. pseudo quality vs held-back GT ----
    qual_path = work / "pseudo_quality.json"
    if not qual_path.exists():
        from gcssl_tpu.eval.pseudo_vs_gt import evaluate_pseudo_labels

        rep = evaluate_pseudo_labels(
            two_dir / "stage2" / "high" / "labels", DATA / "unlabels" / "labels"
        )
        qual_path.write_text(json.dumps({
            "precision": rep.precision, "recall": rep.recall, "f1": rep.f1,
            "tp": rep.tp, "fp": rep.fp, "fn": rep.fn,
            "total_imgs": rep.total_imgs,
        }, indent=1))
    say(f"pseudo quality: {qual_path.read_text()}")

    # ---- 4. calibrate ----
    calib_labels = work / "calibrated" / "labels"
    calq_path = work / "calibrated_quality.json"
    if not do_calibrate and not calq_path.exists():
        calq_path.write_text(json.dumps({"skipped": "labels_src=raw"}))
    if not calq_path.exists():
        from gcssl_tpu.pipeline.calibrate import (
            calibrate_tree,
            load_calibrator_from_checkpoint,
        )
        from gcssl_tpu.eval.pseudo_vs_gt import evaluate_pseudo_labels

        ccfg = load_config(calib_cfg_path) if Path(calib_cfg_path).exists() else CalibratorConfig()
        cal = load_calibrator_from_checkpoint(calib_dir, cfg=ccfg, max_boxes=128)
        say(f"calibrating stage-2 labels with {calib_dir}...")
        n = calibrate_tree(
            cal, two_dir / "stage2" / "high" / "images",
            two_dir / "stage2" / "high" / "labels", calib_labels,
        )
        rep = evaluate_pseudo_labels(calib_labels, DATA / "unlabels" / "labels")
        calq_path.write_text(json.dumps({
            "calibrated_files": n,
            "precision": rep.precision, "recall": rep.recall, "f1": rep.f1,
            "tp": rep.tp, "fp": rep.fp, "fn": rep.fn,
        }, indent=1))
    say(f"calibrated quality: {calq_path.read_text()}")

    # ---- 5. merge + retrain ----
    merged_dir = work / "merged"
    retrain_dir = work / "retrain"
    result_path = work / "loop_result.json"
    if not result_path.exists():
        from gcssl_tpu.pipeline.iterate import merge_labeled_and_pseudo, retrain_on_merged

        if merged_dir.exists():
            # rebuild unconditionally while the loop result is absent: a
            # surviving tree may be half-wiped OR built under a different
            # max_pseudo cap — stale extras would silently survive the
            # re-merge (merge only adds files, never removes)
            import shutil

            say(f"stale merged tree under {merged_dir} — rebuilding")
            shutil.rmtree(merged_dir)

        # labels_src="raw" trains on the uncalibrated stage-2 labels.
        # Measured this round: the calibrator trained on the REFERENCE
        # teacher's error distribution does not transfer to our v2
        # detector's predictions (mean matched IoU 0.592 raw vs 0.550
        # calibrated on the 2,025-image pool) — the reference's own
        # pipeline is self-consistent (its CGAN pairs come from its own
        # detector's k-fold predictions), so a transferable calibrator
        # must be retrained on our k-fold pairs.
        retrain_labels = (
            two_dir / "stage2" / "high" / "labels"
            if labels_src == "raw" else calib_labels
        )
        if max_pseudo is not None:
            n_all = len(list(retrain_labels.glob("*.txt")))
            if n_all > max_pseudo:
                retrain_labels = select_top_pseudo(
                    retrain_labels, work / "pseudo_capped", max_pseudo)
                say(f"pseudo cap: kept {max_pseudo}/{n_all} label files "
                    f"(conf-ranked, else seeded sample) -> {retrain_labels}")
        n_merged = merge_labeled_and_pseudo(
            DATA / "train", two_dir / "stage2" / "high" / "images",
            retrain_labels, merged_dir,
        )
        say(f"merged {n_merged} images; retraining ({retrain_epochs} ep)...")
        hist_rec = []

        def log_fn(rec):
            hist_rec.append(rec)
            if rec["epoch"] % 10 == 0:
                say(f"retrain ep {rec['epoch']} map50 {rec.get('map50', -1):.4f}")

        rcfg = apply_overrides(det_cfg, {
            "epochs": retrain_epochs, "patience": 50,
            "close_mosaic_epochs": 25,
        })
        state2, _, hist = retrain_on_merged(
            rcfg, merged_dir, DATA / "val", retrain_dir,
            log_fn=log_fn, init_from=init_from, resume=True,
            # bf16 progress snapshots on best improvement: the full train
            # state is gitignored and dies with the workspace.  Distinct
            # "_snapshot" name so a mid-run snapshot never clobbers the
            # curated release written at run end below.
            release_path=Path("weights")
            / f"detector_{work.name}_snapshot.msgpack.gz",
        )
        best = max(hist, key=lambda r: r.get("map50", -1))
        best_map50 = best.get("map50")
        best_epoch = best.get("epoch")
        # after a crash-resume, `hist` only covers post-resume epochs; the
        # checkpoint metadata carries the true best across the whole run
        ckpt_best = retrain_dir / "best.json"
        if ckpt_best.exists():
            meta = json.loads(ckpt_best.read_text())
            if best_map50 is None or meta.get("map50", -1) >= best_map50:
                best_map50 = meta.get("map50")
                best_epoch = meta.get("epoch")
        result_path.write_text(json.dumps({
            "teacher_map50": teacher_map50,
            "retrained_best_map50": best_map50,
            "retrained_best_epoch": best_epoch,
            "merged_images": n_merged,
            "conf_high": conf_high,
        }, indent=1))
        # persist inference params immediately: full train states are
        # gitignored and do not survive workspace resets (core/release.py)
        from gcssl_tpu.core.release import export_detector

        rel = export_detector(
            retrain_dir, Path("weights") / f"detector_{work.name}.msgpack.gz",
            rcfg, which="best",
            extra_meta={"width_mult": rcfg.width_mult,
                        "depth_mult": rcfg.depth_mult,
                        "teacher": f"{weights_dir} {teacher_map50}",
                        "merged_images": n_merged},
        )
        say(f"release exported: {rel}")
    say(f"LOOP RESULT: {result_path.read_text()}")


if __name__ == "__main__":
    main()
