"""Unified CLI for every pipeline stage.

The reference's UX is "edit constants at the top of a script, run it"
(SURVEY.md §1).  Here each stage is a subcommand with typed flags over the
shared config tree:

    python -m gcssl_tpu split --src ... --dst ... --counts 500 100 100
    python -m gcssl_tpu train-detector --train-dir ... --val-dir ... --save-dir ...
    python -m gcssl_tpu predict --weights ... --images ... --out-labels ...
    python -m gcssl_tpu two-stage --weights ... --source ... --dest ...
    python -m gcssl_tpu kfold --train-dir ... --output ...
    python -m gcssl_tpu train-calibrator --data-dir ... --save-dir ...
    python -m gcssl_tpu calibrate --weights-dir ... --image ... --pred-txt ... --out-txt ...
    python -m gcssl_tpu compare --pseudo ... --gt ...
    python -m gcssl_tpu paired-patches --root ... --out ...
    python -m gcssl_tpu pretrain --images ... --save-dir ...
    python -m gcssl_tpu train-ssl --dataset synthetic ...
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path


def _add_split(sub):
    p = sub.add_parser("split", help="split a dataset into labeled/val/test/unlabeled")
    p.add_argument("--src", required=True)
    p.add_argument("--dst", required=True)
    p.add_argument("--counts", type=int, nargs="+", default=[500, 100, 100])
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--move", action="store_true")
    p.add_argument("--names", nargs="*", default=None)


def _add_arch(p):
    """Detector architecture scale flags (s-scale default; the round-2 best
    run is width 0.75 / depth 0.67 — an 'm'-scale).  Default None = "not
    explicitly set": config defaults apply, and when loading a release file
    its recorded architecture wins (_load_detector)."""
    p.add_argument("--width-mult", type=float, default=None)
    p.add_argument("--depth-mult", type=float, default=None)


def _add_train_detector(sub):
    p = sub.add_parser("train-detector", help="train the single-class detector")
    p.add_argument("--train-dir", required=True)
    p.add_argument("--val-dir", default=None)
    p.add_argument("--save-dir", required=True)
    p.add_argument("--img-size", type=int, default=640)
    p.add_argument("--epochs", type=int, default=400)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--patience", type=int, default=20)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--init-from", default=None,
                   help="msgpack checkpoint to graft matching subtrees from "
                        "(e.g. a pretrained backbone.msgpack)")
    p.add_argument("--resume", action="store_true",
                   help="restore full train state from save-dir/'last'")
    p.add_argument("--dp", type=int, default=1,
                   help="data-parallel devices (1-D 'data' mesh, exact "
                        "full-batch updates; batch-size must divide by it)")
    p.add_argument("--copy-paste", type=float, default=0.0,
                   help="per-slot probability of device-side instance "
                        "copy-paste augmentation (0 = off)")
    p.add_argument("--aug-dtype", default="float32",
                   choices=("float32", "bfloat16"),
                   help="augmentation compute dtype (bfloat16 halves "
                        "aug-stage HBM traffic)")
    _add_arch(p)


def _add_predict(sub):
    p = sub.add_parser("predict", help="batched detector prediction to YOLO txt")
    p.add_argument("--weights-dir", default=None)
    p.add_argument("--artifact", default=None,
                   help="serve from an export-model artifact instead of "
                        "weights (operating point frozen at export)")
    p.add_argument("--images", required=True)
    p.add_argument("--out-labels", required=True)
    p.add_argument("--conf", type=float, default=0.25)
    p.add_argument("--iou", type=float, default=0.45)
    p.add_argument("--tta", action="store_true")
    p.add_argument("--fuse", action="store_true",
                   help="WBF-style box fusion in NMS (pays with --tta)")
    p.add_argument("--img-size", type=int, default=640)
    p.add_argument("--dp", type=int, default=1,
                   help="data-parallel inference devices (not with --artifact)")
    _add_arch(p)


def _add_two_stage(sub):
    p = sub.add_parser("two-stage", help="two-stage pseudo-labeling")
    p.add_argument("--weights-dir", required=True)
    p.add_argument("--source", required=True)
    p.add_argument("--dest", required=True)
    p.add_argument("--conf-high", type=float, default=0.85)
    p.add_argument("--conf-low", type=float, default=0.40)
    p.add_argument("--overlap-thr", type=float, default=0.35)
    p.add_argument("--fuse", action="store_true",
                   help="WBF-style box fusion in NMS")
    p.add_argument("--img-size", type=int, default=640)
    p.add_argument("--dp", type=int, default=1,
                   help="data-parallel inference devices for both passes")
    _add_arch(p)


def _add_kfold(sub):
    p = sub.add_parser("kfold", help="k-fold cross pseudo-labeling")
    p.add_argument("--train-dir", required=True)
    p.add_argument("--val-dir", default=None)
    p.add_argument("--output", required=True)
    p.add_argument("--kfolds", type=int, default=5)
    p.add_argument("--epochs", type=int, default=400)
    p.add_argument("--img-size", type=int, default=640)
    p.add_argument("--fold-parallel", action="store_true",
                   help="train all K folds simultaneously over a 'fold' "
                        "mesh axis (needs >=K devices)")
    p.add_argument("--fold-dp", type=int, default=1,
                   help="devices per fold: 2-D ('fold','data') mesh, each "
                        "fold data-parallel (needs K*N devices)")
    p.add_argument("--dp", type=int, default=1,
                   help="data-parallel devices for the sequential fold loop "
                        "(train + predict each fold dp-wide; for <K devices)")
    _add_arch(p)


def _add_train_calibrator(sub):
    p = sub.add_parser("train-calibrator", help="train the WGAN-GP box calibrator")
    p.add_argument("--data-dir", required=True)
    p.add_argument("--save-dir", required=True)
    p.add_argument("--config", default=None, help="YAML overriding defaults")
    p.add_argument("--generator-type", default=None,
                   choices=["unet", "simple", "vit"])
    p.add_argument("--discriminator-type", default=None,
                   choices=["patch", "vit"])
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--cache-dir", default=None)
    p.add_argument("--resume", action="store_true",
                   help="restore full train state from save-dir/'last'")
    p.add_argument("--release", default=None, metavar="PATH",
                   help="export G's eval params there on every val-ΔIoU "
                        "improvement (throttled; survives workspace resets)")


def _add_calibrate(sub):
    p = sub.add_parser("calibrate", help="apply the calibrator to pseudo-labels")
    p.add_argument("--weights-dir", required=True)
    p.add_argument("--image", default=None)
    p.add_argument("--pred-txt", default=None)
    p.add_argument("--out-txt", default=None)
    p.add_argument("--images-dir", default=None)
    p.add_argument("--labels-dir", default=None)
    p.add_argument("--out-dir", default=None)


def _add_compare(sub):
    p = sub.add_parser("compare", help="pseudo-label P/R/F1 vs GT")
    p.add_argument("--pseudo", required=True)
    p.add_argument("--gt", required=True)
    p.add_argument("--iou", type=float, default=0.40)


def _add_paired_patches(sub):
    p = sub.add_parser("paired-patches", help="side-by-side patch QA images")
    p.add_argument("--root", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--img-size", type=int, default=128)
    p.add_argument("--limit", type=int, default=None)


def _add_eval_detector(sub):
    p = sub.add_parser("eval-detector", help="mAP50/50-95 on a labeled tree")
    p.add_argument("--weights-dir", required=True)
    p.add_argument("--data-dir", required=True)
    p.add_argument("--img-size", type=int, default=640)
    _add_arch(p)


def _add_iterate(sub):
    p = sub.add_parser(
        "iterate", help="merge calibrated pseudo-labels with labeled set and retrain"
    )
    p.add_argument("--labeled-dir", required=True)
    p.add_argument("--pseudo-images", required=True)
    p.add_argument("--pseudo-labels", required=True)
    p.add_argument("--merged-dir", required=True)
    p.add_argument("--val-dir", required=True)
    p.add_argument("--save-dir", required=True)
    p.add_argument("--img-size", type=int, default=640)
    p.add_argument("--epochs", type=int, default=400)
    p.add_argument("--init-from", default=None,
                   help="msgpack checkpoint to graft matching subtrees from")
    _add_arch(p)


def _add_pretrain(sub):
    p = sub.add_parser(
        "pretrain",
        help="masked-reconstruction backbone pretraining on unlabeled images",
    )
    p.add_argument("--images", required=True, help="dir of unlabeled images")
    p.add_argument("--save-dir", required=True)
    p.add_argument("--epochs", type=int, default=150)
    p.add_argument("--view-size", type=int, default=224,
                   help="random-crop view fed to the model")
    p.add_argument("--pack-size", type=int, default=256,
                   help="stored letterbox edge (> view-size for crop room)")
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--lr", type=float, default=4e-4)
    p.add_argument("--mask-ratio", type=float, default=0.5)
    p.add_argument("--cache", default=None,
                   help=".npz path caching the decoded image pack")
    _add_arch(p)


def _add_export_model(sub):
    p = sub.add_parser(
        "export-model",
        help="AOT-export a model to a self-contained StableHLO serving "
             "artifact (loads with zero model code, serves any batch size)",
    )
    p.add_argument("kind", choices=["detector", "calibrator"])
    p.add_argument("--weights-dir", required=True,
                   help="train-state checkpoint dir or release .msgpack.gz")
    p.add_argument("--out", required=True, help="artifact file to write")
    p.add_argument("--conf", type=float, default=0.25)
    p.add_argument("--iou", type=float, default=0.45)
    p.add_argument("--tta", action="store_true")
    p.add_argument("--fuse", action="store_true")
    p.add_argument("--batch", type=int, default=None,
                   help="pin the batch dim (default: symbolic, any size)")
    p.add_argument("--img-size", type=int, default=640)
    p.add_argument("--config", default=None,
                   help="calibrator config yaml (calibrator kind only)")
    p.add_argument("--platforms", default="cpu,tpu",
                   help="comma-separated lowering targets")
    p.add_argument("--params-dtype", default=None,
                   choices=["bfloat16", "float32"],
                   help="storage dtype for baked weights (bfloat16 halves "
                        "artifact size; detector only)")
    p.add_argument("--pre-nms-topk", type=int, default=300,
                   help="frozen NMS candidate budget (detector only; use "
                        "700 for val-eval parity on crowd-dense images)")
    p.add_argument("--max-out", type=int, default=None,
                   help="frozen max detections per image (detector only; "
                        "default cfg.max_boxes, use >=300 for eval parity)")
    p.add_argument("--check", action="store_true",
                   help="reload the artifact and run it on zeros")
    _add_arch(p)


def _add_train_ssl(sub):
    p = sub.add_parser("train-ssl", help="classification GAN-SSL training")
    p.add_argument("--dataset", default="synthetic")
    p.add_argument("--npz", default=None, help=".npz with x_train/y_train/x_test/y_test")
    p.add_argument("--num-labeled", type=int, default=4000)
    p.add_argument("--num-classes", type=int, default=10)
    p.add_argument("--epochs", type=int, default=300)
    p.add_argument("--d-arch", default="conv", choices=["conv", "wrn"])
    p.add_argument("--save-dir", default="runs/ssl")


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(prog="gcssl_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)
    for add in (
        _add_split, _add_train_detector, _add_predict, _add_two_stage,
        _add_kfold, _add_train_calibrator, _add_calibrate, _add_compare,
        _add_paired_patches, _add_eval_detector, _add_iterate, _add_pretrain,
        _add_export_model, _add_train_ssl,
    ):
        add(sub)
    return parser


def _detector_cfg(args):
    from gcssl_tpu.core.config import DetectorConfig

    kw = {}
    for name in ("img_size", "epochs", "batch_size", "patience", "lr",
                 "width_mult", "depth_mult", "copy_paste", "aug_dtype"):
        if getattr(args, name, None) is not None:
            kw[name] = getattr(args, name)
    return DetectorConfig(**kw)


def _load_detector(args):
    """Returns (cfg, eval params, predict_fn).  ``--weights-dir`` accepts a
    train-state checkpoint dir or a params-only release file
    (weights/*.msgpack.gz, core/release.py)."""
    import jax

    from gcssl_tpu.core.checkpoint import CheckpointManager
    from gcssl_tpu.core.release import is_release_file, load_release
    from gcssl_tpu.train.detector import (
        create_detector_state,
        eval_params,
        make_detector_predict,
    )

    cfg = _detector_cfg(args)
    if is_release_file(args.weights_dir):
        # the release meta records the architecture the params were trained
        # with (core/release.py extra_meta); it is authoritative unless the
        # user explicitly passed --width-mult/--depth-mult (a params tree
        # cannot restore onto a different arch anyway)
        from dataclasses import replace

        params, meta = load_release(args.weights_dir)
        arch = {
            k: float(meta[k]) for k in ("width_mult", "depth_mult")
            if meta.get(k) is not None and getattr(args, k, None) is None
        }
        if arch:
            cfg = replace(cfg, **arch)
        _, model, _ = create_detector_state(cfg, jax.random.PRNGKey(0))
    else:
        state, model, _ = create_detector_state(cfg, jax.random.PRNGKey(0))
        mgr = CheckpointManager(args.weights_dir)
        which = "best" if mgr.exists("best") else "last"
        state = mgr.restore(which, jax.device_get(state))
        params = eval_params(cfg, state)
    return cfg, jax.device_put(params), make_detector_predict(cfg, model)


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    # multi-host: activates only when JAX_COORDINATOR is set (core/mesh.py);
    # single-host runs (the common case) pass straight through
    from gcssl_tpu.core.mesh import init_distributed

    init_distributed()

    if args.cmd == "split":
        from gcssl_tpu.pipeline.split import split_dataset

        sizes = split_dataset(
            args.src, args.dst, args.counts, args.seed, args.move, args.names
        )
        print(json.dumps({"sizes": sizes}))

    elif args.cmd == "train-detector":
        from gcssl_tpu.data.detection import load_detection_tree
        from gcssl_tpu.obs.history import MetricsLogger
        from gcssl_tpu.pipeline.detect import train_detector

        cfg = _detector_cfg(args)
        train = load_detection_tree(args.train_dir, cfg.img_size, cfg.max_boxes)
        val = (
            load_detection_tree(args.val_dir, cfg.img_size, cfg.max_boxes)
            if args.val_dir else None
        )
        logger = MetricsLogger(args.save_dir)
        train_detector(
            cfg, train, val, save_dir=args.save_dir, log_fn=logger.log,
            init_from=args.init_from, resume=args.resume, dp=args.dp,
        )
        logger.finalize("results.json")

    elif args.cmd == "predict":
        from gcssl_tpu.pipeline.detect import predict_to_tree

        if args.artifact:
            if args.dp > 1:
                raise SystemExit(
                    "--dp needs live weights: exported artifacts are lowered "
                    "for a single device (use --weights-dir)"
                )
            from gcssl_tpu.core.config import DetectorConfig
            from gcssl_tpu.serve import as_predict_fn, load_model

            served = load_model(args.artifact)
            cfg = DetectorConfig(img_size=served.meta["img_size"])
            predict_fn, params = as_predict_fn(served), None
            # the operating point is frozen in the artifact
            args.conf = served.meta["conf_thr"]
            args.iou = served.meta["iou_thr"]
            args.tta = served.meta["tta"]
            args.fuse = served.meta["fuse"]
        elif args.weights_dir:
            cfg, params, predict_fn = _load_detector(args)
        else:
            raise SystemExit("predict needs --weights-dir or --artifact")
        n = predict_to_tree(
            cfg, predict_fn, params, args.images, args.out_labels,
            args.conf, args.iou, args.tta, fuse=args.fuse, dp=args.dp,
        )
        print(json.dumps({"boxes_written": n}))

    elif args.cmd == "two-stage":
        from gcssl_tpu.core.config import PseudoLabelConfig
        from gcssl_tpu.pipeline.two_stage import two_stage_pseudo_label

        cfg, params, predict_fn = _load_detector(args)
        pl_cfg = PseudoLabelConfig(
            conf_high=args.conf_high, conf_low=args.conf_low,
            overlap_thr=args.overlap_thr, fuse=args.fuse,
        )
        counts = two_stage_pseudo_label(
            cfg, pl_cfg, predict_fn, params, args.source, args.dest,
            dp=args.dp,
        )
        print(json.dumps(counts))

    elif args.cmd == "kfold":
        from gcssl_tpu.core.config import PseudoLabelConfig
        from gcssl_tpu.pipeline.kfold import kfold_pseudo_label

        cfg = _detector_cfg(args)
        pl_cfg = PseudoLabelConfig(kfolds=args.kfolds)
        merged = kfold_pseudo_label(
            cfg, pl_cfg, Path(args.train_dir) / "images", args.val_dir,
            args.output, fold_parallel=args.fold_parallel,
            fold_dp=args.fold_dp, dp=args.dp,
        )
        print(json.dumps({"merged": str(merged)}))

    elif args.cmd == "train-calibrator":
        from gcssl_tpu.core.config import CalibratorConfig, apply_overrides, load_config
        from gcssl_tpu.data.calibrator import load_or_build
        from gcssl_tpu.obs.history import MetricsLogger
        from gcssl_tpu.train.wgan_gp import train_calibrator

        cfg = load_config(args.config) if args.config else CalibratorConfig()
        over = {"data.data_dir": args.data_dir, "train.save_dir": args.save_dir}
        if args.generator_type:
            over["model.generator_type"] = args.generator_type
        if args.discriminator_type:
            over["model.discriminator_type"] = args.discriminator_type
        if args.epochs:
            over["train.n_epochs"] = args.epochs
        if args.batch_size:
            over["train.batch_size"] = args.batch_size
        cfg = apply_overrides(cfg, over)
        arrays = load_or_build(
            args.data_dir, cfg.data.iou_threshold, cfg.data.img_size,
            cfg.data.canvas_size, cache_dir=args.cache_dir,
            # device-patch configs crop on device from the canvases; skip the
            # (minutes-long) host PIL patch pass they never read
            skip_patches=cfg.data.device_patches,
        )
        logger = MetricsLogger(args.save_dir)
        train_calibrator(cfg, arrays, log_fn=logger.log, resume=args.resume,
                         release_path=args.release)

    elif args.cmd == "calibrate":
        from gcssl_tpu.pipeline.calibrate import (
            calibrate_file,
            calibrate_tree,
            load_calibrator_from_checkpoint,
        )

        cal = load_calibrator_from_checkpoint(args.weights_dir)
        if args.image:
            n = calibrate_file(cal, args.image, args.pred_txt, args.out_txt)
        else:
            n = calibrate_tree(cal, args.images_dir, args.labels_dir, args.out_dir)
        print(json.dumps({"boxes_calibrated": n}))

    elif args.cmd == "compare":
        from gcssl_tpu.eval.pseudo_vs_gt import evaluate_pseudo_labels

        report = evaluate_pseudo_labels(args.pseudo, args.gt, args.iou)
        print(report.render(args.iou))

    elif args.cmd == "paired-patches":
        from gcssl_tpu.pipeline.paired_patches import create_paired_patches

        n = create_paired_patches(args.root, args.out, args.img_size, limit=args.limit)
        print(json.dumps({"pairs_written": n}))

    elif args.cmd == "eval-detector":
        from gcssl_tpu.data.detection import load_detection_tree
        from gcssl_tpu.pipeline.detect import evaluate_on

        cfg, params, predict_fn = _load_detector(args)
        arrays = load_detection_tree(args.data_dir, cfg.img_size, cfg.max_boxes)
        m = evaluate_on(predict_fn, params, arrays)
        print(json.dumps({
            "map50": m.map50, "map50_95": m.map50_95,
            "precision": m.precision, "recall": m.recall,
        }))

    elif args.cmd == "iterate":
        from gcssl_tpu.obs.history import MetricsLogger
        from gcssl_tpu.pipeline.iterate import (
            merge_labeled_and_pseudo,
            retrain_on_merged,
        )

        cfg = _detector_cfg(args)
        n = merge_labeled_and_pseudo(
            args.labeled_dir, args.pseudo_images, args.pseudo_labels,
            args.merged_dir,
        )
        logger = MetricsLogger(args.save_dir)
        retrain_on_merged(
            cfg, args.merged_dir, args.val_dir, args.save_dir, log_fn=logger.log,
            init_from=args.init_from,
        )
        print(json.dumps({"merged_images": n}))

    elif args.cmd == "pretrain":
        from gcssl_tpu.data.detection import load_image_pack
        from gcssl_tpu.obs.history import MetricsLogger
        from gcssl_tpu.train.pretrain import pretrain_backbone

        cfg = _detector_cfg(args)
        images = load_image_pack(args.images, args.pack_size, cache=args.cache)
        logger = MetricsLogger(args.save_dir)
        pretrain_backbone(
            cfg, images, epochs=args.epochs, img_size=args.view_size,
            batch_size=args.batch_size, lr=args.lr, mask_ratio=args.mask_ratio,
            log_fn=logger.log, save_dir=args.save_dir,
        )
        logger.finalize("results.json")
        print(json.dumps({"images": len(images), "epochs": args.epochs}))

    elif args.cmd == "export-model":
        from gcssl_tpu.serve import (
            export_calibrator,
            export_detector_predict,
            smoke_check,
        )

        platforms = tuple(args.platforms.split(","))
        if args.kind == "detector":
            cfg, params, _ = _load_detector(args)
            path = export_detector_predict(
                cfg, params, args.out, conf_thr=args.conf, iou_thr=args.iou,
                tta=args.tta, fuse=args.fuse, batch=args.batch,
                pre_nms_topk=args.pre_nms_topk, max_out=args.max_out,
                params_dtype=args.params_dtype, platforms=platforms,
            )
        else:
            from gcssl_tpu.core.config import CalibratorConfig, load_config
            from gcssl_tpu.pipeline.calibrate import (
                load_calibrator_from_checkpoint,
            )

            ccfg = load_config(args.config) if args.config else CalibratorConfig()
            cal = load_calibrator_from_checkpoint(args.weights_dir, ccfg)
            path = export_calibrator(
                ccfg, cal.g_params, args.out, batch=args.batch,
                platforms=platforms,
            )
        result = {"artifact": str(path)}
        if args.check:
            result["check"] = smoke_check(path, batch=args.batch or 2)
        print(json.dumps(result))

    elif args.cmd == "train-ssl":
        import numpy as np

        from gcssl_tpu.core.config import SSLClassifierConfig
        from gcssl_tpu.data.ssl_datasets import (
            load_npz_dataset,
            make_ssl_splits,
            synthetic_classification_set,
        )
        from gcssl_tpu.obs.history import MetricsLogger
        from gcssl_tpu.train.ssl import train_ssl_classifier

        cfg = SSLClassifierConfig(
            dataset=args.dataset, num_classes=args.num_classes,
            num_labeled=args.num_labeled, epochs=args.epochs,
            d_arch=args.d_arch,
        )
        if args.npz:
            data = load_npz_dataset(args.npz)
        else:
            data = synthetic_classification_set(num_classes=cfg.num_classes)
        splits = make_ssl_splits(*data, cfg.num_labeled, cfg.num_classes)
        logger = MetricsLogger(args.save_dir)
        train_ssl_classifier(
            cfg, splits.x_lab, splits.y_lab, splits.x_unlab,
            splits.x_val, splits.y_val, log_fn=logger.log,
        )
        logger.finalize()

    return 0


if __name__ == "__main__":
    raise SystemExit(main())
