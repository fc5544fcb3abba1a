"""Data pipeline tests: YOLO IO, index build (verified against the reference
dataset's committed pair counts), materialization, splits."""

import numpy as np
import pytest

from gcssl_tpu.data import (
    build_index,
    load_yolo_txt,
    materialize,
    save_yolo_txt,
    train_val_split,
)


class TestYoloIO:
    def test_roundtrip(self, tmp_path):
        p = tmp_path / "a.txt"
        cls = np.asarray([0, 1])
        boxes = np.asarray([[0.5, 0.5, 0.2, 0.3], [0.1, 0.2, 0.05, 0.05]], np.float32)
        conf = np.asarray([0.9, np.nan], np.float32)
        save_yolo_txt(p, cls, boxes, conf)
        c2, b2, f2 = load_yolo_txt(p, min_fields=5)
        np.testing.assert_array_equal(c2, cls)
        np.testing.assert_allclose(b2, boxes, atol=1e-6)
        assert f2[0] == pytest.approx(0.9)
        assert np.isnan(f2[1])

    def test_min_fields_filters_conf_less_rows(self, tmp_path):
        p = tmp_path / "a.txt"
        p.write_text("0 0.5 0.5 0.2 0.2\n0 0.4 0.4 0.1 0.1 0.77\n")
        _, b5, _ = load_yolo_txt(p, min_fields=5)
        _, b6, _ = load_yolo_txt(p, min_fields=6)
        assert len(b5) == 2 and len(b6) == 1

    def test_missing_and_empty(self, tmp_path):
        c, b, f = load_yolo_txt(tmp_path / "missing.txt")
        assert len(b) == 0
        (tmp_path / "e.txt").write_text("")
        c, b, f = load_yolo_txt(tmp_path / "e.txt")
        assert len(b) == 0


def make_synthetic_root(tmp_path, n_imgs=3):
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    rng = np.random.default_rng(0)
    for d in ("images", "labels_gt", "labels_pred"):
        (tmp_path / d).mkdir()
    for i in range(n_imgs):
        img = Image.fromarray(
            rng.integers(0, 255, (240, 320, 3), dtype=np.uint8), "RGB"
        )
        img.save(tmp_path / "images" / f"im{i}.jpg")
        # one GT box; two preds: one overlapping, one far away
        (tmp_path / "labels_gt" / f"im{i}.txt").write_text("0 0.5 0.5 0.3 0.3\n")
        (tmp_path / "labels_pred" / f"im{i}.txt").write_text(
            "0 0.52 0.5 0.28 0.32 0.9\n0 0.1 0.1 0.05 0.05 0.8\n"
        )
    return tmp_path


class TestIndexBuild:
    def test_synthetic_counts_and_deltas(self, tmp_path):
        root = make_synthetic_root(tmp_path)
        samples = build_index(root, iou_thr=0.25)
        # per image: only the overlapping pred matches
        assert len(samples) == 3
        s = samples[0]
        assert s.pred_box.tolist() == pytest.approx([0.52, 0.5, 0.28, 0.32])
        # delta target: dataset.py:73-101 semantics
        norm = max(np.sqrt(0.28 * 0.32), 0.05)
        assert s.delta[0] == pytest.approx((0.5 - 0.52) / norm, abs=1e-5)
        assert s.delta[2] == pytest.approx(np.log(0.3 / 0.28), abs=1e-5)

    def test_skips_files_without_gt(self, tmp_path):
        root = make_synthetic_root(tmp_path)
        (root / "labels_gt" / "im0.txt").unlink()
        assert len(build_index(root, iou_thr=0.25)) == 2

    def test_reference_pair_count(self, reference_cgan_dir):
        """The committed reference data yields exactly 18,523 matched pairs
        across 499 pred files (SURVEY.md §6 'K-fold pseudo-label pair yield')."""
        samples = build_index(reference_cgan_dir, iou_thr=0.25)
        assert len(samples) == 18523
        assert len({s.img_path for s in samples}) <= 499


class TestMaterialize:
    def test_shapes_and_canvas_dedup(self, tmp_path):
        root = make_synthetic_root(tmp_path)
        arrays = materialize(build_index(root, 0.25), img_size=64, canvas_size=128)
        assert arrays.pred_patch.shape == (3, 64, 64, 3)
        assert arrays.gt_patch.shape == (3, 64, 64, 3)
        assert arrays.canvases.shape == (3, 128, 128, 3)
        assert arrays.canvas_wh.shape == (3, 2)
        assert arrays.canvas_wh[0].tolist() == [320.0, 240.0]
        assert len(arrays) == 3

    def test_patch_matches_reference_pil_crop(self, tmp_path):
        from PIL import Image

        root = make_synthetic_root(tmp_path)
        samples = build_index(root, 0.25)
        arrays = materialize(samples, img_size=64, canvas_size=128)
        # independently recompute the reference _letterbox for sample 0
        from gcssl_tpu.data.calibrator import _pil_letterbox_crop

        img = Image.open(samples[0].img_path).convert("RGB")
        want = np.asarray(_pil_letterbox_crop(img, samples[0].pred_box, 64))
        np.testing.assert_array_equal(arrays.pred_patch[0], want)


class TestSplit:
    def test_sizes_match_reference_formula(self):
        train, val = train_val_split(18523, 0.2, seed=42)
        assert len(val) == int(0.2 * 18523)
        assert len(train) == 18523 - len(val)
        assert len(np.intersect1d(train, val)) == 0

    def test_deterministic(self):
        a = train_val_split(100, 0.2, seed=1)
        b = train_val_split(100, 0.2, seed=1)
        np.testing.assert_array_equal(a[0], b[0])
