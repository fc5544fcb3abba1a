"""Tests for obs (logger, sample grids) and pipeline pieces (two-stage
overlap filter, kfold splits vs sklearn, paired patches)."""

import json

import numpy as np
import pytest

from gcssl_tpu.obs import MetricsLogger, save_sample_grid
from gcssl_tpu.pipeline.kfold import kfold_split
from gcssl_tpu.pipeline.two_stage import _filter_low_by_overlap


class TestMetricsLogger:
    def test_jsonl_csv_and_history(self, tmp_path):
        log = MetricsLogger(tmp_path, console=False)
        log.log({"epoch": 1, "loss": 0.5})
        log.log({"epoch": 2, "loss": 0.25, "extra": 1.0})
        out = log.finalize()
        hist = json.loads(out.read_text())
        assert len(hist) == 2 and hist[1]["extra"] == 1.0
        lines = (tmp_path / "metrics.jsonl").read_text().strip().splitlines()
        assert len(lines) == 2
        csv_text = (tmp_path / "results.csv").read_text()
        assert "extra" in csv_text.splitlines()[0]


class TestSampleGrid:
    def test_writes_grid(self, tmp_path):
        rng = np.random.default_rng(0)
        p = rng.uniform(-1, 1, (4, 16, 16, 3)).astype(np.float32)
        out = save_sample_grid(tmp_path / "g.png", p, p, p, n=4)
        from PIL import Image

        img = Image.open(out)
        assert img.size == (64, 48)  # 4 cols x 16, 3 rows x 16


class TestTwoStageFilter:
    def test_low_overlapping_high_dropped(self):
        high = np.asarray([[0.5, 0.5, 0.2, 0.2]], np.float32)
        low = np.asarray(
            [[0.51, 0.5, 0.2, 0.2], [0.9, 0.9, 0.05, 0.05]], np.float32
        )
        keep = _filter_low_by_overlap(low, high, overlap_thr=0.35)
        assert keep.tolist() == [False, True]

    def test_no_high_keeps_all(self):
        low = np.asarray([[0.5, 0.5, 0.2, 0.2]], np.float32)
        keep = _filter_low_by_overlap(low, np.zeros((0, 4), np.float32), 0.35)
        assert keep.tolist() == [True]

    def test_no_low(self):
        assert len(_filter_low_by_overlap(
            np.zeros((0, 4), np.float32),
            np.asarray([[0.5, 0.5, 0.2, 0.2]], np.float32), 0.35,
        )) == 0


class TestKFold:
    def test_matches_sklearn(self):
        sklearn = pytest.importorskip("sklearn")
        from sklearn.model_selection import KFold

        n, k = 23, 5
        ours = list(kfold_split(n, k, seed=42))
        theirs = list(
            KFold(n_splits=k, shuffle=True, random_state=42).split(np.arange(n))
        )
        for (otr, ote), (str_, ste) in zip(ours, theirs):
            np.testing.assert_array_equal(ote, np.sort(ste))
            np.testing.assert_array_equal(otr, np.sort(str_))

    def test_partitions(self):
        folds = list(kfold_split(100, 5, seed=0))
        all_test = np.concatenate([t for _, t in folds])
        assert sorted(all_test.tolist()) == list(range(100))


class TestPairedPatches:
    def test_writes_pairs(self, tmp_path):
        from tests.test_data_calibrator import make_synthetic_root
        from gcssl_tpu.pipeline.paired_patches import create_paired_patches

        root = make_synthetic_root(tmp_path)
        n = create_paired_patches(root, tmp_path / "pairs", img_size=64)
        assert n == 3
        files = list((tmp_path / "pairs").glob("*.png"))
        assert len(files) == 3
        from PIL import Image

        assert Image.open(files[0]).size == (128, 64)  # side-by-side
