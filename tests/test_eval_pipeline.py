"""Tests for the P/R/F1 evaluator, dataset splitter, and calibration CLI."""

import numpy as np
import pytest

from gcssl_tpu.eval import evaluate_pseudo_labels
from gcssl_tpu.pipeline import split_dataset


class TestPseudoVsGT:
    def make_dirs(self, tmp_path):
        (tmp_path / "pseudo").mkdir()
        (tmp_path / "gt").mkdir()
        return tmp_path / "pseudo", tmp_path / "gt"

    def test_perfect_match(self, tmp_path):
        pseudo, gt = self.make_dirs(tmp_path)
        (pseudo / "a.txt").write_text("0 0.5 0.5 0.2 0.2 0.9\n")
        (gt / "a.txt").write_text("0 0.5 0.5 0.2 0.2\n")
        r = evaluate_pseudo_labels(pseudo, gt, 0.4)
        assert (r.tp, r.fp, r.fn) == (1, 0, 0)
        assert r.precision == 1.0 and r.recall == 1.0 and r.f1 == 1.0

    def test_fp_fn_counting(self, tmp_path):
        pseudo, gt = self.make_dirs(tmp_path)
        # 2 preds: one matches, one is far off; 2 GT: one matched, one missed
        (pseudo / "a.txt").write_text(
            "0 0.5 0.5 0.2 0.2 0.9\n0 0.9 0.9 0.05 0.05 0.5\n"
        )
        (gt / "a.txt").write_text("0 0.5 0.5 0.2 0.2\n0 0.2 0.2 0.1 0.1\n")
        r = evaluate_pseudo_labels(pseudo, gt, 0.4)
        assert (r.tp, r.fp, r.fn) == (1, 1, 1)
        assert r.per_class[0] == {"tp": 1, "fp": 1, "fn": 1}

    def test_missing_gt_counted_not_scored(self, tmp_path):
        pseudo, gt = self.make_dirs(tmp_path)
        (pseudo / "a.txt").write_text("0 0.5 0.5 0.2 0.2 0.9\n")
        r = evaluate_pseudo_labels(pseudo, gt, 0.4)
        assert r.missing_gt == 1 and r.tp == 0 and r.fp == 0

    def test_class_mismatch_is_fp_and_fn(self, tmp_path):
        pseudo, gt = self.make_dirs(tmp_path)
        (pseudo / "a.txt").write_text("1 0.5 0.5 0.2 0.2 0.9\n")
        (gt / "a.txt").write_text("0 0.5 0.5 0.2 0.2\n")
        r = evaluate_pseudo_labels(pseudo, gt, 0.4)
        assert (r.tp, r.fp, r.fn) == (0, 1, 1)
        assert r.per_class[0]["fn"] == 1 and r.per_class[1]["fp"] == 1

    def test_render_smoke(self, tmp_path):
        pseudo, gt = self.make_dirs(tmp_path)
        (pseudo / "a.txt").write_text("0 0.5 0.5 0.2 0.2 0.9\n")
        (gt / "a.txt").write_text("0 0.5 0.5 0.2 0.2\n")
        out = evaluate_pseudo_labels(pseudo, gt, 0.4).render(0.4, ["person"])
        assert "Precision 1.000" in out and "person" in out


class TestSplit:
    def test_counts_and_remainder(self, tmp_path):
        src = tmp_path / "src"
        (src / "images").mkdir(parents=True)
        (src / "labels").mkdir()
        for i in range(10):
            (src / "images" / f"im{i:02d}.jpg").write_bytes(b"x")
            (src / "labels" / f"im{i:02d}.txt").write_text("0 0.5 0.5 0.1 0.1\n")
        sizes = split_dataset(src, tmp_path / "dst", [5, 2, 2], seed=42)
        assert sizes == [5, 2, 2, 1]
        assert len(list((tmp_path / "dst" / "part1" / "images").iterdir())) == 5
        assert len(list((tmp_path / "dst" / "part4" / "images").iterdir())) == 1
        # labels travel with their images
        assert len(list((tmp_path / "dst" / "part1" / "labels").iterdir())) == 5

    def test_deterministic_with_seed(self, tmp_path):
        for run in ("a", "b"):
            src = tmp_path / run / "src"
            (src / "images").mkdir(parents=True)
            (src / "labels").mkdir()
            for i in range(6):
                (src / "images" / f"im{i}.jpg").write_bytes(b"x")
                (src / "labels" / f"im{i}.txt").write_text("")
            split_dataset(src, tmp_path / run / "dst", [3], seed=7)
        a = sorted(p.name for p in (tmp_path / "a/dst/part1/images").iterdir())
        b = sorted(p.name for p in (tmp_path / "b/dst/part1/images").iterdir())
        assert a == b

    def test_named_parts(self, tmp_path):
        src = tmp_path / "src"
        (src / "images").mkdir(parents=True)
        (src / "labels").mkdir()
        for i in range(4):
            (src / "images" / f"im{i}.jpg").write_bytes(b"x")
            (src / "labels" / f"im{i}.txt").write_text("")
        split_dataset(
            src, tmp_path / "dst", [2, 1], seed=1,
            part_names=["train", "val", "unlabels"],
        )
        assert (tmp_path / "dst" / "train" / "images").exists()
        assert (tmp_path / "dst" / "unlabels" / "images").exists()
