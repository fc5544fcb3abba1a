"""Calibration pipeline unit tests with a tiny generator (CPU)."""

import numpy as np
import pytest

import jax

from gcssl_tpu.core import CalibratorConfig, apply_overrides
from gcssl_tpu.pipeline.calibrate import (
    Calibrator,
    calibrate_file,
    calibrate_tree,
    load_calibrator_from_checkpoint,
)
from gcssl_tpu.train import create_train_state


@pytest.fixture(scope="module")
def tiny_calibrator():
    cfg = apply_overrides(
        CalibratorConfig(),
        {"data.img_size": 32, "model.generator_type": "simple",
         "train.compute_dtype": "float32"},
    )
    state, g_model, _ = create_train_state(cfg, jax.random.PRNGKey(0))
    return Calibrator(g_model, state.g_params, img_size=32, max_boxes=8)


class TestCalibrator:
    def test_boxes_stay_valid(self, tiny_calibrator):
        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, (120, 160, 3), dtype=np.uint8)
        boxes = np.asarray(
            [[0.5, 0.5, 0.3, 0.3], [0.2, 0.3, 0.1, 0.2]], np.float32
        )
        out = tiny_calibrator.calibrate_boxes(img, boxes)
        assert out.shape == boxes.shape
        # inference clamps: cx,cy in [0.05,0.95], w,h in [0.01,0.9]
        assert (out[:, :2] >= 0.05).all() and (out[:, :2] <= 0.95).all()
        assert (out[:, 2:] >= 0.01).all() and (out[:, 2:] <= 0.9).all()

    def test_empty_boxes(self, tiny_calibrator):
        img = np.zeros((64, 64, 3), np.uint8)
        out = tiny_calibrator.calibrate_boxes(img, np.zeros((0, 4), np.float32))
        assert out.shape == (0, 4)

    def test_more_boxes_than_max_chunks(self, tiny_calibrator):
        rng = np.random.default_rng(1)
        img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        boxes = np.column_stack(
            [rng.uniform(0.3, 0.7, (20, 2)), rng.uniform(0.1, 0.3, (20, 2))]
        ).astype(np.float32)
        out = tiny_calibrator.calibrate_boxes(img, boxes)
        assert out.shape == (20, 4)

    def test_calibrate_file_preserves_cls_conf(self, tiny_calibrator, tmp_path):
        from PIL import Image

        rng = np.random.default_rng(2)
        img_path = tmp_path / "a.jpg"
        Image.fromarray(
            rng.integers(0, 255, (100, 100, 3), dtype=np.uint8)
        ).save(img_path)
        pred = tmp_path / "a_pred.txt"
        pred.write_text("1 0.5 0.5 0.2 0.2 0.87\n0 0.3 0.3 0.1 0.1\n")
        n = calibrate_file(tiny_calibrator, img_path, pred, tmp_path / "out.txt")
        assert n == 2
        rows = [l.split() for l in (tmp_path / "out.txt").read_text().splitlines()]
        assert rows[0][0] == "1" and len(rows[0]) == 6  # cls + conf kept
        assert rows[1][0] == "0" and len(rows[1]) == 5  # no conf row stays 5

    def test_calibrate_tree(self, tiny_calibrator, tmp_path):
        from PIL import Image

        (tmp_path / "images").mkdir()
        (tmp_path / "labels").mkdir()
        rng = np.random.default_rng(3)
        for i in range(2):
            Image.fromarray(
                rng.integers(0, 255, (80, 80, 3), dtype=np.uint8)
            ).save(tmp_path / "images" / f"im{i}.jpg")
            (tmp_path / "labels" / f"im{i}.txt").write_text(
                "0 0.5 0.5 0.2 0.2 0.9\n"
            )
        n = calibrate_tree(
            tiny_calibrator, tmp_path / "images", tmp_path / "labels",
            tmp_path / "out",
        )
        assert n == 2
        assert len(list((tmp_path / "out").glob("*.txt"))) == 2


class TestCheckpointRoundtrip:
    def test_load_calibrator_from_checkpoint(self, tmp_path):
        from gcssl_tpu.core.checkpoint import CheckpointManager

        cfg = apply_overrides(
            CalibratorConfig(),
            {"data.img_size": 32, "model.generator_type": "simple",
             "train.compute_dtype": "float32"},
        )
        state, g_model, _ = create_train_state(cfg, jax.random.PRNGKey(0))
        mgr = CheckpointManager(tmp_path)
        mgr.save("best", jax.device_get(state), {"epoch": 1})
        cal = load_calibrator_from_checkpoint(tmp_path, cfg, max_boxes=4)
        img = np.zeros((64, 64, 3), np.uint8)
        out = cal.calibrate_boxes(img, np.asarray([[0.5, 0.5, 0.2, 0.2]], np.float32))
        assert np.isfinite(out).all()
