"""The shipped config presets must load into the typed trees."""

from pathlib import Path

import pytest

from gcssl_tpu.core.config import (
    CalibratorConfig,
    DetectorConfig,
    SSLClassifierConfig,
    load_config,
)

CONFIGS = Path(__file__).resolve().parent.parent / "configs"


class TestPresets:
    def test_calibrator_preset(self):
        cfg = load_config(CONFIGS / "calibrator.yaml", CalibratorConfig)
        assert cfg.train.batch_size == 128
        assert cfg.data.device_patches is True
        assert cfg.train.early_stop.patience == 20

    def test_detector_preset(self):
        cfg = load_config(CONFIGS / "detector.yaml", DetectorConfig)
        assert cfg.img_size == 640 and cfg.mosaic is True

    @pytest.mark.parametrize(
        "name,labeled,classes",
        [
            ("ssl_mnist_100.yaml", 100, 10),
            ("ssl_svhn_1000.yaml", 1000, 10),
            ("ssl_cifar10_4000.yaml", 4000, 10),
            ("ssl_cifar100_10k.yaml", 10000, 100),
            ("ssl_imagenet32.yaml", 100000, 1000),
        ],
    )
    def test_ssl_presets(self, name, labeled, classes):
        cfg = load_config(CONFIGS / name, SSLClassifierConfig)
        assert cfg.num_labeled == labeled
        assert cfg.num_classes == classes
