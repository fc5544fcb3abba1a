"""TensorBoard event-file writer: framing, proto encoding, logger wiring."""

import struct

import numpy as np
import pytest

from gcssl_tpu.obs.tensorboard import TBWriter, _crc32c, _masked_crc, read_events


class TestCrc32c:
    def test_known_vectors(self):
        # RFC 3720 B.4 test vectors (CRC32C/Castagnoli)
        assert _crc32c(b"\x00" * 32) == 0x8A9136AA
        assert _crc32c(bytes(range(32))) == 0x46DD794E
        assert _crc32c(b"123456789") == 0xE3069283

    def test_mask_is_tfrecord_mask(self):
        crc = _crc32c(b"abc")
        want = (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF
        assert _masked_crc(b"abc") == want


class TestTBWriter:
    def test_scalar_roundtrip(self, tmp_path):
        w = TBWriter(tmp_path)
        w.scalar("val/delta_iou", 0.0771, step=3)
        w.scalars({"loss_G": 1.5, "epoch": 3, "name": "x", "nanv": float("nan")},
                  step=4, prefix="train/")
        w.close()
        evs = read_events(w.path)
        assert evs[0]["file_version"] == "brain.Event:2"
        assert evs[1]["step"] == 3
        assert evs[1]["scalars"]["val/delta_iou"] == pytest.approx(0.0771, abs=1e-6)
        # non-numeric and non-finite entries dropped, numeric kept
        assert evs[2]["scalars"]["train/loss_G"] == pytest.approx(1.5)
        assert evs[2]["scalars"]["train/epoch"] == pytest.approx(3.0)
        assert "train/name" not in evs[2]["scalars"]
        assert "train/nanv" not in evs[2]["scalars"]

    def test_histogram_roundtrip(self, tmp_path):
        w = TBWriter(tmp_path)
        vals = np.random.default_rng(0).normal(size=1000)
        w.histogram("G/weight", vals, step=1)
        w.close()
        evs = read_events(w.path)
        assert evs[1]["histograms"]["G/weight"] == pytest.approx(1000.0)

    def test_watch_logs_per_leaf(self, tmp_path):
        w = TBWriter(tmp_path)
        tree = {"dense": {"kernel": np.ones((4, 4)), "bias": np.zeros(4)}}
        w.watch(tree, step=2, prefix="G")
        w.close()
        evs = read_events(w.path)
        tags = {t for e in evs for t in e["histograms"]}
        assert tags == {"G/dense/kernel", "G/dense/bias"}

    def test_truncated_tail_record_is_ignored(self, tmp_path):
        w = TBWriter(tmp_path)
        w.scalar("a", 1.0, step=0)
        w.close()
        data = w.path.read_bytes()
        w.path.write_bytes(data + struct.pack("<Q", 999) + b"\x00\x00\x00\x00")
        evs = read_events(w.path)
        assert len(evs) == 2  # version + scalar; garbage tail dropped

    def test_metrics_logger_writes_events(self, tmp_path):
        from gcssl_tpu.obs import MetricsLogger

        lg = MetricsLogger(tmp_path, console=False)
        lg.log({"epoch": 1, "delta_iou": 0.01})
        lg.log({"epoch": 2, "delta_iou": 0.02})
        lg.watch({"w": np.ones(8)}, step=2)
        lg.finalize()
        files = list((tmp_path / "tb").glob("events.out.tfevents.*"))
        assert len(files) == 1
        evs = read_events(files[0])
        scalar_evs = [e for e in evs if e["scalars"]]
        assert scalar_evs[0]["step"] == 1
        assert scalar_evs[1]["scalars"]["delta_iou"] == pytest.approx(0.02)
        assert any("params/w" in e["histograms"] for e in evs)
