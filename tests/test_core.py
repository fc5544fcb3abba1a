"""Tests for config tree, mesh helpers, and checkpointing."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gcssl_tpu.core import (
    CalibratorConfig,
    CheckpointManager,
    apply_overrides,
    config_from_dict,
    config_to_dict,
    data_sharding,
    load_config,
    make_mesh,
)


class TestConfig:
    def test_defaults_mirror_reference_yaml(self):
        # Values from /root/reference/cgan/config.yaml
        cfg = CalibratorConfig()
        assert cfg.data.img_size == 128
        assert cfg.train.batch_size == 128
        assert cfg.train.n_epochs == 500
        assert cfg.train.lr == 2.0e-4
        assert cfg.train.beta1 == 0.5
        assert cfg.train.lambda_iou == 1.0
        assert cfg.model.spectral_norm is True
        assert cfg.model.delta_scale == 0.3
        assert cfg.model.generator_type == "unet"
        assert cfg.train.early_stop.patience == 20
        assert cfg.train.early_stop.min_delta == 1.0e-5
        assert cfg.data.train_split == 0.8
        assert cfg.train.seed == 42
        assert cfg.data.iou_threshold == 0.25
        assert cfg.train.lambda_gp == 1.0
        assert cfg.train.n_critic == 2

    def test_roundtrip_dict(self):
        cfg = CalibratorConfig()
        d = config_to_dict(cfg)
        cfg2 = config_from_dict(CalibratorConfig, d)
        assert cfg2 == cfg

    def test_partial_dict(self):
        cfg = config_from_dict(
            CalibratorConfig, {"train": {"lr": 1e-3, "early_stop": {"patience": 3}}}
        )
        assert cfg.train.lr == 1e-3
        assert cfg.train.early_stop.patience == 3
        assert cfg.train.beta1 == 0.5  # untouched default

    def test_unknown_key_raises(self):
        with pytest.raises(KeyError):
            config_from_dict(CalibratorConfig, {"nonsense": 1})

    def test_overrides(self):
        cfg = CalibratorConfig()
        cfg2 = apply_overrides(
            cfg, {"train.lr": 5e-5, "model.generator_type": "simple"}
        )
        assert cfg2.train.lr == 5e-5
        assert cfg2.model.generator_type == "simple"
        assert cfg.train.lr == 2e-4  # original untouched (frozen-style copy)

    def test_yaml_load(self, tmp_path):
        p = tmp_path / "c.yaml"
        p.write_text("train:\n  batch_size: 32\nmodel:\n  delta_scale: 0.25\n")
        cfg = load_config(p)
        assert cfg.train.batch_size == 32
        assert cfg.model.delta_scale == 0.25


class TestMesh:
    def test_eight_virtual_devices(self):
        mesh = make_mesh()
        assert mesh.devices.size == 8  # conftest forces 8 CPU devices
        assert mesh.axis_names == ("data",)

    def test_data_sharding_splits_batch(self):
        mesh = make_mesh()
        sh = data_sharding(mesh)
        x = jax.device_put(jnp.zeros((16, 4)), sh)
        assert len(x.addressable_shards) == 8
        assert x.addressable_shards[0].data.shape == (2, 4)


class TestCheckpoint:
    def test_save_restore_roundtrip(self, tmp_path):
        mgr = CheckpointManager(tmp_path)
        state = {
            "params": {"w": jnp.arange(6.0).reshape(2, 3)},
            "step": jnp.asarray(7),
            "rng": jax.random.key_data(jax.random.PRNGKey(0)),
        }
        mgr.save("best", state, {"delta_iou": 0.01, "epoch": 4})
        target = jax.tree.map(jnp.zeros_like, state)
        restored = mgr.restore("best", target)
        np.testing.assert_array_equal(
            np.asarray(restored["params"]["w"]), np.asarray(state["params"]["w"])
        )
        assert int(restored["step"]) == 7
        assert mgr.metadata("best")["delta_iou"] == 0.01
        assert mgr.exists("best") and not mgr.exists("last")


class TestReleaseWeights:
    def test_save_load_roundtrip(self, tmp_path):
        import numpy as np

        from gcssl_tpu.core.release import (
            is_release_file,
            load_release,
            save_release,
        )

        params = {"backbone": {"w": np.arange(12, dtype=np.float32).reshape(3, 4)},
                  "head": {"b": np.zeros(5, np.float32)}}
        out = tmp_path / "model.msgpack.gz"
        save_release(params, out, {"map50": 0.5, "kind": "detector"})
        assert is_release_file(out)
        got, meta = load_release(out)
        assert meta["map50"] == 0.5
        np.testing.assert_array_equal(got["backbone"]["w"], params["backbone"]["w"])

    def test_detector_init_from_release(self, tmp_path):
        """train_detector's init_from grafts params out of a .gz release."""
        import jax
        import numpy as np

        from gcssl_tpu.core.config import DetectorConfig, apply_overrides
        from gcssl_tpu.core.release import save_release
        from gcssl_tpu.train.detector import create_detector_state

        cfg = apply_overrides(
            DetectorConfig(),
            {"img_size": 64, "width_mult": 0.25, "max_boxes": 4},
        )
        state, _, _ = create_detector_state(cfg, jax.random.PRNGKey(0))
        params = jax.device_get(state.params)
        # perturb one leaf so the graft is observable
        leaf_path = next(iter(params))
        out = tmp_path / "det.msgpack.gz"
        save_release(params, out, {"kind": "detector"})

        from pathlib import Path

        import gzip

        from flax import serialization

        blob = Path(out).read_bytes()
        assert blob[:2] == b"\x1f\x8b"
        raw = serialization.msgpack_restore(gzip.decompress(blob))
        assert "params" in raw and leaf_path in raw["params"]


def test_plateau_rel_threshold_matches_torch_for_negative_best():
    """torch mode='max' threshold_mode='rel': a > best*(1+thr) — for a
    negative best the bar RELAXES (review finding r2)."""
    from gcssl_tpu.train.schedule import ReduceLROnPlateau

    s = ReduceLROnPlateau(initial_lr=1.0, patience=0, threshold=1e-4)
    s.step(-0.1)                     # establishes best=-0.1
    # torch accepts anything > -0.1 * (1 + 1e-4) = -0.10001
    assert s._is_better(-0.100005)   # inside the relaxed band
    assert not s._is_better(-0.100011)
