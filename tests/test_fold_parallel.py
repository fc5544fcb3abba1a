"""Fold-parallel k-fold training: step equivalence vs the single-fold path,
multi-device fold+data meshes, and the kfold pipeline smoke on disk."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gcssl_tpu.core.config import DetectorConfig, PseudoLabelConfig
from gcssl_tpu.data.detection import DetectionArrays
from gcssl_tpu.parallel.fold_parallel import (
    _stack,
    make_fold_mesh,
    make_fold_train_step,
    train_folds,
)
from gcssl_tpu.train.detector import (
    create_detector_state,
    make_detector_train_step,
)


def tiny_cfg(**over):
    d = dict(
        img_size=64, width_mult=0.25, depth_mult=0.33, batch_size=2,
        compute_dtype="float32", max_boxes=4, mosaic=False, epochs=2,
        warmup_epochs=0, close_mosaic_epochs=0, patience=50, seed=0,
    )
    d.update(over)
    return DetectorConfig(**d)


def synth_arrays(n=8, size=64, seed=0):
    rng = np.random.default_rng(seed)
    return DetectionArrays(
        images=rng.integers(0, 255, (n, size, size, 3), dtype=np.uint8),
        boxes=np.tile(
            np.asarray([[0.5, 0.5, 0.4, 0.4]], np.float32), (n, 1, 1)
        ).reshape(n, 1, 4),
        cls=np.zeros((n, 1), np.int32),
        mask=np.ones((n, 1), bool),
        names=[f"i{k}" for k in range(n)],
        orig_wh=np.tile([size, size], (n, 1)).astype(np.float32),
        img_size=size,
    )


class TestFoldStep:
    def test_vstep_matches_single_fold_steps(self):
        """One fold-parallel step == K independent single-fold steps."""
        cfg = tiny_cfg()
        k, bs = 2, cfg.batch_size
        rng = np.random.default_rng(3)
        im4 = rng.integers(0, 255, (k, bs, 4, 64, 64, 3), dtype=np.uint8)
        b4 = rng.uniform(0.3, 0.7, (k, bs, 4, 1, 4)).astype(np.float32)
        m4 = np.ones((k, bs, 4, 1), bool)
        w = np.ones((k, bs), np.float32)

        states, model, tx = [], None, None
        for _ in range(k):
            st, model, tx = create_detector_state(cfg, jax.random.PRNGKey(0))
            states.append(jax.device_get(st))

        # single-fold reference path (jitted step with donation -> use copies)
        sstep = make_detector_train_step(cfg, model, tx)
        singles = []
        for f in range(k):
            st = jax.tree.map(jnp.asarray, states[f])
            st2, met = sstep(
                st, jnp.asarray(im4[f]), jnp.asarray(b4[f]),
                jnp.asarray(m4[f]), jnp.asarray(w[f]), jnp.float32(1e-3),
                use_mosaic=False,
            )
            singles.append((jax.device_get(st2), jax.device_get(met)))

        mesh = make_fold_mesh(k)
        vstep = make_fold_train_step(cfg, model, tx, mesh)
        stacked = _stack([jax.tree.map(jnp.asarray, s) for s in states])
        st2, met = vstep(
            stacked, jnp.asarray(im4), jnp.asarray(b4), jnp.asarray(m4),
            jnp.asarray(w), jnp.float32(1e-3), use_mosaic=False,
        )
        st2, met = jax.device_get(st2), jax.device_get(met)
        for f in range(k):
            np.testing.assert_allclose(
                met["loss"][f], singles[f][1]["loss"], rtol=1e-4
            )
            a = jax.tree.leaves(st2.params)
            b = jax.tree.leaves(singles[f][0].params)
            for la, lb in zip(a, b):
                np.testing.assert_allclose(la[f], lb, rtol=1e-4, atol=1e-6)

    def test_four_folds_on_four_devices_mosaic(self):
        """4 folds over 4 devices, mosaic path on: runs and stays finite."""
        if len(jax.devices()) < 4:
            pytest.skip("needs 4 devices")
        cfg = tiny_cfg(batch_size=2)
        k, bs = 4, 2
        rng = np.random.default_rng(5)
        im4 = rng.integers(0, 255, (k, bs, 4, 64, 64, 3), dtype=np.uint8)
        b4 = np.tile(
            np.asarray([0.5, 0.5, 0.4, 0.4], np.float32), (k, bs, 4, 1, 1)
        )
        m4 = np.ones((k, bs, 4, 1), bool)
        w = np.ones((k, bs), np.float32)
        st, model, tx = create_detector_state(cfg, jax.random.PRNGKey(0))
        stacked = _stack([jax.tree.map(jnp.copy, st) for _ in range(k)])
        mesh = make_fold_mesh(k)
        vstep = make_fold_train_step(cfg, model, tx, mesh)
        st2, met = vstep(
            stacked, jnp.asarray(im4), jnp.asarray(b4), jnp.asarray(m4),
            jnp.asarray(w), jnp.float32(1e-3), use_mosaic=True,
        )
        met = jax.device_get(met)
        assert np.isfinite(met["loss"]).all() and met["loss"].shape == (k,)


class TestTrainFolds:
    def test_folds_diverge_and_early_bookkeeping(self):
        cfg = tiny_cfg()
        arrays = synth_arrays(n=8)
        # two folds with disjoint training data
        folds = [
            (np.arange(0, 4), np.arange(4, 8)),
            (np.arange(4, 8), np.arange(0, 4)),
        ]
        val = synth_arrays(n=4, seed=9)
        best, hists, model = train_folds(
            cfg, arrays, folds, val_arrays=val, max_epochs=2,
        )
        assert len(best) == 2 and len(hists) == 2
        assert [r["epoch"] for r in hists[0]] == [1, 2]
        assert all("map50" in r for r in hists[0])
        # different training data -> different learned params
        la, lb = jax.tree.leaves(best[0]), jax.tree.leaves(best[1])
        assert any(
            not np.allclose(x, y, atol=1e-7) for x, y in zip(la, lb)
        )

    def test_data_parallel_folds(self):
        """2 folds x 4-way DP through the public train_folds path: per-fold
        histories finite, folds diverge, batch sharded over each fold's
        data group."""
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 devices")
        cfg = tiny_cfg(batch_size=4)
        arrays = synth_arrays(n=8)
        folds = [
            (np.arange(0, 4), np.arange(4, 8)),
            (np.arange(4, 8), np.arange(0, 4)),
        ]
        best, hists, _ = train_folds(
            cfg, arrays, folds, max_epochs=2, data_parallel=4,
        )
        assert len(best) == 2
        assert all(np.isfinite(r["loss"]) for h in hists for r in h)
        la, lb = jax.tree.leaves(best[0]), jax.tree.leaves(best[1])
        assert any(
            not np.allclose(x, y, atol=1e-7) for x, y in zip(la, lb)
        )

    def test_batch_not_divisible_by_data_axis_raises(self):
        if len(jax.devices()) < 4:
            pytest.skip("needs 4 devices")
        cfg = tiny_cfg(batch_size=3)
        arrays = synth_arrays(n=4)
        folds = [(np.arange(0, 2), np.arange(2, 4)),
                 (np.arange(2, 4), np.arange(0, 2))]
        with pytest.raises(ValueError, match="not divisible"):
            train_folds(cfg, arrays, folds, max_epochs=1, data_parallel=2)

    def test_unequal_folds_wrap(self):
        cfg = tiny_cfg()
        arrays = synth_arrays(n=7)
        folds = [
            (np.arange(0, 4), np.arange(4, 7)),
            (np.arange(4, 7), np.arange(0, 4)),   # smaller fold wraps
        ]
        best, hists, _ = train_folds(cfg, arrays, folds, max_epochs=1)
        assert len(best) == 2
        assert np.isfinite(hists[1][0]["loss"])


class TestKfoldParallelPipeline:
    def test_pipeline_smoke(self, tmp_path):
        from PIL import Image

        from gcssl_tpu.pipeline.kfold import kfold_pseudo_label

        root = tmp_path / "train"
        (root / "images").mkdir(parents=True)
        (root / "labels").mkdir()
        rng = np.random.default_rng(0)
        n = 6
        for i in range(n):
            Image.fromarray(
                rng.integers(0, 255, (72, 96, 3), dtype=np.uint8)
            ).save(root / "images" / f"t{i}.jpg")
            (root / "labels" / f"t{i}.txt").write_text("0 0.5 0.5 0.4 0.4\n")

        det_cfg = tiny_cfg(epochs=1)
        pl_cfg = PseudoLabelConfig(kfolds=2, kfold_conf=0.0, kfold_iou_nms=0.9)
        merged = kfold_pseudo_label(
            det_cfg, pl_cfg, root / "images", None, tmp_path / "out",
            copy_images=True, max_epochs=1, fold_parallel=True,
        )
        assert merged.exists()
        for fold in (1, 2):
            froot = tmp_path / "out" / f"fold_{fold:02d}"
            assert (froot / "train_list.txt").exists()
            assert (froot / "done.txt").exists()
            assert (froot / "train" / "results.json").exists()
        # every image got a pseudo-label file at conf floor 0
        labels = list((merged / "labels").glob("*.txt"))
        assert len(labels) == n

    def test_sequential_pipeline_dp(self, tmp_path):
        """Sequential fold loop with dp=2: each fold trains and predicts
        data-parallel; artifacts match the single-device contract."""
        if len(jax.devices()) < 2:
            pytest.skip("needs 2 devices")
        from PIL import Image

        from gcssl_tpu.pipeline.kfold import kfold_pseudo_label

        root = tmp_path / "train"
        (root / "images").mkdir(parents=True)
        (root / "labels").mkdir()
        rng = np.random.default_rng(1)
        n = 6
        for i in range(n):
            Image.fromarray(
                rng.integers(0, 255, (72, 96, 3), dtype=np.uint8)
            ).save(root / "images" / f"t{i}.jpg")
            (root / "labels" / f"t{i}.txt").write_text("0 0.5 0.5 0.4 0.4\n")

        det_cfg = tiny_cfg(epochs=1, batch_size=4)
        pl_cfg = PseudoLabelConfig(kfolds=2, kfold_conf=0.0, kfold_iou_nms=0.9)
        merged = kfold_pseudo_label(
            det_cfg, pl_cfg, root / "images", None, tmp_path / "out",
            copy_images=False, max_epochs=1, dp=2,
        )
        labels = list((merged / "labels").glob("*.txt"))
        assert len(labels) == n
