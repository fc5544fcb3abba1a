"""Crash-resume tests: interrupted runs restart from 'last' and continue."""

import json

import numpy as np
import pytest

import jax

from gcssl_tpu.core import apply_overrides
from gcssl_tpu.train import train_calibrator
from tests.test_train_wgan_gp import synthetic_arrays, tiny_config


class TestCalibratorResume:
    def test_resume_continues_epoch_count(self, tmp_path):
        cfg = tiny_config(tmp_path)
        cfg = apply_overrides(cfg, {"train.ckpt_every_epochs": 1})
        arrays = synthetic_arrays(n=24)
        _, h1 = train_calibrator(cfg, arrays, max_epochs=2)
        assert [h["epoch"] for h in h1] == [1, 2]
        # resume and run 2 more
        _, h2 = train_calibrator(cfg, arrays, max_epochs=4, resume=True)
        assert [h["epoch"] for h in h2] == [1, 2, 3, 4]
        hist = json.loads((tmp_path / "runs" / "training_history.json").read_text())
        assert len(hist) == 4

    def test_resume_restores_scheduler_state(self, tmp_path):
        import json as _json

        cfg = tiny_config(tmp_path)
        cfg = apply_overrides(cfg, {"train.ckpt_every_epochs": 1})
        arrays = synthetic_arrays(n=24)
        train_calibrator(cfg, arrays, max_epochs=2)
        meta = _json.loads((tmp_path / "runs" / "last.json").read_text())
        assert "lr" in meta and meta["lr"] > 0
        assert "sched_best" in meta and "bad_epochs" in meta

    def test_resume_without_checkpoint_is_fresh(self, tmp_path):
        cfg = tiny_config(tmp_path)
        arrays = synthetic_arrays(n=24)
        _, h = train_calibrator(cfg, arrays, max_epochs=1, resume=True)
        assert [x["epoch"] for x in h] == [1]


class TestDetectorResumePastEnd:
    def test_relaunch_of_completed_run_is_a_noop(self, tmp_path):
        """The watchdog relaunches completed runs (artifact-gated stages can
        still re-enter train_detector with resume=True): a resume whose
        start epoch is past n_epochs must return the restored state with an
        EMPTY history and must NOT clobber 'last'/results.json."""
        import json

        import jax

        from gcssl_tpu.pipeline.detect import train_detector
        from tests.test_detector_dp import tiny_cfg
        from tests.test_fold_parallel import synth_arrays

        cfg = tiny_cfg(batch_size=4, epochs=1)
        arrays = synth_arrays(n=4)
        save = tmp_path / "run"
        _, _, h1 = train_detector(cfg, arrays, None, save_dir=save)
        assert len(h1) == 1
        results = (save / "results.json").read_text()
        _, _, h2 = train_detector(
            cfg, arrays, None, save_dir=save, resume=True
        )
        assert h2 == []
        assert (save / "results.json").read_text() == results


class TestReleaseSnapshots:
    """Params-only release snapshots during long runs (core/release.py):
    run checkpoints are gitignored and die with the workspace; the
    git-tracked snapshot is the recovery artifact."""

    def test_trainer_writes_release_on_best(self, tmp_path):
        from gcssl_tpu.core.release import load_release
        from gcssl_tpu.pipeline.detect import train_detector
        from tests.test_detector_dp import tiny_cfg
        from tests.test_fold_parallel import synth_arrays

        cfg = tiny_cfg(batch_size=4, epochs=2, ema_decay=0.9)
        rel = tmp_path / "w" / "det.msgpack.gz"
        train_detector(
            cfg, synth_arrays(n=4), synth_arrays(n=4, seed=1),
            save_dir=tmp_path / "run", release_path=rel, release_min_s=0.0,
        )
        assert rel.exists()
        params, meta = load_release(rel)
        assert meta["kind"] == "detector"
        assert meta["width_mult"] == cfg.width_mult
        assert "map50" in meta
        assert jax.tree.leaves(params)

    def test_bf16_snapshot_grafts_back_to_f32_state(self, tmp_path):
        import jax.numpy as jnp

        from gcssl_tpu.core.release import load_release, save_release
        from gcssl_tpu.pipeline.detect import train_detector
        from gcssl_tpu.train.detector import create_detector_state
        from tests.test_detector_dp import tiny_cfg
        from tests.test_fold_parallel import synth_arrays

        cfg = tiny_cfg(batch_size=4, epochs=1)
        state, _, _ = create_detector_state(cfg, jax.random.PRNGKey(0))
        rel = tmp_path / "snap.msgpack.gz"
        save_release(state.params, rel, {"kind": "detector"},
                     compresslevel=1, dtype=jnp.bfloat16)
        params, _ = load_release(rel)
        # load_release casts float leaves back to f32: every consumer
        # (teacher predict, export, AOT serving) assumes f32 params
        assert all(
            np.asarray(x).dtype == np.float32
            for x in jax.tree.leaves(params)
            if np.issubdtype(np.asarray(x).dtype, np.floating)
        )
        # init_from graft keeps the fresh state's f32 (a bf16 leaf inside
        # an f32 train state breaks the optimizer's dtype match)
        state2, _, h = train_detector(
            cfg, synth_arrays(n=4), None, init_from=rel, max_epochs=1,
        )
        assert all(
            np.asarray(x).dtype == np.float32
            for x in jax.tree.leaves(jax.device_get(state2.params))
            if np.issubdtype(np.asarray(x).dtype, np.floating)
        )


class TestCalibratorReleaseSnapshot:
    def test_calibrator_writes_release_on_best(self, tmp_path):
        from gcssl_tpu.core.release import load_release

        cfg = tiny_config(tmp_path)
        arrays = synthetic_arrays(n=24)
        rel = tmp_path / "g.msgpack.gz"
        train_calibrator(cfg, arrays, max_epochs=2,
                         release_path=rel, release_min_s=0.0)
        assert rel.exists()
        params, meta = load_release(rel)
        assert meta["kind"] == "calibrator_g"
        assert "delta_iou" in meta
        assert jax.tree.leaves(params)
