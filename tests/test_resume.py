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
