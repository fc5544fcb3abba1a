"""CLI surface tests: parser coverage + host-only commands end-to-end."""

import json

import numpy as np
import pytest

from gcssl_tpu.cli import build_parser, main


class TestParser:
    @pytest.mark.parametrize(
        "argv",
        [
            ["split", "--src", "a", "--dst", "b"],
            ["train-detector", "--train-dir", "a", "--save-dir", "b"],
            ["predict", "--weights-dir", "w", "--images", "i", "--out-labels", "o"],
            ["two-stage", "--weights-dir", "w", "--source", "s", "--dest", "d"],
            ["kfold", "--train-dir", "t", "--output", "o"],
            ["train-calibrator", "--data-dir", "d", "--save-dir", "s"],
            ["calibrate", "--weights-dir", "w"],
            ["compare", "--pseudo", "p", "--gt", "g"],
            ["paired-patches", "--root", "r", "--out", "o"],
            ["eval-detector", "--weights-dir", "w", "--data-dir", "d"],
            ["iterate", "--labeled-dir", "l", "--pseudo-images", "i",
             "--pseudo-labels", "p", "--merged-dir", "m", "--val-dir", "v",
             "--save-dir", "s"],
            ["pretrain", "--images", "i", "--save-dir", "s"],
            ["export-model", "detector", "--weights-dir", "w", "--out", "o"],
            ["train-ssl"],
        ],
    )
    def test_all_subcommands_parse(self, argv):
        args = build_parser().parse_args(argv)
        assert args.cmd == argv[0]

    def test_detector_arch_flags_reach_config(self):
        from gcssl_tpu.cli import _detector_cfg

        args = build_parser().parse_args(
            ["train-detector", "--train-dir", "a", "--save-dir", "b",
             "--width-mult", "0.75", "--depth-mult", "0.67",
             "--init-from", "bb.msgpack"]
        )
        cfg = _detector_cfg(args)
        assert (cfg.width_mult, cfg.depth_mult) == (0.75, 0.67)
        assert args.init_from == "bb.msgpack"

    def test_missing_required_flag_errors(self, capsys):
        with pytest.raises(SystemExit):
            build_parser().parse_args(["split", "--src", "only"])


class TestHostCommands:
    def test_split_main(self, tmp_path, capsys):
        src = tmp_path / "src"
        (src / "images").mkdir(parents=True)
        (src / "labels").mkdir()
        for i in range(6):
            (src / "images" / f"im{i}.jpg").write_bytes(b"x")
            (src / "labels" / f"im{i}.txt").write_text("0 .5 .5 .1 .1\n")
        rc = main(["split", "--src", str(src), "--dst", str(tmp_path / "dst"),
                   "--counts", "3", "2"])
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["sizes"] == [3, 2, 1]

    def test_compare_main(self, tmp_path, capsys):
        (tmp_path / "p").mkdir()
        (tmp_path / "g").mkdir()
        (tmp_path / "p" / "a.txt").write_text("0 0.5 0.5 0.2 0.2 0.9\n")
        (tmp_path / "g" / "a.txt").write_text("0 0.5 0.5 0.2 0.2\n")
        rc = main(["compare", "--pseudo", str(tmp_path / "p"),
                   "--gt", str(tmp_path / "g")])
        assert rc == 0
        assert "Precision 1.000" in capsys.readouterr().out

    def test_pretrain_main(self, tmp_path, capsys):
        """End-to-end `pretrain` on a tiny synthetic pool (CPU-fast)."""
        from PIL import Image

        img_dir = tmp_path / "pool"
        img_dir.mkdir()
        rng = np.random.default_rng(0)
        for i in range(8):
            arr = rng.integers(0, 255, (40, 56, 3), np.uint8)
            Image.fromarray(arr).save(img_dir / f"u{i}.png")
        rc = main([
            "pretrain", "--images", str(img_dir),
            "--save-dir", str(tmp_path / "out"),
            "--epochs", "1", "--view-size", "64", "--pack-size", "80",
            "--batch-size", "4", "--width-mult", "0.25",
            "--cache", str(tmp_path / "pack.npz"),
        ])
        assert rc == 0
        assert (tmp_path / "out" / "backbone.msgpack").exists()
        assert (tmp_path / "pack.npz").exists()
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out == {"images": 8, "epochs": 1}

    def test_paired_patches_main(self, tmp_path, capsys):
        from tests.test_data_calibrator import make_synthetic_root

        root = make_synthetic_root(tmp_path)
        rc = main(["paired-patches", "--root", str(root),
                   "--out", str(tmp_path / "out"), "--img-size", "32"])
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["pairs_written"] == 3

    def test_export_model_main(self, tmp_path, capsys):
        """export-model end-to-end from a release weights file, with the
        reload-and-run smoke check."""
        import jax

        from gcssl_tpu.core.config import DetectorConfig
        from gcssl_tpu.core.release import save_release
        from gcssl_tpu.train.detector import create_detector_state, eval_params

        cfg = DetectorConfig(
            img_size=64, width_mult=0.25, depth_mult=0.33,
            compute_dtype="float32", max_boxes=8, seed=0,
        )
        state, _, _ = create_detector_state(cfg, jax.random.PRNGKey(0))
        rel = tmp_path / "det.msgpack.gz"
        save_release(eval_params(cfg, state), rel)

        out = tmp_path / "det.aot"
        rc = main([
            "export-model", "detector", "--weights-dir", str(rel),
            "--out", str(out), "--img-size", "64",
            "--width-mult", "0.25", "--depth-mult", "0.33",
            "--platforms", "cpu", "--batch", "2", "--check",
        ])
        assert rc == 0 or rc is None
        assert out.exists()
        res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert res["check"]["kind"] == "detector_predict"
        assert all(s[0] == 2 for s in res["check"]["out_shapes"])

    def test_load_detector_uses_release_meta_arch(self, tmp_path, capsys):
        """A release file's recorded width/depth is authoritative when the
        CLI arch flags are not explicitly given: loading an 0.25-width
        release with no flags must restore onto the 0.25 arch, not the
        0.5 default (which raises a param-shape error)."""
        import jax

        from gcssl_tpu.core.config import DetectorConfig
        from gcssl_tpu.core.release import save_release
        from gcssl_tpu.train.detector import create_detector_state, eval_params

        cfg = DetectorConfig(
            img_size=64, width_mult=0.25, depth_mult=0.33,
            compute_dtype="float32", max_boxes=8, seed=0,
        )
        state, _, _ = create_detector_state(cfg, jax.random.PRNGKey(0))
        rel = tmp_path / "det.msgpack.gz"
        save_release(eval_params(cfg, state), rel,
                     metadata={"width_mult": 0.25, "depth_mult": 0.33})

        out = tmp_path / "det_meta.aot"
        rc = main([
            "export-model", "detector", "--weights-dir", str(rel),
            "--out", str(out), "--img-size", "64",
            "--platforms", "cpu", "--batch", "2", "--check",
        ])
        assert rc == 0 or rc is None
        res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert res["check"]["kind"] == "detector_predict"
