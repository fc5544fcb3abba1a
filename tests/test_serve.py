"""AOT serving artifacts: export -> single-file load -> numerical identity
with the live model, batch polymorphism, and container-format errors."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gcssl_tpu.core.config import CalibratorConfig, DetectorConfig, apply_overrides
from gcssl_tpu.serve import (
    ServedModel,
    export_calibrator,
    export_detector_predict,
    export_fn,
    read_artifact,
    smoke_check,
)


def det_cfg():
    return DetectorConfig(
        img_size=64, width_mult=0.25, depth_mult=0.33,
        compute_dtype="float32", max_boxes=8, seed=0,
    )


def calib_cfg():
    return apply_overrides(
        CalibratorConfig(),
        {"data.img_size": 32, "model.generator_type": "simple",
         "train.compute_dtype": "float32"},
    )


class TestContainer:
    def test_roundtrip_and_bad_magic(self, tmp_path):
        (b,) = jax.export.symbolic_shape("b")
        spec = jax.ShapeDtypeStruct((b, 3), jnp.float32)
        p = export_fn(lambda x: x * 2.0, (spec,), tmp_path / "m.aot",
                      {"kind": "toy"}, platforms=("cpu",))
        meta, blob = read_artifact(p)
        assert meta["kind"] == "toy" and meta["format"] == "gcssl-aot-v1"
        assert len(blob) > 0 and meta["in_avals"]

        bad = tmp_path / "bad.aot"
        bad.write_bytes(b"NOTANARTIFACT" + blob)
        with pytest.raises(ValueError, match="bad magic"):
            read_artifact(bad)

    def test_symbolic_batch_serves_multiple_sizes(self, tmp_path):
        (b,) = jax.export.symbolic_shape("b")
        spec = jax.ShapeDtypeStruct((b, 3), jnp.float32)
        p = export_fn(lambda x: jnp.sum(x, axis=1), (spec,),
                      tmp_path / "m.aot", {"kind": "toy"}, platforms=("cpu",))
        m = ServedModel.load(p)
        for n in (1, 2, 5):
            out = m(np.ones((n, 3), np.float32))
            np.testing.assert_allclose(np.asarray(out), np.full(n, 3.0))


class TestDetectorExport:
    def test_exported_matches_live_predict(self, tmp_path):
        from gcssl_tpu.train.detector import (
            create_detector_state, eval_params, make_detector_predict,
        )

        cfg = det_cfg()
        state, model, _ = create_detector_state(cfg, jax.random.PRNGKey(0))
        params = eval_params(cfg, state)
        p = export_detector_predict(
            cfg, params, tmp_path / "det.aot",
            conf_thr=0.0, iou_thr=0.5, platforms=("cpu",),
        )

        served = ServedModel.load(p)
        rng = np.random.default_rng(0)
        for n in (2, 3):  # two batch sizes through one symbolic-b artifact
            imgs = rng.integers(0, 255, (n, 64, 64, 3)).astype(np.uint8)
            boxes_s, scores_s, valid_s = served(imgs)
            predict = make_detector_predict(cfg, model)
            boxes_l, scores_l, valid_l = predict(
                params, jnp.asarray(imgs), 0.0, 0.5, False, False
            )
            np.testing.assert_allclose(
                np.asarray(boxes_s), np.asarray(boxes_l), atol=1e-5
            )
            np.testing.assert_allclose(
                np.asarray(scores_s), np.asarray(scores_l), atol=1e-6
            )
            np.testing.assert_array_equal(
                np.asarray(valid_s), np.asarray(valid_l)
            )

    def test_bf16_params_export(self, tmp_path):
        """bfloat16 weight storage: near-half artifact size, outputs within
        weight-quantization tolerance of the f32 export."""
        from gcssl_tpu.train.detector import create_detector_state, eval_params

        cfg = det_cfg()
        state, _, _ = create_detector_state(cfg, jax.random.PRNGKey(0))
        params = eval_params(cfg, state)
        p32 = export_detector_predict(
            cfg, params, tmp_path / "f32.aot", conf_thr=0.0, iou_thr=0.5,
            platforms=("cpu",),
        )
        p16 = export_detector_predict(
            cfg, params, tmp_path / "bf16.aot", conf_thr=0.0, iou_thr=0.5,
            params_dtype="bfloat16", platforms=("cpu",),
        )
        assert p16.stat().st_size < 0.75 * p32.stat().st_size
        m32, m16 = ServedModel.load(p32), ServedModel.load(p16)
        assert m16.meta["params_dtype"] == "bfloat16"
        imgs = np.random.default_rng(3).integers(
            0, 255, (2, 64, 64, 3)
        ).astype(np.uint8)
        b32, s32, _ = m32(imgs)
        b16, s16, _ = m16(imgs)
        # a random-init net at conf 0 has near-tied scores, so NMS ordering
        # (hence box rows) legitimately reshuffles under bf16 weight
        # quantization — compare the score distributions, not row order
        np.testing.assert_allclose(
            np.sort(np.asarray(s16), axis=None),
            np.sort(np.asarray(s32), axis=None),
            atol=0.02,
        )
        assert np.isfinite(np.asarray(b16)).all()

    def test_meta_records_operating_point(self, tmp_path):
        from gcssl_tpu.train.detector import create_detector_state, eval_params

        cfg = det_cfg()
        state, _, _ = create_detector_state(cfg, jax.random.PRNGKey(0))
        p = export_detector_predict(
            cfg, eval_params(cfg, state), tmp_path / "det.aot",
            conf_thr=0.85, iou_thr=0.4, batch=4, platforms=("cpu",),
        )
        meta, _ = read_artifact(p)
        assert meta["kind"] == "detector_predict"
        assert meta["conf_thr"] == 0.85 and meta["iou_thr"] == 0.4
        assert meta["batch"] == 4 and meta["img_size"] == 64
        res = smoke_check(p, batch=4)
        assert res["kind"] == "detector_predict"


class TestServedPredictFn:
    def _artifact(self, tmp_path, **export_kw):
        from gcssl_tpu.train.detector import create_detector_state, eval_params

        cfg = det_cfg()
        state, _, _ = create_detector_state(cfg, jax.random.PRNGKey(0))
        p = export_detector_predict(
            cfg, eval_params(cfg, state), tmp_path / "det.aot",
            platforms=("cpu",), **export_kw,
        )
        return cfg, p

    def test_operating_point_mismatch_raises(self, tmp_path):
        from gcssl_tpu.serve import as_predict_fn, load_model

        _, p = self._artifact(tmp_path, conf_thr=0.25, iou_thr=0.45)
        fn = as_predict_fn(load_model(p))
        imgs = np.zeros((2, 64, 64, 3), np.uint8)
        fn(None, imgs, 0.25, 0.45)  # matching point serves
        with pytest.raises(ValueError, match="operating point"):
            fn(None, imgs, 0.85, 0.45)

    def test_pipeline_runs_from_artifact(self, tmp_path):
        """predict_to_tree — the pseudo-labeling consumer — end-to-end from
        a served artifact with params=None (baked in)."""
        from PIL import Image

        from gcssl_tpu.pipeline.detect import predict_to_tree
        from gcssl_tpu.serve import as_predict_fn, load_model

        cfg, p = self._artifact(tmp_path, conf_thr=0.0, iou_thr=0.5)
        img_dir = tmp_path / "imgs"
        img_dir.mkdir()
        rng = np.random.default_rng(0)
        for i in range(3):
            Image.fromarray(
                rng.integers(0, 255, (48, 72, 3)).astype(np.uint8)
            ).save(img_dir / f"im{i}.jpg")

        served = load_model(p)
        n = predict_to_tree(
            cfg, as_predict_fn(served), None, img_dir, tmp_path / "labels",
            conf_thr=0.0, iou_thr=0.5,
        )
        assert n >= 0
        assert sorted(f.name for f in (tmp_path / "labels").glob("*.txt")) == [
            "im0.txt", "im1.txt", "im2.txt",
        ]


class TestCalibratorExport:
    def test_exported_matches_live_generator(self, tmp_path):
        from gcssl_tpu.models.generators import build_generator
        from gcssl_tpu.ops.boxes import delta_apply_inference

        cfg = calib_cfg()
        g_model = build_generator(
            cfg.model.generator_type, cfg.model.delta_scale, jnp.float32
        )
        s = cfg.data.img_size
        g_params = g_model.init(
            jax.random.PRNGKey(1), jnp.zeros((1, s, s, 3), jnp.float32)
        )["params"]
        p = export_calibrator(cfg, g_params, tmp_path / "g.aot",
                              platforms=("cpu",))

        served = ServedModel.load(p)
        rng = np.random.default_rng(2)
        patches = rng.uniform(-1, 1, (3, s, s, 3)).astype(np.float32)
        boxes = np.column_stack(
            [rng.uniform(0.4, 0.6, (3, 2)), rng.uniform(0.2, 0.3, (3, 2))]
        ).astype(np.float32)
        out_s = served(patches, boxes)

        deltas = g_model.apply({"params": g_params}, jnp.asarray(patches))
        out_l = delta_apply_inference(jnp.asarray(boxes), deltas)
        np.testing.assert_allclose(
            np.asarray(out_s), np.asarray(out_l), atol=1e-6
        )
        # refined boxes respect the inference clamp envelope
        out = np.asarray(out_s)
        assert (out[:, :2] >= 0.05 - 1e-6).all()
        assert (out[:, :2] <= 0.95 + 1e-6).all()


class TestExportBudgetAndPlatforms:
    def test_native_platform_none(self, tmp_path):
        """platforms=None = native single-platform lowering (the annotated
        default-alternative); must export and serve, with meta recording
        None."""
        from gcssl_tpu.train.detector import create_detector_state, eval_params

        cfg = det_cfg()
        state, _, _ = create_detector_state(cfg, jax.random.PRNGKey(0))
        p = export_detector_predict(
            cfg, eval_params(cfg, state), tmp_path / "det_native.aot",
            conf_thr=0.1, iou_thr=0.5, platforms=None,
        )
        meta, _ = read_artifact(p)
        assert meta["platforms"] is None
        served = ServedModel.load(p)
        out = served(np.zeros((2, 64, 64, 3), np.uint8))
        assert np.asarray(out[0]).shape[0] == 2

    def test_meta_records_detection_budget(self, tmp_path):
        """pre_nms_topk / max_out are frozen into the artifact; the meta
        must record them so eval-parity mismatches are diagnosable."""
        from gcssl_tpu.train.detector import create_detector_state, eval_params

        cfg = det_cfg()
        state, _, _ = create_detector_state(cfg, jax.random.PRNGKey(0))
        p = export_detector_predict(
            cfg, eval_params(cfg, state), tmp_path / "det_budget.aot",
            conf_thr=0.0, iou_thr=0.5, platforms=("cpu",),
            pre_nms_topk=64, max_out=7,
        )
        meta, _ = read_artifact(p)
        assert meta["pre_nms_topk"] == 64 and meta["max_out"] == 7
        served = ServedModel.load(p)
        boxes, scores, valid = served(np.zeros((2, 64, 64, 3), np.uint8))
        assert np.asarray(boxes).shape[1] == 7  # frozen per-image budget
