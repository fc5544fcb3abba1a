"""Golden tests for geometry ops against hand-computed values and an
independent numpy oracle of the reference formulas
(/root/reference/cgan/losses.py, /root/reference/cgan/dataset.py)."""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from gcssl_tpu.ops import (
    cxcywh_to_xyxy,
    xyxy_to_cxcywh,
    iou_elementwise,
    iou_pairwise,
    eiou,
    eiou_loss,
    smooth_clamp,
    delta_encode,
    delta_apply,
    delta_apply_inference,
)


def np_iou_cxcywh(b1, b2):
    """Independent oracle: scalar IoU of two cxcywh boxes (exact union)."""
    a = [b1[0] - b1[2] / 2, b1[1] - b1[3] / 2, b1[0] + b1[2] / 2, b1[1] + b1[3] / 2]
    b = [b2[0] - b2[2] / 2, b2[1] - b2[3] / 2, b2[0] + b2[2] / 2, b2[1] + b2[3] / 2]
    iw = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
    ih = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = iw * ih
    union = b1[2] * b1[3] + b2[2] * b2[3] - inter
    return 0.0 if union == 0 else inter / union


class TestConversions:
    def test_roundtrip(self):
        rng = np.random.default_rng(0)
        boxes = rng.uniform(0.05, 0.5, size=(17, 4)).astype(np.float32)
        out = xyxy_to_cxcywh(cxcywh_to_xyxy(jnp.asarray(boxes)))
        np.testing.assert_allclose(np.asarray(out), boxes, atol=1e-6)

    def test_known_corner(self):
        box = jnp.asarray([0.5, 0.5, 0.2, 0.4])
        np.testing.assert_allclose(
            np.asarray(cxcywh_to_xyxy(box)), [0.4, 0.3, 0.6, 0.7], atol=1e-7
        )


class TestIoU:
    def test_identical(self):
        b = jnp.asarray([[0.5, 0.5, 0.2, 0.2]])
        assert float(iou_elementwise(b, b)[0]) == pytest.approx(1.0, abs=1e-4)

    def test_disjoint(self):
        a = jnp.asarray([[0.2, 0.2, 0.1, 0.1]])
        b = jnp.asarray([[0.8, 0.8, 0.1, 0.1]])
        assert float(iou_elementwise(a, b)[0]) == 0.0

    def test_hand_value(self):
        # Two unit-offset boxes: overlap 0.1x0.2 = 0.02, union 0.04+0.04-0.02
        a = jnp.asarray([[0.5, 0.5, 0.2, 0.2]])
        b = jnp.asarray([[0.6, 0.5, 0.2, 0.2]])
        assert float(iou_elementwise(a, b)[0]) == pytest.approx(
            0.02 / 0.06, rel=1e-4
        )

    def test_matches_oracle_random(self):
        rng = np.random.default_rng(1)
        a = rng.uniform(0.1, 0.9, (50, 4)).astype(np.float32)
        a[:, 2:] = rng.uniform(0.05, 0.3, (50, 2))
        b = rng.uniform(0.1, 0.9, (50, 4)).astype(np.float32)
        b[:, 2:] = rng.uniform(0.05, 0.3, (50, 2))
        ours = np.asarray(iou_elementwise(jnp.asarray(a), jnp.asarray(b)))
        want = np.array([np_iou_cxcywh(x, y) for x, y in zip(a, b)])
        np.testing.assert_allclose(ours, want, atol=1e-4)

    def test_pairwise_shape_and_values(self):
        rng = np.random.default_rng(2)
        a = np.column_stack(
            [rng.uniform(0.2, 0.8, (5, 2)), rng.uniform(0.05, 0.3, (5, 2))]
        ).astype(np.float32)
        b = np.column_stack(
            [rng.uniform(0.2, 0.8, (7, 2)), rng.uniform(0.05, 0.3, (7, 2))]
        ).astype(np.float32)
        mat = np.asarray(iou_pairwise(jnp.asarray(a), jnp.asarray(b)))
        assert mat.shape == (5, 7)
        for i in range(5):
            for j in range(7):
                assert mat[i, j] == pytest.approx(
                    np_iou_cxcywh(a[i], b[j]), abs=1e-4
                )


class TestEIoU:
    def test_identical_boxes_score_one(self):
        b = jnp.asarray([[0.5, 0.5, 0.2, 0.2]])
        # center/w/h penalty terms vanish; IoU ~ 1 (up to eps in denominator)
        assert float(eiou(b, b)[0]) == pytest.approx(1.0, abs=1e-4)

    def test_hand_value(self):
        # pred (0.5,0.5,0.2,0.2), target (0.6,0.5,0.2,0.2):
        # iou = 0.02/(0.06+eps); enclose w=0.3 h=0.2, c2=0.09+0.04=0.13
        # center = 0.01; w_dist = h_dist = 0
        p = jnp.asarray([[0.5, 0.5, 0.2, 0.2]])
        t = jnp.asarray([[0.6, 0.5, 0.2, 0.2]])
        want = 0.02 / 0.06 - 0.01 / 0.13
        assert float(eiou(p, t)[0]) == pytest.approx(want, abs=1e-4)

    def test_loss_is_one_minus_mean(self):
        rng = np.random.default_rng(3)
        p = np.column_stack(
            [rng.uniform(0.3, 0.7, (9, 2)), rng.uniform(0.1, 0.3, (9, 2))]
        ).astype(np.float32)
        t = p + rng.normal(0, 0.02, p.shape).astype(np.float32)
        l = float(eiou_loss(jnp.asarray(p), jnp.asarray(t)))
        e = np.asarray(eiou(jnp.asarray(p), jnp.asarray(t)))
        assert l == pytest.approx(1.0 - e.mean(), abs=1e-5)

    def test_masked_loss(self):
        p = jnp.asarray([[0.5, 0.5, 0.2, 0.2], [0.9, 0.9, 0.1, 0.1]])
        t = jnp.asarray([[0.5, 0.5, 0.2, 0.2], [0.1, 0.1, 0.1, 0.1]])
        w = jnp.asarray([1.0, 0.0])
        assert float(eiou_loss(p, t, weights=w)) == pytest.approx(0.0, abs=1e-3)


class TestSmoothClamp:
    def test_center_maps_to_midpoint(self):
        assert float(smooth_clamp(jnp.asarray(0.0), -1.5, 1.5)) == pytest.approx(0.0)

    def test_formula(self):
        # lo + (hi-lo)*sigmoid((x-center)/T), T=0.5 (losses.py:99-106)
        x = 0.7
        want = -1.5 + 3.0 / (1.0 + math.exp(-(x - 0.0) / 0.5))
        assert float(smooth_clamp(jnp.asarray(x), -1.5, 1.5)) == pytest.approx(
            want, abs=1e-6
        )

    def test_limits(self):
        assert float(smooth_clamp(jnp.asarray(100.0), -1.5, 1.5)) == pytest.approx(1.5)
        assert float(smooth_clamp(jnp.asarray(-100.0), -1.5, 1.5)) == pytest.approx(-1.5)


class TestDeltaCodec:
    def test_encode_matches_reference_formula(self):
        # oracle re-derived from dataset.py:73-101
        gt = np.array([0.52, 0.48, 0.22, 0.31], np.float32)
        pred = np.array([0.5, 0.5, 0.2, 0.3], np.float32)
        norm = max(math.sqrt(0.2 * 0.3), 0.05)
        want = [
            (0.52 - 0.5) / norm,
            (0.48 - 0.5) / norm,
            math.log(min(10.0, max(0.1, 0.22 / 0.2))),
            math.log(min(10.0, max(0.1, 0.31 / 0.3))),
        ]
        got = np.asarray(delta_encode(jnp.asarray(gt), jnp.asarray(pred)))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_encode_small_box_norm_floor(self):
        gt = np.array([0.2, 0.2, 0.01, 0.01], np.float32)
        pred = np.array([0.1, 0.1, 0.01, 0.01], np.float32)
        got = np.asarray(delta_encode(jnp.asarray(gt), jnp.asarray(pred)))
        # norm floor 0.05 -> dx = 0.1/0.05 = 2
        assert got[0] == pytest.approx(2.0, abs=1e-4)

    def test_encode_ratio_clamp(self):
        gt = np.array([0.5, 0.5, 1.0, 0.001], np.float32)
        pred = np.array([0.5, 0.5, 0.01, 0.5], np.float32)
        got = np.asarray(delta_encode(jnp.asarray(gt), jnp.asarray(pred)))
        assert got[2] == pytest.approx(math.log(10.0), abs=1e-4)
        assert got[3] == pytest.approx(math.log(0.1), abs=1e-4)

    def test_apply_eval_mode_hand_value(self):
        box = jnp.asarray([[0.5, 0.5, 0.2, 0.3]])
        delta = jnp.asarray([[0.5, -0.5, 0.2, -0.2]])
        got = np.asarray(delta_apply(box, delta, training=False))[0]
        want = [
            0.5 + 0.5 * 0.2,
            0.5 - 0.5 * 0.3,
            0.2 * math.exp(0.2),
            0.3 * math.exp(-0.2),
        ]
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_apply_eval_clamps(self):
        box = jnp.asarray([[0.9, 0.9, 0.5, 0.5]])
        delta = jnp.asarray([[5.0, 5.0, 5.0, 5.0]])
        got = np.asarray(delta_apply(box, delta, training=False))[0]
        # delta clamped to 1.5 -> cx = 0.9+1.5*0.5 = 1.65 -> clamp 0.95
        # w = 0.5*exp(min(1.5,1.0)) = 0.5*e -> clamp 0.8
        np.testing.assert_allclose(got, [0.95, 0.95, 0.8, 0.8], atol=1e-5)

    def test_apply_train_mode_uses_smooth_clamp(self):
        box = jnp.asarray([[0.5, 0.5, 0.2, 0.3]])
        delta = jnp.asarray([[0.0, 0.0, 0.0, 0.0]])
        got = np.asarray(delta_apply(box, delta, training=True))[0]
        # smooth-clamped identity delta: cx stays near 0.5 after smooth box
        # clamp (sigmoid((0.5-0.5)/0.5) = 0.5 -> exactly midpoint 0.5)
        assert got[0] == pytest.approx(0.5, abs=1e-6)
        # w=0.2: smooth_clamp(0.2, 0.02, 0.8) = 0.02+0.78*sigmoid((0.2-0.41)/0.5)
        want_w = 0.02 + 0.78 / (1 + math.exp((0.41 - 0.2) / 0.5))
        assert got[2] == pytest.approx(want_w, abs=1e-5)

    def test_roundtrip_encode_apply_recovers_gt(self):
        # For boxes well inside bounds and moderate deltas, applying the
        # encoded delta in the *dataset* convention should recover GT.
        # NOTE: train/eval apply uses delta*w (not *norm) for centers, i.e.
        # the codec pair is intentionally asymmetric in the reference too
        # (dataset.py:208-215 vs losses.py:108-150). We check the dataset
        # convention: cx + dx*norm etc.
        gt = np.array([0.52, 0.47, 0.25, 0.35], np.float32)
        pred = np.array([0.5, 0.5, 0.2, 0.3], np.float32)
        d = np.asarray(delta_encode(jnp.asarray(gt), jnp.asarray(pred)))
        norm = max(math.sqrt(0.2 * 0.3), 0.05)
        assert pred[0] + d[0] * norm == pytest.approx(gt[0], abs=1e-5)
        assert pred[1] + d[1] * norm == pytest.approx(gt[1], abs=1e-5)
        assert pred[2] * math.exp(d[2]) == pytest.approx(gt[2], abs=1e-5)
        assert pred[3] * math.exp(d[3]) == pytest.approx(gt[3], abs=1e-5)

    def test_inference_variant_clamps(self):
        box = jnp.asarray([[0.5, 0.5, 0.2, 0.3]])
        delta = jnp.asarray([[3.0, 0.0, 1.8, 0.0]])
        got = np.asarray(delta_apply_inference(box, delta))[0]
        # delta clamped to 2 -> cx = 0.5 + 2*0.2 = 0.9 (inside [0.05,0.95])
        assert got[0] == pytest.approx(0.9, abs=1e-5)
        # no inner exp clip at inference: w = 0.2*exp(1.8)
        assert got[1] == pytest.approx(0.5, abs=1e-5)
        assert got[2] == pytest.approx(min(0.9, 0.2 * math.exp(1.8)), abs=1e-5)
