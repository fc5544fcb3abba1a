"""Detector tests: shapes, assignment, loss, overfit-one-batch, predict+NMS,
mAP evaluator golden cases."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gcssl_tpu.core.config import DetectorConfig
from gcssl_tpu.eval.map import evaluate_detections
from gcssl_tpu.models.detector import Detector, decode_all
from gcssl_tpu.train.detector import (
    assign_targets_level,
    create_detector_state,
    make_detector_predict,
    make_detector_train_step,
)


def small_cfg(**over):
    d = dict(
        img_size=128, width_mult=0.25, depth_mult=0.33, batch_size=4,
        compute_dtype="float32", max_boxes=10,
    )
    d.update(over)
    return DetectorConfig(**d)


class TestModel:
    def test_output_shapes(self):
        cfg = small_cfg()
        model = Detector(1, cfg.width_mult, cfg.depth_mult, jnp.float32)
        x = jnp.zeros((2, 128, 128, 3))
        params = model.init(jax.random.PRNGKey(0), x)["params"]
        outs = model.apply({"params": params}, x)
        assert len(outs) == 3
        for (cls, ltrb), s in zip(outs, (8, 16, 32)):
            assert cls.shape == (2, 128 // s, 128 // s, 1)
            assert ltrb.shape == (2, 128 // s, 128 // s, 4)
            assert (np.asarray(ltrb) >= 0).all()  # softplus positivity

    def test_decode_all(self):
        cfg = small_cfg()
        model = Detector(1, cfg.width_mult, cfg.depth_mult, jnp.float32)
        x = jnp.zeros((2, 128, 128, 3))
        params = model.init(jax.random.PRNGKey(0), x)["params"]
        scores, boxes = decode_all(model.apply({"params": params}, x), 128)
        n = 16 * 16 + 8 * 8 + 4 * 4
        assert scores.shape == (2, n, 1)
        assert boxes.shape == (2, n, 4)


class TestAssignment:
    def test_center_cell_positive(self):
        # one GT box at center, 40x40 px on a 128 image -> level 0 (max ltrb 20)
        gt = jnp.asarray([[0.5, 0.5, 40 / 128, 40 / 128]])
        mask = jnp.asarray([True])
        box_t, pos = assign_targets_level(gt, mask, 8, 16, 16, 128, level=0)
        pos = np.asarray(pos).reshape(16, 16)
        assert pos[8, 8] or pos[7, 7]  # center cells positive
        assert pos.sum() >= 1
        # positives target the GT xyxy in px
        bt = np.asarray(box_t).reshape(16, 16, 4)
        iy, ix = np.argwhere(pos)[0]
        np.testing.assert_allclose(bt[iy, ix], [44, 44, 84, 84], atol=1e-3)

    def test_small_box_not_assigned_to_higher_levels(self):
        # 40 px box: center-cell max-ltrb ~20 px < 64 -> level 0 only
        gt = jnp.asarray([[0.5, 0.5, 40 / 128, 40 / 128]])
        mask = jnp.asarray([True])
        _, pos0 = assign_targets_level(gt, mask, 8, 16, 16, 128, level=0)
        _, pos2 = assign_targets_level(gt, mask, 32, 4, 4, 128, level=2)
        assert np.asarray(pos0).any()
        assert not np.asarray(pos2).any()  # level-2 range starts at 128 px

    def test_masked_gt_ignored(self):
        gt = jnp.asarray([[0.5, 0.5, 0.3, 0.3]])
        _, pos = assign_targets_level(
            gt, jnp.asarray([False]), 8, 16, 16, 128, level=0
        )
        assert not np.asarray(pos).any()


def make_batch4(cfg, b=4, seed=0):
    """(images4, boxes4, mask4, w) with one centered box per source."""
    rng = np.random.default_rng(seed)
    images4 = jnp.asarray(
        rng.integers(0, 255, (b, 4, 128, 128, 3), dtype=np.uint8)
    )
    boxes4 = jnp.zeros((b, 4, cfg.max_boxes, 4)).at[:, :, 0, :].set(
        jnp.asarray([0.5, 0.5, 0.3, 0.3])
    )
    mask4 = jnp.zeros((b, 4, cfg.max_boxes), bool).at[:, :, 0].set(True)
    return images4, boxes4, mask4, jnp.ones(b, jnp.float32)


class TestTraining:
    def test_loss_decreases_overfitting_one_batch(self):
        cfg = small_cfg(ema_decay=0.0)
        state, model, tx = create_detector_state(cfg, jax.random.PRNGKey(0))
        step = make_detector_train_step(cfg, model, tx)
        images4, boxes4, mask4, w = make_batch4(cfg)
        losses = []
        for i in range(30):
            state, m = step(
                state, images4, boxes4, mask4, w, jnp.float32(1e-3),
                use_mosaic=False,
            )
            losses.append(float(m["loss"]))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0] * 0.7, f"no learning: {losses[::10]}"

    def test_mosaic_step_runs_and_ema_updates(self):
        cfg = small_cfg()
        state, model, tx = create_detector_state(cfg, jax.random.PRNGKey(0))
        step = make_detector_train_step(cfg, model, tx)
        images4, boxes4, mask4, w = make_batch4(cfg)
        ema_before = jax.device_get(state.ema_params)
        state, m = step(
            state, images4, boxes4, mask4, w, jnp.float32(1e-3), use_mosaic=True
        )
        assert np.isfinite(float(m["loss"]))
        changed = jax.tree.map(
            lambda a, b: not np.allclose(np.asarray(a), np.asarray(b)),
            ema_before, jax.device_get(state.ema_params),
        )
        assert any(jax.tree.leaves(changed))

    def test_mosaic_batch_geometry(self):
        from gcssl_tpu.train.detector import mosaic_batch

        rng = np.random.default_rng(1)
        imgs = jnp.asarray(rng.uniform(0, 1, (2, 4, 64, 64, 3)), jnp.float32)
        boxes = jnp.zeros((2, 4, 3, 4)).at[:, :, 0].set(
            jnp.asarray([0.5, 0.5, 0.4, 0.4])
        )
        mask = jnp.zeros((2, 4, 3), bool).at[:, :, 0].set(True)
        out, nb, nm = mosaic_batch(jax.random.PRNGKey(0), imgs, boxes, mask)
        assert out.shape == (2, 64, 64, 3)
        assert nb.shape == (2, 12, 4)
        nb, nm = np.asarray(nb), np.asarray(nm)
        # surviving boxes stay inside [0, 1] and in their quadrant scale
        assert (nb[nm][:, 2:] <= 0.75).all()
        assert nm.sum() >= 4  # the four source boxes survive

    def test_predict_shapes_and_validity(self):
        cfg = small_cfg()
        state, model, _ = create_detector_state(cfg, jax.random.PRNGKey(0))
        predict = make_detector_predict(cfg, model)
        images = jnp.zeros((2, 128, 128, 3), jnp.uint8)
        boxes, scores, valid = predict(state.params, images, 0.5, 0.45)
        assert boxes.shape == (2, cfg.max_boxes, 4)
        assert scores.shape == (2, cfg.max_boxes)
        assert valid.shape == (2, cfg.max_boxes)
        # untrained prior bias ~ -4.59 -> sigmoid ~0.01 < 0.5: nothing valid
        assert not np.asarray(valid).any()

    def test_predict_tta(self):
        cfg = small_cfg()
        state, model, _ = create_detector_state(cfg, jax.random.PRNGKey(0))
        predict = make_detector_predict(cfg, model)
        images = jnp.zeros((1, 128, 128, 3), jnp.uint8)
        out = predict(state.params, images, 0.001, 0.45, True)
        assert np.isfinite(np.asarray(out[0])).all()

    def test_predict_scale_tta(self):
        """Extra inference scales merge into the TTA candidate set; the
        fully-conv model decodes every scale to the same normalized box
        space, so outputs stay finite and in [0, 1]."""
        cfg = small_cfg()
        state, model, _ = create_detector_state(cfg, jax.random.PRNGKey(0))
        predict = make_detector_predict(cfg, model, tta_scales=(0.75, 1.25))
        images = jnp.zeros((1, 128, 128, 3), jnp.uint8)
        boxes, scores, valid = predict(state.params, images, 0.001, 0.45, True)
        boxes = np.asarray(boxes)
        assert np.isfinite(boxes).all()
        v = np.asarray(valid)[0]
        assert v.any()  # at conf 0.001 the untrained prior fires everywhere
        assert (boxes[0][v][:, :2] >= -0.3).all() and (boxes[0][v][:, :2] <= 1.3).all()

    def test_predict_fuse_matches_nms_survivor_scores(self):
        cfg = small_cfg()
        state, model, _ = create_detector_state(cfg, jax.random.PRNGKey(0))
        predict = make_detector_predict(cfg, model)
        images = jnp.zeros((1, 128, 128, 3), jnp.uint8)
        _, s_plain, v_plain = predict(state.params, images, 0.001, 0.45, True)
        b_f, s_f, v_f = predict(state.params, images, 0.001, 0.45, True, True)
        np.testing.assert_array_equal(np.asarray(v_plain), np.asarray(v_f))
        np.testing.assert_allclose(
            np.asarray(s_plain), np.asarray(s_f), rtol=1e-5
        )
        assert np.isfinite(np.asarray(b_f)).all()


class TestMAP:
    def test_perfect_predictions(self):
        gts = [np.asarray([[0.5, 0.5, 0.2, 0.2]]), np.asarray([[0.3, 0.3, 0.1, 0.1]])]
        preds = [g.copy() for g in gts]
        scores = [np.asarray([0.9]), np.asarray([0.8])]
        m = evaluate_detections(preds, scores, gts)
        assert m.map50 == pytest.approx(1.0, abs=1e-6)
        assert m.map50_95 == pytest.approx(1.0, abs=1e-6)

    def test_half_detected(self):
        gts = [np.asarray([[0.5, 0.5, 0.2, 0.2], [0.1, 0.1, 0.05, 0.05]])]
        preds = [np.asarray([[0.5, 0.5, 0.2, 0.2]])]
        scores = [np.asarray([0.9])]
        m = evaluate_detections(preds, scores, gts)
        assert 0.4 < m.map50 < 0.6

    def test_false_positive_hurts_precision(self):
        gts = [np.asarray([[0.5, 0.5, 0.2, 0.2]])]
        preds = [np.asarray([[0.5, 0.5, 0.2, 0.2], [0.9, 0.9, 0.05, 0.05]])]
        scores = [np.asarray([0.9, 0.95])]  # FP ranked first
        m = evaluate_detections(preds, scores, gts)
        assert m.map50 < 1.0

    def test_ultralytics_formula_vs_strict_step(self):
        """One TP covering half of 2 GT: Ultralytics' trapz-over-interp AP
        (with the (0, 1.0) sentinel) credits the linear ramp past the last
        achieved recall — hand value 0.75 — while strict right-step
        101-point sampling gives 51/101.  The reference's results.csv uses
        the former; parity comparisons must too."""
        gts = [np.asarray([[0.5, 0.5, 0.2, 0.2], [0.1, 0.1, 0.05, 0.05]])]
        preds = [np.asarray([[0.5, 0.5, 0.2, 0.2]])]
        scores = [np.asarray([0.9])]
        m = evaluate_detections(preds, scores, gts)
        assert m.map50 == pytest.approx(51 / 101, abs=1e-6)
        assert m.map50_u == pytest.approx(0.75, abs=1e-6)
        assert m.map50_u >= m.map50
        assert m.map50_95_u >= m.map50_95

    def test_localization_quality_separates_iou_thresholds(self):
        gts = [np.asarray([[0.5, 0.5, 0.2, 0.2]])]
        preds = [np.asarray([[0.52, 0.5, 0.2, 0.2]])]  # IoU ~ 0.82
        scores = [np.asarray([0.9])]
        m = evaluate_detections(preds, scores, gts)
        assert m.map50 == pytest.approx(1.0, abs=1e-6)
        assert m.map50_95 < 1.0
        assert m.ap_per_iou[-1] == 0.0  # IoU 0.95 not met

    def test_empty_predictions(self):
        gts = [np.asarray([[0.5, 0.5, 0.2, 0.2]])]
        m = evaluate_detections([np.zeros((0, 4))], [np.zeros(0)], gts)
        assert m.map50 == 0.0


class TestTAL:
    def test_assign_picks_inside_anchors(self):
        from gcssl_tpu.models.detector import anchor_grid
        from gcssl_tpu.train.assign import tal_assign

        anchors, _ = anchor_grid(128)
        n = anchors.shape[0]
        rng = np.random.default_rng(0)
        # predictions: small boxes centered at each anchor, uniform probs
        pred_boxes = jnp.concatenate(
            [anchors, jnp.full((n, 2), 0.1)], axis=-1
        )
        pred_probs = jnp.full((n,), 0.5)
        gt = jnp.asarray([[0.5, 0.5, 0.3, 0.3], [0, 0, 0, 0]])
        gmask = jnp.asarray([True, False])
        cls_t, box_t, pos = tal_assign(
            pred_boxes, pred_probs, gt, gmask, anchors, topk=10
        )
        pos = np.asarray(pos)
        assert 1 <= pos.sum() <= 30  # topk per level-capped positives
        # every positive anchor lies inside the GT box
        a = np.asarray(anchors)[pos]
        assert (np.abs(a - 0.5) <= 0.15 + 1e-6).all()
        # positives target the real GT
        np.testing.assert_allclose(
            np.asarray(box_t)[pos], np.tile([0.5, 0.5, 0.3, 0.3], (pos.sum(), 1))
        )
        # soft targets in (0, 1]
        ct = np.asarray(cls_t)
        assert (ct[pos] > 0).all() and (ct <= 1.0 + 1e-6).all()
        assert (ct[~pos] == 0).all()

    def test_conflict_resolves_to_higher_iou_gt(self):
        from gcssl_tpu.models.detector import anchor_grid
        from gcssl_tpu.train.assign import tal_assign

        anchors, _ = anchor_grid(128)
        n = anchors.shape[0]
        # large pred boxes so IoU with the big GT is higher
        pred_boxes = jnp.concatenate(
            [anchors, jnp.full((n, 2), 0.4)], axis=-1
        )
        pred_probs = jnp.full((n,), 0.5)
        # two overlapping GTs sharing center cells: big one wins (higher IoU
        # with the big predicted boxes)
        gt = jnp.asarray([[0.5, 0.5, 0.5, 0.5], [0.5, 0.5, 0.1, 0.1]])
        gmask = jnp.asarray([True, True])
        cls_t, box_t, pos = tal_assign(
            pred_boxes, pred_probs, gt, gmask, anchors, topk=4
        )
        pos = np.asarray(pos)
        bt = np.asarray(box_t)[pos]
        center = np.all(np.abs(np.asarray(anchors)[pos] - 0.5) < 0.05, axis=1)
        if center.any():
            assert (bt[center][:, 2] == 0.5).all()

    def test_tal_loss_finite_with_no_gt(self):
        from gcssl_tpu.train.detector import detection_loss_tal

        cfg = small_cfg()
        model = Detector(1, cfg.width_mult, cfg.depth_mult, jnp.float32)
        x = jnp.zeros((2, 128, 128, 3))
        params = model.init(jax.random.PRNGKey(0), x)["params"]
        outs = model.apply({"params": params}, x)
        gt = jnp.zeros((2, 5, 4))
        gmask = jnp.zeros((2, 5), bool)
        cls_l, box_l = detection_loss_tal(
            outs, gt, gmask, 128, jnp.ones(2, jnp.float32)
        )
        assert np.isfinite(float(cls_l)) and np.isfinite(float(box_l))
        assert float(box_l) == 0.0  # no positives -> no box loss

    def test_padded_rows_do_not_change_loss(self):
        from gcssl_tpu.train.detector import detection_loss_tal

        cfg = small_cfg()
        model = Detector(1, cfg.width_mult, cfg.depth_mult, jnp.float32)
        rng = np.random.default_rng(3)
        x1 = jnp.asarray(rng.uniform(0, 1, (1, 128, 128, 3)), jnp.float32)
        xg = jnp.asarray(rng.uniform(0, 1, (1, 128, 128, 3)), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), x1)["params"]
        gt1 = jnp.asarray([[[0.5, 0.5, 0.3, 0.3]]])
        m1 = jnp.asarray([[True]])
        outs1 = model.apply({"params": params}, x1)
        ref = detection_loss_tal(outs1, gt1, m1, 128, jnp.ones(1))
        # same image + a garbage padded row with weight 0
        x2 = jnp.concatenate([x1, xg])
        gt2 = jnp.concatenate([gt1, jnp.asarray([[[0.2, 0.8, 0.5, 0.5]]])])
        m2 = jnp.concatenate([m1, jnp.asarray([[True]])])
        outs2 = model.apply({"params": params}, x2)
        pad = detection_loss_tal(outs2, gt2, m2, 128, jnp.asarray([1.0, 0.0]))
        np.testing.assert_allclose(
            np.asarray(ref), np.asarray(pad), rtol=1e-5
        )


class TestAffine:
    def test_affine_shapes_and_box_validity(self):
        from gcssl_tpu.train.detector import affine_batch

        rng = np.random.default_rng(1)
        imgs = jnp.asarray(rng.uniform(0, 1, (4, 64, 64, 3)), jnp.float32)
        boxes = jnp.zeros((4, 3, 4)).at[:, 0].set(jnp.asarray([0.5, 0.5, 0.4, 0.4]))
        mask = jnp.zeros((4, 3), bool).at[:, 0].set(True)
        out, nb, nm = affine_batch(jax.random.PRNGKey(0), imgs, boxes, mask)
        assert out.shape == (4, 64, 64, 3)
        nb, nm = np.asarray(nb), np.asarray(nm)
        if nm.any():
            b = nb[nm]
            x1 = b[:, 0] - b[:, 2] / 2
            x2 = b[:, 0] + b[:, 2] / 2
            assert (x1 >= -1e-5).all() and (x2 <= 1 + 1e-5).all()

    def test_identity_affine_preserves_boxes(self):
        from gcssl_tpu.train.detector import affine_batch

        rng = np.random.default_rng(2)
        imgs = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)), jnp.float32)
        boxes = jnp.zeros((2, 2, 4)).at[:, 0].set(jnp.asarray([0.5, 0.5, 0.4, 0.4]))
        mask = jnp.zeros((2, 2), bool).at[:, 0].set(True)
        out, nb, nm = affine_batch(
            jax.random.PRNGKey(0), imgs, boxes, mask,
            zoom_range=(1.0, 1.0), translate=0.0,
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(imgs), atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(nb)[:, 0], [[0.5, 0.5, 0.4, 0.4]] * 2, atol=1e-6
        )
        assert np.asarray(nm)[:, 0].all()


class TestMosaicV2:
    def test_zoom_identity_center(self):
        from gcssl_tpu.train.detector import mosaic_batch

        # zoom=1 view shows an S-sized window of the 2S canvas; all four
        # sources contribute, total visible area == full output
        rng = np.random.default_rng(4)
        imgs = jnp.asarray(rng.uniform(0.2, 0.8, (1, 4, 64, 64, 3)), jnp.float32)
        boxes = jnp.zeros((1, 4, 2, 4)).at[:, :, 0].set(
            jnp.asarray([0.5, 0.5, 0.2, 0.2])
        )
        mask = jnp.zeros((1, 4, 2), bool).at[:, :, 0].set(True)
        out, nb, nm = mosaic_batch(
            jax.random.PRNGKey(1), imgs, boxes, mask, zoom_range=(1.0, 1.0)
        )
        o = np.asarray(out)[0]
        assert o.shape == (64, 64, 3)
        # canvas fully tiled: no black background pixels
        assert (o > 0.05).all()

    def test_compaction_keeps_valid_first(self):
        from gcssl_tpu.train.detector import _compact_boxes

        nbx = jnp.asarray(np.arange(24, dtype=np.float32).reshape(1, 6, 4))
        nm = jnp.asarray([[False, True, False, True, False, True]])
        cb, cm = _compact_boxes(nbx, nm, 3)
        assert cm.shape == (1, 3)
        assert np.asarray(cm).all()
        np.testing.assert_allclose(
            np.asarray(cb)[0, :, 0], [4.0, 12.0, 20.0]
        )


class TestNonPow2Width:
    def test_num_groups_divides(self):
        from gcssl_tpu.models.detector import _num_groups

        for f in (3, 24, 32, 48, 96, 192, 384, 512):
            g = _num_groups(f)
            assert f % g == 0 and 1 <= g <= 32

    def test_m_scale_width_builds(self):
        # width_mult 0.75 yields 48-channel stems (not divisible by 32);
        # GroupNorm groups must adapt (largest divisor <= 32).
        cfg = small_cfg(width_mult=0.75, depth_mult=0.67)
        model = Detector(1, cfg.width_mult, cfg.depth_mult, jnp.float32)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
        outs = model.apply(params, jnp.zeros((2, 128, 128, 3)))
        assert len(outs) == 3


class TestCopyPaste:
    def test_prob_zero_is_identity(self):
        from gcssl_tpu.train.detector import copy_paste_batch

        rng = np.random.default_rng(3)
        imgs = jnp.asarray(rng.uniform(0, 1, (3, 32, 32, 3)), jnp.float32)
        boxes = jnp.tile(jnp.asarray([0.5, 0.5, 0.3, 0.3]), (3, 2, 1))
        mask = jnp.ones((3, 2), bool)
        out, nb, nm = copy_paste_batch(
            jax.random.PRNGKey(0), imgs, boxes, mask, n_paste=2, prob=0.0
        )
        np.testing.assert_array_equal(np.asarray(out), np.asarray(imgs))
        np.testing.assert_array_equal(np.asarray(nb[:, :2]), np.asarray(boxes))
        assert np.asarray(nm[:, :2]).all() and not np.asarray(nm[:, 2:]).any()

    def test_paste_pixels_and_box(self):
        """Donor 0 is solid red; pasting its box onto image 1 must paint
        exactly the destination rect red and append that rect as GT."""
        from gcssl_tpu.train.detector import paste_instances

        s = 32
        imgs = jnp.stack([
            jnp.full((s, s, 3), jnp.asarray([1.0, 0.0, 0.0])),
            jnp.zeros((s, s, 3)),
        ])
        boxes = jnp.asarray([
            [[0.5, 0.5, 0.5, 0.5]],
            [[0.25, 0.25, 0.2, 0.2]],
        ], jnp.float32)
        mask = jnp.ones((2, 1), bool)
        donor = jnp.asarray([[0], [0]], jnp.int32)
        src = jnp.tile(jnp.asarray([0.5, 0.5, 0.5, 0.5]), (2, 1, 1))
        # integer-aligned dest rect on image 1: px [16,24) x [16,24)
        dst = jnp.tile(jnp.asarray([0.625, 0.625, 0.25, 0.25]), (2, 1, 1))
        on = jnp.asarray([[False], [True]])
        out, nb, nm = paste_instances(imgs, boxes, mask, donor, src, dst, on)
        out = np.asarray(out)
        np.testing.assert_array_equal(out[0], np.asarray(imgs[0]))  # off slot
        np.testing.assert_allclose(
            out[1, 16:24, 16:24], np.tile([1.0, 0.0, 0.0], (8, 8, 1)),
            atol=1e-5,
        )
        assert np.abs(out[1, :16]).max() == 0 and np.abs(out[1, :, :16]).max() == 0
        nb, nm = np.asarray(nb), np.asarray(nm)
        assert nm[1, 0] and nm[1, 1] and not nm[0, 1]
        np.testing.assert_allclose(nb[1, 1], [0.625, 0.625, 0.25, 0.25])

    def test_occluded_gt_dropped(self):
        """A GT box fully under an active paste rect loses its label; a
        barely-touched one keeps it."""
        from gcssl_tpu.train.detector import paste_instances

        s = 32
        imgs = jnp.zeros((2, s, s, 3))
        boxes = jnp.asarray([
            [[0.25, 0.25, 0.2, 0.2], [0.8, 0.8, 0.15, 0.15]],
            [[0.25, 0.25, 0.2, 0.2], [0.8, 0.8, 0.15, 0.15]],
        ], jnp.float32)
        mask = jnp.ones((2, 2), bool)
        donor = jnp.zeros((2, 1), jnp.int32)
        src = jnp.tile(jnp.asarray([0.5, 0.5, 0.5, 0.5]), (2, 1, 1))
        dst = jnp.tile(jnp.asarray([0.25, 0.25, 0.5, 0.5]), (2, 1, 1))
        on = jnp.asarray([[True], [False]])
        _, nb, nm = paste_instances(imgs, boxes, mask, donor, src, dst, on)
        nm = np.asarray(nm)
        assert not nm[0, 0]          # fully covered -> dropped
        assert nm[0, 1]              # untouched -> kept
        assert nm[1, 0] and nm[1, 1] # paste off -> both kept
        assert nm[0, 2] and not nm[1, 2]

    def test_later_paste_occludes_earlier(self):
        from gcssl_tpu.train.detector import paste_instances

        s = 32
        imgs = jnp.zeros((1, s, s, 3))
        boxes = jnp.asarray([[[0.5, 0.5, 0.9, 0.9]]], jnp.float32)
        mask = jnp.zeros((1, 1), bool)   # no real GT
        donor = jnp.zeros((1, 2), jnp.int32)
        src = jnp.tile(jnp.asarray([0.5, 0.5, 0.5, 0.5]), (1, 2, 1))
        dst = jnp.asarray(
            [[[0.5, 0.5, 0.2, 0.2], [0.5, 0.5, 0.4, 0.4]]], jnp.float32
        )
        on = jnp.ones((1, 2), bool)
        _, _, nm = paste_instances(imgs, boxes, mask, donor, src, dst, on)
        nm = np.asarray(nm)
        assert not nm[0, 1]   # paste 0 fully under paste 1
        assert nm[0, 2]       # paste 1 on top survives

    def test_train_step_with_copy_paste(self):
        cfg = small_cfg(copy_paste=0.5, img_size=64, mosaic_max_boxes=8)
        state, model, tx = create_detector_state(cfg, jax.random.PRNGKey(0))
        step = make_detector_train_step(cfg, model, tx)
        rng = np.random.default_rng(5)
        im4 = jnp.asarray(rng.integers(0, 255, (2, 4, 64, 64, 3)), jnp.uint8)
        b4 = jnp.tile(jnp.asarray([0.5, 0.5, 0.4, 0.4], jnp.float32), (2, 4, 2, 1))
        m4 = jnp.ones((2, 4, 2), bool)
        w = jnp.ones((2,), jnp.float32)
        state, met = step(state, im4, b4, m4, w, jnp.float32(1e-3), use_mosaic=True)
        assert np.isfinite(float(met["loss"]))
        state, met = step(state, im4, b4, m4, w, jnp.float32(1e-3), use_mosaic=False)
        assert np.isfinite(float(met["loss"]))


class TestAugDtype:
    def test_bf16_aug_pipeline_step(self):
        """aug_dtype=bfloat16 keeps the whole aug stage in bf16 (no silent
        f32 promotion) and the train step stays finite."""
        from gcssl_tpu.train.detector import augment_batch

        imgs = jnp.ones((2, 16, 16, 3), jnp.bfloat16) * 0.5
        out, _, _ = augment_batch(
            jax.random.PRNGKey(0), imgs,
            jnp.zeros((2, 1, 4)), jnp.zeros((2, 1), bool),
        )
        assert out.dtype == jnp.bfloat16

        cfg = small_cfg(aug_dtype="bfloat16", img_size=64, copy_paste=0.5,
                        mosaic_max_boxes=8)
        state, model, tx = create_detector_state(cfg, jax.random.PRNGKey(0))
        step = make_detector_train_step(cfg, model, tx)
        rng = np.random.default_rng(6)
        im4 = jnp.asarray(rng.integers(0, 255, (2, 4, 64, 64, 3)), jnp.uint8)
        b4 = jnp.tile(jnp.asarray([0.5, 0.5, 0.4, 0.4], jnp.float32), (2, 4, 2, 1))
        m4 = jnp.ones((2, 4, 2), bool)
        w = jnp.ones((2,), jnp.float32)
        state, met = step(state, im4, b4, m4, w, jnp.float32(1e-3), use_mosaic=True)
        assert np.isfinite(float(met["loss"]))

    def test_donor_content_is_pre_paste(self):
        """Slot k's donor pixels come from the ORIGINAL batch, not from
        images already mutated by slots < k (review finding r2)."""
        from gcssl_tpu.train.detector import paste_instances

        s = 32
        red = jnp.full((s, s, 3), jnp.asarray([1.0, 0.0, 0.0]))
        black = jnp.zeros((s, s, 3))
        imgs = jnp.stack([red, black])
        boxes = jnp.tile(jnp.asarray([0.5, 0.5, 0.25, 0.25]), (2, 1, 1))
        mask = jnp.ones((2, 1), bool)
        donor = jnp.asarray([[0, 1], [0, 1]], jnp.int32)
        # slot 0: red center of img0 -> center of img1 (paints it red)
        # slot 1: that SAME center region of img1 -> corner of img0
        src = jnp.tile(jnp.asarray([0.5, 0.5, 0.25, 0.25]), (2, 2, 1))
        dst = jnp.tile(
            jnp.asarray([[0.5, 0.5, 0.25, 0.25], [0.875, 0.875, 0.25, 0.25]]),
            (2, 1, 1),
        )
        on = jnp.asarray([[False, True], [True, False]])
        out, _, _ = paste_instances(imgs, boxes, mask, donor, src, dst, on)
        out = np.asarray(out)
        # img1 center got slot-0's red paste
        np.testing.assert_allclose(
            out[1, 14:18, 14:18], np.tile([1.0, 0.0, 0.0], (4, 4, 1)), atol=1e-5
        )
        # img0 corner got slot-1's paste of img1's center — the ORIGINAL
        # black pixels, not the red that slot 0 painted there
        assert np.abs(out[0, 28:32, 28:32]).max() < 1e-5

    def test_budget_gate_blocks_paste_pixels(self):
        """When the GT budget is already full, gated-off pastes must not
        paint pixels either (review finding r2)."""
        from gcssl_tpu.train.detector import paste_instances

        s = 32
        imgs = jnp.stack([
            jnp.full((s, s, 3), 0.9),
            jnp.zeros((s, s, 3)),
        ])
        m = 3  # budget == current valid count -> no room for pastes
        boxes = jnp.tile(jnp.asarray([0.3, 0.3, 0.1, 0.1]), (2, m, 1))
        mask = jnp.ones((2, m), bool)
        donor = jnp.zeros((2, 1), jnp.int32)
        src = jnp.tile(jnp.asarray([0.5, 0.5, 0.5, 0.5]), (2, 1, 1))
        dst = jnp.tile(jnp.asarray([0.75, 0.75, 0.25, 0.25]), (2, 1, 1))
        on = jnp.ones((2, 1), bool)
        out, nb, nm = paste_instances(
            imgs, boxes, mask, donor, src, dst, on, max_out_boxes=m
        )
        np.testing.assert_array_equal(np.asarray(out), np.asarray(imgs))
        assert np.asarray(nm).sum() == 2 * m  # originals only


class TestFusedOptimizer:
    def test_fused_update_matches_optax_chain(self):
        """fused_adamw_ema_update must be numerically identical (up to f32
        roundoff) to the optax chain + apply_updates + EMA-map path, and
        keep the exact checkpointed state layout, over several steps with
        varying gradients (including one above the clip norm)."""
        import optax

        from gcssl_tpu.train.detector import fused_adamw_ema_update

        rng = np.random.default_rng(0)
        params = {
            "a": jnp.asarray(rng.normal(size=(8, 4)), jnp.float32),
            "b": {"w": jnp.asarray(rng.normal(size=(5,)), jnp.float32)},
        }
        wd, max_norm, lr, d = 5e-4, 10.0, 1e-3, 0.99
        tx = optax.chain(
            optax.clip_by_global_norm(max_norm),
            optax.scale_by_adam(),
            optax.add_decayed_weights(wd),
        )
        p_ref = p_fused = params
        ema_ref = ema_fused = jax.tree.map(lambda x: x + 0.0, params)
        opt_ref = opt_fused = tx.init(params)
        for i, gscale in enumerate([1.0, 100.0, 0.01]):  # 100x trips the clip
            grads = jax.tree.map(
                lambda x: jnp.asarray(
                    rng.normal(size=x.shape) * gscale, jnp.float32), p_ref)
            updates, opt_ref = tx.update(grads, opt_ref, p_ref)
            p_ref = optax.apply_updates(
                p_ref, jax.tree.map(lambda u: -lr * u, updates))
            ema_ref = jax.tree.map(lambda e, p: e * d + p * (1 - d),
                                   ema_ref, p_ref)
            p_fused, opt_fused, ema_fused = fused_adamw_ema_update(
                p_fused, grads, opt_fused, ema_fused, lr, d,
                weight_decay=wd, max_norm=max_norm)
            for name, ref, fused in (
                ("params", p_ref, p_fused),
                ("ema", ema_ref, ema_fused),
                ("mu", opt_ref[1].mu, opt_fused[1].mu),
                ("nu", opt_ref[1].nu, opt_fused[1].nu),
            ):
                r = np.concatenate([np.ravel(x) for x in
                                    jax.tree_util.tree_leaves(ref)])
                f = np.concatenate([np.ravel(x) for x in
                                    jax.tree_util.tree_leaves(fused)])
                np.testing.assert_allclose(
                    f, r, rtol=2e-6, atol=1e-7,
                    err_msg=f"{name} diverged at step {i}")
            assert int(opt_fused[1].count) == i + 1
        # state layout identical (checkpoint compatibility)
        assert jax.tree.structure(opt_fused) == jax.tree.structure(opt_ref)

    def test_step_with_fused_opt_matches_reference_path(self):
        """The full train step produces the same loss trajectory with
        fused_opt on and off."""
        cfg_f = small_cfg(fused_opt=True, img_size=64, mosaic_max_boxes=16)
        cfg_r = small_cfg(fused_opt=False, img_size=64, mosaic_max_boxes=16)
        b, s, mb = cfg_f.batch_size, cfg_f.img_size, cfg_f.max_boxes
        k = jax.random.split(jax.random.PRNGKey(3), 3)
        images4 = jax.random.randint(k[0], (b, 4, s, s, 3), 0, 255, jnp.uint8)
        boxes4 = jnp.concatenate([
            jax.random.uniform(k[1], (b, 4, mb, 2), minval=0.3, maxval=0.7),
            jax.random.uniform(k[2], (b, 4, mb, 2), minval=0.1, maxval=0.25),
        ], axis=-1)
        mask4 = jnp.broadcast_to(jnp.arange(mb)[None, None, :] < 3,
                                 (b, 4, mb))
        w = jnp.ones(b, jnp.float32)
        lr = jnp.float32(1e-3)
        traj = {}
        for name, cfg in (("fused", cfg_f), ("ref", cfg_r)):
            state, model, tx = create_detector_state(cfg, jax.random.PRNGKey(1))
            step = make_detector_train_step(cfg, model, tx)
            losses = []
            for _ in range(3):
                state, m = step(state, images4, boxes4, mask4, w, lr)
                losses.append(float(m["loss"]))
            traj[name] = losses
        np.testing.assert_allclose(traj["fused"], traj["ref"],
                                   rtol=1e-4, atol=1e-6)


class TestFitnessSelection:
    """Round-5: best-checkpoint selection by Ultralytics fitness
    (0.1*mAP50_u + 0.9*mAP50-95_u) and the on_eval snapshot hook
    (pipeline/detect.py train_detector)."""

    def _arrays(self, n=6, s=64):
        from gcssl_tpu.data.detection import DetectionArrays

        rng = np.random.default_rng(0)
        imgs = rng.integers(0, 255, (n, s, s, 3), dtype=np.uint8)
        boxes = np.zeros((n, 8, 4), np.float32)
        mask = np.zeros((n, 8), bool)
        boxes[:, 0] = [0.5, 0.5, 0.3, 0.4]
        mask[:, 0] = True
        return DetectionArrays(
            images=imgs, boxes=boxes, cls=np.zeros((n, 8), np.int32),
            mask=mask, orig_wh=np.full((n, 2), s, np.float32),
            names=[f"i{k}" for k in range(n)], img_size=s,
        )

    def test_fitness_select_and_on_eval(self, tmp_path):
        from gcssl_tpu.pipeline.detect import train_detector

        cfg = small_cfg(
            img_size=64, epochs=2, batch_size=4, patience=5,
            warmup_epochs=1, mosaic=False, max_boxes=8, mosaic_max_boxes=16,
            select="fitness", ema_decay=0.99,
        )
        arr = self._arrays()
        seen = []

        def on_eval(epoch, rec, params_host):
            # host copy of the evaluated (EMA) params, every epoch
            assert isinstance(params_host, dict)
            seen.append((epoch, rec["map50_u"], rec["map50_95_u"]))

        _, _, hist = train_detector(
            cfg, arr, arr, save_dir=tmp_path, on_eval=on_eval,
        )
        assert len(seen) == 2
        assert {"map50_u", "map50_95_u"} <= set(hist[-1])
        import json as _json

        meta = _json.loads((tmp_path / "best.json").read_text())
        assert meta["select"] == "fitness"
        assert meta["select_value"] == pytest.approx(
            0.1 * meta["map50_u"] + 0.9 * meta["map50_95_u"])
