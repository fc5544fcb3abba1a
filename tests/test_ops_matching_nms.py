"""Tests for matching strategies and fixed-shape NMS."""

import numpy as np
import pytest

import jax.numpy as jnp

from gcssl_tpu.ops import (
    match_greedy_many_to_one,
    match_greedy_one_to_one,
    nms,
)


class TestManyToOne:
    def test_basic_match(self):
        preds = jnp.asarray(
            [[0.5, 0.5, 0.2, 0.2], [0.52, 0.5, 0.2, 0.2], [0.9, 0.9, 0.05, 0.05]]
        )
        gts = jnp.asarray([[0.51, 0.5, 0.2, 0.2], [0.1, 0.1, 0.1, 0.1]])
        idx, iou, matched = match_greedy_many_to_one(preds, gts, iou_thr=0.25)
        idx, matched = np.asarray(idx), np.asarray(matched)
        # preds 0 and 1 both match gt 0 (many-to-one); pred 2 unmatched
        assert matched.tolist() == [True, True, False]
        assert idx[0] == 0 and idx[1] == 0

    def test_threshold_filters(self):
        preds = jnp.asarray([[0.5, 0.5, 0.2, 0.2]])
        gts = jnp.asarray([[0.62, 0.5, 0.2, 0.2]])  # IoU ~ 0.08/0.32 = 0.25-
        _, iou, matched = match_greedy_many_to_one(preds, gts, iou_thr=0.25)
        got_iou = float(iou[0])
        assert bool(matched[0]) == (got_iou >= 0.25)

    def test_masks(self):
        preds = jnp.asarray([[0.5, 0.5, 0.2, 0.2], [0.5, 0.5, 0.2, 0.2]])
        gts = jnp.asarray([[0.5, 0.5, 0.2, 0.2], [0.5, 0.5, 0.2, 0.2]])
        pm = jnp.asarray([True, False])
        gm = jnp.asarray([False, True])
        idx, _, matched = match_greedy_many_to_one(
            preds, gts, 0.25, pred_mask=pm, gt_mask=gm
        )
        assert np.asarray(matched).tolist() == [True, False]
        assert int(idx[0]) == 1  # gt 0 masked out


class TestOneToOne:
    def test_reference_semantics(self):
        # gt order matters: first gt claims the shared best pred.
        gts = np.asarray([[0.5, 0.5, 0.2, 0.2], [0.52, 0.5, 0.2, 0.2]])
        gt_cls = np.asarray([0, 0])
        preds = np.asarray([[0.51, 0.5, 0.2, 0.2]])
        pred_cls = np.asarray([0])
        tp, fp, fn, matched = match_greedy_one_to_one(
            gts, gt_cls, preds, pred_cls, iou_thr=0.4
        )
        assert (tp, fp, fn) == (1, 0, 1)

    def test_class_aware(self):
        gts = np.asarray([[0.5, 0.5, 0.2, 0.2]])
        preds = np.asarray([[0.5, 0.5, 0.2, 0.2]])
        tp, fp, fn, _ = match_greedy_one_to_one(
            gts, np.asarray([0]), preds, np.asarray([1]), 0.4
        )
        assert (tp, fp, fn) == (0, 1, 1)

    def test_empty_preds(self):
        gts = np.asarray([[0.5, 0.5, 0.2, 0.2]])
        tp, fp, fn, _ = match_greedy_one_to_one(
            gts, np.asarray([0]), np.zeros((0, 4)), np.zeros((0,)), 0.4
        )
        assert (tp, fp, fn) == (0, 0, 1)


class TestNMS:
    def test_suppresses_overlap(self):
        boxes = jnp.asarray(
            [
                [0.5, 0.5, 0.2, 0.2],
                [0.51, 0.5, 0.2, 0.2],  # heavy overlap with 0
                [0.9, 0.9, 0.1, 0.1],
            ]
        )
        scores = jnp.asarray([0.9, 0.8, 0.7])
        keep, valid = nms(boxes, scores, iou_thr=0.5, max_out=3)
        kept = set(np.asarray(keep)[np.asarray(valid)].tolist())
        assert kept == {0, 2}

    def test_keeps_all_disjoint(self):
        boxes = jnp.asarray(
            [[0.2, 0.2, 0.1, 0.1], [0.5, 0.5, 0.1, 0.1], [0.8, 0.8, 0.1, 0.1]]
        )
        scores = jnp.asarray([0.5, 0.9, 0.7])
        keep, valid = nms(boxes, scores, iou_thr=0.5, max_out=3)
        keep, valid = np.asarray(keep), np.asarray(valid)
        assert valid.all()
        # score order: 1, 2, 0
        assert keep.tolist() == [1, 2, 0]

    def test_max_out_truncates(self):
        boxes = jnp.asarray(
            [[0.2, 0.2, 0.1, 0.1], [0.5, 0.5, 0.1, 0.1], [0.8, 0.8, 0.1, 0.1]]
        )
        scores = jnp.asarray([0.5, 0.9, 0.7])
        keep, valid = nms(boxes, scores, iou_thr=0.5, max_out=2)
        assert np.asarray(valid).all()
        assert np.asarray(keep).tolist() == [1, 2]

    def test_valid_mask(self):
        boxes = jnp.asarray([[0.5, 0.5, 0.2, 0.2], [0.5, 0.5, 0.2, 0.2]])
        scores = jnp.asarray([0.9, 0.95])
        keep, valid = nms(
            boxes, scores, 0.5, max_out=2, valid_mask=jnp.asarray([True, False])
        )
        keep, valid = np.asarray(keep), np.asarray(valid)
        assert valid.tolist() == [True, False]
        assert keep[0] == 0

    def test_matches_torchvision(self):
        torchvision = pytest.importorskip("torchvision")
        import torch

        rng = np.random.default_rng(7)
        n = 40
        boxes = np.column_stack(
            [rng.uniform(0.2, 0.8, (n, 2)), rng.uniform(0.05, 0.4, (n, 2))]
        ).astype(np.float32)
        scores = rng.uniform(0, 1, n).astype(np.float32)
        keep, valid = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.4, max_out=n)
        ours = np.asarray(keep)[np.asarray(valid)]
        xyxy = np.column_stack(
            [
                boxes[:, 0] - boxes[:, 2] / 2,
                boxes[:, 1] - boxes[:, 3] / 2,
                boxes[:, 0] + boxes[:, 2] / 2,
                boxes[:, 1] + boxes[:, 3] / 2,
            ]
        )
        want = torchvision.ops.nms(
            torch.tensor(xyxy), torch.tensor(scores), 0.4
        ).numpy()
        np.testing.assert_array_equal(ours, want)


class TestNmsFused:
    """WBF-style fusion: same survivors as nms, cluster-averaged coords."""

    def test_same_survivors_and_scores_as_nms(self):
        from gcssl_tpu.ops import nms_fused

        rng = np.random.default_rng(3)
        n = 30
        boxes = np.column_stack(
            [rng.uniform(0.2, 0.8, (n, 2)), rng.uniform(0.05, 0.4, (n, 2))]
        ).astype(np.float32)
        scores = rng.uniform(0, 1, n).astype(np.float32)
        keep, valid = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.4, max_out=n)
        fb, fs, fv = nms_fused(
            jnp.asarray(boxes), jnp.asarray(scores), 0.4, max_out=n
        )
        keep, valid = np.asarray(keep), np.asarray(valid)
        fb, fs, fv = np.asarray(fb), np.asarray(fs), np.asarray(fv)
        np.testing.assert_array_equal(valid, fv)
        np.testing.assert_allclose(fs[fv], scores[keep[valid]], rtol=1e-6)

    def test_cluster_coordinates_are_confidence_weighted_mean(self):
        from gcssl_tpu.ops import nms_fused

        # two overlapping candidates of one object + one far singleton
        boxes = jnp.asarray([
            [0.50, 0.50, 0.20, 0.20],   # score .9
            [0.54, 0.50, 0.20, 0.20],   # score .6, IoU > .5 with first
            [0.90, 0.90, 0.10, 0.10],   # far, survives alone
        ])
        scores = jnp.asarray([0.9, 0.6, 0.8])
        fb, fs, fv = nms_fused(boxes, scores, 0.5, max_out=3)
        fb, fs, fv = np.asarray(fb), np.asarray(fs), np.asarray(fv)
        assert fv.tolist() == [True, True, False]
        want_cx = (0.9 * 0.50 + 0.6 * 0.54) / 1.5
        np.testing.assert_allclose(fb[0], [want_cx, 0.5, 0.2, 0.2], atol=1e-6)
        np.testing.assert_allclose(fb[1], [0.9, 0.9, 0.1, 0.1], atol=1e-6)
        np.testing.assert_allclose(fs[:2], [0.9, 0.8])

    def test_low_score_members_excluded_by_relative_cutoff(self):
        from gcssl_tpu.ops import nms_fused

        # junk at 1% of the leader's score must not shift the coordinates
        # (the low-conf-threshold eval regime: hundreds of such candidates)
        boxes = jnp.asarray([
            [0.50, 0.50, 0.20, 0.20],
            [0.60, 0.50, 0.20, 0.20],
            [0.58, 0.52, 0.20, 0.20],
        ])
        scores = jnp.asarray([0.9, 0.009, 0.008])
        fb, _, fv = nms_fused(boxes, scores, 0.3, max_out=3)
        fb = np.asarray(fb)
        assert np.asarray(fv).tolist() == [True, False, False]
        np.testing.assert_allclose(fb[0], [0.5, 0.5, 0.2, 0.2], atol=1e-6)
        # with the cutoff disabled they do shift it
        fb2, _, _ = nms_fused(boxes, scores, 0.3, max_out=3, rel_score_thr=0.0)
        assert abs(np.asarray(fb2)[0, 0] - 0.5) > 1e-3

    def test_invalid_candidates_do_not_contribute(self):
        from gcssl_tpu.ops import nms_fused

        boxes = jnp.asarray([
            [0.50, 0.50, 0.20, 0.20],
            [0.60, 0.50, 0.20, 0.20],   # would fuse, but masked invalid
        ])
        scores = jnp.asarray([0.9, 0.9])
        fb, _, fv = nms_fused(
            boxes, scores, 0.3, max_out=2,
            valid_mask=jnp.asarray([True, False]),
        )
        fb, fv = np.asarray(fb), np.asarray(fv)
        assert fv.tolist() == [True, False]
        np.testing.assert_allclose(fb[0], [0.5, 0.5, 0.2, 0.2], atol=1e-6)

    def test_tta_duplicates_average_out_localization_noise(self):
        from gcssl_tpu.ops import nms_fused

        # same object seen by two TTA views with symmetric jitter
        truth = np.array([0.5, 0.5, 0.3, 0.3], np.float32)
        views = np.stack([truth + [0.02, 0, 0, 0], truth - [0.02, 0, 0, 0]])
        fb, _, fv = nms_fused(
            jnp.asarray(views), jnp.asarray([0.8, 0.8]), 0.5, max_out=2
        )
        fb = np.asarray(fb)
        np.testing.assert_allclose(fb[0], truth, atol=1e-6)
