"""End-to-end orchestrator tests with a stub predictor: two-stage routing,
iterate merge, calibrate-tree — checking the exact file-tree contracts the
reference scripts produce."""

import numpy as np
import pytest

import jax.numpy as jnp

from gcssl_tpu.core.config import DetectorConfig, PseudoLabelConfig
from gcssl_tpu.data.yolo import load_yolo_txt
from gcssl_tpu.pipeline.iterate import merge_labeled_and_pseudo
from gcssl_tpu.pipeline.two_stage import two_stage_pseudo_label


def make_image_dir(tmp_path, n=4, size=(160, 120)):
    from PIL import Image

    d = tmp_path / "unlabels" / "images"
    d.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        Image.fromarray(
            rng.integers(0, 255, (size[1], size[0], 3), dtype=np.uint8)
        ).save(d / f"u{i}.jpg")
    return tmp_path / "unlabels"


class StubPredict:
    """Mimics make_detector_predict: images -> fixed boxes per call order.

    Images 0, 2: one high-conf box.  Image 1: none.  Image 3: high + low.
    """

    def __init__(self, max_out=10):
        self.max_out = max_out

    def __call__(self, params, images_u8, conf_thr, iou_thr, tta=False, fuse=False):
        b = images_u8.shape[0]
        boxes = np.zeros((b, self.max_out, 4), np.float32)
        scores = np.zeros((b, self.max_out), np.float32)
        valid = np.zeros((b, self.max_out), bool)
        for k in range(b):
            # stable pseudo-prediction derived from image content hash
            key = int(np.asarray(images_u8[k]).sum()) % 4
            if key != 1:
                boxes[k, 0] = [0.5, 0.5, 0.25, 0.25]
                scores[k, 0] = 0.9
                valid[k, 0] = scores[k, 0] >= conf_thr
            if key == 3:
                boxes[k, 1] = [0.2, 0.2, 0.1, 0.1]
                scores[k, 1] = 0.5
                valid[k, 1] = scores[k, 1] >= conf_thr
        return jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid)


class TestTwoStage:
    def test_routing_and_outputs(self, tmp_path):
        src = make_image_dir(tmp_path)
        det_cfg = DetectorConfig(img_size=64, max_boxes=10, compute_dtype="float32")
        pl_cfg = PseudoLabelConfig(conf_high=0.85, conf_low=0.4, tta=False)
        counts = two_stage_pseudo_label(
            det_cfg, pl_cfg, StubPredict(), None, src, tmp_path / "two_stage",
            batch_size=2,
        )
        assert counts["stage1_high"] + counts["stage1_low"] == 4
        dest = tmp_path / "two_stage"
        hi1 = sorted((dest / "stage1/high/labels").glob("*.txt"))
        assert len(hi1) == counts["stage1_high"]
        # stage-2 outputs: every kept image has an image + label under stage2
        hi2_imgs = list((dest / "stage2/high/images").iterdir())
        hi2_labs = list((dest / "stage2/high/labels").glob("*.txt"))
        assert len(hi2_imgs) == len(hi2_labs) == counts["stage2_high"]
        assert (dest / "stage1/high_list.txt").exists()
        # labels are valid YOLO rows without conf
        if hi2_labs:
            cls, boxes, conf = load_yolo_txt(hi2_labs[0], min_fields=5)
            assert len(boxes) >= 1
            assert (boxes >= 0).all() and (boxes <= 1).all()


class TestTwoStageOnlyLow:
    def test_only_low_routing(self, tmp_path):
        src = make_image_dir(tmp_path)
        det_cfg = DetectorConfig(img_size=64, max_boxes=10, compute_dtype="float32")
        # conf_high above every stub score -> stage-1 keeps nothing unless we
        # drop the threshold; use conf_high above the 0.9 box so the pass-2
        # set is all "low" for kept images
        pl_cfg = PseudoLabelConfig(
            conf_high=0.85, conf_low=0.4, tta=False, need_only_low=True
        )
        counts = two_stage_pseudo_label(
            det_cfg, pl_cfg, StubPredict(), None, src, tmp_path / "ts",
            batch_size=2,
        )
        only_low = tmp_path / "ts" / "stage2" / "only_low"
        # Stage 2 only visits images that had >=1 stage-1 high box, so the
        # hi1-empty condition never fires — the reference's NEED_ONLY_LOW
        # branch (Two-stage pseudo-labeling.py:104-108) is equally dead under
        # its own flow; we preserve the flag and its (non-)behavior.
        assert counts["stage2_high"] >= 0
        assert not only_low.exists() or not any(
            (only_low / "images").iterdir()
        )


class TestIterateMerge:
    def test_merge_union_and_conf_strip(self, tmp_path):
        lab = tmp_path / "labeled"
        (lab / "images").mkdir(parents=True)
        (lab / "labels").mkdir()
        (lab / "images" / "a.jpg").write_bytes(b"x")
        (lab / "labels" / "a.txt").write_text("0 0.5 0.5 0.2 0.2\n")

        pi = tmp_path / "pseudo_imgs"
        pl = tmp_path / "pseudo_lbls"
        pi.mkdir(), pl.mkdir()
        (pi / "b.jpg").write_bytes(b"y")
        (pl / "b.txt").write_text("0 0.4 0.4 0.1 0.1 0.87\n")
        # collision: labeled 'a' must win
        (pi / "a.jpg").write_bytes(b"z")
        (pl / "a.txt").write_text("0 0.9 0.9 0.1 0.1 0.5\n")

        n = merge_labeled_and_pseudo(lab, pi, pl, tmp_path / "merged")
        assert n == 2
        merged = tmp_path / "merged"
        a_rows = (merged / "labels" / "a.txt").read_text()
        assert "0.9" not in a_rows  # labeled version kept
        b_rows = (merged / "labels" / "b.txt").read_text().strip().split()
        assert len(b_rows) == 5  # conf stripped for training

    def test_merge_aborts_on_wiped_image_tree(self, tmp_path):
        """A half-wiped pseudo tree (labels survived a workspace reset,
        images did not) must abort loudly, not silently shrink the merge —
        round 2's m-scale loop recorded a bogus negative delta this way."""
        import pytest

        lab = tmp_path / "labeled"
        (lab / "images").mkdir(parents=True)
        (lab / "labels").mkdir()
        (lab / "images" / "a.jpg").write_bytes(b"x")
        (lab / "labels" / "a.txt").write_text("0 0.5 0.5 0.2 0.2\n")

        pi = tmp_path / "pseudo_imgs"   # empty: the wiped tree
        pl = tmp_path / "pseudo_lbls"
        pi.mkdir(), pl.mkdir()
        (pl / "b.txt").write_text("0 0.4 0.4 0.1 0.1 0.87\n")

        with pytest.raises(FileNotFoundError, match="no image"):
            merge_labeled_and_pseudo(lab, pi, pl, tmp_path / "merged")
        # opt-out for callers that have already validated the tree
        n = merge_labeled_and_pseudo(
            lab, pi, pl, tmp_path / "merged2", strict=False
        )
        assert n == 1


class TestRepairPairTree:
    """scripts/run_loop_r2.repair_pair_tree: reconstitute reset-wiped
    images/ from the source pool by label stem (round-3: saves re-running
    the ~30-min two-stage predict after a workspace reset)."""

    def _load(self):
        import importlib.util
        from pathlib import Path

        spec = importlib.util.spec_from_file_location(
            "run_loop_r2", Path(__file__).parent.parent / "scripts" / "run_loop_r2.py"
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    def test_repairs_wiped_images(self, tmp_path):
        rl = self._load()
        pool = tmp_path / "pool"
        pool.mkdir()
        for s in ("a", "b"):
            (pool / f"{s}.jpg").write_bytes(b"img" + s.encode())
        tree = tmp_path / "tree"
        (tree / "labels").mkdir(parents=True)
        for s in ("a", "b"):
            (tree / "labels" / f"{s}.txt").write_text("0 0.5 0.5 0.2 0.2\n")
        assert not rl.pair_tree_ok(tree, 2)
        assert rl.repair_pair_tree(tree, pool, 2)
        assert rl.pair_tree_ok(tree, 2)
        assert (tree / "images" / "a.jpg").read_bytes() == b"imga"

    def test_refuses_when_source_missing_or_count_wrong(self, tmp_path):
        rl = self._load()
        pool = tmp_path / "pool"
        pool.mkdir()
        (pool / "a.jpg").write_bytes(b"x")
        tree = tmp_path / "tree"
        (tree / "labels").mkdir(parents=True)
        (tree / "labels" / "a.txt").write_text("0 .5 .5 .2 .2\n")
        (tree / "labels" / "gone.txt").write_text("0 .5 .5 .2 .2\n")
        # 'gone' has no pool image -> repair must fail, not half-copy
        assert not rl.repair_pair_tree(tree, pool, 2)
        # recorded count mismatch -> refuse outright
        assert not rl.repair_pair_tree(tree, pool, 5)
