"""Native C++ loader tests (skipped when the toolchain is unavailable)."""

import numpy as np
import pytest

from gcssl_tpu.data.native_loader import decode_letterbox_batch, native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native loader not built (no g++/libjpeg)"
)


@pytest.fixture()
def jpg_files(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    paths = []
    for i, (h, w) in enumerate([(240, 320), (128, 128), (300, 200)]):
        p = tmp_path / f"im{i}.jpg"
        Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8)).save(
            p, quality=95
        )
        paths.append(p)
    return paths


class TestNativeLoader:
    def test_matches_pil_identity_path(self, jpg_files):
        from PIL import Image

        from gcssl_tpu.data.detection import letterbox_to_square

        out, wh = decode_letterbox_batch([jpg_files[1]], 128, 114)
        pil, _ = letterbox_to_square(Image.open(jpg_files[1]).convert("RGB"), 128)
        np.testing.assert_array_equal(out[0], np.asarray(pil))
        assert wh[0].tolist() == [128.0, 128.0]

    def test_resize_path_close_to_pil(self, jpg_files):
        from PIL import Image

        from gcssl_tpu.data.detection import letterbox_to_square

        out, wh = decode_letterbox_batch([jpg_files[0]], 96, 114)
        pil, _ = letterbox_to_square(Image.open(jpg_files[0]).convert("RGB"), 96)
        diff = np.abs(out[0].astype(np.int16) - np.asarray(pil, np.int16))
        assert diff.mean() < 2.0
        assert wh[0].tolist() == [320.0, 240.0]

    def test_missing_file_reports_failure(self, jpg_files, tmp_path):
        out, wh = decode_letterbox_batch(
            [jpg_files[0], tmp_path / "nope.jpg"], 64, 114
        )
        assert wh[0, 0] > 0
        assert wh[1].tolist() == [0.0, 0.0]  # failure marker

    def test_batch_order_preserved(self, jpg_files):
        out, wh = decode_letterbox_batch(jpg_files, 64, 114)
        assert out.shape == (3, 64, 64, 3)
        assert wh[0].tolist() == [320.0, 240.0]
        assert wh[2].tolist() == [200.0, 300.0]
