"""Tests for the native C++ image decoder (vtamiq_tpu/native)."""

import os

import numpy as np
import pytest
from PIL import Image

from vtamiq_tpu.data import native_io
from vtamiq_tpu.data.imageio import imread

pytestmark = pytest.mark.skipif(not native_io.available(),
                                reason="native image IO unavailable")


@pytest.fixture(scope="module")
def images(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 255, (96, 128, 3), dtype=np.uint8)
    paths = {}
    for ext in ("bmp", "png", "jpg"):
        p = str(tmp / f"img.{ext}")
        Image.fromarray(arr).save(p)
        paths[ext] = p
    return paths


class TestDecode:
    @pytest.mark.parametrize("ext", ["bmp", "png", "jpg"])
    def test_matches_pil(self, images, ext):
        path = images[ext]
        pil = np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
        out = native_io.decode_rgb(path)
        assert out.shape == pil.shape
        tol = 0.02 if ext == "jpg" else 1e-6  # same libjpeg, but be safe
        assert np.abs(out - pil).max() < tol

    def test_image_size(self, images):
        assert native_io.image_size(images["bmp"]) == (96, 128)

    def test_fused_flip_normalize(self, images):
        path = images["png"]
        pil = np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
        out = native_io.decode_rgb(path, 96, 128, h_flip=True, v_flip=False,
                                   norm_mean=(0.5, 0.5, 0.5), norm_std=(0.5, 0.5, 0.5))
        expected = (pil[:, ::-1] - 0.5) / 0.5
        np.testing.assert_allclose(out, expected, atol=1e-6)

    def test_batch(self, images):
        paths = [images["bmp"], images["png"]]
        outs = native_io.decode_batch(paths, [(96, 128)] * 2, num_threads=2)
        pil = np.asarray(Image.open(images["bmp"]).convert("RGB"), np.float32) / 255.0
        np.testing.assert_allclose(outs[0], pil, atol=1e-6)

    def test_missing_file_raises(self):
        with pytest.raises(IOError):
            native_io.decode_rgb("/nonexistent/file.bmp", 8, 8)

    def test_wrong_size_raises(self, images):
        with pytest.raises(IOError):
            native_io.decode_rgb(images["bmp"], 10, 10)

    def test_imread_routes_through_native(self, images):
        out = imread(images["bmp"])
        pil = np.asarray(Image.open(images["bmp"]).convert("RGB"), np.float32) / 255.0
        np.testing.assert_allclose(out, pil, atol=1e-6)

    def test_bottom_up_and_palette_bmp(self, tmp_path):
        # PIL writes bottom-up 24-bit; also exercise 8-bit palette BMP
        rng = np.random.default_rng(1)
        arr = rng.integers(0, 255, (33, 47, 3), dtype=np.uint8)  # odd row pad
        p24 = str(tmp_path / "p24.bmp")
        Image.fromarray(arr).save(p24)
        np.testing.assert_allclose(
            native_io.decode_rgb(p24),
            np.asarray(Image.open(p24).convert("RGB"), np.float32) / 255.0, atol=1e-6)

        p8 = str(tmp_path / "p8.bmp")
        Image.fromarray(arr).convert("P", palette=Image.ADAPTIVE).save(p8)
        pil8 = np.asarray(Image.open(p8).convert("RGB"), np.float32) / 255.0
        np.testing.assert_allclose(native_io.decode_rgb(p8), pil8, atol=1e-6)
