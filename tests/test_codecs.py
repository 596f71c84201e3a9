"""Codec round-trip, PSNR invariant, and pHash behavior tests."""

from __future__ import annotations

import numpy as np
import pytest

from aumos_drift_detector_ray import codecs


def _img(seed=0, w=64, h=48):
    rng = np.random.default_rng(seed)
    y = np.linspace(0, 1, h)[:, None]
    x = np.linspace(0, 1, w)[None, :]
    img = np.stack(
        [np.clip(100 + 100 * x + 30 * np.sin(6 * y) + rng.normal(0, 3, (h, w)), 0, 255)
         for _ in range(3)], axis=-1
    )
    return img.astype(np.uint8)


class TestLossless:
    @pytest.mark.parametrize("fmt", ["raw", "png"])
    def test_roundtrip_exact(self, fmt):
        img = _img(1)
        blob = codecs.encode(img, fmt)
        out = codecs.decode(blob, fmt)
        assert np.array_equal(out, img)

    def test_header_dims(self):
        img = _img(2, w=33, h=17)
        for fmt in ("raw", "png", "jpg"):
            blob = codecs.encode(img, fmt)
            assert codecs.decoded_dims(blob) == (33, 17)


class TestJpg:
    def test_psnr_above_40_at_default_quality(self):
        img = _img(3)
        blob = codecs.encode(img, "jpg", quality=90)
        out = codecs.decode(blob, "jpg")
        assert out.shape == img.shape
        assert codecs.psnr(img, out) >= 40.0

    def test_harsh_quality_violates_invariant(self):
        img = _img(4)
        blob = codecs.encode(img, "jpg", quality=5)
        out = codecs.decode(blob, "jpg")
        assert codecs.psnr(img, out) < 40.0

    def test_compresses(self):
        img = _img(5, w=128, h=128)
        blob = codecs.encode(img, "jpg", quality=90)
        assert len(blob) < img.nbytes * 0.7

    def test_non_multiple_of_8_dims(self):
        img = _img(6, w=37, h=29)
        out = codecs.decode(codecs.encode(img, "jpg"), "jpg")
        assert out.shape == (29, 37, 3)
        assert codecs.psnr(img, out) >= 35.0


class TestErrors:
    def test_truncated_raises(self):
        img = _img(7)
        for fmt in ("raw", "png", "jpg"):
            blob = codecs.encode(img, fmt)
            with pytest.raises(codecs.CodecError):
                codecs.decode(blob[: len(blob) // 2], fmt)

    def test_bad_magic_raises(self):
        with pytest.raises(codecs.CodecError):
            codecs.decode(b"XXXX\x01\x00\x01\x00abc", "png")

    def test_unknown_fmt_raises(self):
        with pytest.raises(codecs.CodecError):
            codecs.decode(b"RW01...", "bmp")


class TestPhash:
    def test_deterministic(self):
        img = _img(8)
        assert codecs.phash64(img) == codecs.phash64(img.copy())

    def test_near_duplicate_small_hamming(self):
        img = _img(9)
        noisy = np.clip(img.astype(np.int16) + np.random.default_rng(0).integers(
            -1, 2, img.shape), 0, 255).astype(np.uint8)
        d = codecs.hamming64(np.array([codecs.phash64(img)]),
                             np.array([codecs.phash64(noisy)]))[0]
        assert d <= 4

    def test_different_images_large_hamming(self):
        d = codecs.hamming64(np.array([codecs.phash64(_img(10))]),
                             np.array([codecs.phash64(_img(11))]))[0]
        assert d > 10

    def test_jpg_roundtrip_phash_stable(self):
        img = _img(12)
        out = codecs.decode(codecs.encode(img, "jpg", 90), "jpg")
        d = codecs.hamming64(np.array([codecs.phash64(img)]),
                             np.array([codecs.phash64(out)]))[0]
        assert d <= 8

    def test_hamming_vectorized(self):
        a = np.array([0, -1, 2**40], dtype=np.int64)
        b = np.array([0, 0, 2**40], dtype=np.int64)
        assert list(codecs.hamming64(a, b)) == [0, 64, 0]


class TestPsnr:
    def test_identical_inf(self):
        img = _img(13)
        assert codecs.psnr(img, img) == float("inf")

    def test_known_value(self):
        a = np.zeros((10, 10, 3))
        b = np.full((10, 10, 3), 16.0)
        # mse=256 → psnr = 10*log10(255^2/256) ≈ 24.05
        assert codecs.psnr(a, b) == pytest.approx(24.0487, abs=1e-3)
