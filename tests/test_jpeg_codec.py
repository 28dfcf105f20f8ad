"""Property tests for the pure-numpy baseline JPEG codec
(functions/jpeg.py) — round-trip error bounds, constant-band exactness,
odd dimensions, and byte-stuffing robustness."""

from __future__ import annotations

import numpy as np
import pytest

from change_data_capture_spark.functions.jpeg import (
    _rgb_to_ycbcr,
    _ycbcr_to_rgb,
    decode_jpeg,
    decode_jpeg_pixels,
    encode_jpeg,
)


def test_constant_bands_are_exact():
    """8×8-aligned constant bands survive the flat-q8 lossy path
    bit-exactly (the oracle's premise)."""
    img = np.empty((16, 24, 3), dtype=np.uint8)
    img[:8] = (200, 30, 90)
    img[8:] = (10, 220, 130)
    dec = decode_jpeg_pixels(encode_jpeg(img))
    assert np.array_equal(dec, _ycbcr_to_rgb(_rgb_to_ycbcr(img)))


@pytest.mark.parametrize("seed,shape", [(1, (24, 32)), (2, (13, 21)), (3, (8, 8)), (4, (40, 8))])
def test_roundtrip_error_bounded_by_quantizer(seed, shape):
    """Photographic (random) content round-trips with error bounded by the
    flat quantizer: |err| ≤ q·(DC + AC ripple) — empirically ≤ 24 for
    q=8 across channels after the YCbCr conversions."""
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, (*shape, 3), dtype=np.uint8)
    dec = decode_jpeg_pixels(encode_jpeg(img))
    assert dec.shape == img.shape  # non-multiple-of-8 dims crop correctly
    err = np.abs(dec.astype(int) - img.astype(int)).max()
    assert err <= 24, err


def test_fine_quantizer_converges():
    """q=1 tables make the only loss the two rounded color conversions:
    max error collapses to the color-space rounding (≤ 3)."""
    rng = np.random.RandomState(9)
    img = rng.randint(0, 256, (16, 16, 3), dtype=np.uint8)
    dec = decode_jpeg_pixels(encode_jpeg(img, luma_q=1, chroma_q=1))
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 3


def test_byte_stuffing_roundtrip():
    """A gradient engineered to emit many 0xFF entropy bytes still decodes
    (stuffing/unstuffing correct)."""
    img = np.zeros((8, 64, 3), dtype=np.uint8)
    img[..., 0] = np.tile(np.arange(64, dtype=np.uint8) * 4, (8, 1))
    dec = decode_jpeg_pixels(encode_jpeg(img))
    assert dec.shape == img.shape


def test_summary_means_match_pixels():
    img = np.empty((16, 8, 3), dtype=np.uint8)
    img[:8] = (255, 0, 0)
    img[8:] = (0, 0, 255)
    payload = encode_jpeg(img)
    w, h, mr, mg, mb = decode_jpeg(payload)
    px = decode_jpeg_pixels(payload)
    assert (w, h) == (8, 16)
    assert mr == px[..., 0].astype(np.float64).mean()
    assert mb == px[..., 2].astype(np.float64).mean()
