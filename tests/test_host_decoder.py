"""End-to-end host decoder vs the reference ffmpeg decoder (byte-exact).

The analog of FATE framecrc tests (tests/fate/jpeg2000.mak): encode synthetic
images with the reference encoder, decode with both decoders, compare bytes.
"""

import numpy as np
import pytest

from tests.conftest import ffmpeg_decode_raw, ffmpeg_encode


def _roundtrip(ffmpeg, tmp_media, img: np.ndarray, pix_fmt: str, name: str,
               enc_args=(), dec_args=(), bitexact=True):
    from ffmpeg_ht_tpu.models.host_decoder import decode_frame
    h, w = img.shape[-2:]
    out = str(tmp_media / f"{name}.j2k")
    ffmpeg_encode(ffmpeg, img.tobytes(), pix_fmt, f"{w}x{h}", out, *enc_args)
    flags = ("-flags", "+bitexact") if bitexact else ()
    golden = ffmpeg_decode_raw(ffmpeg, out, *flags, *dec_args)
    mine = decode_frame(open(out, "rb").read(), bitexact=bitexact)
    assert mine.tobytes() == golden, f"{name}: mismatch"
    return mine


def test_gray8_53(ffmpeg, tmp_media):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (64, 64), dtype=np.uint8)
    _roundtrip(ffmpeg, tmp_media, img, "gray", "gray64", enc_args=("-pred", "1"))


def test_gray8_53_odd_size(ffmpeg, tmp_media):
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (61, 67), dtype=np.uint8)
    _roundtrip(ffmpeg, tmp_media, img, "gray", "gray_odd", enc_args=("-pred", "1"))


def test_gray8_97int(ffmpeg, tmp_media):
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (64, 64), dtype=np.uint8)
    _roundtrip(ffmpeg, tmp_media, img, "gray", "gray_97")


def test_rgb24_53(ffmpeg, tmp_media):
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (48, 52, 3), dtype=np.uint8)
    _roundtrip(ffmpeg, tmp_media, img, "rgb24", "rgb53", enc_args=("-pred", "1"))


def test_yuv444p_97int(ffmpeg, tmp_media):
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (3, 40, 44), dtype=np.uint8)
    _roundtrip(ffmpeg, tmp_media, img, "yuv444p", "yuv97")


def test_gray8_tiled(ffmpeg, tmp_media):
    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, (96, 80), dtype=np.uint8)
    _roundtrip(ffmpeg, tmp_media, img, "gray", "gray_tiled",
               enc_args=("-pred", "1", "-tile_width", "32",
                         "-tile_height", "48"))


def test_smooth_gradient(ffmpeg, tmp_media):
    x = np.arange(64, dtype=np.uint8)
    img = np.add.outer(x, x) // 2
    img = img.astype(np.uint8)
    _roundtrip(ffmpeg, tmp_media, img, "gray", "grad", enc_args=("-pred", "1"))
