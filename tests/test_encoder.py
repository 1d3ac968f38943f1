"""Encoder tests: byte-identity with the reference encoder and round-trips.

The encoder mirrors j2kenc.c's algorithm (same MQ coder, pass structure,
rate control, and T2 emission), so its output must be byte-identical to
`ffmpeg -c:v jpeg2000` for every shared configuration — a much stronger
check than decode equivalence.
"""

import numpy as np
import pytest

from ffmpeg_ht_tpu.models.encoder import encode_frame_t800
from ffmpeg_ht_tpu.models.host_decoder import decode_frame

from conftest import ffmpeg_encode_raw


RNG = np.random.default_rng(42)


def _ref_bytes(ffmpeg, raw, pix, size, *args):
    return ffmpeg_encode_raw(ffmpeg, raw, pix, size, "-format", "j2k",
                             "-flags", "+bitexact", *args)


@pytest.mark.parametrize("size,nres", [((32, 32), 7), ((64, 64), 7),
                                       ((129, 67), 7), ((16, 16), 2)])
def test_lossless_roundtrip_gray(size, nres):
    img = RNG.integers(0, 256, size, dtype=np.uint8)
    data = encode_frame_t800(img, pred=1, nreslevels=nres)
    dec = decode_frame(data, bitexact=True)
    out = np.frombuffer(dec.tobytes(), dtype=np.uint8).reshape(size)
    assert np.array_equal(out, img)


def test_byte_identity_gray53(ffmpeg):
    img = RNG.integers(0, 256, (64, 64), dtype=np.uint8)
    ref = _ref_bytes(ffmpeg, img.tobytes(), "gray", "64x64", "-pred", "1")
    assert encode_frame_t800(img, pred=1) == ref


def test_byte_identity_gray97int(ffmpeg):
    img = RNG.integers(0, 256, (64, 64), dtype=np.uint8)
    ref = _ref_bytes(ffmpeg, img.tobytes(), "gray", "64x64", "-pred", "0")
    assert encode_frame_t800(img, pred=0) == ref


def test_byte_identity_rgb24(ffmpeg):
    img = RNG.integers(0, 256, (48, 56, 3), dtype=np.uint8)
    ref = _ref_bytes(ffmpeg, img.tobytes(), "rgb24", "56x48", "-pred", "1")
    assert encode_frame_t800(img, pred=1) == ref


def test_byte_identity_gray16(ffmpeg):
    img = RNG.integers(0, 65536, (40, 40), dtype=np.uint16)
    ref = _ref_bytes(ffmpeg, img.astype("<u2").tobytes(), "gray16le",
                     "40x40", "-pred", "1")
    assert encode_frame_t800(img, pred=1) == ref


def test_byte_identity_yuv420(ffmpeg):
    w, h = 64, 48
    y = RNG.integers(0, 256, (h, w), dtype=np.uint8)
    u = RNG.integers(0, 256, (h // 2, w // 2), dtype=np.uint8)
    v = RNG.integers(0, 256, (h // 2, w // 2), dtype=np.uint8)
    ref = _ref_bytes(ffmpeg, y.tobytes() + u.tobytes() + v.tobytes(),
                     "yuv420p", "64x48", "-pred", "1")
    assert encode_frame_t800([y, u, v], chroma_shift=(1, 1), pred=1) == ref


def test_byte_identity_multitile(ffmpeg):
    img = RNG.integers(0, 256, (300, 280), dtype=np.uint8)
    ref = _ref_bytes(ffmpeg, img.tobytes(), "gray", "280x300", "-pred", "1")
    assert encode_frame_t800(img, pred=1) == ref


@pytest.mark.parametrize("prog", ["rlcp", "rpcl", "pcrl", "cprl"])
def test_byte_identity_progressions(ffmpeg, prog):
    img = RNG.integers(0, 256, (64, 64), dtype=np.uint8)
    ref = _ref_bytes(ffmpeg, img.tobytes(), "gray", "64x64",
                     "-pred", "1", "-prog", prog)
    assert encode_frame_t800(img, pred=1, prog=prog) == ref


def test_byte_identity_sop_eph(ffmpeg):
    img = RNG.integers(0, 256, (64, 64), dtype=np.uint8)
    ref = _ref_bytes(ffmpeg, img.tobytes(), "gray", "64x64",
                     "-pred", "1", "-sop", "1", "-eph", "1")
    assert encode_frame_t800(img, pred=1, sop=True, eph=True) == ref


def test_byte_identity_quality(ffmpeg):
    img = RNG.integers(0, 256, (64, 64), dtype=np.uint8)
    ref = _ref_bytes(ffmpeg, img.tobytes(), "gray", "64x64",
                     "-pred", "0", "-q:v", "10")
    assert encode_frame_t800(img, pred=0, quality=10) == ref


def test_byte_identity_layer_rates(ffmpeg):
    img = RNG.integers(0, 256, (64, 64), dtype=np.uint8)
    ref = _ref_bytes(ffmpeg, img.tobytes(), "gray", "64x64",
                     "-pred", "0", "-layer_rates", "8,4,2")
    assert encode_frame_t800(img, pred=0, layer_rates=[8, 4, 2]) == ref


def test_byte_identity_jp2(ffmpeg):
    img = RNG.integers(0, 256, (64, 64), dtype=np.uint8)
    ref = ffmpeg_encode_raw(ffmpeg, img.tobytes(), "gray", "64x64",
                            "-format", "jp2", "-flags", "+bitexact",
                            "-pred", "1")
    assert encode_frame_t800(img, pred=1, jp2=True) == ref


def test_ref_decodes_our_stream(ffmpeg):
    """Cross-check: the reference decoder reads our stream losslessly."""
    from conftest import ffmpeg_decode_raw_bytes
    img = RNG.integers(0, 256, (64, 64), dtype=np.uint8)
    data = encode_frame_t800(img, pred=1)
    out = ffmpeg_decode_raw_bytes(ffmpeg, data, ".j2k",
                                  "-flags", "+bitexact")
    assert np.array_equal(np.frombuffer(out, dtype=np.uint8).reshape(64, 64),
                          img)
