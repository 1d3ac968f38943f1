"""Native MQ/EBCOT tier (native/ebcot.c) vs the Python oracle.

The C port must be bit-identical to ops/ebcot.py's scalar decoder on
real T.800 streams (the Python body stays as the no-compiler fallback
and the behavioral oracle, checkasm-style)."""

import numpy as np
import pytest

from conftest import ffmpeg_decode_raw_bytes

from ffmpeg_ht_tpu.models.encoder import encode_frame_t800
from ffmpeg_ht_tpu.models.host_decoder import decode_frame
from ffmpeg_ht_tpu.utils import native as NAT

RNG = np.random.default_rng(808)


def _ab(data, monkeypatch):
    if NAT.load() is None:
        pytest.skip("native tier unavailable")
    a = decode_frame(data, bitexact=True)
    with monkeypatch.context() as m:
        m.setattr(NAT, "ebcot_decode_cblk", lambda *a_, **k: None)
        b = decode_frame(data, bitexact=True)
    assert a.tobytes() == b.tobytes()
    return a


def test_native_ebcot_gray(monkeypatch, ffmpeg):
    img = RNG.integers(0, 256, (70, 90), dtype=np.uint8)
    data = encode_frame_t800(img)
    f = _ab(data, monkeypatch)
    assert f.tobytes() == img.tobytes()
    assert ffmpeg_decode_raw_bytes(ffmpeg, data, ".j2k", "-flags",
                                   "+bitexact") == img.tobytes()


def test_native_ebcot_rgb_multitile(monkeypatch, ffmpeg):
    imgs = [RNG.integers(0, 256, (64, 80), dtype=np.uint8)
            for _ in range(3)]
    data = encode_frame_t800(np.stack(imgs, axis=2), tile_width=48,
                             tile_height=32)
    f = _ab(data, monkeypatch)
    assert ffmpeg_decode_raw_bytes(ffmpeg, data, ".j2k", "-flags",
                                   "+bitexact") == f.tobytes()


def test_native_ebcot_lossy97(monkeypatch, ffmpeg):
    img = RNG.integers(0, 256, (96, 96), dtype=np.uint8)
    data = encode_frame_t800(img, pred=0)
    f = _ab(data, monkeypatch)
    assert ffmpeg_decode_raw_bytes(ffmpeg, data, ".j2k", "-flags",
                                   "+bitexact") == f.tobytes()
