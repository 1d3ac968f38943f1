"""TPU pipeline tests: device decode == host oracle decode, byte-exact.

Runs on the CPU backend (conftest pins JAX_PLATFORMS=cpu); the same jitted
program runs on TPU. The entropy kernel executable is shared across all
geometries (shape-generic, see ops/ht_batch.py), so the first decode pays
the one-time kernel compile and later cases only compile the cheap
per-geometry assembly.
"""

import numpy as np
import pytest

from ffmpeg_ht_tpu.models.decoder import Decoder
from ffmpeg_ht_tpu.models.encoder import encode_frame_htj2k, encode_frame_t800
from ffmpeg_ht_tpu.models.host_decoder import decode_frame

RNG = np.random.default_rng(77)


@pytest.fixture(scope="module")
def decoder():
    return Decoder()


def _check(decoder, img, **opts):
    data = encode_frame_htj2k(img, **opts)
    want = decode_frame(data, bitexact=True).tobytes()
    got = decoder.decode(data).tobytes()
    assert got == want
    # decode twice: the cached executable must be deterministic
    assert decoder.decode(data).tobytes() == want


def test_device_gray(decoder):
    _check(decoder, RNG.integers(0, 256, (64, 64), dtype=np.uint8))


def test_device_gray_odd(decoder):
    _check(decoder, RNG.integers(0, 256, (67, 53), dtype=np.uint8))


def test_device_rgb(decoder):
    _check(decoder, RNG.integers(0, 256, (48, 56, 3), dtype=np.uint8))


def test_device_16bit(decoder):
    _check(decoder, RNG.integers(0, 65536, (40, 40), dtype=np.uint16))


def test_device_batch_invariance(decoder):
    """Same stream decoded alone or amid others gives identical bytes
    (the analog of the FATE thread-count matrix, SURVEY.md §4)."""
    imgs = [RNG.integers(0, 256, (64, 64), dtype=np.uint8)
            for _ in range(3)]
    streams = [encode_frame_htj2k(i) for i in imgs]
    solo = [decoder.decode(s).tobytes() for s in streams]
    mixed = [decoder.decode(s).tobytes() for s in streams * 2]
    assert mixed[:3] == solo and mixed[3:] == solo


def test_host_fallback_for_legacy(decoder):
    """Non-HT (T.800 MQ) streams transparently use the host path."""
    img = RNG.integers(0, 256, (32, 32), dtype=np.uint8)
    data = encode_frame_t800(img, pred=1)
    got = decoder.decode(data).tobytes()
    assert got == img.tobytes()


def _smooth_img(h, w):
    x = np.linspace(0, 8, w)
    y = np.linspace(0, 6, h)
    return (np.sin(y[:, None]) * np.cos(x[None, :]) * 100 + 128) \
        .astype(np.uint8)


def _assert_device_used(hdr_data):
    """The stream must qualify for the device path (no silent fallback)."""
    from ffmpeg_ht_tpu.codestream.geometry import init_tile
    from ffmpeg_ht_tpu.codestream.parser import parse_codestream
    from ffmpeg_ht_tpu.codestream.t2 import decode_tile_packets
    from ffmpeg_ht_tpu.models.decoder import _supported_on_device
    for bitexact in (True, False):
        hdr = parse_codestream(hdr_data, bitexact=bitexact)
        tiles = []
        for tileno in range(len(hdr.tiles)):
            t = init_tile(hdr, tileno)
            decode_tile_packets(hdr, tileno, t)
            tiles.append(t)
        assert _supported_on_device(hdr, tiles), \
            f"stream fell back to host (bitexact={bitexact})"


def test_device_97int_gray(decoder):
    """Lossy 9/7 bitexact path runs on device, byte-equal to the host
    oracle (which is byte-equal to ffmpeg +bitexact, test_ht_codec)."""
    data = encode_frame_htj2k(_smooth_img(80, 96), pred=0)
    _assert_device_used(data)
    want = decode_frame(data, bitexact=True).tobytes()
    assert decoder.decode(data).tobytes() == want


def test_device_97int_rgb_ict(decoder):
    base = _smooth_img(80, 96)
    img = np.stack([base, base[::-1], np.roll(base, 7, 1)], axis=2)
    data = encode_frame_htj2k(img, pred=0, mct=True)
    _assert_device_used(data)
    want = decode_frame(data, bitexact=True).tobytes()
    assert decoder.decode(data).tobytes() == want


def test_device_97float_paths():
    """Float 9/7 (bitexact=False) on device: must match the host float
    oracle exactly on the integer outputs (same f32 chain, rint)."""
    dec = Decoder(bitexact=False)
    base = _smooth_img(80, 96)
    data = encode_frame_htj2k(base, pred=0)
    want = np.frombuffer(decode_frame(data, bitexact=False).tobytes(),
                         np.uint8).astype(int)
    got = np.frombuffer(dec.decode(data).tobytes(), np.uint8).astype(int)
    assert np.abs(got - want).max() <= 1  # backend fma/rounding freedom
    img = np.stack([base, base[::-1], np.roll(base, 7, 1)], axis=2)
    data3 = encode_frame_htj2k(img, pred=0, mct=True)
    want3 = np.frombuffer(decode_frame(data3, bitexact=False).tobytes(),
                          np.uint8).astype(int)
    got3 = np.frombuffer(dec.decode(data3).tobytes(), np.uint8).astype(int)
    assert np.abs(got3 - want3).max() <= 1


def test_device_rct_mct(decoder):
    """Reversible RCT MCT streams now run the device Pallas RCT kernel."""
    img = RNG.integers(0, 256, (48, 56, 3), dtype=np.uint8)
    data = encode_frame_htj2k(img, mct=True)
    _assert_device_used(data)
    assert decoder.decode(data).tobytes() == img.tobytes()


def test_device_batch_lossy(decoder):
    """decode_batch merges lossy same-geometry frames into one launch."""
    frames = [_smooth_img(64, 64) + i for i in range(3)]
    streams = [encode_frame_htj2k(f, pred=0) for f in frames]
    wants = [decode_frame(s, bitexact=True).tobytes() for s in streams]
    outs = decoder.decode_batch(streams)
    assert [o.tobytes() for o in outs] == wants
