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
