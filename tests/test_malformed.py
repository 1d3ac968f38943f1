"""Malformed-codestream rejection: typed errors, never crashes.

Parity with the reference's defensive AVERROR_INVALIDDATA paths
(jpeg2000dec.c:208-211, 1187-1191, 2856-2858; SURVEY.md section 5).
"""

import numpy as np
import pytest

from ffmpeg_ht_tpu.models.encoder import encode_frame_t800
from ffmpeg_ht_tpu.models.host_decoder import decode_frame
from ffmpeg_ht_tpu.utils.errors import J2KError


def _sample() -> bytes:
    img = np.arange(256, dtype=np.uint8).reshape(16, 16)
    return encode_frame_t800(img, pred=1)


@pytest.mark.parametrize("bad", [
    b"",
    b"\x00",
    b"garbage" * 16,
    b"\xff\x4f",               # bare SOC
    b"\xff\x4f\xff\x51\x00",   # truncated SIZ
])
def test_garbage_rejected(bad):
    with pytest.raises(J2KError):
        decode_frame(bad)


def test_truncations_never_crash():
    data = _sample()
    for cut in range(0, len(data), 7):
        try:
            decode_frame(data[:cut])
        except J2KError:
            pass  # typed rejection is fine; crashes are not


def test_bitflips_never_crash():
    data = bytearray(_sample())
    rng = np.random.default_rng(0)
    for _ in range(64):
        pos = int(rng.integers(0, len(data)))
        bit = 1 << int(rng.integers(0, 8))
        mutated = bytearray(data)
        mutated[pos] ^= bit
        try:
            decode_frame(bytes(mutated))
        except J2KError:
            pass


def _decode_both(data: bytes):
    """Decode via host and via the TPU-path Decoder; return comparable
    outcomes: ('ok', pixel bytes) or ('err',). Any non-J2KError propagates
    (= test failure)."""
    from ffmpeg_ht_tpu.models.decoder import Decoder
    try:
        h = ("ok", decode_frame(data).tobytes())
    except J2KError:
        h = ("err",)
    try:
        d = ("ok", Decoder().decode(data).tobytes())
    except J2KError:
        d = ("err",)
    return h, d


def test_device_host_agree_on_mutants():
    """The device path must agree with the host path on every mutant —
    same pixels or both reject (parity with jpeg2000htdec.c:1252-1273;
    VERDICT r1: the device path used to silently zero bad-Scup blocks)."""
    from ffmpeg_ht_tpu.models.encoder import encode_frame_htj2k
    img = np.arange(4096, dtype=np.uint8).reshape(64, 64)
    data = bytearray(encode_frame_htj2k(img))
    rng = np.random.default_rng(7)
    checked = 0
    for _ in range(48):
        pos = int(rng.integers(0, len(data)))
        bit = 1 << int(rng.integers(0, 8))
        mutated = bytearray(data)
        mutated[pos] ^= bit
        h, d = _decode_both(bytes(mutated))
        assert h == d, f"host={h[0]} device={d[0]} at byte {pos} bit {bit}"
        checked += 1
    assert checked == 48


def test_device_truncations_match_host():
    from ffmpeg_ht_tpu.models.encoder import encode_frame_htj2k
    img = np.arange(1024, dtype=np.uint8).reshape(32, 32)
    data = encode_frame_htj2k(img)
    for cut in range(16, len(data), 11):
        h, d = _decode_both(data[:cut])
        assert h == d, f"host={h[0]} device={d[0]} at cut {cut}"


def test_missing_first_tile_part_rejected():
    """A corrupt TPsot on the only tile-part leaves the tile without
    COD/QCD; must be a typed rejection (found by fuzzing; the reference
    fails the same stream with AVERROR_INVALIDDATA)."""
    data = bytearray(_sample())
    sot = data.index(b"\xff\x90")
    tpsot = sot + 10  # SOT: marker(2) Lsot(2) Isot(2) Psot(4) TPsot(1)
    assert data[tpsot] == 0
    data[tpsot] = 1
    with pytest.raises(J2KError):
        decode_frame(bytes(data))


def test_device_host_agree_on_refined_mutants():
    """Same mutant-agreement contract for 3-pass (SigProp/MagRef)
    streams: the device refinement kernel and the native-T2 fast lane
    must match the host oracle on every mutant — pixels or rejection."""
    from ffmpeg_ht_tpu.models.encoder import encode_frame_htj2k
    rng = np.random.default_rng(17)
    img = rng.integers(0, 256, (64, 64), dtype=np.uint8)
    data = bytearray(encode_frame_htj2k(img, refinement=True))
    # mutate tile-part data only: header mutations change the geometry,
    # and every new geometry costs a fresh kernel compile on the 1-core
    # test host; body mutations exercise exactly the entropy/refinement
    # error paths this test is about
    body0 = data.index(b"\xff\x93") + 2        # first SOD
    for _ in range(16):
        pos = int(rng.integers(body0, len(data)))
        bit = 1 << int(rng.integers(0, 8))
        mutated = bytearray(data)
        mutated[pos] ^= bit
        h, d = _decode_both(bytes(mutated))
        assert h == d, f"host={h[0]} device={d[0]} at byte {pos} bit {bit}"
