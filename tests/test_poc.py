"""Progression order changes (POC, T.800 A.6.6).

The encoder emits a main-header POC segment and orders packets by
replaying the decoder's POC iteration (t2.packet_order, incl. the
per-precinct decoded-layers dedup — ref jpeg2000dec.c:1147-1150,
1544-1833). Every stream is cross-validated against the reference
binary, whose POC loops share no code with ours — that breaks the
encode/decode circularity. POC streams now ride the native fast lane
(VERDICT r3 item 6), so parity runs through the TPU front door too.
"""

import numpy as np
import pytest

from conftest import ffmpeg_decode_raw_bytes

from ffmpeg_ht_tpu.models.encoder import encode_frame_htj2k
from ffmpeg_ht_tpu.models.host_decoder import decode_frame

RNG = np.random.default_rng(55)


def _roundtrip(ffmpeg, img, data):
    assert b"\xff\x5f" in data[:data.find(b"\xff\x90")]  # POC marker
    assert decode_frame(data, bitexact=True).tobytes() == img.tobytes()
    assert ffmpeg_decode_raw_bytes(ffmpeg, data, ".j2k", "-flags",
                                   "+bitexact") == img.tobytes()
    from ffmpeg_ht_tpu.models.decoder import Decoder
    assert Decoder().decode(data).tobytes() == img.tobytes()


def test_poc_reslevel_split(ffmpeg):
    """Two POC entries splitting the resolution axis (LRCP then RLCP)."""
    img = RNG.integers(0, 256, (96, 128), dtype=np.uint8)
    data = encode_frame_htj2k(img, nreslevels=4,
                              poc=[(0, 0, 1, 2, 1, "lrcp"),
                                   (2, 0, 1, 33, 1, "rlcp")])
    _roundtrip(ffmpeg, img, data)


def test_poc_component_split_rgb(ffmpeg):
    """POC splitting the component axis, mixed progressions, multitile."""
    img = RNG.integers(0, 256, (80, 112, 3), dtype=np.uint8)
    data = encode_frame_htj2k(img, tile_width=64, tile_height=64,
                              nreslevels=3,
                              poc=[(0, 0, 1, 33, 1, "rpcl"),
                                   (0, 1, 1, 33, 3, "cprl")])
    _roundtrip(ffmpeg, img, data)


def test_poc_layer_progressive(ffmpeg):
    """POC entries revisiting precincts at higher layer bounds: the
    decoded-layers dedup must skip already-decoded layers on the second
    visit (jpeg2000dec.c:1147-1150)."""
    img = RNG.integers(0, 256, (96, 128), dtype=np.uint8)
    data = encode_frame_htj2k(img, refinement=True, ht_layers=2,
                              nreslevels=3,
                              poc=[(0, 0, 1, 33, 1, "lrcp"),
                                   (0, 0, 2, 33, 1, "rlcp")])
    _roundtrip(ffmpeg, img, data)


def test_poc_rides_fast_lane(ffmpeg):
    """POC streams stay on the native fast lane (flat parse succeeds and
    the packet order baked into the geometry matches the stream)."""
    from ffmpeg_ht_tpu.codestream.parser import parse_codestream
    from ffmpeg_ht_tpu.models import fastpath as FP
    from ffmpeg_ht_tpu.models.decoder import Decoder

    img = RNG.integers(0, 256, (96, 128), dtype=np.uint8)
    data = encode_frame_htj2k(img, nreslevels=4,
                              poc=[(0, 0, 1, 3, 1, "rlcp"),
                                   (3, 0, 1, 33, 1, "lrcp")])
    hdr = parse_codestream(data, bitexact=True)
    assert FP.fast_profile(hdr)
    fg = Decoder._fast_geom(hdr)
    cols = FP.parse_frame_flat(hdr, fg)
    assert cols is not None and bool(cols["active"].any())
    # fingerprints must separate POC orders from the plain progression
    plain = encode_frame_htj2k(img, nreslevels=4)
    assert FP.geometry_fingerprint(hdr) != \
        FP.geometry_fingerprint(parse_codestream(plain, bitexact=True))
    _roundtrip(ffmpeg, img, data)
