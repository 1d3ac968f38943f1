"""Resolution-progressive decode (reduction_factor / -lowres) through
every front door, incl. the native fast lane (VERDICT r3 item 6).

Lowres drops the top DWT levels: packets of reslevels >=
nreslevels2decode still occupy the stream and must be parsed past
(jpeg2000dec.c:509-520); the fast lane routes their codeblocks into a
discard zone (fastpath.FlatGeometry). The reference binary's -lowres
output is the golden.
"""

import numpy as np
import pytest

from conftest import ffmpeg_decode_raw_bytes

from ffmpeg_ht_tpu.models.encoder import encode_frame_htj2k
from ffmpeg_ht_tpu.models.host_decoder import decode_frame

RNG = np.random.default_rng(99)


def _golden(ffmpeg, data, r):
    return ffmpeg_decode_raw_bytes(ffmpeg, data, ".j2k", "-flags",
                                   "+bitexact", "-lowres", str(r))


def test_lowres_fast_lane_gray(ffmpeg):
    from ffmpeg_ht_tpu.codestream.parser import parse_codestream
    from ffmpeg_ht_tpu.models import fastpath as FP
    from ffmpeg_ht_tpu.models.decoder import Decoder

    img = RNG.integers(0, 256, (96, 128), dtype=np.uint8)
    data = encode_frame_htj2k(img, nreslevels=5)
    for r in (1, 2):
        hdr = parse_codestream(data, bitexact=True,
                               reduction_factor=r)
        assert FP.fast_profile(hdr), f"lowres r={r} left the fast lane"
        ref = _golden(ffmpeg, data, r)
        assert decode_frame(data, bitexact=True,
                            reduction_factor=r).tobytes() == ref
        assert Decoder(reduction_factor=r).decode(data).tobytes() == ref


def test_lowres_rgb_multitile_precincts(ffmpeg):
    from ffmpeg_ht_tpu.models.decoder import Decoder

    img = RNG.integers(0, 256, (80, 112, 3), dtype=np.uint8)
    data = encode_frame_htj2k(img, tile_width=64, tile_height=64,
                              nreslevels=4, log2_prec_width=5, mct=True)
    ref = _golden(ffmpeg, data, 1)
    assert decode_frame(data, bitexact=True,
                        reduction_factor=1).tobytes() == ref
    assert Decoder(reduction_factor=1).decode(data).tobytes() == ref


def test_lowres_object_path_agrees(ffmpeg, monkeypatch):
    """Force the object path (fast lane off): lowres must decode
    identically there too — the device object path and host fallback are
    production paths for profiles the fast lane rejects."""
    from ffmpeg_ht_tpu.models import fastpath as FP
    from ffmpeg_ht_tpu.models.decoder import Decoder

    img = RNG.integers(0, 256, (96, 128), dtype=np.uint8)
    data = encode_frame_htj2k(img, nreslevels=5)
    ref = _golden(ffmpeg, data, 1)
    monkeypatch.setattr(FP, "fast_profile", lambda h: False)
    assert Decoder(reduction_factor=1).decode(data).tobytes() == ref


def test_lowres_layers_poc_combined(ffmpeg):
    """lowres x quality layers x POC in one stream through the fast
    lane."""
    from ffmpeg_ht_tpu.models.decoder import Decoder

    img = RNG.integers(0, 256, (96, 128), dtype=np.uint8)
    data = encode_frame_htj2k(img, nreslevels=4, refinement=True,
                              ht_layers=2,
                              poc=[(0, 0, 2, 2, 1, "lrcp"),
                                   (2, 0, 2, 33, 1, "rlcp")])
    ref = _golden(ffmpeg, data, 1)
    assert decode_frame(data, bitexact=True,
                        reduction_factor=1).tobytes() == ref
    assert Decoder(reduction_factor=1).decode(data).tobytes() == ref
