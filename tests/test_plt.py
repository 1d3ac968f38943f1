"""PLT packet-length tables (T.800 A.7.3): emission, parse, and the
bytewise skip of discarded-layer packets (VERDICT r3 item 8; ref
jpeg2000dec.c:931-956 PLT handling).
"""

import numpy as np
import pytest

from conftest import ffmpeg_decode_raw_bytes

from ffmpeg_ht_tpu.codestream import t2
from ffmpeg_ht_tpu.codestream.parser import parse_codestream
from ffmpeg_ht_tpu.models.encoder import encode_frame_htj2k
from ffmpeg_ht_tpu.models.host_decoder import decode_frame

RNG = np.random.default_rng(17)


def test_plt_parse_and_reference_parity(ffmpeg):
    """PLT streams decode identically everywhere (the reference ignores
    the table; we parse it) and the parsed lengths sum to the body."""
    img = RNG.integers(0, 256, (96, 128), dtype=np.uint8)
    data = encode_frame_htj2k(img, plt=True, refinement=True, ht_layers=2)
    plain = encode_frame_htj2k(img, refinement=True, ht_layers=2)
    assert b"\xff\x58" in data and b"\xff\x58" not in plain
    hdr = parse_codestream(data, bitexact=True)
    th = hdr.tiles[0]
    assert th.plt_lengths, "PLT lengths not parsed"
    assert sum(th.plt_lengths) == sum(len(tp.data) for tp in th.tile_parts)
    ref = ffmpeg_decode_raw_bytes(ffmpeg, data, ".j2k", "-flags",
                                  "+bitexact")
    assert ref == img.tobytes()
    assert decode_frame(data, bitexact=True).tobytes() == ref
    # identical pixels with and without the table
    assert decode_frame(plain, bitexact=True).tobytes() == ref


def test_plt_skips_discarded_layers(monkeypatch):
    """max_layers truncation on a PLT stream must take the bytewise-skip
    path (never bit-parse the discarded packets) and yield the same
    pixels as the parsed-discard path on the identical no-PLT stream."""
    img = RNG.integers(0, 256, (96, 128), dtype=np.uint8)
    data = encode_frame_htj2k(img, plt=True, refinement=True,
                              ht_layers=2, sop=True, eph=True)
    plain = encode_frame_htj2k(img, refinement=True, ht_layers=2,
                               sop=True, eph=True)

    skips = []
    orig = t2._plt_skip
    monkeypatch.setattr(t2, "_plt_skip",
                        lambda s, n: (skips.append(n), orig(s, n))[1])
    capped = decode_frame(data, bitexact=True, max_layers=1)
    assert skips, "PLT skip path not taken for discarded layers"
    capped_plain = decode_frame(plain, bitexact=True, max_layers=1)
    assert capped.tobytes() == capped_plain.tobytes()
    # the skipped byte counts are exactly the discarded packets' lengths
    hdr = parse_codestream(data, bitexact=True)
    assert all(n in hdr.tiles[0].plt_lengths for n in skips)


def test_plt_multitile_tileparts_poc(ffmpeg):
    """PLT x tile-parts x POC: lengths distribute across parts and the
    skip walks part boundaries."""
    img = RNG.integers(0, 256, (80, 112, 3), dtype=np.uint8)
    data = encode_frame_htj2k(img, tile_width=64, tile_height=64,
                              plt=True, tp_interval=3, nreslevels=3,
                              refinement=True, ht_layers=2,
                              poc=[(0, 0, 2, 1, 3, "lrcp"),
                                   (1, 0, 2, 33, 3, "rlcp")])
    ref = ffmpeg_decode_raw_bytes(ffmpeg, data, ".j2k", "-flags",
                                  "+bitexact")
    assert decode_frame(data, bitexact=True).tobytes() == ref
    full = decode_frame(data, bitexact=True, max_layers=0).tobytes()
    capped = decode_frame(data, bitexact=True, max_layers=1).tobytes()
    assert capped != full  # layer 1 refines
