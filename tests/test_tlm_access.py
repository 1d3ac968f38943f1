"""TLM random access (VERDICT r2 item 7; jpeg2000dec.c:901-930 analog).

A TLM table in the main header lets the parser seek straight to one
tile's tile-parts: decoding one tile of a multi-tile image must not read
the other tiles' bytes (hdr.tlm_skipped counts them)."""

import numpy as np

from conftest import ffmpeg_decode_raw_bytes

from ffmpeg_ht_tpu.models.encoder import encode_frame_htj2k, \
    encode_frame_t800
from ffmpeg_ht_tpu.models.host_decoder import decode_frame, decode_tile

RNG = np.random.default_rng(555)


def test_tlm_emission_reference_decodes(ffmpeg):
    """Streams carrying our TLM table must stay bit-exact for the
    reference decoder (it validates TLM, jpeg2000dec.c:901-930)."""
    img = RNG.integers(0, 256, (96, 128), dtype=np.uint8)
    data = encode_frame_htj2k(img, tile_width=64, tile_height=48,
                              tlm=True)
    assert data.count(b"\xff\x55") >= 1
    assert decode_frame(data, bitexact=True).tobytes() == img.tobytes()
    assert ffmpeg_decode_raw_bytes(ffmpeg, data, ".j2k", "-flags",
                                   "+bitexact") == img.tobytes()


def test_tlm_decode_tile_skips_other_tiles():
    img = RNG.integers(0, 256, (96, 128), dtype=np.uint8)
    data = encode_frame_htj2k(img, tile_width=64, tile_height=48,
                              tlm=True)
    full = decode_frame(data, bitexact=True)
    # 2x2 tile grid: tile 3 = bottom-right (64.., 48..)
    fr = decode_tile(data, 3, bitexact=True)
    a = fr.planes[0]
    assert np.array_equal(a[48:96, 64:128], full.planes[0][48:96, 64:128])
    assert not a[:48, :].any() and not a[:, :64].any()
    # the other three tiles' bytes were seeked over, not parsed: with
    # near-incompressible content, that is most of the codestream
    assert fr.tlm_skipped > len(data) // 2, fr.tlm_skipped


def test_tlm_decode_tile_t800():
    img = RNG.integers(0, 256, (80, 80), dtype=np.uint8)
    data = encode_frame_t800(img, tile_width=40, tile_height=40,
                             tlm=True)
    full = decode_frame(data, bitexact=True)
    fr = decode_tile(data, 0, bitexact=True)
    assert np.array_equal(fr.planes[0][:40, :40],
                          full.planes[0][:40, :40])
    assert fr.tlm_skipped > 0


def test_decode_tile_without_tlm_still_works():
    img = RNG.integers(0, 256, (64, 96), dtype=np.uint8)
    data = encode_frame_htj2k(img, tile_width=48, tile_height=32)
    full = decode_frame(data, bitexact=True)
    fr = decode_tile(data, 1, bitexact=True)
    assert np.array_equal(fr.planes[0][:32, 48:96],
                          full.planes[0][:32, 48:96])
    assert fr.tlm_skipped == 0
