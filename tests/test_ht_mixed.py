"""HT MIXED set streams: per-codeblock HT Cleanup vs legacy MQ coding.

VERDICT r2 item 5: the MIXED branches of the segment-length state
machine (t2.py:303-351 / jpeg2000dec.c:1256-1439) had no vector source —
the in-repo HT encoder emitted HTONLY only and the reference encoder is
T.800-only.  `encode_frame_htj2k(ht_mixed=True)` alternates codeblocks
between the HT Cleanup coder and the legacy T.800 MQ coder under Ccap15
bits 14-15 = 3 / SPcod style 0xC0, which drives both classification arms
of the first-inclusion MIXED machine:

  * nonzero first chunk with lblock > 3 and length-MSB 0 -> HT Cleanup
    (t2.py:321-326)
  * nonzero first chunk otherwise -> original J2K block bitstream,
    cblk.modes loses CTSY_HTJ2K_F and the block routes to the EBCOT
    tier (t2.py:327-335)
"""

import numpy as np
import pytest

from conftest import ffmpeg_decode_raw_bytes

from ffmpeg_ht_tpu.codestream import markers as mk
from ffmpeg_ht_tpu.codestream.geometry import init_tile
from ffmpeg_ht_tpu.codestream.parser import parse_codestream
from ffmpeg_ht_tpu.codestream.t2 import decode_tile_packets
from ffmpeg_ht_tpu.models.encoder import encode_frame_htj2k
from ffmpeg_ht_tpu.models.host_decoder import decode_frame

RNG = np.random.default_rng(99)


def _coder_census(data: bytes):
    """(n_ht, n_legacy) after T2 classification."""
    hdr = parse_codestream(data, bitexact=True)
    n_ht = n_legacy = 0
    for tileno in range(len(hdr.tiles)):
        tile = init_tile(hdr, tileno)
        decode_tile_packets(hdr, tileno, tile)
        for comp in tile.comp:
            for rlevel in comp.reslevel:
                for band in rlevel.band:
                    for prec in band.prec:
                        for cblk in prec.cblk:
                            if cblk.npasses <= 0:
                                continue
                            if cblk.modes & mk.CTSY_HTJ2K_F:
                                n_ht += 1
                            else:
                                n_legacy += 1
    return n_ht, n_legacy


def test_mixed_signaling_and_census():
    img = RNG.integers(0, 256, (96, 128), dtype=np.uint8)
    data = encode_frame_htj2k(img, ht_mixed=True)
    hdr = parse_codestream(data, bitexact=True)
    assert hdr.caps.is_ht and hdr.caps.mode == mk.HT_MIXED_SET
    assert hdr.tiles[0].codsty[0].cblk_style \
        == (mk.CTSY_HTJ2K_F | mk.HT_MIXED)
    n_ht, n_legacy = _coder_census(data)
    # the alternator must leave BOTH coders represented, else the MIXED
    # machine is not actually exercised
    assert n_ht >= 2 and n_legacy >= 2, (n_ht, n_legacy)


def test_mixed_decode_lossless():
    img = RNG.integers(0, 256, (96, 128), dtype=np.uint8)
    data = encode_frame_htj2k(img, ht_mixed=True)
    assert decode_frame(data, bitexact=True).tobytes() == img.tobytes()


def test_mixed_decode_vs_reference(ffmpeg):
    """Byte-exact vs ffmpeg -i: the reference runs the same MIXED
    classification (jpeg2000dec.c:1256-1439), so agreement pins both the
    encoder's signaling and our decode-side machine."""
    img = RNG.integers(0, 256, (96, 128), dtype=np.uint8)
    data = encode_frame_htj2k(img, ht_mixed=True)
    ref = ffmpeg_decode_raw_bytes(ffmpeg, data, ".j2k", "-flags",
                                  "+bitexact")
    assert ref == img.tobytes()
    assert decode_frame(data, bitexact=True).tobytes() == ref


def test_mixed_multitile_rgb_vs_reference(ffmpeg):
    """Multi-tile RGB + RCT exercises per-tile T2 state and the EBCOT
    tier across components."""
    img = RNG.integers(0, 256, (70, 90, 3), dtype=np.uint8)
    data = encode_frame_htj2k(img, ht_mixed=True, tile_width=48,
                              tile_height=40, mct=True)
    ref = ffmpeg_decode_raw_bytes(ffmpeg, data, ".j2k", "-flags",
                                  "+bitexact")
    assert ref == img.tobytes()
    assert decode_frame(data, bitexact=True).tobytes() == ref


def test_mixed_smooth_content_vs_reference(ffmpeg):
    """Smooth gradients make long MQ runs and tiny HT blocks — the
    regression soup for length-field edge cases (leading-zero widths,
    the av_log2(L) >= av_log2(np)-av_log2(seg1) legacy constraint)."""
    y, x = np.mgrid[0:96, 0:128]
    img = ((np.sin(x / 9.0) + np.cos(y / 13.0)) * 60 + 128).astype(np.uint8)
    data = encode_frame_htj2k(img, ht_mixed=True, log2_cblk_width=5,
                              log2_cblk_height=5)
    ref = ffmpeg_decode_raw_bytes(ffmpeg, data, ".j2k", "-flags",
                                  "+bitexact")
    assert ref == img.tobytes()
    assert decode_frame(data, bitexact=True).tobytes() == ref


def test_mixed_device_falls_back_to_host():
    """The device bucket path requires every lane to be HT
    (decoder._device_supported) and fast_profile requires style 0x40
    exactly; a MIXED frame must still decode correctly through Decoder
    via the host fallback."""
    from ffmpeg_ht_tpu.models.decoder import Decoder

    img = RNG.integers(0, 256, (64, 80), dtype=np.uint8)
    data = encode_frame_htj2k(img, ht_mixed=True)
    dec = Decoder(bitexact=True)
    assert dec.decode(data).tobytes() == img.tobytes()


def test_mixed_rejects_unsupported_modes():
    img = RNG.integers(0, 256, (32, 32), dtype=np.uint8)
    with pytest.raises(ValueError):
        encode_frame_htj2k(img, ht_mixed=True, pred=0)
    with pytest.raises(ValueError):
        encode_frame_htj2k(img, ht_mixed=True, refinement=True)
