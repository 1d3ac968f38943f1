"""Decode-side T2 parity tests: progressions, SOP/EPH, multi-layer, PPT,
POC, RGN/ROI.

The encode-side byte-identity tests (test_encoder.py) prove our encoder
matches j2kenc; these prove the *decode* paths (t2.py packet machinery)
against the reference decoder on the same streams — VERDICT.md round-1
item 6 (implemented-but-untested T2 machinery).
"""

import numpy as np
import pytest

from conftest import ffmpeg_decode_raw_bytes, ffmpeg_encode_raw

from ffmpeg_ht_tpu.models.host_decoder import decode_frame

RNG = np.random.default_rng(4242)


def _rgb_raw(h, w):
    return RNG.integers(0, 256, (h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("prog", ["rlcp", "rpcl", "pcrl", "cprl"])
def test_progression_decode_parity(ffmpeg, prog):
    """All non-LRCP progressions, reference-encoded RGB, multiple
    resolution levels: our decode must byte-match the reference's
    (t2.py:428-530 progression loops)."""
    img = _rgb_raw(96, 120)
    data = ffmpeg_encode_raw(ffmpeg, img.tobytes(), "rgb24", "120x96",
                             "-prog", prog)
    ref = ffmpeg_decode_raw_bytes(ffmpeg, data, ".j2k",
                                  "-flags", "+bitexact")
    assert decode_frame(data, bitexact=True).tobytes() == ref
    # also through the Decoder front door (host fallback for legacy T1)
    from ffmpeg_ht_tpu.models.decoder import Decoder
    assert Decoder(bitexact=True).decode(data).tobytes() == ref


def test_sop_eph_multilayer_decode_parity(ffmpeg):
    """SOP resync markers + EPH + 3 quality layers in one stream
    (t2.py SOP skip, EPH skip, layer loops)."""
    img = _rgb_raw(80, 96)
    data = ffmpeg_encode_raw(ffmpeg, img.tobytes(), "rgb24", "96x80",
                             "-prog", "lrcp", "-sop", "1", "-eph", "1",
                             "-layer_rates", "8,2,1")
    assert b"\xff\x91" in data and b"\xff\x92" in data
    ref = ffmpeg_decode_raw_bytes(ffmpeg, data, ".j2k",
                                  "-flags", "+bitexact")
    assert decode_frame(data, bitexact=True).tobytes() == ref


def test_multilayer_progressions_decode_parity(ffmpeg):
    """Layers x progression interaction (layer-interleaved packet order)."""
    img = _rgb_raw(64, 64)
    for prog in ("rlcp", "cprl"):
        data = ffmpeg_encode_raw(ffmpeg, img.tobytes(), "rgb24", "64x64",
                                 "-prog", prog, "-layer_rates", "4,1")
        ref = ffmpeg_decode_raw_bytes(ffmpeg, data, ".j2k",
                                      "-flags", "+bitexact")
        assert decode_frame(data, bitexact=True).tobytes() == ref, prog


def test_ppt_decode_parity(ffmpeg):
    """Packed packet headers (PPT): our encoder moves every packet header
    into PPT marker segments; both decoders must read them from the PPT
    stream (t2.py select_stream; jpeg2000dec.c:980-1004)."""
    from ffmpeg_ht_tpu.models.encoder import encode_frame_t800
    img = RNG.integers(0, 256, (96, 80), dtype=np.uint8)
    plain = encode_frame_t800(img)
    ppt = encode_frame_t800(img, ppt=True)
    assert b"\xff\x61" in ppt and b"\xff\x61" not in plain
    ours = decode_frame(ppt, bitexact=True).tobytes()
    assert ours == decode_frame(plain, bitexact=True).tobytes()
    assert ours == ffmpeg_decode_raw_bytes(ffmpeg, ppt, ".j2k",
                                           "-flags", "+bitexact")


def test_ppm_decode_parity(ffmpeg):
    """Packed packet headers in the MAIN header (PPM, T.800 A.7.4): the
    decoder must slice hdr.packed_headers by the Nppm prefixes in SOD
    order (t2.py:440-448; ref jpeg2000dec.c PPM handling). Multi-tile so
    several Nppm records exercise the distribution."""
    from ffmpeg_ht_tpu.models.encoder import encode_frame_t800
    img = RNG.integers(0, 256, (96, 80), dtype=np.uint8)
    plain = encode_frame_t800(img, tile_width=48, tile_height=48)
    ppm = encode_frame_t800(img, tile_width=48, tile_height=48, ppm=True)
    # PPM lives in the MAIN header (before the first SOT); FF60 can
    # legally appear inside MQ payload bytes, so only check there
    assert b"\xff\x60" in ppm[:ppm.find(b"\xff\x90")]
    assert b"\xff\x60" not in plain[:plain.find(b"\xff\x90")]
    ours = decode_frame(ppm, bitexact=True).tobytes()
    assert ours == decode_frame(plain, bitexact=True).tobytes()
    assert ours == ffmpeg_decode_raw_bytes(ffmpeg, ppm, ".j2k",
                                           "-flags", "+bitexact")


def test_ppt_multilayer_rgb_decode_parity(ffmpeg):
    from ffmpeg_ht_tpu.models.encoder import encode_frame_t800
    img = _rgb_raw(64, 96)
    ppt = encode_frame_t800([img[:, :, i] for i in range(3)],
                            chroma_shift=(0, 0), ppt=True,
                            layer_rates=[4, 1], prog="rpcl")
    ours = decode_frame(ppt, bitexact=True).tobytes()
    assert ours == ffmpeg_decode_raw_bytes(ffmpeg, ppt, ".j2k",
                                           "-flags", "+bitexact")


def _insert_before_sot(data: bytes, marker: bytes) -> bytes:
    """Insert a marker segment at the end of the main header."""
    i = data.find(b"\xff\x90")
    assert i > 0
    return data[:i] + marker + data[i:]


def test_poc_decode_parity(ffmpeg):
    """POC progression-order change, two volumes covering all packets.

    The volumes reproduce the stream's own LRCP order (1 layer, res split
    at 1), so packet bytes stay valid while both decoders must route
    through their POC machinery (t2.py:413-417 / jpeg2000dec.c POC)."""
    img = _rgb_raw(64, 64)
    data = ffmpeg_encode_raw(ffmpeg, img.tobytes(), "rgb24", "64x64",
                             "-prog", "lrcp")
    ncomp = 3
    vol = []
    for rs, re in ((0, 1), (1, 33)):
        vol.append(bytes([rs, 0]) + (1).to_bytes(2, "big")
                   + bytes([re, ncomp, 0]))  # Ppoc 0 = LRCP
    seg = b"".join(vol)
    poc = b"\xff\x5f" + (2 + len(seg)).to_bytes(2, "big") + seg
    pdata = _insert_before_sot(data, poc)
    ref_plain = ffmpeg_decode_raw_bytes(ffmpeg, data, ".j2k",
                                        "-flags", "+bitexact")
    ref_poc = ffmpeg_decode_raw_bytes(ffmpeg, pdata, ".j2k",
                                      "-flags", "+bitexact")
    assert ref_poc == ref_plain  # sanity: reference agrees order unchanged
    assert decode_frame(pdata, bitexact=True).tobytes() == ref_poc


def test_rgn_roi_decode_parity(ffmpeg):
    """RGN/ROI plumbing parity (t2.py:131-134, ebcot.py:324,367-369).

    The reference reinterprets the zerobits tag by +roi_shift
    (jpeg2000dec.c:1186) and starts T1 at bpno - roi_shift
    (jpeg2000dec.c:1997), which cancel; the final conditional upshift
    (jpeg2000dec.c:2083) then restores "background" samples, so a
    decode-side RGN on a non-ROI stream is pixel-neutral — our decoder
    must reproduce exactly that (including the comp-0 bug-compat)."""
    import subprocess
    img = RNG.integers(0, 256, (64, 64), dtype=np.uint8)
    data = ffmpeg_encode_raw(ffmpeg, img.tobytes(), "gray", "64x64")
    rgn = b"\xff\x5e\x00\x05\x00\x00\x06"  # Lrgn=5 Crgn=0 Srgn=0 SPrgn=6
    rdata = _insert_before_sot(data, rgn)
    ref = ffmpeg_decode_raw_bytes(ffmpeg, rdata, ".j2k")
    assert decode_frame(rdata).tobytes() == ref
    assert ref == ffmpeg_decode_raw_bytes(ffmpeg, data, ".j2k")
    # error parity: SRgn != 0 must be rejected by both
    bad = _insert_before_sot(data, b"\xff\x5e\x00\x05\x00\x01\x06")
    from ffmpeg_ht_tpu.utils.errors import J2KError
    with pytest.raises(J2KError):
        decode_frame(bad)
    with pytest.raises(subprocess.CalledProcessError):
        ffmpeg_decode_raw_bytes(ffmpeg, bad, ".j2k")
