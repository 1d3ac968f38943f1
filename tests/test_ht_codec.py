"""HTJ2K (T.814) codec tests.

The reference has no HT encoder, so HT test vectors come from our own
encoder (ops/ht_enc.py + models.encoder.encode_frame_htj2k); every stream
is cross-checked against the reference `ffmpeg` HT *decoder* — a
two-implementation agreement test for the whole HT path (CAP marker, T2
HT length machinery, MEL/VLC/MagSgn cleanup coding, dequant alignment).
"""

import numpy as np
import pytest

from ffmpeg_ht_tpu.models.encoder import encode_frame_htj2k
from ffmpeg_ht_tpu.models.host_decoder import decode_frame
from ffmpeg_ht_tpu.ops.ht_dec import decode_htj2k
from ffmpeg_ht_tpu.ops.ht_enc import (MagSgnPacker, MELPacker, VLCPacker,
                                      encode_cleanup)
from ffmpeg_ht_tpu.ops.ht_dec import _FwdBits, _MelState, _RevBits

from conftest import ffmpeg_decode_raw_bytes

RNG = np.random.default_rng(1234)


# ---------------------------------------------------------------------------
# packer <-> reader property tests (the analog of checkasm kernel tests)
# ---------------------------------------------------------------------------

def test_magsgn_packer_roundtrip():
    for _ in range(100):
        fields = [(int(RNG.integers(0, 1 << n)), n)
                  for n in RNG.integers(1, 25, size=30)]
        p = MagSgnPacker()
        for v, n in fields:
            p.put(v, n)
        data = p.finish()
        r = _FwdBits(data, len(data))
        r.refill()
        for v, n in fields:
            assert r.get(n) == v


def test_mel_packer_roundtrip():
    for _ in range(100):
        syms = list(RNG.integers(0, 2, size=60))
        p = MELPacker()
        for s in syms:
            p.sym(int(s))
        data = p.finish()
        m = _MelState(data + b"\xff" * 8, 0, len(data) + 8)
        for s in syms:
            assert m.sym() == s


def test_vlc_packer_roundtrip():
    for _ in range(200):
        bits = list(RNG.integers(0, 2, size=int(RNG.integers(1, 300))))
        p = VLCPacker()
        for b in bits:
            p.bit(int(b))
        vlcb = p.finish()
        scup = len(vlcb) + 1
        buf = bytearray(vlcb)
        buf[-1] |= scup & 0xF
        buf.append(scup >> 4)
        lcup = len(buf)
        buf[lcup - 1] = 0xFF
        buf[lcup - 2] |= 0x0F
        r = _RevBits(bytes(buf), lcup - 2, buf[lcup - 2])
        r.refill()
        r.drop(4)
        for b in bits:
            assert r.get(1) == b


# ---------------------------------------------------------------------------
# block-level roundtrip vs the scalar oracle decoder
# ---------------------------------------------------------------------------

def test_ht_block_roundtrip_random():
    for _ in range(60):
        h = int(RNG.integers(1, 65))
        w = int(RNG.integers(1, 65))
        if w * h > 4096:
            continue
        magb = 8
        mag = RNG.integers(0, 128, (h, w)).astype(np.int64)
        mag = np.where(RNG.random((h, w)) < RNG.random(), 0, mag)
        sign = RNG.integers(0, 2, (h, w)).astype(np.int64)
        zbp = magb - 1
        data, lcup = encode_cleanup(mag, sign, zbp)
        out = decode_htj2k(data, 1, zbp, [lcup, 0], w, h, magb)
        pLSB = 30 - zbp
        exp = np.where(mag > 0,
                       (mag << pLSB) | (1 << (pLSB - 1)) | (sign << 31), 0)
        assert np.array_equal(out.astype(np.int64) & 0xFFFFFFFF,
                              exp & 0xFFFFFFFF)


# ---------------------------------------------------------------------------
# frame-level: our decoder and the reference decoder, both lossless
# ---------------------------------------------------------------------------

def _frame_case(img, chroma_shift=(0, 0), raw=None, **opts):
    data = encode_frame_htj2k(img, chroma_shift=chroma_shift, **opts)
    if raw is None:
        raw = img.tobytes() if img.dtype == np.uint8 \
            else img.astype("<u2").tobytes()
    ours = decode_frame(data, bitexact=True).tobytes()
    assert ours == raw, "our decoder not lossless"
    return data, raw


@pytest.mark.parametrize("shape", [(64, 64), (67, 53), (128, 128)])
def test_ht_gray_lossless(ffmpeg, shape):
    img = RNG.integers(0, 256, shape, dtype=np.uint8)
    data, raw = _frame_case(img)
    assert ffmpeg_decode_raw_bytes(ffmpeg, data, ".j2k",
                                   "-flags", "+bitexact") == raw


def test_ht_rgb_lossless(ffmpeg):
    img = RNG.integers(0, 256, (48, 56, 3), dtype=np.uint8)
    data, raw = _frame_case(img)
    assert ffmpeg_decode_raw_bytes(ffmpeg, data, ".j2k",
                                   "-flags", "+bitexact") == raw


def test_ht_16bit_lossless(ffmpeg):
    img = RNG.integers(0, 65536, (40, 40), dtype=np.uint16)
    data, raw = _frame_case(img)
    assert ffmpeg_decode_raw_bytes(ffmpeg, data, ".j2k",
                                   "-flags", "+bitexact") == raw


def test_ht_multitile_lossless(ffmpeg):
    img = RNG.integers(0, 256, (300, 280), dtype=np.uint8)
    data, raw = _frame_case(img)
    assert ffmpeg_decode_raw_bytes(ffmpeg, data, ".j2k",
                                   "-flags", "+bitexact") == raw


def test_ht_yuv420_lossless(ffmpeg):
    y = RNG.integers(0, 256, (48, 64), dtype=np.uint8)
    u = RNG.integers(0, 256, (24, 32), dtype=np.uint8)
    v = RNG.integers(0, 256, (24, 32), dtype=np.uint8)
    raw = y.tobytes() + u.tobytes() + v.tobytes()
    data = encode_frame_htj2k([y, u, v], chroma_shift=(1, 1))
    assert decode_frame(data, bitexact=True).tobytes() == raw
    assert ffmpeg_decode_raw_bytes(ffmpeg, data, ".j2k",
                                   "-flags", "+bitexact") == raw


def test_ht_extremes(ffmpeg):
    for img in (np.zeros((64, 64), dtype=np.uint8),
                np.full((64, 64), 255, dtype=np.uint8)):
        data, raw = _frame_case(img)
        assert ffmpeg_decode_raw_bytes(ffmpeg, data, ".j2k",
                                       "-flags", "+bitexact") == raw


# ---------------------------------------------------------------------------
# refinement passes (Cleanup + SigProp + MagRef, z_blk = 3)
# ---------------------------------------------------------------------------

def test_ht_3pass_block_roundtrip():
    from ffmpeg_ht_tpu.ops.ht_enc import encode_block_3pass
    magb = 8
    done = 0
    for _ in range(40):
        h = int(RNG.integers(2, 33))
        w = int(RNG.integers(2, 33))
        mag = RNG.integers(0, 128, (h, w)).astype(np.int64)
        mag = np.where(RNG.random((h, w)) < RNG.random(), 0, mag)
        sign = np.where(mag > 0,
                        RNG.integers(0, 2, (h, w)).astype(np.int64), 0)
        enc = encode_block_3pass(mag, sign, magb - 2)
        if enc is None:
            continue  # isolated |c|==1: legitimately not 3-pass codeable
        data, lcup, lref = enc
        out = decode_htj2k(data, 3, magb - 2, [lcup, lref], w, h, magb)
        v = out.astype(np.int64) & 0xFFFFFFFF
        got_mag = (v & 0x7FFFFFFF) >> (31 - magb)
        got_sign = (v >> 31) & 1
        assert np.array_equal(got_mag, mag)
        assert np.array_equal(np.where(got_mag > 0, got_sign, 0), sign)
        done += 1
    assert done > 10


def test_ht_3pass_frame_both_decoders(ffmpeg):
    img = RNG.integers(0, 256, (64, 64), dtype=np.uint8)
    data = encode_frame_htj2k(img, refinement=True)
    assert decode_frame(data, bitexact=True).tobytes() == img.tobytes()
    assert ffmpeg_decode_raw_bytes(ffmpeg, data, ".j2k",
                                   "-flags", "+bitexact") == img.tobytes()


def test_ht_causal_frame_both_decoders(ffmpeg, monkeypatch):
    """Vertically stripe-causal (SPcod 0x08) 3-pass stream: lossless
    through our device decoder (refinement kernel causal path, no host
    fallback for full-size blocks) and bit-exact in the reference
    decoder's causal_cond path (jpeg2000htdec.c:1034-1077)."""
    from ffmpeg_ht_tpu.models.decoder import Decoder, _HOST_AREA
    from ffmpeg_ht_tpu.ops import ht_dec
    img = RNG.integers(0, 256, (64, 64), dtype=np.uint8)
    data = encode_frame_htj2k(img, refinement=True, causal=True)
    calls = []
    orig = ht_dec.decode_htj2k
    monkeypatch.setattr(ht_dec, "decode_htj2k",
                        lambda *a, **k: calls.append(a) or orig(*a, **k))
    assert Decoder().decode(data).tobytes() == img.tobytes()
    big = [a for a in calls if a[4] * a[5] >= _HOST_AREA]
    assert not big, f"causal blocks fell back to the host oracle: {big}"
    assert ffmpeg_decode_raw_bytes(ffmpeg, data, ".j2k",
                                   "-flags", "+bitexact") == img.tobytes()


def test_ht_3pass_device_path(ffmpeg, monkeypatch):
    """3-pass blocks decode through the device refinement kernel — the
    host oracle must not run at all for full-size blocks."""
    from ffmpeg_ht_tpu.models.decoder import Decoder
    from ffmpeg_ht_tpu.ops import ht_dec
    img = RNG.integers(0, 256, (64, 64), dtype=np.uint8)
    data = encode_frame_htj2k(img, refinement=True)
    calls = []
    orig = ht_dec.decode_htj2k
    monkeypatch.setattr(ht_dec, "decode_htj2k",
                        lambda *a, **k: calls.append(a) or orig(*a, **k))
    assert Decoder().decode(data).tobytes() == img.tobytes()
    # full-size refined codeblocks must decode on device; only blocks
    # under the host-area threshold (edge slivers / low reslevels) may
    # use the scalar oracle
    from ffmpeg_ht_tpu.models.decoder import _HOST_AREA
    big = [a for a in calls if a[4] * a[5] >= _HOST_AREA]
    assert not big, f"refined blocks fell back to the host oracle: {big}"


def test_native_encoder_matches_python():
    """native/htenc.c must emit byte-identical cleanup segments."""
    from ffmpeg_ht_tpu.utils import native as NV
    if NV.load() is None or not hasattr(NV.load(), "ht_encode_cleanup"):
        pytest.skip("native library unavailable")
    from ffmpeg_ht_tpu.ops import ht_enc
    for _ in range(20):
        h = int(RNG.integers(1, 65))
        w = int(RNG.integers(1, 65))
        if w * h > 4096:
            continue
        mag = RNG.integers(0, 128, (h, w)).astype(np.int64)
        mag = np.where(RNG.random((h, w)) < RNG.random(), 0, mag)
        sign = RNG.integers(0, 2, (h, w)).astype(np.int64)
        nat = NV.ht_encode_cleanup(mag, sign, 7)
        assert nat is not None
        save = NV._LIB
        NV._LIB = None
        NV._TRIED = True
        try:
            py = ht_enc.encode_cleanup(mag, sign, 7)
        finally:
            NV._LIB = save
        assert nat == py


def test_ht_10bit_444_parity(ffmpeg):
    """3-component 10-bit: output is rgb48le with depth scaling, exactly
    as the reference negotiates it (jpeg2000dec.c:197-422)."""
    planes = [RNG.integers(0, 1024, (64, 64)).astype(np.uint16)
              for _ in range(3)]
    data = encode_frame_htj2k(planes, chroma_shift=(0, 0), depth=10)
    ours = decode_frame(data, bitexact=True)
    assert ours.fmt.name == "rgb48le"
    ref = ffmpeg_decode_raw_bytes(ffmpeg, data, ".j2k",
                                  "-flags", "+bitexact")
    assert ours.tobytes() == ref


def test_jph_file_format(ffmpeg, tmp_path):
    """JPH (T.815) wrapping: JP2 box structure with the 'jph ' brand."""
    img = RNG.integers(0, 256, (64, 64), dtype=np.uint8)
    data = encode_frame_htj2k(img, jp2=True)
    assert data[4:8] == b"jP\x20\x20" and b"jph\x20" in data[:40]
    assert decode_frame(data, bitexact=True).tobytes() == img.tobytes()
    # the reference decodes it when routed to its JPEG 2000 decoder via the
    # image pipe demuxer (ffmpeg has no .jph extension mapping, SURVEY.md
    # §2.3; not every build registers j2k_pipe, so force the codec)
    from conftest import require_ffmpeg
    require_ffmpeg("demuxers", "image2pipe")
    p = tmp_path / "f.jph"
    p.write_bytes(data)
    import subprocess
    r = subprocess.run(
        [ffmpeg, "-loglevel", "error", "-flags", "+bitexact",
         "-f", "image2pipe", "-c:v", "jpeg2000", "-i", str(p),
         "-f", "rawvideo", "-"],
        check=True, capture_output=True)
    assert r.stdout == img.tobytes()


def _smooth(h, w):
    x = np.linspace(0, 8, w)
    y = np.linspace(0, 6, h)
    return (np.sin(y[:, None]) * np.cos(x[None, :]) * 100 + 128) \
        .astype(np.uint8)


def test_ht_lossy_gray_parity(ffmpeg):
    """Lossy (9/7 + QSTY_SE) HT encode: our bitexact decode must equal the
    reference's +bitexact decode byte-for-byte, and the float paths must
    match each other (both are lrintf chains over the same stream)."""
    img = _smooth(80, 96)
    data = encode_frame_htj2k(img, pred=0)
    ref_be = ffmpeg_decode_raw_bytes(ffmpeg, data, ".j2k",
                                     "-flags", "+bitexact")
    assert decode_frame(data, bitexact=True).tobytes() == ref_be
    ref_f = ffmpeg_decode_raw_bytes(ffmpeg, data, ".j2k")
    ours_f = decode_frame(data, bitexact=False).tobytes()
    a = np.frombuffer(ours_f, np.uint8).astype(int)
    b = np.frombuffer(ref_f, np.uint8).astype(int)
    assert np.abs(a - b).max() <= 1  # BASELINE.md: 9/7 within 1 LSB
    # genuinely lossy but close
    err = np.abs(np.frombuffer(ref_be, np.uint8).astype(int)
                 - img.reshape(-1).astype(int)).max()
    assert err <= 8


def test_ht_lossy_rgb_ict_parity(ffmpeg):
    base = _smooth(80, 96)
    img = np.stack([base, base[::-1], np.roll(base, 7, 1)], axis=2)
    data = encode_frame_htj2k(img, pred=0, mct=True)
    ref = ffmpeg_decode_raw_bytes(ffmpeg, data, ".j2k",
                                  "-flags", "+bitexact")
    assert decode_frame(data, bitexact=True).tobytes() == ref


def test_ht_rct_lossless_roundtrip(ffmpeg):
    img = RNG.integers(0, 256, (48, 56, 3), dtype=np.uint8)
    data = encode_frame_htj2k(img, pred=1, mct=True)
    ref = ffmpeg_decode_raw_bytes(ffmpeg, data, ".j2k",
                                  "-flags", "+bitexact")
    assert ref == img.tobytes()  # RCT is exactly invertible
    assert decode_frame(data, bitexact=True).tobytes() == ref


def test_htrev_set_rejects_lossy_transform():
    """Ccap15 bit5 clear (HTREV reversible-only) + transform 0 must be
    rejected on the float path but decode in bitexact mode, matching the
    reference (jpeg2000dec.c:1056-1059 runs after the +bitexact transform
    remap)."""
    from ffmpeg_ht_tpu.utils.errors import J2KError
    img = _smooth(64, 64)
    data = bytearray(encode_frame_htj2k(img, pred=0))
    # Ccap15 is the u16 right after the 4-byte Pcap in the CAP segment
    cap = data.index(b"\xff\x50")
    ccap15 = cap + 8
    assert data[ccap15 + 1] & 0x20
    data[ccap15 + 1] &= ~0x20
    with pytest.raises(J2KError):
        decode_frame(bytes(data), bitexact=False)
    decode_frame(bytes(data), bitexact=True)  # must not raise
