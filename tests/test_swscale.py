"""swscale-analog conversions (models/swscale.py) vs the reference.

Exactness tiers: every same-colorspace bit-depth change is pinned
BYTE-EXACT against the reference binary (libswscale's planar-copy
semantics: MSB-replication upshifts, ordered-dither downshifts —
swscale_unscaled.c:2076-2265); color-space transforms must match the
reference's swscale within a small LSB budget (its exact output depends
on its internal YUV pipeline's converter selection, out of scope by
design).
"""

import numpy as np
import pytest

from conftest import ffmpeg_decode_raw_bytes


def _ref_decode_pixfmt(ffmpeg, data, pix):
    """Reference decode with an OUTPUT-side -pix_fmt (swscale path)."""
    import subprocess, tempfile, os
    with tempfile.NamedTemporaryFile(suffix=".j2k", delete=False) as f:
        f.write(data)
        p = f.name
    try:
        r = subprocess.run([ffmpeg, "-loglevel", "error", "-flags",
                            "+bitexact", "-i", p, "-pix_fmt", pix,
                            "-f", "rawvideo", "-"],
                           check=True, capture_output=True)
    finally:
        os.unlink(p)
    return r.stdout

from ffmpeg_ht_tpu.models.encoder import encode_frame_htj2k
from ffmpeg_ht_tpu.models.host_decoder import decode_frame
from ffmpeg_ht_tpu.models.swscale import _fmt, convert
from ffmpeg_ht_tpu.models.host_decoder import DecodedFrame

RNG = np.random.default_rng(55)


def test_lossless_roundtrips():
    g = RNG.integers(0, 256, (32, 40), dtype=np.uint8)
    f = DecodedFrame(fmt=_fmt("gray"), width=40, height=32, planes=[g])
    rgb = convert(f, "rgb24")
    assert np.array_equal(convert(rgb, "gray").planes[0], g)
    f16 = convert(f, "gray16le")
    assert np.array_equal(f16.planes[0], g.astype(np.uint16) * 257)
    assert np.array_equal(convert(f16, "gray").planes[0], g)
    r48 = convert(rgb, "rgb48le")
    assert np.array_equal(convert(r48, "rgb24").planes[0], rgb.planes[0])


def _ref_convert_raw(ffmpeg, raw, w, h, src_pix, dst_pix):
    """Reference rawvideo -> rawvideo conversion under +bitexact."""
    import subprocess, tempfile, os
    with tempfile.NamedTemporaryFile(suffix=".raw", delete=False) as f:
        f.write(raw)
        p = f.name
    try:
        r = subprocess.run([ffmpeg, "-loglevel", "error", "-flags",
                            "+bitexact", "-f", "rawvideo", "-pix_fmt",
                            src_pix, "-s", f"{w}x{h}", "-i", p,
                            "-pix_fmt", dst_pix, "-f", "rawvideo", "-"],
                           check=True, capture_output=True)
    finally:
        os.unlink(p)
    return r.stdout


def _planes_bytes(frame):
    return b"".join(np.ascontiguousarray(p).tobytes() for p in frame.planes)


@pytest.mark.parametrize("src_pix,depth", [("gray16le", 16)])
def test_gray_downshift_dither_exact(ffmpeg, src_pix, depth):
    """gray 16 -> 8 applies libswscale's full-range DITHER_COPY
    (swscale_unscaled.c:2076-2113); byte-exact, odd dims to exercise
    the 8x8 dither tiling."""
    h, w = 37, 29
    g = RNG.integers(0, 1 << depth, (h, w), dtype=np.uint16)
    ref = _ref_convert_raw(ffmpeg, g.astype("<u2").tobytes(), w, h,
                           src_pix, "gray")
    fr = DecodedFrame(fmt=_fmt(src_pix), width=w, height=h, planes=[g])
    ours = convert(fr, "gray").planes[0]
    assert ours.tobytes() == ref


@pytest.mark.parametrize("src_pix,dst_pix,depth", [
    ("yuv444p10le", "yuv444p", 10),
    ("yuv444p16le", "yuv444p", 16),
    ("yuv422p12le", "yuv422p", 12),
])
def test_yuv_depth_downshift_exact(ffmpeg, src_pix, dst_pix, depth):
    """yuv -> yuv depth reduction runs plane-direct with the
    limited-range (shiftonly) DITHER_COPY variant; byte-exact."""
    h, w = 37, 30
    f = _fmt(src_pix)
    cw = -(-w // (1 << f.log2_chroma_w))
    ch = -(-h // (1 << f.log2_chroma_h))
    y = RNG.integers(0, 1 << depth, (h, w), dtype=np.uint16)
    u = RNG.integers(0, 1 << depth, (ch, cw), dtype=np.uint16)
    v = RNG.integers(0, 1 << depth, (ch, cw), dtype=np.uint16)
    raw = np.concatenate([y.ravel(), u.ravel(), v.ravel()])
    ref = _ref_convert_raw(ffmpeg, raw.astype("<u2").tobytes(), w, h,
                           src_pix, dst_pix)
    fr = DecodedFrame(fmt=f, width=w, height=h, planes=[y, u, v])
    assert _planes_bytes(convert(fr, dst_pix)) == ref


def test_yuv_depth_upshift_exact(ffmpeg):
    """yuv 8 -> 16 is a plain left shift for limited-range planes
    (COPY_UP shiftonly); byte-exact."""
    h, w = 37, 30
    planes = [RNG.integers(0, 256, (h, w), dtype=np.uint8)
              for _ in range(3)]
    raw = np.concatenate([p.ravel() for p in planes])
    ref = _ref_convert_raw(ffmpeg, raw.tobytes(), w, h,
                           "yuv444p", "yuv444p16le")
    fr = DecodedFrame(fmt=_fmt("yuv444p"), width=w, height=h,
                      planes=planes)
    assert _planes_bytes(convert(fr, "yuv444p16le")) == ref


def test_fate_rgb48_conversion_pattern_exact(ffmpeg):
    """The FATE p0_07/p0_08 pattern (framecrc -pix_fmt rgb48le
    -auto_conversion_filters, tests/fate/jpeg2000.mak:37-41): >8-bit
    RGB decodes natively to MSB-aligned rgb48le, so the requested
    conversion is an identity and the converted output is byte-exact
    against the reference — including through -lowres 1."""
    import subprocess, tempfile, os
    planes = [RNG.integers(0, 4096, (40, 48), dtype=np.uint16)
              for _ in range(3)]
    data = encode_frame_htj2k(planes, depth=12)
    with tempfile.NamedTemporaryFile(suffix=".j2k", delete=False) as f:
        f.write(data)
        p = f.name
    try:
        for lowres in (0, 1):
            cmd = [ffmpeg, "-loglevel", "error", "-flags", "+bitexact",
                   "-auto_conversion_filters"]
            if lowres:
                cmd += ["-lowres", "1"]
            cmd += ["-i", p, "-pix_fmt", "rgb48le", "-f", "rawvideo", "-"]
            ref = subprocess.run(cmd, check=True,
                                 capture_output=True).stdout
            fr = decode_frame(data, bitexact=True,
                              reduction_factor=lowres)
            assert fr.fmt.name == "rgb48le"
            ours = convert(fr, "rgb48le")  # identity
            assert ours.tobytes() == ref
    finally:
        os.unlink(p)


def test_yuv_rgb_inverse_pair():
    rgb = RNG.integers(0, 256, (32, 3 * 40), dtype=np.uint8)
    fr = DecodedFrame(fmt=_fmt("rgb24"), width=40, height=32, planes=[rgb])
    back = convert(convert(fr, "yuv444p"), "rgb24")
    err = np.abs(back.planes[0].astype(int) - rgb.astype(int))
    assert err.max() <= 2     # limited-range quantization, no subsampling


def test_gray_to_rgb_matches_reference(ffmpeg):
    """gray j2k decoded with -pix_fmt rgb24: sws replicates Y; exact."""
    img = RNG.integers(0, 256, (48, 56), dtype=np.uint8)
    data = encode_frame_htj2k(img)
    ref = _ref_decode_pixfmt(ffmpeg, data, "rgb24")
    ours = convert(decode_frame(data, bitexact=True), "rgb24")
    assert ours.tobytes() == ref


def test_yuv_to_rgb_close_to_reference(ffmpeg):
    """yuv444p content to rgb24: BT.601 limited-range, within sws's
    dither/rounding envelope.

    SCOPE CUT (deliberate, swscale.py module docstring): matching
    libswscale's COLORSPACE transforms bit-for-bit is out of scope —
    they run through its 15/19-bit YUV intermediate pipeline — so
    converted cross-colorspace output is pinned within a small LSB
    envelope instead. Same-colorspace depth changes, gray->rgb, all
    round-trips, and the FATE p0_07/p0_08 rgb48le pattern ARE
    byte-exact (tests above)."""
    planes = [RNG.integers(16, 236, (48, 64), dtype=np.uint8),
              RNG.integers(16, 241, (24, 32), dtype=np.uint8),
              RNG.integers(16, 241, (24, 32), dtype=np.uint8)]
    data = encode_frame_htj2k(planes, chroma_shift=(1, 1))
    frame = decode_frame(data, bitexact=True)
    if not frame.fmt.name.startswith("yuv"):
        pytest.skip(f"negotiated {frame.fmt.name}, not yuv")
    ref = _ref_decode_pixfmt(ffmpeg, data, "rgb24")
    ours = convert(frame, "rgb24").tobytes()
    a = np.frombuffer(ours, np.uint8).astype(int)
    b = np.frombuffer(ref, np.uint8).astype(int)
    assert a.shape == b.shape
    assert np.abs(a - b).max() <= 3


def test_rgb48_to_rgb24_close_to_reference(ffmpeg):
    """Packed rgb48 -> rgb24: libswscale has NO direct converter for
    this pair (swscale_unscaled.c:1785-1800 lists only 48<->48/64
    repacks), so the reference routes it through the generic scaled
    YUV-intermediate pipeline — measured +-2 LSB vs our direct
    MSB-truncating depth change. Pinned as an envelope (same scope cut
    as test_yuv_to_rgb_close_to_reference); the FATE-exercised rgb48
    pattern (identity, p0_07/p0_08) stays byte-exact above."""
    img = RNG.integers(0, 65536, (40, 56, 3), dtype=np.uint16)
    data = encode_frame_htj2k(img, depth=16)
    ref = _ref_decode_pixfmt(ffmpeg, data, "rgb24")
    ours = convert(decode_frame(data, bitexact=True), "rgb24").tobytes()
    a = np.frombuffer(ours, np.uint8).astype(int)
    b = np.frombuffer(ref, np.uint8).astype(int)
    assert a.shape == b.shape
    assert np.abs(a - b).max() <= 2


def test_subsampled_yuv_output_shapes():
    rgb = RNG.integers(0, 256, (30, 3 * 42), dtype=np.uint8)
    fr = DecodedFrame(fmt=_fmt("rgb24"), width=42, height=30, planes=[rgb])
    out = convert(fr, "yuv420p")
    assert out.planes[0].shape == (30, 42)
    assert out.planes[1].shape == (15, 21)
    assert out.planes[2].shape == (15, 21)
    # and back within tolerance
    back = convert(out, "rgb24")
    assert back.planes[0].shape == (30, 3 * 42)


def test_cli_pix_fmt_flag(tmp_path):
    import subprocess, sys, os
    img = RNG.integers(0, 256, (32, 32), dtype=np.uint8)
    p = tmp_path / "t.j2k"
    p.write_bytes(encode_frame_htj2k(img))
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo"
    env["FFMPEG_HT_TPU_NO_NATIVE"] = ""
    r = subprocess.run([sys.executable, "-m", "ffmpeg_ht_tpu.cli",
                        "decode", str(p), "--host", "--pix-fmt", "rgb48le",
                        "-o", "-"], capture_output=True, env=env)
    assert r.returncode == 0
    assert len(r.stdout) == 32 * 32 * 3 * 2
    got = np.frombuffer(r.stdout, "<u2")[0::3].reshape(32, 32)
    assert np.array_equal(got, img.astype(np.uint16) * 257)
