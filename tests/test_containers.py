"""Container & CLI tier tests.

framecrc/framemd5 outputs must byte-match the reference muxers (they are
the FATE golden formats); the MJ2 writer must produce files the reference
demuxes; the frame parser must split streams the way
jpeg2000_parser.c does.
"""

import subprocess

import numpy as np
import pytest

from ffmpeg_ht_tpu import cli
from ffmpeg_ht_tpu.containers import demux, mux
from ffmpeg_ht_tpu.containers.frame_parser import split_frames
from ffmpeg_ht_tpu.containers.mov import demux_mov, mux_mj2
from ffmpeg_ht_tpu.models.encoder import encode_frame_htj2k, encode_frame_t800
from ffmpeg_ht_tpu.models.host_decoder import decode_frame

RNG = np.random.default_rng(9)


def _ff_out(ffmpeg, path, fmt):
    r = subprocess.run(
        [ffmpeg, "-loglevel", "error", "-fflags", "+bitexact",
         "-flags", "+bitexact", "-i", path, "-f", fmt, "-"],
        check=True, capture_output=True)
    lines = [l for l in r.stdout.decode().splitlines()
             if not l.startswith("#software")]
    return "\n".join(lines) + "\n"


@pytest.fixture(scope="module")
def sample(tmp_path_factory):
    img = RNG.integers(0, 256, (80, 72), dtype=np.uint8)
    data = encode_frame_htj2k(img)
    path = tmp_path_factory.mktemp("c") / "s.j2k"
    path.write_bytes(data)
    return str(path), img, data


def test_framecrc_matches_reference(ffmpeg, sample, tmp_path):
    path, img, data = sample
    frames = [decode_frame(data, bitexact=True)]
    assert mux.framecrc(frames) == _ff_out(ffmpeg, path, "framecrc")


def test_framemd5_matches_reference(ffmpeg, sample):
    path, img, data = sample
    frames = [decode_frame(data, bitexact=True)]
    assert mux.framemd5(frames) == _ff_out(ffmpeg, path, "framemd5")


def test_frame_parser_splits_concatenated_stream():
    imgs = [RNG.integers(0, 256, (32, 32), dtype=np.uint8)
            for _ in range(4)]
    streams = [encode_frame_htj2k(i) for i in imgs]
    blob = b"".join(streams)
    assert split_frames(blob) == streams
    # with garbage between frames (parser resync, jpeg2000_parser.c:93)
    blob = b"garbage!" + streams[0] + b"\x00\x01" + streams[1]
    out = split_frames(blob)
    assert out[:2] == streams[:2]


def test_probe_formats(tmp_path):
    img = RNG.integers(0, 256, (16, 16), dtype=np.uint8)
    j2k = encode_frame_t800(img, pred=1)
    jp2 = encode_frame_t800(img, pred=1, jp2=True)
    assert demux.probe_bytes(j2k) == "j2k"
    assert demux.probe_bytes(jp2) == "jp2"
    assert demux.probe_bytes(j2k + j2k) == "mjpeg_2000"
    mj2 = mux_mj2([j2k], 16, 16)
    assert demux.probe_bytes(mj2) == "mov"


def test_mj2_roundtrip_and_reference_demux(ffmpeg, tmp_path):
    imgs = [RNG.integers(0, 256, (64, 64), dtype=np.uint8)
            for _ in range(3)]
    samples = [encode_frame_htj2k(i) for i in imgs]
    mj2 = mux_mj2(samples, 64, 64)
    assert list(demux_mov(mj2)) == samples
    p = tmp_path / "t.mj2"
    p.write_bytes(mj2)
    r = subprocess.run(
        [ffmpeg, "-loglevel", "error", "-flags", "+bitexact",
         "-i", str(p), "-f", "rawvideo", "-"],
        check=True, capture_output=True)
    assert r.stdout == b"".join(i.tobytes() for i in imgs)


def test_mxf_demux_reference_muxed(ffmpeg, tmp_path):
    """Demux an MXF written by the reference muxer (mxfenc.c JPEG2000
    essence) and decode the frames losslessly."""
    from conftest import require_ffmpeg
    require_ffmpeg("muxers", "mxf")
    imgs = [RNG.integers(0, 256, (64, 64), dtype=np.uint8)
            for _ in range(3)]
    raw = tmp_path / "m.raw"
    raw.write_bytes(b"".join(i.tobytes() for i in imgs))
    p = tmp_path / "m.mxf"
    subprocess.run(
        [ffmpeg, "-y", "-loglevel", "error", "-f", "rawvideo",
         "-pix_fmt", "gray", "-s", "64x64", "-r", "25", "-i", str(raw),
         "-c:v", "jpeg2000", "-pred", "1", "-f", "mxf", str(p)],
        check=True)
    data = p.read_bytes()
    assert demux.probe_bytes(data) == "mxf"
    frames = list(demux.demux_bytes(data))
    assert len(frames) == 3
    for f, img in zip(frames, imgs):
        assert decode_frame(f, bitexact=True).tobytes() == img.tobytes()
    # multi-frame framecrc (pts/duration columns) matches the reference
    decoded = [decode_frame(f, bitexact=True) for f in frames]
    assert mux.framecrc(decoded) == _ff_out(ffmpeg, str(p), "framecrc")


def test_cli_decode_encode_probe(tmp_path, capsys):
    img = RNG.integers(0, 256, (48, 40), dtype=np.uint8)
    raw = tmp_path / "in.raw"
    raw.write_bytes(img.tobytes())
    out = tmp_path / "out.j2k"
    assert cli.main(["encode", str(raw), "-s", "40x48", "--pix-fmt",
                     "gray", "-o", str(out)]) == 0
    dec = tmp_path / "out.raw"
    assert cli.main(["decode", str(out), "--host", "-o", str(dec)]) == 0
    assert dec.read_bytes() == img.tobytes()
    assert cli.main(["probe", str(out)]) == 0
    cap = capsys.readouterr()
    assert "htj2k" in cap.out and "40x48" in cap.out


def test_cli_mj2_pipeline(tmp_path, ffmpeg):
    imgs = [RNG.integers(0, 256, (32, 32), dtype=np.uint8)
            for _ in range(2)]
    raw = tmp_path / "in.raw"
    raw.write_bytes(b"".join(i.tobytes() for i in imgs))
    mj2 = tmp_path / "out.mj2"
    assert cli.main(["encode", str(raw), "-s", "32x32", "--pix-fmt",
                     "gray", "-o", str(mj2)]) == 0
    dec = tmp_path / "dec.raw"
    assert cli.main(["decode", str(mj2), "--host", "-o", str(dec)]) == 0
    assert dec.read_bytes() == b"".join(i.tobytes() for i in imgs)


def test_cli_device_resident_benchmark(tmp_path, capsys):
    """`jxt decode --benchmark --device-resident` reports the chip-rate
    line (bench.py headline methodology through the CLI; the analog of
    `ffmpeg -benchmark`'s rtime with the host legs excluded)."""
    img = RNG.integers(0, 256, (64, 96), dtype=np.uint8)
    p = tmp_path / "in.j2c"
    p.write_bytes(encode_frame_htj2k(img))
    assert cli.main(["decode", str(p), "-f", "null", "--benchmark",
                     "--device-resident"]) == 0
    err = capsys.readouterr().err
    assert "device-resident fps=" in err and "frames_merged=1" in err
    # without --benchmark the flag is rejected
    assert cli.main(["decode", str(p), "-f", "null",
                     "--device-resident"]) == 1


def test_cli_lowres(tmp_path):
    """resolution-progressive decode (jpeg2000dec.c lowres option)."""
    img = RNG.integers(0, 256, (64, 64), dtype=np.uint8)
    data = encode_frame_htj2k(img)
    full = decode_frame(data, bitexact=True)
    half = decode_frame(data, bitexact=True, reduction_factor=1)
    assert (half.width, half.height) == (32, 32)
    assert full.width == 64


def test_multi_tile_part(ffmpeg, tmp_path):
    """Tile bodies split across tile-parts at packet boundaries
    (TPsot/TNsot, T.800 A.4.2) decode identically everywhere."""
    img = RNG.integers(0, 256, (64, 64), dtype=np.uint8)
    for data in (encode_frame_htj2k(img, tp_interval=3),
                 encode_frame_t800(img, pred=1, tp_interval=2)):
        assert data.count(b"\xff\x90") >= 2  # really multi-part
        assert decode_frame(data, bitexact=True).tobytes() == img.tobytes()
        p = tmp_path / "tp.j2k"
        p.write_bytes(data)
        r = subprocess.run(
            [ffmpeg, "-loglevel", "error", "-flags", "+bitexact",
             "-i", str(p), "-f", "rawvideo", "-"],
            check=True, capture_output=True)
        assert r.stdout == img.tobytes()


def test_corrupt_sample_tables_bounded():
    """Bitflipped stsz/stco/stsc counts must not allocate huge tables or
    hang (found by container fuzzing); a table overrunning its box is a
    typed ValueError, mirroring mov.c's atom-size bounds."""
    img = RNG.integers(0, 256, (32, 32), dtype=np.uint8)
    j2k = encode_frame_htj2k(img)
    mj2 = bytearray(mux_mj2([j2k] * 3, 32, 32))
    for tag in (b"stsz", b"stco", b"stsc"):
        m = bytearray(mj2)
        p = m.index(tag)
        # entry-count field: stsz at tag+8 (after sample_size), others tag+8
        cnt = p + (12 if tag == b"stsz" else 8)
        m[cnt:cnt + 4] = b"\x7f\xff\xff\xff"
        # the huge entry count MUST be rejected (the regression this test
        # guards was a multi-GB list allocation); completing silently would
        # mean the bounds check is gone
        with pytest.raises(ValueError):
            list(demux_mov(bytes(m)))
