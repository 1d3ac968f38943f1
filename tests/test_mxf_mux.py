"""MXF OP1a muxer + deepened demuxer (VERDICT round-1 item 9).

The muxed file must be a real MXF to the *reference* demuxer: probed as
mxf, stream parameters derived from the metadata tree, frames decoded
bit-exactly, no demux warnings about the index.
"""

import subprocess

import numpy as np

from conftest import FFMPEG, have_ffmpeg

import pytest

from ffmpeg_ht_tpu.containers.mxf import demux_mxf, mux_mxf, probe_mxf
from ffmpeg_ht_tpu.models.encoder import encode_frame_htj2k

RNG = np.random.default_rng(31)


def _mux_sample(nframes=3, h=64, w=96):
    imgs = [RNG.integers(0, 256, (h, w), dtype=np.uint8)
            for _ in range(nframes)]
    frames = [encode_frame_htj2k(i) for i in imgs]
    return imgs, frames, mux_mxf(frames, w, h)


def test_mxf_mux_roundtrip():
    _, frames, mxf = _mux_sample()
    assert probe_mxf(mxf)
    assert list(demux_mxf(mxf)) == frames


@pytest.mark.skipif(not have_ffmpeg(), reason="reference ffmpeg not built")
def test_mxf_mux_reference_decodes(tmp_path):
    imgs, _, mxf = _mux_sample()
    p = tmp_path / "t.mxf"
    p.write_bytes(mxf)
    r = subprocess.run([FFMPEG, "-loglevel", "warning", "-i", str(p),
                        "-f", "rawvideo", "-"], capture_output=True,
                       check=True)
    assert r.stdout == b"".join(i.tobytes() for i in imgs)
    # format must be detected as mxf with correct stream parameters and
    # a clean demux (no index warnings)
    assert r.stderr == b""
    info = subprocess.run([FFMPEG, "-i", str(p)], capture_output=True)
    txt = info.stderr.decode()
    assert "Input #0, mxf" in txt and "jpeg2000" in txt and "96x64" in txt


def test_mxf_clip_wrapped_demux():
    """Clip-wrapped essence: all frames in ONE essence KLV; the demuxer
    must split them (mxfdec.c ClipWrapped analog)."""
    from ffmpeg_ht_tpu.containers.mxf import (_ELEM_J2K, _ber4,
                                              _HEADER_PARTITION)
    _, frames, mxf = _mux_sample()
    # rebuild the body as a single clip KLV
    i = mxf.find(bytes(_ELEM_J2K))
    assert i > 0
    clip = b"".join(frames)
    clipped = mxf[:i] + _ELEM_J2K + _ber4(len(clip)) + clip
    got = list(demux_mxf(clipped))
    assert got == frames


def test_mxf_decoder_integration():
    """demux_mxf -> Decoder: decoded frames match the encoded images."""
    from ffmpeg_ht_tpu.models.host_decoder import decode_frame
    imgs, _, mxf = _mux_sample(nframes=2)
    outs = [decode_frame(f, bitexact=True).tobytes()
            for f in demux_mxf(mxf)]
    assert outs == [i.tobytes() for i in imgs]


def test_mxf_clip_wrap_mux_roundtrip():
    """mux_mxf(wrapping='clip'): one essence KLV, clip EC UL; our
    demuxer splits it back into the original codestreams."""
    from ffmpeg_ht_tpu.containers.mxf import _EC_J2K_CLIP, _ELEM_J2K
    _, frames, _ = _mux_sample()
    mxf = mux_mxf(frames, 96, 64, wrapping="clip")
    assert probe_mxf(mxf)
    assert mxf.count(_ELEM_J2K) == 1      # single clip KLV
    assert _EC_J2K_CLIP in mxf            # ST 422 clip-wrapped UL
    assert list(demux_mxf(mxf)) == frames


@pytest.mark.skipif(not have_ffmpeg(), reason="reference ffmpeg not built")
def test_mxf_clip_wrap_reference_decodes(tmp_path):
    imgs, frames, _ = _mux_sample()
    mxf = mux_mxf(frames, 96, 64, wrapping="clip")
    p = tmp_path / "clip.mxf"
    p.write_bytes(mxf)
    r = subprocess.run([FFMPEG, "-loglevel", "error", "-i", str(p),
                        "-f", "rawvideo", "-"], capture_output=True,
                       check=True)
    assert r.stdout == b"".join(i.tobytes() for i in imgs)
