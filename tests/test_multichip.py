"""Multi-device decode through the production pipeline.

Decoder.decode_batch(streams, mesh=...) shards the frame axis over the
8-CPU virtual mesh (tests/conftest.py) via shard_map — each device runs
the fused v3 program on its own frames, no collectives (SURVEY §2.2
multi-device row; reference analog: frame threads, pthread_frame.c).
Bit-identity with the single-device decode is the FATE thread-matrix
analog (same goldens at any thread count)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from ffmpeg_ht_tpu.models.decoder import Decoder
from ffmpeg_ht_tpu.models.encoder import encode_frame_htj2k

RNG = np.random.default_rng(31337)


def _mesh(n):
    from jax.sharding import Mesh
    devs = [d for d in jax.devices() if d.platform == "cpu"]
    if len(devs) < n:
        pytest.skip(f"need {n} cpu devices")
    return Mesh(np.array(devs[:n]), axis_names=("frames",))


def test_decode_batch_sharded_bit_identical():
    mesh = _mesh(4)
    imgs = [RNG.integers(0, 256, (64, 80), dtype=np.uint8)
            for _ in range(8)]
    streams = [encode_frame_htj2k(im) for im in imgs]
    dec = Decoder(bitexact=True)
    sharded = dec.decode_batch(streams, mesh=mesh, require_shard=True)
    single = dec.decode_batch(streams)
    for i, (a, b, im) in enumerate(zip(sharded, single, imgs)):
        assert a.tobytes() == im.tobytes(), f"frame {i} wrong pixels"
        assert a.tobytes() == b.tobytes(), f"frame {i} != single-device"


def test_decode_batch_sharded_frame_padding():
    """F not divisible by D: the frame axis pads by replicating the last
    frame and the pad decodes are dropped — the caller sees exactly F
    frames, bit-identical to single-device."""
    mesh = _mesh(4)
    imgs = [RNG.integers(0, 256, (64, 80), dtype=np.uint8)
            for _ in range(5)]
    streams = [encode_frame_htj2k(im) for im in imgs]
    dec = Decoder(bitexact=True)
    sharded = dec.decode_batch(streams, mesh=mesh, require_shard=True)
    assert len(sharded) == 5
    for i, (a, im) in enumerate(zip(sharded, imgs)):
        assert a.tobytes() == im.tobytes(), f"frame {i} wrong pixels"


def test_decode_batch_unshardable_raises_and_warns(caplog):
    """A batch outside the v3 profile must never degrade silently:
    require_shard=True raises UnshardableBatch naming the reason, and the
    default logs a warning and still decodes correctly single-device."""
    import logging

    from ffmpeg_ht_tpu.utils.errors import UnshardableBatch

    mesh = _mesh(2)
    img = RNG.integers(0, 256, (40, 48), dtype=np.uint8)
    # HT MIXED streams leave the fast-lane/v3 profile by design
    streams = [encode_frame_htj2k(img, ht_mixed=True) for _ in range(2)]
    dec = Decoder(bitexact=True)
    with pytest.raises(UnshardableBatch, match="profile"):
        dec.decode_batch(streams, mesh=mesh, require_shard=True)
    with caplog.at_level(logging.WARNING, logger="ffmpeg_ht_tpu"):
        frames = dec.decode_batch(streams, mesh=mesh)
    assert any("cannot shard" in r.message for r in caplog.records)
    assert all(f.tobytes() == img.tobytes() for f in frames)


@pytest.mark.slow
def test_decode_batch_sharded_4k():
    """One 4K-class frame per device on a 2-device mesh: per-device
    memory and assembly behavior at real frame sizes (VERDICT r3 item 4).
    """
    mesh = _mesh(2)
    x = np.linspace(0, 11, 3840)
    y = np.linspace(0, 7, 2160)
    base = ((np.sin(y[:, None]) * np.cos(x[None, :]) + 1)
            * 511).astype(np.uint16)
    imgs = [base, np.roll(base, 9, axis=1)]
    streams = [encode_frame_htj2k(im, depth=10, tile_width=4096,
                                  tile_height=4096, log2_cblk_width=6,
                                  log2_cblk_height=6) for im in imgs]
    dec = Decoder(bitexact=True)
    sharded = dec.decode_batch(streams, mesh=mesh, require_shard=True)
    for i, (a, im) in enumerate(zip(sharded, imgs)):
        # 10-bit decodes MSB-aligned into 16-bit (reference write_frame
        # scaling), so the source round-trips shifted by 6
        assert a.tobytes() == (im.astype(np.uint16) << 6).tobytes(), \
            f"4K frame {i} wrong pixels"


def test_decode_batch_sharded_rgb():
    mesh = _mesh(2)
    imgs = [RNG.integers(0, 256, (48, 56, 3), dtype=np.uint8)
            for _ in range(4)]
    streams = [encode_frame_htj2k(im, mct=True) for im in imgs]
    dec = Decoder(bitexact=True)
    sharded = dec.decode_batch(streams, mesh=mesh)
    single = [dec.decode(s) for s in streams]
    for a, b, im in zip(sharded, single, imgs):
        assert a.tobytes() == im.tobytes()
        assert a.tobytes() == b.tobytes()
