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
    sharded = dec._decode_batch_sharded(streams, mesh)
    assert sharded is not None, "sharded v3 path was not taken"
    single = dec.decode_batch(streams)
    for i, (a, b, im) in enumerate(zip(sharded, single, imgs)):
        assert a.tobytes() == im.tobytes(), f"frame {i} wrong pixels"
        assert a.tobytes() == b.tobytes(), f"frame {i} != single-device"


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
