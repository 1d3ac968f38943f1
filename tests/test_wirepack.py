"""Wire bit-packing (ops/wirepack.py): device-side packed fetch.

Round-trip property plus end-to-end decode equality with wire_pack on
vs off through every dispatch path (v3 fused, v2 bucketed, batch-merged).
"""

import numpy as np
import pytest

from ffmpeg_ht_tpu.models.decoder import Decoder
from ffmpeg_ht_tpu.models.encoder import encode_frame_htj2k
from ffmpeg_ht_tpu.ops.wirepack import (pack_words, packed_words_len,
                                        unpack_words)


@pytest.mark.parametrize("depth", [9, 10, 11, 12, 13, 14, 15])
@pytest.mark.parametrize("n", [1, 31, 32, 33, 1000, 4096])
def test_pack_roundtrip(depth, n):
    rng = np.random.default_rng(depth * 1000 + n)
    src = rng.integers(0, 1 << depth, (n,), dtype=np.uint16)
    import jax.numpy as jnp
    words = np.asarray(pack_words(jnp.asarray(src), depth))
    assert words.shape == (packed_words_len(n, depth),)
    assert words.dtype == np.uint32
    got = unpack_words(words, depth, n)
    assert np.array_equal(got, src)
    # the wire is always smaller than the group-padded uint16 fetch
    # (depth/16 of it); for partial tail groups the uint16 comparison
    # point is the padded group, not n alone
    padded_u16_bytes = -(-n // 32) * 32 * 2
    assert words.nbytes * 16 == padded_u16_bytes * depth
    assert words.nbytes < padded_u16_bytes


def _streams_10bit(rng, n=1):
    base = rng.integers(0, 1024, (80, 96), dtype=np.uint16)
    return [encode_frame_htj2k(
        np.stack([np.roll(base, k, 1)] * 3, axis=2), depth=10,
        tile_width=128, tile_height=128) for k in range(n)]


def test_decode_wire_pack_matches():
    rng = np.random.default_rng(7)
    data = _streams_10bit(rng)[0]
    plain = Decoder(bitexact=True).decode(data)
    packed = Decoder(bitexact=True, wire_pack=True).decode(data)
    assert plain.tobytes() == packed.tobytes()


def test_decode_batch_wire_pack_matches():
    rng = np.random.default_rng(8)
    streams = _streams_10bit(rng, n=3)
    plain = Decoder(bitexact=True).decode_batch(streams)
    packed = Decoder(bitexact=True, wire_pack=True).decode_batch(streams)
    for a, b in zip(plain, packed):
        assert a.tobytes() == b.tobytes()


def test_decode_wire_pack_v2_bucket_path(monkeypatch):
    # force the v2 bucketed program (the non-v3 _compiled_assembly tail)
    monkeypatch.setenv("FFMPEG_HT_TPU_V3", "0")
    rng = np.random.default_rng(9)
    data = _streams_10bit(rng)[0]
    plain = Decoder(bitexact=True).decode(data)
    packed = Decoder(bitexact=True, wire_pack=True).decode(data)
    assert plain.tobytes() == packed.tobytes()


def test_decode_wire_pack_object_path(monkeypatch):
    # leave the fast lane entirely: _launch/_finish via the T2 object path
    from ffmpeg_ht_tpu.models import fastpath
    monkeypatch.setattr(fastpath, "fast_profile", lambda h: False)
    rng = np.random.default_rng(10)
    data = _streams_10bit(rng)[0]
    plain = Decoder(bitexact=True).decode(data)
    packed = Decoder(bitexact=True, wire_pack=True).decode(data)
    assert plain.tobytes() == packed.tobytes()


def test_wire_pack_12bit_refinement():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 1 << 12, (64, 72), dtype=np.uint16)
    data = encode_frame_htj2k(img, depth=12, refinement=True)
    plain = Decoder(bitexact=True).decode(data)
    packed = Decoder(bitexact=True, wire_pack=True).decode(data)
    assert plain.tobytes() == packed.tobytes()


def test_wire_pack_8bit_is_inert():
    # 8-bit content: the flag must be a no-op (uint8 wire is already tight)
    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, (48, 48), dtype=np.uint8)
    data = encode_frame_htj2k(img)
    d = Decoder(bitexact=True, wire_pack=True)
    assert not d._wp(8)
    assert d.decode(data).tobytes() == img.tobytes()
