"""v3 merged-bucket cleanup kernel (per-lane dims) vs the scalar oracle.

One launch decodes codeblocks of different shapes: each lane carries its
own quad-grid dims (qws, qhs); quads beyond a lane's dims must consume no
stream bits, so the decoded samples match a per-shape launch bit-exactly.
Also covers inert lanes (qws == qhs == 0) that stand in for host-fallback
or not-included codeblocks in the v3 geometry-ordered bucket.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from ffmpeg_ht_tpu.ops.ht_batch import prepare_streams_batch, stream_limits
from ffmpeg_ht_tpu.ops.ht_dec import decode_htj2k
from ffmpeg_ht_tpu.ops.ht_enc import encode_cleanup
from ffmpeg_ht_tpu.ops.ht_scan import decode_cleanup_scan_dims

RNG = np.random.default_rng(4242)
MAGB = 8
ZBP = MAGB - 2


def _random_block(h, w, density):
    mag = RNG.integers(0, 64, (h, w)).astype(np.int64)
    mag = np.where(RNG.random((h, w)) < density, 0, mag)
    sign = np.where(mag > 0, RNG.integers(0, 2, (h, w)).astype(np.int64), 0)
    return encode_cleanup(mag, sign, ZBP)


def test_dims_bucket_vs_oracle():
    shapes = [(64, 64), (64, 64), (32, 14), (48, 7), (17, 29), (5, 3),
              (64, 1), (1, 64), (60, 34), (16, 16)]
    blocks = []          # (data, lcup, w, h) or None for inert lanes
    for i, (w, h) in enumerate(shapes):
        data, lcup = _random_block(h, w, density=RNG.random())
        blocks.append((data, lcup, w, h))
        if i % 3 == 1:
            blocks.append(None)          # inert lane in the middle
    n = len(blocks)
    qw, qh = 32, 32
    lmax = max(max(len(d) for b in blocks if b for d in [b[0]]), 4)
    cdat = np.zeros((n, lmax), np.uint8)
    lcups = np.full(n, 2, np.int64)
    pcups = np.zeros(n, np.int64)
    qws = np.zeros(n, np.int32)
    qhs = np.zeros(n, np.int32)
    for i, b in enumerate(blocks):
        if b is None:
            continue
        data, lcup, w, h = b
        buf = bytearray(data[:lcup])
        buf[lcup - 1] = 0xFF
        buf[lcup - 2] |= 0x0F
        scup = (data[lcup - 1] << 4) + (data[lcup - 2] & 0x0F)
        cdat[i, :lcup] = np.frombuffer(bytes(buf), np.uint8)
        lcups[i] = lcup
        pcups[i] = lcup - scup
        qws[i] = -(-w // 2)
        qhs[i] = -(-h // 2)
    msw, melw, vlcw = prepare_streams_batch(cdat, lcups, pcups)
    ms_lim, mel_lim = stream_limits(cdat, lcups, pcups)
    pLSB = np.full(n, 30 - ZBP, np.int32)
    maxbp = np.full(n, ZBP + 1, np.int32)
    mu, sig, ok = decode_cleanup_scan_dims(
        jnp.asarray(msw), jnp.asarray(melw), jnp.asarray(vlcw),
        jnp.asarray(pLSB), jnp.asarray(maxbp),
        jnp.asarray(ms_lim), jnp.asarray(mel_lim),
        jnp.asarray(qws), jnp.asarray(qhs),
        qw=qw, qh=qh, ms_class=min(ZBP + 1, 25))
    assert bool(np.asarray(ok).all())
    ras = np.asarray(mu)
    for i, b in enumerate(blocks):
        if b is None:
            assert not ras[i].any(), f"inert lane {i} not silent"
            continue
        data, lcup, w, h = b
        exp = decode_htj2k(data, 1, ZBP, [lcup, 0], w, h, MAGB)
        got = ras[i, :h, :w].astype(np.int64)
        assert np.array_equal(exp.astype(np.int64) & 0xFFFFFFFF, got), \
            f"lane {i} shape {w}x{h}"
        # samples beyond the lane's block must be zero (band-assembly
        # crop relies on it)
        assert not ras[i, h:, :].any() and not ras[i, :, w:].any()


def test_dims_bucket_2d_fold_matches_1d():
    """decode_cleanup_scan_dims_2d (lane axis folded (N/L, L) via vmap
    for full-sublane VPU packing) is bit-identical to the 1-D kernel on
    a mixed-shape bucket, including inert and padded lanes. lanes=8
    forces several fold rows plus a ragged pad."""
    from ffmpeg_ht_tpu.ops.ht_scan import decode_cleanup_scan_dims_2d

    shapes = [(32, 32), (18, 9), (32, 1), (1, 32), (7, 26), (16, 16),
              (31, 31), (24, 10), (3, 3), (32, 20)]
    blocks = []
    for i, (w, h) in enumerate(shapes):
        data, lcup = _random_block(h, w, density=RNG.random())
        blocks.append((data, lcup, w, h))
        if i % 4 == 2:
            blocks.append(None)
    n = len(blocks)
    qw = qh = 16
    lmax = max(max(len(b[0]) for b in blocks if b), 4)
    cdat = np.zeros((n, lmax), np.uint8)
    lcups = np.full(n, 2, np.int64)
    pcups = np.zeros(n, np.int64)
    qws = np.zeros(n, np.int32)
    qhs = np.zeros(n, np.int32)
    for i, b in enumerate(blocks):
        if b is None:
            continue
        data, lcup, w, h = b
        buf = bytearray(data[:lcup])
        buf[lcup - 1] = 0xFF
        buf[lcup - 2] |= 0x0F
        scup = (data[lcup - 1] << 4) + (data[lcup - 2] & 0x0F)
        cdat[i, :lcup] = np.frombuffer(bytes(buf), np.uint8)
        lcups[i] = lcup
        pcups[i] = lcup - scup
        qws[i] = -(-w // 2)
        qhs[i] = -(-h // 2)
    msw, melw, vlcw = prepare_streams_batch(cdat, lcups, pcups)
    ms_lim, mel_lim = stream_limits(cdat, lcups, pcups)
    pLSB = np.full(n, 30 - ZBP, np.int32)
    maxbp = np.full(n, ZBP + 1, np.int32)
    args = (jnp.asarray(msw), jnp.asarray(melw), jnp.asarray(vlcw),
            jnp.asarray(pLSB), jnp.asarray(maxbp),
            jnp.asarray(ms_lim), jnp.asarray(mel_lim),
            jnp.asarray(qws), jnp.asarray(qhs))
    mu1, sig1, ok1 = decode_cleanup_scan_dims(
        *args, qw=qw, qh=qh, ms_class=min(ZBP + 1, 25))
    mu2, sig2, ok2 = decode_cleanup_scan_dims_2d(
        *args, qw=qw, qh=qh, ms_class=min(ZBP + 1, 25), lanes=8)
    assert np.array_equal(np.asarray(mu1), np.asarray(mu2))
    assert np.array_equal(np.asarray(sig1), np.asarray(sig2))
    assert np.array_equal(np.asarray(ok1), np.asarray(ok2))
