"""Device SigProp/MagRef refinement kernel vs the scalar oracle.

The in-repo HT encoder (ops/ht_enc.encode_block_3pass) is the only
refinement test-vector source in this environment; its output is
cross-validated against the reference decoder elsewhere
(test_ht_codec.test_ht_3pass_frame_both_decoders).
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from ffmpeg_ht_tpu.ops.ht_batch import (prepare_magref_stream,
                                        prepare_sigprop_stream,
                                        prepare_streams_batch, stream_limits)
from ffmpeg_ht_tpu.ops.ht_dec import decode_htj2k
from ffmpeg_ht_tpu.ops.ht_enc import encode_block_3pass
from ffmpeg_ht_tpu.ops.ht_refine import decode_refinement_scan
from ffmpeg_ht_tpu.ops.ht_scan import decode_cleanup_scan_sig

RNG = np.random.default_rng(99)
MAGB = 8
ZBP = MAGB - 2


def _run_bucket(blocks, w, h, causal=False):
    """blocks: list of (data, lcup, lref, npasses) -> (N, h, w) uint32."""
    n = len(blocks)
    qw, qh = -(-w // 2), -(-h // 2)
    lmax = max(max(len(d) for d, *_ in blocks), 4)
    cdat = np.zeros((n, lmax), np.uint8)
    lcups = np.zeros(n, np.int64)
    pcups = np.zeros(n, np.int64)
    drmax = max(max(lr for _, _, lr, _ in blocks), 4)
    dref = np.zeros((n, drmax), np.uint8)
    lrefs = np.zeros(n, np.int64)
    has_sp = np.zeros(n, bool)
    has_mr = np.zeros(n, bool)
    for i, (data, lcup, lref, npasses) in enumerate(blocks):
        buf = bytearray(data[:lcup])
        scup = (buf[lcup - 1] << 4) + (buf[lcup - 2] & 0x0F)
        buf[lcup - 1] = 0xFF
        buf[lcup - 2] |= 0x0F
        cdat[i, :lcup] = np.frombuffer(bytes(buf), np.uint8)
        lcups[i] = lcup
        pcups[i] = lcup - scup
        if npasses > 1:
            dr = data[lcup:lcup + lref]
            dref[i, :len(dr)] = np.frombuffer(dr, np.uint8)
            lrefs[i] = lref
        has_sp[i] = npasses >= 2
        has_mr[i] = npasses >= 3
    msw, melw, vlcw = prepare_streams_batch(cdat, lcups, pcups)
    ms_lim, mel_lim = stream_limits(cdat, lcups, pcups)
    pLSB = np.full(n, 30 - ZBP, np.int32)
    maxbp = np.full(n, ZBP + 1, np.int32)
    mu, sig, ok = decode_cleanup_scan_sig(
        jnp.asarray(msw), jnp.asarray(melw), jnp.asarray(vlcw),
        jnp.asarray(pLSB), jnp.asarray(maxbp),
        jnp.asarray(ms_lim), jnp.asarray(mel_lim),
        qw=qw, qh=qh, ms_class=min(ZBP + 1, 25))
    assert bool(np.asarray(ok).all())
    ras = decode_refinement_scan(
        mu, sig, jnp.asarray(prepare_sigprop_stream(dref, lrefs)),
        jnp.asarray(prepare_magref_stream(dref, lrefs)),
        jnp.asarray(pLSB), jnp.asarray(has_sp), jnp.asarray(has_mr),
        jnp.full(n, bool(causal)), qw=qw, qh=qh, w=w, h=h)
    return np.asarray(ras)[:, :h, :w]


def _random_block(h, w):
    mag = RNG.integers(0, 128, (h, w)).astype(np.int64)
    mag = np.where(RNG.random((h, w)) < RNG.random(), 0, mag)
    sign = np.where(mag > 0, RNG.integers(0, 2, (h, w)).astype(np.int64), 0)
    return encode_block_3pass(mag, sign, ZBP)


@pytest.mark.parametrize("w,h", [(32, 32), (17, 29)])
def test_refine_kernel_vs_oracle(w, h):
    """z_blk in {1, 2, 3} lanes mixed in one bucket, bit-exact vs oracle.

    z=2 decodes the same 3-pass stream with npasses=2 (MagRef unread) —
    the oracle does exactly that, so it cross-checks the has_mr gating.
    """
    blocks, expects = [], []
    for trial in range(8):
        enc = _random_block(h, w)
        if enc is None:
            continue
        data, lcup, lref = enc
        npasses = (3, 2, 1)[trial % 3]
        blocks.append((data, lcup, lref if npasses > 1 else 0, npasses))
        expects.append(decode_htj2k(data, npasses, ZBP, [lcup, lref],
                                    w, h, MAGB))
    assert len(blocks) >= 3
    got = _run_bucket(blocks, w, h)
    for i, exp in enumerate(expects):
        assert np.array_equal(exp.astype(np.int64) & 0xFFFFFFFF,
                              got[i].astype(np.int64)), f"lane {i}"


@pytest.mark.parametrize("w,h", [(32, 32), (20, 19)])
def test_refine_kernel_causal(w, h):
    """HT-causal (CBLK_VSC) SigProp, device vs oracle bit-exact.

    causal_cond masks the row-below MBR terms on each stripe's last row
    (jpeg2000htdec.c:1034-1077); streams are encoded causally so the
    round-trip also proves the encoder/decoder pair agrees. Non-causal
    decode of the same streams must differ somewhere across the batch
    (guards against the flag being ignored)."""
    blocks, expects = [], []
    for _ in range(16):
        enc = None
        while enc is None:
            mag = RNG.integers(0, 128, (h, w)).astype(np.int64)
            mag = np.where(RNG.random((h, w)) < 0.6, 0, mag)
            sign = np.where(mag > 0,
                            RNG.integers(0, 2, (h, w)).astype(np.int64), 0)
            enc = encode_block_3pass(mag, sign, ZBP, is_causal=1)
        data, lcup, lref = enc
        blocks.append((data, lcup, lref, 3))
        expects.append(decode_htj2k(data, 3, ZBP, [lcup, lref], w, h,
                                    MAGB, 0, 1))
    got = _run_bucket(blocks, w, h, causal=True)
    for i, exp in enumerate(expects):
        assert np.array_equal(exp.astype(np.int64) & 0xFFFFFFFF,
                              got[i].astype(np.int64)), f"lane {i}"
    got_nc = _run_bucket(blocks, w, h, causal=False)
    assert not np.array_equal(got_nc, got), \
        "causal flag had no effect on any lane"
