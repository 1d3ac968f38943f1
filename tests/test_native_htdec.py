"""native/htdec.c vs the pure-Python oracle (ops/ht_dec.py), bit-exact.

decode_htj2k routes through the native tier when the library is built;
these tests pin the native decode to the Python reference on random
blocks across pass counts, odd shapes, causal mode and truncation, so
every kernel-vs-oracle test elsewhere remains anchored to the
pure-Python provenance model.
"""

import numpy as np
import pytest

from ffmpeg_ht_tpu.ops import ht_dec
from ffmpeg_ht_tpu.ops.ht_enc import encode_block_3pass, encode_cleanup
from ffmpeg_ht_tpu.utils import native as NV

RNG = np.random.default_rng(4242)
MAGB = 8
ZBP = MAGB - 2

pytestmark = pytest.mark.skipif(
    NV.load() is None or not hasattr(NV.load(), "ht_decode_block"),
    reason="native library unavailable")


def _py_decode(*args, **kw):
    """Force the pure-Python oracle path."""
    orig = NV.ht_decode_block
    NV.ht_decode_block = lambda *a, **k: None
    try:
        return ht_dec.decode_htj2k(*args, **kw)
    finally:
        NV.ht_decode_block = orig


@pytest.mark.parametrize("w,h", [(64, 64), (17, 29), (5, 3), (1, 64)])
def test_native_cleanup_parity(w, h):
    for density in (0.1, 0.6, 0.95):
        mag = RNG.integers(0, 256, (h, w)).astype(np.int64)
        mag = np.where(RNG.random((h, w)) < density, 0, mag)
        sign = np.where(mag > 0, RNG.integers(0, 2, (h, w)), 0)
        data, lcup = encode_cleanup(mag, sign, MAGB)
        py = _py_decode(data, 1, MAGB, [lcup, 0], w, h, MAGB)
        nat = ht_dec.decode_htj2k(data, 1, MAGB, [lcup, 0], w, h, MAGB)
        assert np.array_equal(py, nat)


@pytest.mark.parametrize("causal", [0, 1])
def test_native_3pass_parity(causal):
    done = 0
    for _ in range(12):
        w = int(RNG.integers(4, 49))
        h = int(RNG.integers(4, 49))
        mag = RNG.integers(0, 128, (h, w)).astype(np.int64)
        mag = np.where(RNG.random((h, w)) < 0.5, 0, mag)
        sign = np.where(mag > 0, RNG.integers(0, 2, (h, w)), 0)
        enc = encode_block_3pass(mag, sign, ZBP, is_causal=causal)
        if enc is None:
            continue
        data, lcup, lref = enc
        for npasses in (1, 2, 3):
            lr = lref if npasses > 1 else 0
            py = _py_decode(data, npasses, ZBP, [lcup, lr], w, h,
                            MAGB, 0, causal)
            nat = ht_dec.decode_htj2k(data, npasses, ZBP, [lcup, lr],
                                      w, h, MAGB, 0, causal)
            assert np.array_equal(py, nat), (w, h, npasses)
        done += 1
    assert done >= 6


def test_native_roi_and_truncation_parity():
    w = h = 32
    mag = RNG.integers(0, 64, (h, w)).astype(np.int64)
    sign = np.where(mag > 0, RNG.integers(0, 2, (h, w)), 0)
    data, lcup = encode_cleanup(mag, sign, MAGB)
    # ROI upshift path
    py = _py_decode(data, 1, MAGB, [lcup, 0], w, h, MAGB, 3)
    nat = ht_dec.decode_htj2k(data, 1, MAGB, [lcup, 0], w, h, MAGB, 3)
    assert np.array_equal(py, nat)
    # truncated stream: both tiers must agree (decode or same error)
    for cut in (3, lcup // 2):
        trunc = data[:cut]
        try:
            py = _py_decode(trunc, 1, MAGB, [lcup, 0], w, h, MAGB)
            py_err = None
        except Exception as e:
            py, py_err = None, type(e)
        try:
            nat = ht_dec.decode_htj2k(trunc, 1, MAGB, [lcup, 0], w, h,
                                      MAGB)
            nat_err = None
        except Exception as e:
            nat, nat_err = None, type(e)
        assert py_err == nat_err
        if py_err is None:
            assert np.array_equal(py, nat)


def test_native_magref_tail_fuzz():
    """Random-geometry 3-pass fuzz (the class that caught the MagRef
    backward reader's missing trailing-0xFF byte: the oracle's reader
    sees the caller's sentinel byte as `last` during its first refill,
    which feeds the unstuffing decisions)."""
    from ffmpeg_ht_tpu.utils.errors import InvalidData
    rng = np.random.default_rng(77)
    tried = 0
    for _ in range(600):
        w = int(rng.integers(1, 33))
        h = int(rng.integers(1, 33))
        magb = int(rng.integers(4, 12))
        zbp = magb - 2
        mag = rng.integers(0, 1 << min(magb - 2, 7), (h, w)).astype(
            np.int64)
        mag = np.where(rng.random((h, w)) < rng.random(), 0, mag)
        sign = np.where(mag > 0, rng.integers(0, 2, (h, w)), 0)
        try:
            enc = encode_block_3pass(mag, sign, zbp)
        except InvalidData:
            continue
        if enc is None:
            continue
        tried += 1
        data, lcup, lref = enc
        for npasses in (1, 2, 3):
            lr = lref if npasses > 1 else 0
            py = _py_decode(data, npasses, zbp, [lcup, lr], w, h, magb)
            nat = ht_dec.decode_htj2k(data, npasses, zbp, [lcup, lr],
                                      w, h, magb)
            assert np.array_equal(py, nat), (w, h, magb, npasses)
    assert tried >= 200
