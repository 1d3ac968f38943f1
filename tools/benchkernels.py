#!/usr/bin/env python3
"""Per-kernel microbenchmarks — the checkasm analog.

Each kernel is checked against its scalar oracle and timed on the default
backend (the real TPU under the driver; CPU with JAX_PLATFORMS=cpu).
Mirrors the reference's tests/checkasm/jpeg2000dsp.c pattern: exact
compare, then bench.

Usage: python tools/benchkernels.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np


def _t(fn, fetch, reps=20):
    fn()
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn()
    fetch(r)
    return (time.perf_counter() - t0) / reps * 1000


def bench_entropy():
    import jax.numpy as jnp

    from ffmpeg_ht_tpu.ops.ht_batch import prepare_streams, stream_limits
    from ffmpeg_ht_tpu.ops.ht_dec import decode_htj2k
    from ffmpeg_ht_tpu.ops.ht_enc import encode_cleanup
    from ffmpeg_ht_tpu.ops.ht_scan import decode_cleanup_scan

    rng = np.random.default_rng(0)
    rows, lcs, pcs, expects = [], [], [], []
    N = 256
    for _ in range(N):
        mag = rng.integers(0, 128, (32, 32)).astype(np.int64)
        mag = np.where(rng.random((32, 32)) < 0.6, 0, mag)
        sign = rng.integers(0, 2, (32, 32)).astype(np.int64)
        d, lc = encode_cleanup(mag, sign, 7)
        scup = (d[lc - 1] << 4) + (d[lc - 2] & 0xF)
        rows.append(np.frombuffer(d, np.uint8))
        lcs.append(lc)
        pcs.append(lc - scup)
        expects.append(decode_htj2k(d, 1, 7, [lc, 0], 32, 32, 8))
    msw, melw, vlcw = prepare_streams(rows, lcs, pcs)
    lmax = max(max(len(r) for r in rows), 4)
    data = np.zeros((N, lmax), np.uint8)
    for i, r in enumerate(rows):
        data[i, :len(r)] = r
    ms_lim, mel_lim = stream_limits(data, np.asarray(lcs), np.asarray(pcs))
    msw, melw, vlcw = jnp.asarray(msw), jnp.asarray(melw), jnp.asarray(vlcw)
    ms_lim, mel_lim = jnp.asarray(ms_lim), jnp.asarray(mel_lim)
    pLSB = jnp.full((N,), 23, jnp.int32)
    maxbp = jnp.full((N,), 8, jnp.int32)

    mu, ok = decode_cleanup_scan(msw, melw, vlcw, pLSB, maxbp,
                                 ms_lim, mel_lim, qw=16, qh=16, ms_class=8)
    ras = np.asarray(mu)
    exact = all(np.array_equal(
        ras[i].astype(np.int64) & 0xFFFFFFFF,
        expects[i].astype(np.int64) & 0xFFFFFFFF) for i in range(N))

    ms = _t(lambda: decode_cleanup_scan(msw, melw, vlcw, pLSB, maxbp,
                                        ms_lim, mel_lim,
                                        qw=16, qh=16, ms_class=8),
            lambda r: np.asarray(r[0]))
    print(f"ht_cleanup_batch   [{'OK' if exact else 'FAIL'}] "
          f"{ms:8.2f} ms / {N} cblk 32x32  ({ms / N * 1000:.1f} us/cblk)")


def bench_dwt():
    import jax
    import jax.numpy as jnp

    from ffmpeg_ht_tpu.ops.dwt import DWT53, dwt_decode, dwt_encode
    from ffmpeg_ht_tpu.ops.dwt_jax import _dwt_decode_traced

    rng = np.random.default_rng(0)
    img = rng.integers(-512, 512, (512, 512)).astype(np.int32)
    b = [[0, 512], [0, 512]]
    enc = dwt_encode(img.copy(), b, 5, DWT53)
    want = dwt_decode(enc.copy(), b, 5, DWT53)

    f = jax.jit(lambda x: _dwt_decode_traced(x, b, 5, DWT53))
    x = jnp.asarray(enc)
    exact = np.array_equal(np.asarray(f(x)), want)
    ms = _t(lambda: f(x), lambda r: np.asarray(r))
    print(f"dwt53_inverse_512  [{'OK' if exact else 'FAIL'}] {ms:8.2f} ms")


def bench_mct():
    from ffmpeg_ht_tpu.ops.mct import rct_int
    from ffmpeg_ht_tpu.ops.mct_pallas import rct_writeframe

    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    planes = [jnp.asarray(rng.integers(-512, 512, (512, 512))
                          .astype(np.int32)) for _ in range(3)]
    interp = jax.default_backend() == "cpu"
    r, g, bl = rct_writeframe(*planes, 8, interpret=interp)
    hr, hg, hb = rct_int(*[np.asarray(p) for p in planes])
    exact = np.array_equal(np.asarray(r), np.clip(hr + 128, 0, 255))
    ms = _t(lambda: rct_writeframe(*planes, 8, interpret=interp),
            lambda rr: np.asarray(rr[0]))
    print(f"rct_writeframe_512 [{'OK' if exact else 'FAIL'}] {ms:8.2f} ms "
          f"(pallas)")


def bench_prep():
    from ffmpeg_ht_tpu.ops.ht_batch import prepare_streams_batch
    from ffmpeg_ht_tpu.ops.ht_enc import encode_cleanup

    rng = np.random.default_rng(0)
    rows, lcs, pcs = [], [], []
    for _ in range(1024):
        mag = rng.integers(0, 128, (16, 16)).astype(np.int64)
        sign = rng.integers(0, 2, (16, 16)).astype(np.int64)
        d, lc = encode_cleanup(mag, sign, 7)
        scup = (d[lc - 1] << 4) + (d[lc - 2] & 0xF)
        rows.append(np.frombuffer(d, np.uint8))
        lcs.append(lc)
        pcs.append(lc - scup)
    l = max(len(r) for r in rows)
    data = np.zeros((1024, l), np.uint8)
    for i, r in enumerate(rows):
        data[i, :len(r)] = r
    lcup = np.asarray(lcs, np.int64)
    pcup = np.asarray(pcs, np.int64)
    from ffmpeg_ht_tpu.utils import native
    has_native = native.load() is not None
    t0 = time.perf_counter()
    for _ in range(10):
        prepare_streams_batch(data, lcup, pcup)
    ms = (time.perf_counter() - t0) / 10 * 1000
    print(f"stream_prep_1024   [{'C' if has_native else 'numpy'}]  "
          f"{ms:8.2f} ms")


if __name__ == "__main__":
    bench_prep()
    bench_entropy()
    bench_dwt()
    bench_mct()
    sys.exit(0)
