"""Dev harness: validate ops/ht_refine against the scalar oracle."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")

import numpy as np

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from ffmpeg_ht_tpu.ops.ht_batch import (prepare_streams_batch,
                                        prepare_refinement_streams,
                                        stream_limits)
from ffmpeg_ht_tpu.ops.ht_dec import decode_htj2k
from ffmpeg_ht_tpu.ops.ht_enc import encode_block_3pass
from ffmpeg_ht_tpu.ops.ht_refine import decode_refinement_scan
from ffmpeg_ht_tpu.ops.ht_scan import decode_cleanup_scan_sig

RNG = np.random.default_rng(7)


def run_bucket(blocks, w, h, zbp):
    """blocks: list of (data, lcup, lref, npasses). Returns (N, h, w) u32."""
    n = len(blocks)
    qw, qh = -(-w // 2), -(-h // 2)
    lmax = max(max(len(d) for d, *_ in blocks), 4)
    cdat = np.zeros((n, lmax), np.uint8)
    lcups = np.zeros(n, np.int64)
    pcups = np.zeros(n, np.int64)
    drmax = max(max(lr for _, _, lr, _ in blocks), 1)
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
        dr = data[lcup:lcup + lref]
        dref[i, :len(dr)] = np.frombuffer(dr, np.uint8)
        lrefs[i] = lref
        has_sp[i] = npasses >= 2
        has_mr[i] = npasses >= 3
    msw, melw, vlcw = prepare_streams_batch(cdat, lcups, pcups)
    ms_lim, mel_lim = stream_limits(cdat, lcups, pcups)
    spw, mrw = prepare_refinement_streams(dref, lrefs)
    pLSB = np.full(n, 30 - zbp, np.int32)
    maxbp = np.full(n, zbp + 1, np.int32)
    mu, sig, ok = decode_cleanup_scan_sig(
        jnp.asarray(msw), jnp.asarray(melw), jnp.asarray(vlcw),
        jnp.asarray(pLSB), jnp.asarray(maxbp),
        jnp.asarray(ms_lim), jnp.asarray(mel_lim),
        qw=qw, qh=qh, ms_class=min(zbp + 1, 25))
    assert bool(np.asarray(ok).all()), "cleanup kernel flagged invalid"
    ras = decode_refinement_scan(
        mu, sig, jnp.asarray(spw), jnp.asarray(mrw), jnp.asarray(pLSB),
        jnp.asarray(has_sp), jnp.asarray(has_mr),
        jnp.zeros(n, bool), qw=qw, qh=qh, w=w, h=h)
    return np.asarray(ras)[:, :h, :w]


def main():
    magb = 8
    zbp = magb - 2
    fails = 0
    trials = 0
    # few fixed shapes: each (qw, qh, w, h) pair compiles two kernels on
    # this 1-core host, so shape count dominates wall time
    for w, h in ((32, 32), (17, 29), (64, 12), (8, 64)):
        blocks = []
        expects = []
        for _ in range(4):
            mag = RNG.integers(0, 128, (h, w)).astype(np.int64)
            mag = np.where(RNG.random((h, w)) < RNG.random(), 0, mag)
            sign = np.where(mag > 0,
                            RNG.integers(0, 2, (h, w)).astype(np.int64), 0)
            enc = encode_block_3pass(mag, sign, zbp)
            if enc is None:
                continue
            data, lcup, lref = enc
            blocks.append((data, lcup, lref, 3))
            expects.append(decode_htj2k(data, 3, zbp, [lcup, lref],
                                        w, h, magb))
        if not blocks:
            continue
        got = run_bucket(blocks, w, h, zbp)
        for i, exp in enumerate(expects):
            trials += 1
            e = exp.astype(np.int64) & 0xFFFFFFFF
            g = got[i].astype(np.int64)
            if not np.array_equal(e, g):
                fails += 1
                bad = np.argwhere(e != g)
                y, x = bad[0]
                print(f"FAIL {w}x{h} lane {i}: {len(bad)} mismatches, "
                      f"first at ({y},{x}): exp {e[y, x]:#010x} "
                      f"got {g[y, x]:#010x}")
    print(f"{trials - fails}/{trials} blocks OK")
    return fails


if __name__ == "__main__":
    raise SystemExit(1 if main() else 0)
