#!/usr/bin/env python3
"""Mosaic compile + bit-exactness + timing for the Pallas cleanup
kernel on the real TPU (VERDICT r4 item 2).

Three steps, each independently reported so a partial run still says
something:
  1. compile  — lower decode_cleanup_pallas through Mosaic (no
     interpret), tiny real-stream inputs; any lowering error is the
     named blocker.
  2. exactness — mu/sig/ok must equal ops.ht_scan._cleanup_impl on the
     same real codestream-derived inputs, on-chip.
  3. timing   — random N=6321 inputs, qw=qh=32, ms_class=16: the exact
     configuration of tools/ablate_entropy.py so rows are comparable.

Usage: python tools/pallas_onchip.py   (needs the TPU tunnel)
"""
import os
import sys
import time
import traceback

os.environ.setdefault("FFMPEG_HT_TPU_CACHE", "/root/repo/.xla_cache_tpu")
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from ffmpeg_ht_tpu.models.decoder import Decoder
from ffmpeg_ht_tpu.models import fastpath as FP
from ffmpeg_ht_tpu.models import assembly as ASM
from ffmpeg_ht_tpu.codestream.parser import parse_codestream
from ffmpeg_ht_tpu.models.encoder import encode_frame_htj2k
from ffmpeg_ht_tpu.ops.ht_scan import _cleanup_impl
from ffmpeg_ht_tpu.ops.ht_scan_pallas import decode_cleanup_pallas

print(f"devices: {jax.devices()}", flush=True)


def _kernel_args(img, **enc):
    data = encode_frame_htj2k(img, **enc)
    hdr = parse_codestream(data, bitexact=True)
    fg = Decoder._fast_geom(hdr)
    cols = FP.parse_frame_flat(hdr, fg)
    fc = FP.build_v3_frame(fg, cols)
    args, _ = FP.finish_v3(fg, [fc], fg.geom.total)
    if fg.v3_plan is None:
        fg.v3_plan = ASM.build_plan(fg)
    qw, qh = fg.v3_plan.bw // 2, fg.v3_plan.bh // 2
    mb = int(fc["maxbp"][fc["qws"] > 0].max())
    msc = next(c for c in (8, 12, 16, 20, 25) if mb <= c)
    keys = ("msw", "melw", "vlcw", "pLSB", "maxbp", "ms_lim", "mel_lim",
            "qws", "qhs")
    return [jnp.asarray(args[k]) for k in keys], qw, qh, msc


rng = np.random.default_rng(2718)

# --- steps 1+2: compile + exactness on a real stream ----------------
# mixed-frequency texture, 64x64 codeblocks (headline geometry)
x = np.linspace(0, 14, 256)
img = ((np.sin(np.outer(x, x)) * 400 + 500).astype(np.uint16)
       + rng.integers(0, 128, (256, 256)).astype(np.uint16))
try:
    a, qw, qh, msc = _kernel_args(img, depth=10, log2_cblk_width=6,
                                  log2_cblk_height=6)
    print(f"real stream: N={int(a[0].shape[0])} qw={qw} qh={qh} "
          f"msc={msc}", flush=True)
    t0 = time.perf_counter()
    mu1, sig1, ok1 = jax.jit(
        lambda *a: decode_cleanup_pallas(*a, qw=qw, qh=qh, ms_class=msc,
                                         block=128)
    )(*a)
    mu1 = np.asarray(mu1)
    print(f"MOSAIC COMPILE OK ({time.perf_counter() - t0:.0f}s)",
          flush=True)
    mu0, sig0, ok0 = jax.jit(
        lambda *a: _cleanup_impl(*a[:7], qw=qw, qh=qh, ms_class=msc,
                                 dims=(a[7], a[8]))
    )(*a)
    exact = (np.array_equal(mu0, mu1)
             and np.array_equal(np.asarray(sig0), np.asarray(sig1))
             and np.array_equal(np.asarray(ok0), np.asarray(ok1)))
    print(f"BIT-EXACT vs XLA kernel: {exact}", flush=True)
    if not exact:
        bad = np.nonzero(np.any(np.asarray(mu0) != mu1, axis=tuple(
            range(1, mu1.ndim))))[0]
        print(f"  mu mismatch lanes: {bad[:8]} of {len(bad)}", flush=True)
        print(f"  ok0 {np.asarray(ok0)[bad[:4]]} "
              f"ok1 {np.asarray(ok1)[bad[:4]]}", flush=True)
except Exception:
    traceback.print_exc()
    print("MOSAIC COMPILE/EXACTNESS FAILED", flush=True)

# --- step 3: timing, ablate_entropy.py configuration -----------------
N = 6321
rng = np.random.default_rng(0)


def mk(W):
    return jnp.asarray(rng.integers(0, 2 ** 32, (N, W), dtype=np.uint32))


pLSB = jnp.full((N,), 20, jnp.int32)
maxbp = jnp.full((N,), 11, jnp.int32)
qws = jnp.full((N,), 32, jnp.int32)
qhs = jnp.full((N,), 32, jnp.int32)
msw, vlcw, melw = mk(176), mk(192), mk(192)
lim = jnp.full((N,), 1 << 29, jnp.int32)


def sync(s):
    return np.asarray(s)


def bench_pallas(tag, block, reps=3, iters=5):
    @jax.jit
    def k(msw, melw, vlcw):
        mu, _s, ok = decode_cleanup_pallas(
            msw, melw, vlcw, pLSB, maxbp, lim, lim, qws, qhs,
            qw=32, qh=32, ms_class=16, block=block)
        return jnp.sum(mu, dtype=jnp.uint32) + jnp.uint32(jnp.all(ok))

    t0 = time.perf_counter()
    s = k(msw, melw, vlcw)
    sync(s)
    c = time.perf_counter() - t0
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            s = k(msw, melw, vlcw)
        sync(s)
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{tag}: {best * 1e3:.2f} ms   (compile {c:.0f}s)", flush=True)


for blk in (128, 256):
    try:
        bench_pallas(f"pallas block={blk or 'auto'}", blk)
    except Exception as e:
        print(f"pallas block={blk}: FAILED {e!r:.300}", flush=True)
print("done", flush=True)
