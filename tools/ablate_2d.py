#!/usr/bin/env python3
"""On-chip A/B: 1-D (N,) lane layout vs the 2-D (N/L, L) fold
(ht_scan.decode_cleanup_scan_dims_2d) for the cleanup scan at the 4K
bucket size. If XLA lays (N,) registers on one VPU sublane, the fold
should approach 8x on the throughput-bound share of the budget.

Usage: python tools/ablate_2d.py   (needs the TPU)
"""
import os
import sys
import time

os.environ.setdefault("FFMPEG_HT_TPU_CACHE", "/root/repo/.xla_cache_tpu")
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from ffmpeg_ht_tpu.ops import ht_scan as HS

print(jax.devices(), flush=True)


def sync(x):
    return np.asarray(x.reshape(-1)[0])


rng = np.random.default_rng(0)
N = 6321
msw = jnp.asarray(rng.integers(0, 2**32, (N, 176), dtype=np.uint32))
vlcw = jnp.asarray(rng.integers(0, 2**32, (N, 192), dtype=np.uint32))
melw = jnp.asarray(rng.integers(0, 2**32, (N, 192), dtype=np.uint32))
pLSB = jnp.full((N,), 20, jnp.int32)
maxbp = jnp.full((N,), 11, jnp.int32)
qdim = jnp.full((N,), 32, jnp.int32)
lim = jnp.full((N,), 1 << 29, jnp.int32)
ARGS = (msw, melw, vlcw, pLSB, maxbp, lim, lim, qdim, qdim)


def bench(tag, fn, reps=3, iters=5):
    t0 = time.perf_counter()
    s = fn(*ARGS)
    sync(s)
    c = time.perf_counter() - t0
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            s = fn(*ARGS)
        sync(s)
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{tag}: {best*1e3:.2f} ms   (compile {c:.0f}s)", flush=True)
    return best


@jax.jit
def k1d(*a):
    mu, _s, ok = HS.decode_cleanup_scan_dims(*a, qw=32, qh=32,
                                             ms_class=16)
    return jnp.sum(mu, dtype=jnp.uint32) + jnp.uint32(jnp.all(ok))


bench("1-D (N,) baseline", k1d)

for L in (128, 256, 512, 1024):
    def k2d(*a, L=L):
        mu, _s, ok = HS.decode_cleanup_scan_dims_2d(*a, qw=32, qh=32,
                                                    ms_class=16, lanes=L)
        return jnp.sum(mu, dtype=jnp.uint32) + jnp.uint32(jnp.all(ok))
    bench(f"2-D lanes={L}", jax.jit(k2d))

print("done", flush=True)
