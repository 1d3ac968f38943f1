#!/usr/bin/env python3
"""Bisect the N threshold of the Mosaic remote-compile failure seen in
tools/pallas_onchip.py step 3 (N=6321 crashed, N=28 compiled clean),
and capture the full error text once."""
import os
import sys
import time
import traceback

os.environ.setdefault("FFMPEG_HT_TPU_CACHE", "/root/repo/.xla_cache_tpu")
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from ffmpeg_ht_tpu.ops.ht_scan_pallas import decode_cleanup_pallas

print(f"devices: {jax.devices()}", flush=True)
rng = np.random.default_rng(0)


def run(N, block=128, full_err=False):
    msw = jnp.asarray(rng.integers(0, 2**32, (N, 176), dtype=np.uint32))
    vlcw = jnp.asarray(rng.integers(0, 2**32, (N, 192), dtype=np.uint32))
    melw = jnp.asarray(rng.integers(0, 2**32, (N, 192), dtype=np.uint32))
    pLSB = jnp.full((N,), 20, jnp.int32)
    maxbp = jnp.full((N,), 11, jnp.int32)
    q = jnp.full((N,), 32, jnp.int32)
    lim = jnp.full((N,), 1 << 29, jnp.int32)

    @jax.jit
    def k(msw, melw, vlcw):
        mu, _s, ok = decode_cleanup_pallas(
            msw, melw, vlcw, pLSB, maxbp, lim, lim, q, q,
            qw=32, qh=32, ms_class=16, block=block)
        return jnp.sum(mu, dtype=jnp.uint32) + jnp.uint32(jnp.all(ok))

    t0 = time.perf_counter()
    try:
        s = np.asarray(k(msw, melw, vlcw))
        c = time.perf_counter() - t0
        # time it
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(5):
                s = k(msw, melw, vlcw)
            np.asarray(s)
            best = min(best, (time.perf_counter() - t0) / 5)
        print(f"N={N} block={block}: OK {best*1e3:.2f} ms "
              f"(compile {c:.0f}s)", flush=True)
        return True
    except Exception as e:
        if full_err:
            traceback.print_exc()
        else:
            print(f"N={N} block={block}: FAIL {e!r:.400}", flush=True)
        return False


if __name__ == "__main__":
    # args: N[:block] ...
    specs = [(int(a.split(":")[0]),
              int(a.split(":")[1]) if ":" in a else 128)
             for a in sys.argv[1:]] or [(512, 128), (2048, 128),
                                        (6321, 128)]
    for N, blk in specs:
        run(N, block=blk, full_err=True)
