#!/usr/bin/env python3
"""Entropy-kernel ablations on real TPU: lane scaling (is the scan
latency- or throughput-bound?), lax.scan unroll, int8 one-hot CxtVLC,
gather-based refill, and stubbed upper bounds (no-cxtvlc / no-MEL /
no-refill floor). Monkeypatch-based; decodes random (invalid) streams,
so timings only -- correctness is the oracle suite's job.

Usage: python tools/ablate_entropy.py   (needs the TPU; many compiles)
"""
import os, sys, time
os.environ.setdefault("FFMPEG_HT_TPU_CACHE", "/root/repo/.xla_cache_tpu")
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from ffmpeg_ht_tpu.ops import ht_scan as HS

def sync(x): return np.asarray(x.reshape(-1)[0])
rng = np.random.default_rng(0)
N = 6321
def mk(W):
    return jnp.asarray(rng.integers(0, 2**32, (N, W), dtype=np.uint32))
pLSB = jnp.full((N,), 20, jnp.int32); maxbp = jnp.full((N,), 11, jnp.int32)
qws = jnp.full((N,), 32, jnp.int32); qhs = jnp.full((N,), 32, jnp.int32)
msw, vlcw, melw = mk(176), mk(192), mk(192)
lim = jnp.full((N,), 1 << 29, jnp.int32)

def bench(tag, unroll=1, reps=3, iters=5):
    @jax.jit
    def k(msw, melw, vlcw):
        mu, _s, ok = HS._cleanup_impl(msw, melw, vlcw, pLSB, maxbp, lim,
                                      lim, qw=32, qh=32, ms_class=16,
                                      dims=(qws, qhs), unroll=unroll)
        return jnp.sum(mu, dtype=jnp.uint32) + jnp.uint32(jnp.all(ok))
    t0 = time.perf_counter(); s = k(msw, melw, vlcw); sync(s)
    c = time.perf_counter() - t0
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            s = k(msw, melw, vlcw)
        sync(s)
        best = min(best, (time.perf_counter()-t0)/iters)
    print(f"{tag}: {best*1e3:.2f} ms   (compile {c:.0f}s)", flush=True)
    return best

base = bench("v5 base (f32 bitlen)")

# lane scaling: if per-lane cost drops at larger N, the kernel is
# latency-bound and multi-frame batching is the throughput lever
def bench_n(tag, n2, reps=3, iters=5):
    m2, v2, e2 = mk(176)[:0], None, None
    msw2 = jnp.asarray(rng.integers(0, 2**32, (n2, 176), dtype=np.uint32))
    vlcw2 = jnp.asarray(rng.integers(0, 2**32, (n2, 192), dtype=np.uint32))
    melw2 = jnp.asarray(rng.integers(0, 2**32, (n2, 192), dtype=np.uint32))
    pL2 = jnp.full((n2,), 20, jnp.int32); mb2 = jnp.full((n2,), 11, jnp.int32)
    q2 = jnp.full((n2,), 32, jnp.int32)
    lim2 = jnp.full((n2,), 1 << 29, jnp.int32)
    @jax.jit
    def k(msw, melw, vlcw):
        mu, _s, ok = HS._cleanup_impl(msw, melw, vlcw, pL2, mb2, lim2,
                                      lim2, qw=32, qh=32, ms_class=16,
                                      dims=(q2, q2))
        return jnp.sum(mu, dtype=jnp.uint32) + jnp.uint32(jnp.all(ok))
    t0 = time.perf_counter(); s = k(msw2, melw2, vlcw2); sync(s)
    c = time.perf_counter() - t0
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            s = k(msw2, melw2, vlcw2)
        sync(s)
        best = min(best, (time.perf_counter()-t0)/iters)
    print(f"{tag}: {best*1e3:.2f} ms = {best*1e9/n2:.0f} ns/lane "
          f"(compile {c:.0f}s)", flush=True)

bench_n("N=1024", 1024)
bench_n("N=2048", 2048)
bench_n("N=12642 (2 frames)", 12642)
bench_n("N=25284 (4 frames)", 25284)

bench("unroll=2", unroll=2)
bench("unroll=4", unroll=4)

# int8 one-hot matmul for CxtVLC — now the shipped cxt_i8 variant;
# measure it by flipping the module toggle (read once at import, but
# _VARIANTS is just a frozenset — rebind for the ablation)
orig_variants = HS._VARIANTS
HS._VARIANTS = frozenset({"cxt_i8"})
bench("int8 cxtvlc (cxt_i8 variant)")
HS._VARIANTS = frozenset({"cxt_i8", "refill_gather"})
bench("cxt_i8 + refill_gather variants")
HS._VARIANTS = frozenset({"refill_gather"})
bench("refill_gather variant")
HS._VARIANTS = orig_variants

# Pallas VMEM-resident formulation (ops/ht_scan_pallas.py)
try:
    from ffmpeg_ht_tpu.ops.ht_scan_pallas import decode_cleanup_pallas

    def bench_pallas(tag, block, reps=3, iters=5):
        @jax.jit
        def k(msw, melw, vlcw):
            mu, _s, ok = decode_cleanup_pallas(
                msw, melw, vlcw, pLSB, maxbp, lim, lim, qws, qhs,
                qw=32, qh=32, ms_class=16, block=block)
            return jnp.sum(mu, dtype=jnp.uint32) + jnp.uint32(jnp.all(ok))
        t0 = time.perf_counter(); s = k(msw, melw, vlcw); sync(s)
        c = time.perf_counter() - t0
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(iters):
                s = k(msw, melw, vlcw)
            sync(s)
            best = min(best, (time.perf_counter()-t0)/iters)
        print(f"{tag}: {best*1e3:.2f} ms   (compile {c:.0f}s)", flush=True)

    for blk in (128, 256, 512):
        try:
            bench_pallas(f"pallas block={blk}", blk)
        except Exception as e:
            print(f"pallas block={blk}: FAILED {e!r:.200}", flush=True)
except Exception as e:
    print(f"pallas import failed: {e!r:.120}", flush=True)

# stub cxtvlc entirely (upper bound of any lookup optimization)
orig_cxt = HS._cxtvlc
HS._cxtvlc = lambda code, context, tbl, ar32=None: \
    (code.astype(jnp.int32) << 4) | 5
bench("no cxtvlc (bound)")
HS._cxtvlc = orig_cxt

# stub MEL (upper bound)
orig_mel = HS._mel_sym
HS._mel_sym = lambda mst, active: (jnp.where(active, 1, 0), mst)
bench("no mel (bound)")
HS._mel_sym = orig_mel

# gather-based refill: two per-lane group fetches via take_along_axis
# instead of masked full-width sweeps (group rows are G contiguous words)
orig_rf = HS.refill_top_staged
def refill_gather(words_g, st, lim, S, G):
    assert S <= G + 1
    pos, widx, w = st
    K = len(w)
    Wg = words_g.shape[1]
    base = widx + (K - S)
    g0 = jnp.clip(base // G, 0, Wg - 1)
    g1 = jnp.clip(g0 + 1, 0, Wg - 1)
    rows0 = jnp.take_along_axis(words_g, g0[:, None, None],
                                axis=1)[:, 0, :]
    rows1 = jnp.take_along_axis(words_g, g1[:, None, None],
                                axis=1)[:, 0, :]
    cand = [rows0[:, j] for j in range(G)] + [rows1[:, j]
                                              for j in range(G)]
    off0 = base - (base // G) * G
    w = list(w)
    for s in range(S):
        idx_c = off0 + s
        v = cand[0]
        for i in range(1, 2 * G):
            v = jnp.where(idx_c == i, cand[i], v)
        v = jnp.where(base + s >= lim, jnp.uint32(0xFFFFFFFF), v)
        w[K - S + s] = v
    return (pos, widx, tuple(w))
HS.refill_top_staged = refill_gather
bench("gather refill")
HS.refill_top_staged = orig_rf

# stub refills (floor)
HS.refill_top_staged = lambda wg, st, lim, S, G: st
bench("no refill (floor)")
HS.refill_top_staged = orig_rf
