"""Scan-structured HT cleanup kernel (v2 of the TPU entropy stage).

Same contract as ops/ht_batch.decode_cleanup_words (the v1 lockstep kernel;
scalar oracle in ops/ht_dec.py, reference jpeg2000htdec.c:548-1014), rebuilt
around what the v1 ablations measured on real v5e hardware:

  - every `lax.cond` (the any()-reduce + scalar branch sync) costs ~2.5 us;
    v1 wrapped every stream refill and the MEL/U-VLC machinery in one
    (~16 conds/pair-iteration -> ~40 ms of the 95 ms launch);
  - every dynamic_update_slice / dynamic_slice on a lane-minor row buffer
    costs ~6-7 us; v1 did ~12 per pair-iteration (~35 ms);
  - a (N,) gather from the 1024-entry CxtVLC table costs ~12 us;
  - the one-hot word fetch costs ~2-5 us and is the only primitive whose
    cost is irreducible (it re-reads the (N, W) stream array once).

So v2 makes everything *unconditional and register-resident*:

  1. Streams carry a K-word register window (K static per stream, sized so
     one pair-iteration's worst-case consumption plus one maximal peek
     always fits). All in-iteration reads are funnel shifts on carried
     registers (a one-word register roll keeps the offset < 32 before
     every read); the consumed top words are refilled by S unconditional
     one-hot fetches once per iteration.
  2. The quad-pair loop is a lax.scan: row-above context/exponent inputs
     arrive as scanned xs (precomputed vectorially per row), per-quad
     outputs leave as stacked ys. No dynamic slicing anywhere.
  3. The CxtVLC lookup is factorized: a 32-way one-hot MXU matmul picks a
     table row block, a 32-way masked reduce picks the entry. The U-VLC
     prefix and MEL exponent tables are closed-form arithmetic.
  4. The MagSgn budget per iteration (8 samples x m_n bits) is bounded by
     a *static* per-bucket magnitude class `ms_class` (m_n <= U <= maxbp;
     the host buckets codeblocks so the class is tight); invalid streams
     whose U exceeds maxbp are flagged via `ok` exactly like v1 (the host
     raises InvalidData, matching jpeg2000htdec.c:715-718), so the clamp
     never changes a stream that decodes validly.

The executable is specialized on (qw, qh, ms_class) + array shapes; a
decode of one video compiles one or two variants.

Everything is uint32/int32 (no x64 dependency); works identically on CPU
(tests) and TPU.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ffmpeg_ht_tpu.ops import tables as tb

# Measurable kernel variants (ARCHITECTURE.md "remaining levers"),
# comma-separated in FFMPEG_HT_TPU_KERNEL_VARIANTS, read at import:
#   cxt_i8        — int8 MXU matmul for the CxtVLC one-hot row pick
#                   (measured r5: a wash, 20.7 vs 20.6 ms)
#   refill_gather — take_along_axis gathers instead of masked sweeps
#                   for the register-window refills (measured r5:
#                   ~10x WORSE — XLA lowers the gather to selects)
#   scan2d        — lane axis folded (N/128, 128) so carried registers
#                   fill all 8 VPU sublanes; ~6% faster on-chip
#                   (19.78 vs 20.99 ms, tools/ablate_2d.py) and the
#                   round-5 DEFAULT on TPU (models/assembly.py)
#   scan1d        — force the rank-1 (N,) kernel back on TPU
#   pallas        — the Mosaic VMEM-resident formulation
#                   (ops/ht_scan_pallas.py); compiles + bit-exact
#                   on-chip but ~30x slower per lane (see its
#                   docstring) — kept for future Mosaic work
# Bit-exactness of every variant is pinned by tests/test_ht_scan_dims.py
# (same outputs as the default formulation on the oracle corpus).
_VARIANTS = frozenset(
    v for v in os.environ.get("FFMPEG_HT_TPU_KERNEL_VARIANTS",
                              "").split(",") if v)

I32 = jnp.int32
U32 = jnp.uint32

# CxtVLC tables reshaped for the factorized lookup: (32 row-blocks, 32),
# byte-split so the one-hot matmul is exact even when the backend runs
# f32 matmuls at bf16 precision (0/1 one-hots and <=255 table bytes are
# bf16-exact; the f32 accumulation of exact addends stays exact).
def _split_tbl(t):
    """(32, 64) side-by-side byte halves: ONE one-hot matmul picks both
    byte planes of the row block (cols 0-31 low byte, 32-63 high)."""
    t = t.reshape(32, 32)
    return np.concatenate([(t & 0xFF).astype(np.float32),
                           (t >> 8).astype(np.float32)], axis=1)


_CXT0_NP = _split_tbl(tb.CXTVLC_PACKED[0].astype(np.int64))
_CXT1_NP = _split_tbl(tb.CXTVLC_PACKED[1].astype(np.int64))

# int8 variant: the byte planes live value-shifted by -128 so they fit
# int8; the one-hot dot picks exactly one entry, so adding 128 back to
# the int32 accumulation is exact.
_CXT0_I8 = (_CXT0_NP - 128.0).astype(np.int8)
_CXT1_I8 = (_CXT1_NP - 128.0).astype(np.int8)

_AR32 = np.arange(32, dtype=np.int32)

_NO_LIM = 1 << 29


def _fetch(words, idx, lim):
    """Per-lane word gather as a one-hot reduce. idx >= lim synthesizes
    all-ones (the reference's unbounded 0xFF synthesis past the segment
    end, jpeg2000htdec.c:207-221); other out-of-range reads give 0."""
    W = words.shape[1]
    ar = jnp.arange(W, dtype=I32)[None, :]
    sel = ar == idx[:, None]
    val = jnp.sum(jnp.where(sel, words, jnp.uint32(0)), axis=1, dtype=U32)
    return jnp.where(idx >= lim, jnp.uint32(0xFFFFFFFF), val)


# ---------------------------------------------------------------------------
# K-word register-window stream
#
# state = (pos, widx, (w0..w_{K-1})): bits [32*widx, 32*(widx+K)) live in
# registers; invariant: 0 <= pos - 32*widx < 32 before every read (each
# read rolls the window at most one word, registers only). A pair
# iteration consumes <= C bits, so it rolls <= S = (31+C)//32 times and
# any read's w0/w1 stay within the valid prefix provided K >= S+2. The
# end-of-iteration refill refetches the top S slots from memory
# unconditionally (slot k's absolute word is always widx + k, so
# refetching a still-valid slot is a no-op by value).
# ---------------------------------------------------------------------------


def st_init(words, K: int, lim=None):
    N, W = words.shape
    z = jnp.zeros((N,), I32)
    if lim is None:
        lim = jnp.full((N,), _NO_LIM, I32)
    else:
        lim = jnp.asarray(lim, I32)
    w = []
    for k in range(K):
        col = words[:, k] if k < W else jnp.zeros((N,), U32)
        w.append(jnp.where(k >= lim, jnp.uint32(0xFFFFFFFF), col))
    return (z, z, tuple(w)), lim


def _peek32(st):
    """32 bits at pos (registers only; needs pos - 32*widx < 32)."""
    pos, widx, w = st
    off = (pos - (widx << 5)).astype(U32)
    lo = w[0] >> off
    hi = jnp.where(off == 0, jnp.uint32(0),
                   w[1] << (jnp.uint32(32) - off))
    return lo | hi


def _read(st, n, active):
    """Read n (<=25) bits LSB-first; a single register roll restores the
    offset < 32 invariant for the next read."""
    pos, widx, w = st
    nn = jnp.where(active & (n > 0), n, 0).astype(U32)
    val = _peek32(st) & ((jnp.uint32(1) << nn) - 1)
    pos = pos + nn.astype(I32)
    roll = (pos - (widx << 5)) >= 32
    w = tuple(jnp.where(roll, w[k + 1], w[k]) for k in range(len(w) - 1)) \
        + (w[-1],)
    widx = widx + roll.astype(I32)
    return val, (pos, widx, w)


def _peek_only(st, n: int):
    """Peek n (static, <= 25) bits without consuming."""
    return _peek32(st) & ((jnp.uint32(1) << n) - 1)


def _drop(st, n, active):
    _, st = _read(st, n, active)
    return st


def _drop32(st, n):
    """Advance by n (<= 32) bits without reading a value. Entry invariant
    off < 32 means off + 32 - 32 < 32 after at most ONE roll."""
    pos, widx, w = st
    pos = pos + n.astype(I32)
    roll = (pos - (widx << 5)) >= 32
    w = tuple(jnp.where(roll, w[k + 1], w[k]) for k in range(len(w) - 1)) \
        + (w[-1],)
    return (pos, widx + roll.astype(I32), w)


def refill_top(words, st, lim, S: int):
    """End-of-iteration refill: refetch the top S window slots."""
    pos, widx, w = st
    K = len(w)
    w = list(w)
    for s in range(S):
        k = K - S + s
        w[k] = _fetch(words, widx + k, lim)
    return (pos, widx, tuple(w))


def group_view(words, G: int):
    """(N, W) -> (N, ceil(W/G), G) zero-padded group view for the staged
    refill (built once per kernel call, outside the scan)."""
    N, W = words.shape
    Wg = -(-W // G)
    if Wg * G != W:
        words = jnp.concatenate(
            [words, jnp.zeros((N, Wg * G - W), words.dtype)], axis=1)
    return words.reshape(N, Wg, G)


def refill_top_staged(words_g, st, lim, S: int, G: int):
    """Staged refill: the top S window slots span at most two G-aligned
    word groups (S <= G + 1); extract both groups with ONE masked sweep
    each (2*N*W element reads total, vs S*N*W for per-slot one-hot),
    then place the S slots with cheap 2G-way register selects.

    On the profiled 4K bucket the per-slot refill was ~65% of kernel
    time and HBM-bound on re-reading the (N, W) stream arrays; this is
    the v4 bandwidth fix."""
    assert S <= G + 1
    pos, widx, w = st
    K = len(w)
    Wg = words_g.shape[1]
    base = widx + (K - S)            # absolute word of slot K-S
    g0 = base // G
    ar = jnp.arange(Wg, dtype=I32)[None, :]
    cand = []
    for gi in range(2):
        sel = (ar == (g0 + gi)[:, None]).astype(U32)
        # one masked reduce delivers the whole G-word group (the per-slot
        # where+sum form issued G separate reduce chains per group)
        grp = jnp.sum(sel[:, :, None] * words_g, axis=1, dtype=U32)
        cand.extend(grp[:, j] for j in range(G))
    off0 = base - g0 * G             # 0..G-1
    w = list(w)
    for s in range(S):
        idx_c = off0 + s             # < 2G
        v = cand[0]
        for i in range(1, 2 * G):
            v = jnp.where(idx_c == i, cand[i], v)
        v = jnp.where(base + s >= lim, jnp.uint32(0xFFFFFFFF), v)
        w[K - S + s] = v
    return (pos, widx, tuple(w))


def refill_top_gather(words, st, lim, S: int):
    """Gather-variant refill: one take_along_axis per refill instead of
    masked sweeps — wins iff the TPU lowers it to a real dynamic-gather
    (~13 ns/elt measured) rather than a select chain. Semantics parity
    with _fetch: beyond lim synthesizes 0xFF bytes, other out-of-range
    reads give 0."""
    pos, widx, w = st
    K = len(w)
    N, W = words.shape
    idx = widx[:, None] + (K - S) + jnp.arange(S, dtype=I32)[None, :]
    vals = jnp.take_along_axis(words, jnp.clip(idx, 0, W - 1), axis=1)
    vals = jnp.where(idx >= lim[:, None], jnp.uint32(0xFFFFFFFF),
                     jnp.where(idx >= W, jnp.uint32(0), vals))
    w = list(w)
    for s in range(S):
        w[K - S + s] = vals[:, s]
    return (pos, widx, tuple(w))


def _budget(C: int):
    """(K, S) for a per-iteration consumption budget of C bits."""
    S = (31 + C) // 32
    return S + 2, S


# v4 worst-case consumption rates. VLC and MEL windows are provisioned
# for a WHOLE quad row and refilled once per row (outside the inner
# duo-step scan): their refill sweeps cost 2*N*W each, so per-row
# refills cut the scan's HBM traffic ~8x at the price of a larger
# register window (a _drop shifts K registers, VPU-cheap). MagSgn keeps
# a per-step window: its per-row budget (8*clamp bits/quad) would need
# a 60+ word window, where register shifting overtakes the sweep cost.
_VLC_PAIR_C = 38  # per pair: 2 CxtVLC (7+7) + U-pair worst 24
_MEL_PAIR_C = 24  # per pair: 3 symbols x (1 + 5) bits worst


def _grp(S: int) -> int:
    """Staged-refill group size for S slots (S <= G + 1, pow2)."""
    g = 4
    while g + 1 < S:
        g *= 2
    return g


# ---------------------------------------------------------------------------
# MEL decoder, unconditional (jpeg2000htdec.c:462-495)
# ---------------------------------------------------------------------------


def _mel_sym(mst, active):
    """One MEL symbol for active lanes; registers only. The hit bit and
    the (up to 5-bit) run value come from ONE 6-bit peek + one combined
    drop, and the MSB-first run value is a closed-form 5-bit reverse —
    half the stream-window traffic of the two-read form."""
    st, k, run, one = mst
    fresh = active & (run == 0) & (one == 0)
    # MEL_E[k] = min(k//3, 3) + max(k-10, 0)  (closed form of the table)
    ev = jnp.minimum(k // 3, 3) + jnp.maximum(k - 10, 0)
    pk = _peek_only(st, 6).astype(I32)
    bit = pk & 1
    hit = fresh & (bit == 1)
    miss = fresh & (bit == 0)
    mv = (pk >> 1) & ((jnp.int32(1) << ev) - 1)
    st = _drop(st, jnp.where(miss, 1 + ev, jnp.where(fresh, 1, 0)), fresh)
    # MSB-first run value: bit-reverse the LSB-first bits within ev
    r5 = (((mv & 1) << 4) | ((mv & 2) << 2) | (mv & 4)
          | ((mv >> 2) & 2) | ((mv >> 4) & 1))
    mrun = r5 >> (5 - ev)
    run = jnp.where(hit, jnp.int32(1) << ev, jnp.where(miss, mrun, run))
    k = jnp.where(hit, jnp.minimum(12, k + 1),
                  jnp.where(miss, jnp.maximum(0, k - 1), k))
    one = jnp.where(miss, 1, jnp.where(hit, 0, one))
    in_run = active & (run > 0)
    sym = jnp.where(active, jnp.where(in_run, 0, 1), 0)
    run = jnp.where(in_run, run - 1, run)
    one = jnp.where(active & ~in_run, 0, one)
    return sym, (st, k, run, one)


# ---------------------------------------------------------------------------
# CxtVLC lookup: factorized one-hot (32-block MXU matmul + 32-way reduce)
# ---------------------------------------------------------------------------


def _cxtvlc(code, context, tbl_split, ar32=None):
    idx = (context << 7) | code.astype(I32)
    hi = idx >> 5
    lo = idx & 31
    ar = (jnp.asarray(_AR32) if ar32 is None else ar32)[None, :]
    if "cxt_i8" in _VARIANTS and isinstance(tbl_split, np.ndarray):
        # int8 MXU path: ~4x the per-cycle MACs of the f32 form
        tbl_i8 = _CXT0_I8 if tbl_split is _CXT0_NP else _CXT1_I8
        ohh = (hi[:, None] == ar).astype(jnp.int8)
        rows64 = jax.lax.dot_general(
            ohh, jnp.asarray(tbl_i8), (((1,), (0,)), ((), ())),
            preferred_element_type=I32) + 128
        r = rows64.reshape(-1, 2, 32)
        for bit in (4, 3, 2, 1, 0):
            half = r.shape[2] // 2
            take = (((lo >> bit) & 1) == 1)[:, None, None]
            r = jnp.where(take, r[:, :, half:], r[:, :, :half])
        return r[:, 0, 0] + (r[:, 1, 0] << 8)
    ohh = (hi[:, None] == ar).astype(jnp.float32)
    rows64 = ohh @ jnp.asarray(tbl_split)          # (N, 64) both bytes
    # column pick by a 5-level binary select tree over both byte planes
    # at once (62 column-ops vs ~256 for the masked-reduce pick)
    r = rows64.reshape(-1, 2, 32)
    for bit in (4, 3, 2, 1, 0):
        half = r.shape[2] // 2
        take = (((lo >> bit) & 1) == 1)[:, None, None]
        r = jnp.where(take, r[:, :, half:], r[:, :, :half])
    packed = r[:, 0, 0] + 256.0 * r[:, 1, 0]
    return packed.astype(I32)


def _sig_emb_pair(mst, vst, tbl_f32, c1, c2_fn, a1v, a2v, ar32=None,
                  cxt=None):
    """MEL-gated CxtVLC decode (jpeg2000htdec.c:510-531) for BOTH quads
    of a pair from ONE 32-bit peek (two codewords total <= 14 bits) and
    ONE combined drop — quad 2's context comes from quad 1's sig pattern
    via c2_fn. Each single-quad form cost a full VLC window roll.

    cxt overrides the CxtVLC lookup (the Pallas kernel passes a 2-D
    select-tree form; Mosaic rejects the (N, 2, 32) reshape here)."""
    pk = _peek32(vst)
    lookup = cxt if cxt is not None else _cxtvlc

    def one(code, context, active, mst):
        melled = active & (context == 0)
        sym, mst = _mel_sym(mst, melled)
        read = active & ((context != 0) | (sym == 1))
        packed = lookup(code, context, tbl_f32, ar32)
        ln = jnp.where(read, (packed & 0xF) >> 1, 0)
        res = jnp.where(read, packed & 1, 0)
        sp = jnp.where(read, (packed >> 4) & 0xF, 0)
        ek = jnp.where(read, (packed >> 8) & 0xF, 0)
        e1 = jnp.where(read, (packed >> 12) & 0xF, 0)
        return (res, sp, ek, e1), ln, mst

    q1, ln1, mst = one(pk & jnp.uint32(0x7F), c1, a1v, mst)
    c2 = c2_fn(q1[1])
    q2, ln2, mst = one((pk >> ln1.astype(U32)) & jnp.uint32(0x7F), c2,
                       a2v, mst)
    ln = ln1 + ln2
    vst = _drop(vst, ln, ln > 0)
    return q1, q2, c2, mst, vst


# ---------------------------------------------------------------------------
# quad-pair U coding (closed-form U-VLC, jpeg2000htdec.c:338-388) with
# merged masked read schedules. Per lane, the masked subsequence of
# reads preserves that lane's stream order, so one fixed schedule serves
# every branch of jpeg2000htdec.c:666-712/828-854.
#
# A whole pair's U fields total <= 25 bits (3+3+1+5+5+4+4), so ONE
# 32-bit peek serves every field via cascaded variable-offset extracts,
# followed by ONE combined drop — instead of six window reads each
# rolling the (large) VLC register window.
# ---------------------------------------------------------------------------


def _uf_prefix(pk, off, active):
    """U-VLC prefix from peeked bits at variable offset (no consume)."""
    b = (pk >> off.astype(U32)).astype(I32) & 7
    val = jnp.where(b & 1, 1, jnp.where(b & 2, 2, jnp.where(b == 4, 3, 5)))
    ln = jnp.where(b & 1, 1, jnp.where(b & 2, 2, 3))
    return (jnp.where(active, val, 0),
            off + jnp.where(active, ln, 0))


def _uf_suffix(pk, off, prefix, active):
    is3 = active & (prefix == 3)
    is5 = active & (prefix > 3)
    b = (pk >> off.astype(U32)).astype(I32)
    val = jnp.where(is3, b & 1, jnp.where(is5, b & 31, 0))
    return val, off + jnp.where(is3, 1, jnp.where(is5, 5, 0))


def _uf_ext(pk, off, suffix, active):
    has = active & (suffix >= 28)
    val = jnp.where(has, (pk >> off.astype(U32)).astype(I32) & 15, 0)
    return val, off + jnp.where(has, 4, 0)


def _u_pair_initial(mst, vst, r1, r2, a1, a2):
    both = a1 & a2 & (r1 == 1) & (r2 == 1)
    only1 = a1 & (r1 == 1) & ~(a2 & (r2 == 1))
    only2 = a2 & (r2 == 1) & (r1 == 0)
    only = only1 | only2

    sym, mst = _mel_sym(mst, both)
    mel1 = both & (sym == 1)
    mel0 = both & (sym == 0)

    pk = _peek32(vst)
    off = jnp.zeros(r1.shape, I32)
    p0, off = _uf_prefix(pk, off, both | only)
    big = mel0 & (p0 > 2)
    small = mel0 & (p0 <= 2)
    p1, off = _uf_prefix(pk, off, mel1 | small)
    bit = jnp.where(big, (pk >> off.astype(U32)).astype(I32) & 1, 0)
    off = off + big.astype(I32)
    s0, off = _uf_suffix(pk, off, p0, both | only)
    s1, off = _uf_suffix(pk, off, p1, mel1 | small)
    e0, off = _uf_ext(pk, off, s0, both | only)
    e1, off = _uf_ext(pk, off, s1, mel1 | small)
    vst = _drop(vst, off, off > 0)

    ua = p0 + s0 + 4 * e0
    ub = p1 + s1 + 4 * e1
    u1 = jnp.where(both, ua + 2 * mel1, jnp.where(only1, ua, 0))
    u2 = jnp.where(mel1, ub + 2,
                   jnp.where(big, bit + 1,
                             jnp.where(small, ub,
                                       jnp.where(only2, ua, 0))))
    return u1, u2, mst, vst


def _u_pair_noninit(vst, r1, r2, a1, a2):
    both = a1 & a2 & (r1 == 1) & (r2 == 1)
    only1 = a1 & (r1 == 1) & ~(a2 & (r2 == 1))
    only2 = a2 & (r2 == 1) & (r1 == 0)
    only = only1 | only2

    pk = _peek32(vst)
    off = jnp.zeros(r1.shape, I32)
    p0, off = _uf_prefix(pk, off, both | only)
    p1, off = _uf_prefix(pk, off, both)
    s0, off = _uf_suffix(pk, off, p0, both | only)
    s1, off = _uf_suffix(pk, off, p1, both)
    e0, off = _uf_ext(pk, off, s0, both | only)
    e1, off = _uf_ext(pk, off, s1, both)
    vst = _drop(vst, off, off > 0)

    ua = p0 + s0 + (e0 << 2)
    ub = p1 + s1 + (e1 << 2)
    u1 = jnp.where(both | only1, ua, 0)
    u2 = jnp.where(both, ub, jnp.where(only2, ua, 0))
    return u1, u2, vst


# ---------------------------------------------------------------------------
# MagSgn recovery (jpeg2000htdec.c:395-427), in-scan, register window
# ---------------------------------------------------------------------------


def _bitlen32(v):
    """bitlen for v < 2**26 (MagSgn values: <= 25 payload bits + known-1
    MSB) via the f32 exponent field, split in two 12/14-bit pieces so
    each int->f32 conversion is exact (a single-piece conversion would
    round 25-bit values across power-of-two boundaries). ~half the VPU
    ops of the 5-step binary ladder this replaces."""
    v = v.astype(U32)
    # both pieces are < 2**14, so converting through i32 is exact; the
    # i32 route also lowers under Mosaic (u32->f32 does not)
    lo = jax.lax.bitcast_convert_type(
        v & jnp.uint32(0xFFF), I32).astype(jnp.float32)
    hi = jax.lax.bitcast_convert_type(v >> 12, I32).astype(jnp.float32)
    bl_lo = (jax.lax.bitcast_convert_type(lo, I32) >> 23) - 126
    bl_hi = (jax.lax.bitcast_convert_type(hi, I32) >> 23) - 126 + 12
    # a zero piece bitcasts to exponent 0 -> large negative; max() with
    # the other piece and 0 discards it
    return jnp.maximum(jnp.maximum(bl_lo, bl_hi), 0)


def _recover4(msst, U, sp, ek, e1, pLSB, active, clamp: int):
    """Returns (mus list of 4 (N,) registers in corner order, es (N, 4)
    stacked exponents, msst). mus stay unstacked so the scan bodies can
    emit them in raster-row order (see the ys layout note in
    _cleanup_impl).

    For clamp <= 16 two samples' fields fit one 32-bit peek, so the quad
    costs two peeks + two combined drops instead of four window reads
    (each a full MS-window register roll)."""
    mus, es = [], []

    def sample(v, do, m):
        known1 = ((e1 >> sample.i) & 1).astype(U32)
        v = v + (known1 << m.astype(U32))
        e_n = _bitlen32(v | jnp.uint32(1))
        val = (((v >> 1) + 1) << pLSB.astype(U32)) \
            | (jnp.uint32(1) << (pLSB.astype(U32) - 1)) \
            | ((v & 1) << 31)
        mus.append(jnp.where(do, val, jnp.uint32(0)))
        es.append(jnp.where(do, e_n, 0))

    if clamp <= 16:
        for half in range(2):
            pk = _peek32(msst)
            off = jnp.zeros(U.shape, I32)
            for i in (2 * half, 2 * half + 1):
                sample.i = i
                sig = (sp >> i) & 1
                m = jnp.minimum(sig * U - ((ek >> i) & 1), clamp)
                do = active & (m > 0)
                mm = jnp.where(do, m, 0)
                v = (pk >> off.astype(U32)) \
                    & ((jnp.uint32(1) << mm.astype(U32)) - 1)
                off = off + mm
                sample(v, do, mm)
            msst = _drop32(msst, off)
    else:
        for i in range(4):
            sample.i = i
            sig = (sp >> i) & 1
            m = jnp.minimum(sig * U - ((ek >> i) & 1), clamp)
            do = active & (m > 0)
            mm = jnp.where(do, m, 0)
            v, msst = _read(msst, mm, do)
            sample(v, do, mm)
    return mus, jnp.stack(es, axis=1), msst


def _mu_rows(quads):
    """Stack 4 quads' corner registers as [top8 | bot8] rows (N, 16).

    Corner i of a quad has dy = i & 1, dx = i >> 1, so the even raster
    row is corners (0, 2) of each quad left-to-right and the odd row is
    corners (1, 3). Stacking registers here (inside the scan body) is
    VPU-free compared to transposing the (N, qh, qw, 2, 2) quad tensor
    after the fact, whose 2-element innermost dim defeats XLA tiling
    (profiled at ~4 ms/4K-frame on the bench TPU). The ys stay 2-D
    (N, 16) — 3-D per-step ys sent the XLA CPU backend's compile time
    from ~60 s to 15+ min even at qw=8 (TPU was fine); the top/bot
    halves are sliced apart after the scan instead."""
    top = jnp.stack([q[i] for q in quads for i in (0, 2)], axis=1)
    bot = jnp.stack([q[i] for q in quads for i in (1, 3)], axis=1)
    return jnp.concatenate([top, bot], axis=1)


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------


def _cleanup_impl(msw, melw, vlcw, pLSB, maxbp, ms_lim, mel_lim,
                  qw: int, qh: int, ms_class: int, dims=None,
                  unroll: int = 1, consts=None):
    """Decode N codeblocks' cleanup segments in lockstep (v2).

    msw/melw/vlcw: uint32 (N, W) dense bit streams (ht_batch.prepare_streams
    layout). qw/qh: static quad-grid dims (one bucket = one shape).
    ms_class: static bound on every lane's maxbp in this bucket (<= 25).

    dims (v3, optional): (qws, qhs) int32 (N,) per-lane quad-grid dims
    <= (qw, qh). Lanes then decode only their own quads — quads at
    column >= qws or row >= qhs consume NO stream bits (exactly like the
    static a2 edge masking), so codeblocks of different shapes share one
    bucket. A lane with qws == 0 is inert (emits zeros, reads nothing).

    Returns (mu, sig, ok): mu uint32 (N, 2*qh, 2*qw) RASTER layout (the
    scan emits row pairs directly via _mu_rows, so no post-hoc quad
    transpose exists), sig int32 (N, qh, qw) 4-bit significance patterns
    per quad (needed by the refinement kernel: sigma can be set where mu
    stays 0 when m_n == 0, jpeg2000htdec.c:415-426), ok (N,) bool.
    """
    N = msw.shape[0]
    clamp = min(ms_class, 25)
    MS_K, MS_S = _budget(2 * 8 * clamp)
    MS_G = 8 if MS_S <= 9 else 16
    P = -(-qw // 2)
    P2 = -(-P // 2)
    # Row-level VLC/MEL budgets: the whole row's worst-case consumption
    # lives in registers, refilled once per row (see constants above).
    VLC_K, VLC_S = _budget(P * _VLC_PAIR_C)
    MEL_K, MEL_S = _budget(P * _MEL_PAIR_C)
    VLC_G = _grp(VLC_S)
    MEL_G = _grp(MEL_S)

    ones = jnp.ones((N,), bool)
    zeros = jnp.zeros((N,), I32)
    pLSB = jnp.asarray(pLSB, I32)
    maxbp = jnp.asarray(maxbp, I32)
    if dims is not None:
        qws = jnp.asarray(dims[0], I32)
        qhs = jnp.asarray(dims[1], I32)

    vst, vlim = st_init(vlcw, VLC_K)
    mw, mlim = st_init(melw, MEL_K, mel_lim)
    mst = (mw, zeros, zeros, zeros)
    msst, mslim = st_init(msw, MS_K, ms_lim)
    vlc_g = group_view(vlcw, VLC_G)
    mel_g = group_view(melw, MEL_G)
    ms_g = group_view(msw, MS_G)

    if consts is None:
        tbl0, tbl1 = _CXT0_NP, _CXT1_NP
        ar32 = None
        a1_pairs = jnp.asarray(
            np.array([2 * p < qw for p in range(2 * P2)]).reshape(P2, 2))
        a2_pairs = jnp.asarray(
            np.array([2 * p + 1 < qw
                      for p in range(2 * P2)]).reshape(P2, 2))
    else:
        # Pallas path: constant tables arrive as kernel inputs (Mosaic
        # forbids closure-captured constants); masks arrive as int
        tbl0, tbl1, ar32, a1_pairs, a2_pairs = consts
        a1_pairs = a1_pairs.astype(bool)
        a2_pairs = a2_pairs.astype(bool)
    pair_idx = jnp.arange(2 * P2, dtype=I32).reshape(P2, 2)

    def pair_masks(a1, a2, p, rowact):
        """Per-lane (quad1 active, quad2 active) for pair index p."""
        if dims is None:
            a1v = a1 & (ones if rowact is None else rowact)
            a2v = a2 & (ones if rowact is None else rowact)
            return a1v, a2v
        a1v = a1 & ((2 * p) < qws)
        a2v = a2 & ((2 * p + 1) < qws)
        if rowact is not None:
            a1v = a1v & rowact
            a2v = a2v & rowact
        return a1v, a2v

    use_gather = "refill_gather" in _VARIANTS

    def refill_ms(msst):
        if use_gather:
            return refill_top_gather(msw, msst, mslim, MS_S)
        return refill_top_staged(ms_g, msst, mslim, MS_S, MS_G)

    def refill_row(vst, mst):
        """Once-per-row VLC+MEL refill (outside the inner duo scan)."""
        mwin, mk, mrun, mone = mst
        if use_gather:
            vst = refill_top_gather(vlcw, vst, vlim, VLC_S)
            mwin = refill_top_gather(melw, mwin, mlim, MEL_S)
        else:
            vst = refill_top_staged(vlc_g, vst, vlim, VLC_S, VLC_G)
            mwin = refill_top_staged(mel_g, mwin, mlim, MEL_S, MEL_G)
        return vst, (mwin, mk, mrun, mone)

    def ctx_first(sp):
        """Initial-row running context from a quad's sig pattern
        (jpeg2000htdec.c:648-650): (s0|s1) + (s2<<1) + (s3<<2)."""
        return ((sp | (sp >> 1)) & 1) + (((sp >> 2) & 1) << 1) \
            + (((sp >> 3) & 1) << 2)

    def gamma_of(sp):
        pc = (sp & 1) + ((sp >> 1) & 1) + ((sp >> 2) & 1) + ((sp >> 3) & 1)
        return (pc > 1).astype(I32)

    # ---- initial quad row: scan over pair-DUOS, context carried ----
    row0act = None if dims is None else (qhs > 0)

    def row0_pair(st, context, a1v, a2v):
        vst, mst, msst, ok = st
        ((r1, sp1, ek1, e11), (r2, sp2, ek2, e12), c2, mst,
         vst) = _sig_emb_pair(mst, vst, tbl0, context, ctx_first, a1v,
                              a2v, ar32)
        context = jnp.where(a2v, ctx_first(sp2),
                            jnp.where(a1v, c2, context))
        u1, u2, mst, vst = _u_pair_initial(mst, vst, r1, r2, a1v, a2v)
        U1 = 1 + u1
        U2 = jnp.where(a2v, 1 + u2, 0)
        ok = ok & (~a1v | (U1 <= maxbp)) & (~a2v | (U2 <= maxbp))
        mu1, ev1, msst = _recover4(msst, U1, sp1, ek1, e11, pLSB, a1v,
                                   clamp)
        mu2, ev2, msst = _recover4(msst, U2, sp2, ek2, e12, pLSB, a2v,
                                   clamp)
        return ((vst, mst, msst, ok), context,
                [mu1, mu2], [ev1, ev2], [sp1, sp2])

    def row0_body(carry, xs):
        a1d, a2d, pd = xs
        vst, mst, msst, ok, context = carry
        st = (vst, mst, msst, ok)
        mus, evs, sps = [], [], []
        for i in range(2):
            a1v, a2v = pair_masks(a1d[i], a2d[i], pd[i], row0act)
            st, context, mu_i, ev_i, sp_i = row0_pair(st, context, a1v,
                                                      a2v)
            mus += mu_i
            evs += ev_i
            sps += sp_i
        vst, mst, msst, ok = st
        msst = refill_ms(msst)
        ys = (_mu_rows(mus),
              jnp.concatenate(evs, axis=1),
              jnp.stack(sps, axis=1))
        return (vst, mst, msst, ok, context), ys

    def split_mu_rows(muk):
        """(P2, N, 16) per-step [top8|bot8] ys -> (N, 4*qw) [top|bot].

        Stays 2-D: the row pair is interleaved once at the end (or in
        the qh == 1 epilogue) — scan ys above rank 2 stall the XLA CPU
        backend's compiler (see _mu_rows)."""
        top = jnp.transpose(muk[:, :, :8], (1, 0, 2)).reshape(
            N, 8 * P2)[:, :2 * qw]
        bot = jnp.transpose(muk[:, :, 8:], (1, 0, 2)).reshape(
            N, 8 * P2)[:, :2 * qw]
        return jnp.concatenate([top, bot], axis=1)

    carry0 = (vst, mst, msst, ones, zeros)
    carry0, (mu0, e0, sp0) = jax.lax.scan(row0_body, carry0,
                                          (a1_pairs, a2_pairs, pair_idx),
                                          unroll=unroll)
    vst, mst, msst, ok, _ = carry0
    mu_row0 = split_mu_rows(mu0)
    e_prev = jnp.transpose(e0, (1, 0, 2)).reshape(N, 16 * P2)[:, :4 * qw]
    sp_prev = jnp.transpose(sp0, (1, 0, 2)).reshape(N, 4 * P2)[:, :qw]

    if qh == 1:
        mu = mu_row0.reshape(N, 2, 2 * qw)
        return mu, sp_prev[:, None, :], ok

    # ---- non-initial rows: outer scan over rows, inner over pair-duos ----
    def row_above_inputs(sp_prev, e_prev):
        """Vectorized ctx-above / kappa-max precompute for one row
        (jpeg2000htdec.c:784-919 neighborhoods; all row-above terms).

        sp_prev (N, qw) 4-bit patterns, e_prev (N, 4*qw) exponents.
        cA[q] = (sigma_N|sigma_NW) | ((sigma_NE|sigma_NF) << 2); the W
        term (bit 1) is added in-scan from the carried left quad."""
        sN = (sp_prev >> 1) & 1
        sNE = (sp_prev >> 3) & 1
        z = jnp.zeros((N, 1), I32)
        sNW = jnp.concatenate([z, sNE[:, :-1]], axis=1)     # prev quad s3
        sNF = jnp.concatenate([sN[:, 1:], z], axis=1)       # next quad s1
        cA = (sN | sNW) | ((sNE | sNF) << 2)
        eN = e_prev[:, 1::4]
        eNE = e_prev[:, 3::4]
        eNW = jnp.concatenate([z, eNE[:, :-1]], axis=1)
        eNF = jnp.concatenate([eN[:, 1:], z], axis=1)
        kmax = jnp.maximum(jnp.maximum(eNW, eN), jnp.maximum(eNE, eNF))
        return cA, kmax

    def pad_quads(a):
        """(N, qw) per-quad inputs -> (P2, N, 4) scanned xs."""
        if a.shape[1] < 4 * P2:
            a = jnp.concatenate(
                [a, jnp.zeros((N, 4 * P2 - a.shape[1]), a.dtype)], axis=1)
        return jnp.transpose(a.reshape(N, P2, 4), (1, 0, 2))

    def rowk_pair(st, wprev, cA2, kmax2, a1v, a2v):
        vst, mst, msst, ok = st
        c1 = cA2[:, 0] | (wprev << 1)
        ((r1, sp1, ek1, e11), (r2, sp2, ek2, e12), _c2, mst,
         vst) = _sig_emb_pair(
            mst, vst, tbl1, c1,
            lambda sp: cA2[:, 1] | ((((sp >> 2) | (sp >> 3)) & 1) << 1),
            a1v, a2v, ar32)
        u1, u2, vst = _u_pair_noninit(vst, r1, r2, a1v, a2v)
        U1 = jnp.maximum(1, gamma_of(sp1) * (kmax2[:, 0] - 1)) + u1
        U2 = jnp.where(
            a2v, jnp.maximum(1, gamma_of(sp2) * (kmax2[:, 1] - 1)) + u2, 0)
        ok = ok & (~a1v | (U1 <= maxbp)) & (~a2v | (U2 <= maxbp))
        mu1, ev1, msst = _recover4(msst, U1, sp1, ek1, e11, pLSB, a1v,
                                   clamp)
        mu2, ev2, msst = _recover4(msst, U2, sp2, ek2, e12, pLSB, a2v,
                                   clamp)
        wnext = jnp.where(a2v, ((sp2 >> 2) | (sp2 >> 3)) & 1,
                          jnp.where(a1v, ((sp1 >> 2) | (sp1 >> 3)) & 1,
                                    wprev))
        return ((vst, mst, msst, ok), wnext,
                [mu1, mu2], [ev1, ev2], [sp1, sp2])

    def rowk_body(carry, xs):
        vst, mst, msst, ok, wprev, rowact = carry
        cA4, km4, a1d, a2d, pd = xs
        st = (vst, mst, msst, ok)
        mus, evs, sps = [], [], []
        for i in range(2):
            a1v, a2v = pair_masks(a1d[i], a2d[i], pd[i], rowact)
            st, wprev, mu_i, ev_i, sp_i = rowk_pair(
                st, wprev, cA4[:, 2 * i:2 * i + 2],
                km4[:, 2 * i:2 * i + 2], a1v, a2v)
            mus += mu_i
            evs += ev_i
            sps += sp_i
        vst, mst, msst, ok = st
        msst = refill_ms(msst)
        ys = (_mu_rows(mus),
              jnp.concatenate(evs, axis=1),
              jnp.stack(sps, axis=1))
        return (vst, mst, msst, ok, wprev, rowact), ys

    def row_body(carry, row):
        vst, mst, msst, ok, sp_prev, e_prev = carry
        vst, mst = refill_row(vst, mst)
        rowact = ones if dims is None else (row < qhs)
        cA, kmax = row_above_inputs(sp_prev, e_prev)
        xs = (pad_quads(cA), pad_quads(kmax), a1_pairs, a2_pairs,
              pair_idx)
        inner = (vst, mst, msst, ok, zeros, rowact)
        inner, (muk, ek_, spk) = jax.lax.scan(rowk_body, inner, xs,
                                              unroll=unroll)
        vst, mst, msst, ok, _, _ = inner
        mu_row = split_mu_rows(muk)
        e_row = jnp.transpose(ek_, (1, 0, 2)).reshape(
            N, 16 * P2)[:, :4 * qw]
        sp_row = jnp.transpose(spk, (1, 0, 2)).reshape(
            N, 4 * P2)[:, :qw]
        return (vst, mst, msst, ok, sp_row, e_row), (mu_row, sp_row)

    carry = (vst, mst, msst, ok, sp_prev, e_prev)
    carry, (mu_rows, sp_rows) = jax.lax.scan(row_body, carry,
                                             jnp.arange(1, qh, dtype=I32))
    ok = carry[3]
    mu = jnp.concatenate([mu_row0[None], mu_rows], axis=0)  # (qh, N, 4qw)
    sp = jnp.concatenate([sp_prev[None], sp_rows], axis=0)   # (qh, N, qw)
    # (qh, N, [top|bot]) -> (N, 2*qh, 2*qw): one interleave at the end
    mu = jnp.transpose(mu, (1, 0, 2)).reshape(N, qh, 2, 2 * qw) \
        .reshape(N, 2 * qh, 2 * qw)
    return (mu, jnp.transpose(sp, (1, 0, 2)), ok)


@functools.partial(jax.jit, static_argnames=("qw", "qh", "ms_class"))
def decode_cleanup_scan(msw, melw, vlcw, pLSB, maxbp, ms_lim, mel_lim,
                        qw: int, qh: int, ms_class: int):
    """Cleanup-only front-end: (mu, ok). XLA dead-code-eliminates the sig
    collection, so this compiles to the same program as before."""
    mu, _sig, ok = _cleanup_impl(msw, melw, vlcw, pLSB, maxbp,
                                 ms_lim, mel_lim, qw, qh, ms_class)
    return mu, ok


@functools.partial(jax.jit, static_argnames=("qw", "qh", "ms_class"))
def decode_cleanup_scan_sig(msw, melw, vlcw, pLSB, maxbp, ms_lim, mel_lim,
                            qw: int, qh: int, ms_class: int):
    """Cleanup front-end keeping sig patterns: (mu, sig, ok) — feeds the
    SigProp/MagRef refinement kernel (ops/ht_refine.py)."""
    return _cleanup_impl(msw, melw, vlcw, pLSB, maxbp, ms_lim, mel_lim,
                         qw, qh, ms_class)


@functools.partial(jax.jit, static_argnames=("qw", "qh", "ms_class"))
def decode_cleanup_scan_dims(msw, melw, vlcw, pLSB, maxbp, ms_lim, mel_lim,
                             qws, qhs, qw: int, qh: int, ms_class: int):
    """v3 merged-bucket front-end: per-lane quad-grid dims (qws, qhs)
    let codeblocks of different shapes share one launch. Returns
    (mu, sig, ok); lanes emit zeros beyond their own dims."""
    return _cleanup_impl(msw, melw, vlcw, pLSB, maxbp, ms_lim, mel_lim,
                         qw, qh, ms_class, dims=(qws, qhs))


@functools.partial(jax.jit,
                   static_argnames=("qw", "qh", "ms_class", "lanes"))
def decode_cleanup_scan_dims_2d(msw, melw, vlcw, pLSB, maxbp, ms_lim,
                                mel_lim, qws, qhs, qw: int, qh: int,
                                ms_class: int, lanes: int = 128):
    """decode_cleanup_scan_dims with the lane axis folded 2-D.

    XLA lays a rank-1 (N,) operand out along the 128-wide lane minor
    only, so every elementwise op in the scan body runs on 1 of the
    VPU's 8 sublanes. Folding N -> (N/lanes, lanes) before tracing
    makes every carried register a (rows, 128) tile that fills all 8
    sublanes — same op count, up to 8x the per-op element throughput.
    The fold is jax.vmap over the row axis of the UNCHANGED
    _cleanup_impl, so the decode math (and its bit-exactness pins) are
    structurally shared, not re-derived.

    Pad lanes are inert exactly like the Pallas wrapper's: qws == 0
    decodes nothing, reads nothing, and ok stays true (maxbp pad = 1
    covers the row-0 U1 = 1 of a fully-masked lane)."""
    N = msw.shape[0]
    npad = (-N) % lanes

    def fold(a, fill=0):
        a = jnp.asarray(a)
        if npad:
            pad = [(0, npad)] + [(0, 0)] * (a.ndim - 1)
            a = jnp.pad(a, pad, constant_values=fill)
        return a.reshape(-1, lanes, *a.shape[1:])

    def inner(msw, melw, vlcw, pLSB, maxbp, ms_lim, mel_lim, qws, qhs):
        return _cleanup_impl(msw, melw, vlcw, pLSB, maxbp, ms_lim,
                             mel_lim, qw, qh, ms_class, dims=(qws, qhs))

    mu, sig, ok = jax.vmap(inner)(
        fold(msw), fold(melw), fold(vlcw), fold(pLSB, 1), fold(maxbp, 1),
        fold(ms_lim), fold(mel_lim), fold(qws), fold(qhs))
    Np = N + npad
    return (mu.reshape(Np, 2 * qh, 2 * qw)[:N],
            sig.reshape(Np, qh, qw)[:N], ok.reshape(Np)[:N])


# ---------------------------------------------------------------------------
# host-side views / test front-ends
# ---------------------------------------------------------------------------


def decode_cleanup_bucket(data, lcup, pcup, pLSB, maxbp, qw, qh):
    """Byte-row front-end for tests: prepares streams on host (numpy),
    runs the scan kernel, rasterizes on host. Returns ((N, 2qh, 2qw), ok)."""
    from ffmpeg_ht_tpu.ops.ht_batch import prepare_streams_batch, \
        stream_limits

    data_np = np.asarray(data)
    lc = np.asarray(lcup)
    pc = np.asarray(pcup)
    msw, melw, vlcw = prepare_streams_batch(data_np, lc, pc)
    ms_lim, mel_lim = stream_limits(data_np, lc, pc)
    ms_class = int(min(int(np.max(maxbp)), 25))
    mu, ok = decode_cleanup_scan(
        jnp.asarray(msw), jnp.asarray(melw), jnp.asarray(vlcw),
        jnp.asarray(pLSB), jnp.asarray(maxbp),
        jnp.asarray(ms_lim), jnp.asarray(mel_lim),
        qw=int(qw), qh=int(qh), ms_class=ms_class)
    return np.asarray(mu), ok
