"""Batched HT cleanup decoder — the TPU entropy kernel (SURVEY.md K1).

TPU-first formulation: the bit-serial HT cleanup scan (ht_dec.py scalar
oracle; jpeg2000htdec.c:548-1014) is re-cast as a *lockstep vector program*
over N codeblocks: every per-codeblock scalar of the reference (bit-stream
cursors, MEL state, quad context) becomes an (N,)-lane vector, and the
data-dependent control flow becomes masked lane updates. Codeblocks are
bucketed by (quad_width, quad_height) so every per-quad array index is a
*shared traced scalar* — the inner loop contains no gathers except the
(N,)-wide table lookups (CxtVLC, MEL exponent) and per-lane byte loads.

Within a codeblock the scan is sequential (same dependency structure as
the reference); throughput comes from the N-lane width: one 4K frame
yields thousands of codeblocks per bucket, which XLA maps onto the VPU's
8x128 lanes.

Everything is uint32/int32 — no x64 dependency — and jit-compiles once per
(qw, qh, Lmax) bucket shape.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ffmpeg_ht_tpu.ops import tables as tb

I32 = jnp.int32
U32 = jnp.uint32

# numpy table constants; jnp.asarray at use sites embeds them as trace
# constants (a module-level jnp cache would leak tracers out of fori_loop)
_CXTVLC_NP = tb.CXTVLC_PACKED.astype(np.int32)          # (2, 1024)
_MEL_E_NP = tb.MEL_E.astype(np.int32)                   # (13,)
_UVLC_VAL_NP = tb.UVLC_PREFIX_VALUE.astype(np.int32)
_UVLC_DROP_NP = tb.UVLC_PREFIX_DROP.astype(np.int32)


def _tables():
    return (jnp.asarray(_CXTVLC_NP), jnp.asarray(_MEL_E_NP),
            jnp.asarray(_UVLC_VAL_NP), jnp.asarray(_UVLC_DROP_NP))


# ---------------------------------------------------------------------------
# lockstep bit readers. State is a dict of (N,) arrays; every operation
# takes an `active` lane mask and leaves inactive lanes untouched.
# ---------------------------------------------------------------------------

def _byte_at(data, pos):
    """data[lane, clamp(pos)] with 0 for out-of-range positions."""
    n = data.shape[1]
    safe = jnp.clip(pos, 0, n - 1)
    b = jnp.take_along_axis(data, safe[:, None], axis=1)[:, 0].astype(I32)
    return jnp.where((pos >= 0) & (pos < n), b, 0)


# --- VLC: backward, LSB-first, per-byte unstuffing (ht_dec._RevBits) ---

def vlc_init(data, lcup, pcup):
    """Cursor starts at byte lcup-2 (modDcup already applied on host)."""
    st = {
        "pos": lcup - 2,
        "prev": jnp.full(lcup.shape, 0xFF, I32),  # byte at lcup-1 (modDcup)
        "buf": jnp.zeros(lcup.shape, U32),
        "bits": jnp.zeros(lcup.shape, I32),
    }
    st = _vlc_refill(data, st, jnp.ones(lcup.shape, bool))
    st = vlc_drop(st, jnp.full(lcup.shape, 4, I32),
                  jnp.ones(lcup.shape, bool))
    return st


def _vlc_refill_byte(data, st, want):
    b = _byte_at(data, st["pos"])
    stuffed = (st["prev"] > 0x8F) & ((b & 0x7F) == 0x7F)
    payload = jnp.where(stuffed, b & 0x7F, b).astype(U32)
    nbits = jnp.where(stuffed, 7, 8)
    do = want & (st["bits"] < 16)
    buf = jnp.where(do, st["buf"] | (payload << st["bits"].astype(U32)),
                    st["buf"])
    bits = jnp.where(do, st["bits"] + nbits, st["bits"])
    pos = jnp.where(do, st["pos"] - 1, st["pos"])
    prev = jnp.where(do, b, st["prev"])
    return {"pos": pos, "prev": prev, "buf": buf, "bits": bits}


def _vlc_refill(data, st, active):
    # two masked byte loads guarantee bits >= 16 for any following read
    st = _vlc_refill_byte(data, st, active)
    st = _vlc_refill_byte(data, st, active)
    st = _vlc_refill_byte(data, st, active)
    return st


def vlc_peek(st, n):
    return (st["buf"] & ((jnp.uint32(1) << n) - 1)).astype(I32)


def vlc_drop(st, n, active):
    n = jnp.where(active, n, 0).astype(U32)
    return {**st, "buf": st["buf"] >> n,
            "bits": st["bits"] - n.astype(I32)}


def vlc_get(data, st, n, active):
    """Read n (per-lane) bits LSB-first; n <= 12."""
    st = _vlc_refill(data, st, active)
    mask = (jnp.uint32(1) << n.astype(U32)) - 1
    val = (st["buf"] & mask).astype(I32)
    st = vlc_drop(st, n, active)
    return jnp.where(active, val, 0), st


# --- MagSgn: forward, LSB-first, 0xFF->7bit (ht_dec._FwdBits) ---

def ms_init(data, pcup):
    st = {
        "pos": jnp.zeros(pcup.shape, I32),
        "last": jnp.zeros(pcup.shape, I32),
        "buf": jnp.zeros(pcup.shape, U32),
        "bits": jnp.zeros(pcup.shape, I32),
        "end": pcup,
    }
    return _ms_refill(data, st, jnp.ones(pcup.shape, bool))


def _ms_refill_byte(data, st, want):
    inside = st["pos"] < st["end"]
    b = jnp.where(inside, _byte_at(data, st["pos"]), 0xFF)
    nbits = jnp.where(st["last"] == 0xFF, 7, 8)
    do = want & (st["bits"] < 25)
    # OR the full byte; a byte following 0xFF has MSB 0 in valid streams so
    # the 1-bit overlap is harmless (parity: jpeg2000htdec.c:207-221)
    buf = jnp.where(do, st["buf"] | (b.astype(U32) << st["bits"].astype(U32)),
                    st["buf"])
    bits = jnp.where(do, st["bits"] + nbits, st["bits"])
    pos = jnp.where(do & inside, st["pos"] + 1, st["pos"])
    last = jnp.where(do, b, st["last"])
    return {**st, "pos": pos, "last": last, "buf": buf, "bits": bits}


def _ms_refill(data, st, active):
    for _ in range(4):
        st = _ms_refill_byte(data, st, active)
    return st


def ms_get(data, st, n, active):
    """Read n (per-lane, <= 25) bits LSB-first."""
    st = _ms_refill(data, st, active)
    nn = n.astype(U32)
    mask = (jnp.uint32(1) << nn) - 1
    val = st["buf"] & mask
    do = active & (n > 0)
    nn = jnp.where(do, nn, 0)
    st = {**st, "buf": st["buf"] >> nn, "bits": st["bits"] - nn.astype(I32)}
    return jnp.where(do, val, 0).astype(U32), st


# --- MEL (ht_dec._MelState) ---

def mel_init(pcup, lcup):
    z = jnp.zeros(pcup.shape, I32)
    return {"k": z, "run": z, "one": z, "pos": pcup, "tmp": z, "bits": z,
            "end": lcup}


def _mel_import_bit(data, st, want):
    cond = st["pos"] < st["end"]
    safe = jnp.minimum(st["pos"], st["end"] - 1)
    b = _byte_at(data, safe)
    need = want & (st["bits"] == 0)
    newbits = jnp.where(st["tmp"] == 0xFF, 7, 8)
    bits = jnp.where(need, newbits, st["bits"])
    tmp = jnp.where(need, jnp.where(cond, b, 0xFF), st["tmp"])
    pos = jnp.where(need & cond, st["pos"] + 1, st["pos"])
    bits = jnp.where(want, bits - 1, bits)
    bit = jnp.where(want, (tmp >> bits) & 1, 0)
    return bit, {**st, "pos": pos, "tmp": tmp, "bits": bits}


def mel_sym(data, st, active):
    """One MEL symbol for active lanes (jpeg2000htdec.c:462-495)."""
    _, mel_e, _, _ = _tables()
    fresh = active & (st["run"] == 0) & (st["one"] == 0)
    eval_ = mel_e[jnp.clip(st["k"], 0, 12)]
    bit, st = _mel_import_bit(data, st, fresh)
    hit = fresh & (bit == 1)
    miss = fresh & (bit == 0)
    run = jnp.where(hit, jnp.int32(1) << eval_, st["run"])
    k = jnp.where(hit, jnp.minimum(12, st["k"] + 1), st["k"])
    # miss path: read eval_ bits MSB-first into run
    mrun = jnp.zeros_like(run)
    for i in range(7):  # eval_ <= 7
        take = miss & (i < eval_)
        b2, st = _mel_import_bit(data, st, take)
        mrun = jnp.where(take, 2 * mrun + b2, mrun)
    run = jnp.where(miss, mrun, run)
    k = jnp.where(miss, jnp.maximum(0, st["k"] - 1), k)
    one = jnp.where(miss, 1, jnp.where(hit, 0, st["one"]))

    in_run = active & (run > 0)
    sym = jnp.where(in_run, 0, 1)
    run = jnp.where(in_run, run - 1, run)
    one = jnp.where(active & ~in_run, 0, one)
    st = {**st, "k": k, "run": run, "one": one}
    return jnp.where(active, sym, 0), st


# ---------------------------------------------------------------------------
# U-VLC (ht_dec._u_prefix/_u_suffix/_u_extension, lockstep)
# ---------------------------------------------------------------------------

def _u_prefix(data, vlc, active):
    _, _, uval, udrop = _tables()
    vlc = _vlc_refill(data, vlc, active)
    bits3 = vlc_peek(vlc, 3)
    val = uval[bits3]
    vlc = vlc_drop(vlc, udrop[bits3], active)
    return jnp.where(active, val, 0), vlc


def _u_suffix(data, vlc, prefix, active):
    has = active & (prefix >= 3)
    vlc = _vlc_refill(data, vlc, has)
    bits5 = vlc_peek(vlc, 5)
    is3 = has & (prefix == 3)
    is5 = has & (prefix > 3)
    val = jnp.where(is3, bits5 & 1, jnp.where(is5, bits5 & 31, 0))
    vlc = vlc_drop(vlc, jnp.where(is3, 1, jnp.where(is5, 5, 0)), active)
    return val, vlc


def _u_extension(data, vlc, suffix, active):
    has = active & (suffix >= 28)
    n = jnp.where(has, 4, 0)
    val, vlc = vlc_get(data, vlc, n, active)
    return jnp.where(has, val, 0), vlc


def _u_full(data, vlc, active):
    """u = prefix + suffix + 4*extension for active lanes."""
    p, vlc = _u_prefix(data, vlc, active)
    s, vlc = _u_suffix(data, vlc, p, active)
    e, vlc = _u_extension(data, vlc, s, active)
    return jnp.where(active, p + s + 4 * e, 0), vlc


# ---------------------------------------------------------------------------
# quad decode pieces
# ---------------------------------------------------------------------------

def _ctx_vlc(data, vlc, tbl_idx, context, active):
    cxt, _, _, _ = _tables()
    vlc = _vlc_refill(data, vlc, active)
    code = vlc_peek(vlc, 7)
    packed = cxt[tbl_idx, code + (context << 7)]
    vlc = vlc_drop(vlc, (packed & 0xF) >> 1, active)
    res = jnp.where(active, packed & 1, 0)
    sp = jnp.where(active, (packed >> 4) & 0xF, 0)
    ek = jnp.where(active, (packed >> 8) & 0xF, 0)
    e1 = jnp.where(active, (packed >> 12) & 0xF, 0)
    return res, sp, ek, e1, vlc


def _sig_emb(data, mel, vlc, tbl_idx, context, active):
    """MEL-gated CxtVLC (jpeg2000htdec.c:510-531), lockstep."""
    melled = active & (context == 0)
    sym, mel = mel_sym(data, mel, melled)
    read_vlc = active & ((context != 0) | (sym == 1))
    res, sp, ek, e1, vlc = _ctx_vlc(data, vlc, tbl_idx, context, read_vlc)
    return res, sp, ek, e1, mel, vlc


def _recover(data, ms, q, U, sp, ek, e1, pLSB, E, mu, active):
    """MagSgn recovery for quad q (jpeg2000htdec.c:395-427), lockstep.

    E: (N, M) exponents; mu: (N, M) sample values. q is a shared scalar.
    """
    for i in range(4):
        sig = (sp >> i) & 1
        m_n = sig * U - ((ek >> i) & 1)
        # clamp keeps shifts defined on invalid streams (ok flag already
        # false there); valid streams satisfy m_n <= maxbp <= 25
        m_n = jnp.minimum(m_n, 25)
        known1 = ((e1 >> i) & 1).astype(U32)
        do = active & (m_n > 0)
        v, ms = ms_get(data, ms, jnp.where(do, m_n, 0), do)
        v = v + (known1 << jnp.where(do, m_n, 0).astype(U32))
        e_n = _bitlen32(v | jnp.uint32(1))  # 32 - clz(v | 1)
        val = (((v >> 1) + 1) << pLSB.astype(U32)) \
            | (jnp.uint32(1) << (pLSB.astype(U32) - 1)) \
            | ((v & 1) << 31)
        idx = 4 * q + i
        E = _set_col(E, idx, jnp.where(do, e_n, _get_col(E, idx)))
        mu = _set_col(mu, idx, jnp.where(do, val, _get_col(mu, idx)))
    return E, mu, ms


def _bitlen32(v):
    """bit_length of uint32 vector (branch-free)."""
    v = v.astype(U32)
    n = jnp.zeros(v.shape, I32)
    for shift in (16, 8, 4, 2, 1):
        big = v >= (jnp.uint32(1) << shift)
        n = n + jnp.where(big, shift, 0)
        v = jnp.where(big, v >> shift, v)
    return n + jnp.where(v > 0, 1, 0)


def _get_col(arr, idx):
    return jax.lax.dynamic_slice_in_dim(arr, idx, 1, axis=1)[:, 0]


def _set_col(arr, idx, val):
    return jax.lax.dynamic_update_slice_in_dim(arr, val[:, None], idx, axis=1)


# ---------------------------------------------------------------------------
# the full cleanup scan for one (qw, qh) bucket
# ---------------------------------------------------------------------------

def _quad_pair_u_initial(data, mel, vlc, r1, r2, active):
    """Initial-row joint u coding (jpeg2000htdec.c:666-712), lockstep."""
    both = active & (r1 == 1) & (r2 == 1)
    only1 = active & (r1 == 1) & (r2 == 0)
    only2 = active & (r1 == 0) & (r2 == 1)

    sym, mel = mel_sym(data, mel, both)
    mel1 = both & (sym == 1)
    mel0 = both & (sym == 0)

    # mel1: u_i = 2 + full uvlc pair (interleaved prefix/suffix/ext)
    p0a, vlc = _u_prefix(data, vlc, mel1)
    # mel0 path reads p0 first too — merge the first prefix read
    p0b, vlc = _u_prefix(data, vlc, mel0)
    p0 = jnp.where(mel1, p0a, p0b)

    big = mel0 & (p0 > 2)
    small = mel0 & (p0 <= 2)

    # second prefix: mel1 pair, or mel0-small pair
    p1, vlc = _u_prefix(data, vlc, mel1 | small)
    # big: 1 bit for u2
    bit, vlc = vlc_get(data, vlc, jnp.where(big, 1, 0), big)

    s0, vlc = _u_suffix(data, vlc, p0, mel1 | mel0)
    s1, vlc = _u_suffix(data, vlc, p1, mel1 | small)
    e0, vlc = _u_extension(data, vlc, s0, mel1 | mel0)
    e1x, vlc = _u_extension(data, vlc, s1, mel1 | small)

    u0_pair = jnp.where(mel1, 2 + p0 + s0 + 4 * e0, p0 + s0 + 4 * e0)
    u1_pair = jnp.where(mel1, 2 + p1 + s1 + 4 * e1x,
                        jnp.where(big, bit + 1, p1 + s1 + 4 * e1x))

    uo1, vlc = _u_full(data, vlc, only1)
    uo2, vlc = _u_full(data, vlc, only2)

    u1 = jnp.where(both, u0_pair, jnp.where(only1, uo1, 0))
    u2 = jnp.where(both, u1_pair, jnp.where(only2, uo2, 0))
    return u1, u2, mel, vlc


def _quad_pair_u_noninit(data, vlc, r1, r2, active):
    """Non-initial-row u pair (jpeg2000htdec.c:828-854), lockstep."""
    both = active & (r1 == 1) & (r2 == 1)
    only1 = active & (r1 == 1) & (r2 == 0)
    only2 = active & (r1 == 0) & (r2 == 1)
    p0, vlc = _u_prefix(data, vlc, both)
    p1, vlc = _u_prefix(data, vlc, both)
    s0, vlc = _u_suffix(data, vlc, p0, both)
    s1, vlc = _u_suffix(data, vlc, p1, both)
    e0, vlc = _u_extension(data, vlc, s0, both)
    e1x, vlc = _u_extension(data, vlc, s1, both)
    uo1, vlc = _u_full(data, vlc, only1)
    uo2, vlc = _u_full(data, vlc, only2)
    u1 = jnp.where(both, p0 + s0 + (e0 << 2), jnp.where(only1, uo1, 0))
    u2 = jnp.where(both, p1 + s1 + (e1x << 2), jnp.where(only2, uo2, 0))
    return u1, u2, vlc


NQ_MAX = 1024   # quad capacity: covers codeblocks up to 64x64 samples
HW_MAX = 64     # raster capacity per axis


@jax.jit
def decode_cleanup_bucket(data, lcup, pcup, pLSB, maxbp, qw, qh):
    """Decode N codeblocks' cleanup segments in lockstep.

    data: uint8 (N, Lmax), modDcup applied. qw/qh are *traced* scalars
    shared by every lane (all codeblocks in a bucket have one shape), so a
    single compiled executable — keyed only on (N, Lmax) — serves every
    codeblock geometry up to 64x64. Returns (mu, ok): mu uint32
    (N, HW_MAX, HW_MAX) sign-magnitude samples (crop to the real
    height/width on the host side), ok bool (N,) — False where a U bound
    was violated (invalid stream; host falls back / rejects).
    """
    N = data.shape[0]
    nq = NQ_MAX
    qw = jnp.asarray(qw, I32)
    qh = jnp.asarray(qh, I32)
    data = data.astype(jnp.uint8)
    ones = jnp.ones((N,), bool)

    mel = mel_init(pcup, lcup)
    vlc = vlc_init(data, lcup, pcup)
    ms = ms_init(data, pcup)

    sigma = jnp.zeros((N, 4 * nq + 8), I32)
    E = jnp.zeros((N, 4 * nq + 8), I32)
    mu = jnp.zeros((N, 4 * nq), U32)
    ok = ones

    def sp_to_sigma(sigma, q, sp):
        for i in range(4):
            sigma = _set_col(sigma, 4 * q + i, (sp >> i) & 1)
        return sigma

    def quad_ctx_first(sigma, q):
        s0 = _get_col(sigma, 4 * q)
        s1 = _get_col(sigma, 4 * q + 1)
        s2 = _get_col(sigma, 4 * q + 2)
        s3 = _get_col(sigma, 4 * q + 3)
        return (s0 | s1) + (s2 << 1) + (s3 << 2)

    # ---- initial row ----
    context = jnp.zeros((N,), I32)
    npairs = qw // 2
    state = (mel, vlc, ms, sigma, E, mu, ok, context)

    def row0_pair(pi, state):
        mel, vlc, ms, sigma, E, mu, ok, context = state
        q = 2 * pi
        r1, sp1, ek1, e11, mel, vlc = _sig_emb(data, mel, vlc, 0, context,
                                               ones)
        sigma = sp_to_sigma(sigma, q, sp1)
        context = quad_ctx_first(sigma, q)
        r2, sp2, ek2, e12, mel, vlc = _sig_emb(data, mel, vlc, 0, context,
                                               ones)
        sigma = sp_to_sigma(sigma, q + 1, sp2)
        context = quad_ctx_first(sigma, q + 1)
        u1, u2, mel, vlc = _quad_pair_u_initial(data, mel, vlc, r1, r2, ones)
        U1 = 1 + u1
        U2 = 1 + u2
        ok = ok & (U1 <= maxbp) & (U2 <= maxbp)
        E, mu, ms = _recover(data, ms, q, U1, sp1, ek1, e11, pLSB, E, mu,
                             ones)
        E, mu, ms = _recover(data, ms, q + 1, U2, sp2, ek2, e12, pLSB, E, mu,
                             ones)
        return (mel, vlc, ms, sigma, E, mu, ok, context)

    state = jax.lax.fori_loop(0, npairs, row0_pair, state)

    def row0_tail(state):
        mel, vlc, ms, sigma, E, mu, ok, context = state
        q = qw - 1
        r1, sp1, ek1, e11, mel, vlc = _sig_emb(data, mel, vlc, 0, context,
                                               ones)
        sigma = sp_to_sigma(sigma, q, sp1)
        u1, vlc = _u_full(data, vlc, r1 == 1)
        U1 = 1 + u1
        ok = ok & (U1 <= maxbp)
        E, mu, ms = _recover(data, ms, q, U1, sp1, ek1, e11, pLSB, E, mu,
                             ones)
        return (mel, vlc, ms, sigma, E, mu, ok, context)

    state = jax.lax.cond(qw % 2 == 1, row0_tail, lambda s: s, state)
    mel, vlc, ms, sigma, E, mu, ok, context = state

    # ---- non-initial rows ----
    # first/last-column specials become traced masks so the column scan is
    # a fori_loop (compile cost independent of the quad grid size)
    def ctx_above(sigma, q, first_col, last_col):
        c = _get_col(sigma, 4 * (q - qw) + 1)
        c = c | (_get_col(sigma, 4 * (q - qw) + 3) << 2)
        nw = _get_col(sigma, jnp.maximum(4 * (q - qw) - 1, 0))
        w_ = (_get_col(sigma, jnp.maximum(4 * q - 1, 0))
              | _get_col(sigma, jnp.maximum(4 * q - 2, 0)))
        c = jnp.where(first_col, c, (c | nw) + (w_ << 1))
        nf = _get_col(sigma, 4 * (q - qw) + 5)
        c = jnp.where(last_col, c, c | (nf << 2))
        return c

    def kappa_of(E, q, sp, first_col, last_col):
        # gamma = popcount(sp) > 1
        pc = (sp & 1) + ((sp >> 1) & 1) + ((sp >> 2) & 1) + ((sp >> 3) & 1)
        gamma = (pc > 1).astype(I32)
        e_n = _get_col(E, 4 * (q - qw) + 1)
        e_ne = _get_col(E, 4 * (q - qw) + 3)
        e_nw = jnp.where(first_col, 0,
                         _get_col(E, jnp.maximum(4 * (q - qw) - 1, 0)))
        e_nf = jnp.where(last_col, 0, _get_col(E, 4 * (q - qw) + 5))
        max_e = jnp.maximum(jnp.maximum(e_nw, e_n), jnp.maximum(e_ne, e_nf))
        return jnp.maximum(1, gamma * (max_e - 1))

    npairs_r = qw // 2

    def rowk_pair(args):
        row, pi, state = args
        mel, vlc, ms, sigma, E, mu, ok, context = state
        q1 = row * qw + 2 * pi
        q2 = q1 + 1
        first1 = pi == 0
        last2 = 2 * pi + 1 == qw - 1
        c1 = ctx_above(sigma, q1, first1, False)
        r1, sp1, ek1, e11, mel, vlc = _sig_emb(data, mel, vlc, 1, c1, ones)
        sigma = sp_to_sigma(sigma, q1, sp1)
        c2 = ctx_above(sigma, q2, False, last2)
        r2, sp2, ek2, e12, mel, vlc = _sig_emb(data, mel, vlc, 1, c2, ones)
        sigma = sp_to_sigma(sigma, q2, sp2)
        u1, u2, vlc = _quad_pair_u_noninit(data, vlc, r1, r2, ones)
        U1 = kappa_of(E, q1, sp1, first1, False) + u1
        U2 = kappa_of(E, q2, sp2, False, last2) + u2
        ok = ok & (U1 <= maxbp) & (U2 <= maxbp)
        E, mu, ms = _recover(data, ms, q1, U1, sp1, ek1, e11, pLSB,
                             E, mu, ones)
        E, mu, ms = _recover(data, ms, q2, U2, sp2, ek2, e12, pLSB,
                             E, mu, ones)
        return (mel, vlc, ms, sigma, E, mu, ok, context)

    def row_tail(row, state):
        mel, vlc, ms, sigma, E, mu, ok, context = state
        q1 = row * qw + qw - 1
        c1 = ctx_above(sigma, q1, qw == 1, True)
        r1, sp1, ek1, e11, mel, vlc = _sig_emb(data, mel, vlc, 1, c1,
                                               ones)
        sigma = sp_to_sigma(sigma, q1, sp1)
        u1, vlc = _u_full(data, vlc, r1 == 1)
        U1 = kappa_of(E, q1, sp1, qw == 1, True) + u1
        ok = ok & (U1 <= maxbp)
        E, mu, ms = _recover(data, ms, q1, U1, sp1, ek1, e11, pLSB,
                             E, mu, ones)
        return (mel, vlc, ms, sigma, E, mu, ok, context)

    def row_body(row, state):
        state = jax.lax.fori_loop(
            0, npairs_r,
            lambda pi, st: rowk_pair((row, pi, st)), state)
        state = jax.lax.cond(qw % 2 == 1,
                             lambda s: row_tail(row, s), lambda s: s, state)
        return state

    state = (mel, vlc, ms, sigma, E, mu, ok, context)
    state = jax.lax.fori_loop(1, qh, row_body, state)
    mel, vlc, ms, sigma, E, mu, ok, context = state

    # ---- quad grid -> raster (jpeg2000htdec.c:976-1007) ----
    # sample (y, x) comes from mu[4*((y//2)*qw + x//2) + ((x%2)<<1 | y%2)];
    # shared gather indices computed from the traced qw/qh
    yy = jnp.arange(HW_MAX, dtype=I32)[:, None]
    xx = jnp.arange(HW_MAX, dtype=I32)[None, :]
    qidx = (yy >> 1) * qw + (xx >> 1)
    part = ((xx & 1) << 1) | (yy & 1)
    valid = (yy < 2 * qh) & (xx < 2 * qw)
    src = jnp.where(valid, 4 * qidx + part, 0)
    raster = jnp.take(mu, src.reshape(-1), axis=1)
    raster = raster.reshape(N, HW_MAX, HW_MAX)
    raster = jnp.where(valid[None, :, :], raster, jnp.uint32(0))
    return raster, ok
