"""Pallas (Mosaic) formulation of the HT cleanup scan — the last lever
in ARCHITECTURE.md's entropy budget.

The XLA form (ops/ht_scan._cleanup_impl) re-materializes every carried
register through HBM-visible buffers at XLA's discretion; here the scan
runs inside ONE pallas_call with the stream words, register windows and
cross-row state VMEM-resident for a lane block's lifetime.

Structure (shaped by on-chip Mosaic probing, round 5):

  * grid = (lane_blocks, quad_rows). Mosaic iterates the last grid axis
    innermost and guarantees sequential execution, so scratch refs carry
    the cross-row decode state (stream windows, MEL state, row-above
    sigma/exponents) from row r to row r+1 of the same block; row 0
    re-initializes them. Row outputs leave through a (NB, 1, 2, 2*qw)
    block whose index map walks the row axis — Pallas double-buffers
    the output DMA against the next row's compute.
  * Every scalar and window word gets its OWN 1-D (NB,) scratch ref.
    The obvious alternative — one (NB, 16) state plane restored by
    column extracts — puts the r>0 branch's rank-1 values in a
    different vector layout than row 0's ref-loaded ones, and Mosaic
    crashes joining the two at the fori_loop boundary
    (VectorLayout::join `arr.size() >= layout_rank`, bisected on-chip
    round 5) or demands an unimplemented lane-broadcast relayout.
    1-D ref loads restore through the exact load path row 0 uses, so
    both branches live in one layout world.
  * No lax.scan anywhere: Mosaic rejects scans with extensive inputs or
    outputs (and carry-only scans entirely). The row loop is the grid;
    the per-row quad-pair loop is a carry-only lax.fori_loop over
    refill groups (2 pairs each) — a Python-unrolled pair loop
    compiles to an MLIR module the Mosaic backend cannot hold (the
    remote compile helper OOMs even at qw=16). Across the fori_loop
    boundary the u32 window words are boxed to (NB, 1) (_box_st) and
    the bool ok to i32: rank-1 u32 and i1 carries crash the layout
    join, rank-1 i32 scalars are fine, and boxing THOSE instead trips
    the lane-broadcast gap — exactly the word tuples get boxed.
    Row outputs accumulate in shift-register column buffers (static
    lane slicing only), landing each pair at its raster column by
    construction.
  * Refills are per-slot one-hot sweeps on i32-bitcast words (unsigned
    reductions and take_along_axis don't lower; the staged group sweep's
    middle-axis 3-D reduce crashes the compiler). Measured on chip the
    one-hot fetch is ~3 ns/slot — VMEM-resident streams make the refill
    leg that dominated the XLA form's budget essentially free.
  * The CxtVLC lookup keeps the one-hot MXU matmul but picks the column
    with a 2-D select tree (_cxtvlc2d); the XLA form's (N, 2, 32)
    reshape does not lower.
  * Row-above exponents are carried as per-quad corner planes (eN, eNE)
    instead of the XLA form's strided e_prev[:, 1::4] views (strided
    lane slices don't lower).

The decode MATH is ops/ht_scan's — the kernel body calls its helpers
(_sig_emb_pair, _u_pair_*, _recover4, _mel_sym, the window ops) on
values loaded from VMEM refs, so bit-exactness with the XLA form is
structural (pinned by tests/test_ht_scan_pallas.py in interpret mode).

Enabled by FFMPEG_HT_TPU_KERNEL_VARIANTS=pallas (models/assembly.py);
interpret mode off-TPU. Reference semantics: jpeg2000htdec.c:548-1014.

On-chip verdict (round 5, tools/pallas_onchip.py + pallas_bisect.py):
compiles under Mosaic and is BIT-EXACT vs the XLA kernel on a real
codestream, but is not competitive as formulated:

  * N=128/block=128 (the largest verified compile): 15.39 ms for 128
    lanes — ~60 µs per duo-step for ONE vreg of lanes where the XLA
    form spends ~82 µs for fifty. The per-word 1-D scratch refs force
    VMEM load/compute/store round-trips per op (~40x worse per issue).
  * N>~1k, block=128: blocked by a layout verification mismatch — XLA
    tiles 1-D s32[N] operands T(1024), Mosaic wants T(128) for a
    (128,)-blocked ref. (Fixable by stacking the six (N,) i32 operands
    into one (N, 8) plane so both sides use 2-D (8,128) tiling.)
  * block=1024 (the error message's suggestion): the remote
    tpu_compile_helper is OOM-killed compiling the 8x-wider body.

Making this lever pay requires restructuring the state into
(sublane, lane)-tiled 2-D refs so Mosaic keeps it in vector registers
across the row loop — blocked today by the VectorLayout::join crash
described above. Kept bit-exact-pinned for that future work.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

import numpy as np

from ffmpeg_ht_tpu.ops.ht_scan import (
    I32, U32, _NO_LIM, _CXT0_NP, _CXT1_NP, _MEL_PAIR_C, _VLC_PAIR_C,
    _budget, _recover4, _sig_emb_pair, _u_pair_initial, _u_pair_noninit,
    st_init)

_VMEM_BUDGET = 10 * 1024 * 1024     # leave headroom of the ~16 MB/core


def _pick_block(words_per_lane: int, qw: int) -> int:
    """Largest lane block whose VMEM working set fits. Mosaic pads the
    minor (lane) axis of every ref to 128, so each scratch/vector ref
    costs >= 512 B/lane regardless of its declared width."""
    refs = 10                        # windows, state, sp/eN/eNE, vecs
    bytes_per_lane = 8 * words_per_lane + 512 * refs + 32 * qw
    blk = 1024
    while blk > 8 and blk * bytes_per_lane > _VMEM_BUDGET:
        blk //= 2
    return blk


def _pick32(plane, lo):
    """Column pick from a (N, 32) plane by a 5-level binary select tree
    (the 2-D form of ht_scan._cxtvlc's pick; rank-3 doesn't lower)."""
    r = plane
    for bit in (4, 3, 2, 1, 0):
        half = r.shape[1] // 2
        # minor-dim insert on the i32, compare in 2-D: Mosaic only
        # reshapes 32-bit vectors, not i1 masks
        take = ((lo >> bit) & 1)[:, None] == 1
        r = jnp.where(take, r[:, half:], r[:, :half])
    return r[:, 0]


def _cxtvlc2d(code, context, tbl, ar32=None):
    """CxtVLC lookup: one-hot MXU row pick + 2-D select-tree column pick
    (same factorization and exactness argument as ht_scan._cxtvlc)."""
    idx = (context << 7) | code.astype(I32)
    hi = idx >> 5
    lo = idx & 31
    ar = jnp.arange(32, dtype=I32)[None, :]
    # bool -> i32 -> f32 (Mosaic lowers these; bool -> f32 may not)
    ohh = (hi[:, None] == ar).astype(I32).astype(jnp.float32)
    rows64 = ohh @ tbl                       # (N, 64) low|high byte
    packed = _pick32(rows64[:, :32], lo) \
        + 256.0 * _pick32(rows64[:, 32:], lo)
    return packed.astype(I32)


def _fetch_i(words_i, idx, lim):
    """ht_scan._fetch on i32-bitcast words (Mosaic can't reduce u32;
    the one-hot sum touches exactly one nonzero element so the i32
    accumulation is bit-exact)."""
    W = words_i.shape[1]
    ar = jnp.arange(W, dtype=I32)[None, :]
    sel = ar == idx[:, None]
    val = jnp.sum(jnp.where(sel, words_i, 0), axis=1, dtype=I32)
    return jnp.where(idx >= lim, jnp.uint32(0xFFFFFFFF),
                     jax.lax.bitcast_convert_type(val, U32))


def _refill(words_i, st, lim, S: int):
    """Refetch the top S window slots (value-idempotent for slots still
    in the valid prefix — ht_scan.refill_top semantics)."""
    pos, widx, w = st
    K = len(w)
    w = list(w)
    for s in range(S):
        k = K - S + s
        w[k] = _fetch_i(words_i, widx + k, lim)
    return (pos, widx, tuple(w))


def _box_st(st):
    """Box a stream-window state's u32 word registers to (NB, 1) for a
    fori_loop carry. Mosaic's layout inference crashes joining rank-1
    u32 carries at the loop boundary (VectorLayout::join,
    `arr.size() >= layout_rank` check), while rank-1 i32 scalars are
    fine and boxing THOSE hits an unimplemented lane-broadcast — so
    exactly the word tuples are boxed (bisected on-chip, round 5)."""
    pos, widx, w = st
    return (pos, widx, tuple(x[:, None] for x in w))


def _unbox_st(st):
    pos, widx, w = st
    return (pos, widx, tuple(x[:, 0] for x in w))


def _ctx_first(sp):
    """Initial-row running context (jpeg2000htdec.c:648-650)."""
    return ((sp | (sp >> 1)) & 1) + (((sp >> 2) & 1) << 1) \
        + (((sp >> 3) & 1) << 2)


def _gamma_of(sp):
    pc = (sp & 1) + ((sp >> 1) & 1) + ((sp >> 2) & 1) + ((sp >> 3) & 1)
    return (pc > 1).astype(I32)


@functools.partial(jax.jit,
                   static_argnames=("qw", "qh", "ms_class", "interpret",
                                    "block"))
def decode_cleanup_pallas(msw, melw, vlcw, pLSB, maxbp, ms_lim, mel_lim,
                          qws, qhs, qw: int, qh: int, ms_class: int,
                          interpret: bool = False, block: int = 0):
    """decode_cleanup_scan_dims contract, executed row-by-row inside one
    pallas_call per frame batch. Returns (mu, sig, ok) for N lanes."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = msw.shape[0]
    words = msw.shape[1] + melw.shape[1] + vlcw.shape[1]
    NB = block or _pick_block(words, qw)
    npad = (-N) % NB
    if npad:
        def padl(a, fill=0):
            pad = [(0, npad)] + [(0, 0)] * (a.ndim - 1)
            return jnp.pad(a, pad, constant_values=fill)
        # inert pad lanes: qws == 0 decodes nothing, reads nothing
        msw, melw, vlcw = padl(msw), padl(melw), padl(vlcw)
        pLSB, maxbp = padl(pLSB, 1), padl(maxbp, 1)
        ms_lim, mel_lim = padl(ms_lim), padl(mel_lim)
        qws, qhs = padl(qws), padl(qhs)
    Np = N + npad

    clamp = min(ms_class, 25)
    MS_K, MS_S = _budget(2 * 8 * clamp)
    P = -(-qw // 2)
    P2 = -(-P // 2)
    VLC_K, VLC_S = _budget(P * _VLC_PAIR_C)
    MEL_K, MEL_S = _budget(P * _MEL_PAIR_C)

    tbl0 = jnp.asarray(_CXT0_NP)
    tbl1 = jnp.asarray(_CXT1_NP)

    def kernel(msw_r, melw_r, vlcw_r, pLSB_r, maxbp_r, mslim_r,
               mellim_r, qws_r, qhs_r, tbl0_r, tbl1_r,
               mu_r, sig_r, ok_r, *scr):
        # scratch: one 1-D ref PER window word / scalar. A single 2-D
        # state plane restored by column extracts puts the r>0 branch's
        # rank-1 values in a different vector layout than row 0's
        # ref-loaded ones, and Mosaic crashes joining the two at the
        # fori_loop boundary (VectorLayout::join, bisected on-chip);
        # 1-D ref loads restore through the exact load path row 0 uses.
        vw_refs = scr[:VLC_K]
        mw_refs = scr[VLC_K:VLC_K + MEL_K]
        msw_refs = scr[VLC_K + MEL_K:VLC_K + MEL_K + MS_K]
        sc_refs = scr[VLC_K + MEL_K + MS_K:-3]
        sp_s, en_s, ene_s = scr[-3:]
        r = pl.program_id(1)
        msw_u = msw_r[...]
        melw_u = melw_r[...]
        vlcw_u = vlcw_r[...]
        msw_i = jax.lax.bitcast_convert_type(msw_u, I32)
        melw_i = jax.lax.bitcast_convert_type(melw_u, I32)
        vlcw_i = jax.lax.bitcast_convert_type(vlcw_u, I32)
        pLSB = pLSB_r[...]
        maxbp = maxbp_r[...]
        mslim = mslim_r[...]
        mellim = mellim_r[...]
        qws = qws_r[...]
        qhs = qhs_r[...]
        t0 = tbl0_r[...]
        t1 = tbl1_r[...]
        zeros = jnp.zeros((NB,), I32)
        vlim = jnp.full((NB,), _NO_LIM, I32)

        def save_state(vst, mst, msst, ok):
            mw, mk, mrun, mone = mst
            for k in range(VLC_K):
                vw_refs[k][...] = vst[2][k]
            for k in range(MEL_K):
                mw_refs[k][...] = mw[2][k]
            for k in range(MS_K):
                msw_refs[k][...] = msst[2][k]
            for ref, v in zip(sc_refs, (
                    vst[0], vst[1], mw[0], mw[1], msst[0], msst[1],
                    mk, mrun, mone, ok.astype(I32))):
                ref[...] = v

        def emit(sp_row, en_row, ene_row, top, bot, ok):
            mu_r[...] = jnp.stack([top, bot], axis=1)[:, None]
            sig_r[...] = sp_row[:, None, None, :]
            ok_r[...] = ok.astype(I32)[:, None]
            sp_s[...] = sp_row
            en_s[...] = en_row
            ene_s[...] = ene_row

        # The per-row pair loop is a lax.fori_loop over P2 refill
        # groups (2 pairs per group, matching the XLA form's refill
        # cadence) — a fully unrolled loop compiles to an MLIR module
        # the Mosaic backend cannot hold (the compile helper dies even
        # at qw=16). Row output columns are SHIFT REGISTERS: each group
        # appends its 8 samples / 4 quads on the right and the buffer
        # shifts left, so pair p lands at its raster column with static
        # slicing only (dynamic lane-dim indexing does not lower).
        W2 = 8 * P2           # top/bot shift width (8 samples/group)
        W1 = 4 * P2           # sp/en/ene shift width (4 quads/group)

        def _shift(buf, cols):
            w = sum(c.shape[1] for c in cols)
            if w >= buf.shape[1]:       # qw <= 4: nothing left to keep
                return jnp.concatenate(cols, axis=1) if len(cols) > 1 \
                    else cols[0]
            return jnp.concatenate([buf[:, w:]] + cols, axis=1)

        def _boxc(vst, mst, msst, ok):
            """fori_loop carry boxing (see _box_st): u32 windows ->
            (NB, 1); the bool ok -> i32 (i1 carries also crash)."""
            mw, mk, mrun, mone = mst
            return (_box_st(vst), (_box_st(mw), mk, mrun, mone),
                    _box_st(msst), ok.astype(I32))

        def _unboxc(vstb, mstb, msstb, oki):
            mwb, mk, mrun, mone = mstb
            return (_unbox_st(vstb), (_unbox_st(mwb), mk, mrun, mone),
                    _unbox_st(msstb), oki != 0)

        @pl.when(r == 0)
        def _row0():
            def refill_ms(msst):
                return _refill(msw_i, msst, mslim, MS_S)

            vst, _ = st_init(vlcw_u, VLC_K)
            mw, _ = st_init(melw_u, MEL_K, mellim)
            mst = (mw, zeros, zeros, zeros)
            msst, _ = st_init(msw_u, MS_K, mslim)
            ok = qws >= 0          # all-true
            rowact = qhs > 0

            def pair(p2, context, vst, mst, msst, ok):
                # p2 = 2*p for pair p; phantom pairs (2*p >= qw) are
                # inert through the a1v/a2v masks (consume nothing)
                a1v = rowact & (qws > p2)
                a2v = rowact & (qws > p2 + 1)
                ((r1, sp1, ek1, e11), (r2, sp2, ek2, e12), c2, mst,
                 vst) = _sig_emb_pair(mst, vst, t0, context,
                                      _ctx_first, a1v, a2v,
                                      cxt=_cxtvlc2d)
                context = jnp.where(a2v, _ctx_first(sp2),
                                    jnp.where(a1v, c2, context))
                u1, u2, mst, vst = _u_pair_initial(mst, vst, r1, r2,
                                                   a1v, a2v)
                U1 = 1 + u1
                U2 = jnp.where(a2v, 1 + u2, 0)
                ok = ok & (~a1v | (U1 <= maxbp)) \
                    & (~a2v | (U2 <= maxbp))
                mu1, ev1, msst = _recover4(msst, U1, sp1, ek1, e11,
                                           pLSB, a1v, clamp)
                mu2, ev2, msst = _recover4(msst, U2, sp2, ek2, e12,
                                           pLSB, a2v, clamp)
                t4 = jnp.stack([mu1[0], mu1[2], mu2[0], mu2[2]], axis=1)
                b4 = jnp.stack([mu1[1], mu1[3], mu2[1], mu2[3]], axis=1)
                s2 = jnp.stack([sp1, sp2], axis=1)
                n2 = jnp.stack([ev1[:, 1], ev2[:, 1]], axis=1)
                e2 = jnp.stack([ev1[:, 3], ev2[:, 3]], axis=1)
                return (context, vst, mst, msst, ok), (t4, b4, s2, n2,
                                                       e2)

            def body(d, carry):
                context, vstb, mstb, msstb, oki, bufs = carry
                vst, mst, msst, ok = _unboxc(vstb, mstb, msstb, oki)
                outs = []
                for j in (0, 1):
                    st, o = pair(4 * d + 2 * j, context, vst, mst,
                                 msst, ok)
                    context, vst, mst, msst, ok = st
                    outs.append(o)
                msst = refill_ms(msst)
                bufs = tuple(_shift(b, [o0, o1]) for b, o0, o1
                             in zip(bufs, outs[0], outs[1]))
                return (context,) + _boxc(vst, mst, msst, ok) + (bufs,)

            bufs = (jnp.zeros((NB, W2), U32), jnp.zeros((NB, W2), U32),
                    jnp.zeros((NB, W1), I32), jnp.zeros((NB, W1), I32),
                    jnp.zeros((NB, W1), I32))
            _ctx, vstb, mstb, msstb, oki, bufs = jax.lax.fori_loop(
                0, P2, body,
                (zeros,) + _boxc(vst, mst, msst, ok) + (bufs,))
            vst, mst, msst, ok = _unboxc(vstb, mstb, msstb, oki)
            top, bot, spr, enr, ener = bufs
            save_state(vst, mst, msst, ok)
            emit(spr[:, :qw], enr[:, :qw], ener[:, :qw],
                 top[:, :2 * qw], bot[:, :2 * qw], ok)

        if qh > 1:
            @pl.when(r > 0)
            def _rowk():
                sc = [ref[...] for ref in sc_refs]
                vst = (sc[0], sc[1],
                       tuple(vw_refs[k][...] for k in range(VLC_K)))
                mw = (sc[2], sc[3],
                      tuple(mw_refs[k][...] for k in range(MEL_K)))
                msst = (sc[4], sc[5],
                        tuple(msw_refs[k][...] for k in range(MS_K)))
                mst = (mw, sc[6], sc[7], sc[8])
                ok = sc[9] != 0

                def refill_ms(msst):
                    return _refill(msw_i, msst, mslim, MS_S)

                # once-per-row VLC/MEL refill (ht_scan.refill_row)
                vst = _refill(vlcw_i, vst, vlim, VLC_S)
                mst = (_refill(melw_i, mst[0], mellim, MEL_S),
                       mst[1], mst[2], mst[3])
                rowact = r < qhs
                # row-above context/exponent planes
                # (jpeg2000htdec.c:784-919; ht_scan.row_above_inputs)
                sp_prev = sp_s[...]
                eN = en_s[...]
                eNE = ene_s[...]
                z1 = jnp.zeros((NB, 1), I32)
                sN = (sp_prev >> 1) & 1
                sNE = (sp_prev >> 3) & 1
                sNW = jnp.concatenate([z1, sNE[:, :-1]], axis=1)
                sNF = jnp.concatenate([sN[:, 1:], z1], axis=1)
                cA = (sN | sNW) | ((sNE | sNF) << 2)
                eNW = jnp.concatenate([z1, eNE[:, :-1]], axis=1)
                eNF = jnp.concatenate([eN[:, 1:], z1], axis=1)
                kmax = jnp.maximum(jnp.maximum(eNW, eN),
                                   jnp.maximum(eNE, eNF))
                # shift-register reads: pad the row-above planes to the
                # group width; each group consumes its leading 4 columns
                padw = ((0, 0), (0, W1 - qw))
                cAr0 = jnp.pad(cA, padw)
                kmr0 = jnp.pad(kmax, padw)

                def pair(cq, wprev, vst, mst, msst, ok):
                    # cq = (cA col 2p, cA col 2p+1, km col 2p, 2p+1)
                    cA1b, cA2b, km1, km2, p2 = cq
                    a1v = rowact & (qws > p2)
                    a2v = rowact & (qws > p2 + 1)
                    c1 = cA1b | (wprev << 1)
                    ((r1, sp1, ek1, e11), (r2, sp2, ek2, e12), _c2,
                     mst, vst) = _sig_emb_pair(
                        mst, vst, t1, c1,
                        lambda sp: cA2b
                        | ((((sp >> 2) | (sp >> 3)) & 1) << 1),
                        a1v, a2v, cxt=_cxtvlc2d)
                    u1, u2, vst = _u_pair_noninit(vst, r1, r2, a1v, a2v)
                    U1 = jnp.maximum(
                        1, _gamma_of(sp1) * (km1 - 1)) + u1
                    U2 = jnp.where(a2v, jnp.maximum(
                        1, _gamma_of(sp2) * (km2 - 1)) + u2, 0)
                    ok = ok & (~a1v | (U1 <= maxbp)) \
                        & (~a2v | (U2 <= maxbp))
                    mu1, ev1, msst = _recover4(msst, U1, sp1, ek1, e11,
                                               pLSB, a1v, clamp)
                    mu2, ev2, msst = _recover4(msst, U2, sp2, ek2, e12,
                                               pLSB, a2v, clamp)
                    wprev = jnp.where(
                        a2v, ((sp2 >> 2) | (sp2 >> 3)) & 1,
                        jnp.where(a1v, ((sp1 >> 2) | (sp1 >> 3)) & 1,
                                  wprev))
                    t4 = jnp.stack([mu1[0], mu1[2], mu2[0], mu2[2]],
                                   axis=1)
                    b4 = jnp.stack([mu1[1], mu1[3], mu2[1], mu2[3]],
                                   axis=1)
                    s2 = jnp.stack([sp1, sp2], axis=1)
                    n2 = jnp.stack([ev1[:, 1], ev2[:, 1]], axis=1)
                    e2 = jnp.stack([ev1[:, 3], ev2[:, 3]], axis=1)
                    return (wprev, vst, mst, msst, ok), (t4, b4, s2,
                                                         n2, e2)

                def body(d, carry):
                    wprev, vstb, mstb, msstb, oki, cAr, kmr, bufs = carry
                    vst, mst, msst, ok = _unboxc(vstb, mstb, msstb, oki)
                    outs = []
                    for j in (0, 1):
                        cq = (cAr[:, 2 * j], cAr[:, 2 * j + 1],
                              kmr[:, 2 * j], kmr[:, 2 * j + 1],
                              4 * d + 2 * j)
                        st, o = pair(cq, wprev, vst, mst, msst, ok)
                        wprev, vst, mst, msst, ok = st
                        outs.append(o)
                    msst = refill_ms(msst)
                    z4 = jnp.zeros((NB, 4), I32)
                    cAr = _shift(cAr, [z4])
                    kmr = _shift(kmr, [z4])
                    bufs = tuple(_shift(b, [o0, o1]) for b, o0, o1
                                 in zip(bufs, outs[0], outs[1]))
                    return (wprev,) + _boxc(vst, mst, msst, ok) \
                        + (cAr, kmr, bufs)

                bufs = (jnp.zeros((NB, W2), U32),
                        jnp.zeros((NB, W2), U32),
                        jnp.zeros((NB, W1), I32),
                        jnp.zeros((NB, W1), I32),
                        jnp.zeros((NB, W1), I32))
                (_w, vstb, mstb, msstb, oki, _c, _k,
                 bufs) = jax.lax.fori_loop(
                    0, P2, body, (zeros,) + _boxc(vst, mst, msst, ok)
                    + (cAr0, kmr0, bufs))
                vst, mst, msst, ok = _unboxc(vstb, mstb, msstb, oki)
                top, bot, spr, enr, ener = bufs
                save_state(vst, mst, msst, ok)
                emit(spr[:, :qw], enr[:, :qw], ener[:, :qw],
                     top[:, :2 * qw], bot[:, :2 * qw], ok)

    def vec(_):
        return pl.BlockSpec((NB,), lambda i, r: (i,),
                            memory_space=pltpu.VMEM)

    def mat(a):
        return pl.BlockSpec((NB, a.shape[1]), lambda i, r: (i, 0),
                            memory_space=pltpu.VMEM)

    mu_p, sig_p, ok_p = pl.pallas_call(
        kernel,
        grid=(Np // NB, qh),
        in_specs=[mat(msw), mat(melw), mat(vlcw),
                  vec(0), vec(0), vec(0), vec(0), vec(0), vec(0),
                  pl.BlockSpec((32, 64), lambda i, r: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((32, 64), lambda i, r: (0, 0),
                               memory_space=pltpu.VMEM)],
        # Mosaic's tiling rule wants a block's last two dims divisible
        # by (8, 128) or equal to the array's; a (NB, 2, 2*qw) row
        # window over (Np, 2*qh, 2*qw) violates it, so the row axis is
        # its own blocked-at-1 dim and the trailing dims match the
        # array exactly (reshaped back after the call).
        out_specs=(
            pl.BlockSpec((NB, 1, 2, 2 * qw), lambda i, r: (i, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NB, 1, 1, qw), lambda i, r: (i, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NB, 1), lambda i, r: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Np, qh, 2, 2 * qw), jnp.uint32),
            jax.ShapeDtypeStruct((Np, qh, 1, qw), jnp.int32),
            jax.ShapeDtypeStruct((Np, 1), jnp.int32),
        ),
        scratch_shapes=(
            [pltpu.VMEM((NB,), U32)
             for _ in range(VLC_K + MEL_K + MS_K)]
            + [pltpu.VMEM((NB,), I32) for _ in range(10)]
            + [pltpu.VMEM((NB, qw), I32) for _ in range(3)]),
        interpret=interpret,
    )(msw, melw, vlcw, pLSB, maxbp, ms_lim, mel_lim, qws, qhs,
      tbl0, tbl1)
    mu = mu_p.reshape(Np, 2 * qh, 2 * qw)[:N]
    sig = sig_p.reshape(Np, qh, qw)[:N]
    return mu, sig, ok_p[:N, 0].astype(bool)
