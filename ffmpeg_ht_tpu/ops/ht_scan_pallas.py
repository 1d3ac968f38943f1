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
    re-initializes them. Row outputs leave through a (NB, 2, 2*qw)
    block whose index map walks the row axis — Pallas double-buffers
    the output DMA against the next row's compute.
  * No lax.scan anywhere: Mosaic rejects scans with extensive inputs or
    outputs (and carry-only scans entirely). The per-row quad-pair loop
    is Python-unrolled (its xs were static); the row loop is the grid.
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
        take = (((lo >> bit) & 1) == 1)[:, None]
        r = jnp.where(take, r[:, half:], r[:, :half])
    return r[:, 0]


def _cxtvlc2d(code, context, tbl, ar32=None):
    """CxtVLC lookup: one-hot MXU row pick + 2-D select-tree column pick
    (same factorization and exactness argument as ht_scan._cxtvlc)."""
    idx = (context << 7) | code.astype(I32)
    hi = idx >> 5
    lo = idx & 31
    ar = jnp.arange(32, dtype=I32)[None, :]
    ohh = (hi[:, None] == ar).astype(jnp.float32)
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
               mu_r, sig_r, ok_r,
               vw_s, mw_s, msw_s, st_s, sp_s, en_s, ene_s):
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
        false_v = jnp.zeros((NB,), bool)
        vlim = jnp.full((NB,), _NO_LIM, I32)

        def refill_ms(msst):
            return _refill(msw_i, msst, mslim, MS_S)

        def quad_cols(quads):
            """Per-quad (mus4, es, sp) lists -> row stores. Corner i of
            a quad is (dy = i & 1, dx = i >> 1): the even raster row is
            corners (0, 2) per quad, the odd row corners (1, 3)
            (ht_scan._mu_rows layout)."""
            top = jnp.stack([q[0][i] for q in quads for i in (0, 2)],
                            axis=1)
            bot = jnp.stack([q[0][i] for q in quads for i in (1, 3)],
                            axis=1)
            sp_row = jnp.stack([q[2] for q in quads], axis=1)
            en_row = jnp.stack([q[1][:, 1] for q in quads], axis=1)
            ene_row = jnp.stack([q[1][:, 3] for q in quads], axis=1)
            return top, bot, sp_row, en_row, ene_row

        def save_state(vst, mst, msst, ok):
            mw, mk, mrun, mone = mst
            vw_s[...] = jnp.stack(vst[2], axis=1)
            mw_s[...] = jnp.stack(mw[2], axis=1)
            msw_s[...] = jnp.stack(msst[2], axis=1)
            st_s[...] = jnp.stack(
                [vst[0], vst[1], mw[0], mw[1], msst[0], msst[1],
                 mk, mrun, mone, ok.astype(I32),
                 zeros, zeros, zeros, zeros, zeros, zeros], axis=1)

        def emit(quads, sp_row, en_row, ene_row, top, bot, ok):
            mu_r[...] = jnp.stack([top, bot], axis=1)
            sig_r[...] = sp_row[:, None, :]
            ok_r[...] = ok.astype(I32)
            sp_s[...] = sp_row
            en_s[...] = en_row
            ene_s[...] = ene_row

        @pl.when(r == 0)
        def _row0():
            vst, _ = st_init(vlcw_u, VLC_K)
            mw, _ = st_init(melw_u, MEL_K, mellim)
            mst = (mw, zeros, zeros, zeros)
            msst, _ = st_init(msw_u, MS_K, mslim)
            ok = qws >= 0          # all-true
            context = zeros
            rowact = qhs > 0
            quads = []
            for d in range(P2):
                for p in (2 * d, 2 * d + 1):
                    if p >= P:
                        continue
                    a1v = rowact & (qws > 2 * p)
                    a2v = (rowact & (qws > 2 * p + 1)) \
                        if 2 * p + 1 < qw else false_v
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
                    quads.append((mu1, ev1, sp1))
                    if 2 * p + 1 < qw:
                        mu2, ev2, msst = _recover4(msst, U2, sp2, ek2,
                                                   e12, pLSB, a2v, clamp)
                        quads.append((mu2, ev2, sp2))
                msst = refill_ms(msst)
            top, bot, sp_row, en_row, ene_row = quad_cols(quads)
            save_state(vst, mst, msst, ok)
            emit(quads, sp_row, en_row, ene_row, top, bot, ok)

        if qh > 1:
            @pl.when(r > 0)
            def _rowk():
                vw = vw_s[...]
                mww = mw_s[...]
                msww = msw_s[...]
                st = st_s[...]
                vst = (st[:, 0], st[:, 1],
                       tuple(vw[:, k] for k in range(VLC_K)))
                mw = (st[:, 2], st[:, 3],
                      tuple(mww[:, k] for k in range(MEL_K)))
                msst = (st[:, 4], st[:, 5],
                        tuple(msww[:, k] for k in range(MS_K)))
                mst = (mw, st[:, 6], st[:, 7], st[:, 8])
                ok = st[:, 9] != 0
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
                wprev = zeros
                quads = []
                for d in range(P2):
                    for p in (2 * d, 2 * d + 1):
                        if p >= P:
                            continue
                        a1v = rowact & (qws > 2 * p)
                        a2v = (rowact & (qws > 2 * p + 1)) \
                            if 2 * p + 1 < qw else false_v
                        c1 = cA[:, 2 * p] | (wprev << 1)
                        cA2b = cA[:, 2 * p + 1] if 2 * p + 1 < qw \
                            else zeros
                        ((r1, sp1, ek1, e11), (r2, sp2, ek2, e12), _c2,
                         mst, vst) = _sig_emb_pair(
                            mst, vst, t1, c1,
                            lambda sp: cA2b
                            | ((((sp >> 2) | (sp >> 3)) & 1) << 1),
                            a1v, a2v, cxt=_cxtvlc2d)
                        u1, u2, vst = _u_pair_noninit(vst, r1, r2, a1v,
                                                      a2v)
                        km1 = kmax[:, 2 * p]
                        km2 = kmax[:, 2 * p + 1] if 2 * p + 1 < qw \
                            else zeros
                        U1 = jnp.maximum(
                            1, _gamma_of(sp1) * (km1 - 1)) + u1
                        U2 = jnp.where(a2v, jnp.maximum(
                            1, _gamma_of(sp2) * (km2 - 1)) + u2, 0)
                        ok = ok & (~a1v | (U1 <= maxbp)) \
                            & (~a2v | (U2 <= maxbp))
                        mu1, ev1, msst = _recover4(msst, U1, sp1, ek1,
                                                   e11, pLSB, a1v, clamp)
                        quads.append((mu1, ev1, sp1))
                        if 2 * p + 1 < qw:
                            mu2, ev2, msst = _recover4(
                                msst, U2, sp2, ek2, e12, pLSB, a2v,
                                clamp)
                            quads.append((mu2, ev2, sp2))
                            wprev = jnp.where(
                                a2v, ((sp2 >> 2) | (sp2 >> 3)) & 1,
                                jnp.where(a1v,
                                          ((sp1 >> 2) | (sp1 >> 3)) & 1,
                                          wprev))
                        else:
                            wprev = jnp.where(
                                a1v, ((sp1 >> 2) | (sp1 >> 3)) & 1,
                                wprev)
                    msst = refill_ms(msst)
                top, bot, sp_row, en_row, ene_row = quad_cols(quads)
                save_state(vst, mst, msst, ok)
                emit(quads, sp_row, en_row, ene_row, top, bot, ok)

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
        out_specs=(
            pl.BlockSpec((NB, 2, 2 * qw), lambda i, r: (i, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NB, 1, qw), lambda i, r: (i, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NB,), lambda i, r: (i,),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Np, 2 * qh, 2 * qw), jnp.uint32),
            jax.ShapeDtypeStruct((Np, qh, qw), jnp.int32),
            jax.ShapeDtypeStruct((Np,), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((NB, VLC_K), U32),
            pltpu.VMEM((NB, MEL_K), U32),
            pltpu.VMEM((NB, MS_K), U32),
            pltpu.VMEM((NB, 16), I32),
            pltpu.VMEM((NB, qw), I32),
            pltpu.VMEM((NB, qw), I32),
            pltpu.VMEM((NB, qw), I32),
        ],
        interpret=interpret,
    )(msw, melw, vlcw, pLSB, maxbp, ms_lim, mel_lim, qws, qhs,
      tbl0, tbl1)
    return mu_p[:N], sig_p[:N], ok_p[:N].astype(bool)
