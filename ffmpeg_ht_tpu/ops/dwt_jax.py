"""Inverse DWT on TPU (JAX/XLA), bit-exact vs ops/dwt.py.

TPU-first formulation: each lifting sweep is a batched elementwise op over
whole line sets (rows, then columns via transpose) — pure VPU work that XLA
fuses; geometry (level sizes, parities) is static at trace time so the whole
multi-level transform unrolls into one fused program per (shape, levels)
key. Semantics parity: jpeg2000dwt.c:309-537 via ops/dwt.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ffmpeg_ht_tpu.ops.dwt import (DWT53, DWT97, DWT97_INT, I_LFTG_ALPHA_PRIME,
                                   I_LFTG_BETA, I_LFTG_DELTA, I_LFTG_GAMMA,
                                   I_LFTG_K, I_LFTG_X, I_PRESHIFT, dwt_levels)

F32 = jnp.float32
_PAD = 8

_F_DELTA = np.float32(0.443506852043971)
_F_GAMMA = np.float32(0.882911075530934)
_F_BETA = np.float32(0.052980118572961)
_F_ALPHA = np.float32(1.586134342059924)
_F_K = np.float32(1.230174104914001)
_F_X = np.float32(0.812893066115961)


def _interleave(rows: jnp.ndarray, lh: int, mh: int) -> jnp.ndarray:
    """L/H halves -> interleaved padded lines (see ops/dwt._interleave)."""
    n = rows.shape[0]
    nL = len(range(mh, lh, 2))
    nH = len(range(1 - mh, lh, 2))
    out = jnp.zeros((n, lh + 2 * _PAD + 2), dtype=rows.dtype)
    out = out.at[:, _PAD + 2 * mh:_PAD + 2 * mh + 2 * nL:2].set(rows[:, :nL])
    out = out.at[:, _PAD + 1:_PAD + 1 + 2 * nH:2].set(rows[:, nL:nL + nH])
    return out


def _extend(p: jnp.ndarray, i0: int, i1: int, reach: int) -> jnp.ndarray:
    b = _PAD
    if reach == 2:
        p = p.at[:, b + i0 - 1].set(p[:, b + i0 + 1])
        p = p.at[:, b + i1].set(p[:, b + i1 - 2])
        p = p.at[:, b + i0 - 2].set(p[:, b + i0 + 2])
        p = p.at[:, b + i1 + 1].set(p[:, b + i1 - 3])
    else:
        for i in range(1, 5):
            p = p.at[:, b + i0 - i].set(p[:, b + i0 + i])
            p = p.at[:, b + i1 + i - 1].set(p[:, b + i1 - i - 1])
    return p


def _sl(p: jnp.ndarray, lo: int, hi: int) -> jnp.ndarray:
    return jax.lax.slice_in_dim(p, _PAD + lo, _PAD + hi, 2, axis=1)


def _upd(p: jnp.ndarray, lo: int, hi: int, delta: jnp.ndarray, op) -> jnp.ndarray:
    cur = _sl(p, lo, hi)
    return p.at[:, _PAD + lo:_PAD + hi:2].set(op(cur, delta))


def _sr53(p: jnp.ndarray, i0: int, i1: int) -> jnp.ndarray:
    if i1 <= i0 + 1:
        if i0 == 1:
            p = p.at[:, _PAD + 1].set(p[:, _PAD + 1] >> 1)
        return p
    p = _extend(p, i0, i1, 2)
    a, b = i0 >> 1, (i1 >> 1) + 1
    d = (_sl(p, 2 * a - 1, 2 * b - 1) + _sl(p, 2 * a + 1, 2 * b + 1) + 2) >> 2
    p = _upd(p, 2 * a, 2 * b, d, lambda c, x: c - x)
    a, b = i0 >> 1, i1 >> 1
    d = (_sl(p, 2 * a, 2 * b) + _sl(p, 2 * a + 2, 2 * b + 2)) >> 1
    p = _upd(p, 2 * a + 1, 2 * b + 1, d, lambda c, x: c + x)
    return p


def _q16j(coef: int, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    s = x.astype(jnp.int64) + y.astype(jnp.int64)
    return ((coef * s + (1 << 15)) >> 16).astype(jnp.int32)


def _sr97i(p: jnp.ndarray, i0: int, i1: int) -> jnp.ndarray:
    if i1 <= i0 + 1:
        if i0 == 1:
            v = ((p[:, _PAD + 1].astype(jnp.int64) * I_LFTG_K + (1 << 16)) >> 17)
            p = p.at[:, _PAD + 1].set(v.astype(jnp.int32))
        else:
            v = ((p[:, _PAD + 0].astype(jnp.int64) * I_LFTG_X + (1 << 15)) >> 16)
            p = p.at[:, _PAD + 0].set(v.astype(jnp.int32))
        return p
    p = _extend(p, i0, i1, 4)
    a, b = (i0 >> 1) - 1, (i1 >> 1) + 2
    d = _q16j(I_LFTG_DELTA, _sl(p, 2 * a - 1, 2 * b - 1), _sl(p, 2 * a + 1, 2 * b + 1))
    p = _upd(p, 2 * a, 2 * b, d, lambda c, x: c - x)
    a, b = (i0 >> 1) - 1, (i1 >> 1) + 1
    d = _q16j(I_LFTG_GAMMA, _sl(p, 2 * a, 2 * b), _sl(p, 2 * a + 2, 2 * b + 2))
    p = _upd(p, 2 * a + 1, 2 * b + 1, d, lambda c, x: c - x)
    a, b = i0 >> 1, (i1 >> 1) + 1
    d = _q16j(I_LFTG_BETA, _sl(p, 2 * a - 1, 2 * b - 1), _sl(p, 2 * a + 1, 2 * b + 1))
    p = _upd(p, 2 * a, 2 * b, d, lambda c, x: c + x)
    a, b = i0 >> 1, i1 >> 1
    s = (_sl(p, 2 * a, 2 * b).astype(jnp.int64)
         + _sl(p, 2 * a + 2, 2 * b + 2).astype(jnp.int64))
    d = s.astype(jnp.int32) + ((I_LFTG_ALPHA_PRIME * s + (1 << 15)) >> 16).astype(jnp.int32)
    p = _upd(p, 2 * a + 1, 2 * b + 1, d, lambda c, x: c + x)
    return p


def _sr97f(p: jnp.ndarray, i0: int, i1: int) -> jnp.ndarray:
    if i1 <= i0 + 1:
        if i0 == 1:
            p = p.at[:, _PAD + 1].set(p[:, _PAD + 1] * (_F_K / np.float32(2)))
        else:
            p = p.at[:, _PAD + 0].set(p[:, _PAD + 0] * _F_X)
        return p
    p = _extend(p, i0, i1, 4)
    a, b = (i0 >> 1) - 1, (i1 >> 1) + 2
    d = _F_DELTA * (_sl(p, 2 * a - 1, 2 * b - 1) + _sl(p, 2 * a + 1, 2 * b + 1))
    p = _upd(p, 2 * a, 2 * b, d, lambda c, x: c - x)
    a, b = (i0 >> 1) - 1, (i1 >> 1) + 1
    d = _F_GAMMA * (_sl(p, 2 * a, 2 * b) + _sl(p, 2 * a + 2, 2 * b + 2))
    p = _upd(p, 2 * a + 1, 2 * b + 1, d, lambda c, x: c - x)
    a, b = i0 >> 1, (i1 >> 1) + 1
    d = _F_BETA * (_sl(p, 2 * a - 1, 2 * b - 1) + _sl(p, 2 * a + 1, 2 * b + 1))
    p = _upd(p, 2 * a, 2 * b, d, lambda c, x: c + x)
    a, b = i0 >> 1, i1 >> 1
    d = _F_ALPHA * (_sl(p, 2 * a, 2 * b) + _sl(p, 2 * a + 2, 2 * b + 2))
    p = _upd(p, 2 * a + 1, 2 * b + 1, d, lambda c, x: c + x)
    return p


_SR = {DWT53: _sr53, DWT97: _sr97f, DWT97_INT: _sr97i}


# ---------------------------------------------------------------------------
# polyphase lifting (v4 perf path)
#
# The interleaved-buffer formulation above costs ~20 plane traversals per
# level on TPU (stride-2 minor-dim scatters + two transposes). Lifting
# commutes with symmetric extension (each sweep is a symmetric function
# of the other parity, so the mirror invariant p[i0-k] = p[i0+k] /
# p[i1-1+k] = p[i1-1-k] is preserved by every sweep — the oracle's
# staged extend-then-sweep relies on exactly this). So each sweep can be
# computed on the SEPARATE L/H polyphase arrays with contiguous
# whole-array slices, boundary terms mirrored into the valid range, and
# the final interleave is a stack+reshape. The vertical pass runs the
# same sweeps along axis 0 — no transposes at all. Bit-exact vs
# ops/dwt.py (same op order and rounding); used for levels with both
# dims >= 8, tiny levels keep the reference formulation.
# ---------------------------------------------------------------------------


def _mcat(A, lo: int, hi: int, vlo: int, vhi: int, mlo, mhi, axis: int):
    """Values V[i], i in [lo, hi), where V[i] = A[i - vlo] along `axis`
    for valid i and out-of-range i reflect via the static index maps
    mlo/mhi. All bounds static."""
    parts = []
    for i in range(lo, min(hi, vlo)):
        j = mlo(i) - vlo
        parts.append(jax.lax.slice_in_dim(A, j, j + 1, axis=axis))
    mid_lo, mid_hi = max(lo, vlo), min(hi, vhi)
    if mid_hi > mid_lo:
        parts.append(jax.lax.slice_in_dim(A, mid_lo - vlo, mid_hi - vlo,
                                          axis=axis))
    for i in range(max(lo, vhi), hi):
        j = mhi(i) - vlo
        parts.append(jax.lax.slice_in_dim(A, j, j + 1, axis=axis))
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis)


def _mpad_pair(A, lo: int, hi: int, vlo: int, vhi: int, mlo, mhi,
               axis: int):
    """(V[i], V[i+1]) for i in [lo, hi): ONE mirror-padded array spanning
    [lo, hi+1) is materialized and the pair are two overlapping slices of
    it — the slices fuse into the consuming elementwise op, so each
    lifting sweep materializes one neighbor array instead of two."""
    pad = _mcat(A, lo, hi + 1, vlo, vhi, mlo, mhi, axis)
    n = hi - lo
    return (jax.lax.slice_in_dim(pad, 0, n, axis=axis),
            jax.lax.slice_in_dim(pad, 1, n + 1, axis=axis))


def _poly_ranges(i0: int, i1: int):
    """Valid polyphase index ranges and mirror maps for a line [i0, i1).
    E[i] = p[2i], O[i] = p[2i+1]."""
    # E valid indices: ceil(i0/2) .. (i1-1)//2 ; O valid: i0//2 .. (i1-2)//2
    e_lo, e_hi = (i0 + 1) // 2, (i1 - 1) // 2 + 1
    o_lo, o_hi = i0 // 2, (i1 - 2) // 2 + 1
    e_mlo = lambda i: i0 - i
    e_mhi = lambda i: i1 - 1 - i
    o_mlo = lambda i: i0 - i - 1
    o_mhi = lambda i: i1 - i - 2
    return (e_lo, e_hi, e_mlo, e_mhi), (o_lo, o_hi, o_mlo, o_mhi)


def _poly_sr53(E, O, i0: int, i1: int, axis: int):
    (e_lo, e_hi, e_mlo, e_mhi), (o_lo, o_hi, o_mlo, o_mhi) = \
        _poly_ranges(i0, i1)
    OL, OR = _mpad_pair(O, e_lo - 1, e_hi - 1, o_lo, o_hi, o_mlo, o_mhi,
                        axis)
    E = E - ((OL + OR + 2) >> 2)
    EL, ER = _mpad_pair(E, o_lo, o_hi, e_lo, e_hi, e_mlo, e_mhi, axis)
    O = O + ((EL + ER) >> 1)
    return E, O


def _poly_sr97i(E, O, i0: int, i1: int, axis: int):
    (e_lo, e_hi, e_mlo, e_mhi), (o_lo, o_hi, o_mlo, o_mhi) = \
        _poly_ranges(i0, i1)

    def pair_o(tlo, thi):
        return _mpad_pair(O, tlo - 1, thi - 1, o_lo, o_hi, o_mlo, o_mhi,
                          axis)

    def pair_e(tlo, thi):
        return _mpad_pair(E, tlo, thi, e_lo, e_hi, e_mlo, e_mhi, axis)

    a, b = pair_o(e_lo, e_hi)
    E = E - _q16j(I_LFTG_DELTA, a, b)
    a, b = pair_e(o_lo, o_hi)
    O = O - _q16j(I_LFTG_GAMMA, a, b)
    a, b = pair_o(e_lo, e_hi)
    E = E + _q16j(I_LFTG_BETA, a, b)
    a, b = pair_e(o_lo, o_hi)
    s = a.astype(jnp.int64) + b.astype(jnp.int64)
    d = s.astype(jnp.int32) + (
        (I_LFTG_ALPHA_PRIME * s + (1 << 15)) >> 16).astype(jnp.int32)
    O = O + d
    return E, O


def _poly_sr97f(E, O, i0: int, i1: int, axis: int):
    (e_lo, e_hi, e_mlo, e_mhi), (o_lo, o_hi, o_mlo, o_mhi) = \
        _poly_ranges(i0, i1)

    a, b = _mpad_pair(O, e_lo - 1, e_hi - 1, o_lo, o_hi, o_mlo, o_mhi,
                      axis)
    E = E - _F_DELTA * (a + b)
    a, b = _mpad_pair(E, o_lo, o_hi, e_lo, e_hi, e_mlo, e_mhi, axis)
    O = O - _F_GAMMA * (a + b)
    a, b = _mpad_pair(O, e_lo - 1, e_hi - 1, o_lo, o_hi, o_mlo, o_mhi,
                      axis)
    E = E + _F_BETA * (a + b)
    a, b = _mpad_pair(E, o_lo, o_hi, e_lo, e_hi, e_mlo, e_mhi, axis)
    O = O + _F_ALPHA * (a + b)
    return E, O


_POLY_SR = {DWT53: _poly_sr53, DWT97: _poly_sr97f, DWT97_INT: _poly_sr97i}


def _poly_interleave(E, O, i0: int, i1: int, axis: int):
    """Interleave polyphase arrays back to line order [i0, i1)."""
    nE = E.shape[axis]
    nO = O.shape[axis]
    first, second = (E, O) if (i0 & 1) == 0 else (O, E)
    nf, ns = (nE, nO) if (i0 & 1) == 0 else (nO, nE)
    if ns < nf:
        pad = jax.lax.slice_in_dim(second, 0, nf - ns, axis=axis)
        second = jnp.concatenate([second, pad], axis)
    x = jnp.stack([first, second], axis=axis + 1)
    shape = list(x.shape)
    shape[axis] = shape[axis] * shape[axis + 1]
    del shape[axis + 1]
    x = x.reshape(shape)
    if x.shape[axis] != i1 - i0:
        x = jax.lax.slice_in_dim(x, 0, i1 - i0, axis=axis)
    return x


def _poly_level(rows, lh: int, lv: int, mh: int, mv: int, sr_poly,
                hax: int = 1, vax: int = 0):
    """One level, both dims, polyphase. `rows` is the (..., lv, lh) level
    view with L|H halves along each axis; hax/vax allow a leading batch
    dim (components of one tile share the program)."""
    nLh = len(range(mh, lh, 2))
    L = jax.lax.slice_in_dim(rows, 0, nLh, axis=hax)
    H = jax.lax.slice_in_dim(rows, nLh, lh, axis=hax)
    E, O = sr_poly(L, H, mh, mh + lh, axis=hax)
    x = _poly_interleave(E, O, mh, mh + lh, axis=hax)

    nLv = len(range(mv, lv, 2))
    Lv = jax.lax.slice_in_dim(x, 0, nLv, axis=vax)
    Hv = jax.lax.slice_in_dim(x, nLv, lv, axis=vax)
    E, O = sr_poly(Lv, Hv, mv, mv + lv, axis=vax)
    return _poly_interleave(E, O, mv, mv + lv, axis=vax)


def dwt_poly_capable(border, ndeclevels: int) -> bool:
    """True when every level of this geometry takes the polyphase path
    (both dims >= 8) — the precondition for dwt_decode_batched."""
    if ndeclevels == 0:
        return False
    linelen, _mod = dwt_levels(border, ndeclevels)
    return all(linelen[lev][0] >= 8 and linelen[lev][1] >= 8
               for lev in range(ndeclevels))


def dwt_decode_batched(data, border, ndeclevels: int, dwt_type: int):
    """Inverse DWT over a (C, H, W) batch of same-geometry planes in one
    traced program (4:4:4 tiles run all components in one pass).
    Requires dwt_poly_capable(border, ndeclevels)."""
    if dwt_type == DWT97_INT and not jax.config.jax_enable_x64:
        raise RuntimeError("DWT97_INT on device requires jax_enable_x64")
    if ndeclevels == 0:
        return data
    linelen, mod = dwt_levels(border, ndeclevels)
    sr_poly = _POLY_SR[dwt_type]
    C = data.shape[0]
    for lev in range(ndeclevels):
        lh, lv = linelen[lev][0], linelen[lev][1]
        mh, mv = mod[lev][0], mod[lev][1]
        rows = jax.lax.slice(data, (0, 0, 0), (C, lv, lh))
        out = _poly_level(rows, lh, lv, mh, mv, sr_poly, hax=2, vax=1)
        data = jax.lax.dynamic_update_slice(data, out, (0, 0, 0))
    if dwt_type == DWT97_INT:
        h = linelen[ndeclevels - 1][1]
        w = linelen[ndeclevels - 1][0]
        v = jax.lax.slice(data, (0, 0, 0), (C, h, w)).astype(jnp.int64)
        v = ((v + ((1 << I_PRESHIFT) >> 1)) >> I_PRESHIFT).astype(jnp.int32)
        data = jax.lax.dynamic_update_slice(data, v, (0, 0, 0))
    return data


def dwt_decode_bands(ll, levels, border, ndeclevels: int, dwt_type: int):
    """Inverse DWT fed by subband arrays directly (polyphase path only).

    ll: the level-0 lowband; levels: [(hl, lh, hh), ...] low-to-high
    resolution. Bit-identical to assembling the quadrant pyramid and
    running _dwt_decode_traced — horizontal lifting is row-independent,
    so it distributes over the top (LL|HL) and bottom (LH|HH) row blocks
    and the quadrants feed sr_poly directly, skipping the pyramid
    concat + re-slice round trip (~100 MB of copies per 4K frame).
    Requires dwt_poly_capable(border, ndeclevels).
    """
    if dwt_type == DWT97_INT and not jax.config.jax_enable_x64:
        raise RuntimeError("DWT97_INT on device requires jax_enable_x64")
    linelen, mod = dwt_levels(border, ndeclevels)
    sr_poly = _POLY_SR[dwt_type]
    p = ll
    for lev in range(ndeclevels):
        lh, lv = linelen[lev][0], linelen[lev][1]
        mh, mv = mod[lev][0], mod[lev][1]
        hl, lhb, hh = levels[lev]
        E, O = sr_poly(p, hl, mh, mh + lh, axis=1)
        top = _poly_interleave(E, O, mh, mh + lh, axis=1)
        E, O = sr_poly(lhb, hh, mh, mh + lh, axis=1)
        bot = _poly_interleave(E, O, mh, mh + lh, axis=1)
        E, O = sr_poly(top, bot, mv, mv + lv, axis=0)
        p = _poly_interleave(E, O, mv, mv + lv, axis=0)
    if dwt_type == DWT97_INT:
        v = p.astype(jnp.int64)
        p = ((v + ((1 << I_PRESHIFT) >> 1)) >> I_PRESHIFT).astype(jnp.int32)
    return p


def _dwt_decode_traced(data: jnp.ndarray, border, ndeclevels: int,
                       dwt_type: int) -> jnp.ndarray:
    if dwt_type == DWT97_INT and not jax.config.jax_enable_x64:
        # the Q16 lifting products need > 32 bits; the bitexact path is a
        # conformance path, not the perf path (which uses 5/3 or 9/7 float)
        raise RuntimeError("DWT97_INT on device requires jax_enable_x64")
    if ndeclevels == 0:
        return data
    linelen, mod = dwt_levels(border, ndeclevels)
    sr = _SR[dwt_type]

    sr_poly = _POLY_SR[dwt_type]
    for lev in range(ndeclevels):
        lh, lv = linelen[lev][0], linelen[lev][1]
        mh, mv = mod[lev][0], mod[lev][1]
        if lh <= 0 or lv <= 0:
            continue
        rows = jax.lax.slice(data, (0, 0), (lv, lh))
        if lh >= 8 and lv >= 8:
            # polyphase: contiguous slices, no transposes (see above)
            out = _poly_level(rows, lh, lv, mh, mv, sr_poly)
            data = jax.lax.dynamic_update_slice(data, out, (0, 0))
            continue
        p = _interleave(rows, lh, mh)
        p = sr(p, mh, mh + lh)
        rows = jax.lax.slice(p, (0, _PAD + mh), (lv, _PAD + mh + lh))

        cols = rows.T
        p = _interleave(cols, lv, mv)
        p = sr(p, mv, mv + lv)
        cols = jax.lax.slice(p, (0, _PAD + mv), (lh, _PAD + mv + lv))
        data = jax.lax.dynamic_update_slice(data, cols.T, (0, 0))

    if dwt_type == DWT97_INT:
        h = linelen[ndeclevels - 1][1]
        w = linelen[ndeclevels - 1][0]
        v = jax.lax.slice(data, (0, 0), (h, w)).astype(jnp.int64)
        v = ((v + ((1 << I_PRESHIFT) >> 1)) >> I_PRESHIFT).astype(jnp.int32)
        data = jax.lax.dynamic_update_slice(data, v, (0, 0))
    return data


@functools.partial(jax.jit, static_argnames=("border", "ndeclevels", "dwt_type"))
def dwt_decode_jax(data: jnp.ndarray, border, ndeclevels: int,
                   dwt_type: int) -> jnp.ndarray:
    """Jitted inverse DWT. `border` is a hashable ((x0,x1),(y0,y1)) tuple."""
    b = [[border[0][0], border[0][1]], [border[1][0], border[1][1]]]
    return _dwt_decode_traced(data, b, ndeclevels, dwt_type)


def dwt53_inverse(plane: jnp.ndarray, ndeclevels: int) -> jnp.ndarray:
    """Convenience wrapper: origin-aligned plane, 5/3 inverse."""
    h, w = plane.shape
    b = [[0, w], [0, h]]
    return _dwt_decode_traced(plane, b, ndeclevels, DWT53)
