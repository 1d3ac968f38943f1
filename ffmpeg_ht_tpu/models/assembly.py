"""v3 fused decode program: merged-bucket entropy + scatter-free assembly.

The round-3 profiling on the bench TPU showed XLA scatter/gather run
~30 ns/element (serialized) while reshape/transpose/concat and the DWT
run at memory bandwidth, and that every *fresh output buffer* costs
~0.3 GB/s to materialize. This module therefore:

  1. decodes EVERY codeblock of a frame in ONE merged entropy launch
     (ops/ht_scan.decode_cleanup_scan_dims: per-lane quad-grid dims,
     lanes in geometry order),
  2. assembles tile-component planes from the lane rasters with pure
     slice/reshape/transpose/concat mosaics (precinct grids -> bands ->
     quadrant pyramid), no scatter,
  3. runs dequant, inverse DWT and MCT in the SAME jit so no oversized
     intermediate ever becomes a program output,
  4. emits the v2-compatible packed narrow-dtype buffer (planes + ok
     flag), so Decoder._finish / _assemble_frame work unchanged.

The plan (which lanes tile which band where) is static per codestream
geometry and is validated at build time: precinct codeblock grids must
be uniform except for their last row/column (true whenever band origins
are aligned to the codeblock grid — all standard streams; anything else
returns None and the caller uses the v2 path). Reference geometry:
jpeg2000.c:274-467; tile path being replaced: jpeg2000dec.c:2368-2395.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from ffmpeg_ht_tpu.codestream import markers as mk


@dataclass(frozen=True)
class PrecPlan:
    l0: int          # absolute first lane (geometry ordinal)
    ch: int          # codeblock grid rows
    cw: int          # codeblock grid cols
    blk_h: int       # full block dims (last row/col may be smaller)
    blk_w: int
    ph: int          # precinct pixel dims
    pw: int
    x0: int          # position in the plane (quadrant coords)
    y0: int


@dataclass(frozen=True)
class BandPlan:
    rows: Tuple[Tuple[PrecPlan, ...], ...]   # precinct mosaic, row-major
    bh: int
    bw: int


@dataclass(frozen=True)
class PlanePlan:
    plane_idx: int
    ph: int
    pw: int
    ndec: int
    levels: Tuple                 # (ll, ((hl, lh, hh), ...)) BandPlans


@dataclass(frozen=True)
class AssemblyPlan:
    planes: Tuple[PlanePlan, ...]
    n_lanes: int
    bh: int                       # bucket raster dims (2*qh, 2*qw)
    bw: int


def build_plan(fg) -> Optional[AssemblyPlan]:
    """Static assembly plan from a FlatGeometry, or None if any precinct
    grid is irregular (unaligned band origin — v2 fallback)."""
    w = fg.w
    h = fg.h
    dest = fg.dest
    stride = fg.stride
    planes = fg.geom.planes

    # group precincts per (plane, rl, band)
    bands = {}
    for (l0, ch, cw, pidx, tileno, compno, rlno, bandno) in fg.prec_list:
        n = ch * cw
        if n == 0:
            continue
        colw = [int(w[l0 + j]) for j in range(cw)]
        rowh = [int(h[l0 + i * cw]) for i in range(ch)]
        # rectangular grid with uniform interior
        for i in range(ch):
            for j in range(cw):
                if int(w[l0 + i * cw + j]) != colw[j] \
                        or int(h[l0 + i * cw + j]) != rowh[i]:
                    return None
        if any(cv != colw[0] for cv in colw[:-1]) \
                or any(rv != rowh[0] for rv in rowh[:-1]):
            return None
        if colw[-1] > colw[0] or rowh[-1] > rowh[0]:
            return None
        poff, _, pstride = planes[pidx]
        rel = int(dest[l0]) - poff
        if int(stride[l0]) != pstride:
            return None
        y0, x0 = rel // pstride, rel % pstride
        # every cblk's dest must match its grid slot
        for i in range(ch):
            for j in range(cw):
                ex = x0 + sum(colw[:j])
                ey = y0 + sum(rowh[:i])
                if int(dest[l0 + i * cw + j]) - poff \
                        != ey * pstride + ex:
                    return None
        pp = PrecPlan(l0=int(l0), ch=ch, cw=cw, blk_h=rowh[0],
                      blk_w=colw[0], ph=sum(rowh), pw=sum(colw),
                      x0=x0, y0=y0)
        bands.setdefault((pidx, rlno, bandno), []).append(pp)

    def band_plan(key, exp_w, exp_h, exp_x0, exp_y0) -> Optional[BandPlan]:
        pps = bands.get(key, [])
        if not pps:
            if exp_w == 0 or exp_h == 0:
                return BandPlan(rows=(), bh=exp_h, bw=exp_w)
            return None
        rows = {}
        for pp in pps:
            rows.setdefault(pp.y0, []).append(pp)
        out_rows = []
        ys = sorted(rows.keys())
        cy = exp_y0
        for y in ys:
            row = sorted(rows[y], key=lambda p: p.x0)
            if y != cy:
                return None
            cx = exp_x0
            ph = row[0].ph
            for pp in row:
                if pp.x0 != cx or pp.ph != ph:
                    return None
                cx += pp.pw
            if cx - exp_x0 != exp_w:
                return None
            cy += ph
            out_rows.append(tuple(row))
        if cy - exp_y0 != exp_h:
            return None
        return BandPlan(rows=tuple(out_rows), bh=exp_h, bw=exp_w)

    def cdp2(v, k):
        return -((-v) >> k)

    plane_plans = []
    for pidx, (poff, ph, pw) in enumerate(planes):
        ndec = fg.geom.ndecs[pidx]
        border = fg.geom.borders[pidx]
        (x0b, x1b), (y0b, y1b) = border

        def lvl_dims(r, ndec=ndec, x0b=x0b, x1b=x1b, y0b=y0b, y1b=y1b):
            """Reslevel-r plane dims (r = ndec is the full plane)."""
            s = ndec - r
            return (cdp2(x1b, s) - cdp2(x0b, s),
                    cdp2(y1b, s) - cdp2(y0b, s))

        llw, llh = lvl_dims(0)
        ll = band_plan((pidx, 0, 0), llw, llh, 0, 0)
        if ll is None:
            return None
        lvls = []
        cw_, ch_ = llw, llh
        for r in range(1, ndec + 1):
            lw, lh = lvl_dims(r)
            hlw, hlh = lw - cw_, ch_
            lhw, lhh = cw_, lh - ch_
            hhw, hhh = lw - cw_, lh - ch_
            hl = band_plan((pidx, r, 0), hlw, hlh, cw_, 0)
            lhb = band_plan((pidx, r, 1), lhw, lhh, 0, ch_)
            hh = band_plan((pidx, r, 2), hhw, hhh, cw_, ch_)
            if hl is None or lhb is None or hh is None:
                return None
            lvls.append((hl, lhb, hh))
            cw_, ch_ = lw, lh
        if (cw_, ch_) != (pw, ph):
            return None
        plane_plans.append(PlanePlan(plane_idx=pidx, ph=ph, pw=pw,
                                     ndec=ndec, levels=(ll, tuple(lvls))))

    bw = 2 * (-(-int(fg.w.max()) // 2)) if fg.ncblks else 2
    bh = 2 * (-(-int(fg.h.max()) // 2)) if fg.ncblks else 2
    return AssemblyPlan(planes=tuple(plane_plans), n_lanes=fg.ncblks,
                        bh=bh, bw=bw)


# ---------------------------------------------------------------------------
# traced program
# ---------------------------------------------------------------------------


def _mosaic_band(ras, bp: BandPlan, lane_off: int, dtype):
    import jax
    import jax.numpy as jnp

    if bp.bw == 0 or bp.bh == 0 or not bp.rows:
        return jnp.zeros((bp.bh, bp.bw), dtype)
    row_rects = []
    for row in bp.rows:
        rects = []
        for pp in row:
            n = pp.ch * pp.cw
            sub = jax.lax.slice(
                ras, (lane_off + pp.l0, 0, 0),
                (lane_off + pp.l0 + n, pp.blk_h, pp.blk_w))
            g = sub.reshape(pp.ch, pp.cw, pp.blk_h, pp.blk_w)
            g = jnp.transpose(g, (0, 2, 1, 3))
            g = g.reshape(pp.ch * pp.blk_h, pp.cw * pp.blk_w)
            rects.append(g[:pp.ph, :pp.pw])
        row_rects.append(rects[0] if len(rects) == 1
                         else jnp.concatenate(rects, axis=1))
    return row_rects[0] if len(row_rects) == 1 \
        else jnp.concatenate(row_rects, axis=0)


def _compose_plane(ras, plane: PlanePlan, lane_off: int, dtype):
    import jax.numpy as jnp

    ll, lvls = plane.levels
    p = _mosaic_band(ras, ll, lane_off, dtype)
    for (hl, lhb, hh) in lvls:
        top = jnp.concatenate(
            [p, _mosaic_band(ras, hl, lane_off, dtype)], axis=1)
        bot = jnp.concatenate(
            [_mosaic_band(ras, lhb, lane_off, dtype),
             _mosaic_band(ras, hh, lane_off, dtype)], axis=1)
        p = jnp.concatenate([top, bot], axis=0)
    return p


def make_v3_program(plan: AssemblyPlan, geom_key: Tuple, qw: int, qh: int,
                    ms_class: int, n_pad: int, frames: int,
                    donate: bool = False, as_jit: bool = True,
                    no_istep: bool = False, wire_pack: bool = False,
                    kernel_variants=None):
    """Build the fused jitted decode program for one geometry.

    Signature of the returned jit:
      fn(msw, melw, vlcw, pLSB, maxbp, ms_lim, mel_lim, qws, qhs,
         magb, istep, scale97, fscale, pf_idx, pf_val) -> packed
    Arrays carry frames*n_pad lanes (frame-major); lane i of frame f is
    geometry ordinal i. pf_idx indexes the frame-flat buffer, padded
    entries point at the trailing trash slot.

    donate=True prepends an `out_buf` argument of the packed output's
    shape/dtype whose buffer is donated — on the bench platform a fresh
    output buffer costs ~0.3 GB/s to materialize, so steady-state loops
    must recycle one: out = fn(out, **args).

    wire_pack=True (9..15-bit content only) bit-packs the output into
    uint32 words on device (ops/wirepack.py) so a link-bound fetch moves
    depth/16 of the uint16 bytes; the host inverts with unpack_words.
    """
    if wire_pack:
        assert 8 < geom_key[5] < 16, "wire_pack needs 9..15-bit content"
    import jax
    import jax.numpy as jnp

    from ffmpeg_ht_tpu.ops.dwt_jax import (_dwt_decode_traced,
                                           dwt_decode_bands,
                                           dwt_poly_capable)
    from ffmpeg_ht_tpu.ops.ht_scan import _cleanup_impl
    from ffmpeg_ht_tpu.ops.mct_pallas import rct_writeframe

    (planes, borders, ndecs, mct_flags, tci, cbps, total,
     transform) = geom_key
    flat_dtype = jnp.float32 if transform == mk.DWT97 else jnp.int32
    if transform == mk.DWT97_INT and not jax.config.jax_enable_x64:
        raise RuntimeError("DWT97_INT device path requires jax_enable_x64")

    # band-direct inverse DWT: feed the (ll, (hl, lh, hh)...) mosaics
    # straight into the polyphase lifting, skipping the pyramid concat +
    # flat-buffer round trip (~100 MB of copies per 4K frame). Falls
    # back to the flat path when any level is below the polyphase floor.
    band_direct = all(
        nd == 0 or dwt_poly_capable(
            [[b[0][0], b[0][1]], [b[1][0], b[1][1]]], nd)
        for b, nd in zip(borders, ndecs))

    def program(msw, melw, vlcw, pLSB, maxbp, ms_lim, mel_lim, qws, qhs,
                magb, istep, scale97, fscale, pf_idx, pf_val):
        from ffmpeg_ht_tpu.ops.ht_scan import _VARIANTS
        variants = (_VARIANTS if kernel_variants is None
                    else frozenset(kernel_variants))
        if not variants and jax.default_backend() == "tpu":
            # Round-5 measured default for TPU: the (N/128, 128) lane
            # fold is the fastest proven kernel on-chip (19.78 vs
            # 20.99 ms at the 4K bucket, tools/ablate_2d.py) and
            # bit-identical to the rank-1 form (test_ht_scan_dims).
            # Force the rank-1 kernel back with
            # FFMPEG_HT_TPU_KERNEL_VARIANTS=scan1d.
            variants = frozenset(("scan2d",))
        if "pallas" in variants:
            # VMEM-resident Mosaic formulation (same math, lane-blocked;
            # ops/ht_scan_pallas.py). Interpret off-TPU.
            from ffmpeg_ht_tpu.ops.ht_scan_pallas import \
                decode_cleanup_pallas
            mu, _sig, ok = decode_cleanup_pallas(
                msw, melw, vlcw, pLSB, maxbp, ms_lim, mel_lim, qws, qhs,
                qw=qw, qh=qh, ms_class=ms_class,
                interpret=jax.default_backend() == "cpu")
        elif "scan2d" in variants:
            # lane axis folded (N/128, 128) so the scan body's registers
            # fill all 8 VPU sublanes (ht_scan.decode_cleanup_scan_dims_2d)
            from ffmpeg_ht_tpu.ops.ht_scan import \
                decode_cleanup_scan_dims_2d
            mu, _sig, ok = decode_cleanup_scan_dims_2d(
                msw, melw, vlcw, pLSB, maxbp, ms_lim, mel_lim, qws, qhs,
                qw=qw, qh=qh, ms_class=ms_class)
        else:
            mu, _sig, ok = _cleanup_impl(
                msw, melw, vlcw, pLSB, maxbp, ms_lim, mel_lim,
                qw=qw, qh=qh, ms_class=ms_class, dims=(qws, qhs))

        # mu arrives rasterized (N, 2qh, 2qw) straight from the scan
        # kernel (ht_scan._mu_rows): the old quad->raster transpose
        # (2-element innermost dim, ~4 ms/4K frame) no longer exists.

        # dequant (jpeg2000dec.c:2098-2181) per lane
        val = mu.astype(jnp.uint32)
        neg = (val >> 31) == 1
        mag = (val & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
        if transform == mk.DWT97:
            m = jnp.where(neg, -mag, mag).astype(jnp.float32)
            coef = m * fscale[:, None, None]
        elif transform == mk.DWT97_INT:
            m = jnp.where(neg, -mag, mag)
            m = ((m + 32) >> 6).astype(jnp.int64)
            prod = m * scale97[:, None, None].astype(jnp.int64)
            coef = jnp.where(prod > 0, (prod + (1 << 15)) >> 16,
                             (prod + (1 << 15) - 1) >> 16)
            coef = coef.astype(jnp.int32)
        else:
            down = (31 - magb)[:, None, None]
            m = mag >> down
            coef = jnp.where(neg, -m, m)
            if not no_istep:
                istep_b = istep[:, None, None]
                coef = jnp.where(istep_b != 32768,
                                 (coef * istep_b) >> 16, coef)
        coef = coef.astype(flat_dtype)
        # materialization boundary: without it XLA tries to fuse the
        # entropy scan's output into every mosaic slice below and its
        # fusion analysis explodes (64x64 program: 10+ min compiles)
        coef = jax.lax.optimization_barrier(coef)
        # host-decoded lanes (long-tail, extreme bitplanes): tiny scatter
        # into the lane rasters — pf_idx is in lane-raster coordinates
        # (fastpath.build_v3_frame), pads index OOB and are dropped
        cflat = coef.reshape(-1).at[pf_idx].set(pf_val, mode="drop")
        coef = cflat.reshape(coef.shape)

        # per-plane DWT (a batched same-geometry variant was measured
        # 2.3 ms/frame SLOWER in the fused program: the stack/unstack
        # copies cost more than the shared schedule saves)
        outs = []
        for f in range(frames):
            off = f * n_pad
            for plane_p, (poff, ph, pw), border, ndec in zip(
                    plan.planes, planes, borders, ndecs):
                b = [[border[0][0], border[0][1]],
                     [border[1][0], border[1][1]]]
                if band_direct:
                    ll, lvls = plane_p.levels
                    plane = _mosaic_band(coef, ll, off, flat_dtype)
                    if ndec > 0:
                        lvl_bands = [
                            tuple(_mosaic_band(coef, bb, off, flat_dtype)
                                  for bb in lvl) for lvl in lvls]
                        plane = dwt_decode_bands(plane, lvl_bands, b,
                                                 ndec, transform)
                else:
                    plane = _compose_plane(coef, plane_p, off,
                                           flat_dtype)
                    if ndec > 0:
                        plane = _dwt_decode_traced(plane, b, ndec,
                                                   transform)
                outs.append(plane)

        interp = jax.default_backend() == "cpu"
        shift = 1 << (cbps - 1)

        def finish(c):
            if transform == mk.DWT97:
                c = jnp.rint(c).astype(jnp.int32)
            return jnp.clip(c + shift, 0, (1 << cbps) - 1)

        def ict_int(y0, y1, y2):
            def qmul(c, v):
                prod = jnp.uint32(c & 0xFFFFFFFF) * v.astype(jnp.uint32)
                prod = prod + jnp.uint32(1 << 15)
                return prod.astype(jnp.int32) >> 16
            i0 = y0 + y2 + qmul(26345, y2)
            i1 = y0 - qmul(22553, y1) - qmul(46802, y2)
            i2 = y0 + 2 * y1 + qmul(-14942, y1)
            return i0, i1, i2

        def ict_float(y0, y1, y2):
            fv = [jnp.float32(v) for v in (1.402, 0.34413, 0.71414, 1.772)]
            return (y0 + fv[0] * y2, y0 - fv[1] * y1 - fv[2] * y2,
                    y0 + fv[3] * y1)

        final = []
        nplanes = len(planes)
        for f in range(frames):
            for tileno, idxs in enumerate(tci):
                comps = [outs[f * nplanes + i] for i in idxs]
                if mct_flags[tileno] and len(comps) >= 3 and \
                        comps[0].shape == comps[1].shape == comps[2].shape:
                    if transform == mk.DWT53:
                        r, g2, bl = rct_writeframe(
                            comps[0], comps[1], comps[2], cbps,
                            interpret=interp)
                        comps = [r, g2, bl] + [finish(c)
                                               for c in comps[3:]]
                    else:
                        ict = ict_float if transform == mk.DWT97 \
                            else ict_int
                        c0, c1, c2 = ict(comps[0], comps[1], comps[2])
                        comps = [finish(c) for c in (c0, c1, c2)] \
                            + [finish(c) for c in comps[3:]]
                else:
                    comps = [finish(c) for c in comps]
                final.extend(comps)

        # ok flag: real (non-inert) lanes only; inert lanes pass trivially
        flag = jnp.all(ok)
        if wire_pack:
            from ffmpeg_ht_tpu.ops.wirepack import pack_words
            samples = jnp.concatenate(
                [c.astype(jnp.uint32).reshape(-1) for c in final])
            return jnp.concatenate(
                [pack_words(samples, cbps), flag.astype(jnp.uint32)
                 .reshape(1)])
        dtype = jnp.uint8 if cbps <= 8 else jnp.uint16
        return jnp.concatenate(
            [c.astype(dtype).reshape(-1) for c in final]
            + [flag.astype(dtype).reshape(1)])

    if donate:
        def program_d(out_buf, **kw):
            return program(**kw)
        return jax.jit(program_d, donate_argnums=(0,))
    if not as_jit:
        return program        # untraced body, for shard_map wrapping
    return jax.jit(program)


def packed_shape(geom_key: Tuple, frames: int, wire_pack: bool = False):
    """(shape, numpy dtype) of the packed output for `frames` frames."""
    total = geom_key[6]
    cbps = geom_key[5]
    if wire_pack:
        from ffmpeg_ht_tpu.ops.wirepack import wire_shape
        return wire_shape(frames * total, cbps)
    dt = np.uint8 if cbps <= 8 else np.uint16
    return (frames * total + 1,), dt
