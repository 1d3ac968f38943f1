"""TPU decode pipeline — the flagship model.

Host/device split per SURVEY.md §7: the byte-serial work (codestream parse,
T2 packet headers, HT segment lengths) stays on host; everything after is
one jitted device program per codestream *geometry*:

  entropy (ops/ht_scan lockstep kernel, bucketed by codeblock shape)
  -> dequant + scatter into a flat coefficient buffer
  -> inverse DWT per tile-component (ops/dwt_jax)
  -> inverse MCT (RCT) + DC shift/clip

The geometry (tile grid, codeblock buckets, plane offsets) is static per
(image parameters); jit caches one executable per geometry, so steady-state
decode is host parse + one device launch. SigProp/MagRef refinement runs
on device too (ops/ht_refine.py). Codeblocks the device path does not
support (legacy MQ, ROI, HT-causal refinement) fall back to the host
oracle decoder (models/host_decoder.py) transparently.

Multi-frame throughput: `decode_batch` concatenates many same-geometry
frames into the same buckets (lanes scale, one launch); multi-chip scaling
shards the frame axis (see __graft_entry__.dryrun_multichip).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Dict, List, Tuple

import numpy as np

from ffmpeg_ht_tpu.codestream import markers as mk
from ffmpeg_ht_tpu.codestream.geometry import Tile, ceildiv, init_tile
from ffmpeg_ht_tpu.codestream.parser import parse_codestream
from ffmpeg_ht_tpu.codestream.t2 import decode_tile_packets
from ffmpeg_ht_tpu.models import host_decoder
from ffmpeg_ht_tpu.models import pixfmt as pf
from ffmpeg_ht_tpu.models.host_decoder import DecodedFrame
from ffmpeg_ht_tpu.utils.errors import InvalidData, UnshardableBatch
from ffmpeg_ht_tpu.utils.log import logger

_LANE_PAD = 8          # lane count rounded up to a multiple of this
_HOST_AREA = 256       # codeblocks smaller than this decode on host (edge
                       # slivers and low-resolution bands). Each device
                       # bucket shape is its own compiled kernel variant
                       # (~60 s compile / ~20 s cache load on this host),
                       # so shipping a handful of tiny blocks to the
                       # scalar oracle (~0.3 ms each) is the cheaper side
                       # of the trade by orders of magnitude.


_DEVICE_TRANSFORMS = (mk.DWT53, mk.DWT97_INT, mk.DWT97)


def _supported_on_device(hdr, tiles: List[Tile]) -> bool:
    """Device path covers HTONLY streams without ROI; all three transforms
    (5/3 reversible, bitexact integer 9/7, float 9/7), uniform across the
    frame's tile-components (one flat-buffer dtype per launch)."""
    transform = tiles[0].codsty[0].transform if tiles else mk.DWT53
    for tile in tiles:
        for compno, comp in enumerate(tile.comp):
            codsty = tile.codsty[compno]
            if codsty.transform not in _DEVICE_TRANSFORMS \
                    or codsty.transform != transform:
                return False
            if comp.roi_shift:
                return False
            qntsty = tile.qntsty[compno]
            for sb in range(codsty.nreslevels2decode * 3 - 2):
                if qntsty.expn[sb] + qntsty.nguardbits - 1 >= 31:
                    return False  # host raises PatchWelcome (HT M_b >= 31)
            if not (codsty.cblk_style & mk.CTSY_HTJ2K_F):
                return False
            if (codsty.log2_cblk_width > 6 or codsty.log2_cblk_height > 6):
                return False  # kernel raster capacity is 64x64
            for rl in comp.reslevel:
                for band in rl.band:
                    for prec in band.prec:
                        for cblk in prec.cblk:
                            if cblk.npasses == 0:
                                continue
                            if not (cblk.modes & mk.CTSY_HTJ2K_F):
                                return False
    return True


@dataclass
class _Bucket:
    w: int
    h: int
    rows: List[np.ndarray] = field(default_factory=list)
    lcup: List[int] = field(default_factory=list)
    pcup: List[int] = field(default_factory=list)
    pLSB: List[int] = field(default_factory=list)
    maxbp: List[int] = field(default_factory=list)
    magb: List[int] = field(default_factory=list)
    istep: List[int] = field(default_factory=list)
    scale97: List[int] = field(default_factory=list)   # int97 dequant scale
    fscale: List[float] = field(default_factory=list)  # float dequant scale
    dest: List[int] = field(default_factory=list)    # flat index of (y0,x0)
    stride: List[int] = field(default_factory=list)  # plane row stride
    dref: List[tuple] = field(default_factory=list)  # (Dref bytes, lref)
    zblk: List[int] = field(default_factory=list)    # 1..3 HT passes
    causal: List[int] = field(default_factory=list)  # CBLK_VSC per lane

    @property
    def refined(self) -> bool:
        return any(z > 1 for z in self.zblk)


@dataclass
class _Geometry:
    """Static decode plan for one codestream geometry."""
    planes: List[Tuple[int, int, int]]   # (offset, h, w) per tile-comp
    borders: Tuple                        # per tile-comp ((x0,x1),(y0,y1))
    ndecs: Tuple                          # per tile-comp declevels
    mct: Tuple                            # per tile bool
    tile_comp_index: List[List[int]]      # tileno -> [plane indices]
    cbps: int
    total: int
    transform: int = mk.DWT53             # uniform across the frame

    def key(self) -> Tuple:
        return (tuple(self.planes), tuple(self.borders), tuple(self.ndecs),
                tuple(self.mct),
                tuple(tuple(i) for i in self.tile_comp_index),
                self.cbps, self.total, self.transform)


def _build_batch(hdr, tiles: List[Tile]):
    """Walk the T2 result into shape buckets + a flat-plane geometry."""
    planes = []
    borders = []
    ndecs = []
    tile_comp_index = []
    offset = 0
    for tile in tiles:
        idxs = []
        for compno, comp in enumerate(tile.comp):
            cw = comp.coord[0][1] - comp.coord[0][0]
            ch = comp.coord[1][1] - comp.coord[1][0]
            idxs.append(len(planes))
            planes.append((offset, ch, cw))
            borders.append(((comp.coord[0][0], comp.coord[0][1]),
                            (comp.coord[1][0], comp.coord[1][1])))
            ndecs.append(tile.codsty[compno].nreslevels2decode - 1)
            offset += ch * cw
        tile_comp_index.append(idxs)
    total = offset

    transform = tiles[0].codsty[0].transform if tiles else mk.DWT53
    buckets: Dict[Tuple[int, int], _Bucket] = {}
    prefill = np.zeros(total + 1,
                       np.float32 if transform == mk.DWT97 else np.int32)
    for tileno, tile in enumerate(tiles):
        for compno, comp in enumerate(tile.comp):
            qntsty = tile.qntsty[compno]
            poff, _, pstride = (planes[tile_comp_index[tileno][compno]][0],
                                0, planes[tile_comp_index[tileno][compno]][2])
            subbandno = 0
            # lowres: reslevels >= nreslevels2decode were parsed (their
            # packets occupy the stream) but decode no coefficients —
            # their dests lie outside the reduced plane
            # (jpeg2000dec.c:509-520)
            n2d = tile.codsty[compno].nreslevels2decode
            for rl in comp.reslevel[:n2d]:
                for bandno, band in enumerate(rl.band):
                    magb = qntsty.expn[subbandno] + qntsty.nguardbits - 1
                    subbandno += 1
                    if (band.coord[0][0] >= band.coord[0][1]
                            or band.coord[1][0] >= band.coord[1][1]):
                        continue
                    for prec in band.prec:
                        for cblk in prec.cblk:
                            w, h = cblk.width, cblk.height
                            if w <= 0 or h <= 0 or cblk.npasses == 0:
                                continue
                            lcup = cblk.pass_lengths[0]
                            if lcup < 2:
                                # error parity with the host oracle
                                # (ht_dec.py) and the reference
                                # (jpeg2000htdec.c:1252-1256): a frame must
                                # never silently decode to different pixels
                                # depending on which path ran
                                raise InvalidData("cleanup pass length < 2")
                            x = cblk.coord[0][0] - band.coord[0][0]
                            y = cblk.coord[1][0] - band.coord[1][0]
                            dest = poff + y * pstride + x
                            num_rempass = cblk.npasses % 3
                            num_plhd = (cblk.npasses - num_rempass
                                        if num_rempass
                                        else cblk.npasses - 3)
                            z_blk = cblk.npasses - num_plhd
                            # placeholder passes shift the bitplane:
                            # S_blk = p0 + zbp (ht_dec.py:611,627)
                            zbp_eff = cblk.zbp + num_plhd // 3
                            causal = bool(cblk.modes & mk.CBLK_VSC)
                            if w * h < _HOST_AREA \
                                    or zbp_eff + 1 > 25:
                                # tiny edge slivers and extreme-bitplane
                                # blocks (the kernel's MagSgn reads cap
                                # at 25 bits/sample):
                                # scalar host decode into the prefill
                                from ffmpeg_ht_tpu.ops import dequant as dq
                                from ffmpeg_ht_tpu.ops import ht_dec
                                t1 = ht_dec.decode_htj2k(
                                    bytes(cblk.data), cblk.npasses,
                                    cblk.zbp, cblk.pass_lengths, w, h,
                                    magb, 0, int(causal))
                                if transform == mk.DWT97:
                                    blk = dq.dequant_float(
                                        t1, band.f_stepsize, magb)
                                elif transform == mk.DWT97_INT:
                                    blk = dq.dequant_int_97(
                                        t1, band.f_stepsize, magb)
                                else:
                                    blk = dq.dequant_int(
                                        t1, band.i_stepsize, magb)
                                for yy in range(h):
                                    s = dest + yy * pstride
                                    prefill[s:s + w] = blk[yy]
                                continue
                            buf = bytearray(cblk.data[:lcup])
                            if len(buf) < lcup:
                                buf.extend(b"\x00" * (lcup - len(buf)))
                            scup = ((buf[lcup - 1] << 4)
                                    + (buf[lcup - 2] & 0x0F))
                            if scup < 2 or scup > lcup or scup > 4079:
                                # parity with ht_dec.py / the reference
                                # (jpeg2000htdec.c:1265-1273)
                                raise InvalidData(f"invalid Scup {scup}")
                            buf[lcup - 1] = 0xFF
                            buf[lcup - 2] |= 0x0F
                            zbp = zbp_eff
                            # bucket by shape AND a pow2 stream-length
                            # class: lanes of similar length pack
                            # together, keeping the (N, W) upload close
                            # to the real content size
                            wc = 16
                            need = (8 * lcup + 96) // 32
                            while wc < need:
                                wc *= 2
                            key = (w, h, wc)
                            b = buckets.setdefault(key, _Bucket(w, h))
                            b.rows.append(np.frombuffer(bytes(buf),
                                                        np.uint8))
                            b.lcup.append(lcup)
                            b.pcup.append(lcup - scup)
                            b.pLSB.append(30 - zbp)
                            b.maxbp.append(zbp + 1)
                            b.magb.append(magb)
                            b.istep.append(band.i_stepsize)
                            from ffmpeg_ht_tpu.ops.dequant import int97_scale
                            b.scale97.append(
                                int97_scale(band.f_stepsize, magb)
                                if transform == mk.DWT97_INT else 0)
                            b.fscale.append(float(
                                np.float32(band.f_stepsize)
                                / np.float32(1 << (31 - magb)))
                                if transform == mk.DWT97 else 0.0)
                            b.dest.append(dest)
                            b.stride.append(pstride)
                            b.zblk.append(z_blk)
                            b.causal.append(int(causal))
                            if z_blk > 1:
                                lref = cblk.pass_lengths[1]
                                b.dref.append(
                                    (bytes(cblk.data[lcup:lcup + lref]),
                                     lref))
                            else:
                                b.dref.append((b"", 0))

    geom = _Geometry(planes=planes, borders=tuple(borders),
                     ndecs=tuple(ndecs),
                     mct=tuple(bool(t.codsty[0].mct) for t in tiles),
                     tile_comp_index=tile_comp_index,
                     cbps=hdr.siz.components[0].depth, total=total,
                     transform=transform)
    return geom, buckets, prefill


def _replicate_geometry(g0: _Geometry, F: int) -> _Geometry:
    """Frame-replicated geometry: F frames side by side in the flat
    buffer (decode_batch lane merging)."""
    planes = []
    borders = []
    ndecs = []
    mct = []
    tci = []
    for f in range(F):
        pbase = len(planes)
        for (off, ph, pw) in g0.planes:
            planes.append((off + f * g0.total, ph, pw))
        borders.extend(g0.borders)
        ndecs.extend(g0.ndecs)
        mct.extend(g0.mct)
        for idxs in g0.tile_comp_index:
            tci.append(tuple(i + pbase for i in idxs))
    return _Geometry(planes=planes, borders=tuple(borders),
                     ndecs=tuple(ndecs), mct=tuple(mct),
                     tile_comp_index=[list(t) for t in tci],
                     cbps=g0.cbps, total=F * g0.total,
                     transform=g0.transform)


def _pad(n, q):
    return ((n + q - 1) // q) * q


def _pow2(n: int, lo: int) -> int:
    v = lo
    while v < n:
        v *= 2
    return v


def _bucket_arrays(b: _Bucket):
    """Pack a bucket into padded device arrays.

    The byte rows are flattened into dense uint32 bit-stream words on the
    host (ops/ht_batch.prepare_streams); lane count and word width are
    padded to powers of two so the jitted entropy kernel's executable is
    reused across frames and geometries.
    """
    from ffmpeg_ht_tpu.ops.ht_batch import prepare_streams_with_limits

    n = len(b.rows)
    npad = _pow2(n, _LANE_PAD)
    lmax = max(max(len(r) for r in b.rows), 4)
    data = np.zeros((npad, lmax), np.uint8)
    for i, r in enumerate(b.rows):
        data[i, :len(r)] = r
    lcups = np.full(npad, 2, np.int64)
    lcups[:n] = b.lcup
    pcups = np.zeros(npad, np.int64)
    pcups[:n] = b.pcup
    msw, melw, vlcw, ms_lim, mel_lim = prepare_streams_with_limits(
        data, lcups, pcups)

    def vec(vals, fill, dtype=np.int32):
        a = np.full(npad, fill, dtype)
        a[:n] = vals
        return a

    extra = {}
    if b.refined:
        from ffmpeg_ht_tpu.ops.ht_batch import (prepare_magref_stream,
                                                prepare_sigprop_stream)
        # information-theoretic caps keep malformed lref from blowing up
        # the byte matrices: SigProp consumes <= 2 bits/sample (<= 8192),
        # MagRef <= 1 bit/sample (<= 4096); at the worst 7 payload
        # bits/byte these prefixes/suffixes cover every reachable bit
        SP_CAP, MR_CAP = 1200, 650
        lsp = np.zeros(npad, np.int64)
        lmr = np.zeros(npad, np.int64)
        spmax = max(min(lr, SP_CAP) for _, lr in b.dref)
        mrmax = max(min(lr, MR_CAP) for _, lr in b.dref)
        dsp = np.zeros((npad, max(spmax, 4)), np.uint8)
        dmr = np.zeros((npad, max(mrmax, 4)), np.uint8)
        for i, (dr, lr) in enumerate(b.dref):
            ls = min(lr, SP_CAP)
            row = np.frombuffer(dr[:ls], np.uint8)
            dsp[i, :len(row)] = row
            lsp[i] = ls
            lm = min(lr, MR_CAP)
            # suffix: the backward reader starts at byte lref-1; bytes
            # past the stored data are zeros (oracle zero-extension)
            tail = dr[max(lr - MR_CAP, 0):lr]
            trow = np.frombuffer(tail, np.uint8)
            # left-align: a truncated stream is missing TAIL bytes, which
            # must read as zeros (oracle end-of-stream zero-extension)
            dmr[i, :len(trow)] = trow
            lmr[i] = lm
        extra = dict(
            spw=prepare_sigprop_stream(dsp, lsp),
            mrw=prepare_magref_stream(dmr, lmr),
            has_sp=vec([z >= 2 for z in b.zblk], 0, bool),
            has_mr=vec([z >= 3 for z in b.zblk], 0, bool),
            causal=vec(b.causal, 0, bool),
        )

    return dict(
        msw=msw,
        melw=melw,
        vlcw=vlcw,
        ms_lim=ms_lim,
        mel_lim=mel_lim,
        pLSB=vec(b.pLSB, 2),
        **extra,
        maxbp=vec(b.maxbp, 32),
        magb=vec(b.magb, 8),
        istep=vec(b.istep, 32768),
        scale97=vec(b.scale97, 0),
        fscale=vec(b.fscale, 0.0, np.float32),
        dest=vec(b.dest, -1),      # -1 -> trash slot
        stride=vec(b.stride, 0),
        nreal=n,                   # host-side lane count (padding excluded)
    ), n


_CACHE_ENABLED = False


def _enable_persistent_cache():
    """Opt-in persistent XLA compilation cache (FFMPEG_HT_TPU_CACHE=dir).

    Off by default: serializing these executables can be slower than
    recompiling on some backends.
    """
    global _CACHE_ENABLED
    if _CACHE_ENABLED:
        return
    _CACHE_ENABLED = True
    import os
    cache_dir = os.environ.get("FFMPEG_HT_TPU_CACHE")
    if not cache_dir:
        return
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # older jax without the knobs
        pass


def _entropy_stage(shapes, bucket_args):
    """Run the globally-cached entropy kernel per bucket.

    decode_cleanup_scan is jitted keyed on (input shapes, qw, qh,
    ms_class), so each kernel compiles once per codeblock shape class and
    is shared across every geometry/image that uses that class.
    """
    from ffmpeg_ht_tpu.ops.ht_refine import decode_refinement_scan
    from ffmpeg_ht_tpu.ops.ht_scan import (decode_cleanup_scan,
                                           decode_cleanup_scan_sig)

    mus, oks = [], []
    for (qw, qh, w, h, ms_class, refined), args in zip(shapes, bucket_args):
        if refined:
            # SigProp/MagRef lanes: cleanup keeps the sig patterns, then
            # the refinement kernel applies both passes and rasterizes
            mu, sig, ok = decode_cleanup_scan_sig(
                args["msw"], args["melw"], args["vlcw"], args["pLSB"],
                args["maxbp"], args["ms_lim"], args["mel_lim"],
                qw=qw, qh=qh, ms_class=ms_class)
            mu = decode_refinement_scan(
                mu, sig, args["spw"], args["mrw"], args["pLSB"],
                args["has_sp"], args["has_mr"], args["causal"],
                qw=qw, qh=qh, w=w, h=h)
        else:
            mu, ok = decode_cleanup_scan(
                args["msw"], args["melw"], args["vlcw"], args["pLSB"],
                args["maxbp"], args["ms_lim"], args["mel_lim"],
                qw=qw, qh=qh, ms_class=ms_class)
        mus.append(mu)
        oks.append(ok)
    return mus, oks


@functools.lru_cache(maxsize=64)
def _compiled_assembly(bucket_shapes: Tuple, geom_key: Tuple,
                       wire_pack: bool = False):
    """Per-geometry device program: dequant + scatter + DWT + MCT.

    Cheap to compile relative to the entropy kernels; takes the per-bucket
    mu arrays produced by _entropy_stage.
    """
    import jax
    import jax.numpy as jnp

    from ffmpeg_ht_tpu.ops.dwt_jax import _dwt_decode_traced

    (planes, borders, ndecs, mct_flags, tci, cbps, total,
     transform) = geom_key
    flat_dtype = jnp.float32 if transform == mk.DWT97 else jnp.int32
    if transform == mk.DWT97_INT and not jax.config.jax_enable_x64:
        # dequant products need > 32 bits; without x64 jnp.int64 silently
        # degrades to int32 and corrupts coefficients
        raise RuntimeError("DWT97_INT device path requires jax_enable_x64")

    def assemble(pf_idx, pf_val, mus, oks, bucket_args):
        # host-decoded slivers arrive as a sparse (idx, val) pair: the
        # dense flat buffer never crosses the host->device link
        flat = jnp.zeros((total + 1,), flat_dtype)
        flat = flat.at[pf_idx].set(pf_val)

        for (qw, qh, w, h, _msc, refined), mu, args in zip(
                bucket_shapes, mus, bucket_args):
            # Both cleanup-only and refined buckets arrive rasterized
            # (N, 2qh, 2qw): the scan kernel emits raster row pairs
            # directly (ht_scan._mu_rows).
            val = mu.astype(jnp.uint32)
            neg = (val >> 31) == 1
            mag = (val & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
            if transform == mk.DWT97:
                # dequant_float (jpeg2000dec.c:2098-2117): signed magnitude
                # at the 31-bit binary point times the per-band f32 scale
                m = jnp.where(neg, -mag, mag).astype(jnp.float32)
                coef = m * args["fscale"][:, None, None]
            elif transform == mk.DWT97_INT:
                # dequant_int_97 (jpeg2000dec.c:2153-2181): PRESCALE then
                # Q16 multiply with RSHIFT rounding; 64-bit intermediates
                m = jnp.where(neg, -mag, mag)
                m = ((m + 32) >> 6).astype(jnp.int64)
                prod = m * args["scale97"][:, None, None].astype(jnp.int64)
                coef = jnp.where(prod > 0, (prod + (1 << 15)) >> 16,
                                 (prod + (1 << 15) - 1) >> 16)
                coef = coef.astype(jnp.int32)
            else:
                # reversible (jpeg2000dec.c:2119-2151): downshift 31 - M_b
                down = (31 - args["magb"])[:, None, None]
                m = mag >> down
                coef = jnp.where(neg, -m, m)
                istep = args["istep"][:, None, None]
                coef = jnp.where(istep != 32768,
                                 (coef * istep) >> 16, coef)
            # scatter into the flat buffer; dest<0 lanes and out-of-block
            # padding samples go to the trash slot
            y = jnp.arange(2 * qh, dtype=jnp.int32)[None, :, None]
            x = jnp.arange(2 * qw, dtype=jnp.int32)[None, None, :]
            base = args["dest"][:, None, None]
            stride = args["stride"][:, None, None]
            idx = base + y * stride + x
            idx = jnp.where((base < 0) | (y >= h) | (x >= w), total, idx)
            flat = flat.at[idx.ravel()].set(coef.ravel().astype(flat_dtype))

        # per tile-component inverse DWT
        outs = []
        for (off, ph, pw), border, ndec in zip(planes, borders, ndecs):
            plane = jax.lax.dynamic_slice(flat, (off,), (ph * pw,))
            plane = plane.reshape(ph, pw)
            if ndec > 0:
                b = [[border[0][0], border[0][1]],
                     [border[1][0], border[1][1]]]
                plane = _dwt_decode_traced(plane, b, ndec, transform)
            outs.append(plane)

        # inverse MCT + DC shift/clip per tile: RCT runs as the fused
        # Pallas kernel (ops/mct_pallas.py, the analog of
        # x86/jpeg2000dsp.asm + write_frame; interpret mode off-TPU);
        # the ICT variants are fused XLA elementwise (jpeg2000dsp.c:43-76)
        from ffmpeg_ht_tpu.ops.mct_pallas import rct_writeframe
        interp = jax.default_backend() == "cpu"
        shift = 1 << (cbps - 1)

        def finish(c):
            if transform == mk.DWT97:
                c = jnp.rint(c).astype(jnp.int32)  # lrintf, half-to-even
            return jnp.clip(c + shift, 0, (1 << cbps) - 1)

        def ict_int(y0, y1, y2):
            # u32-wraparound Q16 multiplies (jpeg2000dsp.c:61-76)
            def qmul(c, v):
                prod = jnp.uint32(c & 0xFFFFFFFF) * v.astype(jnp.uint32)
                prod = prod + jnp.uint32(1 << 15)
                return prod.astype(jnp.int32) >> 16
            i0 = y0 + y2 + qmul(26345, y2)
            i1 = y0 - qmul(22553, y1) - qmul(46802, y2)
            i2 = y0 + 2 * y1 + qmul(-14942, y1)
            return i0, i1, i2

        def ict_float(y0, y1, y2):
            # f_ict_params (jpeg2000dsp.c:43-59)
            f = [jnp.float32(v) for v in (1.402, 0.34413, 0.71414, 1.772)]
            return (y0 + f[0] * y2, y0 - f[1] * y1 - f[2] * y2,
                    y0 + f[3] * y1)

        final = []
        for tileno, idxs in enumerate(tci):
            comps = [outs[i] for i in idxs]
            if mct_flags[tileno] and len(comps) >= 3 \
                    and comps[0].shape == comps[1].shape == comps[2].shape:
                if transform == mk.DWT53:
                    r, g, bl = rct_writeframe(comps[0], comps[1], comps[2],
                                              cbps, interpret=interp)
                    comps = [r, g, bl] + [finish(c) for c in comps[3:]]
                else:
                    ict = ict_float if transform == mk.DWT97 else ict_int
                    c0, c1, c2 = ict(comps[0], comps[1], comps[2])
                    comps = [finish(c) for c in (c0, c1, c2)] \
                        + [finish(c) for c in comps[3:]]
            else:
                comps = [finish(c) for c in comps]
            final.extend(comps)
        # validity flag: every real lane's U-bound check must have passed
        # (padding lanes are masked); shipped as the last element of the
        # packed buffer so it costs no extra sync round-trip
        flag = jnp.ones((), bool)
        for ok, args in zip(oks, bucket_args):
            valid = jnp.arange(ok.shape[0]) < args["nreal"]
            flag = flag & jnp.all(ok | ~valid)

        # one packed output buffer: a single (narrow-dtype) fetch replaces
        # one 24ms sync round-trip per plane over the device link
        if wire_pack:
            from ffmpeg_ht_tpu.ops.wirepack import pack_words
            samples = jnp.concatenate(
                [c.astype(jnp.uint32).reshape(-1) for c in final])
            return jnp.concatenate(
                [pack_words(samples, cbps),
                 flag.astype(jnp.uint32).reshape(1)])
        dtype = jnp.uint8 if cbps <= 8 else jnp.uint16
        return jnp.concatenate([c.astype(dtype).reshape(-1) for c in final]
                               + [flag.astype(dtype).reshape(1)])

    return jax.jit(assemble)


class Decoder:
    """Jitted TPU decoder with host fallback.

    decode(data) -> DecodedFrame. The first decode of a new geometry
    compiles; subsequent frames of the same geometry reuse the executable.
    """

    def __init__(self, bitexact: bool = True, reduction_factor: int = 0,
                 max_layers: int = 0, wire_pack: bool = False):
        self.bitexact = bitexact
        self.reduction_factor = reduction_factor
        self.max_layers = max_layers
        # wire_pack: bit-pack 9..15-bit output on device (ops/wirepack.py)
        # so a link-bound fetch moves depth/16 of the uint16 bytes, at the
        # cost of a host-side unpack. Off by default: direct-attached
        # deployments fetch at HBM-class rates where the unpack only adds
        # host work.
        self.wire_pack = wire_pack
        _enable_persistent_cache()

    def _wp(self, cbps: int) -> bool:
        return self.wire_pack and 8 < cbps < 16

    def _fetch_buf(self, packed, total: int, cbps: int) -> np.ndarray:
        """One host sync: fetch the packed output, unpacking the wire
        format when the program was built with wire_pack."""
        buf = np.asarray(packed)
        if buf.dtype == np.uint32:
            from ffmpeg_ht_tpu.ops.wirepack import unpack_words
            out = np.empty(total + 1, np.uint16)
            unpack_words(buf[:-1], cbps, total, out=out)
            out[-1] = np.uint16(buf[-1])
            return out
        return buf

    def decode(self, data: bytes) -> DecodedFrame:
        hdr = parse_codestream(data, bitexact=self.bitexact,
                               reduction_factor=self.reduction_factor)
        fast = self._fast_launch(hdr)
        if fast is not None:
            fg, packed = fast
            return self._finish(hdr, fg.tiles, fg.geom, packed)
        tiles = []
        for tileno in range(len(hdr.tiles)):
            tile = init_tile(hdr, tileno)
            decode_tile_packets(hdr, tileno, tile, self.max_layers)
            tiles.append(tile)

        if not _supported_on_device(hdr, tiles):
            logger.debug("decoder: falling back to host path")
            return host_decoder.decode_frame(
                data, bitexact=self.bitexact,
                reduction_factor=self.reduction_factor,
                max_layers=self.max_layers)

        return self._device_decode(hdr, tiles)

    def decode_async(self, data: bytes):
        """Parse + upload + dispatch without waiting for the device.

        Returns a zero-argument callable producing the DecodedFrame; the
        device round-trip happens there. Pipelining pattern (the analog
        of the reference's frame threads, pthread_frame.c):

            pending = [dec.decode_async(s) for s in streams]
            frames = [p() for p in pending]
        """
        hdr = parse_codestream(data, bitexact=self.bitexact,
                               reduction_factor=self.reduction_factor)
        fast = self._fast_launch(hdr)
        if fast is not None:
            fg, packed = fast
            return lambda: self._finish(hdr, fg.tiles, fg.geom, packed)
        tiles = []
        for tileno in range(len(hdr.tiles)):
            tile = init_tile(hdr, tileno)
            decode_tile_packets(hdr, tileno, tile, self.max_layers)
            tiles.append(tile)
        if not _supported_on_device(hdr, tiles):
            frame = host_decoder.decode_frame(
                data, bitexact=self.bitexact,
                reduction_factor=self.reduction_factor,
                max_layers=self.max_layers)
            return lambda: frame
        geom, packed = self._launch(hdr, tiles)
        return lambda: self._finish(hdr, tiles, geom, packed)

    def decode_stream(self, streams, depth: int = 3):
        """Pipelined decode of a frame sequence (generator).

        The analog of the reference's frame threads (pthread_frame.c):
        up to `depth` frames are parsed and dispatched ahead so the
        device works on frame n while the host parses frame n+1; JAX's
        async dispatch provides the overlap without extra threads.
        """
        inflight = []
        for data in streams:
            inflight.append(self.decode_async(data))
            if len(inflight) >= depth:
                yield inflight.pop(0)()
        for fin in inflight:
            yield fin()

    def decode_batch(self, streams, mesh=None,
                     require_shard: bool = False) -> List[DecodedFrame]:
        """Decode many same-geometry frames in one device launch.

        The frame axis concatenates into the entropy kernel's lane axis
        (SURVEY.md §2.2 'frame batching'): F frames of N codeblocks run as
        one (F*N)-lane launch, saturating the VPU where a single frame's
        lane count cannot.

        `mesh`: a 1-axis jax.sharding.Mesh — the frame axis shards over
        its devices via shard_map (each device decodes len(streams)/D
        frames; embarrassingly parallel, no collectives — SURVEY §2.2
        multi-device row). F not divisible by D is padded by replicating
        the last frame (the pad decodes are dropped from the output).
        When the streams leave the sharded (v3) profile the batch decodes
        single-device: with require_shard=True that raises
        UnshardableBatch instead, and otherwise it logs a warning naming
        the reason — never a silent degradation (the reference's frame
        threading is likewise never silently 1, pthread_frame.c).
        """
        if mesh is not None:
            out, why = self._decode_batch_sharded(streams, mesh)
            if out is not None:
                return out
            if require_shard:
                raise UnshardableBatch(why)
            logger.warning("decode_batch: cannot shard (%s); "
                           "decoding single-device", why)
        import jax.numpy as jnp

        hdrs = [parse_codestream(data, bitexact=self.bitexact,
                                 reduction_factor=self.reduction_factor)
                for data in streams]
        fast = self._fast_batch(hdrs)
        if fast is not None:
            return fast

        parsed = []
        for hdr, data in zip(hdrs, streams):
            tiles = []
            for tileno in range(len(hdr.tiles)):
                tile = init_tile(hdr, tileno)
                decode_tile_packets(hdr, tileno, tile, self.max_layers)
                tiles.append(tile)
            parsed.append((hdr, tiles, data))

        if not all(_supported_on_device(h, t) for h, t, _ in parsed):
            return [self.decode(d) for _, _, d in parsed]

        geoms, bucket_maps, prefills = [], [], []
        for hdr, tiles, _ in parsed:
            g, b, p = _build_batch(hdr, tiles)
            geoms.append(g)
            bucket_maps.append(b)
            prefills.append(p)

        g0 = geoms[0]
        if any(g.key() != g0.key() for g in geoms[1:]):
            return [self.decode(d) for _, _, d in parsed]

        F = len(parsed)
        total = g0.total
        # merge buckets: dest indices shift by f*total per frame
        merged: Dict[Tuple[int, int], _Bucket] = {}
        for f, bmap in enumerate(bucket_maps):
            for key, b in bmap.items():
                m = merged.setdefault(key, _Bucket(b.w, b.h))
                for fld in ("rows", "lcup", "pcup", "pLSB", "maxbp", "magb",
                            "istep", "scale97", "fscale", "stride",
                            "dref", "zblk", "causal"):
                    getattr(m, fld).extend(getattr(b, fld))
                m.dest.extend(d + f * total for d in b.dest)
        prefill = np.concatenate([p[:-1] for p in prefills]
                                 + [np.zeros(1, prefills[0].dtype)])

        gm = _replicate_geometry(g0, F)

        buf = self._fetch_buf(self._dispatch(gm, merged, prefill),
                              gm.total, gm.cbps)
        if buf[-1] == 0:
            raise InvalidData("invalid HT codestream (U bound violated)")

        frames = []
        off = 0
        for f, (hdr, tiles, _) in enumerate(parsed):
            outs = []
            for (o, ph, pw) in g0.planes:
                outs.append(buf[off:off + ph * pw].reshape(ph, pw))
                off += ph * pw
            frames.append(self._assemble_frame(hdr, tiles, outs))
        return frames

    def _decode_batch_sharded(self, streams, mesh) -> \
            "Tuple[List[DecodedFrame] | None, str | None]":
        """Shard the frame axis of a same-geometry batch over a 1-axis
        device mesh: every device runs the fused v3 program on its own
        F/D frames (shard_map, no collectives). Returns (frames, None),
        or (None, reason) when the batch leaves the v3 profile — the
        caller warns or raises, never degrades silently."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ffmpeg_ht_tpu.models import assembly as ASM
        from ffmpeg_ht_tpu.models import fastpath as FP

        hdrs = [parse_codestream(data, bitexact=self.bitexact,
                                 reduction_factor=self.reduction_factor)
                for data in streams]
        if not hdrs:
            return None, "empty batch"
        if self.max_layers:
            return None, "max_layers truncation is per-frame host logic"
        for i, h in enumerate(hdrs):
            if not FP.fast_profile(h):
                return None, f"stream {i} leaves the fast-lane profile " \
                    "(POC/PPM/PPT/ROI/lowres/non-HTONLY/oversize cblk)"
        if len({FP.geometry_fingerprint(h) for h in hdrs}) != 1:
            return None, "streams do not share one geometry"
        fg = self._fast_geom(hdrs[0])
        if fg.v3_plan is None:
            fg.v3_plan = ASM.build_plan(fg) or False
        if fg.v3_plan is False or fg.ncblks == 0:
            return None, "geometry has no v3 assembly plan"
        D = int(np.prod(mesh.devices.shape))
        F = len(hdrs)
        axis = mesh.axis_names[0]
        total = fg.geom.total

        frames = []
        for i, hdr in enumerate(hdrs):
            cols = FP.parse_frame_flat(hdr, fg)
            if cols is None:
                return None, f"stream {i} failed the native flat parse"
            fc = FP.build_v3_frame(fg, cols)
            if fc is None:
                return None, f"stream {i} has host-only codeblocks"
            frames.append(fc)
        # pad the frame axis to a multiple of D by replicating the last
        # frame; the pad decodes are dropped below
        n_pad_frames = (-F) % D
        frames.extend([frames[-1]] * n_pad_frames)
        Fl = (F + n_pad_frames) // D
        args, _F = FP.finish_v3(fg, frames, total)

        # per-shard host-fallback prefill with SHARD-local lane-raster
        # indices (build_v3_frame emits gi*bh*bw + y*bw + x per frame)
        pdt = np.float32 if fg.geom.transform == mk.DWT97 else np.int32
        bh_l, bw_l = FP.lane_raster_dims(fg)
        lane_span = fg.ncblks * bh_l * bw_l
        shard_pf = []
        cap = 16
        for d in range(D):
            pi, pv = [], []
            for lf, fc in enumerate(frames[d * Fl:(d + 1) * Fl]):
                for (ridx, rval) in fc["host_pf"]:
                    pi.append(ridx + lf * lane_span)
                    pv.append(rval)
            pi = np.concatenate(pi).astype(np.int32) if pi \
                else np.zeros(0, np.int32)
            pv = np.concatenate(pv).astype(pdt) if pv \
                else np.zeros(0, pdt)
            shard_pf.append((pi, pv))
            while cap < len(pi):
                cap *= 2
        pf_idx = np.concatenate(
            [FP._pad(pi, cap, Fl * lane_span) for pi, _ in shard_pf]) \
            .astype(np.int32)
        pf_val = np.concatenate(
            [FP._pad(pv, cap, 0) for _, pv in shard_pf]).astype(pdt)

        mb = 1
        for fc in frames:
            devl = fc["qws"] > 0
            if devl.any():
                mb = max(mb, int(fc["maxbp"][devl].max()))
        if mb > 25:
            return None, "magnitude exponent > 25 (host-tier codeblocks)"
        ms_class = next(c for c in (8, 12, 16, 20, 25) if mb <= c)

        body = ASM.make_v3_program(
            fg.v3_plan, fg.geom.key(), qw=fg.v3_plan.bw // 2,
            qh=fg.v3_plan.bh // 2, ms_class=ms_class, n_pad=fg.ncblks,
            frames=Fl, as_jit=False)

        names = ("msw", "melw", "vlcw", "pLSB", "maxbp", "ms_lim",
                 "mel_lim", "qws", "qhs", "magb", "istep", "scale97",
                 "fscale", "pf_idx", "pf_val")
        args["pf_idx"] = jnp.asarray(pf_idx)
        args["pf_val"] = jnp.asarray(pf_val)

        fn = lambda *a: body(**dict(zip(names, a)))
        specs = dict(mesh=mesh, in_specs=tuple(P(axis) for _ in names),
                     out_specs=P(axis))
        try:
            # the scan carries start replicated and become device-varying
            # on the first iteration; the decode is per-device-local, so
            # the varying-manual-axes check is disabled
            sm = jax.shard_map(fn, check_vma=False, **specs)
        except TypeError:
            sm = jax.shard_map(fn, check_rep=False, **specs)
        sharded = jax.jit(sm)
        sh = NamedSharding(mesh, P(axis))
        vals = [jax.device_put(args[k], sh) for k in names]
        buf = np.asarray(sharded(*vals))

        out_frames = []
        span = Fl * total + 1
        for d in range(D):
            piece = buf[d * span:(d + 1) * span]
            if piece[-1] == 0:
                raise InvalidData(
                    "invalid HT codestream (U bound violated)")
            off = 0
            for lf in range(Fl):
                if d * Fl + lf >= F:        # frame-axis padding
                    break
                outs = []
                for (o, ph, pw) in fg.geom.planes:
                    outs.append(piece[off:off + ph * pw].reshape(ph, pw))
                    off += ph * pw
                hdr = hdrs[d * Fl + lf]
                out_frames.append(
                    self._assemble_frame(hdr, fg.tiles, outs))
        return out_frames, None

    def _dispatch(self, geom: _Geometry, buckets, prefill):
        """Pack buckets, upload, and run entropy + assembly (no host sync).

        The single shared tail of _launch (one frame) and decode_batch
        (merged frames): bucket packing, sparse prefill upload, entropy
        kernels, and the per-geometry assembly program.
        """
        import jax.numpy as jnp

        keys = sorted(buckets.keys())
        shapes, bucket_args = [], []
        for key in keys:
            args, _n = _bucket_arrays(buckets[key])
            w, h = key[0], key[1]
            # quantized MagSgn budget class: static per executable, must
            # bound every real lane's maxbp (blocks > 25 went to host)
            mb = max(buckets[key].maxbp)
            ms_class = next(c for c in (8, 12, 16, 20, 25) if mb <= c)
            shapes.append((-(-w // 2), -(-h // 2), w, h, ms_class,
                           buckets[key].refined))
            bucket_args.append({k: jnp.asarray(v) for k, v in args.items()})

        # sparse prefill: only the host-decoded sliver coefficients cross
        # the link (the dense buffer is materialized on device)
        nz = np.nonzero(prefill[:-1])[0]
        if len(nz):
            pf_idx = nz.astype(np.int32)
            pf_val = prefill[nz]
        else:
            pf_idx = np.array([geom.total], np.int32)
            pf_val = np.zeros(1, prefill.dtype)
        return self._dispatch_args(geom, shapes, bucket_args, pf_idx,
                                   pf_val)

    def _dispatch_args(self, geom: _Geometry, shapes, bucket_args,
                       pf_idx, pf_val):
        """Entropy + assembly launch from prepacked bucket args."""
        import jax.numpy as jnp

        mus, oks = _entropy_stage(shapes, bucket_args)
        fn = _compiled_assembly(tuple(shapes), geom.key(),
                                wire_pack=self._wp(geom.cbps))
        return fn(jnp.asarray(pf_idx), jnp.asarray(pf_val), mus, oks,
                  bucket_args)

    _FAST_GEOMS: Dict[Tuple, object] = {}   # bounded in _fast_geom

    def bench_resident(self, streams, n_it: int = 10, reps: int = 3,
                       return_state: bool = False, kernel_variants=None):
        """Device-resident decode rate for same-geometry streams.

        Stages the frames' lane arrays on device once, builds ONE fused
        v3 program over all F frames (donated packed buffer), then runs
        reps x n_it back-to-back decodes synced by a scalar fetch —
        the chip rate a direct-attached deployment sustains, excluding
        the host parse and the output-fetch link. This is the headline
        methodology of bench.py, exposed so `jxt decode --benchmark
        --device-resident` reproduces it on any user stream.

        Returns {"fps", "ms_per_frame", "frames_merged"}; raises
        ValueError when the geometry leaves the fused fast lane.
        With return_state=True also returns (fg, fcs, args, ms_class,
        no_istep) for callers that probe stages (bench.py).
        """
        import time

        import jax.numpy as jnp

        from ffmpeg_ht_tpu.models import assembly as ASM
        from ffmpeg_ht_tpu.models import fastpath as FP

        hdrs = [parse_codestream(s, bitexact=self.bitexact)
                for s in streams]
        fg = self._fast_geom(hdrs[0])
        if fg.v3_plan is None:
            fg.v3_plan = ASM.build_plan(fg) or False
        if not fg.v3_plan:
            raise ValueError("geometry not v3-capable")
        fcs = []
        for h in hdrs:
            cols = FP.parse_frame_flat(h, fg)
            fc = FP.build_v3_frame(fg, cols) if cols is not None else None
            if fc is None:
                raise ValueError("stream not v3-capable")
            fcs.append(fc)
        args, F = FP.finish_v3(fg, fcs, fg.geom.total)
        mb = 1
        for fc in fcs:
            devl = fc["qws"] > 0
            if devl.any():
                mb = max(mb, int(fc["maxbp"][devl].max()))
        if mb > 25:
            raise ValueError("stream beyond the MagSgn read cap")
        ms_class = next(c for c in (8, 12, 16, 20, 25) if mb <= c)
        no_istep = bool(np.all(np.asarray(args["istep"]) == 32768))
        prog = ASM.make_v3_program(
            fg.v3_plan, fg.geom.key(), qw=fg.v3_plan.bw // 2,
            qh=fg.v3_plan.bh // 2, ms_class=ms_class, n_pad=fg.ncblks,
            frames=F, donate=True, no_istep=no_istep,
            kernel_variants=kernel_variants)
        shape, dt = ASM.packed_shape(fg.geom.key(), F)
        packed = prog(jnp.zeros(shape, dt), **args)
        _sync = np.asarray(packed[-1])          # compile + warmup
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(n_it):
                packed = prog(packed, **args)
            _sync = np.asarray(packed[-1])
            best = min(best, (time.perf_counter() - t0) / n_it)
        res = {"fps": F / best, "ms_per_frame": best * 1e3 / F,
               "frames_merged": F}
        if return_state:
            return res, (fg, fcs, args, ms_class, no_istep)
        return res

    def _fast_launch(self, hdr):
        """Flat-array lane (models/fastpath.py): native T2 + array
        batching; None when the stream leaves the fast profile."""
        from ffmpeg_ht_tpu.models import fastpath as FP
        if self.max_layers or not FP.fast_profile(hdr):
            return None
        fg = self._fast_geom(hdr)
        cols = FP.parse_frame_flat(hdr, fg)
        if cols is None:
            return None
        packed = self._v3_launch(fg, [cols])
        if packed is not None:
            return fg, packed
        accum = FP.build_bucket_args(fg, cols)
        shapes, bucket_args, pf_idx, pf_val = FP.finish_buckets(
            accum, fg.geom.total)
        packed = self._dispatch_args(fg.geom, shapes, bucket_args,
                                     pf_idx, pf_val)
        return fg, packed

    def _v3_launch(self, fg, cols_list):
        """v3 merged-bucket fused program (models/assembly.py); None when
        the geometry/frames need the v2 bucketed path."""
        import os
        if os.environ.get("FFMPEG_HT_TPU_V3", "1") == "0":
            return None
        from ffmpeg_ht_tpu.models import assembly as ASM
        from ffmpeg_ht_tpu.models import fastpath as FP
        if fg.v3_plan is None:
            fg.v3_plan = ASM.build_plan(fg) or False
        if fg.v3_plan is False or fg.ncblks == 0:
            return None
        frames = []
        for cols in cols_list:
            fc = FP.build_v3_frame(fg, cols)
            if fc is None:
                return None
            frames.append(fc)
        args, F = FP.finish_v3(fg, frames, fg.geom.total)
        mb = 1
        for fc in frames:
            devl = fc["qws"] > 0
            if devl.any():
                mb = max(mb, int(fc["maxbp"][devl].max()))
        if mb > 25:
            return None
        ms_class = next(c for c in (8, 12, 16, 20, 25) if mb <= c)
        # lossless (QSTY_NONE) frames: istep is uniformly the identity
        # 32768, so the dequant multiply is dead — compile it out
        no_istep = bool(np.all(np.asarray(args["istep"]) == 32768))
        wp = self._wp(fg.geom.cbps)
        key = (F, ms_class, no_istep, wp)
        prog = fg.v3_progs.get(key)
        if prog is None:
            prog = ASM.make_v3_program(
                fg.v3_plan, fg.geom.key(), qw=fg.v3_plan.bw // 2,
                qh=fg.v3_plan.bh // 2, ms_class=ms_class,
                n_pad=fg.ncblks, frames=F, no_istep=no_istep,
                wire_pack=wp)
            fg.v3_progs[key] = prog
        return prog(**args)

    @staticmethod
    def _fast_geom(hdr):
        from ffmpeg_ht_tpu.models import fastpath as FP
        key = FP.geometry_fingerprint(hdr)
        fg = Decoder._FAST_GEOMS.get(key)
        if fg is None:
            if len(Decoder._FAST_GEOMS) >= 32:   # bound the plan cache
                Decoder._FAST_GEOMS.pop(next(iter(Decoder._FAST_GEOMS)))
            fg = FP.FlatGeometry(hdr)
            Decoder._FAST_GEOMS[key] = fg
        return fg

    def _fast_batch(self, hdrs) -> "List[DecodedFrame] | None":
        """Flat-array lane for decode_batch: per-frame native T2 parses
        accumulate into shared buckets with frame-shifted dest indices."""
        from ffmpeg_ht_tpu.models import fastpath as FP
        if self.max_layers or not hdrs \
                or not all(FP.fast_profile(h) for h in hdrs):
            return None
        keys = {FP.geometry_fingerprint(h) for h in hdrs}
        if len(keys) != 1:
            return None
        keys.pop()
        fg = self._fast_geom(hdrs[0])
        F = len(hdrs)
        total = fg.geom.total
        cols_list = []
        for h in hdrs:
            cols = FP.parse_frame_flat(h, fg)
            if cols is None:
                return None
            cols_list.append(cols)
        packed = self._v3_launch(fg, cols_list)
        if packed is not None:
            buf = self._fetch_buf(packed, F * total, fg.geom.cbps)
        else:
            accum = None
            for f, cols in enumerate(cols_list):
                accum = FP.build_bucket_args(fg, cols,
                                             dest_shift=f * total,
                                             prev=accum)
            shapes, bucket_args, pf_idx, pf_val = FP.finish_buckets(
                accum, F * total)
            gm = _replicate_geometry(fg.geom, F)
            buf = self._fetch_buf(
                self._dispatch_args(gm, shapes, bucket_args,
                                    pf_idx, pf_val),
                gm.total, gm.cbps)
        if buf[-1] == 0:
            raise InvalidData("invalid HT codestream (U bound violated)")
        frames = []
        off = 0
        for f, hdr in enumerate(hdrs):
            outs = []
            for (o, ph, pw) in fg.geom.planes:
                outs.append(buf[off:off + ph * pw].reshape(ph, pw))
                off += ph * pw
            frames.append(self._assemble_frame(hdr, fg.tiles, outs))
        return frames

    def _launch(self, hdr, tiles):
        """Upload + dispatch the device program; no host sync.

        Returns (geom, packed-output device array). The caller fetches
        the single packed buffer when it needs the pixels — keeping the
        sync points to one per frame lets callers software-pipeline
        (parse frame n+1 while the device decodes frame n).
        """
        geom, buckets, prefill = _build_batch(hdr, tiles)
        return geom, self._dispatch(geom, buckets, prefill)

    def _device_decode(self, hdr, tiles) -> DecodedFrame:
        geom, packed = self._launch(hdr, tiles)
        return self._finish(hdr, tiles, geom, packed)

    def _finish(self, hdr, tiles, geom, packed) -> DecodedFrame:
        buf = self._fetch_buf(packed, geom.total, geom.cbps)
        if buf[-1] == 0:
            raise InvalidData("invalid HT codestream (U bound violated)")
        outs = []
        off = 0
        for (o, ph, pw) in geom.planes:
            outs.append(buf[off:off + ph * pw].reshape(ph, pw))
            off += ph * pw
        return self._assemble_frame(hdr, tiles, outs)

    def _assemble_frame(self, hdr, tiles, outs) -> DecodedFrame:
        """write_frame semantics on device output (host side)."""
        siz = hdr.siz
        fmt = pf.negotiate(siz, hdr.colour_space, siz.rsiz)
        precision = pf.output_precision(fmt, siz.precision)
        dimx, dimy = host_decoder._frame_dims(hdr)
        planes = pf.alloc_frame(fmt, dimx, dimy)
        cdef = hdr.cdef if hdr.cdef else [-1] * 4
        if any(c < 0 for c in cdef[:siz.ncomponents]):
            cdef = [i + 1 for i in range(4)]
            if siz.ncomponents % 2 == 0:
                cdef[siz.ncomponents - 1] = 0

        k = 0
        for tileno, tile in enumerate(tiles):
            comp_planes = []
            for compno in range(len(tile.comp)):
                comp_planes.append(outs[k].astype(np.int64))
                k += 1
            _write_frame_prescaled(hdr, tile, comp_planes, fmt, planes,
                                   precision, cdef)
        return DecodedFrame(fmt=fmt, width=dimx, height=dimy, planes=planes)


def _write_frame_prescaled(hdr, tile, comp_planes, fmt, planes, precision,
                           cdef):
    """write_frame for device output (already DC-shifted and clipped)."""
    siz = hdr.siz
    for compno, comp in enumerate(tile.comp):
        cbps = siz.components[compno].depth
        cdx = siz.components[compno].dx
        cdy = siz.components[compno].dy
        vals = comp_planes[compno] << (precision - cbps)
        x0 = comp.coord[0][0] - ceildiv(siz.x0, cdx)
        y0 = comp.coord[1][0] - ceildiv(siz.y0, cdy)
        w = comp.coord[0][1] - ceildiv(siz.x0, cdx)
        h = comp.coord[1][1] - ceildiv(siz.y0, cdy)
        if fmt.planar:
            plane_idx = (cdef[compno] - 1) if cdef[compno] \
                else fmt.nb_components - 1
            planes[plane_idx][y0:h, x0:w] = vals
        else:
            nc = fmt.nb_components
            planes[0][y0:h, x0 * nc + compno:w * nc:nc] = vals[:, :w - x0]


def decode_frame_tpu(data: bytes, bitexact: bool = True,
                     reduction_factor: int = 0) -> DecodedFrame:
    """One-shot convenience wrapper around Decoder."""
    return Decoder(bitexact=bitexact,
                   reduction_factor=reduction_factor).decode(data)
