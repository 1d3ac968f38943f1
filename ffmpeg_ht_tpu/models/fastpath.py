"""Flat-array fast lane: native T2 parse + array-level batching.

The object-tree decode path (t2.decode_tile_packets filling Cblk objects,
then models.decoder._build_batch walking them) costs Python-interpreter
time per codeblock — the measured host ceiling once the device entropy
kernel is fast (VERDICT round-1 items 5 and 7). This lane removes every
per-codeblock Python step for the flagship profile:

  markers parse (unchanged, cheap)
    -> native packet-header parse (native/t2parse.c) into flat arrays
    -> numpy bucketing over those arrays (models.decoder._dispatch_args)

The *geometry* — codeblock dims, destination indices, per-band dequant
constants, packet order, tag-tree shapes — depends only on the header
parameters, so it is flattened once per geometry and cached; steady-state
frames touch no Python object tree at all.

Profile: HTONLY codeblock style, single quality layer, no POC/PPM/PPT, no
ROI, device transforms, codeblocks <= 64x64. Anything else returns None
and the caller uses the object path.
"""

from __future__ import annotations

from typing import Dict, List, Optional  # noqa: F401

import numpy as np

from ffmpeg_ht_tpu.codestream import markers as mk
from ffmpeg_ht_tpu.codestream.geometry import init_tile
from ffmpeg_ht_tpu.codestream.t2 import packet_order
from ffmpeg_ht_tpu.utils.errors import InvalidData

_HOST_AREA = 256           # keep in sync with models.decoder


def fast_profile(hdr) -> bool:
    """Header-only check that every codeblock will fit the fast lane."""
    if hdr.has_ppm and any(len(th.tile_parts) != 1 for th in hdr.tiles):
        # multiple tile-parts share one tp_index cursor between the body
        # and PPM header streams (t2._TileStreams); the flat lane's
        # concatenated-header read is only exactly equivalent with one
        # tile-part per tile (our encoder's PPM form)
        return False
    transform = None
    for th in hdr.tiles:
        if any(r for r in th.roi_shift):
            return False
        for codsty, qntsty in zip(th.codsty, th.qntsty):
            if codsty.cblk_style != mk.CTSY_HTJ2K_F:
                return False
            if codsty.nlayers > 8 \
                    or codsty.nlayers != th.codsty[0].nlayers:
                return False
            if codsty.log2_cblk_width > 6 or codsty.log2_cblk_height > 6:
                return False
            if codsty.transform not in (mk.DWT53, mk.DWT97_INT, mk.DWT97):
                return False
            if transform is None:
                transform = codsty.transform
            elif codsty.transform != transform:
                return False
            for sb in range(codsty.nreslevels2decode * 3 - 2):
                if qntsty.expn[sb] + qntsty.nguardbits - 1 >= 31:
                    return False
    return True


class FlatGeometry:
    """Per-geometry static plan (cached across frames)."""

    __slots__ = ("tiles", "geom", "w", "h", "dest", "stride",
                 "magb", "istep", "scale97", "fscale", "fstep", "ncblks",
                 "tile_pkts", "tile_range", "area_small", "prec_list",
                 "v3_plan", "v3_progs")

    def __init__(self, hdr):
        from ffmpeg_ht_tpu.models import decoder as D
        from ffmpeg_ht_tpu.ops.dequant import int97_scale

        tiles = []
        for tileno in range(len(hdr.tiles)):
            tiles.append(init_tile(hdr, tileno))
        self.tiles = tiles

        transform = tiles[0].codsty[0].transform if tiles else mk.DWT53

        planes = []
        borders = []
        ndecs = []
        tci = []
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
            tci.append(idxs)

        self.geom = D._Geometry(
            planes=planes, borders=tuple(borders), ndecs=tuple(ndecs),
            mct=tuple(bool(t.codsty[0].mct) for t in tiles),
            tile_comp_index=tci, cbps=hdr.siz.components[0].depth,
            total=offset, transform=transform)

        # flat per-cblk geometry in (tile, comp, reslevel, band, precinct,
        # cblk) order — the same order _build_batch walks
        cols: Dict[str, List] = {k: [] for k in (
            "w", "h", "dest", "stride", "magb", "istep", "scale97",
            "fscale", "fstep")}
        # v3 assembly-plan raw material: one entry per precinct instance,
        # (abs_lane_start, ch, cw, plane_idx, tileno, compno, rlno, bandno)
        self.prec_list = []
        self.v3_plan = None        # built lazily by models.assembly
        self.v3_progs = {}         # (F, ms_class) -> fused program
        # per-tile: packet metadata for the native parser
        self.tile_pkts = []
        self.tile_range = []
        # per (tile, comp, reslevel, precno) -> list of band instances
        for tileno, tile in enumerate(tiles):
            cblk_base = len(cols["w"])
            prec_map = {}
            tree_count = 0
            # lowres: packets of reslevels >= nreslevels2decode still
            # occupy the stream, so the native parser must walk them
            # (tag trees and all); their codeblocks land in a discard
            # zone after the tile's kept codeblocks (negative base
            # markers resolved below) and never reach cols/prec_list —
            # the parse advances, the coefficients are dropped
            # (ref: jpeg2000dec.c:509-520 reslevels2decode)
            dropped = 0
            for compno, comp in enumerate(tile.comp):
                qntsty = tile.qntsty[compno]
                nres2dec = tile.codsty[compno].nreslevels2decode
                poff = planes[tci[tileno][compno]][0]
                pstride = planes[tci[tileno][compno]][2]
                subbandno = 0
                for rlno, rl in enumerate(comp.reslevel):
                    for bandno, band in enumerate(rl.band):
                        magb = qntsty.expn[subbandno] \
                            + qntsty.nguardbits - 1
                        subbandno += 1
                        if (band.coord[0][0] >= band.coord[0][1]
                                or band.coord[1][0] >= band.coord[1][1]):
                            continue
                        if rlno >= nres2dec:
                            for precno, prec in enumerate(band.prec):
                                cw = prec.nb_codeblocks_width
                                ch = prec.nb_codeblocks_height
                                prec_map.setdefault(
                                    (compno, rlno, precno), []).append(
                                    (-(dropped + 1), cw, ch, magb,
                                     tree_count))
                                tree_count += 1
                                dropped += cw * ch
                            continue
                        s97 = int97_scale(band.f_stepsize, magb) \
                            if transform == mk.DWT97_INT else 0
                        fsc = float(np.float32(band.f_stepsize)
                                    / np.float32(1 << (31 - magb))) \
                            if transform == mk.DWT97 else 0.0
                        for precno, prec in enumerate(band.prec):
                            # tile-relative: the native parser indexes
                            # its outputs from this tile's first cblk
                            base = len(cols["w"]) - cblk_base
                            cw = prec.nb_codeblocks_width
                            ch = prec.nb_codeblocks_height
                            prec_map.setdefault(
                                (compno, rlno, precno), []).append(
                                (base, cw, ch, magb, tree_count))
                            tree_count += 1
                            self.prec_list.append(
                                (len(cols["w"]), ch, cw,
                                 tci[tileno][compno], tileno, compno,
                                 rlno, bandno))
                            for cblk in prec.cblk:
                                x = cblk.coord[0][0] - band.coord[0][0]
                                y = cblk.coord[1][0] - band.coord[1][0]
                                cols["w"].append(cblk.width)
                                cols["h"].append(cblk.height)
                                cols["dest"].append(
                                    poff + y * pstride + x)
                                cols["stride"].append(pstride)
                                cols["magb"].append(magb)
                                cols["istep"].append(band.i_stepsize)
                                cols["scale97"].append(s97)
                                cols["fscale"].append(fsc)
                                cols["fstep"].append(
                                    float(band.f_stepsize))
            # packets in stream order (all quality layers)
            th = hdr.tiles[tileno]
            nlayers = th.codsty[0].nlayers
            order = packet_order(hdr, th, tile, nlayers)
            pkt_nband, pkt_csty, pkt_style, pkt_layno = [], [], [], []
            bi_base, bi_cw, bi_ch, bi_magb, bi_tree = [], [], [], [], []
            kept_n = len(cols["w"]) - cblk_base
            for (compno, rlno, precno, layno) in order:
                bis = prec_map.get((compno, rlno, precno), [])
                pkt_nband.append(len(bis))
                pkt_csty.append(th.codsty[compno].csty)
                pkt_style.append(th.codsty[compno].cblk_style)
                pkt_layno.append(layno)
                for (base, cw, ch, magb, tid) in bis:
                    # negative = lowres discard zone after the kept cblks
                    bi_base.append(base if base >= 0
                                   else kept_n + (-base - 1))
                    bi_cw.append(cw)
                    bi_ch.append(ch)
                    bi_magb.append(magb)
                    bi_tree.append(tid)
            self.tile_pkts.append((
                np.asarray(pkt_nband, np.int32),
                np.asarray(pkt_csty, np.int32),
                np.asarray(pkt_style, np.int32),
                np.asarray(pkt_layno, np.int32),
                np.asarray(bi_base, np.int32),
                np.asarray(bi_cw, np.int32),
                np.asarray(bi_ch, np.int32),
                np.asarray(bi_magb, np.int32),
                np.asarray(bi_tree, np.int32),
                tree_count, nlayers, kept_n + dropped))
            self.tile_range.append((cblk_base, len(cols["w"])))

        for k in ("w", "h", "dest", "stride", "magb", "istep", "scale97"):
            setattr(self, k, np.asarray(cols[k], np.int64))
        self.fscale = np.asarray(cols["fscale"], np.float64)
        self.fstep = np.asarray(cols["fstep"], np.float64)
        self.ncblks = len(cols["w"])
        self.area_small = (self.w * self.h) < _HOST_AREA


def geometry_fingerprint(hdr):
    """Hashable key over every header field the flat geometry reads."""
    siz = hdr.siz
    key = [siz.width, siz.height, siz.x0, siz.y0, siz.tile_width,
           siz.tile_height, siz.tx0, siz.ty0,
           hdr.reduction_factor,
           tuple((c.depth, c.sgnd, c.dx, c.dy) for c in siz.components)]
    for th in hdr.tiles:
        # POC rewrites the packet order baked into tile_pkts
        key.append(tuple((e.rspoc, e.cspoc, e.lyepoc, e.repoc, e.cepoc,
                          e.ppoc) for e in th.poc.entries))
        for codsty, qntsty in zip(th.codsty, th.qntsty):
            key.append((codsty.csty, codsty.prog_order, codsty.nlayers,
                        codsty.nreslevels, codsty.nreslevels2decode,
                        codsty.log2_cblk_width, codsty.log2_cblk_height,
                        codsty.cblk_style, codsty.transform, codsty.mct,
                        tuple(codsty.log2_prec_widths),
                        tuple(codsty.log2_prec_heights)))
            key.append((qntsty.quantsty, qntsty.nguardbits,
                        tuple(qntsty.expn), tuple(qntsty.mant)))
    return tuple(map(lambda v: tuple(v) if isinstance(v, list) else v, key))


def parse_frame_flat(hdr, fg: FlatGeometry) -> Optional[dict]:
    """Native T2 parse of every tile into flat per-cblk columns.

    Returns dict(body, off, len, lcup, lref, zbp, npasses, incl) with
    body a single contiguous bytes-like buffer (each codeblock's segments
    gathered across quality layers), or None if the native tier is
    unavailable or a packet leaves the supported profile."""
    from ffmpeg_ht_tpu.utils import native

    bodies = []
    outs = []
    base_off = 0
    multilayer = False
    if hdr.has_ppm:
        from ffmpeg_ht_tpu.codestream.t2 import distribute_ppm_headers
        distribute_ppm_headers(hdr)
    for tileno, th in enumerate(hdr.tiles):
        parts = sorted(th.tile_parts, key=lambda tp: tp.tp_index)
        body = b"".join(bytes(tp.data) for tp in parts)
        # packed packet headers (PPM: per-tile-part slices, gated to one
        # part per tile; PPT: the tile's accumulated buffer)
        pph = None
        if hdr.has_ppm:
            pph = b"".join(bytes(tp.ppm_header or b"") for tp in parts)
        elif th.has_ppt:
            pph = bytes(th.packed_headers)
        (pkt_nband, pkt_csty, pkt_style, pkt_layno,
         bi_base, bi_cw, bi_ch, bi_magb, bi_tree,
         n_trees, nlayers, n_parse) = fg.tile_pkts[tileno]
        lo, hi = fg.tile_range[tileno]
        o = native.t2_parse_packets(body, pkt_nband, pkt_csty, pkt_style,
                                    pkt_layno, bi_base, bi_cw, bi_ch,
                                    bi_magb, bi_tree, n_trees, 0,
                                    n_parse, max(nlayers, 1), pph=pph)
        if o is None:
            return None
        if n_parse > hi - lo:       # lowres: drop the discard zone
            o = {k: v[:hi - lo] for k, v in o.items()}
        o["seg_off"] = o["seg_off"] + base_off
        multilayer = multilayer or nlayers > 1
        bodies.append(body)
        outs.append(o)
        base_off += len(body)

    cols = {k: np.concatenate([o[k] for o in outs]) if len(outs) > 1
            else outs[0][k]
            for k in ("incl", "zbp", "nzb", "npasses", "lcup", "lref",
                      "len", "nseg")}
    full = bodies[0] if len(bodies) == 1 else b"".join(bodies)
    seg_off = np.concatenate([o["seg_off"] for o in outs]) \
        if len(outs) > 1 else outs[0]["seg_off"]
    seg_len = np.concatenate([o["seg_len"] for o in outs]) \
        if len(outs) > 1 else outs[0]["seg_len"]

    if not multilayer or int(cols["nseg"].max(initial=0)) <= 1:
        cols["off"] = seg_off[:, 0].copy()
        cols["body"] = full
    else:
        # gather each codeblock's per-layer segments into one contiguous
        # run — pure data movement, native memcpy loop (seggather.c;
        # the vectorized numpy fallback below cost ~580 ms on an 8K
        # 2-layer frame against ~3 ms native)
        tot = cols["len"]
        N = len(tot)
        new_off = np.zeros(N, np.int64)
        np.cumsum(tot[:-1], out=new_off[1:])
        buf = np.frombuffer(full, np.uint8)
        out = native.seg_gather(buf, seg_off, seg_len, cols["nseg"],
                                new_off, int(tot.sum()))
        if out is not None:
            cols["off"] = new_off
            cols["body"] = out.tobytes()
            return _finish_cols(cols)
        out_body = np.zeros(int(tot.sum()), np.uint8)
        cum = np.cumsum(seg_len, axis=1)               # (N, S)
        prev = np.concatenate(
            [np.zeros((N, 1), np.int64), cum[:, :-1]], axis=1)
        step = max(1, (1 << 24) // max(int(tot.max(initial=1)), 1))
        for c0 in range(0, N, step):
            c1 = min(c0 + step, N)
            t = tot[c0:c1]
            lmax = int(t.max(initial=1))
            pos = np.arange(lmax)[None, :]
            seg_id = np.zeros((c1 - c0, lmax), np.int64)
            for s in range(seg_len.shape[1] - 1):
                seg_id += (cum[c0:c1, s:s + 1] <= pos)
            src = (np.take_along_axis(seg_off[c0:c1], seg_id, axis=1)
                   + pos
                   - np.take_along_axis(prev[c0:c1], seg_id, axis=1))
            valid = pos < t[:, None]
            vals = buf[np.minimum(np.where(valid, src, 0),
                                  len(buf) - 1)]
            dst = new_off[c0:c1, None] + pos
            out_body[dst[valid]] = vals[valid]
        cols["off"] = new_off
        cols["body"] = out_body.tobytes()

    return _finish_cols(cols)


def _finish_cols(cols: dict) -> dict:
    # error parity with the object path (_build_batch raises on lcup < 2
    # for any included codeblock; ht_dec.py:618-619)
    inc = cols["incl"].astype(bool) & (cols["npasses"] > 0)
    if np.any(inc & (cols["lcup"] < 2)):
        raise InvalidData("cleanup pass length < 2")
    cols["active"] = inc
    return cols


def build_bucket_args(fg: FlatGeometry, cols: dict, dest_shift=0,
                      prev=None):
    """Array-level replacement of _build_batch + _bucket_arrays.

    Returns (accum) where accum collects per-bucket lane columns across
    frames (decode_batch merges by calling repeatedly with dest_shift);
    finish_buckets() turns it into the (shapes, bucket_args, pf) triple
    _dispatch_args consumes.
    """
    body = np.frombuffer(cols["body"], np.uint8)
    act = cols["active"]
    idx = np.nonzero(act)[0]
    if len(idx) == 0 and prev is None:
        prev = {"buckets": {}, "pf_idx": [], "pf_val": [], "fg": fg}
        return prev

    zbp = cols["zbp"][idx]
    npasses = cols["npasses"][idx]
    lcup = cols["lcup"][idx]
    lref = cols["lref"][idx]
    off = cols["off"][idx]
    w = fg.w[idx]
    h = fg.h[idx]

    # z_blk from npasses (ht_dec.py:609-612); placeholder passes shift
    # the bitplane: S_blk = p0 + zbp (ht_dec.py:611,627). zbp_eff is the
    # device-lane view (pLSB/maxbp math); the host oracle takes the RAW
    # zbp because decode_htj2k re-derives p0 from npasses itself.
    rem = npasses % 3
    plhd = np.where(rem, npasses - rem, npasses - 3)
    zblk = npasses - plhd
    zbp_eff = zbp + plhd // 3

    # host-oracle lanes: edge slivers and extreme bitplanes
    host = fg.area_small[idx] | (zbp_eff + 1 > 25)
    accum = prev if prev is not None else {
        "buckets": {}, "pf_idx": [], "pf_val": [], "fg": fg}

    if np.any(host):
        from ffmpeg_ht_tpu.ops import dequant as dq
        from ffmpeg_ht_tpu.ops import ht_dec
        tf = fg.geom.transform
        for k in np.nonzero(host)[0]:
            gi = idx[k]
            data = cols["body"][off[k]:off[k] + cols["len"][gi]]
            t1 = ht_dec.decode_htj2k(
                bytes(data), int(npasses[k]), int(cols["zbp"][gi]),
                [int(lcup[k]), int(lref[k])], int(w[k]), int(h[k]),
                int(fg.magb[gi]), 0, 0)
            if tf == mk.DWT97:
                blk = dq.dequant_float(
                    t1, float(fg.fstep[gi]), int(fg.magb[gi]))
            elif tf == mk.DWT97_INT:
                blk = dq.dequant_int_97(
                    t1, float(fg.fstep[gi]), int(fg.magb[gi]))
            else:
                blk = dq.dequant_int(t1, int(fg.istep[gi]),
                                     int(fg.magb[gi]))
            base = int(fg.dest[gi]) + dest_shift
            stride = int(fg.stride[gi])
            rows = base + np.arange(int(h[k]))[:, None] * stride \
                + np.arange(int(w[k]))[None, :]
            accum["pf_idx"].append(rows.ravel())
            accum["pf_val"].append(np.asarray(blk).ravel())

    dev = ~host
    di = idx[dev]
    if len(di) == 0:
        return accum
    w, h = fg.w[di], fg.h[di]
    lcup, lref = cols["lcup"][di], cols["lref"][di]
    off = cols["off"][di]
    zbp = zbp_eff[dev]
    zblk = zblk[dev]

    # Scup from the last two cleanup bytes (vectorized; error parity with
    # _build_batch / jpeg2000htdec.c:1265-1273)
    b_last = body[off + lcup - 1].astype(np.int64)
    b_prev = body[off + lcup - 2].astype(np.int64)
    scup = (b_last << 4) + (b_prev & 0x0F)
    if np.any((scup < 2) | (scup > lcup) | (scup > 4079)):
        raise InvalidData("invalid Scup")

    # length class (same pow2 rule as _build_batch)
    need = (8 * lcup + 96) // 32
    wc = np.maximum(16, 1 << np.ceil(np.log2(np.maximum(need, 1))
                                     ).astype(np.int64))
    keycode = (w.astype(np.int64) << 40) | (h.astype(np.int64) << 24) | wc
    uniq, inv = np.unique(keycode, return_inverse=True)
    for u_i, u in enumerate(uniq):
        lane_sel = inv == u_i
        li = di[lane_sel]
        b = accum["buckets"].setdefault(
            (int(u >> 40), int((u >> 24) & 0xFFFF), int(u & 0xFFFFFF)),
            {"rows": [], "gi": [], "zbp": [], "dest": []})
        b["rows"].append((cols["body"], off[lane_sel], lcup[lane_sel],
                          lref[lane_sel], zblk[lane_sel]))
        b["gi"].append(li)
        b["zbp"].append(zbp[lane_sel])
        b["dest"].append(fg.dest[li] + dest_shift)
    return accum


def finish_buckets(accum, total):
    """(shapes, bucket_args, pf_idx, pf_val) for decoder._dispatch_args."""
    import jax.numpy as jnp

    from ffmpeg_ht_tpu.models import decoder as D
    from ffmpeg_ht_tpu.ops.ht_batch import prepare_streams_with_limits

    fg = accum["fg"]
    shapes, bucket_args = [], []
    for key in sorted(accum["buckets"].keys()):
        b = accum["buckets"][key]
        w, h, wc = key
        gi = np.concatenate(b["gi"])
        zbp = np.concatenate(b["zbp"])
        dest = np.concatenate(b["dest"])
        n = len(gi)
        npad = D._pow2(n, D._LANE_PAD)
        lmax = 4
        for (_, _, lc, _, _) in b["rows"]:
            if len(lc):
                lmax = max(lmax, int(lc.max()))
        data = np.zeros((npad, lmax), np.uint8)
        lcups = np.full(npad, 2, np.int64)
        pcups = np.zeros(npad, np.int64)
        zblk_all = np.zeros(npad, np.int64)
        lref_all = np.zeros(npad, np.int64)
        drefs = []
        r0 = 0
        for (bodyb, off, lc, lr, zb) in b["rows"]:
            for i in range(len(off)):
                row = np.frombuffer(bodyb, np.uint8,
                                    int(lc[i]), int(off[i]))
                data[r0, :len(row)] = row
                if zb[i] > 1 and lr[i] > 0:
                    drefs.append((r0, bodyb, int(off[i] + lc[i]),
                                  int(lr[i])))
                r0 += 1
            lcups[r0 - len(off):r0] = lc
            zblk_all[r0 - len(off):r0] = zb
            lref_all[r0 - len(off):r0] = lr
        # modDcup + Scup (vectorized)
        scup = ((data[np.arange(npad), lcups - 1].astype(np.int64) << 4)
                + (data[np.arange(npad), lcups - 2] & 0x0F))
        data[np.arange(npad), lcups - 1] = 0xFF
        data[np.arange(npad), lcups - 2] |= 0x0F
        pcups[:n] = lcups[:n] - scup[:n]
        pcups[n:] = 0

        (msw, melw, vlcw, ms_lim,
         mel_lim) = prepare_streams_with_limits(data, lcups, pcups)

        refined = bool((zblk_all > 1).any())
        args = dict(
            msw=msw, melw=melw, vlcw=vlcw, ms_lim=ms_lim, mel_lim=mel_lim,
            pLSB=np.where(np.arange(npad) < n, 30 - _pad(zbp, npad, 0),
                          2).astype(np.int32),
            maxbp=np.where(np.arange(npad) < n, _pad(zbp, npad, 31) + 1,
                           32).astype(np.int32),
            magb=_pad(fg.magb[gi], npad, 8).astype(np.int32),
            istep=_pad(fg.istep[gi], npad, 32768).astype(np.int32),
            scale97=_pad(fg.scale97[gi], npad, 0).astype(np.int32),
            fscale=_pad(fg.fscale[gi], npad, 0.0).astype(np.float32),
            dest=_pad(dest, npad, -1).astype(np.int32),
            stride=_pad(fg.stride[gi], npad, 0).astype(np.int32),
            nreal=n,
        )
        if refined:
            from ffmpeg_ht_tpu.ops.ht_batch import (prepare_magref_stream,
                                                    prepare_sigprop_stream)
            SP_CAP, MR_CAP = 1200, 650
            spmax = max((min(lr, SP_CAP) for (_, _, _, lr) in drefs),
                        default=4)
            mrmax = max((min(lr, MR_CAP) for (_, _, _, lr) in drefs),
                        default=4)
            dsp = np.zeros((npad, max(spmax, 4)), np.uint8)
            dmr = np.zeros((npad, max(mrmax, 4)), np.uint8)
            lsp = np.zeros(npad, np.int64)
            lmr = np.zeros(npad, np.int64)
            for (r, bodyb, o, lr) in drefs:
                ls = min(lr, SP_CAP)
                row = np.frombuffer(bodyb, np.uint8,
                                    min(ls, len(bodyb) - o), o)
                dsp[r, :len(row)] = row
                lsp[r] = ls
                lm = min(lr, MR_CAP)
                start = o + max(lr - MR_CAP, 0)
                avail = max(min(lr - max(lr - MR_CAP, 0),
                                len(bodyb) - start), 0)
                # left-align: missing tail bytes (truncated stream) read
                # as zeros, matching the oracle's end-of-stream extension
                trow = np.frombuffer(bodyb, np.uint8, avail, start)
                dmr[r, :len(trow)] = trow
                lmr[r] = lm
            args.update(
                spw=prepare_sigprop_stream(dsp, lsp),
                mrw=prepare_magref_stream(dmr, lmr),
                has_sp=(zblk_all >= 2)[:npad].astype(bool),
                has_mr=(zblk_all >= 3)[:npad].astype(bool),
                # fast_profile admits CTSY_HTJ2K_F only, never VSC
                causal=np.zeros(npad, bool))
        mb = int(zbp.max()) + 1 if n else 8
        ms_class = next(c for c in (8, 12, 16, 20, 25) if mb <= c)
        shapes.append((-(-w // 2), -(-h // 2), w, h, ms_class, refined))
        bucket_args.append({k: jnp.asarray(v) for k, v in args.items()})

    if accum["pf_idx"]:
        pf_idx = np.concatenate(accum["pf_idx"]).astype(np.int32)
        pf_val = np.concatenate(accum["pf_val"])
    else:
        pf_idx = np.array([total], np.int32)
        dt = np.float32 if fg.geom.transform == mk.DWT97 else np.int32
        pf_val = np.zeros(1, dt)
    return shapes, bucket_args, pf_idx, pf_val


def _pad(a, npad, fill):
    out = np.full(npad, fill, np.asarray(a).dtype
                  if np.asarray(a).dtype != np.float64 else np.float64)
    out[:len(a)] = a
    return out


# ---------------------------------------------------------------------------
# v3 merged-bucket lane (round 3): every codeblock of the frame decodes in
# ONE dims-masked entropy launch, lanes in geometry order, so the fused
# program (models/assembly.py) can assemble planes without scatter.
# ---------------------------------------------------------------------------


def lane_raster_dims(fg):
    """(bh, bw) of the merged-bucket lane raster — the per-lane (2qh, 2qw)
    plane the entropy kernel emits. Must match assembly.build_plan."""
    bw = 2 * (-(-int(fg.w.max()) // 2)) if fg.ncblks else 2
    bh = 2 * (-(-int(fg.h.max()) // 2)) if fg.ncblks else 2
    return bh, bw


def build_v3_frame(fg, cols):
    """Per-frame v3 lane columns, or None if the frame needs v2.

    Returns dict(data, lcups, pcups, qws, qhs, pLSB, maxbp, host_pf)
    with data an (N, Lmax) modDcup'ed byte matrix (device lanes only;
    host/inert lanes zero) and host_pf a list of (idx, values) numpy
    pairs from the scalar-oracle fallback lanes, indexed in LANE-RASTER
    coordinates (gi * bh * bw + y * bw + x): the fused program scatters
    them into the dequantized lane rasters before the band mosaics, so
    host lanes ride the same scatter-free assembly as device lanes."""
    N = fg.ncblks
    body = np.frombuffer(cols["body"], np.uint8)
    act = cols["active"]
    npasses = np.where(act, cols["npasses"], 0)
    rem = npasses % 3
    plhd = np.where(rem, npasses - rem,
                    np.maximum(npasses - 3, 0))
    zblk = npasses - plhd
    zbp_eff = cols["zbp"] + plhd // 3
    if np.any(act & (zblk > 1)):
        return None                     # refinement lanes: v2 path

    lcup = np.where(act, cols["lcup"], 2)
    need = (8 * lcup + 96) // 32
    host = act & (zbp_eff + 1 > 25)
    dev = act & ~host
    if np.any(dev):
        # long-tail policy: keep the stream matrix narrow by sending the
        # rare outlier-length codeblocks to the scalar oracle
        w98 = int(np.percentile(need[dev], 98))
        wcap = 16
        while wcap < w98:
            wcap *= 2
        wmax = int(need[dev].max())
        if wmax > 2 * wcap:
            host = host | (act & (need > wcap))
            dev = act & ~host

    lmax = int(lcup[dev].max()) if np.any(dev) else 4
    lmax = max(lmax, 4)
    # one padded gather builds the byte matrix: the native stream prep
    # reads each lane strictly within [pcup, lcup), so bytes beyond a
    # lane's lcup (or in non-device rows) need no zero mask, and the
    # zero tail makes end-of-body clipping unnecessary (int32 indices:
    # this matrix is rebuilt per frame and was the prep's hot spot)
    body_pad = np.concatenate([body, np.zeros(lmax + 8, np.uint8)])
    idx = (cols["off"].astype(np.int32)[:, None]
           + np.arange(lmax, dtype=np.int32)[None, :])
    data = body_pad[idx]

    lcups = np.where(dev, lcup, 2).astype(np.int64)
    # Scup + modDcup (vectorized; parity jpeg2000htdec.c:1265-1278)
    ar = np.arange(N)
    b_last = data[ar, lcups - 1].astype(np.int64)
    b_prev = data[ar, lcups - 2].astype(np.int64)
    scup = (b_last << 4) + (b_prev & 0x0F)
    if np.any(dev & ((scup < 2) | (scup > lcups) | (scup > 4079))):
        raise InvalidData("invalid Scup")
    data[ar, lcups - 1] = np.where(dev, 0xFF, data[ar, lcups - 1])
    data[ar, lcups - 2] = np.where(dev, data[ar, lcups - 2] | 0x0F,
                                   data[ar, lcups - 2])
    pcups = np.where(dev, lcups - scup, 0).astype(np.int64)

    qws = np.where(dev, -(-fg.w // 2), 0).astype(np.int32)
    qhs = np.where(dev, -(-fg.h // 2), 0).astype(np.int32)
    pLSB = np.where(dev, 30 - zbp_eff, 2).astype(np.int32)
    maxbp = np.where(dev, zbp_eff + 1, 32).astype(np.int32)

    host_pf = []
    if np.any(host):
        from ffmpeg_ht_tpu.ops import dequant as dq
        from ffmpeg_ht_tpu.ops import ht_dec
        tf = fg.geom.transform
        bh, bw = lane_raster_dims(fg)
        for gi in np.nonzero(host)[0]:
            dat = cols["body"][cols["off"][gi]:
                               cols["off"][gi] + cols["len"][gi]]
            t1 = ht_dec.decode_htj2k(
                bytes(dat), int(cols["npasses"][gi]),
                int(cols["zbp"][gi]),
                [int(cols["lcup"][gi]), int(cols["lref"][gi])],
                int(fg.w[gi]), int(fg.h[gi]), int(fg.magb[gi]), 0, 0)
            if tf == mk.DWT97:
                blk = dq.dequant_float(t1, float(fg.fstep[gi]),
                                       int(fg.magb[gi]))
            elif tf == mk.DWT97_INT:
                blk = dq.dequant_int_97(t1, float(fg.fstep[gi]),
                                        int(fg.magb[gi]))
            else:
                blk = dq.dequant_int(t1, int(fg.istep[gi]),
                                     int(fg.magb[gi]))
            rows = (int(gi) * (bh * bw)
                    + np.arange(int(fg.h[gi]))[:, None] * bw
                    + np.arange(int(fg.w[gi]))[None, :])
            host_pf.append((rows.ravel(), np.asarray(blk).ravel()))
    return dict(data=data, lcups=lcups, pcups=pcups, qws=qws, qhs=qhs,
                pLSB=pLSB, maxbp=maxbp, host_pf=host_pf)


def finish_v3(fg, frames_cols, total):
    """Stack per-frame v3 columns into the fused-program arguments.

    frames_cols: list of build_v3_frame dicts (same geometry). Returns
    (args dict of jnp arrays, F) for models.assembly.make_v3_program."""
    import jax.numpy as jnp

    from ffmpeg_ht_tpu.ops.ht_batch import prepare_streams_with_limits

    F = len(frames_cols)
    N = fg.ncblks
    lmax = max(f["data"].shape[1] for f in frames_cols)
    data = np.zeros((F * N, lmax), np.uint8)
    lcups = np.empty(F * N, np.int64)
    pcups = np.empty(F * N, np.int64)
    for f, fc in enumerate(frames_cols):
        data[f * N:(f + 1) * N, :fc["data"].shape[1]] = fc["data"]
        lcups[f * N:(f + 1) * N] = fc["lcups"]
        pcups[f * N:(f + 1) * N] = fc["pcups"]
    msw, melw, vlcw, ms_lim, mel_lim = prepare_streams_with_limits(
        data, lcups, pcups)

    def stack(key, dtype):
        return np.concatenate([fc[key] for fc in frames_cols]) \
            .astype(dtype)

    bh, bw = lane_raster_dims(fg)
    lane_span = N * bh * bw                 # one frame's lane-raster size
    pf_i, pf_v = [], []
    for f, fc in enumerate(frames_cols):
        for (ridx, rval) in fc["host_pf"]:
            pf_i.append(ridx + f * lane_span)
            pf_v.append(rval)
    pdt = np.float32 if fg.geom.transform == mk.DWT97 else np.int32
    if pf_i:
        pf_idx = np.concatenate(pf_i).astype(np.int32)
        pf_val = np.concatenate(pf_v).astype(pdt)
    else:
        pf_idx = np.zeros(0, np.int32)
        pf_val = np.zeros(0, pdt)
    # pad to a pow2 class so the executable is reused; pads index past
    # the lane rasters and are dropped by the scatter's OOB mode
    cap = 16
    while cap < len(pf_idx):
        cap *= 2
    pf_idx = _pad(pf_idx, cap, F * lane_span).astype(np.int32)
    pf_val = _pad(pf_val, cap, 0).astype(pdt)

    tile = lambda a, dtype: np.tile(np.asarray(a), F).astype(dtype)
    args = dict(
        msw=jnp.asarray(msw), melw=jnp.asarray(melw),
        vlcw=jnp.asarray(vlcw),
        pLSB=jnp.asarray(stack("pLSB", np.int32)),
        maxbp=jnp.asarray(stack("maxbp", np.int32)),
        ms_lim=jnp.asarray(ms_lim), mel_lim=jnp.asarray(mel_lim),
        qws=jnp.asarray(stack("qws", np.int32)),
        qhs=jnp.asarray(stack("qhs", np.int32)),
        magb=jnp.asarray(tile(fg.magb, np.int32)),
        istep=jnp.asarray(tile(fg.istep, np.int32)),
        scale97=jnp.asarray(tile(fg.scale97, np.int32)),
        fscale=jnp.asarray(tile(fg.fscale, np.float32)),
        pf_idx=jnp.asarray(pf_idx), pf_val=jnp.asarray(pf_val))
    return args, F
