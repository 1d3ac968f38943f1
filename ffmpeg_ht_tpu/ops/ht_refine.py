"""Scan-structured SigProp + MagRef device kernel (HT refinement passes).

Completes the TPU entropy tier: codeblocks with z_blk in {2, 3} (cleanup +
SigProp [+ MagRef], scalar oracle ops/ht_dec.py:492-589, reference
jpeg2000htdec.c:1016-1185) no longer drop to per-block scalar Python.

Two structural observations make the TPU formulation cheap:

1. **MagRef is data-independent.** Which samples are refined (cleanup-
   significant ones) and in which order (stripes of 4 rows, column-major
   within a stripe) is fully determined by the cleanup sigma plane — the
   decoded bits never feed back into the scan. So MagRef is not a scan at
   all here: an exclusive prefix-sum over the order-flattened sigma plane
   gives every sample's bit index into the (host-densified) backward Dref
   stream, and one gather delivers all bits at once.

2. **SigProp's serial chain is 16 steps of register arithmetic per 4x4
   block.** Within a block (column-major scan), a sample's "magnitude
   refinement needed" bit (mbr, jpeg2000htdec.c:1016-1032) depends on
   decoded bits of earlier samples only through their REF flags, and the
   reference's `(x >> REF) & (x >> SCAN)` term reduces to OR(REF) because
   REF is only ever set together with SCAN. A block consumes at most 16
   magnitude + 16 sign bits — exactly one 32-bit register peek — so the
   whole block resolves as 32 unconditional masked lane-ops on a peeked
   window, then the stream advances by the per-lane total. Blocks scan
   left-to-right within a 4-row stripe (inner lax.scan), stripes top-down
   (outer lax.scan), with the previous stripe's bottom-row REF flags and
   the previous block's last-column REF flags as the only carries.

SigProp and MagRef touch disjoint samples (SigProp only non-significant,
MagRef only significant ones) and opposite ends of Dref, so their device
order does not matter.

Stream prep lives in ops/ht_batch.prepare_refinement_streams. Everything
is uint32/int32; identical on CPU (tests) and TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ffmpeg_ht_tpu.ops.ht_scan import (I32, U32, _drop, _peek32, refill_top,
                                       st_init)


def _stripes(h: int):
    """Static (row0, stripe_height) list: full 4-row stripes + remainder."""
    out = [(r0, 4) for r0 in range(0, h - h % 4, 4)]
    if h % 4:
        out.append((h - h % 4, h % 4))
    return out


@functools.partial(jax.jit, static_argnames=("qw", "qh", "w", "h"))
def decode_refinement_scan(mu, sig, spw, mrw, pLSB, has_sp, has_mr,
                           causal, qw: int, qh: int, w: int, h: int):
    """Apply SigProp (+MagRef) to cleanup output, in lockstep over N lanes.

    mu: uint32 (N, 2qh, 2qw) cleanup samples in raster layout; sig: int32
    (N, qh, qw) quad significance patterns (both from
    ht_scan.decode_cleanup_scan_sig). spw/mrw: densified Dref streams
    (ht_batch.prepare_refinement_streams). pLSB: the *cleanup* pLSB per
    lane (refinement operates at pLSB-1, ht_dec.py:644-648). has_sp /
    has_mr: per-lane bools (z_blk >= 2 / == 3); lanes with both False
    pass through untouched. Static (w, h) are the real codeblock dims
    (quad-grid pads beyond them are zeroed exactly like the oracle's
    raster writeback, ht_dec.py:473-487).

    causal: per-lane bool, the codeblock's vertically-stripe-causal mode
    (COD style bit CBLK_VSC). The reference masks every row-below term of
    the MBR neighborhood on each stripe's LAST row (`causal_cond`,
    jpeg2000htdec.c:1034-1077). In this scan-ordered formulation the
    dynamic below term (below-left REF) is already zero on stripe-last
    rows — the below-left sample belongs to the *next* stripe, not yet
    scanned — so causal reduces to masking the static below-row sigma OR
    (`below3`) on stripe-last rows.

    Returns the refined samples as a raster uint32 (N, 2qh, 2qw) array
    with pad samples zero.
    """
    N = mu.shape[0]
    H, W = 2 * qh, 2 * qw
    pL = jnp.asarray(pLSB, I32) - 1

    ras = mu.astype(U32)
    # per-sample sigma from the 4-bit quad patterns, in raster space:
    # corner index of raster (y, x) is (y & 1) + 2 * (x & 1), so a 2x2
    # upsample (repeat, bandwidth-cheap) plus a static shift pattern
    # replaces the 2x2-minor-dim transpose (_rasterize), which defeats
    # the (8,128) tiling
    sig_up = jnp.repeat(jnp.repeat(sig.astype(I32), 2, axis=1), 2, axis=2)
    corner = ((jnp.arange(H, dtype=I32)[:, None] & 1)
              + 2 * (jnp.arange(W, dtype=I32)[None, :] & 1))
    sigp = (sig_up >> corner[None]) & 1
    # oracle writeback zeroes quad pads in both samples and sigma
    vy = (jnp.arange(H) < h)[None, :, None]
    vx = (jnp.arange(W) < w)[None, None, :]
    valid = vy & vx
    ras = jnp.where(valid, ras, jnp.uint32(0))
    sigp = jnp.where(valid, sigp, 0)

    # ---- MagRef: rank every significant sample in scan order, gather ----
    def flatten_scan_order(a):
        """(N, >=h, >=w) -> (N, h*w) in MagRef scan order (stripes of 4
        rows top-down, column-major within a stripe, ht_dec.py:563-589)."""
        segs = []
        for r0, sh in _stripes(h):
            seg = a[:, r0:r0 + sh, :w]
            segs.append(jnp.transpose(seg, (0, 2, 1)).reshape(N, w * sh))
        return jnp.concatenate(segs, axis=1)

    sig_f = flatten_scan_order(sigp)
    rank = jnp.cumsum(sig_f, axis=1) - sig_f
    # clipped gather is safe: _trim_pow2 always leaves a zero tail column
    # and past-the-start backward reads are zeros in the oracle too
    widx = jnp.minimum(rank >> 5, mrw.shape[1] - 1)
    word = jnp.take_along_axis(mrw, widx, axis=1)
    bit = (word >> (rank & 31).astype(U32)) & jnp.uint32(1)
    do = (sig_f == 1) & has_mr[:, None]
    # tmp = (0xFFFFFFFE | bit) << pLSB' truncated to u32, then
    # v = (v & tmp) | 1 << (pLSB'-1)   (jpeg2000htdec.c:1162-1165)
    t = (jnp.uint32(0xFFFFFFFE) | bit) << pL[:, None].astype(U32)
    val_f = flatten_scan_order(ras)
    newv = (val_f & t) | (jnp.uint32(1) << (pL[:, None] - 1).astype(U32))
    val_f = jnp.where(do, newv, val_f)
    # scatter back (inverse of the stripe flatten)
    off = 0
    rows = []
    for r0, sh in _stripes(h):
        seg = val_f[:, off:off + w * sh].reshape(N, w, sh)
        off += w * sh
        rows.append(jnp.transpose(seg, (0, 2, 1)))      # (N, sh, w)
    ras = ras.at[:, :h, :w].set(jnp.concatenate(rows, axis=1))

    # ---- SigProp: stripe scan with 16-step register-resolved blocks ----
    nb = -(-w // 4)
    Wp = 4 * nb
    zeros = jnp.zeros((N,), I32)
    ones = jnp.ones((N,), bool)
    hsp = jnp.asarray(has_sp, bool)

    def padw(a, fill=0):
        """(N, sh, W-ish) -> (N, sh, Wp)."""
        if a.shape[2] < Wp:
            pad = jnp.full((N, a.shape[1], Wp - a.shape[2]), fill, a.dtype)
            return jnp.concatenate([a, pad], axis=2)
        return a[:, :, :Wp]

    # static 8-neighborhood sigma OR (the SIGMA contributions to mbr;
    # zero ring like the oracle's padded bs plane)
    sp_pad = jnp.pad(sigp, ((0, 0), (1, 1), (1, 1)))

    def shift(dy, dx):
        return sp_pad[:, 1 + dy:1 + dy + H, 1 + dx:1 + dx + W]

    or5 = (shift(-1, -1) | shift(-1, 0) | shift(-1, 1)
           | shift(0, -1) | shift(0, 1))
    below3 = shift(1, -1) | shift(1, 0) | shift(1, 1)
    # causal (VSC): drop the below-row sigma term on stripe-last rows
    # (rows 3 mod 4, plus the remainder stripe's last row h-1)
    rows = jnp.arange(H)
    strip_last = ((rows & 3) == 3) | (rows == (h - 1))
    below_on = ~(jnp.asarray(causal, bool)[:, None, None]
                 & strip_last[None, :, None])
    so_full = or5 | jnp.where(below_on, below3, 0)

    # per-block column validity (the W % 4 edge block processes fewer
    # columns, ht_dec.py:548-560); same for every lane, static
    cv_np = np.zeros((nb, 4), bool)
    for b in range(nb):
        cv_np[b] = [4 * b + c < w for c in range(4)]
    cv_all = jnp.asarray(cv_np)

    # C = 32 bits/block worst case -> one register roll per iteration,
    # 3-word window. Past-end reads are zeros (zero-padded words, no
    # limit): exactly the oracle's _SPBits past-the-end behavior.
    spst, splim = st_init(spw, 3)

    def make_block_body(sh: int):
        def block_body(carry, xs):
            spst, left = carry              # left: (N, sh) prev-block col 3
            sig_b, so_b, val_b, top6, cv = xs
            win = _peek32(spst)
            cnt = zeros
            ref = [[None] * 4 for _ in range(sh)]
            need_m = [[None] * 4 for _ in range(sh)]
            for c in range(4):
                for r in range(sh):
                    if c == 0:
                        dl = top6[:, 0] if r == 0 else left[:, r - 1]
                        dm = left[:, r]
                        db = left[:, r + 1] if r + 1 < sh else zeros
                    else:
                        dl = top6[:, c] if r == 0 else ref[r - 1][c - 1]
                        dm = ref[r][c - 1]
                        db = ref[r + 1][c - 1] if r + 1 < sh else zeros
                    da = top6[:, c + 1] if r == 0 else ref[r - 1][c]
                    dyn = dl | dm | db | da
                    need = (cv[c] & hsp & (sig_b[:, r, c] == 0)
                            & ((so_b[:, r, c] | dyn) != 0))
                    bitv = ((win >> cnt.astype(U32)) & 1).astype(I32)
                    ref[r][c] = jnp.where(need, bitv, 0)
                    need_m[r][c] = need
                    cnt = cnt + need.astype(I32)
            off = cnt
            sgn = [[None] * 4 for _ in range(sh)]
            for c in range(4):
                for r in range(sh):
                    sneed = ref[r][c] == 1
                    sbit = ((win >> off.astype(U32)) & 1).astype(I32)
                    sgn[r][c] = jnp.where(sneed, sbit, 0)
                    off = off + sneed.astype(I32)
            d1 = jnp.minimum(off, 16)
            spst2 = _drop(spst, d1, ones)
            spst2 = _drop(spst2, off - d1, ones)
            spst2 = refill_top(spw, spst2, splim, 1)
            # sample update: |= (bit << pLSB') | (bit << pLSB'-1) | sign<<31
            newv = []
            for r in range(sh):
                rowv = []
                for c in range(4):
                    rv = ref[r][c].astype(U32)
                    sv = sgn[r][c].astype(U32)
                    v = val_b[:, r, c] \
                        | (rv << pL.astype(U32)) \
                        | (rv << (pL - 1).astype(U32)) \
                        | (sv << 31)
                    rowv.append(v)
                newv.append(jnp.stack(rowv, axis=1))
            vals = jnp.stack(newv, axis=1)               # (N, sh, 4)
            refrow = jnp.stack([ref[sh - 1][c] for c in range(4)], axis=1)
            left_new = jnp.stack([ref[r][3] for r in range(sh)], axis=1)
            return (spst2, left_new), (vals, refrow)
        return block_body

    def stripe_xs(sig_rows, so_rows, val_rows, above_ref, sh):
        """Build the per-block xs for one stripe's inner scan."""
        def blocks(a):
            # (N, sh, Wp) -> (nb, N, sh, 4)
            return jnp.transpose(a.reshape(N, sh, nb, 4), (2, 0, 1, 3))
        ap = jnp.pad(above_ref, ((0, 0), (1, 1)))
        top6 = jnp.stack([ap[:, 4 * b:4 * b + 6] for b in range(nb)])
        return (blocks(sig_rows), blocks(so_rows), blocks(val_rows),
                top6, cv_all)

    def run_stripe(sig_rows, so_rows, val_rows, above_ref, spst, sh):
        xs = stripe_xs(sig_rows, so_rows, val_rows, above_ref, sh)
        init = (spst, jnp.zeros((N, sh), I32))
        (spst, _), (vals, refrows) = jax.lax.scan(
            make_block_body(sh), init, xs)
        # vals (nb, N, sh, 4) -> (N, sh, Wp); refrows (nb, N, 4) -> (N, Wp)
        vals = jnp.transpose(vals, (1, 2, 0, 3)).reshape(N, sh, Wp)
        above = jnp.transpose(refrows, (1, 0, 2)).reshape(N, Wp)
        return vals, above, spst

    Wc = min(Wp, W)   # columns written back (Wp can exceed the quad pad)

    def writeback(ras, r0, vals):
        return ras.at[:, r0:r0 + vals.shape[1], :Wc].set(vals[:, :, :Wc])

    ns = h // 4
    rem = h % 4
    above_ref = jnp.zeros((N, Wp), I32)
    if ns > 0:
        # stack per-stripe rows: (ns, N, 4, Wp)
        def stk(a):
            a = padw(a[:, :4 * ns, :])                 # (N, 4ns, Wp)
            return jnp.transpose(a.reshape(N, ns, 4, Wp), (1, 0, 2, 3))

        def stripe_body(carry, xs):
            spst, above = carry
            s_sig, s_so, s_val = xs
            vals, above, spst = run_stripe(s_sig, s_so, s_val, above,
                                           spst, 4)
            return (spst, above), vals

        (spst, above_ref), vals_stk = jax.lax.scan(
            stripe_body, (spst, above_ref),
            (stk(sigp), stk(so_full), stk(ras.astype(U32))))
        full = jnp.transpose(vals_stk, (1, 0, 2, 3)).reshape(N, 4 * ns, Wp)
        ras = writeback(ras, 0, full)
    if rem:
        r0 = 4 * ns
        vals, _, spst = run_stripe(
            padw(sigp[:, r0:h, :]), padw(so_full[:, r0:h, :]),
            padw(ras[:, r0:h, :].astype(U32)), above_ref, spst, rem)
        ras = writeback(ras, r0, vals)

    return ras
