"""Host stream preparation for the TPU HT entropy kernel.

Byte-level concerns of the three HT cleanup bit streams -- the backward
VLC byte order, all three bit-unstuffing rules, modDcup and the Scup
nibble (scalar oracle in ops/ht_dec.py; reference jpeg2000htdec.c:145-295)
-- are *data-independent* given the segment bytes, so the host flattens
each codeblock's MagSgn/MEL/VLC segments into dense little-endian bit
streams packed as uint32 words. This removes every byte-gather and
stuffing branch from the device inner loop.

The device kernel consuming these words lives in ops/ht_scan.py (the
scan-structured lockstep formulation). A C implementation of the same
prep (native/htprep.c) is used when available; this numpy version is the
tested fallback and the specification.
"""

from __future__ import annotations

import numpy as np


# ---------------------------------------------------------------------------
# host stream preparation
# ---------------------------------------------------------------------------

_ONES_TAIL = np.ones(64, np.uint8)


def _scatter_bits(cur, nbits, valid, msb_first, skip=None):
    """Vectorized bit scatter: payload bits of byte matrix `cur` (N, L)
    with per-byte widths `nbits` into dense per-row bit arrays.

    Returns (bits (N, B), total_bits (N,)). `skip` (N, L) optional bit
    offset subtracted from positions (negative positions dropped)."""
    n, l = cur.shape
    nb = np.where(valid, nbits, 0).astype(np.int64)
    offs = np.cumsum(nb, axis=1) - nb
    total = nb.sum(axis=1)
    if skip is not None:
        offs = offs - skip
        total = total - skip[:, 0]
    bmax = int(total.max()) if len(total) else 0
    out = np.zeros((n, bmax + 8), np.uint8)
    rows = np.broadcast_to(np.arange(n)[:, None], (n, l))
    for j in range(8):
        sel = valid & (j < nbits)
        pos = offs + j
        if skip is None:
            s = sel
        else:
            s = sel & (pos >= 0)
        if msb_first:
            bits = (cur >> np.maximum(nbits - 1 - j, 0)) & 1
        else:
            bits = (cur >> j) & 1
        out[rows[s], pos[s]] = bits[s]
    return out, total


def _append_ones(bits, total):
    """Set 64 one-bits starting at each row's total (0xFF synthesis)."""
    n = bits.shape[0]
    need = int(total.max()) + 64 + 8 if n else 64
    if bits.shape[1] < need:
        bits = np.concatenate(
            [bits, np.zeros((n, need - bits.shape[1]), np.uint8)], axis=1)
    idx = total[:, None] + np.arange(64)
    bits[np.arange(n)[:, None], idx] = 1
    return bits, total + 64


def _pack_words(bits):
    """(N, B) bit matrix -> (N, W) little-endian uint32 words."""
    n, bmax = bits.shape
    pad = (-bmax) % 32
    if pad:
        bits = np.concatenate([bits, np.zeros((n, pad), np.uint8)], axis=1)
    w = bits.shape[1] // 32
    v = bits.reshape(n, w, 32).astype(np.uint32)
    return (v << np.arange(32, dtype=np.uint32)).sum(axis=2,
                                                     dtype=np.uint32)


def prepare_streams_batch(data, lcup, pcup):
    """Vectorized host stream prep over a whole bucket.

    data: uint8 (N, L) raw Dcup byte rows (modDcup optional); lcup/pcup
    int arrays (N,). Returns three uint32 word arrays sharing one
    pow2-quantized width. MagSgn and MEL get an all-ones tail mirroring
    the reference's 0xFF synthesis past the segment end
    (jpeg2000htdec.c:207-221, 429-435); the VLC stream reads zeros past
    its start like the reference's backward refill slop.
    """
    data = np.asarray(data, np.uint8)
    n, l = data.shape
    lcup = np.asarray(lcup, np.int64)
    pcup = np.asarray(pcup, np.int64)

    from ffmpeg_ht_tpu.utils import native
    res = native.ht_prepare_streams(data, lcup, pcup)
    if res is not None:
        return res

    cols = np.arange(l)[None, :]

    # --- MagSgn: bytes [0, pcup), LSB-first, 0xFF -> next byte 7 bits ---
    valid = cols < pcup[:, None]
    prev = np.concatenate([np.zeros((n, 1), np.uint8), data[:, :-1]], axis=1)
    nbits = np.where(prev == 0xFF, 7, 8)
    bits, total = _scatter_bits(data, nbits, valid, False)
    bits, total = _append_ones(bits, total)
    msw = _pack_words(bits)

    # --- MEL: bytes [pcup, lcup), MSB-first within the 7/8 payload ---
    valid = (cols >= pcup[:, None]) & (cols < lcup[:, None])
    first = cols == pcup[:, None]
    prev_mel = np.where(first, 0, prev)  # stream-local predecessor
    nbits = np.where(prev_mel == 0xFF, 7, 8)
    bits, total = _scatter_bits(data, nbits, valid, True)
    bits, total = _append_ones(bits, total)
    melw = _pack_words(bits)

    # --- VLC: bytes lcup-2 .. pcup in reading (descending) order with
    # modDcup (trailer 0xFF, Scup nibble |= 0xF) and the 4-bit skip ---
    ncols = int((lcup - pcup).max()) if n else 2
    k = np.arange(ncols)[None, :]
    src = (lcup[:, None] - 2) - k
    inside = src >= pcup[:, None]
    srcc = np.clip(src, 0, l - 1)
    cur = np.take_along_axis(data, srcc, axis=1)
    cur = np.where(inside, cur, 0)
    cur = np.where(k == 0, cur | 0x0F, cur)      # modDcup Scup nibble
    prevv = np.take_along_axis(
        data, np.clip(src + 1, 0, l - 1), axis=1)
    prevv = np.where(k == 1, prevv | 0x0F, prevv)  # prev byte post-modDcup
    prevv = np.where(k == 0, 0xFF, prevv)        # modDcup trailer byte
    stuffed = (prevv > 0x8F) & ((cur & 0x7F) == 0x7F)
    nbits = np.where(stuffed, 7, 8)
    skip = np.full((n, ncols), 4, np.int64)      # drop the Scup low nibble
    bits, total = _scatter_bits(cur, nbits, inside, False, skip=skip)
    vlcw = _pack_words(bits)

    return (_trim_pow2(msw), _trim_pow2(melw), _trim_pow2(vlcw))


def prepare_streams_with_limits(data, lcup, pcup):
    """prepare_streams_batch + stream_limits in one pass.

    The native tier computes the limits for free while packing; the
    numpy fallback pays a second pass over the byte matrix."""
    data = np.asarray(data, np.uint8)
    lcup = np.asarray(lcup, np.int64)
    pcup = np.asarray(pcup, np.int64)
    from ffmpeg_ht_tpu.utils import native
    res = native.ht_prepare_streams(data, lcup, pcup, want_limits=True)
    if res is not None:
        return res
    msw, melw, vlcw = prepare_streams_batch(data, lcup, pcup)
    ms_lim, mel_lim = stream_limits(data, lcup, pcup)
    return msw, melw, vlcw, ms_lim, mel_lim


def stream_limits(data, lcup, pcup):
    """Per-lane first-word-index past stored content for MagSgn and MEL.

    A prepared stream stores its payload bits plus a 64-bit all-ones tail
    (_append_ones); every word at index >= (total_bits + 64) // 32 lies
    entirely in the synthesized-0xFF region and is produced by _fetch
    rather than stored, giving the reference's unbounded end-of-segment
    0xFF behavior (jpeg2000htdec.c:207-221) on over-reading malformed
    streams. The VLC stream reads backward (zeros past the start) and
    needs no limit."""
    data = np.asarray(data, np.uint8)
    n, l = data.shape
    lcup = np.asarray(lcup, np.int64)
    pcup = np.asarray(pcup, np.int64)
    cols = np.arange(l)[None, :]
    prev = np.concatenate([np.zeros((n, 1), np.uint8), data[:, :-1]], axis=1)
    nbits = np.where(prev == 0xFF, 7, 8)
    tot_ms = (nbits * (cols < pcup[:, None])).sum(axis=1)
    first = cols == pcup[:, None]
    nbits_mel = np.where(np.where(first, 0, prev) == 0xFF, 7, 8)
    valid_mel = (cols >= pcup[:, None]) & (cols < lcup[:, None])
    tot_mel = (nbits_mel * valid_mel).sum(axis=1)
    return (((tot_ms + 64) // 32).astype(np.int32),
            ((tot_mel + 64) // 32).astype(np.int32))


def prepare_sigprop_stream(dref, lref):
    """Densify SigProp's forward Dref bits (oracle _SPBits,
    jpeg2000htdec.c:442-460): LSB-first, a byte preceded by 0xFF
    contributes its low 7 bits; past the segment end the reader sees
    zeros, which the zero-padded words reproduce.

    dref: uint8 (N, L) refinement-segment byte rows (a prefix suffices:
    SigProp consumes at most 2 bits/sample); lref: (N,) lengths."""
    dref = np.asarray(dref, np.uint8)
    n, l = dref.shape
    lref = np.asarray(lref, np.int64)
    cols = np.arange(l)[None, :]
    valid = cols < lref[:, None]
    prev = np.concatenate([np.zeros((n, 1), np.uint8), dref[:, :-1]], axis=1)
    nbits = np.where(prev == 0xFF, 7, 8)
    bits, _tot = _scatter_bits(dref, nbits, valid, False)
    return _trim_pow2(_pack_words(bits))


def prepare_magref_stream(dref, lref):
    """Densify MagRef's backward Dref bits (oracle _RevBits from byte
    lref-1 with the synthetic 0xFF trailer, jpeg2000htdec.c:1137-1149 +
    :1260): bytes in descending order, LSB-first, MSB dropped when the
    preceding byte in reading order is > 0x8F and the low 7 bits are all
    ones; past the segment start the reader sees zeros.

    dref/lref as in prepare_sigprop_stream (a suffix suffices: MagRef
    consumes at most 1 bit/sample — callers passing a suffix adjust
    lref to the stored length). _trim_pow2 always leaves a zero tail
    column, which decode_refinement_scan's clipped rank gather relies
    on."""
    dref = np.asarray(dref, np.uint8)
    n, l = dref.shape
    lref = np.asarray(lref, np.int64)
    ncols = max(int(lref.max()) if n else 1, 1)
    k = np.arange(ncols)[None, :]
    src = (lref[:, None] - 1) - k
    inside = src >= 0
    srcc = np.clip(src, 0, l - 1)
    cur = np.take_along_axis(dref, srcc, axis=1)
    cur = np.where(inside, cur, 0)
    prevv = np.take_along_axis(dref, np.clip(src + 1, 0, l - 1), axis=1)
    prevv = np.where(k == 0, 0xFF, prevv)    # synthetic Dref trailer byte
    stuffed = (prevv > 0x8F) & ((cur & 0x7F) == 0x7F)
    nbits = np.where(stuffed, 7, 8)
    bits, _tot = _scatter_bits(cur, nbits, inside, False)
    return _trim_pow2(_pack_words(bits))


def prepare_refinement_streams(dref, lref):
    """Both refinement streams from one full Dref byte matrix."""
    return (prepare_sigprop_stream(dref, lref),
            prepare_magref_stream(dref, lref))


def _trim_pow2(a: np.ndarray) -> np.ndarray:
    """Trim trailing all-zero word columns, then pad to a pow2 width.

    Safe because the device reader clamps out-of-range fetches to zero —
    identical to reading a stored zero word — and per-stream widths keep
    the host->device upload close to the real content size (the link is
    the throughput wall on tunneled chips).
    """
    n, w0 = a.shape
    nz = np.nonzero(a.any(axis=0))[0]
    need = (int(nz[-1]) + 3) if len(nz) else 2
    # quantize to 4 steps per octave (quarter-pow2 grid): <=25% worst-case
    # rounding waste (~11% mean) for ~4x the executable variants of pure
    # pow2 — the upload link, not compile count, is the throughput wall
    if need <= 16:
        w = 16
    else:
        step = max(1 << max((need - 1).bit_length() - 3, 2), 4)
        w = -(-need // step) * step
    if w >= w0:
        out = np.zeros((n, w), np.uint32)
        out[:, :w0] = a
        return out
    return np.ascontiguousarray(a[:, :w])


def prepare_streams(rows, lcups, pcups):
    """List-of-rows front-end over prepare_streams_batch."""
    n = len(rows)
    l = max(max(len(r) for r in rows), 4)
    data = np.zeros((n, l), np.uint8)
    for i, r in enumerate(rows):
        data[i, :len(r)] = r
    return prepare_streams_batch(data, np.asarray(lcups),
                                 np.asarray(pcups))
