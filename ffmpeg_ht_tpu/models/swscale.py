"""Output pixel-format conversion — the swscale analog (SURVEY.md §1 L4).

The reference routes decoder output through libswscale when the caller
asks for a different pixel format (FATE's jpeg2000 tests pass
`-pix_fmt rgb48le` etc., tests/fate/jpeg2000.mak:37-41). This module
supplies the same surface for our decoder: `convert(frame, dst_fmt)`
returns a new DecodedFrame in the requested format.

Conversions are exact integer math:

- bit-depth rescale uses the full-range remap
  round(v * (2^dst - 1) / (2^src - 1)) — lossless for upshifts by
  replication (v * 257 for 8->16), the standard inverse for downshifts
  (swscale's non-dithered path).
- gray <-> RGB by replication / BT.601 luma.
- YCbCr <-> RGB uses the BT.601 limited-range integer coefficients
  (the swscale default for unflagged content).
- chroma subsampling uses a box filter down and sample-and-hold up
  (swscale's fast bilinear degenerates to this at 2:1).

Matching libswscale bit-for-bit is explicitly out of scope — its output
depends on dither state and SIMD width; tests pin our conversions to
the reference within ±1 LSB where a reference path exists, and exactly
on round-trips.
"""

from __future__ import annotations

import numpy as np

from ffmpeg_ht_tpu.models import pixfmt as pf
from ffmpeg_ht_tpu.models.host_decoder import DecodedFrame


def _rescale(a: np.ndarray, src_bits: int, dst_bits: int) -> np.ndarray:
    if src_bits == dst_bits:
        return a
    smax = (1 << src_bits) - 1
    dmax = (1 << dst_bits) - 1
    v = a.astype(np.int64)
    return ((v * dmax + smax // 2) // smax)


_BY_NAME = {f.name: f for f in pf.ALL_FMTS}


def _fmt(name: str):
    f = _BY_NAME.get(name)
    if f is None:
        raise ValueError(f"unknown pixel format {name!r}")
    return f


def _to_planes16(frame: DecodedFrame):
    """Normalize any frame to a list of full-res uint16 planes plus
    (depth, kind): kind 'gray' | 'rgb' | 'yuv' with chroma log2 shifts."""
    f = frame.fmt
    name = f.name
    if name.startswith("gray"):
        return [frame.planes[0]], ("gray", (0, 0))
    if name.startswith("ya"):
        # gray + alpha, interleaved: convert from the gray plane, drop
        # alpha (sws converts out of ya* by compositing/dropping; we drop)
        return [frame.planes[0][:, 0::2]], ("gray", (0, 0))
    if name.startswith("rgb"):
        if f.planar:
            return list(frame.planes[:3]), ("rgb", (0, 0))
        il = frame.planes[0]
        return ([il[:, 0::3], il[:, 1::3], il[:, 2::3]],
                ("rgb", (0, 0)))
    if name.startswith("yuv"):
        return (list(frame.planes[:3]),
                ("yuv", (f.log2_chroma_w, f.log2_chroma_h)))
    raise ValueError(f"unsupported source format {name!r}")


def _box_down(p: np.ndarray, sx: int, sy: int) -> np.ndarray:
    if sx == 0 and sy == 0:
        return p
    h, w = p.shape
    fy, fx = 1 << sy, 1 << sx
    hp, wp = -(-h // fy) * fy, -(-w // fx) * fx
    if (hp, wp) != (h, w):                      # replicate-pad odd edges
        pad = np.pad(p, ((0, hp - h), (0, wp - w)), mode="edge")
    else:
        pad = p
    v = pad.reshape(hp // fy, fy, wp // fx, fx).astype(np.int64)
    return (v.sum(axis=(1, 3)) + (fy * fx) // 2) // (fy * fx)


def _hold_up(p: np.ndarray, sx: int, sy: int, h: int, w: int) -> np.ndarray:
    out = np.repeat(np.repeat(p, 1 << sy, axis=0), 1 << sx, axis=1)
    return out[:h, :w]


# BT.601 limited-range, 16-bit fixed point (the swscale defaults for
# untagged content; coefficients from the Rec. 601 matrix scaled to the
# 219/224-step ranges)
def _yuv_to_rgb(y, u, v, bits):
    ymax = (1 << bits) - 1
    sc = 1 << (bits - 8)
    y = y.astype(np.int64) - 16 * sc
    u = u.astype(np.int64) - 128 * sc
    v = v.astype(np.int64) - 128 * sc
    # 65536 * 255/219 etc.
    cy, crv, cgu, cgv, cbu = 76309, 104597, 25675, 53279, 132201
    r = (cy * y + crv * v + 32768) >> 16
    g = (cy * y - cgu * u - cgv * v + 32768) >> 16
    b = (cy * y + cbu * u + 32768) >> 16
    return tuple(np.clip(c, 0, ymax) for c in (r, g, b))


def _rgb_to_yuv(r, g, b, bits):
    sc = 1 << (bits - 8)
    r = r.astype(np.int64)
    g = g.astype(np.int64)
    b = b.astype(np.int64)
    y = ((16829 * r + 33039 * g + 6416 * b + 32768) >> 16) + 16 * sc
    u = ((-9714 * r - 19071 * g + 28784 * b + 32768) >> 16) + 128 * sc
    v = ((28784 * r - 24103 * g - 4681 * b + 32768) >> 16) + 128 * sc
    mx = (1 << bits) - 1
    return tuple(np.clip(c, 0, mx) for c in (y, u, v))


def convert(frame: DecodedFrame, dst_name: str) -> DecodedFrame:
    """Convert a decoded frame to `dst_name` (pixfmt.FORMATS key)."""
    src = frame.fmt
    if dst_name == src.name:
        return frame
    dst = _fmt(dst_name)
    h, w = frame.height, frame.width
    planes, (kind, shifts) = _to_planes16(frame)
    sbits = src.depths[0]

    # 1) source to full-res RGB-or-gray working set at source depth
    if kind == "yuv":
        u = _hold_up(planes[1], shifts[0], shifts[1], h, w)
        v = _hold_up(planes[2], shifts[0], shifts[1], h, w)
        work = _yuv_to_rgb(planes[0], u, v, sbits)
        kind = "rgb"
    elif kind == "gray":
        work = (planes[0],)
    else:
        work = tuple(planes)

    dbits = dst.depths[0]
    dname = dst.name

    def rs(p):
        return _rescale(p, sbits, dbits)

    if dname.startswith("gray"):
        if len(work) == 3:
            # full-range luma for gray output (sws gray = full-swing Y)
            r, g, b = (p.astype(np.int64) for p in work)
            gray = (19595 * r + 38470 * g + 7471 * b + 32768) >> 16
            gray = np.clip(gray, 0, (1 << sbits) - 1)
        else:
            gray = work[0]
        out = [rs(gray)]
    elif dname.startswith("rgb"):
        rgb = work if len(work) == 3 else (work[0],) * 3
        rgb = [rs(p) for p in rgb]
        if dst.planar:
            out = rgb
        else:
            il = np.zeros((h, 3 * w), np.int64)
            for i, p in enumerate(rgb):
                il[:, i::3] = p
            out = [il]
    elif dname.startswith("yuv"):
        shifts = (dst.log2_chroma_w, dst.log2_chroma_h)
        rgb = work if len(work) == 3 else (work[0],) * 3
        y, u, v = _rgb_to_yuv(*rgb, sbits)
        out = [rs(y),
               rs(_box_down(u, shifts[0], shifts[1])),
               rs(_box_down(v, shifts[0], shifts[1]))]
    else:
        raise ValueError(f"unsupported destination format {dname!r}")

    dt = np.uint8 if dbits <= 8 else np.uint16
    return DecodedFrame(fmt=dst, width=w, height=h,
                        planes=[p.astype(dt) for p in out])
