"""Minimal MXF (SMPTE 377M) demuxer for JPEG 2000 essence.

The reference routes IMF/DCP-style MXF through libavformat/mxfdec.c
(JPEG2000 essence ULs at mxfdec.c:1617,1647). This module is a compact
KLV walker: it scans the KLV triplet stream (16-byte UL keys, BER
lengths) and yields the generic-container picture essence elements —
frame-wrapped JPEG 2000 codestreams — without interpreting the header
metadata sets. Enough for single-essence OP1a/OP-Atom files like those
the reference `ffmpeg -f mxf` writes (cross-checked in
tests/test_containers.py).
"""

from __future__ import annotations

from typing import Iterator

# SMPTE 336M KLV key prefix for MXF (06.0E.2B.34)
_MXF_PREFIX = b"\x06\x0e\x2b\x34"
# partition pack key prefix (06.0E.2B.34.02.05.01.01.0D.01.02)
_PARTITION = b"\x06\x0e\x2b\x34\x02\x05\x01\x01\x0d\x01\x02"
# generic container essence element key prefix
# (06.0E.2B.34.01.02.01.xx.0D.01.03.01) — byte 12 is the item type:
# 0x05 = CP picture, 0x15 = GC picture (JPEG 2000 uses 0x15, element
# types 0x08/0x09, mxfenc.c)
_GC_ESSENCE = b"\x06\x0e\x2b\x34\x01\x02\x01"


def _ber_length(data: bytes, pos: int):
    """BER length at pos -> (length, new_pos)."""
    b = data[pos]
    pos += 1
    if b < 0x80:
        return b, pos
    n = b & 0x7F
    if n == 0 or n > 8 or pos + n > len(data):
        raise ValueError("bad BER length")
    return int.from_bytes(data[pos:pos + n], "big"), pos + n


def probe_mxf(data: bytes) -> bool:
    """A header partition pack within the first 64KiB (mxfdec probe)."""
    return data.find(_PARTITION, 0, 1 << 16) >= 0


def _is_picture_essence(key: bytes) -> bool:
    if not key.startswith(_GC_ESSENCE):
        return False
    if key[8:12] != b"\x0d\x01\x03\x01":
        return False
    item_type = key[12]
    return item_type in (0x05, 0x15)  # CP / GC picture item


def demux_mxf(data: bytes) -> Iterator[bytes]:
    """Yield JPEG 2000 codestream frames from an MXF file."""
    pos = data.find(_PARTITION)
    if pos < 0:
        raise ValueError("not an MXF file (no partition pack)")
    n = len(data)
    while pos + 17 <= n:
        key = data[pos:pos + 16]
        if not key.startswith(_MXF_PREFIX):
            # resync: look for the next KLV key
            nxt = data.find(_MXF_PREFIX, pos + 1)
            if nxt < 0:
                return
            pos = nxt
            continue
        try:
            length, vpos = _ber_length(data, pos + 16)
        except (ValueError, IndexError):
            return
        if vpos + length > n:
            return
        if _is_picture_essence(key):
            payload = data[vpos:vpos + length]
            # frame-wrapped JPEG 2000: the payload is one codestream
            if payload[:2] == b"\xff\x4f" or payload[:4] == b"\x00\x00\x00\x0c":
                yield payload
        pos = vpos + length
