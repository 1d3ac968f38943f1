#!/usr/bin/env python3
"""On-chip end-to-end parity: Decoder.decode on the real TPU must match
the host (numpy oracle) decode byte-for-byte on the bench 4K stream.

Settles whether tools/profile_stages.py's `bit-exact: False` tail line
is a harness-comparison artifact or a real TPU divergence.

Usage: python tools/tpu_parity.py  (needs the TPU)
"""
import os
import sys

os.environ.setdefault("FFMPEG_HT_TPU_CACHE", "/root/repo/.xla_cache_tpu")
sys.path.insert(0, "/root/repo")

import numpy as np
import jax

print(f"devices: {jax.devices()}", flush=True)

from ffmpeg_ht_tpu.models.decoder import Decoder
from ffmpeg_ht_tpu.models.host_decoder import decode_frame
from ffmpeg_ht_tpu.models.encoder import encode_frame_htj2k


def _smooth(h, w, lo=0, hi=255, dtype=np.uint8):
    x = np.linspace(0, 11, w)
    y = np.linspace(0, 7, h)
    base = np.sin(y[:, None]) * np.cos(x[None, :])
    return (((base + 1) / 2) * (hi - lo) + lo).astype(dtype)


b10 = _smooth(2160, 3840, 0, 1023, np.uint16)
f4k = np.stack([b10, np.roll(b10, 5, 1), np.roll(b10, 9, 0)], axis=2)
s4k = encode_frame_htj2k(f4k, depth=10, tile_width=4096,
                         tile_height=4096, log2_cblk_width=6,
                         log2_cblk_height=6)
print(f"stream: {len(s4k)} bytes", flush=True)

host = decode_frame(s4k, bitexact=True)
dev = Decoder(bitexact=True).decode(s4k)
hb, db = host.tobytes(), dev.tobytes()
print(f"host {len(hb)}B dev {len(db)}B", flush=True)
if hb == db:
    print("TPU PARITY: EXACT", flush=True)
else:
    a = np.frombuffer(hb, "<u2").astype(np.int64)
    b = np.frombuffer(db, "<u2").astype(np.int64)
    bad = np.nonzero(a != b)[0]
    print(f"TPU PARITY: MISMATCH n={len(bad)} first={bad[:8]} "
          f"maxdiff={np.abs(a - b).max()}", flush=True)
