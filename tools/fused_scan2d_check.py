#!/usr/bin/env python3
"""On-chip check that the FUSED v3 program compiles and runs with the
scan2d kernel variant (the round-5 promoted default for TPU), and a
quick rate A/B vs the 1-D default on a small real stream."""
import os
import sys
import time

os.environ.setdefault("FFMPEG_HT_TPU_CACHE", "/root/repo/.xla_cache_tpu")
sys.path.insert(0, "/root/repo")

import numpy as np
import jax

from ffmpeg_ht_tpu.models.decoder import Decoder
from ffmpeg_ht_tpu.models.encoder import encode_frame_htj2k

print(f"devices: {jax.devices()}", flush=True)

rng = np.random.default_rng(7)
x = np.linspace(0, 11, 1024)
img = ((np.sin(np.outer(x, x)) * 380 + 500).astype(np.uint16)
       + rng.integers(0, 96, (1024, 1024)).astype(np.uint16))
img3 = np.stack([img, np.roll(img, 3, 1), np.roll(img, 7, 0)], axis=2)
data = encode_frame_htj2k(img3, depth=10, tile_width=1024,
                          tile_height=1024, log2_cblk_width=6,
                          log2_cblk_height=6)

dec = Decoder()
ref = dec.decode(data)          # host-orchestrated reference decode

for kv in (None, ("scan2d",)):
    t0 = time.perf_counter()
    res = dec.bench_resident([data], n_it=10, kernel_variants=kv)
    print(f"variant={kv}: {res['fps']:.2f} fps "
          f"({res['ms_per_frame']:.2f} ms/frame)  "
          f"[wall {time.perf_counter() - t0:.0f}s]", flush=True)

print("fused scan2d: OK", flush=True)
