#!/usr/bin/env python3
"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline: HTJ2K decode throughput in frames/sec/chip. Baseline target is
60 fps for 4K 4:4:4 10-bit (BASELINE.json); vs_baseline = value / 60.
Falls back to smaller configs while the pipeline is being built out.
"""

import json
import sys
import time

import numpy as np


def main() -> None:
    # Current stage: host decode pipeline (device pipeline lands next).
    # Bench config 1: 512x512 8-bit grayscale lossless, single tile/layer.
    from ffmpeg_ht_tpu.models.host_decoder import decode_frame
    from ffmpeg_ht_tpu.models.encoder import encode_frame_t800

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (512, 512), dtype=np.uint8)
    try:
        data = encode_frame_t800(img)
    except Exception:
        # encoder not available yet: synthesize via reference ffmpeg if present
        import os
        import subprocess
        import tempfile
        ff = "third_party/ffmpeg-build/ffmpeg"
        if not os.path.exists(ff):
            print(json.dumps({"metric": "decode_fps_512x512_gray", "value": 0.0,
                              "unit": "frames/sec/chip", "vs_baseline": 0.0}))
            return
        with tempfile.NamedTemporaryFile(suffix=".raw") as f:
            f.write(img.tobytes())
            f.flush()
            out = f.name + ".j2k"
            subprocess.run([ff, "-y", "-loglevel", "error", "-f", "rawvideo",
                            "-pix_fmt", "gray", "-s", "512x512", "-i", f.name,
                            "-c:v", "jpeg2000", "-pred", "1", "-f", "image2",
                            "-update", "1", out], check=True)
            data = open(out, "rb").read()
            os.unlink(out)

    # warmup + measure
    decode_frame(data, bitexact=True)
    n = 3
    t0 = time.perf_counter()
    for _ in range(n):
        decode_frame(data, bitexact=True)
    dt = (time.perf_counter() - t0) / n
    fps = 1.0 / dt
    print(json.dumps({
        "metric": "decode_fps_512x512_gray_lossless",
        "value": round(fps, 3),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / 60.0, 4),
    }))


if __name__ == "__main__":
    sys.exit(main())
