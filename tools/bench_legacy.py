#!/usr/bin/env python3
"""Legacy (MQ/EBCOT) tier speed vs the reference C decoder.

Round-2 defined done for the legacy tier as "decode within ~10x of
reference C single-thread" (VERDICT r3 missing #5; match:
jpeg2000dec.c:1872-2089 + mqcdec.c:45-107). This measures exactly that:
the same T.800 codestreams decoded by

  * ours: ffmpeg_ht_tpu.models.host_decoder.decode_frame, whose T1 is
    native/ebcot.c via ops/ebcot.decode_cblk, and
  * reference: third_party/ffmpeg-build/ffmpeg -threads 1 (subprocess;
    its process startup is measured separately on a tiny stream and
    subtracted so the ratio compares decode work, not exec()).

Prints one JSON line: per-config ms and the ours/reference ratio.
Host-only — no TPU involved anywhere in this path.
"""

import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FFMPEG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "third_party", "ffmpeg-build", "ffmpeg")


def _smooth(h, w, lo=0, hi=255, dtype=np.uint8):
    x = np.linspace(0, 11, w)
    y = np.linspace(0, 7, h)
    base = np.sin(y[:, None]) * np.cos(x[None, :])
    return (((base + 1) / 2) * (hi - lo) + lo).astype(dtype)


def _ref_decode_s(path: str, reps: int) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        subprocess.run([FFMPEG, "-loglevel", "error", "-threads", "1",
                        "-i", path, "-f", "rawvideo", "-y", os.devnull],
                       check=True)
        best = min(best, time.perf_counter() - t0)
    return best


def _ours_decode_s(data: bytes, reps: int) -> float:
    from ffmpeg_ht_tpu.models.host_decoder import decode_frame
    decode_frame(data)  # warm imports / caches
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        decode_frame(data)
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> int:
    from ffmpeg_ht_tpu.models.encoder import encode_frame_t800

    if not os.path.exists(FFMPEG):
        print(json.dumps({"error": "reference ffmpeg binary missing"}))
        return 1

    reps = int(os.environ.get("LEGACY_REPS", "3"))
    rng = np.random.default_rng(7)

    configs = {
        # name -> (frame, encoder kwargs)
        "gray1024_lossless53": (_smooth(1024, 1024), {}),
        "rgb1080p_lossless53": (
            np.stack([_smooth(1080, 1920),
                      _smooth(1080, 1920)[::-1],
                      rng.integers(0, 256, (1080, 1920), np.uint8)], axis=2),
            {}),
        "gray1024_lossy97": (_smooth(1024, 1024), {"pred": 0}),
    }

    out = {}
    with tempfile.TemporaryDirectory() as td:
        # exec()+startup overhead: decode a 16x16 stream (near-zero work)
        tiny = encode_frame_t800(_smooth(16, 16))
        tinyp = os.path.join(td, "tiny.j2k")
        with open(tinyp, "wb") as f:
            f.write(tiny)
        startup = _ref_decode_s(tinyp, max(reps, 5))
        out["ref_startup_ms"] = round(startup * 1e3, 1)

        worst = 0.0
        for name, (frame, kw) in configs.items():
            data = encode_frame_t800(frame, **kw)
            p = os.path.join(td, name + ".j2k")
            with open(p, "wb") as f:
                f.write(data)
            ref_s = max(_ref_decode_s(p, reps) - startup, 1e-9)
            ours_s = _ours_decode_s(data, reps)
            ratio = ours_s / ref_s
            worst = max(worst, ratio)
            out[name] = {"ours_ms": round(ours_s * 1e3, 1),
                         "ref_ms": round(ref_s * 1e3, 1),
                         "ratio": round(ratio, 2)}
            print(f"# {name}: ours {ours_s*1e3:.1f} ms, "
                  f"ref {ref_s*1e3:.1f} ms, ratio {ratio:.2f}x",
                  file=sys.stderr)

    out["worst_ratio"] = round(worst, 2)
    out["within_10x"] = worst <= 10.0
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
