#!/usr/bin/env python3
"""Differential parameter-sweep fuzzer (VERDICT r3 missing #4 / item 7).

Breaks the HT-corpus circularity axis-by-axis: each trial draws a random
encoder configuration (dims, tiles, codeblock/precinct geometry,
progression, POC, layers, placeholder passes, causal, MIXED, packed
headers, tile-parts, depth, MCT, lossy/lossless) and a random image,
encodes with OUR encoder, then requires

  * the REFERENCE binary (zero shared code) to decode it to the source
    pixels (lossless) or to SOME output (lossy) — i.e. the bitstream is
    standard-conformant by an independent implementation's judgment, and
  * our host decoder to agree with the reference byte-exactly.

Any disagreement is a real encode- or decode-side bug. Usage:
    python tools/fuzz_params.py [N] [seed]
Prints one JSON line {trials, failures: [...]}.
"""

import json
import os
import subprocess
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FFMPEG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "third_party", "ffmpeg-build", "ffmpeg")


def ref_decode(data: bytes, *args) -> bytes:
    with tempfile.NamedTemporaryFile(suffix=".j2k", delete=False) as f:
        f.write(data)
        p = f.name
    try:
        r = subprocess.run([FFMPEG, "-loglevel", "error", "-flags",
                            "+bitexact", *args, "-i", p,
                            "-f", "rawvideo", "-"],
                           capture_output=True, timeout=60)
    finally:
        os.unlink(p)
    if r.returncode != 0:
        raise RuntimeError("reference decode failed: "
                           + r.stderr.decode()[-200:])
    return r.stdout


def draw_config(rng: np.random.Generator) -> dict:
    h = int(rng.integers(8, 161))
    w = int(rng.integers(8, 161))
    ncomp = int(rng.choice([1, 1, 3, 4]))
    depth = int(rng.choice([8, 8, 8, 10, 12, 16]))
    kw = {}
    if rng.random() < 0.5:
        kw["tile_width"] = int(rng.choice([32, 48, 64, 96, 256]))
        kw["tile_height"] = int(rng.choice([32, 48, 64, 96, 256]))
    kw["nreslevels"] = int(rng.integers(1, 7))
    kw["log2_cblk_width"] = int(rng.integers(2, 7))
    kw["log2_cblk_height"] = int(rng.integers(2, 7))
    kw["prog"] = str(rng.choice(["lrcp", "rlcp", "rpcl", "pcrl", "cprl"]))
    if rng.random() < 0.35:
        kw["log2_prec_width"] = int(rng.integers(
            max(3, kw["log2_cblk_width"]), 8))
        kw["log2_prec_height"] = int(rng.integers(
            max(3, kw["log2_cblk_height"]), 8))
    kw["sop"] = bool(rng.random() < 0.25)
    kw["eph"] = bool(rng.random() < 0.25)
    refinement = bool(rng.random() < 0.4)
    if refinement:
        kw["ht_layers"] = int(rng.choice([1, 2, 3]))
        kw["causal"] = bool(rng.random() < 0.3)
    elif rng.random() < 0.2:
        kw["ht_plhd_single"] = True
    lossy = rng.random() < 0.25 and not refinement
    if lossy:
        kw["pred"] = 0
    cfgx = {}
    if ncomp == 3 and rng.random() < 0.3:
        cfgx["chroma_shift"] = (int(rng.integers(0, 2)),
                                int(rng.integers(0, 2)))
    if ncomp >= 3 and cfgx.get("chroma_shift", (0, 0)) == (0, 0) \
            and rng.random() < 0.4:
        kw["mct"] = True
    if not lossy and not refinement and not kw.get("ht_plhd_single") \
            and rng.random() < 0.15:
        kw["ht_mixed"] = True
    # packed headers / tile parts / tlm are mutually constrained
    form = rng.random()
    if form < 0.15:
        kw["ppm"] = True
    elif form < 0.35:
        kw["ppt"] = True
        if rng.random() < 0.5:
            kw["tp_interval"] = int(rng.integers(1, 6))
    elif form < 0.45:
        kw["tp_interval"] = int(rng.integers(1, 6))
    if form >= 0.15 and rng.random() < 0.2:
        kw["tlm"] = True
    if rng.random() < 0.25:
        nres = kw["nreslevels"]
        if nres >= 2:
            split = int(rng.integers(1, nres))
            kw["poc"] = [
                (0, 0, kw.get("ht_layers", 1), split, ncomp,
                 str(rng.choice(["lrcp", "rlcp"]))),
                (split, 0, kw.get("ht_layers", 1), 33, ncomp,
                 str(rng.choice(["lrcp", "rlcp", "rpcl", "pcrl",
                                 "cprl"]))),
            ]
    return dict(h=h, w=w, ncomp=ncomp, depth=depth,
                refinement=refinement, lossy=lossy, kw=kw, **cfgx)


try:
    from PIL import features as _pil_features
    _PIL_J2K = _pil_features.check("jpg_2000")
except Exception:
    _PIL_J2K = False


def run_trial(rng, cfg) -> "str | None":
    from ffmpeg_ht_tpu.models.encoder import encode_frame_htj2k
    from ffmpeg_ht_tpu.models.host_decoder import decode_frame

    dt = np.uint8 if cfg["depth"] <= 8 else np.uint16
    shift = cfg.get("chroma_shift", (0, 0))
    if cfg["ncomp"] == 1:
        img = rng.integers(0, 1 << cfg["depth"], (cfg["h"], cfg["w"]),
                           dtype=dt)
        planes = img
    elif shift != (0, 0):
        # subsampled planar input (4:2:0 / 4:2:2-style); the reference
        # decodes it back as planar yuv
        from ffmpeg_ht_tpu.codestream.geometry import ceildiv
        planes = [rng.integers(0, 1 << cfg["depth"],
                               (ceildiv(cfg["h"], (1 << shift[1])
                                        if (i + 1) & 2 else 1),
                                ceildiv(cfg["w"], (1 << shift[0])
                                        if (i + 1) & 2 else 1)),
                               dtype=dt)
                  for i in range(cfg["ncomp"])]
        img = None
    else:
        img = rng.integers(0, 1 << cfg["depth"],
                           (cfg["h"], cfg["w"], cfg["ncomp"]), dtype=dt)
        planes = img
    data = encode_frame_htj2k(planes if img is None else img,
                              depth=cfg["depth"], chroma_shift=shift,
                              refinement=cfg["refinement"], **cfg["kw"])
    ref = ref_decode(data)
    if not cfg["lossy"]:
        # reference-judged conformance: an independent decoder must
        # reconstruct the source (16-bit output is MSB-aligned;
        # subsampled input comes back planar)
        def msb(p):
            return p if cfg["depth"] in (8, 16) else \
                (p.astype(np.uint16) << (16 - cfg["depth"]))
        if img is not None:
            # subsampled (planar) outputs skip this check: the
            # reference negotiates native-precision yuv pix fmts whose
            # raw layout this harness does not model; the byte-exact
            # ours-vs-reference comparison below still holds
            if ref != msb(img).tobytes():
                return "reference decode != source " \
                    "(non-conformant stream?)"
    ours = decode_frame(data, bitexact=True).tobytes()
    if ours != ref:
        return "our decode != reference decode"
    # third vote: OpenJPEG (via Pillow, zero shared code with us or the
    # reference) must also reconstruct the source on configs it covers.
    # Outside its coverage (probed, not our bugs): MIXED streams (its HT
    # decoder is HTONLY-scoped); HT pass segments split across layers
    # (refinement + ht_layers>=2 -> multi-chunk codeblocks, which it
    # rejects at any depth); >8-bit RGB (Pillow renders it 8-bit).
    if _PIL_J2K and not cfg["lossy"] and img is not None \
            and (cfg["ncomp"] == 1
                 or (cfg["ncomp"] == 3 and cfg["depth"] == 8)) \
            and not cfg["kw"].get("ht_mixed") \
            and not (cfg["refinement"]
                     and cfg["kw"].get("ht_layers", 1) >= 2):
        import io
        from PIL import Image
        arr = np.asarray(Image.open(io.BytesIO(data)))
        want = img if cfg["depth"] in (8, 16) else \
            (img.astype(np.uint16) << (16 - cfg["depth"]))
        if arr.tobytes() != want.tobytes():
            return "openjpeg decode != source"
    # lowres axis: every resolution-reduced reconstruction must match
    # the reference's -lowres output too (exercises the discard-zone
    # parse against an independent implementation)
    nres = cfg["kw"].get("nreslevels", 1)
    if nres >= 2 and rng.random() < 0.3:
        r = int(rng.integers(1, nres))
        lr_ref = ref_decode(data, "-lowres", str(r))
        lr_ours = decode_frame(data, bitexact=True,
                               reduction_factor=r).tobytes()
        if lr_ours != lr_ref:
            return f"lowres r={r} decode != reference -lowres"
    return None


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 2024
    rng = np.random.default_rng(seed)
    failures = []
    for t in range(n):
        cfg = draw_config(rng)
        try:
            err = run_trial(rng, cfg)
        except Exception as e:
            err = f"exception: {e!r:.200}"
        if err:
            failures.append({"trial": t, "cfg": {k: v for k, v in
                                                 cfg.items() if k != "kw"},
                             "kw": {k: str(v) for k, v in
                                    cfg["kw"].items()},
                             "err": err})
            print(f"# trial {t} FAILED: {err} cfg={cfg}", file=sys.stderr)
        if (t + 1) % 10 == 0:
            print(f"# {t + 1}/{n} trials, {len(failures)} failures",
                  file=sys.stderr)
    print(json.dumps({"trials": n, "seed": seed,
                      "nfailures": len(failures),
                      "failures": failures[:10]}))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
