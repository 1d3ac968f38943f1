#!/usr/bin/env python3
"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline: config 3 of BASELINE.json — 4K 10-bit 4:4:4 HTJ2K intra decode
through the TPU pipeline (models/decoder.Decoder), frames/sec/chip, with
vs_baseline = fps / 60 (the north-star bar is defined for exactly this
config, so the ratio is unscaled and honest). The other BASELINE configs
are measured too and shipped in the same JSON line under "detail":

  1. 512x512 8-bit gray lossless (5/3), 16-frame motion batch
  2. 1920x1080 8-bit RGB lossy 9/7 + ICT (float path, ffmpeg's default)
  3. 4K 10-bit 4:4:4 lossless, 64x64 codeblocks   <- headline
  4. 8K tiled (1024x1024 tiles) 10-bit, 64x64 precincts, 2 layers
  5. 4 parallel 4K Motion-HTJ2K frames demuxed from an MXF container

Numbers include host parse + stream prep + transfers + device compute
(the tunneled link is the wall for the big configs; mb_out/frame is
reported so the link-bound share is visible). Each config takes the best
of `reps` timed runs after a warmup/compile run — the shared tunnel chip
jitters 2-3x run to run.
"""

import json
import sys
import time

import numpy as np


def _smooth(h, w, lo=0, hi=255, dtype=np.uint8):
    x = np.linspace(0, 11, w)
    y = np.linspace(0, 7, h)
    base = np.sin(y[:, None]) * np.cos(x[None, :])
    return (((base + 1) / 2) * (hi - lo) + lo).astype(dtype)


def _time_batch(dec, streams, reps=3):
    from ffmpeg_ht_tpu.models.decoder import Decoder  # noqa: F401
    frames = dec.decode_batch(streams)  # compile + warmup
    mb_out = sum(f.tobytes().__len__() for f in frames) / 1e6
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        dec.decode_batch(streams)
        best = min(best, time.perf_counter() - t0)
    return len(streams) / best, mb_out / len(streams)


def main() -> None:
    # persistent XLA cache: the v2 entropy kernels compile per
    # (shape-class, lane-count, width) variant; cache them across runs
    import os
    os.environ.setdefault("FFMPEG_HT_TPU_CACHE",
                          os.path.join(os.path.dirname(
                              os.path.abspath(__file__)), ".xla_cache"))

    from ffmpeg_ht_tpu.models.decoder import Decoder
    from ffmpeg_ht_tpu.models.encoder import encode_frame_htj2k

    rng = np.random.default_rng(0)
    detail = {}
    dec = Decoder(bitexact=True)

    # Non-headline configs never take the JSON line down with them: a
    # flaky tunnel run that still measured c3 must still report it.
    def config(key, fn):
        try:
            fn()
        except Exception as e:
            detail[key] = {"error": repr(e)[:200]}
            print(f"# {key} FAILED: {e!r}", file=sys.stderr)

    # config 1: 512x512 8-bit gray lossless motion batch (16 frames)
    def c1():
        imgs = [rng.integers(0, 256, (512, 512), dtype=np.uint8)
                for _ in range(16)]
        streams = [encode_frame_htj2k(i, tile_width=512, tile_height=512,
                                      log2_cblk_width=6,
                                      log2_cblk_height=6)
                   for i in imgs]
        frames = dec.decode_batch(streams)
        assert all(f.tobytes() == i.tobytes()
                   for f, i in zip(frames, imgs)), \
            "config-1 decode not lossless"
        fps, mb = _time_batch(dec, streams, reps=4)
        detail["c1_512_gray_lossless"] = {"fps": round(fps, 3),
                                          "mb_out_per_frame": round(mb, 2)}
        print(f"# c1 512x512 gray lossless: {fps:.2f} fps",
              file=sys.stderr)
    config("c1_512_gray_lossless", c1)

    # config 2: 1080p RGB lossy 9/7 + ICT, float path (ffmpeg default),
    # 4-frame batch
    def c2():
        base = _smooth(1080, 1920)
        rgb = [np.stack([np.roll(base, i, 1), base[::-1], base], axis=2)
               for i in range(4)]
        streams = [encode_frame_htj2k(f, pred=0, mct=True,
                                      tile_width=2048, tile_height=2048,
                                      log2_cblk_width=6,
                                      log2_cblk_height=6, nreslevels=6)
                   for f in rgb]
        dec_f = Decoder(bitexact=False)
        fps, mb = _time_batch(dec_f, streams)
        detail["c2_1080p_rgb_lossy_ict"] = {"fps": round(fps, 3),
                                            "mb_out_per_frame": round(mb, 2)}
        print(f"# c2 1080p RGB 9/7+ICT: {fps:.2f} fps", file=sys.stderr)
    config("c2_1080p_rgb_lossy_ict", c2)

    # config 3 (headline): 4K 10-bit 4:4:4 lossless, 64x64 codeblocks
    b10 = _smooth(2160, 3840, 0, 1023, np.uint16)
    f4k = [np.stack([b10, np.roll(b10, 5, 1), np.roll(b10, 9, 0)], axis=2)]
    streams_4k = [encode_frame_htj2k(f, depth=10, tile_width=4096,
                                     tile_height=4096, log2_cblk_width=6,
                                     log2_cblk_height=6)
                  for f in f4k]
    fps4k, mb = _time_batch(dec, streams_4k, reps=3)
    detail["c3_4k_444_10bit_lossless"] = {"fps": round(fps4k, 3),
                                          "mb_out_per_frame": round(mb, 2)}
    print(f"# c3 4K 4:4:4 10-bit: {fps4k:.3f} fps", file=sys.stderr)

    # c3 device-compute rate: dispatch + on-device completion without the
    # packed-output fetch. On the tunneled bench chip the pipeline number
    # above is link-bound (mb_out/frame at ~10-16 MB/s); this isolates
    # what a direct-attached chip would sustain.
    from ffmpeg_ht_tpu.codestream.parser import parse_codestream
    hdr4k = parse_codestream(streams_4k[0], bitexact=True)
    fast = dec._fast_launch(hdr4k)
    if fast is not None:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _fg, packed = dec._fast_launch(hdr4k)
            packed.block_until_ready()
            best = min(best, time.perf_counter() - t0)
        detail["c3_device_compute"] = {"fps": round(1.0 / best, 3)}
        print(f"# c3 device-compute (no fetch): {1.0 / best:.3f} fps",
              file=sys.stderr)

    # c3 device-RESIDENT steady state (VERDICT r2 item 1): the frame's
    # lane arrays are staged on device ONCE, then N full decode
    # iterations of the fused v3 program (merged-bucket entropy +
    # scatter-free assembly + DWT + MCT, models/assembly.py) run back to
    # back with no host->device data motion and no output fetch. Sync is
    # a scalar fetch: block_until_ready can return early on the tunneled
    # platform. This is the pure chip rate a direct-attached deployment
    # sustains once the host parse pipeline keeps the queue full.
    try:
        from ffmpeg_ht_tpu.models import assembly as ASM
        from ffmpeg_ht_tpu.models import fastpath as FP
        fg = dec._fast_geom(hdr4k)
        cols = FP.parse_frame_flat(hdr4k, fg)
        if fg.v3_plan is None:
            fg.v3_plan = ASM.build_plan(fg) or False
        assert fg.v3_plan, "geometry not v3-capable"
        fc = FP.build_v3_frame(fg, cols)
        args, _F = FP.finish_v3(fg, [fc], fg.geom.total)
        mb = int(fc["maxbp"][fc["qws"] > 0].max())
        msc = next(c for c in (8, 12, 16, 20, 25) if mb <= c)
        prog = ASM.make_v3_program(
            fg.v3_plan, fg.geom.key(), qw=fg.v3_plan.bw // 2,
            qh=fg.v3_plan.bh // 2, ms_class=msc, n_pad=fg.ncblks,
            frames=1, donate=True,
            no_istep=bool(np.all(np.asarray(args["istep"]) == 32768)))
        import jax.numpy as jnp
        shape, dt = ASM.packed_shape(fg.geom.key(), 1)
        packed = prog(jnp.zeros(shape, dt), **args)
        _sync = np.asarray(packed[-1])          # warmup, forced
        n_it = 10
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(n_it):
                packed = prog(packed, **args)
            _sync = np.asarray(packed[-1])
            best = min(best, (time.perf_counter() - t0) / n_it)
        detail["c3_device_resident"] = {"fps": round(1.0 / best, 3),
                                        "ms_per_frame": round(best * 1e3, 2)}
        print(f"# c3 device-resident: {1.0 / best:.3f} fps "
              f"({best * 1e3:.1f} ms/frame)", file=sys.stderr)
        # batched steady state: F frames share one fused launch. The scan
        # kernel is one long dependency chain, so ~6k lanes leave the VPU
        # latency-bound; doubling lanes costs less than 2x (motion decode
        # naturally batches frames, c5-style).
        for F in (2, 4):
            argsF, _ = FP.finish_v3(fg, [fc] * F, fg.geom.total)
            progF = ASM.make_v3_program(
                fg.v3_plan, fg.geom.key(), qw=fg.v3_plan.bw // 2,
                qh=fg.v3_plan.bh // 2, ms_class=msc, n_pad=fg.ncblks,
                frames=F, donate=True,
                no_istep=bool(np.all(np.asarray(args["istep"]) == 32768)))
            shapeF, dtF = ASM.packed_shape(fg.geom.key(), F)
            packedF = progF(jnp.zeros(shapeF, dtF), **argsF)
            _sync = np.asarray(packedF[-1])
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(n_it):
                    packedF = progF(packedF, **argsF)
                _sync = np.asarray(packedF[-1])
                best = min(best, (time.perf_counter() - t0) / n_it)
            fpsF = F / best
            detail["c3_device_resident"][f"batched_f{F}_fps"] = \
                round(fpsF, 3)
            print(f"# c3 device-resident F={F}: {fpsF:.3f} fps "
                  f"({best * 1e3 / F:.1f} ms/frame)", file=sys.stderr)
        # stage breakdown: merged entropy kernel alone (scalar-reduced so
        # the timing excludes the platform's fresh-output-buffer cost)
        import jax
        import jax.numpy as jnp
        from ffmpeg_ht_tpu.ops.ht_scan import _cleanup_impl

        @jax.jit
        def kern(msw, melw, vlcw, pLSB, maxbp, ms_lim, mel_lim, qws, qhs):
            mu, _sg, ok = _cleanup_impl(
                msw, melw, vlcw, pLSB, maxbp, ms_lim, mel_lim,
                qw=fg.v3_plan.bw // 2, qh=fg.v3_plan.bh // 2,
                ms_class=msc, dims=(qws, qhs))
            return (jnp.sum(mu, dtype=jnp.uint32)
                    + jnp.uint32(jnp.all(ok)))

        ka = {k: args[k] for k in ("msw", "melw", "vlcw", "pLSB", "maxbp",
                                   "ms_lim", "mel_lim", "qws", "qhs")}
        _sync = np.asarray(kern(**ka))
        t0 = time.perf_counter()
        for _ in range(n_it):
            s = kern(**ka)
        _sync = np.asarray(s)
        ent = (time.perf_counter() - t0) / n_it
        detail["c3_device_resident"]["entropy_ms"] = round(ent * 1e3, 2)
        print(f"# c3 entropy stage: {ent * 1e3:.1f} ms/frame",
              file=sys.stderr)
    except Exception as e:  # never let the diagnostic kill the bench
        print(f"# c3 device-resident failed: {e!r}", file=sys.stderr)

    # config 4: 8K tiled 10-bit gray lossless, 64x64 precincts and two
    # quality layers (Cleanup / SigProp+MagRef split) per BASELINE.json:
    # "multiple precincts and quality layers (stress codeblock batching)"
    def c4():
        b8k = _smooth(4320, 7680, 0, 1023, np.uint16)
        streams = [encode_frame_htj2k(b8k, depth=10, tile_width=1024,
                                      tile_height=1024, log2_cblk_width=6,
                                      log2_cblk_height=6,
                                      log2_prec_width=6,
                                      refinement=True, ht_layers=2)]
        fps, mb = _time_batch(dec, streams, reps=2)
        detail["c4_8k_tiled_prec_layers"] = {"fps": round(fps, 3),
                                             "mb_out_per_frame": round(mb, 2)}
        print(f"# c4 8K tiled prec+layers: {fps:.3f} fps",
              file=sys.stderr)
    config("c4_8k_tiled_prec_layers", c4)

    # config 5: N=2 parallel 4K Motion-HTJ2K streams from a real MXF
    # container (BASELINE.json: "Motion-HTJ2K sequence (MJ2/MXF)")
    def c5():
        from ffmpeg_ht_tpu.containers.mxf import demux_mxf, mux_mxf
        seq = streams_4k + [
            encode_frame_htj2k(np.stack([np.roll(b10, k, 1)] * 3, axis=2),
                               depth=10, tile_width=4096,
                               tile_height=4096, log2_cblk_width=6,
                               log2_cblk_height=6)
            for k in (3, 7, 11)]
        mxf = mux_mxf(seq, 3840, 2160, ncomp=3, depth=10)
        streams = list(demux_mxf(mxf))
        assert streams == seq, "MXF round-trip corrupted the essence"
        fps, mb = _time_batch(dec, streams, reps=2)
        detail["c5_mxf_4k_motion"] = {"fps": round(fps, 3),
                                      "mb_out_per_frame": round(mb, 2)}
        print(f"# c5 MXF 4K motion: {fps:.3f} fps", file=sys.stderr)
    config("c5_mxf_4k_motion", c5)

    print(json.dumps({
        "metric": "decode_fps_4k_444_10bit_lossless_tpu",
        "value": round(fps4k, 3),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps4k / 60.0, 4),
        "detail": detail,
    }))


if __name__ == "__main__":
    sys.exit(main())
