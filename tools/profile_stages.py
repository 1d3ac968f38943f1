#!/usr/bin/env python3
"""Stage-level profiler for the fused v3 decode program on real TPU.

Builds the bench 4K stream, then times cumulative stage prefixes
(entropy -> +dequant+prefill -> +band mosaics -> +DWT) and the full
fused program at F = 1/2/4 frames per launch, ending with a bit-exact
check against the host decoder. Timings sync via a scalar fetch --
block_until_ready can return early on the tunneled platform.

Usage: python tools/profile_stages.py   (needs the TPU; ~6 compiles)
"""
import os, sys, time
os.environ.setdefault("FFMPEG_HT_TPU_CACHE", "/root/repo/.xla_cache_tpu")
sys.path.insert(0, "/root/repo")
import numpy as np

def _smooth(h, w, lo=0, hi=255, dtype=np.uint8):
    x = np.linspace(0, 11, w); y = np.linspace(0, 7, h)
    base = np.sin(y[:, None]) * np.cos(x[None, :])
    return (((base + 1) / 2) * (hi - lo) + lo).astype(dtype)

from ffmpeg_ht_tpu.models.decoder import Decoder
from ffmpeg_ht_tpu.models.encoder import encode_frame_htj2k
from ffmpeg_ht_tpu.codestream.parser import parse_codestream
from ffmpeg_ht_tpu.models import assembly as ASM
from ffmpeg_ht_tpu.models import fastpath as FP
from ffmpeg_ht_tpu.codestream import markers as mk
import jax, jax.numpy as jnp

b10 = _smooth(2160, 3840, 0, 1023, np.uint16)
f4k = np.stack([b10, np.roll(b10, 5, 1), np.roll(b10, 9, 0)], axis=2)
s4k = encode_frame_htj2k(f4k, depth=10, tile_width=4096, tile_height=4096,
                         log2_cblk_width=6, log2_cblk_height=6)
hdr = parse_codestream(s4k, bitexact=True)
dec = Decoder(bitexact=True)
fg = dec._fast_geom(hdr)
cols = FP.parse_frame_flat(hdr, fg)
fg.v3_plan = ASM.build_plan(fg) or False
fc = FP.build_v3_frame(fg, cols)
mb = int(fc["maxbp"][fc["qws"] > 0].max())
msc = next(c for c in (8, 12, 16, 20, 25) if mb <= c)
qw, qh = fg.v3_plan.bw // 2, fg.v3_plan.bh // 2
plan = fg.v3_plan
gk = fg.geom.key()
(planes, borders, ndecs, mct_flags, tci, cbps, total, transform) = gk
print("transform", transform, "cbps", cbps, "lanes", fg.ncblks,
      "msc", msc, flush=True)

from ffmpeg_ht_tpu.ops.ht_scan import _cleanup_impl
from ffmpeg_ht_tpu.ops.dwt_jax import dwt_decode_bands


def timeit(fn, ka, label, n_it=10):
    t0 = time.perf_counter(); _ = np.asarray(fn(**ka)); c = time.perf_counter() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_it):
            s = fn(**ka)
        _ = np.asarray(s)
        best = min(best, (time.perf_counter()-t0)/n_it)
    print(f"{label}: {best*1e3:.2f} ms  (compile {c:.0f}s)", flush=True)
    return best


def stage_fns(frames):
    n_pad = fg.ncblks

    def upto(msw, melw, vlcw, pLSB, maxbp, ms_lim, mel_lim, qws, qhs,
             magb, istep, scale97, fscale, pf_idx, pf_val, stage=4):
        mu, _sig, ok = _cleanup_impl(
            msw, melw, vlcw, pLSB, maxbp, ms_lim, mel_lim,
            qw=qw, qh=qh, ms_class=msc, dims=(qws, qhs))
        if stage == 0:
            return jnp.sum(mu, dtype=jnp.uint32) + jnp.uint32(jnp.all(ok))
        val = mu.astype(jnp.uint32)
        neg = (val >> 31) == 1
        mag = (val & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
        down = (31 - magb)[:, None, None]
        m = mag >> down
        coef = jnp.where(neg, -m, m).astype(jnp.int32)
        coef = jax.lax.optimization_barrier(coef)
        cflat = coef.reshape(-1).at[pf_idx].set(pf_val, mode="drop")
        coef = cflat.reshape(coef.shape)
        if stage == 1:
            return jnp.sum(coef) + jnp.int32(jnp.all(ok))
        outs = []
        for f in range(frames):
            off = f * n_pad
            for plane_p, border, ndec in zip(plan.planes, borders, ndecs):
                ll, lvls = plane_p.levels
                p = ASM._mosaic_band(coef, ll, off, jnp.int32)
                bands = [tuple(ASM._mosaic_band(coef, bb, off, jnp.int32)
                               for bb in lvl) for lvl in lvls]
                if stage == 2:
                    outs.append(p)
                    outs.extend(b for lvl in bands for b in lvl)
                    continue
                b = [[border[0][0], border[0][1]],
                     [border[1][0], border[1][1]]]
                p = dwt_decode_bands(p, bands, b, ndec, transform)
                outs.append(p)
        return sum(jnp.sum(o) for o in outs) + jnp.int32(jnp.all(ok))
    return upto


for F in (1, 2, 4):
    fcs = [fc] * F
    args, _F = FP.finish_v3(fg, fcs, fg.geom.total)
    print(f"--- frames={F}  N={args['msw'].shape[0]}", flush=True)
    if F == 1:
        up = stage_fns(F)
        for st, lbl in ((0, "entropy"), (1, "+dequant+pf"),
                        (2, "+band mosaics"), (3, "+dwt")):
            fn = jax.jit(lambda stage=st, **kw: up(stage=stage, **kw))
            t = timeit(fn, args, f"F{F} {lbl}")
    prog = ASM.make_v3_program(plan, gk, qw=qw, qh=qh, ms_class=msc,
                               n_pad=fg.ncblks, frames=F, donate=True,
                               no_istep=bool(np.all(np.asarray(args["istep"]) == 32768)))
    shape, dt = ASM.packed_shape(gk, F)
    packed = prog(jnp.zeros(shape, dt), **args)
    _ = np.asarray(packed[-1])
    n_it = 10
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_it):
            packed = prog(packed, **args)
        _ = np.asarray(packed[-1])
        best = min(best, (time.perf_counter()-t0)/n_it)
    print(f"F{F} full fused: {best*1e3:.2f} ms ({F/best:.1f} fps)", flush=True)
    last_packed = packed

# correctness: fused output (frame 0 of the last batched run) vs the
# host decoder. The packed buffer holds prescaled plane pixels in
# geom.planes order at cbps scale; the host DecodedFrame is interleaved
# rgb48 (vals << (precision - cbps)) — compare in packed space.
from ffmpeg_ht_tpu.models import pixfmt as pfmt
from ffmpeg_ht_tpu.models.host_decoder import decode_frame
ref = decode_frame(s4k, bitexact=True)
prec_shift = pfmt.output_precision(ref.fmt, hdr.siz.precision) - 10
out = np.asarray(last_packed)
okf = int(out[-1])
got = out[:fg.geom.total]
exact = True
off = 0
for c, (_o, ph, pw) in enumerate(fg.geom.planes):
    exp = (ref.planes[0][:, c::3] >> prec_shift).astype(got.dtype)
    exact &= np.array_equal(got[off:off + ph * pw].reshape(ph, pw), exp)
    off += ph * pw
print("ok flag:", okf, "bit-exact:", exact, flush=True)
