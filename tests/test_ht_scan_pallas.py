"""Pallas cleanup kernel vs the XLA scan formulation (interpret mode).

The Pallas form runs the same decode math VMEM-resident per lane block
(ops/ht_scan_pallas.py); its outputs must be bit-identical to
_cleanup_impl on real codestream-derived inputs, including lane-block
padding (N not a multiple of the block) and mixed per-lane dims.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from ffmpeg_ht_tpu.models.decoder import Decoder
from ffmpeg_ht_tpu.models import fastpath as FP
from ffmpeg_ht_tpu.models import assembly as ASM
from ffmpeg_ht_tpu.codestream.parser import parse_codestream
from ffmpeg_ht_tpu.models.encoder import encode_frame_htj2k
from ffmpeg_ht_tpu.ops.ht_scan import _cleanup_impl
from ffmpeg_ht_tpu.ops.ht_scan_pallas import decode_cleanup_pallas

RNG = np.random.default_rng(2718)


def _kernel_args(img, **enc):
    data = encode_frame_htj2k(img, **enc)
    hdr = parse_codestream(data, bitexact=True)
    fg = Decoder._fast_geom(hdr)
    cols = FP.parse_frame_flat(hdr, fg)
    fc = FP.build_v3_frame(fg, cols)
    args, _ = FP.finish_v3(fg, [fc], fg.geom.total)
    if fg.v3_plan is None:
        fg.v3_plan = ASM.build_plan(fg)
    qw, qh = fg.v3_plan.bw // 2, fg.v3_plan.bh // 2
    mb = int(fc["maxbp"][fc["qws"] > 0].max())
    msc = next(c for c in (8, 12, 16, 20, 25) if mb <= c)
    keys = ("msw", "melw", "vlcw", "pLSB", "maxbp", "ms_lim", "mel_lim",
            "qws", "qhs")
    return [jnp.asarray(args[k]) for k in keys], qw, qh, msc


def test_pallas_cleanup_bit_identical():
    img = RNG.integers(0, 256, (96, 128), dtype=np.uint8)
    a, qw, qh, msc = _kernel_args(img)
    mu0, sig0, ok0 = _cleanup_impl(*a[:7], qw=qw, qh=qh, ms_class=msc,
                                   dims=(a[7], a[8]))
    # block=8 forces several grid steps AND pad lanes (N % 8 != 0 often)
    mu1, sig1, ok1 = decode_cleanup_pallas(*a, qw=qw, qh=qh, ms_class=msc,
                                           interpret=True, block=8)
    assert np.array_equal(np.asarray(mu0), np.asarray(mu1))
    assert np.array_equal(np.asarray(sig0), np.asarray(sig1))
    assert np.array_equal(np.asarray(ok0), np.asarray(ok1))


def test_pallas_cleanup_highdepth():
    img = RNG.integers(0, 4096, (96, 128), dtype=np.uint16)
    a, qw, qh, msc = _kernel_args(img, depth=12)
    mu0, sig0, ok0 = _cleanup_impl(*a[:7], qw=qw, qh=qh, ms_class=msc,
                                   dims=(a[7], a[8]))
    mu1, sig1, ok1 = decode_cleanup_pallas(*a, qw=qw, qh=qh, ms_class=msc,
                                           interpret=True, block=16)
    assert np.array_equal(np.asarray(mu0), np.asarray(mu1))
    assert np.array_equal(np.asarray(sig0), np.asarray(sig1))
    assert np.array_equal(np.asarray(ok0), np.asarray(ok1))
