"""Pallas (Mosaic) formulation of the HT cleanup scan — the last lever
in ARCHITECTURE.md's entropy budget.

The XLA form (ops/ht_scan._cleanup_impl) re-materializes every carried
register through HBM-visible buffers at XLA's discretion; here the
whole scan runs inside ONE pallas_call with the stream words, register
windows, and outputs VMEM-resident for the kernel's lifetime, gridded
over lane blocks so each block's working set fits VMEM (~16 MB/core).

The decode MATH is literally ops/ht_scan's: the kernel body calls
_cleanup_impl on values loaded from VMEM refs, so bit-exactness with
the XLA form is structural (pinned by tests/test_ht_scan_pallas.py in
interpret mode). What changes is the memory contract Mosaic sees.

Enabled by FFMPEG_HT_TPU_KERNEL_VARIANTS=pallas (models/assembly.py);
falls back to the XLA form off-TPU. Lane blocks are sized so streams +
mu + scratch stay under the VMEM budget.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

import numpy as np

from ffmpeg_ht_tpu.ops.ht_scan import _AR32, _CXT0_NP, _CXT1_NP, \
    _cleanup_impl

_VMEM_BUDGET = 10 * 1024 * 1024     # leave headroom of the ~16 MB/core


def _pick_block(n: int, words_per_lane: int, out_per_lane: int) -> int:
    """Largest power-of-two lane block whose VMEM working set fits."""
    bytes_per_lane = 4 * (words_per_lane + out_per_lane) + 64
    blk = 1024
    while blk > 8 and blk * bytes_per_lane > _VMEM_BUDGET:
        blk //= 2
    return blk


@functools.partial(jax.jit,
                   static_argnames=("qw", "qh", "ms_class", "interpret",
                                    "block"))
def decode_cleanup_pallas(msw, melw, vlcw, pLSB, maxbp, ms_lim, mel_lim,
                          qws, qhs, qw: int, qh: int, ms_class: int,
                          interpret: bool = False, block: int = 0):
    """_cleanup_impl(dims=...) contract, executed lane-block-wise inside
    pallas_call. Returns (mu, sig, ok) for exactly N lanes."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = msw.shape[0]
    words = msw.shape[1] + melw.shape[1] + vlcw.shape[1]
    out_words = 4 * qh * qw + qh * qw + 8
    NB = block or _pick_block(N, words, out_words)
    npad = (-N) % NB
    if npad:
        def padl(a, fill=0):
            pad = [(0, npad)] + [(0, 0)] * (a.ndim - 1)
            return jnp.pad(a, pad, constant_values=fill)
        # inert pad lanes: qws == 0 decodes nothing, reads nothing
        msw, melw, vlcw = padl(msw), padl(melw), padl(vlcw)
        pLSB, maxbp = padl(pLSB, 1), padl(maxbp, 1)
        ms_lim, mel_lim = padl(ms_lim), padl(mel_lim)
        qws, qhs = padl(qws), padl(qhs)
    Np = N + npad

    # constant tables / pair masks as kernel inputs (Mosaic forbids
    # closure-captured constants), replicated to every grid step
    P = -(-qw // 2)
    P2 = -(-P // 2)
    a1_np = np.array([2 * p < qw for p in range(2 * P2)],
                     np.int32).reshape(P2, 2)
    a2_np = np.array([2 * p + 1 < qw for p in range(2 * P2)],
                     np.int32).reshape(P2, 2)
    cst_vals = (jnp.asarray(_CXT0_NP), jnp.asarray(_CXT1_NP),
                jnp.asarray(_AR32), jnp.asarray(a1_np),
                jnp.asarray(a2_np))

    def kernel(msw_r, melw_r, vlcw_r, pLSB_r, maxbp_r, mslim_r,
               mellim_r, qws_r, qhs_r, tbl0_r, tbl1_r, ar_r, a1_r, a2_r,
               mu_r, sig_r, ok_r):
        mu, sig, ok = _cleanup_impl(
            msw_r[...], melw_r[...], vlcw_r[...], pLSB_r[...],
            maxbp_r[...], mslim_r[...], mellim_r[...],
            qw=qw, qh=qh, ms_class=ms_class,
            dims=(qws_r[...], qhs_r[...]),
            consts=(tbl0_r[...], tbl1_r[...], ar_r[...], a1_r[...],
                    a2_r[...]))
        mu_r[...] = mu
        sig_r[...] = sig
        ok_r[...] = ok.astype(jnp.int32)

    def vec(_i):
        return pl.BlockSpec((NB,), lambda i: (i,),
                            memory_space=pltpu.VMEM)

    def mat(a):
        return pl.BlockSpec((NB, a.shape[1]), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    mu_p, sig_p, ok_p = pl.pallas_call(
        kernel,
        grid=(Np // NB,),
        in_specs=[mat(msw), mat(melw), mat(vlcw),
                  vec(0), vec(0), vec(0), vec(0), vec(0), vec(0)]
        + [pl.BlockSpec(c.shape, (lambda i, nd=c.ndim: (0,) * nd),
                        memory_space=pltpu.VMEM) for c in cst_vals],
        out_specs=(
            pl.BlockSpec((NB, 2 * qh, 2 * qw), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NB, qh, qw), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NB,), lambda i: (i,),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Np, 2 * qh, 2 * qw), jnp.uint32),
            jax.ShapeDtypeStruct((Np, qh, qw), jnp.int32),
            jax.ShapeDtypeStruct((Np,), jnp.int32),
        ),
        interpret=interpret,
    )(msw, melw, vlcw, pLSB, maxbp, ms_lim, mel_lim, qws, qhs,
      *cst_vals)
    return mu_p[:N], sig_p[:N], ok_p[:N].astype(bool)
