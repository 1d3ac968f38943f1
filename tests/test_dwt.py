"""DWT round-trip + JAX-vs-NumPy equivalence tests.

Analog of libavcodec/tests/jpeg2000dwt.c (fate-j2k-dwt): random borders,
random levels, encode->decode round-trip; 5/3 must be exact, 9/7-int bounded
error, 9/7-float near-exact. Plus: the jitted TPU path must be bit-identical
to the NumPy oracle.
"""

import numpy as np
import pytest

from ffmpeg_ht_tpu.ops import dwt as D


def _rand_case(rng, maxsize=200):
    x0 = int(rng.integers(0, 3))
    y0 = int(rng.integers(0, 3))
    w = int(rng.integers(1, maxsize))
    h = int(rng.integers(1, maxsize))
    border = [[x0, x0 + w], [y0, y0 + h]]
    ndecl = int(rng.integers(0, 6))
    data = rng.integers(-(1 << 15), 1 << 15, (h, w)).astype(np.int32)
    return border, ndecl, data


def test_53_roundtrip_exact():
    rng = np.random.default_rng(7)
    for _ in range(20):
        border, ndecl, data = _rand_case(rng)
        enc = D.dwt_encode(data.copy(), border, ndecl, D.DWT53)
        dec = D.dwt_decode(enc.copy(), border, ndecl, D.DWT53)
        assert np.array_equal(dec, data)


def test_97int_roundtrip_bounded():
    # bound parity: libavcodec/tests/jpeg2000dwt.c:142 pre-scales by
    # I_PRESHIFT before decode (simulating dequantization) and allows
    # max diff min(7+5L, 15+3L)
    rng = np.random.default_rng(8)
    for _ in range(10):
        border, ndecl, data = _rand_case(rng, 128)
        ndecl = max(ndecl, 1)  # the preshift contract needs >= 1 level
        data = np.abs(data) % 2048
        enc = D.dwt_encode(data.copy(), border, ndecl, D.DWT97_INT)
        enc <<= D.I_PRESHIFT
        dec = D.dwt_decode(enc, border, ndecl, D.DWT97_INT)
        err = np.abs(dec.astype(np.int64) - data)
        bound = min(7 + 5 * ndecl, 15 + 3 * ndecl)
        assert err.max() <= bound, (err.max(), bound, ndecl)


def test_97float_roundtrip():
    rng = np.random.default_rng(9)
    for _ in range(10):
        border, ndecl, data = _rand_case(rng, 128)
        f = data.astype(np.float32) / 16.0
        enc = D.dwt_encode(f.copy(), border, ndecl, D.DWT97)
        dec = D.dwt_decode(enc.copy(), border, ndecl, D.DWT97)
        assert np.allclose(dec, f, atol=0.05)


@pytest.mark.parametrize("dwt_type", [D.DWT53, D.DWT97_INT])
def test_jax_matches_numpy_int(dwt_type):
    import jax.numpy as jnp

    from ffmpeg_ht_tpu.ops.dwt_jax import dwt_decode_jax

    rng = np.random.default_rng(10 + dwt_type)
    for _ in range(8):
        border, ndecl, data = _rand_case(rng, 96)
        ref = D.dwt_decode(data.copy(), border, ndecl, dwt_type)
        out = dwt_decode_jax(jnp.asarray(data),
                             ((border[0][0], border[0][1]),
                              (border[1][0], border[1][1])),
                             ndecl, dwt_type)
        assert np.array_equal(np.asarray(out), ref)


def test_jax_matches_numpy_float():
    import jax.numpy as jnp

    from ffmpeg_ht_tpu.ops.dwt_jax import dwt_decode_jax

    rng = np.random.default_rng(20)
    for _ in range(5):
        border, ndecl, data = _rand_case(rng, 96)
        f = data.astype(np.float32) / 16.0
        ref = D.dwt_decode(f.copy(), border, ndecl, D.DWT97)
        out = dwt_decode_jax(jnp.asarray(f),
                             ((border[0][0], border[0][1]),
                              (border[1][0], border[1][1])),
                             ndecl, D.DWT97)
        # float32 lifting accumulates backend-dependent rounding (XLA CPU vs
        # TPU fma choices): measured ~2e-3 max abs over 5 levels on values
        # up to ~2.5e3. A layout/indexing bug produces errors ~1e3, so this
        # bound still catches anything structural.
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-2)


def test_graft_entry_compiles():
    import __graft_entry__ as ge

    import jax
    fn, args = ge.entry()
    jax.jit(fn)(*args)


def test_dryrun_multichip():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


@pytest.mark.parametrize("dwt_type", [D.DWT53, D.DWT97_INT, D.DWT97])
def test_bands_matches_traced(dwt_type):
    """dwt_decode_bands (subband-direct polyphase, the v3 fused-program
    DWT stage) must be bit-identical to assembling the quadrant pyramid
    and running _dwt_decode_traced over it (same lifting ops in the same
    per-element order, only the slicing differs)."""
    import jax.numpy as jnp

    from ffmpeg_ht_tpu.ops.dwt_jax import (_dwt_decode_traced,
                                           dwt_decode_bands,
                                           dwt_poly_capable)

    rng = np.random.default_rng(31 + dwt_type)
    done = 0
    while done < 6:
        border, ndecl, data = _rand_case(rng, 120)
        ndecl = max(ndecl, 1)
        if not dwt_poly_capable(border, ndecl):
            continue
        done += 1
        if dwt_type == D.DWT97:
            data = (data / 16.0).astype(np.float32)
        b = ((border[0][0], border[0][1]), (border[1][0], border[1][1]))
        ref = np.asarray(_dwt_decode_traced(jnp.asarray(data), b, ndecl,
                                            dwt_type))
        # carve the subbands out of the pyramid layout
        linelen, mod = D.dwt_levels(border, ndecl)
        levels = []
        for lev in range(ndecl):
            lh, lv = linelen[lev][0], linelen[lev][1]
            mh, mv = mod[lev][0], mod[lev][1]
            nLh = len(range(mh, lh, 2))
            nLv = len(range(mv, lv, 2))
            hl = jnp.asarray(data[:nLv, nLh:lh])
            lhb = jnp.asarray(data[nLv:lv, :nLh])
            hh = jnp.asarray(data[nLv:lv, nLh:lh])
            if lev == 0:
                ll = jnp.asarray(data[:nLv, :nLh])
            levels.append((hl, lhb, hh))
        out = np.asarray(dwt_decode_bands(ll, levels, b, ndecl, dwt_type))
        assert np.array_equal(out, ref), (dwt_type, border, ndecl)
