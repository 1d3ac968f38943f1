"""Wire bit-packing for the device->host output fetch.

The decode programs ship one flat uint8/uint16 buffer per launch
(decoder.py `_compiled_assembly` / assembly.py `make_v3_program`). For
9..15-bit content the uint16 wire format wastes 6..1 bits per sample; on
a link-bound deployment (network-attached TPU, or this bench host's
~10-16 MB/s tunnel) that padding is pure fetch time — a 4K 10-bit 4:4:4
frame moves 50 MB as uint16 but only 31 MB as packed 10-bit words.

Scheme: groups of 32 samples pack into `depth` uint32 words (32*depth
bits exactly), LSB-first within each word. The group transform is a
static shift/or combination of the 32 sample columns — pure elementwise
VPU work on device (no gather/scatter), and the inverse on the host is
~64 vectorized numpy ops over the word columns.

The reference has no analog (its decode output lands in process memory);
this is transfer-path design the TPU deployment model calls for.
"""

from typing import Tuple

import numpy as np

GROUP = 32


def packed_words_len(n_samples: int, depth: int) -> int:
    """uint32 word count for `n_samples` samples at `depth` bits."""
    ngroups = -(-n_samples // GROUP)
    return ngroups * depth


def pack_words(flat, depth: int):
    """Device-side (jnp) pack: 1-D unsigned samples -> uint32 words.

    `flat` values must fit in `depth` bits (8 < depth < 16). Trailing
    pad samples of the last group pack as zeros.
    """
    import jax.numpy as jnp

    n = flat.shape[0]
    ngroups = -(-n // GROUP)
    pad = ngroups * GROUP - n
    s = flat.astype(jnp.uint32)
    if pad:
        s = jnp.concatenate([s, jnp.zeros((pad,), jnp.uint32)])
    s = s.reshape(ngroups, GROUP)
    words = [None] * depth
    for i in range(GROUP):
        off = i * depth
        lo, sh = off // 32, off % 32
        col = s[:, i]
        part = col << sh if sh else col
        words[lo] = part if words[lo] is None else (words[lo] | part)
        if sh + depth > 32:
            spill = col >> (32 - sh)
            words[lo + 1] = spill if words[lo + 1] is None \
                else (words[lo + 1] | spill)
    return jnp.stack(words, axis=1).reshape(-1)


def unpack_words(words: np.ndarray, depth: int, n_samples: int,
                 out: np.ndarray = None) -> np.ndarray:
    """Host-side (numpy) inverse of `pack_words` -> uint16 samples."""
    ngroups = packed_words_len(n_samples, depth) // depth
    w = np.ascontiguousarray(words[:ngroups * depth],
                             dtype=np.uint32).reshape(ngroups, depth)
    s = np.empty((ngroups, GROUP), np.uint32)
    mask = np.uint32((1 << depth) - 1)
    for i in range(GROUP):
        off = i * depth
        lo, sh = off // 32, off % 32
        col = w[:, lo] >> sh if sh else w[:, lo].copy()
        if sh + depth > 32:
            col |= w[:, lo + 1] << (32 - sh)
        s[:, i] = col & mask
    flat = s.reshape(-1)[:n_samples].astype(np.uint16)
    if out is not None:
        out[:n_samples] = flat
        return out
    return flat


def wire_shape(n_samples: int, depth: int) -> Tuple[Tuple[int], type]:
    """(shape, numpy dtype) of the packed wire buffer incl. the ok flag."""
    return (packed_words_len(n_samples, depth) + 1,), np.uint32
