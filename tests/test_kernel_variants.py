"""Bit-exactness of the env-gated entropy-kernel variants.

FFMPEG_HT_TPU_KERNEL_VARIANTS toggles measurable formulations of the
scan kernel's hot primitives (int8 CxtVLC matmul, gather refills —
ARCHITECTURE.md "remaining levers"). Whatever their speed on the chip,
they must decode every stream identically to the default formulation;
variants are read at import, so each set runs in its own subprocess.
"""

import hashlib
import os
import subprocess
import sys

import numpy as np
import pytest

_CHILD = r"""
import os, sys, hashlib
import numpy as np
sys.path.insert(0, "/root/repo")
from ffmpeg_ht_tpu.models.decoder import Decoder
from ffmpeg_ht_tpu.models.encoder import encode_frame_htj2k

rng = np.random.default_rng(7)
dec = Decoder(bitexact=True)
h = hashlib.sha256()
img = rng.integers(0, 256, (96, 128), dtype=np.uint8)
h.update(dec.decode(encode_frame_htj2k(img)).tobytes())
rgb = rng.integers(0, 256, (64, 80, 3), dtype=np.uint8)
h.update(dec.decode(encode_frame_htj2k(
    rgb, mct=True, refinement=True, ht_layers=2)).tobytes())
hi = rng.integers(0, 4096, (72, 96), dtype=np.uint16)
h.update(dec.decode(encode_frame_htj2k(hi, depth=12)).tobytes())
print("DIGEST", h.hexdigest())
"""


def _digest(variants: str) -> str:
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=8",
               FFMPEG_HT_TPU_CACHE=os.path.join(
                   os.path.dirname(os.path.dirname(
                       os.path.abspath(__file__))), ".xla_cache"),
               FFMPEG_HT_TPU_KERNEL_VARIANTS=variants)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    r = subprocess.run([sys.executable, "-c", _CHILD], env=env,
                       capture_output=True, text=True, timeout=540)
    assert r.returncode == 0, r.stderr[-2000:]
    return r.stdout.strip().split()[-1]


def test_kernel_variants_bit_exact():
    base = _digest("")
    assert _digest("cxt_i8") == base
    assert _digest("refill_gather,cxt_i8") == base


def test_pallas_variant_bit_exact():
    """The Mosaic (pallas) cleanup variant through the full Decoder
    front door — interpret mode off-TPU."""
    assert _digest("pallas") == _digest("")


def test_scan2d_variant_bit_exact():
    """The 2-D lane-fold variant (N folded to (N/128, 128) for full
    VPU sublane packing, ht_scan.decode_cleanup_scan_dims_2d) through
    the full Decoder front door."""
    assert _digest("scan2d") == _digest("")
