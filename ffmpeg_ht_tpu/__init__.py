"""ffmpeg_ht_tpu — a TPU-native HTJ2K / JPEG 2000 codec framework.

A from-scratch reimplementation of the capabilities of sandflow/ffmpeg-ht's
JPEG 2000 + High-Throughput JPEG 2000 (Rec. ITU-T T.814 | ISO/IEC 15444-15)
decode/encode pipeline, redesigned TPU-first:

- Host tier (Python): codestream parsing (markers, JP2 boxes, T2 packet
  headers, tag trees, HT segment lengths) producing static-shaped codeblock
  batches.
- Device tier (JAX/XLA/Pallas): batched HT entropy decode, inverse DWT
  (5/3 reversible, 9/7 int/float), dequantization, inverse MCT (RCT/ICT),
  frame packing — all jitted; hot entropy kernels in Pallas.
- Parallel tier: frames/streams sharded over a `jax.sharding.Mesh`
  (embarrassingly parallel; no collectives in steady state).

Reference behavior parity targets are cited per-module as
``/root/reference/<file>:<line>``.
"""

__version__ = "0.1.0"

from ffmpeg_ht_tpu.utils.errors import InvalidData, PatchWelcome  # noqa: F401
