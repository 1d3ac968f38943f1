"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Device-tier tests validate sharding/jit on CPU; the real TPU is exercised by
bench.py and the driver's compile checks.
"""

import os

# Force, don't setdefault: the axon sitecustomize exports JAX_PLATFORMS=axon
# into every process, so a setdefault silently leaves tests on the tunneled
# TPU backend. The jax.config.update below is the authoritative override
# (axon's register() wins over the env var otherwise).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import pathlib
import subprocess

import pytest

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# The v2 entropy kernels compile per (shape-class, lane-count, width)
# variant — ~60 s each on this 1-core host. The persistent cache makes
# every variant a one-time cost across test runs. Platform-keyed path:
# TPU bench runs and CPU test runs racing one shared dir produced
# intermittent SIGSEGVs in compilation_cache.get_executable_and_time.
_CACHE_DIR = str(pathlib.Path(__file__).resolve().parent.parent
                 / ".xla_cache_cpu")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

FFMPEG = "/root/repo/third_party/ffmpeg-build/ffmpeg"


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-minute on the 1-core host "
        "(deselect with -m 'not slow')")


def have_ffmpeg() -> bool:
    return os.path.exists(FFMPEG)


@pytest.fixture(scope="session")
def ffmpeg():
    if not have_ffmpeg():
        pytest.skip("reference ffmpeg not built")
    return FFMPEG


@pytest.fixture(scope="session")
def tmp_media(tmp_path_factory):
    return tmp_path_factory.mktemp("media")


_FFMPEG_CAPS: dict[str, frozenset] = {}


def ffmpeg_has(kind: str, name: str) -> bool:
    """Capability-probe the bundled reference binary once per kind
    ('muxers'/'demuxers'/...) — the FATE analog of CONFIG_* gating
    (tests/fate/jpeg2000.mak:37): a build without a component skips,
    it doesn't fail."""
    if not have_ffmpeg():
        return False
    if kind not in _FFMPEG_CAPS:
        r = subprocess.run([FFMPEG, "-hide_banner", f"-{kind}"],
                           capture_output=True, text=True)
        names = set()
        for line in r.stdout.splitlines():
            parts = line.split()
            if len(parts) >= 2 and any(c in "DEVAS." for c in parts[0]) \
                    and len(parts[0]) <= 3:
                names.update(parts[1].split(","))
        _FFMPEG_CAPS[kind] = frozenset(names)
    return name in _FFMPEG_CAPS[kind]


def require_ffmpeg(kind: str, name: str) -> None:
    if not ffmpeg_has(kind, name):
        pytest.skip(f"bundled ffmpeg lacks {kind[:-1]} '{name}'")


def ffmpeg_encode(ffmpeg_bin, raw: bytes, pix_fmt: str, size: str, out: str,
                  *args) -> None:
    import tempfile
    with tempfile.NamedTemporaryFile(suffix=".raw", delete=False) as f:
        f.write(raw)
        src = f.name
    cmd = [ffmpeg_bin, "-y", "-loglevel", "error", "-f", "rawvideo",
           "-pix_fmt", pix_fmt, "-s", size, "-i", src,
           "-c:v", "jpeg2000", *args, "-f", "image2", "-update", "1", out]
    subprocess.run(cmd, check=True, capture_output=True)
    os.unlink(src)


def ffmpeg_decode_raw(ffmpeg_bin, path: str, *args) -> bytes:
    """Decode with the reference decoder to raw frame bytes."""
    cmd = [ffmpeg_bin, "-loglevel", "error", *args, "-i", path,
           "-f", "rawvideo", "-"]
    r = subprocess.run(cmd, check=True, capture_output=True)
    return r.stdout


def ffmpeg_encode_raw(ffmpeg_bin, raw: bytes, pix_fmt: str, size: str,
                      *args) -> bytes:
    """Encode raw frame bytes with the reference encoder, return the file."""
    import tempfile
    with tempfile.NamedTemporaryFile(suffix=".raw", delete=False) as f:
        f.write(raw)
        src = f.name
    out = src + ".j2k"
    cmd = [ffmpeg_bin, "-y", "-loglevel", "error", "-f", "rawvideo",
           "-pix_fmt", pix_fmt, "-s", size, "-i", src,
           "-c:v", "jpeg2000", *args, "-f", "image2", "-update", "1", out]
    subprocess.run(cmd, check=True, capture_output=True)
    data = open(out, "rb").read()
    os.unlink(src)
    os.unlink(out)
    return data


def ffmpeg_decode_raw_bytes(ffmpeg_bin, data: bytes, suffix: str,
                            *args) -> bytes:
    """Decode an in-memory codestream with the reference decoder."""
    import tempfile
    with tempfile.NamedTemporaryFile(suffix=suffix, delete=False) as f:
        f.write(data)
        path = f.name
    try:
        return ffmpeg_decode_raw(ffmpeg_bin, path, *args)
    finally:
        os.unlink(path)
