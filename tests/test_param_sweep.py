"""CI slice of the differential parameter-sweep fuzzer (VERDICT r3
item 7 — breaking the HT corpus circularity).

tools/fuzz_params.py draws random encoder configurations across every
axis (geometry, progression, POC, layers, packed headers, tile-parts,
depth, MCT, lossy) and requires the REFERENCE binary — zero shared
code — to reconstruct the source, then our decoder to match it
byte-exactly. The checked-in artifact FUZZ_PARAMS.json records a
200-trial run; this slice keeps a rotating window in CI.
"""

import numpy as np
import pytest

from conftest import have_ffmpeg

if not have_ffmpeg():
    pytest.skip("reference ffmpeg not built", allow_module_level=True)

from tools.fuzz_params import draw_config, run_trial


def test_param_sweep_slice():
    rng = np.random.default_rng(424242)
    for t in range(10):
        cfg = draw_config(rng)
        err = run_trial(rng, cfg)
        assert err is None, f"trial {t}: {err}; cfg={cfg}"
