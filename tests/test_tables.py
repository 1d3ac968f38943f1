"""Constant-table provenance tests."""


def test_cxtvlc_npz_matches_annex_c_codebook():
    """_cxtvlc.npz must be reproducible from the checked-in Annex C
    codeword list (tools/gen_cxtvlc.py) — provenance guard."""
    import importlib.util
    import os
    path = os.path.join(os.path.dirname(__file__), os.pardir,
                        "tools", "gen_cxtvlc.py")
    spec = importlib.util.spec_from_file_location("gen_cxtvlc", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    t0 = mod.build_lut(mod.CODEBOOK_0)
    t1 = mod.build_lut(mod.CODEBOOK_1)
    import ffmpeg_ht_tpu.ops.tables as tb
    assert (tb.CXTVLC_PACKED[0] == t0).all()
    assert (tb.CXTVLC_PACKED[1] == t1).all()
