"""Main-profile bit-exactness tests.

Streams are generated per-tool by tools/evc_enc (profile_idc=1) and decoded
by the reference Main binary (oracle) and by xevd_tpu; outputs must match
byte-for-byte at 10-bit output depth.  Kernel-level tests fuzz the numpy
Main kernels against the reference shared library via ctypes.
"""
import ctypes
import sys
from pathlib import Path as _P

sys.path.insert(0, str(_P(__file__).resolve().parent.parent / "tools"))

import numpy as np
import pytest

from .conftest import (REF_LIB_MAIN, have_ref_lib, have_ref_main,
                       make_stream, ref_decode)

pytestmark = pytest.mark.skipif(not have_ref_main(),
                                reason="Main reference binary missing")

# name, w, h, frames, qp, seed, gop, tools
CASES = [
    ("m_off_i", 176, 144, 2, 30, 101, "I", ()),
    ("m_off_p", 176, 144, 3, 33, 102, "IPPP", ()),
    ("m_off_ra", 176, 144, 5, 30, 103, "RA", ()),
    ("m_eipd_i", 176, 144, 2, 30, 104, "I", ("eipd",)),
    ("m_eipd_p", 176, 144, 3, 32, 105, "IPPP", ("eipd",)),
    ("m_btt_i", 176, 144, 2, 30, 106, "I", ("btt", "eipd", "cm_init")),
    ("m_btt_p", 176, 144, 3, 31, 107, "IPPP", ("btt", "eipd", "cm_init")),
    ("m_suco_i", 176, 144, 2, 30, 108, "I",
     ("btt", "suco", "eipd", "cm_init")),
    ("m_suco_ra", 176, 144, 5, 30, 109, "RA",
     ("btt", "suco", "eipd", "cm_init")),
    ("m_adcc_i", 176, 144, 2, 30, 110, "I", ("adcc", "cm_init", "eipd")),
    ("m_adcc_p", 176, 144, 3, 33, 111, "IPPP",
     ("btt", "suco", "adcc", "cm_init", "eipd")),
    ("m_admvp_p", 176, 144, 4, 30, 112, "IPPP",
     ("admvp", "hmvp", "cm_init", "eipd")),
    ("m_admvp_ra", 176, 144, 5, 30, 113, "RA",
     ("admvp", "hmvp", "cm_init", "eipd")),
    ("m_mmvd_p", 176, 144, 4, 30, 114, "IPPP",
     ("admvp", "hmvp", "mmvd", "cm_init", "eipd")),
    ("m_inter_all", 176, 144, 5, 31, 115, "RA",
     ("admvp", "hmvp", "mmvd", "amvr", "btt", "suco", "adcc", "cm_init",
      "eipd")),
    ("m_iqt_i", 176, 144, 2, 30, 116, "I", ("iqt", "eipd", "cm_init")),
    ("m_ats_i", 176, 144, 2, 30, 117, "I",
     ("iqt", "ats", "eipd", "cm_init")),
    ("m_ats_p", 176, 144, 3, 32, 118, "IPPP",
     ("iqt", "ats", "admvp", "hmvp", "btt", "suco", "cm_init", "eipd")),
    ("m_all_ra", 176, 144, 5, 31, 119, "RA",
     ("iqt", "ats", "admvp", "hmvp", "mmvd", "amvr", "btt", "suco", "adcc",
      "cm_init", "eipd")),
    ("m_addb_i", 176, 144, 2, 30, 501, "I", ("addb", "eipd", "cm_init")),
    ("m_addb_p", 176, 144, 4, 31, 502, "IPPP",
     ("addb", "eipd", "cm_init", "admvp", "hmvp")),
    ("m_addb_ra", 176, 144, 5, 30, 503, "RA",
     ("addb", "eipd", "cm_init", "admvp", "hmvp", "mmvd", "amvr", "btt",
      "suco", "adcc")),
    ("m_addb_ats", 176, 144, 3, 32, 504, "IPPP",
     ("addb", "eipd", "cm_init", "iqt", "ats", "btt", "suco", "admvp",
      "hmvp")),
    ("m_htdf_i", 176, 144, 2, 30, 601, "I", ("htdf", "eipd", "cm_init")),
    ("m_htdf_p", 176, 144, 4, 27, 602, "IPPP",
     ("htdf", "eipd", "cm_init", "admvp", "hmvp")),
    ("m_htdf_all", 176, 144, 5, 29, 603, "RA",
     ("htdf", "addb", "eipd", "cm_init", "iqt", "ats", "btt", "suco",
      "admvp", "hmvp", "mmvd", "amvr", "adcc")),
    ("m_alf_i", 176, 144, 3, 30, 711, "I", ("alf", "eipd", "cm_init")),
    ("m_alf_p", 176, 144, 4, 30, 702, "IPPP",
     ("alf", "eipd", "cm_init", "admvp", "hmvp")),
    ("m_alf_ra", 176, 144, 6, 29, 712, "RA",
     ("alf", "eipd", "cm_init", "admvp", "hmvp", "btt", "suco", "adcc")),
    ("m_alf_all", 176, 144, 5, 31, 713, "RA",
     ("alf", "addb", "htdf", "eipd", "cm_init", "iqt", "ats", "admvp",
      "hmvp", "mmvd", "amvr", "btt", "suco", "adcc")),
    ("m_pocs_ra", 176, 144, 9, 30, 901, "RA",
     ("pocs", "eipd", "cm_init", "admvp", "hmvp")),
    ("m_rpl_p", 176, 144, 4, 30, 901, "IPPP",
     ("rpl", "pocs", "eipd", "cm_init", "admvp", "hmvp")),
    ("m_rpl_ra", 176, 144, 9, 30, 901, "RA",
     ("rpl", "pocs", "eipd", "cm_init", "admvp", "hmvp", "btt", "suco",
      "adcc")),
]

# affine cases decode on the numpy backend only until the device affine
# path lands (pipeline.check_caps refuses tool_affine)
CASES_AFFINE = [
    ("m_ibc_i", 176, 144, 3, 30, 961, "I", ("ibc", "eipd", "cm_init")),
    ("m_ibc_ra", 176, 144, 5, 30, 962, "RA",
     ("ibc", "admvp", "hmvp", "affine", "amvr", "mmvd", "btt", "suco",
      "adcc", "eipd", "cm_init")),
    ("m_aff_p", 176, 144, 4, 30, 951, "IPPP",
     ("admvp", "hmvp", "affine", "eipd", "cm_init")),
    ("m_aff_ra", 176, 144, 5, 30, 952, "RA",
     ("admvp", "hmvp", "affine", "eipd", "cm_init")),
    ("m_aff_amvr", 176, 144, 5, 29, 953, "RA",
     ("admvp", "hmvp", "affine", "amvr", "mmvd", "eipd", "cm_init")),
    ("m_aff_all", 176, 144, 5, 31, 954, "RA",
     ("admvp", "hmvp", "affine", "amvr", "mmvd", "btt", "suco", "adcc",
      "iqt", "ats", "addb", "htdf", "alf", "eipd", "cm_init")),
    # DMVR: B-slice bilateral refinement (refined MVs feed HMVP / MMVD
    # base list / stored map; unrefined feed spatial merge + deblock)
    ("m_dmvr_ra", 176, 144, 5, 30, 971, "RA",
     ("dmvr", "admvp", "hmvp", "mmvd", "amvr", "btt", "suco", "adcc",
      "eipd", "cm_init")),
    ("m_dmvr_all", 176, 144, 5, 30, 972, "RA",
     ("dmvr", "admvp", "hmvp", "affine", "ibc", "amvr", "mmvd", "btt",
      "suco", "adcc", "iqt", "ats", "addb", "htdf", "alf", "eipd",
      "cm_init")),
    # IBC deblock interaction (BS_INTRA for IBC cells) + ATS gating
    ("m_ibc_addb", 176, 144, 5, 30, 973, "RA",
     ("ibc", "admvp", "hmvp", "amvr", "mmvd", "btt", "suco", "adcc",
      "iqt", "ats", "addb", "eipd", "cm_init")),
]


@pytest.mark.parametrize("name,w,h,n,qp,seed,gop,tools", CASES_AFFINE)
def test_affine_golden(fixtures_dir, name, w, h, n, qp, seed, gop, tools):
    stream = make_stream(fixtures_dir / f"{name}.evc", w, h, n, qp, seed,
                         gop, profile=1, tools=tools)
    golden = ref_decode(stream, fixtures_dir / f"{name}_ref.yuv", main=True)
    out = fixtures_dir / f"{name}_my.yuv"
    if out.exists():
        out.unlink()
    my_decode(stream, out, backend="numpy")
    assert golden.read_bytes() == out.read_bytes(), f"{name}: output differs"
    out.unlink()


# 10-bit cases (DRA requires 10-bit content; also covers the 10-bit Main
# device path and the reference's wrapping-int32 ALF classification)
CASES10 = [
    ("m10_dra_i", 176, 144, 2, 30, 801, "I", ("dra", "eipd", "cm_init")),
    ("m10_dra_p", 176, 144, 4, 30, 802, "IPPP",
     ("dra", "eipd", "cm_init", "admvp", "hmvp")),
    ("m10_alf_p", 176, 144, 5, 31, 803, "RA",
     ("alf", "eipd", "cm_init", "admvp", "hmvp")),
    ("m10_all", 176, 144, 5, 31, 804, "RA",
     ("dra", "alf", "addb", "htdf", "eipd", "cm_init", "iqt", "ats",
      "admvp", "hmvp", "mmvd", "amvr", "btt", "suco", "adcc")),
]


def my_decode(stream, out, backend="numpy"):
    from xevd_tpu.app import main
    rc = main(["-i", str(stream), "-o", str(out), "-v", "0",
               "--output-bit-depth", "10", "--backend", backend])
    assert rc == 0


@pytest.mark.parametrize("backend", ["numpy", "jax"])
@pytest.mark.parametrize("name,w,h,n,qp,seed,gop,tools", CASES)
def test_main_golden(fixtures_dir, name, w, h, n, qp, seed, gop, tools,
                     backend):
    stream = make_stream(fixtures_dir / f"{name}.evc", w, h, n, qp, seed,
                         gop, profile=1, tools=tools)
    golden = ref_decode(stream, fixtures_dir / f"{name}_ref.yuv", main=True)
    out = fixtures_dir / f"{name}_my_{backend}.yuv"
    if out.exists():
        out.unlink()
    my_decode(stream, out, backend=backend)
    assert golden.read_bytes() == out.read_bytes(), f"{name}: output differs"
    out.unlink()


@pytest.mark.parametrize("backend", ["numpy", "jax"])
@pytest.mark.parametrize("name,w,h,n,qp,seed,gop,tools", CASES10)
def test_main_golden_10bit(fixtures_dir, name, w, h, n, qp, seed, gop,
                           tools, backend):
    stream = make_stream(fixtures_dir / f"{name}.evc", w, h, n, qp, seed,
                         gop, profile=1, tools=tools, bd=10)
    golden = ref_decode(stream, fixtures_dir / f"{name}_ref.yuv", main=True)
    out = fixtures_dir / f"{name}_my_{backend}.yuv"
    if out.exists():
        out.unlink()
    my_decode(stream, out, backend=backend)
    assert golden.read_bytes() == out.read_bytes(), f"{name}: output differs"
    out.unlink()


@pytest.mark.skipif(not have_ref_lib(), reason="reference lib missing")
def test_eipd_kernels_vs_reference_lib():
    """Fuzz EIPD luma/chroma prediction against xevdm_ipred / xevdm_ipred_uv
    (ref: src_main/xevdm_ipred.c:241-305)."""
    from xevd_tpu.ops.ref_numpy_main import NbrM, ipred_main, ipred_uv_main
    lib = ctypes.CDLL(str(REF_LIB_MAIN))
    pel = np.int16
    rng = np.random.default_rng(42)
    for (w, h) in [(4, 4), (8, 8), (16, 16), (8, 16), (32, 8)]:
        for lr in (0, 1, 2, 3):
            le = rng.integers(0, 256, size=2 + w + h).astype(pel)
            up = rng.integers(0, 256, size=h + w + h).astype(pel)
            ri = rng.integers(0, 256, size=2 + w + h).astype(pel)
            nb = NbrM(w, h)
            nb.left[:] = le
            nb.up[:] = up
            nb.right[:] = ri
            for ipm in range(33):
                dst = np.zeros(w * h, pel)
                lib.xevdm_ipred(
                    le[2:].ctypes.data_as(ctypes.c_void_p),
                    up[h:].ctypes.data_as(ctypes.c_void_p),
                    ri[2:].ctypes.data_as(ctypes.c_void_p),
                    ctypes.c_ushort(lr),
                    dst.ctypes.data_as(ctypes.c_void_p), ipm, w, h, 8)
                mine = ipred_main(nb, lr, ipm, w, h, 8)
                assert (mine.flatten() == dst.astype(np.int64)).all(), \
                    f"luma ipm {ipm} {w}x{h} lr{lr}"
            for ipm in (0, 1, 5, 12, 24, 30):
                for ipm_c in range(5):
                    dst = np.zeros(w * h, pel)
                    lib.xevdm_ipred_uv(
                        le[2:].ctypes.data_as(ctypes.c_void_p),
                        up[h:].ctypes.data_as(ctypes.c_void_p),
                        ri[2:].ctypes.data_as(ctypes.c_void_p),
                        ctypes.c_ushort(lr),
                        dst.ctypes.data_as(ctypes.c_void_p),
                        ipm_c, ipm, w, h, 8)
                    mine = ipred_uv_main(nb, lr, ipm_c, ipm, w, h, 8)
                    assert (mine.flatten() == dst.astype(np.int64)).all(), \
                        f"chroma ipm_c {ipm_c} ipm {ipm} {w}x{h} lr{lr}"
