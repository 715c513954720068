"""Fuzz the ALF classification and 7x7 luma filter against the reference's
own static functions, compiled into a small harness from the reference
source (same ctypes approach as the EIPD fuzz in test_main_profile.py)."""
import ctypes
import subprocess
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
HARNESS_C = """
#include "xevdm_alf.c"

void h_classify(unsigned char *out_cl, const short *src, int stride,
                int x, int y, int w, int h, int bit_depth)
{
    static ALF_CLASSIFIER *cls[512];
    static ALF_CLASSIFIER store[512][512];
    for (int i = 0; i < 512; i++) cls[i] = store[i];
    AREA blk = { x, y, w, h };
    alf_derive_classification_blk(cls, src, stride, &blk,
                                  bit_depth + 4, bit_depth);
    for (int j = 0; j < h; j++)
        for (int i = 0; i < w; i++)
            out_cl[j * w + i] = store[y + j][x + i];
}

void h_filter7(short *dst, int dst_stride, const short *src, int src_stride,
               const unsigned char *cl_in, int w, int h, short *coefs,
               int bit_depth)
{
    static ALF_CLASSIFIER *cls[512];
    static ALF_CLASSIFIER store[512][512];
    for (int i = 0; i < 512; i++) cls[i] = store[i];
    for (int j = 0; j < h; j++)
        for (int i = 0; i < w; i++)
            store[j][i] = cl_in[j * w + i];
    AREA blk = { 0, 0, w, h };
    CLIP_RANGE cr = { .min = 0, .max = (1 << bit_depth) - 1,
                      .bd = bit_depth, .n = 0 };
    alf_filter_blk_7(cls, dst, dst_stride, src, src_stride, &blk, 0,
                     coefs, &cr);
}
"""


@pytest.fixture(scope="module")
def alf_harness(tmp_path_factory):
    exports = list((REPO / "refbuild").glob("*/xevd_exports.h"))
    if not exports:
        pytest.skip("reference build tree missing")
    d = tmp_path_factory.mktemp("alfharness")
    (d / "harness.c").write_text(HARNESS_C)
    so = d / "libalfh.so"
    r = subprocess.run(
        ["cc", "-O2", "-shared", "-fPIC",
         "-I/root/reference/src_main", "-I/root/reference/src_base",
         "-I/root/reference/inc", f"-I{exports[0].parent}",
         "-o", str(so), str(d / "harness.c")],
        capture_output=True, text=True)
    if r.returncode != 0:
        pytest.skip(f"harness build failed: {r.stderr[:200]}")
    return ctypes.CDLL(str(so))


@pytest.mark.parametrize("bd", [8, 10])
def test_alf_classification_vs_reference(alf_harness, bd):
    from xevd_tpu.ops.alf import classify_block
    lib = alf_harness
    rng = np.random.default_rng(7 + bd)
    for _ in range(6):
        S, P = 32, 16
        big = rng.integers(0, 1 << bd,
                           size=(S + 2 * P, S + 2 * P)).astype(np.int16)
        out_cl = np.zeros((S, S), np.uint8)
        lib.h_classify(out_cl.ctypes.data_as(ctypes.c_void_p),
                       np.ascontiguousarray(big).ctypes.data_as(
                           ctypes.c_void_p),
                       ctypes.c_int(S + 2 * P), P, P, S, S, bd)
        buf = big[P - 3:P + S + 3, P - 3:P + S + 3].astype(np.int32)
        mine = np.repeat(np.repeat(classify_block(buf, S, S, bd), 4, 0),
                         4, 1).astype(np.uint8)
        assert np.array_equal(mine, out_cl)


@pytest.mark.parametrize("bd", [8, 10])
def test_alf_filter7_vs_reference(alf_harness, bd):
    from xevd_tpu.ops.alf import filter_luma_block
    lib = alf_harness
    rng = np.random.default_rng(11 + bd)
    for _ in range(6):
        S, P = 64, 8
        big = rng.integers(0, 1 << bd,
                           size=(S + 2 * P, S + 2 * P)).astype(np.int16)
        cl = rng.integers(0, 100, size=(S // 4, S // 4)).astype(np.int32)
        cl_px = np.repeat(np.repeat(cl, 4, 0), 4, 1).astype(np.uint8)
        coefs = rng.integers(-128, 128, size=(25, 13)).astype(np.int16)
        coefs[:, 12] = 512 - 2 * coefs[:, :12].sum(1)
        dst = np.zeros((S, S), np.int16)
        lib.h_filter7(dst.ctypes.data_as(ctypes.c_void_p), ctypes.c_int(S),
                      np.ascontiguousarray(big)[P:, P:].ctypes.data_as(
                          ctypes.c_void_p),
                      ctypes.c_int(S + 2 * P),
                      cl_px.ctypes.data_as(ctypes.c_void_p), S, S,
                      coefs.ctypes.data_as(ctypes.c_void_p), bd)
        buf = big[P - 3:P + S + 3, P - 3:P + S + 3].astype(np.int32)
        mine = filter_luma_block(buf, cl, coefs.astype(np.int32), S, S, bd)
        assert np.array_equal(mine, dst.astype(np.int64))
