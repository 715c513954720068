"""ctypes bindings for the native host entropy engine (native/evc_entropy.c).

Falls back transparently to the pure-Python entropy pass when the shared
library hasn't been built.  Build: `make -C native` (or tests build it on
demand).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

from . import tables as T
from .frame import FrameSyntax

_REPO = Path(__file__).resolve().parent.parent
_SO = _REPO / "native" / "libevc_entropy.so"
_LIB = None

CU_FIELDS = 29


def _build():
    src = _REPO / "native" / "evc_entropy.c"
    subprocess.run(
        ["cc", "-O3", "-march=native", "-shared", "-fPIC",
         "-o", str(_SO), str(src)],
        check=True)


def get_lib():
    global _LIB
    if _LIB is not None:
        return _LIB
    if not _SO.exists() or _SO.stat().st_mtime < (_SO.parent / "evc_entropy.c").stat().st_mtime:
        try:
            _build()
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_SO))
    except OSError:
        return None
    lib.evc_decode_slice.restype = ctypes.c_int
    _LIB = lib
    return lib


def available() -> bool:
    return get_lib() is not None


_SCRATCH = {}


def _scratch(w, h, flip=0):
    """Per-resolution reusable entropy-output buffers.  Every field the C
    engine writes is fully rewritten per frame (decode_cu/derive_cu cover
    the whole picture), so only the sparse-write buffers (coef planes,
    edge maps) are re-zeroed here.  Arrays that outlive the frame
    (map_mv/map_refi into the DPB, the cu record slice) are copied or
    freshly allocated by the caller."""
    key = (w, h, flip)
    s = _SCRATCH.get(key)
    w_lcu, h_lcu = (w + 63) // 64, (h + 63) // 64
    w_pad, h_pad = w_lcu * 64, h_lcu * 64
    w_scu, h_scu = (w + 3) >> 2, (h + 3) >> 2
    if s is None:
        s = {
            "coef_y": np.zeros((h_pad, w_pad), np.int16),
            "coef_u": np.zeros((h_pad >> 1, w_pad >> 1), np.int16),
            "coef_v": np.zeros((h_pad >> 1, w_pad >> 1), np.int16),
            "cu_out": np.zeros((w_scu * h_scu, CU_FIELDS), np.int32),
            "map_if": np.zeros((h_scu, w_scu), np.uint8),
            "map_qp": np.zeros((h_scu, w_scu), np.int32),
            "map_cbfl": np.zeros((h_scu, w_scu), np.uint8),
            "map_ipm": np.full((h_scu, w_scu), -1, np.int8),
            "map_skip": np.zeros((h_scu, w_scu), np.uint8),
            "edge_hor": np.zeros((h_scu, w_scu), np.uint8),
            "edge_ver": np.zeros((h_scu, w_scu), np.uint8),
            "cod_eco": np.zeros((h_scu, w_scu), np.uint8),
        }
        _SCRATCH[key] = s
    else:
        s["coef_y"][:] = 0
        s["coef_u"][:] = 0
        s["coef_v"][:] = 0
        s["edge_hor"][:] = 0
        s["edge_ver"][:] = 0
        s["cod_eco"][:] = 0      # decode-order availability: per-slice state
    return s, w_pad, h_pad, w_scu, h_scu


def decode_slice_native(payload: bytes, sps, pps, sh, num_refp,
                        chroma_qp_tbl, refp=None, poc=0, flip=0):
    """Native equivalent of frame.EntropyDecoder.decode_slice PLUS the
    baseline derive pass (final motion, intra availability) in C.

    Returns (fs, native_job) where native_job carries the derive outputs
    (cu_mv/cu_refi/nbr masks/map_mv/map_refi) for derive.job_from_native."""
    lib = get_lib()
    w = sps.pic_width_in_luma_samples
    h = sps.pic_height_in_luma_samples
    cfi = sps.chroma_format_idc
    # flip: ping-pong scratch set so a pipelined entropy pass for slice
    # n+1 never overwrites buffers (coef planes) the pack of slice n is
    # still reading on the main thread
    s, w_pad, h_pad, w_scu, h_scu = _scratch(w, h, flip)
    coef_y, coef_u, coef_v = s["coef_y"], s["coef_u"], s["coef_v"]
    cu_out = s["cu_out"]
    map_if, map_qp = s["map_if"], s["map_qp"]
    map_cbfl, map_ipm = s["map_cbfl"], s["map_ipm"]
    map_skip, cod_eco = s["map_skip"], s["cod_eco"]
    edge_hor, edge_ver = s["edge_hor"], s["edge_ver"]

    tbl_u = np.ascontiguousarray(chroma_qp_tbl[0], np.int32)
    tbl_v = np.ascontiguousarray(chroma_qp_tbl[1], np.int32)

    def ptr(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    # derive-pass inputs (ref: src_base/xevd_util.c:469-566)
    map_mv = np.zeros((h_scu, w_scu, 2, 2), np.int16)
    map_refi = np.full((h_scu, w_scu, 2), -1, np.int8)
    null16 = ctypes.POINTER(ctypes.c_int16)()
    ref_mv = [null16, null16]
    ref0_l0_poc = r1_poc = r1_list_poc0 = 0
    keep = []
    if refp is not None:
        for lidx in range(2):
            if num_refp[lidx] > 0:
                mvd = np.ascontiguousarray(refp[0][lidx].map_mv, np.int16)
                keep.append(mvd)
                ref_mv[lidx] = ptr(mvd, ctypes.c_int16)
        if num_refp[0] > 0:
            ref0_l0_poc = int(refp[0][0].poc)
        if num_refp[1] > 0:
            r1_poc = int(refp[0][1].poc)
            r1_list_poc0 = int(refp[0][1].list_poc[0])

    n = lib.evc_decode_slice(
        payload, len(payload), w, h, sh.slice_type, sh.qp,
        sh.qp_u_offset, sh.qp_v_offset, pps.cu_qp_delta_enabled_flag,
        cfi, num_refp[0], num_refp[1], sps.bit_depth_chroma_minus8,
        ptr(tbl_u, ctypes.c_int32), ptr(tbl_v, ctypes.c_int32),
        ptr(coef_y, ctypes.c_int16), ptr(coef_u, ctypes.c_int16),
        ptr(coef_v, ctypes.c_int16), ptr(cu_out, ctypes.c_int32),
        ptr(map_if, ctypes.c_uint8), ptr(map_qp, ctypes.c_int32),
        ptr(map_cbfl, ctypes.c_uint8), ptr(map_ipm, ctypes.c_int8),
        ptr(map_skip, ctypes.c_uint8), ptr(edge_hor, ctypes.c_uint8),
        ptr(edge_ver, ctypes.c_uint8), ptr(cod_eco, ctypes.c_uint8),
        ptr(map_mv, ctypes.c_int16), ptr(map_refi, ctypes.c_int8),
        pps.constrained_intra_pred_flag, int(poc), ref0_l0_poc,
        ref_mv[0], ref_mv[1], r1_poc, r1_list_poc0)
    if n < 0:
        raise ValueError(f"native entropy decode failed: {n}")

    fs = FrameSyntax(w=w, h=h, w_pad=w_pad, h_pad=h_pad, w_scu=w_scu,
                     h_scu=h_scu, slice_type=sh.slice_type, sh=sh)
    fs.coef_y = coef_y
    fs.coef_u = coef_u if cfi else None
    fs.coef_v = coef_v if cfi else None
    # copy: cu_out is reused scratch, but fs may outlive the frame
    # (e.g. parallel/gop capture keeps it)
    cu = cu_out[:n].copy()
    fs.cu_x = cu[:, 0]
    fs.cu_y = cu[:, 1]
    fs.cu_log2w = cu[:, 2]
    fs.cu_log2h = cu[:, 2]  # Baseline QT: always square
    fs.cu_pred_mode = cu[:, 3]
    fs.cu_ipm = cu[:, 4]
    fs.cu_qp = cu[:, 5]
    fs.cu_qp_u = cu[:, 6]
    fs.cu_qp_v = cu[:, 7]
    fs.cu_cbf = cu[:, 8:11]
    fs.cu_refi = cu[:, 11:13]
    fs.cu_mvp_idx = cu[:, 13:15]
    fs.cu_mvd = cu[:, 15:19].reshape(-1, 2, 2)
    fs.cu_inter_dir = cu[:, 19]
    fs.map_if = map_if
    fs.map_qp = map_qp
    fs.map_cbfl = map_cbfl
    fs.map_ipm = map_ipm
    fs.map_skip = map_skip
    fs.edge_hor = edge_hor
    fs.edge_ver = edge_ver
    fs.finalize()
    native_job = {
        "sh": sh, "chroma_qp_tbl": (tbl_u, tbl_v),
        "cu_mv": cu[:, 20:24].reshape(-1, 2, 2).astype(np.int32),
        "cu_refi": cu[:, 24:26].astype(np.int32),
        "nbr_up": cu[:, 26].astype(np.int64) & 0xFFFFFFFF,
        "nbr_left": cu[:, 27].astype(np.int64) & 0xFFFFFFFF,
        "nbr_corner": cu[:, 28].astype(np.uint8),
        "map_mv": map_mv,
        "map_refi": map_refi,
    }
    return fs, native_job


_DF_ST32 = None


def deblock_strengths_native(fs, sps, sh, tbl_u, tbl_v, map_refi, map_mv):
    """C boundary-strength derivation (native evc_deblock_strengths);
    returns (hy, hu, hv, vy, vu, vv) int32 maps."""
    global _DF_ST32
    lib = get_lib()
    if _DF_ST32 is None:
        _DF_ST32 = np.ascontiguousarray(T.DF_ST, np.int32)
    h_scu, w_scu = fs.h_scu, fs.w_scu
    outs = [np.empty((h_scu, w_scu), np.int32) for _ in range(6)]

    def ptr(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    mv16 = map_mv if map_mv.dtype == np.int16 else \
        np.ascontiguousarray(map_mv, np.int16)
    refi8 = map_refi if map_refi.dtype == np.int8 else \
        np.ascontiguousarray(map_refi, np.int8)
    lib.evc_deblock_strengths(
        w_scu, h_scu,
        ptr(fs.map_if, ctypes.c_uint8), ptr(fs.map_cbfl, ctypes.c_uint8),
        ptr(fs.map_qp, ctypes.c_int32),
        ptr(fs.edge_hor, ctypes.c_uint8), ptr(fs.edge_ver, ctypes.c_uint8),
        ptr(refi8, ctypes.c_int8), ptr(mv16, ctypes.c_int16),
        ptr(_DF_ST32, ctypes.c_int32),
        ptr(tbl_u, ctypes.c_int32), ptr(tbl_v, ctypes.c_int32),
        sh.qp_u_offset, sh.qp_v_offset,
        sps.bit_depth_luma_minus8, sps.bit_depth_chroma_minus8,
        *[ptr(o, ctypes.c_int32) for o in outs])
    return outs
