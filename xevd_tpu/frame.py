"""Host-side entropy pass: parse one Baseline slice into a FrameSyntax batch.

This is the TPU-native equivalent of the reference's sequential entropy pass
(ref: src_base/xevd.c:918-1017 tree recursion, src_base/xevd_eco.c:1048-1176
CU syntax): instead of handing each CU to a scalar recon routine, the parse
emits whole-frame coefficient planes plus flat per-CU arrays — the
host→device tensor payload that the batched JAX/Pallas pixel pipeline
consumes (the analog of XEVD_CU_DATA, ref: src_base/xevd_def.h:1145-1190).
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from . import tables as T
from .bitstream import BitReader
from .sbac import Sbac
from .syntax import MalformedBitstream, Pps, SliceHeader, Sps

NO_SPLIT = 0
SPLIT_QUAD = 5


@dataclass
class FrameSyntax:
    """Flat per-frame syntax tensors (decode order preserved in cu_* arrays)."""
    w: int
    h: int
    w_pad: int
    h_pad: int
    w_scu: int
    h_scu: int
    slice_type: int
    sh: SliceHeader = None
    # full-frame coefficient planes (padded to CTU grid)
    coef_y: np.ndarray = None    # int16 [h_pad, w_pad]
    coef_u: np.ndarray = None    # int16 [h_pad/2, w_pad/2]
    coef_v: np.ndarray = None
    # per-CU arrays, decode order
    cu_x: list = field(default_factory=list)
    cu_y: list = field(default_factory=list)
    cu_log2: list = field(default_factory=list)
    cu_pred_mode: list = field(default_factory=list)
    cu_ipm: list = field(default_factory=list)
    cu_ipm_c: list = field(default_factory=list)
    cu_qp: list = field(default_factory=list)
    cu_qp_u: list = field(default_factory=list)
    cu_qp_v: list = field(default_factory=list)
    cu_cbf: list = field(default_factory=list)       # [3] per cu
    cu_refi: list = field(default_factory=list)      # parsed refi [2]
    cu_mvp_idx: list = field(default_factory=list)   # [2]
    cu_mvd: list = field(default_factory=list)       # [2][2]
    cu_inter_dir: list = field(default_factory=list)
    # per-SCU maps (filled during entropy; motion pass updates mv/refi)
    map_if: np.ndarray = None     # intra flag u8 [h_scu, w_scu]
    map_qp: np.ndarray = None
    map_cbfl: np.ndarray = None
    map_ipm: np.ndarray = None
    map_skip: np.ndarray = None
    # CU-edge maps for deblocking (set at CU top/left boundaries)
    edge_hor: np.ndarray = None   # u8: SCU's TOP edge is a CU boundary
    edge_ver: np.ndarray = None   # u8: SCU's LEFT edge is a CU boundary
    # intra neighbor availability flags per CU (AVAIL_* bits), entropy-time LR
    cu_avail: list = field(default_factory=list)

    def num_cus(self) -> int:
        return len(self.cu_x)


def get_ctx_some_flags(x_scu, y_scu, scuw, scuh, w_scu, map_skip, map_if,
                       cod):
    """Neighbor-sum context for skip_flag / pred_mode under CM_INIT
    (ref: src_main/xevdm_util.c:1729-1830).  Neighbors: above at the CU's
    top-left, left and right at the CU's bottom row; only entropy-coded
    SCUs count.  Returns (ctx_skip, ctx_pred) clipped to model counts."""
    from .sbac import NUM_CTX_PRED_MODE, NUM_CTX_SKIP_FLAG
    yb = y_scu + scuh - 1
    nbrs = []
    if y_scu > 0 and cod[y_scu - 1, x_scu]:
        nbrs.append((y_scu - 1, x_scu))
    if x_scu > 0 and cod[yb, x_scu - 1]:
        nbrs.append((yb, x_scu - 1))
    if x_scu + scuw < w_scu and cod[yb, x_scu + scuw]:
        nbrs.append((yb, x_scu + scuw))
    if not nbrs:
        return 0, 0
    cs = sum(int(map_skip[p]) for p in nbrs)
    cp = sum(int(map_if[p]) for p in nbrs)
    return (min(cs, NUM_CTX_SKIP_FLAG - 1), min(cp, NUM_CTX_PRED_MODE - 1))


def get_mpm_main(x_scu, y_scu, cuw, cuh, map_if, map_ipm, cod, w_scu):
    """EIPD MPM / extended-MPM / priority-list derivation
    (ref: src_main/xevdm_ipred.c:320-769).  Returns (mpm[2], mpm_ext[8],
    pims[33])."""
    IPD_DC, IPD_PLN, IPD_BI = T.IPD_DC, T.IPD_PLN, T.IPD_BI
    IPD_VER, IPD_HOR, IPD_CNT = T.IPD_VER, T.IPD_HOR, T.IPD_CNT
    IPD_DIA_R, IPD_DIA_L, IPD_DIA_U = T.IPD_DIA_R, T.IPD_DIA_L, T.IPD_DIA_U
    scuw = cuw >> 2
    ipm_l = ipm_u = ipm_r = IPD_DC
    valid_l = valid_u = valid_r = 0
    if x_scu > 0 and map_if[y_scu, x_scu - 1] and cod[y_scu, x_scu - 1]:
        ipm_l = int(map_ipm[y_scu, x_scu - 1])
        valid_l = 1
    if y_scu > 0 and map_if[y_scu - 1, x_scu] and cod[y_scu - 1, x_scu]:
        ipm_u = int(map_ipm[y_scu - 1, x_scu])
        valid_u = 1
    if x_scu + scuw < w_scu and map_if[y_scu, x_scu + scuw] and \
            cod[y_scu, x_scu + scuw]:
        ipm_r = int(map_ipm[y_scu, x_scu + scuw])
        if valid_l and valid_u:
            if ipm_l == ipm_u:
                ipm_u = ipm_r
            else:
                valid_r = 1
        elif not valid_l:
            ipm_l = ipm_r
        elif not valid_u:
            ipm_u = ipm_r
        if valid_r and (ipm_l == ipm_r or ipm_u == ipm_r):
            valid_r = 0

    mpm = [min(ipm_l, ipm_u), max(ipm_l, ipm_u)]
    if mpm[0] == mpm[1]:
        mpm[0] = IPD_DC
        mpm[1] = IPD_BI if mpm[1] == IPD_DC else mpm[1]

    mpm_ext = [0] * 8

    def _fill_from(cands, seeds):
        ext = list(seeds)
        cnt = len(ext)
        for v in cands:
            if cnt > 7:
                break
            hit = False
            for j in range(cnt):
                if v == ext[j] or v == mpm[0] or v == mpm[1]:
                    hit = True
                    break
            if not hit:
                ext.append(v)
                cnt += 1
        return ext[:8] + [0] * max(0, 8 - len(ext))

    if valid_r:
        if mpm[0] < 3 and mpm[1] < 3:
            if ipm_r < 3:
                e0 = 0
                if mpm[0] == IPD_DC:
                    e0 = IPD_PLN if mpm[1] == IPD_BI else IPD_BI
                elif mpm[0] == IPD_PLN:
                    e0 = IPD_DC
                mpm_ext = [e0, IPD_VER, IPD_HOR, IPD_DIA_R, IPD_DIA_L,
                           IPD_DIA_U, IPD_VER + 4, IPD_HOR - 4]
            else:
                lst = [IPD_VER, IPD_HOR, IPD_DIA_R, IPD_PLN, IPD_DIA_L,
                       IPD_DIA_U, IPD_VER + 4, IPD_HOR - 4, IPD_VER - 4,
                       IPD_HOR + 4]
                e0 = 0
                if mpm[0] == IPD_DC:
                    e0 = IPD_PLN if mpm[1] == IPD_BI else IPD_BI
                elif mpm[0] == IPD_PLN:
                    e0 = IPD_DC
                seeds = [e0, ipm_r,
                         ipm_r + 1 if ipm_r in (3, 4) else ipm_r - 2,
                         ipm_r - 1 if ipm_r in (IPD_CNT - 1, IPD_CNT - 2)
                         else ipm_r + 2]
                mpm_ext = _fill_from(lst, seeds)
        elif mpm[0] < 3:
            if ipm_r < 3:
                if mpm[0] == IPD_PLN:
                    e01 = [IPD_BI, IPD_DC]
                else:
                    e01 = [IPD_DC if mpm[0] == IPD_BI else IPD_BI, IPD_PLN]
                if mpm[1] > IPD_CNT - 3:
                    rest = [IPD_CNT - 2 if mpm[1] == IPD_CNT - 1
                            else IPD_CNT - 1, IPD_CNT - 3, IPD_CNT - 4,
                            IPD_CNT - 5, IPD_HOR, IPD_DIA_R]
                elif mpm[1] < 5:
                    rest = [4 if mpm[1] == 3 else 3, 5, 6, 7, IPD_VER,
                            IPD_DIA_R]
                else:
                    rest = [mpm[1] + 2, mpm[1] - 2, mpm[1] + 1, mpm[1] - 1]
                    if 13 <= mpm[1] <= 23:
                        rest += [mpm[1] - 5, mpm[1] + 5]
                    else:
                        rest += [mpm[1] - 5 if mpm[1] > 23 else mpm[1] + 5,
                                 mpm[1] - 10 if mpm[1] > 23 else mpm[1] + 10]
                mpm_ext = e01 + rest
            else:
                lst = [0] * 7 + [IPD_VER, IPD_HOR, IPD_DIA_R, IPD_PLN,
                                 IPD_DIA_L, IPD_DIA_U, IPD_VER + 4,
                                 IPD_HOR - 4]
                lst[0] = ipm_r + 1 if ipm_r in (3, 4) else ipm_r - 2
                lst[1] = (ipm_r - 1 if ipm_r in (IPD_CNT - 1, IPD_CNT - 2)
                          else ipm_r + 2)
                lst[2] = mpm[1] + 1 if mpm[1] in (3, 4) else mpm[1] - 2
                lst[3] = (mpm[1] - 1 if mpm[1] in (IPD_CNT - 1, IPD_CNT - 2)
                          else mpm[1] + 2)
                lst[4] = (ipm_r + mpm[1] + 1) >> 1
                lst[5] = (lst[4] + ipm_r + 1) >> 1
                lst[6] = (lst[4] + mpm[1] + 1) >> 1
                if mpm[0] == IPD_PLN:
                    seeds = [IPD_BI, IPD_DC, ipm_r]
                else:
                    seeds = [IPD_DC if mpm[0] == IPD_BI else IPD_BI,
                             IPD_PLN, ipm_r]
                mpm_ext = _fill_from(lst, seeds)
        else:
            if ipm_r < 3:
                lst = [0] * 7 + [IPD_VER, IPD_HOR, IPD_DIA_R, IPD_PLN,
                                 IPD_DIA_L, IPD_DIA_U, IPD_VER + 4,
                                 IPD_HOR - 4]
                lst[0] = mpm[0] + 1 if mpm[0] in (3, 4) else mpm[0] - 2
                lst[1] = mpm[0] - 1 if mpm[0] == IPD_CNT - 2 else mpm[0] + 2
                lst[2] = mpm[1] + 1 if mpm[1] == 4 else mpm[1] - 2
                lst[3] = (mpm[1] - 1 if mpm[1] in (IPD_CNT - 1, IPD_CNT - 2)
                          else mpm[1] + 2)
                lst[4] = (mpm[0] + mpm[1] + 1) >> 1
                lst[5] = (lst[4] + mpm[0] + 1) >> 1
                lst[6] = (lst[4] + mpm[1] + 1) >> 1
                seeds = [ipm_r, IPD_DC if ipm_r == IPD_BI else IPD_BI]
                mpm_ext = _fill_from(lst, seeds)
            else:
                lst = [0] * 8 + [IPD_VER, IPD_HOR, IPD_DIA_R, IPD_PLN,
                                 IPD_DIA_L, IPD_DIA_U, IPD_VER + 4,
                                 IPD_HOR - 4]
                lst[0] = mpm[0] + 1 if mpm[0] in (3, 4) else mpm[0] - 2
                lst[1] = mpm[0] - 1 if mpm[0] == IPD_CNT - 2 else mpm[0] + 2
                lst[2] = mpm[1] + 1 if mpm[1] == 4 else mpm[1] - 2
                lst[3] = (mpm[1] - 1 if mpm[1] in (IPD_CNT - 1, IPD_CNT - 2)
                          else mpm[1] + 2)
                lst[4] = ipm_r + 1 if ipm_r in (3, 4) else ipm_r - 2
                lst[5] = (ipm_r - 1 if ipm_r in (IPD_CNT - 1, IPD_CNT - 2)
                          else ipm_r + 2)
                lst[6] = ((mpm[0] + ipm_r + 1) >> 1 if ipm_r < mpm[1]
                          else (mpm[0] + mpm[1] + 1) >> 1)
                lst[7] = ((mpm[0] + mpm[1] + 1) >> 1 if ipm_r < mpm[0]
                          else (mpm[1] + ipm_r + 1) >> 1)
                mpm_ext = _fill_from(lst, [IPD_BI, IPD_DC, ipm_r])
    else:
        if mpm[0] < 3 and mpm[1] < 3:
            e0 = 0
            if mpm[0] == IPD_DC:
                e0 = IPD_PLN if mpm[1] == IPD_BI else IPD_BI
            elif mpm[0] == IPD_PLN:
                e0 = IPD_DC
            mpm_ext = [e0, IPD_VER, IPD_HOR, IPD_DIA_R, IPD_DIA_L,
                       IPD_DIA_U, IPD_VER + 4, IPD_HOR - 4]
        elif mpm[0] < 3:
            if mpm[0] == IPD_PLN:
                e01 = [IPD_BI, IPD_DC]
            else:
                e01 = [IPD_DC if mpm[0] == IPD_BI else IPD_BI, IPD_PLN]
            if mpm[1] > IPD_CNT - 3:
                rest = [IPD_CNT - 2 if mpm[1] == IPD_CNT - 1 else IPD_CNT - 1,
                        IPD_CNT - 3, IPD_CNT - 4, IPD_CNT - 5, IPD_HOR,
                        IPD_DIA_R]
            elif mpm[1] < 5:
                rest = [4 if mpm[1] == 3 else 3, 5, 6, 7, IPD_VER, IPD_DIA_R]
            else:
                rest = [mpm[1] + 2, mpm[1] - 2, mpm[1] + 1, mpm[1] - 1]
                if 13 <= mpm[1] <= 23:
                    rest += [mpm[1] - 5, mpm[1] + 5]
                else:
                    rest += [mpm[1] - 5 if mpm[1] > 23 else mpm[1] + 5,
                             mpm[1] - 10 if mpm[1] > 23 else mpm[1] + 10]
            mpm_ext = e01 + rest
        else:
            lst = [0] * 7 + [IPD_VER, IPD_HOR, IPD_DIA_R, IPD_PLN, IPD_DIA_L,
                             IPD_DIA_U, IPD_VER + 4, IPD_HOR - 4]
            lst[0] = mpm[0] + 1 if mpm[0] in (3, 4) else mpm[0] - 2
            lst[1] = mpm[0] - 1 if mpm[0] == IPD_CNT - 2 else mpm[0] + 2
            lst[2] = mpm[1] + 1 if mpm[1] == 4 else mpm[1] - 2
            lst[3] = (mpm[1] - 1 if mpm[1] in (IPD_CNT - 1, IPD_CNT - 2)
                      else mpm[1] + 2)
            lst[4] = (mpm[0] + mpm[1] + 1) >> 1
            lst[5] = (lst[4] + mpm[0] + 1) >> 1
            lst[6] = (lst[4] + mpm[1] + 1) >> 1
            mpm_ext = _fill_from(lst, [IPD_BI, IPD_DC])

    included = [0] * IPD_CNT
    pims = []
    for v in mpm:
        if not included[v]:
            included[v] = 1
            pims.append(v)
    for v in mpm_ext[:8]:
        if not included[v]:
            included[v] = 1
            pims.append(v)
    for v in T.INTRA_MODE_LIST:
        if not included[v]:
            included[v] = 1
            pims.append(v)
    assert len(pims) == IPD_CNT
    return mpm, mpm_ext, pims


# avail bits (subset used by baseline)
AVAIL_UP = 1 << 0
AVAIL_LE = 1 << 1
AVAIL_RI = 1 << 2
AVAIL_UP_LE = 1 << 3
AVAIL_UP_RI = 1 << 4
AVAIL_LO_LE = 1 << 5
AVAIL_LO_RI = 1 << 6
AVAIL_RI_UP = 1 << 7


class EntropyDecoder:
    """Sequential SBAC + syntax parse of one slice (single tile, Baseline)."""

    def __init__(self, sps: Sps, pps: Pps, chroma_qp_tbl: np.ndarray,
                 log2_ctu: int = T.CTU_LOG2_B):
        self.sps = sps
        self.pps = pps
        self.chroma_qp_tbl = chroma_qp_tbl
        self.w = sps.pic_width_in_luma_samples
        self.h = sps.pic_height_in_luma_samples
        self.ctu = 1 << log2_ctu
        self.log2_ctu = log2_ctu
        self.w_lcu = (self.w + self.ctu - 1) // self.ctu
        self.h_lcu = (self.h + self.ctu - 1) // self.ctu
        self.w_scu = (self.w + 3) >> 2
        self.h_scu = (self.h + 3) >> 2

    def decode_slice(self, bs: BitReader, sh: SliceHeader,
                     num_refp: tuple) -> FrameSyntax:
        sps = self.sps
        w_pad = self.w_lcu * self.ctu
        h_pad = self.h_lcu * self.ctu
        fs = FrameSyntax(
            w=self.w, h=self.h, w_pad=w_pad, h_pad=h_pad,
            w_scu=self.w_scu, h_scu=self.h_scu,
            slice_type=sh.slice_type, sh=sh)
        fs.coef_y = np.zeros((h_pad, w_pad), dtype=np.int16)
        cw_shift = 1 if sps.chroma_format_idc in (1, 2) else 0
        ch_shift = 1 if sps.chroma_format_idc == 1 else 0
        self.cw_shift, self.ch_shift = cw_shift, ch_shift
        if sps.chroma_format_idc:
            fs.coef_u = np.zeros((h_pad >> ch_shift, w_pad >> cw_shift), dtype=np.int16)
            fs.coef_v = np.zeros_like(fs.coef_u)
        fs.map_if = np.zeros((self.h_scu, self.w_scu), dtype=np.uint8)
        fs.map_qp = np.zeros((self.h_scu, self.w_scu), dtype=np.int32)
        fs.map_cbfl = np.zeros((self.h_scu, self.w_scu), dtype=np.uint8)
        fs.map_ipm = np.full((self.h_scu, self.w_scu), -1, dtype=np.int8)
        fs.map_skip = np.zeros((self.h_scu, self.w_scu), dtype=np.uint8)
        fs.edge_hor = np.zeros((self.h_scu, self.w_scu), dtype=np.uint8)
        fs.edge_ver = np.zeros((self.h_scu, self.w_scu), dtype=np.uint8)
        self.cod_eco = np.zeros((self.h_scu, self.w_scu), dtype=np.uint8)

        self.fs = fs
        self.sh = sh
        self.num_refp = num_refp
        self.qp_prev_eco = sh.qp

        sbac = Sbac(bs)
        sbac.reset(bs, sh.slice_type, sh.qp,
                   bool(getattr(sps, "is_main", False) and sps.tool_cm_init))
        self.sbac = sbac
        self.bs = bs

        n_ctu = self.w_lcu * self.h_lcu
        for ctu_idx in range(n_ctu):
            x0 = (ctu_idx % self.w_lcu) << self.log2_ctu
            y0 = (ctu_idx // self.w_lcu) << self.log2_ctu
            self._decode_tree(x0, y0, self.log2_ctu, self.log2_ctu)
        if sbac.decode_bin_trm() != 1:
            raise MalformedBitstream("missing tile end flag")
        # cabac zero words: remaining bytes must be zero 16-bit words
        while not self.bs.at_end():
            if self.bs.read(16) not in (0, 0xFFFFFFFF):
                raise MalformedBitstream("nonzero cabac_zero_word")
        return fs

    # -- CU tree --------------------------------------------------------
    def _decode_tree(self, x0, y0, log2_cuw, log2_cuh):
        """QT recursion (ref: src_base/xevd.c:918-1017)."""
        cuw = 1 << log2_cuw
        cuh = 1 << log2_cuh
        if cuw > T.MIN_CU_SIZE or cuh > T.MIN_CU_SIZE:
            if x0 + cuw <= self.w and y0 + cuh <= self.h:
                split = self._read_split(cuw, cuh)
            else:
                split = self._read_split(cuw, cuh)
        else:
            split = NO_SPLIT
        if split != NO_SPLIT:
            half = cuw >> 1
            for (xs, ys) in ((x0, y0), (x0 + half, y0), (x0, y0 + half),
                             (x0 + half, y0 + half)):
                if xs < self.w and ys < self.h:
                    self._decode_tree(xs, ys, log2_cuw - 1, log2_cuh - 1)
        else:
            self._decode_cu(x0, y0, log2_cuw, log2_cuh)

    def _read_split(self, cuw, cuh):
        """split_cu_flag (ref: src_base/xevd_eco.c:985-998)."""
        if cuw < 8 and cuh < 8:
            return NO_SPLIT
        bin_ = self.sbac.decode_bin(self.sbac.ctx.split_cu_flag, 0)
        return SPLIT_QUAD if bin_ else NO_SPLIT

    # -- CU syntax ------------------------------------------------------
    def _decode_cu(self, x, y, log2_cuw, log2_cuh):
        """One CU (ref: src_base/xevd_eco.c:1048-1176)."""
        sbac = self.sbac
        ctx = sbac.ctx
        sh = self.sh
        sps = self.sps
        fs = self.fs
        cuw = 1 << log2_cuw
        cuh = 1 << log2_cuh
        x_scu, y_scu = x >> 2, y >> 2
        scuw, scuh = cuw >> 2, cuh >> 2

        pred_mode = T.MODE_INTRA
        mvp_idx = [0, 0]
        mvd = [[0, 0], [0, 0]]
        refi = [T.REFI_INVALID, T.REFI_INVALID]
        inter_dir = 0
        ipm = 0
        ipm_c = None
        cbf = [0, 0, 0]

        cm_init = bool(getattr(sps, "is_main", False) and sps.tool_cm_init)
        ctx_skip = ctx_pred = 0
        if cm_init and sh.slice_type != T.SLICE_I:
            ctx_skip, ctx_pred = get_ctx_some_flags(
                x_scu, y_scu, scuw, scuh, self.w_scu, fs.map_skip,
                fs.map_if, self.cod_eco)

        if sh.slice_type != T.SLICE_I:
            if sbac.decode_bin(ctx.skip_flag, ctx_skip):
                pred_mode = T.MODE_SKIP

        if pred_mode == T.MODE_SKIP:
            mvp_idx[0] = sbac.read_truncate_unary_sym(ctx.mvp_idx, 3, 4)
            if sh.slice_type == T.SLICE_B:
                mvp_idx[1] = sbac.read_truncate_unary_sym(ctx.mvp_idx, 3, 4)
            qp = self.qp_prev_eco if self.pps.cu_qp_delta_enabled_flag else sh.qp
        else:
            # pred mode flag
            if sh.slice_type != T.SLICE_I:
                pred_mode = (T.MODE_INTRA
                             if sbac.decode_bin(ctx.pred_mode, ctx_pred)
                             else T.MODE_INTER)
            else:
                pred_mode = T.MODE_INTRA

            if pred_mode == T.MODE_INTER:
                if sh.slice_type == T.SLICE_B:
                    if sbac.decode_bin(ctx.direct_mode_flag, 0):
                        inter_dir = T.PRED_DIR
                if inter_dir != T.PRED_DIR:
                    if sh.slice_type == T.SLICE_B:
                        inter_dir = self._read_inter_pred_idc()
                    else:
                        inter_dir = T.PRED_L0
                    for lidx in range(2):
                        if ((inter_dir + 1) >> lidx) & 1:
                            refi[lidx] = self._read_refi(self.num_refp[lidx])
                            mvp_idx[lidx] = sbac.read_truncate_unary_sym(ctx.mvp_idx, 3, 4)
                            mvd[lidx] = self._read_mvd()
            elif sps.tool_eipd:
                mpm, mpm_ext, pims = get_mpm_main(
                    x_scu, y_scu, cuw, cuh, fs.map_if, fs.map_ipm,
                    self.cod_eco, self.w_scu)
                ipm = self._read_intra_dir_main(mpm, mpm_ext, pims)
                if sps.chroma_format_idc != 0:
                    ipm_c = self._read_intra_dir_c(ipm)
            else:
                ipm = self._read_intra_dir(x_scu, y_scu)

            qp, cbf = self._decode_coef(x, y, log2_cuw, log2_cuh, pred_mode,
                                        inter_dir)

        qp_u, qp_v = self._chroma_qps(qp)

        # record CU
        fs.cu_x.append(x)
        fs.cu_y.append(y)
        fs.cu_log2.append(log2_cuw)
        fs.cu_pred_mode.append(pred_mode)
        fs.cu_ipm.append(ipm)
        fs.cu_ipm_c.append(ipm if ipm_c is None else ipm_c)
        fs.cu_qp.append(qp)
        fs.cu_qp_u.append(qp_u)
        fs.cu_qp_v.append(qp_v)
        fs.cu_cbf.append(cbf)
        fs.cu_refi.append(refi)
        fs.cu_mvp_idx.append(mvp_idx)
        fs.cu_mvd.append(mvd)
        fs.cu_inter_dir.append(inter_dir)
        fs.cu_avail.append(0)

        # per-SCU map updates (entropy-time, ref: src_base/xevd_util.c:1574)
        ys, xs = slice(y_scu, y_scu + scuh), slice(x_scu, x_scu + scuw)
        is_intra = 1 if pred_mode == T.MODE_INTRA else 0
        fs.map_if[ys, xs] = is_intra
        fs.map_qp[ys, xs] = qp
        fs.map_cbfl[ys, xs] = 1 if cbf[0] else 0
        fs.map_skip[ys, xs] = 1 if pred_mode == T.MODE_SKIP else 0
        if is_intra:
            fs.map_ipm[ys, xs] = ipm
        self.cod_eco[ys, xs] = 1
        # CU-boundary edge maps for deblocking
        fs.edge_hor[y_scu, xs] = 1
        fs.edge_ver[ys, x_scu] = 1

    def _read_inter_pred_idc(self):
        """(ref: src_base/xevd_eco.c:955-983)"""
        sbac = self.sbac
        tmp = sbac.decode_bin(sbac.ctx.inter_dir, 0)
        if not tmp:
            return T.PRED_BI
        tmp = sbac.decode_bin(sbac.ctx.inter_dir, 1)
        return T.PRED_L1 if tmp else T.PRED_L0

    def _read_refi(self, num_refp):
        """(ref: src_base/xevd_eco.c:435-460)"""
        sbac = self.sbac
        ref_num = 0
        if num_refp > 1:
            if sbac.decode_bin(sbac.ctx.refi, 0):
                ref_num += 1
                if num_refp > 2 and sbac.decode_bin(sbac.ctx.refi, 1):
                    ref_num += 1
                    while ref_num < num_refp - 1:
                        if not sbac.decode_bin_ep():
                            break
                        ref_num += 1
        return ref_num

    def _read_mvd(self):
        """(ref: src_base/xevd_eco.c:522-599)"""
        out = [0, 0]
        for d in range(2):
            v = self._read_abs_mvd()
            if v:
                if self.sbac.decode_bin_ep():
                    v = -v
            out[d] = v
        return out

    def _read_abs_mvd(self):
        sbac = self.sbac
        code = sbac.decode_bin(sbac.ctx.mvd, 0)
        if code:
            return 0
        length = 0
        while not (code & 1):
            if length == 0:
                code = sbac.decode_bin(sbac.ctx.mvd, 0)
            else:
                code = sbac.decode_bin_ep()
            length += 1
        val = (1 << length) - 1
        while length:
            length -= 1
            code = sbac.decode_bin_ep()
            val += code << length
        return val

    def _read_intra_dir(self, x_scu, y_scu):
        """MPM-permuted intra mode (ref: src_base/xevd_eco.c:816-840,
        src_base/xevd_ipred.c:678-693)."""
        fs = self.fs
        ipm_l = 0
        ipm_u = 0
        if x_scu > 0 and fs.map_if[y_scu, x_scu - 1] and self.cod_eco[y_scu, x_scu - 1]:
            ipm_l = int(fs.map_ipm[y_scu, x_scu - 1]) + 1
        if y_scu > 0 and fs.map_if[y_scu - 1, x_scu] and self.cod_eco[y_scu - 1, x_scu]:
            ipm_u = int(fs.map_ipm[y_scu - 1, x_scu]) + 1
        mpm = T.MPM_B[ipm_l][ipm_u]
        t0 = self.sbac.read_unary_sym(self.sbac.ctx.intra_dir, 0, 2)
        ipm = 0
        for i in range(T.IPD_CNT_B):
            if t0 == mpm[i]:
                ipm = i
        return ipm

    def _read_intra_dir_main(self, mpm, mpm_ext, pims):
        """EIPD luma mode (ref: src_base/xevd_eco.c:795-879)."""
        sbac = self.sbac
        ctx = sbac.ctx
        if sbac.decode_bin(ctx.intra_luma_pred_mpm_flag, 0):
            return mpm[sbac.decode_bin(ctx.intra_luma_pred_mpm_idx, 0)]
        if sbac.decode_bin_ep():
            return mpm_ext[sbac.decode_bins_ep(3)]
        # truncated binary over IPD_CNT - 10 = 23 symbols
        # (ref: src_base/xevd_eco.c:795-814, threshold 4, val 16, b 7)
        rem = sbac.decode_bins_ep(4)
        if rem >= 16 - 7:
            rem = (rem << 1) + sbac.decode_bin_ep() - (16 - 7)
        return pims[T.INTRA_MPM_NUM + T.INTRA_PIMS_NUM + rem]

    def _read_intra_dir_c(self, ipm_l):
        """EIPD chroma mode (ref: src_base/xevd_eco.c:881-910)."""
        sbac = self.sbac
        conv = {T.IPD_VER: T.IPD_VER_C, T.IPD_HOR: T.IPD_HOR_C,
                T.IPD_DC: T.IPD_DC_C, T.IPD_BI: T.IPD_BI_C}.get(ipm_l)
        ipm = 0
        if sbac.decode_bin(sbac.ctx.intra_chroma_pred_mode, 0) == 0:
            ipm = sbac.read_unary_sym_ep(T.IPD_CHROMA_CNT - 1) + 1
            if conv is not None and ipm >= conv:
                ipm += 1
        return ipm

    # -- coefficients ---------------------------------------------------
    def _decode_coef(self, x, y, log2_cuw, log2_cuh, pred_mode, inter_dir):
        """cbf + dqp + run/level (ref: src_base/xevd_eco.c:256-352,601-741)."""
        sbac = self.sbac
        ctx = sbac.ctx
        sps = self.sps
        # In Baseline, pred_mode never becomes MODE_DIR, so cbf_all is
        # read even for direct CUs (ref: src_base/xevd_eco.c:611 checks
        # pred_mode==MODE_DIR, which only Main sets)
        b_no_cbf = False
        cbf = [0, 0, 0]

        if pred_mode != T.MODE_INTRA:
            if not b_no_cbf:
                if sbac.decode_bin(ctx.cbf_all, 0) == 0:
                    qp = (self.qp_prev_eco
                          if self.pps.cu_qp_delta_enabled_flag else self.qp_prev_eco)
                    return self.qp_prev_eco, [0, 0, 0]
            if sps.chroma_format_idc != 0:
                cbf[1] = sbac.decode_bin(ctx.cbf_cb, 0)
                cbf[2] = sbac.decode_bin(ctx.cbf_cr, 0)
            if cbf[1] + cbf[2] == 0:
                cbf[0] = 1
            else:
                cbf[0] = sbac.decode_bin(ctx.cbf_luma, 0)
        else:
            if sps.chroma_format_idc != 0:
                cbf[1] = sbac.decode_bin(ctx.cbf_cb, 0)
                cbf[2] = sbac.decode_bin(ctx.cbf_cr, 0)
            cbf[0] = sbac.decode_bin(ctx.cbf_luma, 0)

        if self.pps.cu_qp_delta_enabled_flag and (cbf[0] or cbf[1] or cbf[2]):
            dqp = self._read_dqp()
            qp = (self.qp_prev_eco + dqp + 52) % 52
            self.qp_prev_eco = qp
        else:
            qp = self.qp_prev_eco

        if cbf[0]:
            blk = self._read_coef_block(log2_cuw, log2_cuh, 0)
            self.fs.coef_y[y:y + (1 << log2_cuh), x:x + (1 << log2_cuw)] = blk
        if cbf[1]:
            lw, lh = log2_cuw - self.cw_shift, log2_cuh - self.ch_shift
            blk = self._read_coef_block(lw, lh, 1)
            xc, yc = x >> self.cw_shift, y >> self.ch_shift
            self.fs.coef_u[yc:yc + (1 << lh), xc:xc + (1 << lw)] = blk
        if cbf[2]:
            lw, lh = log2_cuw - self.cw_shift, log2_cuh - self.ch_shift
            blk = self._read_coef_block(lw, lh, 1)
            xc, yc = x >> self.cw_shift, y >> self.ch_shift
            self.fs.coef_v[yc:yc + (1 << lh), xc:xc + (1 << lw)] = blk
        return qp, cbf

    def _read_dqp(self):
        sbac = self.sbac
        dqp = sbac.read_unary_sym(sbac.ctx.delta_qp, 0, 1)
        if dqp > 0 and sbac.decode_bin_ep():
            dqp = -dqp
        return dqp

    def _read_coef_block(self, log2_w, log2_h, ch_type) -> np.ndarray:
        """Run/level zigzag (ref: src_base/xevd_eco.c:354-411; CM_INIT ctx
        selection ref: src_main/xevdm_eco.c:303-352)."""
        sbac = self.sbac
        ctx = sbac.ctx
        scanp = T.SCAN_TBL[(log2_w, log2_h)]
        num_coeff = 1 << (log2_w + log2_h)
        coef = np.zeros(num_coeff, dtype=np.int16)
        sps = self.sps
        cm_init = bool(getattr(sps, "is_main", False) and sps.tool_cm_init)
        ctx_last = 0 if ch_type == 0 else 1
        pos = 0
        prev_level = 6
        while True:
            if cm_init:
                t0 = (min(prev_level - 1, 5) << 1) + (0 if ch_type == 0 else 12)
            else:
                t0 = 0 if ch_type == 0 else 2
            run = sbac.read_unary_sym(ctx.run, t0, 2)
            pos += run
            level = sbac.read_unary_sym(ctx.level, t0, 2) + 1
            prev_level = level
            sign = sbac.decode_bin_ep()
            coef[scanp[pos]] = -level if sign else level
            if pos >= num_coeff - 1:
                break
            pos += 1
            if sbac.decode_bin(ctx.last, ctx_last):
                break
        return coef.reshape(1 << log2_h, 1 << log2_w)

    def _chroma_qps(self, qp):
        sps = self.sps
        bdc_m8 = sps.bit_depth_chroma_minus8
        off = 6 * bdc_m8
        qp_i_cb = np.clip(qp + self.sh.qp_u_offset, -off, 57)
        qp_i_cr = np.clip(qp + self.sh.qp_v_offset, -off, 57)
        qp_u = int(self.chroma_qp_tbl[0][qp_i_cb + off]) + off
        qp_v = int(self.chroma_qp_tbl[1][qp_i_cr + off]) + off
        return qp_u, qp_v
