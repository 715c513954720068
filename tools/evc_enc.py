"""Minimal conforming MPEG-5 EVC Baseline test-stream generator.

Produces length-prefixed .evc streams (the container xevd_app reads) with
random-but-valid syntax: random QT splits, random intra modes, random
run/level coefficients, and for P slices random skip/inter decisions with
MVP-consistent motion.  The *reference decoder binary* is the oracle: tests
decode these streams with xevd_app and with xevd_tpu and require bit-exact
output.  This is test tooling — it does not aim at compression quality.

The SBAC encoder is the exact mirror of the decoder engine
(ref: src_base/xevd_eco.c:35-164): interval [low, low+range), MPS slot
first, big-integer low so carries are exact, final stream = binary(low).
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from xevd_tpu import partition as P
from xevd_tpu import tables as T
from xevd_tpu.bitstream import BitWriter
from xevd_tpu.sbac import SbacCtx


class SbacEnc:
    """Mirror of the SBAC decoder; see xevd_tpu/sbac.py."""

    def __init__(self, slice_type=0, slice_qp=0, cm_init=False):
        self.range = 16384
        self.low = 0
        self.shifts = 0
        self.ctx = SbacCtx()
        self.ctx.reset(slice_type, slice_qp, cm_init)

    def encode_bin(self, model: list, i: int, bin_: int):
        m = model[i]
        state = m >> 1
        mps = m & 1
        lps = (state * self.range) >> 9
        if lps < 437:
            lps = 437
        mps_range = self.range - lps
        if bin_ == mps:
            self.range = mps_range
            state = state - ((state + 16) >> 5)
            model[i] = (state << 1) + mps
        else:
            self.low += mps_range
            self.range = lps
            state = state + ((512 - state + 16) >> 5)
            if state > 256:
                mps = 1 - mps
                state = 512 - state
            model[i] = (state << 1) + mps
        while self.range < 8192:
            self.range <<= 1
            self.low <<= 1
            self.shifts += 1

    def encode_bin_ep(self, bin_: int):
        rhalf = self.range >> 1
        if bin_:
            self.low += rhalf
        self.range = rhalf << 1
        self.low <<= 1
        self.shifts += 1
        # decoder: range >>=1, compare, range <<=1, shift one bit in
        # net effect: interval [low', low'+2*rhalf) after the shift with
        # low' = 2*(low + bin*rhalf) — handled above.

    def encode_bins_ep(self, val: int, n: int):
        for i in range(n - 1, -1, -1):
            self.encode_bin_ep((val >> i) & 1)

    def encode_bin_trm(self, bin_: int):
        if bin_:
            self.low += self.range - 1
            self.range = 1
        else:
            self.range -= 1
            while self.range < 8192:
                self.range <<= 1
                self.low <<= 1
                self.shifts += 1

    # -- composite mirrors ------------------------------------------------
    def unary(self, model, base, num_ctx, v):
        if v == 0:
            self.encode_bin(model, base, 0)
            return
        self.encode_bin(model, base, 1)
        ctx_idx = 0
        for k in range(1, v + 1):
            if ctx_idx < num_ctx - 1:
                ctx_idx += 1
            self.encode_bin(model, base + ctx_idx, 1 if k < v else 0)

    def trunc_unary(self, model, num_ctx, max_num, v):
        if max_num > 1:
            for i in range(min(v, max_num - 1)):
                self.encode_bin(model, min(i, num_ctx - 1), 1)
            if v < max_num - 1:
                self.encode_bin(model, min(v, num_ctx - 1), 0)

    def unary_ep(self, max_val, v):
        if v == 0:
            self.encode_bin_ep(0)
            return
        self.encode_bin_ep(1)
        counter = 1
        for k in range(1, v + 1):
            if counter != max_val:
                self.encode_bin_ep(1 if k < v else 0)
            counter += 1

    def abs_mvd(self, model, v):
        """Mirror of xevd_eco_abs_mvd (ref: src_base/xevd_eco.c:522-555)."""
        if v == 0:
            self.encode_bin(model, 0, 1)
            return
        self.encode_bin(model, 0, 0)
        k = (v + 1).bit_length() - 1          # val = 2^k - 1 + r
        r = v + 1 - (1 << k)
        # loop bits: k-1 zeros then a one; first via model, rest EP
        for i in range(1, k + 1):
            bit = 1 if i == k else 0
            if i == 1:
                self.encode_bin(model, 0, bit)
            else:
                self.encode_bin_ep(bit)
        for i in range(k - 1, -1, -1):
            self.encode_bin_ep((r >> i) & 1)

    def finish(self) -> bytes:
        """Emit the final bit string (14 + shifts bits), zero-padded to a
        byte boundary, as bytes."""
        nbits = 14 + self.shifts
        pad = (-nbits) % 8
        v = self.low << pad
        nbits += pad
        return v.to_bytes(nbits // 8, "big")


def _nalu(payload_bits: BitWriter, nut: int, tid: int = 0,
          sbac_bytes: bytes = b"") -> bytes:
    """Wrap: 4-byte BE length + 2-byte NAL header + RBSP."""
    hdr = BitWriter()
    hdr.write(0, 1)
    hdr.write(nut + 1, 6)
    hdr.write(tid, 3)
    hdr.write(0, 5)
    hdr.write(0, 1)
    body = hdr.to_bytes() + payload_bits.to_bytes() + sbac_bytes
    return len(body).to_bytes(4, "big") + body


class Tools:
    """Main-profile SPS tool configuration (all default off).

    Field names mirror the SPS flags (ref: src_main/xevdm_eco.c:1863-1931).
    """
    FLAGS = ("btt suco admvp affine amvr dmvr mmvd hmvp eipd ibc cm_init "
             "adcc iqt ats addb alf htdf rpl pocs dquant dra").split()

    def __init__(self, **kw):
        for f in self.FLAGS:
            setattr(self, f, 0)
        self.ibc_log_max_size = 5
        self.log2_max_poc_lsb = 8
        for k, v in kw.items():
            if not hasattr(self, k):
                raise ValueError(f"unknown tool {k}")
            setattr(self, k, v)

    def any_main(self):
        return any(getattr(self, f) for f in self.FLAGS)


def write_sps(w, h, bd=8, max_num_ref_pics=2, qp_table=None,
              log2_sub_gop_length=0, profile=0, tools=None) -> bytes:
    t = tools or Tools()
    bw = BitWriter()
    bw.write_ue(0)            # sps id
    bw.write(profile, 8)      # 0=baseline, 1=main
    bw.write(0, 8)            # level
    bw.write(0, 32)           # toolset_idc_h
    bw.write(0, 32)           # toolset_idc_l
    bw.write_ue(1)            # chroma 4:2:0
    bw.write_ue(w)
    bw.write_ue(h)
    bw.write_ue(bd - 8)
    bw.write_ue(bd - 8)
    main = profile in (1, 3)
    bw.write1(t.btt)
    if main and t.btt:
        bw.write_ue(1)        # log2_ctu_size_minus5 → CTU 64
        bw.write_ue(0)        # log2_min_cb_size_minus2 → min cb 4
        bw.write_ue(0)        # log2_diff_ctu_max_14_cb_size (1:4 up to 64)
        bw.write_ue(0)        # log2_diff_ctu_max_tt_cb_size (TT up to 64)
        bw.write_ue(0)        # log2_diff_min_cb_min_tt_cb_size_minus2 (TT>=16)
    bw.write1(t.suco)
    if main and t.suco:
        bw.write_ue(0)        # log2_diff_ctu_size_max_suco_cb_size
        bw.write_ue(4)        # log2_diff_max_suco_min_suco_cb_size
    bw.write1(t.admvp)
    if main and t.admvp:
        bw.write1(t.affine)
        bw.write1(t.amvr)
        bw.write1(t.dmvr)
        bw.write1(t.mmvd)
        bw.write1(t.hmvp)
    bw.write1(t.eipd)
    if main and t.eipd:
        bw.write1(t.ibc)
        if t.ibc:
            bw.write_ue(t.ibc_log_max_size - 2)
    bw.write1(t.cm_init)
    if main and t.cm_init:
        bw.write1(t.adcc)
    bw.write1(t.iqt)
    if main and t.iqt:
        bw.write1(t.ats)
    bw.write1(t.addb)
    bw.write1(t.alf)
    bw.write1(t.htdf)
    bw.write1(t.rpl)
    bw.write1(t.pocs)
    bw.write1(t.dquant)
    bw.write1(t.dra)
    if main and t.pocs:
        bw.write_ue(t.log2_max_poc_lsb - 4)
    if not t.rpl or not t.pocs:
        bw.write_ue(log2_sub_gop_length)
        if log2_sub_gop_length == 0:
            bw.write_ue(0)    # log2_ref_pic_gap_length
    if not t.rpl:
        bw.write_ue(max_num_ref_pics)
    else:
        bw.write_ue(max_num_ref_pics + 2)  # sps_max_dec_pic_buffering_minus1
        bw.write1(0)          # long_term_ref_pics_flag
        bw.write1(0)          # rpl1_same_as_rpl0_flag
        bw.write_ue(0)        # num_ref_pic_lists_in_sps0
        bw.write_ue(0)        # num_ref_pic_lists_in_sps1
    bw.write1(0)              # cropping
    bw.write1(0)              # chroma qp table present
    bw.write1(0)              # vui
    bw.align()
    return _nalu(bw, T.NUT_SPS)


def write_pps(dra_aps_id=None) -> bytes:
    bw = BitWriter()
    bw.write_ue(0)            # pps id
    bw.write_ue(0)            # sps id
    bw.write_ue(0)            # num_ref_idx_default_active_minus1[0]
    bw.write_ue(0)            # [1]
    bw.write_ue(0)            # additional_lt_poc_lsb_len
    bw.write1(0)              # rpl1_idx_present
    bw.write1(1)              # single_tile_in_pic
    bw.write_ue(0)            # tile_id_len_minus1
    bw.write1(0)              # explicit_tile_id
    bw.write1(0 if dra_aps_id is None else 1)   # pic_dra_enabled
    if dra_aps_id is not None:
        bw.write(dra_aps_id, 5)
    bw.write1(0)              # arbitrary_slice
    bw.write1(0)              # constrained_intra_pred
    bw.write1(0)              # cu_qp_delta
    bw.align()
    return _nalu(bw, T.NUT_PPS)


def write_aps_dra(aps_id, rng, num_ranges=8, equal=True,
                  table_idx=None) -> bytes:
    """DRA APS (mirror of aps.parse_dra_aps,
    ref: src_main/xevdm_eco.c:2319-2395)."""
    bw = BitWriter()
    bw.write(aps_id, 5)
    bw.write(1, 3)            # aps_type_id = DRA
    bw.write(4, 4)            # dra_descriptor1
    bw.write(9, 4)            # dra_descriptor2
    bw.write_ue(num_ranges - 1)
    bw.write1(1 if equal else 0)
    bw.write(0, 10)           # global offset
    if equal:
        bw.write(1024 // num_ranges, 10)
    else:
        # strictly positive deltas summing to 1024 (zero-width ranges
        # would divide by zero in the chroma LUT build)
        extra = rng.multinomial(1024 - 32 * num_ranges,
                                [1.0 / num_ranges] * num_ranges)
        for e in extra:
            bw.write(32 + int(e), 10)
    for _ in range(num_ranges):
        bw.write(int(rng.integers(300, 900)), 13)   # luma scales (Q9)
    bw.write(int(rng.integers(380, 700)), 13)       # cb scale
    bw.write(int(rng.integers(380, 700)), 13)       # cr scale
    if table_idx is None:
        table_idx = int(rng.integers(18, 40))
    bw.write_ue(table_idx)
    bw.write1(0)              # aps_extension_flag
    bw.align()
    return _nalu(bw, T.NUT_APS)


def _s16v(v):
    v = int(v) & 0xFFFF
    return v - 0x10000 if v >= 0x8000 else v


def _alf_golomb_enc(bw: BitWriter, v: int, k: int, signed_val: bool):
    """Mirror of aps.alf_golomb_decode."""
    a = abs(v)
    n = 0
    while a >= ((1 << (n + 1)) - 1) << k:
        n += 1
    for _ in range(n):
        bw.write1(0)
    bw.write1(1)
    if n + k > 0:
        bw.write(a - (((1 << n) - 1) << k), n + k)
    if signed_val and a != 0:
        bw.write1(1 if v > 0 else 0)


def write_aps_alf(aps_id, rng, num_filters=1, filter_type=0,
                  chroma=True, fixed_pattern=0, coeff_delta=False,
                  delta_pred=False) -> bytes:
    """ALF APS with random small coefficients (mirror of aps.parse_alf_aps,
    ref: src_main/xevdm_eco.c:2396-2480).  fixed_pattern 0/1/2 selects the
    fixed-filter prediction signalling; coeff_delta enables per-filter
    on/off flags; delta_pred enables inter-filter coefficient deltas."""
    bw = BitWriter()
    bw.write(aps_id, 5)
    bw.write(0, 3)            # aps_type_id = ALF
    bw.write1(1)              # luma filter signal
    bw.write1(1 if chroma else 0)
    bw.write_ue(num_filters - 1)
    bw.write1(filter_type)    # 0=5x5, 1=7x7
    if num_filters > 1:
        nbits = int(T.TBL_LOG2[num_filters - 1]) + 1
        for _ in range(25):
            bw.write(int(rng.integers(0, num_filters)), nbits)
    _alf_golomb_enc(bw, fixed_pattern, 0, False)
    usage = [0] * 25
    if fixed_pattern == 2:
        usage = [int(rng.random() < 0.6) for _ in range(25)]
        for u in usage:
            bw.write1(u)
    elif fixed_pattern == 1:
        usage = [1] * 25
    if fixed_pattern > 0:
        for c in range(25):
            if usage[c]:
                bw.write(int(rng.integers(0, 16)), 4)
    # luma filter coefficients
    bw.write1(1 if coeff_delta else 0)
    if not coeff_delta and num_filters > 1:
        bw.write1(1 if delta_pred else 0)
    ncoef = 13 if filter_type else 7
    bw.write_ue(0)            # min_eg_order_minus1 -> kmin = 1
    ngolomb = 3 if filter_type else 2
    for _ in range(ngolomb):
        bw.write1(0)          # eg order increase
    cflags = [1] * num_filters
    if coeff_delta:
        cflags = [int(rng.random() < 0.8) for _ in range(num_filters)]
        for f in cflags:
            bw.write1(f)
    for f in range(num_filters):
        if cflags[f]:
            for i in range(ncoef - 1):
                _alf_golomb_enc(bw, int(rng.integers(-12, 13)), 1, True)
    if chroma:
        bw.write_ue(0)
        for _ in range(2):
            bw.write1(0)
        for i in range(6):
            _alf_golomb_enc(bw, int(rng.integers(-12, 13)), 1, True)
    bw.write1(0)              # aps_extension_flag
    bw.align()
    return _nalu(bw, T.NUT_APS)


def write_sh(slice_type, qp, nut, qp_u_off=0, qp_v_off=0, tools=None,
             poc_lsb=0, rpl0=None, rpl1=None, temporal_mvp=0,
             collocated_from_list_idx=1, collocated_from_ref_idx=0,
             mmvd_group=0, alf=None, active_num=None) -> BitWriter:
    """Slice header (ref: src_main/xevdm_eco.c:2510-2809; base subset when
    tools is None).  rpl0/rpl1: list of positive delta-POCs for RPL mode."""
    t = tools or Tools()
    bw = BitWriter()
    bw.write_ue(0)            # pps id
    bw.write_ue(slice_type)
    if nut == T.NUT_IDR:
        bw.write1(0)          # no_output_of_prior_pics
    if t.mmvd and slice_type in (T.SLICE_B, T.SLICE_P):
        bw.write1(mmvd_group)
    if t.alf:
        # alf = dict(aps_id_y, is_ctb, chroma_idc, aps_id_ch) or None=off
        # (ref: src_main/xevdm_eco.c:2608-2650)
        bw.write1(1 if alf else 0)
        if alf:
            bw.write(alf["aps_id_y"], 5)
            bw.write1(alf.get("is_ctb", 0))
            bw.write(alf.get("chroma_idc", 0), 2)
            if alf.get("chroma_idc", 0):
                bw.write(alf.get("aps_id_ch", alf["aps_id_y"]), 5)
    if nut != T.NUT_IDR:
        if t.pocs:
            bw.write(poc_lsb & ((1 << t.log2_max_poc_lsb) - 1),
                     t.log2_max_poc_lsb)
        if t.rpl:
            _write_rlp(bw, rpl0 or [])
            _write_rlp(bw, rpl1 or [])
    if slice_type != T.SLICE_I:
        if t.rpl and active_num is not None:
            bw.write1(1)      # num_ref_idx_active_override
            bw.write_ue(active_num[0] - 1)
            if slice_type == T.SLICE_B:
                bw.write_ue(active_num[1] - 1)
        else:
            bw.write1(0)      # num_ref_idx_active_override
        if t.admvp:
            bw.write1(temporal_mvp)
            if temporal_mvp:
                if slice_type == T.SLICE_B:
                    bw.write1(collocated_from_list_idx)
                    bw.write1(0)  # collocated_mvp_source_list_idx
                bw.write1(collocated_from_ref_idx)
    bw.write1(1)              # deblocking on
    if t.addb:
        bw.write_se(0)        # sh_deblock_alpha_offset
        bw.write_se(0)        # sh_deblock_beta_offset
    bw.write(qp, 6)
    bw.write_se(qp_u_off)
    bw.write_se(qp_v_off)
    bw.align()
    return bw


def _write_rlp(bw: BitWriter, deltas):
    """ref_pic_list_struct writer; deltas are absolute delta-POCs
    (positive = in the past).  Mirror of parse_rlp."""
    bw.write_ue(len(deltas))
    prev = 0
    for i, d in enumerate(deltas):
        v = d if i == 0 else d - prev
        bw.write_ue(abs(v))
        if v != 0:
            # strp_entry_sign_flag: 1 => NEGATIVE
            # (ref: src_main/xevdm_eco.c:1830-1841 "*= 1 - (flag << 1)")
            bw.write1(0 if v > 0 else 1)
        prev = d


class FrameEncoder:
    """Encodes one slice worth of CTUs with random decisions."""

    def __init__(self, w, h, slice_type, qp, rng: np.random.Generator,
                 num_refp=0, prev_maps=None, density=0.5,
                 intra_frac=0.35, refp=None,
                 num_refp1=0, poc=0, tools=None, main=False,
                 mmvd_group_enable=0):
        self.w, self.h = w, h
        self.slice_type = slice_type
        self.qp = qp
        self.rng = rng
        self.num_refp = num_refp
        self.tools = tools or Tools()
        self.sb = SbacEnc(slice_type, qp, bool(self.tools.cm_init))
        self.w_scu = (w + 3) >> 2
        self.h_scu = (h + 3) >> 2
        self.cod = np.zeros((self.h_scu, self.w_scu), np.uint8)
        self.map_if = np.zeros((self.h_scu, self.w_scu), np.uint8)
        self.map_skip = np.zeros((self.h_scu, self.w_scu), np.uint8)
        self.map_ipm = np.full((self.h_scu, self.w_scu), -1, np.int8)
        self.map_mv = np.zeros((self.h_scu, self.w_scu, 2, 2), np.int16)
        self.map_refi = np.full((self.h_scu, self.w_scu, 2), -1, np.int8)
        self.prev_maps = prev_maps  # (map_mv of refp[0][0]) for TMVP
        self.density = density
        self.intra_frac = intra_frac
        self.refp = refp            # decoder-style refp[ridx][lidx] views
        self.num_refp1 = num_refp1
        self.poc = poc
        self.map_logw = np.zeros((self.h_scu, self.w_scu), np.uint8)
        self.map_logh = np.zeros((self.h_scu, self.w_scu), np.uint8)
        self.is_main = main or self.tools.any_main()
        # shared motion-derivation view over the encoder's decode-state maps
        from types import SimpleNamespace

        from xevd_tpu.motion import MotionMaps
        self.mm = MotionMaps(self.w_scu, self.h_scu)
        self.mm.map_mv = self.map_mv
        self.mm.map_refi = self.map_refi
        self.mm.cod = self.cod
        self.mm.map_if = self.map_if
        from xevd_tpu.affine import AffineMaps
        self.am = AffineMaps(self.w_scu, self.h_scu)
        # entropy-time affine-flag map (affine_flag ctx neighbor counts,
        # mirror of frame.EntropyDecoder.map_affine)
        self.map_aff_eco = np.zeros((self.h_scu, self.w_scu), np.uint8)
        self.mm.map_ibc = np.zeros((self.h_scu, self.w_scu), np.uint8)
        self.mmvd_group_enable = mmvd_group_enable
        self.sh_mirror = SimpleNamespace(
            slice_type=slice_type, temporal_mvp_asigned_flag=0,
            collocated_from_list_idx=1, collocated_mvp_source_list_idx=0,
            collocated_from_ref_idx=0)
        if self.tools.btt:
            class _S:
                log2_min_cb_size_minus2 = 0
                log2_diff_ctu_max_14_cb_size = 0
                log2_diff_ctu_max_tt_cb_size = 0
                log2_diff_min_cb_min_tt_cb_size_minus2 = 0
            self.split_tbl = P.split_tbl_init(_S, T.CTU_LOG2_B)
            self.min_cuwh = 4
        else:
            self.split_tbl = None
            self.min_cuwh = 4

    def encode(self) -> bytes:
        ctu = T.CTU_SIZE_B
        for y0 in range(0, self.h, ctu):
            if self.tools.hmvp:
                # history resets per CTU row (ref: src_main/xevdm.c:2497)
                self.mm.history_reset()
            for x0 in range(0, self.w, ctu):
                if getattr(self, "alf_ctb_bins", False):
                    # per-CTU ALF on/off bin (ref: src_main/xevdm.c:2416)
                    self.sb.encode_bin(self.sb.ctx.alf_ctb_flag, 0,
                                       int(self.rng.random() < 0.7))
                if self.is_main:
                    self._tree_main(x0, y0, T.CTU_LOG2_B, T.CTU_LOG2_B, 0)
                else:
                    self._tree(x0, y0, T.CTU_LOG2_B)
        self.sb.encode_bin_trm(1)
        return self.sb.finish()

    def _tree(self, x0, y0, log2):
        cuw = 1 << log2
        inside = x0 + cuw <= self.w and y0 + cuw <= self.h
        if cuw > 4:
            if inside:
                split = int(self.rng.random() < (0.6 if cuw > 16 else 0.3))
                self.sb.encode_bin(self.sb.ctx.split_cu_flag, 0, split)
            else:
                split = 1  # must split to fit the picture
                if cuw >= 8:
                    self.sb.encode_bin(self.sb.ctx.split_cu_flag, 0, split)
        else:
            split = 0
        if split:
            half = cuw >> 1
            for xs, ys in ((x0, y0), (x0 + half, y0), (x0, y0 + half),
                           (x0 + half, y0 + half)):
                if xs < self.w and ys < self.h:
                    self._tree(xs, ys, log2 - 1)
        else:
            self._cu(x0, y0, log2, log2)

    # -- Main tree: BTT + SUCO + local dual tree (mirror of
    # frame._decode_tree_main) --------------------------------------------
    def _tree_main(self, x0, y0, lw, lh, parent_suco,
                   mode_cons=P.MODE_CONS_ALL):
        t = self.tools
        cuw, cuh = 1 << lw, 1 << lh
        inside = x0 + cuw <= self.w and y0 + cuh <= self.h
        if cuw > self.min_cuwh or cuh > self.min_cuwh:
            if inside:
                split = self._enc_split_mode(x0, y0, lw, lh, mode_cons)
            else:
                boundary_b = (y0 + cuh > self.h) and not (x0 + cuw > self.w)
                boundary_r = (x0 + cuw > self.w) and not (y0 + cuh > self.h)
                if t.btt:
                    allow = P.check_split_mode(
                        lw, lh, 1, boundary_b, boundary_r, T.CTU_LOG2_B,
                        x0, y0, self.w, self.h, self.split_tbl, 1, mode_cons)
                    split = (P.SPLIT_BI_VER if allow[P.SPLIT_BI_VER]
                             else P.SPLIT_BI_HOR)
                else:
                    split = P.SPLIT_QUAD
                    if cuw >= 8 or cuh >= 8:
                        self.sb.encode_bin(self.sb.ctx.split_cu_flag, 0, 1)
        else:
            split = P.NO_SPLIT

        bound = not inside
        suco_flag = self._enc_suco_flag(cuw, cuh, split, bound, parent_suco)

        if split != P.NO_SPLIT:
            mode_cons_child = mode_cons
            mode_changed = False
            if t.btt and t.admvp:
                mode_changed = (mode_cons == P.MODE_CONS_ALL
                                and not P.chroma_split_allowed(cuw, cuh,
                                                               split))
                if mode_changed:
                    if (self.slice_type == T.SLICE_I
                            or P.mode_cons_by_split(split, cuw, cuh)
                            == P.MODE_CONS_ONLY_INTRA):
                        mode_cons_child = P.MODE_CONS_ONLY_INTRA
                    else:
                        # mode_cons ctx is always 0 in the reference
                        mode_cons_child = (P.MODE_CONS_ONLY_INTRA
                                           if self.rng.random() < 0.5
                                           else P.MODE_CONS_ONLY_INTER)
                        self.sb.encode_bin(
                            self.sb.ctx.mode_cons, 0,
                            1 if mode_cons_child == P.MODE_CONS_ONLY_INTRA
                            else 0)
            parts = P.part_structure(split, x0, y0, lw, lh)
            order = P.suco_order(suco_flag if P.is_vertical(split) else 0,
                                 split)
            for pn in order:
                xs, ys, plw, plh = parts[pn]
                if xs < self.w and ys < self.h:
                    self._tree_main(xs, ys, plw, plh, suco_flag,
                                    mode_cons_child)
            if mode_changed and mode_cons_child == P.MODE_CONS_ONLY_INTRA:
                self._cu(x0, y0, lw, lh, tree_type=P.TREE_C,
                         mode_cons=P.MODE_CONS_ONLY_INTRA)
        else:
            tree_type = (P.TREE_L if mode_cons == P.MODE_CONS_ONLY_INTRA
                         else P.TREE_LC)
            if self.slice_type == T.SLICE_I or (
                    t.admvp and lw == 2 and lh == 2):
                mode_cons = P.MODE_CONS_ONLY_INTRA
            self._cu(x0, y0, lw, lh, tree_type=tree_type,
                     mode_cons=mode_cons)

    def _enc_split_mode(self, x0, y0, lw, lh, mode_cons=P.MODE_CONS_ALL):
        """Mirror of frame._read_split_mode_main."""
        sb = self.sb
        rng = self.rng
        cuw, cuh = 1 << lw, 1 << lh
        if cuw < 8 and cuh < 8:
            return P.NO_SPLIT
        if not self.tools.btt:
            split = int(rng.random() < (0.6 if cuw > 16 else 0.3))
            sb.encode_bin(sb.ctx.split_cu_flag, 0, split)
            return P.SPLIT_QUAD if split else P.NO_SPLIT

        allow = P.check_split_mode(lw, lh, 0, 0, 0, T.CTU_LOG2_B, x0, y0,
                                   self.w, self.h, self.split_tbl, 1,
                                   mode_cons)
        cands = [m for m in (P.SPLIT_BI_VER, P.SPLIT_BI_HOR,
                             P.SPLIT_TRI_VER, P.SPLIT_TRI_HOR) if allow[m]]
        if not cands:
            return P.NO_SPLIT
        # choose: bias toward splitting large blocks
        p_split = 0.65 if max(cuw, cuh) > 16 else 0.3
        split = int(rng.choice(cands)) if rng.random() < p_split \
            else P.NO_SPLIT

        if self.tools.cm_init:
            x_scu, y_scu = x0 >> 2, y0 >> 2
            scuw = cuw >> 2
            smaller = 0
            if y_scu > 0:
                if (1 << self.map_logw[y_scu - 1, x_scu]) < cuw:
                    smaller += 1
            if x_scu > 0 and self.cod[y_scu, x_scu - 1]:
                if (1 << self.map_logh[y_scu, x_scu - 1]) < cuh:
                    smaller += 1
            if x_scu + scuw < self.w_scu and self.cod[y_scu, x_scu + scuw]:
                if (1 << self.map_logh[y_scu, x_scu + scuw]) < cuh:
                    smaller += 1
            ctx = min(smaller, 2) + 3 * P.SPLIT_FLAG_CTX[lw - 2][lh - 2]
        else:
            ctx = 0
        sb.encode_bin(sb.ctx.btt_split_flag, ctx,
                      0 if split == P.NO_SPLIT else 1)
        if split == P.NO_SPLIT:
            return split
        split_dir = 1 if split in (P.SPLIT_BI_VER, P.SPLIT_TRI_VER) else 0
        split_typ = 1 if split in (P.SPLIT_TRI_VER, P.SPLIT_TRI_HOR) else 0
        ctx_dir = (lw - lh + 2) if self.tools.cm_init else 0
        if (allow[P.SPLIT_BI_VER] or allow[P.SPLIT_TRI_VER]) and \
                (allow[P.SPLIT_BI_HOR] or allow[P.SPLIT_TRI_HOR]):
            sb.encode_bin(sb.ctx.btt_split_dir, ctx_dir, split_dir)
        if (split_dir and allow[P.SPLIT_BI_VER] and allow[P.SPLIT_TRI_VER]) \
                or (not split_dir and allow[P.SPLIT_BI_HOR]
                    and allow[P.SPLIT_TRI_HOR]):
            sb.encode_bin(sb.ctx.btt_split_type, 0, split_typ)
        return split

    def _enc_suco_flag(self, cuw, cuh, split, bound, parent_suco):
        t = self.tools
        if not t.suco:
            return 0
        if not P.check_suco_cond(cuw, cuh, split, bound, T.CTU_LOG2_B,
                                 0, 4, 2 if t.btt else 2):
            return parent_suco
        sf = int(self.rng.random() < 0.5)
        if t.cm_init:
            ctx = int(np.log2(max(cuw, cuh))) - 2
            ctx = ctx * 2 if cuw == cuh else ctx * 2 + 1
        else:
            ctx = 0
        self.sb.encode_bin(self.sb.ctx.suco_flag, ctx, sf)
        return sf

    # -- CU ---------------------------------------------------------------
    def _cu(self, x, y, log2w, log2h, tree_type=P.TREE_LC,
            mode_cons=P.MODE_CONS_ALL):
        sb = self.sb
        ctx = sb.ctx
        rng = self.rng
        cuw = 1 << log2w
        cuh = 1 << log2h
        x_scu, y_scu = x >> 2, y >> 2
        scuw = cuw >> 2
        scuh = cuh >> 2

        if tree_type == P.TREE_C:
            self._cu_chroma_only(x, y, log2w, log2h)
            return

        is_inter_slice = self.slice_type != T.SLICE_I
        is_b = self.slice_type == T.SLICE_B
        admvp = bool(self.tools.admvp)
        only_intra = mode_cons == P.MODE_CONS_ONLY_INTRA or (
            admvp and cuw == 4 and cuh == 4 and self.is_main)
        only_inter = mode_cons == P.MODE_CONS_ONLY_INTER
        luma_only = tree_type == P.TREE_L
        ctx_skip = ctx_pred = 0
        if self.tools.cm_init and is_inter_slice and not only_intra:
            from xevd_tpu.frame import get_ctx_some_flags
            ctx_skip, ctx_pred = get_ctx_some_flags(
                x_scu, y_scu, scuw, scuh, self.w_scu, self.map_skip,
                self.map_if, self.cod)
        skip = 0
        if is_inter_slice and not only_intra:
            skip = int(rng.random() < 0.3)
            sb.encode_bin(ctx.skip_flag, ctx_skip, skip)

        if skip:
            if admvp:
                mmvd = 0
                if self.tools.mmvd:
                    mmvd = int(rng.random() < 0.4)
                    sb.encode_bin(ctx.mmvd_flag, 0, mmvd)
                aff = 0
                if mmvd:
                    refi, mv = self._enc_mmvd(x_scu, y_scu, cuw, cuh,
                                              log2w, log2h)
                else:
                    if self.tools.affine and cuw >= 8 and cuh >= 8:
                        aff = int(rng.random() < 0.4)
                        sb.encode_bin(ctx.affine_flag,
                                      self._ctx_affine(x_scu, y_scu,
                                                       scuw, scuh), aff)
                    if aff:
                        self._enc_affine_merge(x_scu, y_scu, log2w, log2h,
                                               skip=True)
                        self.map_aff_eco[y_scu:y_scu + scuh,
                                         x_scu:x_scu + scuw] = 1
                    else:
                        refi, mv = self._enc_merge_idx(x_scu, y_scu, cuw,
                                                       cuh)
                if not aff:
                    self._set_inter(x_scu, y_scu, scuw, scuh, refi,
                                    np.array(mv), intra=False, skip=True)
            else:
                mvp_idx = int(rng.integers(0, 4))
                sb.trunc_unary(ctx.mvp_idx, 3, 4, mvp_idx)
                mv0 = self._mvp_candidates(x_scu, y_scu, scuw, 0)[mvp_idx]
                if is_b:
                    mvp_idx1 = int(rng.integers(0, 4))
                    sb.trunc_unary(ctx.mvp_idx, 3, 4, mvp_idx1)
                    mv1 = self._mvp_candidates(x_scu, y_scu, scuw, 1)[mvp_idx1]
                    self._set_inter(x_scu, y_scu, scuw, scuh, [0, 0],
                                    np.array([mv0, mv1]), intra=False,
                                    skip=True)
                else:
                    self._set_inter(x_scu, y_scu, scuw, scuh, [0, -1],
                                    np.array([mv0, [0, 0]]), intra=False,
                                    skip=True)
            self.map_logw[y_scu:y_scu + scuh, x_scu:x_scu + scuw] = log2w
            self.map_logh[y_scu:y_scu + scuh, x_scu:x_scu + scuw] = log2h
            return

        intra = 1
        if only_inter:
            intra = 0
        elif is_inter_slice and not only_intra:
            intra = int(rng.random() < self.intra_frac)
            sb.encode_bin(ctx.pred_mode, ctx_pred, intra)

        # IBC flag (ref: src_main/xevdm_eco.c:1419-1432): allowed after an
        # INTER pred bin or in only-intra context, never after an INTRA bin
        read_pred_bin = is_inter_slice and not only_intra and not only_inter
        if self.tools.ibc and cuw <= (1 << self.tools.ibc_log_max_size) \
                and cuh <= (1 << self.tools.ibc_log_max_size) \
                and not only_inter and not (read_pred_bin and intra):
            bv = self._pick_ibc_bv(x_scu, y_scu, cuw, cuh)
            ibc = int(bv is not None and not luma_only
                      and self.rng.random() < 0.4)
            ctx_ibc = 0
            if self.tools.cm_init:
                yb = y_scu + scuh - 1
                ci = nn = 0
                for (py, px) in ((y_scu - 1, x_scu), (yb, x_scu - 1),
                                 (yb, x_scu + scuw)):
                    if 0 <= py and 0 <= px < self.w_scu and \
                            self.cod[py, px]:
                        ci += int(self.mm.map_ibc[py, px])
                        nn += 1
                ctx_ibc = min(ci, 1) if nn else 0
            sb.encode_bin(ctx.ibc_flag, ctx_ibc, ibc)
            if ibc:
                for d in range(2):
                    sb.abs_mvd(ctx.mvd, abs(bv[d]))
                    if bv[d]:
                        sb.encode_bin_ep(1 if bv[d] < 0 else 0)
                ys_, xs_ = slice(y_scu, y_scu + scuh), \
                    slice(x_scu, x_scu + scuw)
                self.map_if[ys_, xs_] = 0
                self.map_skip[ys_, xs_] = 0
                self.map_refi[ys_, xs_] = -1
                self.map_mv[ys_, xs_] = np.asarray(
                    [[bv[0], bv[1]], [0, 0]], np.int16)
                self.cod[ys_, xs_] = 1
                self.mm.map_ibc[ys_, xs_] = 1
                cbf = self._enc_cbf(intra=False, no_cbf=False)
                if cbf[0]:
                    self._enc_coef_block(log2w, log2h, 0)
                if cbf[1] or cbf[2]:
                    if cbf[1]:
                        self._enc_coef_block(log2w - 1, log2h - 1, 1)
                    if cbf[2]:
                        self._enc_coef_block(log2w - 1, log2h - 1, 1)
                self.map_logw[ys_, xs_] = log2w
                self.map_logh[ys_, xs_] = log2h
                return

        if not intra and admvp:
            mvr_idx = 0
            if self.tools.amvr:
                mvr_idx = int(rng.choice([0, 0, 1, 2, 3, 4]))
                sb.trunc_unary(ctx.mvr_idx, 5, 5, mvr_idx)
            merge = 0
            if mvr_idx == 0:
                merge = int(rng.random() < 0.3)
                sb.encode_bin(ctx.merge_mode_flag, 0, merge)
            if merge:
                mmvd = 0
                if self.tools.mmvd:
                    mmvd = int(rng.random() < 0.4)
                    sb.encode_bin(ctx.mmvd_flag, 0, mmvd)
                aff = 0
                if mmvd:
                    refi, mv = self._enc_mmvd(x_scu, y_scu, cuw, cuh,
                                              log2w, log2h)
                else:
                    if self.tools.affine and cuw >= 8 and cuh >= 8:
                        aff = int(rng.random() < 0.4)
                        sb.encode_bin(ctx.affine_flag,
                                      self._ctx_affine(x_scu, y_scu,
                                                       scuw, scuh), aff)
                    if aff:
                        self._enc_affine_merge(x_scu, y_scu, log2w, log2h,
                                               skip=False)
                        self.map_aff_eco[y_scu:y_scu + scuh,
                                         x_scu:x_scu + scuw] = 1
                    else:
                        refi, mv = self._enc_merge_idx(x_scu, y_scu, cuw,
                                                       cuh)
                if not aff:
                    self._set_inter(x_scu, y_scu, scuw, scuh, refi,
                                    np.array(mv), intra=False, skip=False)
                cbf = self._enc_cbf(intra=False, no_cbf=True)
            else:
                refi, mv = self._enc_inter_admvp(x_scu, y_scu, cuw, cuh,
                                                 mvr_idx)
                if refi is not None:
                    self._set_inter(x_scu, y_scu, scuw, scuh, refi,
                                    np.array(mv), intra=False, skip=False)
                cbf = self._enc_cbf(intra=False, no_cbf=False)
        elif not intra:
            direct = 0
            if is_b:
                direct = int(rng.random() < 0.3)
                sb.encode_bin(ctx.direct_mode_flag, 0, direct)
            if direct:
                # temporal direct: decoder derives MVs; mirror via derive
                from xevd_tpu.derive import _mv_dir
                scup_co = (y_scu + scuh - 1, x_scu + scuw - 1)
                mv0, mv1 = _mv_dir(self.refp, self.poc, scup_co)
                self._set_inter(x_scu, y_scu, scuw, scuh, [0, 0],
                                np.array([mv0, mv1]), intra=False, skip=False)
                cbf = self._enc_cbf(intra=False, no_cbf=False)
            else:
                if is_b:
                    inter_dir = int(rng.choice([T.PRED_L0, T.PRED_L1,
                                                T.PRED_BI]))
                    if inter_dir == T.PRED_BI:
                        sb.encode_bin(ctx.inter_dir, 0, 0)
                    else:
                        sb.encode_bin(ctx.inter_dir, 0, 1)
                        sb.encode_bin(ctx.inter_dir, 1,
                                      1 if inter_dir == T.PRED_L1 else 0)
                else:
                    inter_dir = T.PRED_L0
                refi_out = [-1, -1]
                mv_out = np.zeros((2, 2), np.int32)
                for lidx in range(2):
                    if not (((inter_dir + 1) >> lidx) & 1):
                        continue
                    nrefp = self.num_refp if lidx == 0 else self.num_refp1
                    refi = int(rng.integers(0, nrefp))
                    self._enc_refi(refi, nrefp)
                    mvp_idx = int(rng.integers(0, 4))
                    sb.trunc_unary(ctx.mvp_idx, 3, 4, mvp_idx)
                    mvd = (int(rng.integers(-32, 33)),
                           int(rng.integers(-32, 33)))
                    for d in range(2):
                        sb.abs_mvd(ctx.mvd, abs(mvd[d]))
                        if mvd[d]:
                            sb.encode_bin_ep(1 if mvd[d] < 0 else 0)
                    mvp = self._mvp_candidates(x_scu, y_scu, scuw, lidx)
                    mv_out[lidx] = ((int(mvp[mvp_idx][0]) + mvd[0]) & 0xFFFF,
                                    (int(mvp[mvp_idx][1]) + mvd[1]) & 0xFFFF)
                    mv_out[lidx] = np.where(mv_out[lidx] >= 0x8000,
                                            mv_out[lidx] - 0x10000,
                                            mv_out[lidx])
                    refi_out[lidx] = refi
                self._set_inter(x_scu, y_scu, scuw, scuh, refi_out, mv_out,
                                intra=False, skip=False)
                cbf = self._enc_cbf(intra=False, no_cbf=False)
        else:
            if self.tools.eipd:
                ipm = self._enc_intra_dir_main(x_scu, y_scu, cuw, cuh)
                if not luma_only:
                    ipm_c = self._enc_intra_dir_c(ipm)
            else:
                ipm = int(rng.integers(0, 5))
                self._enc_intra_dir(ipm, x_scu, y_scu)
            self._set_intra(x_scu, y_scu, scuw, scuh, ipm)
            cbf = self._enc_cbf(intra=True, no_cbf=False,
                                luma_only=luma_only)

        # ATS syntax (mirror of frame._decode_coef ordering)
        ats_inter = 0
        if self.tools.ats:
            if intra and cbf[0] and log2w <= 5 and log2h <= 5:
                ats_cu = int(rng.random() < 0.5)
                sb.encode_bin_ep(ats_cu)
                if ats_cu:
                    sb.encode_bin(ctx.ats_mode, 0, int(rng.random() < 0.5))
                    sb.encode_bin(ctx.ats_mode, 0, int(rng.random() < 0.5))
            elif not intra:
                avail = T.check_ats_inter_avail(cuw, cuh, 1, 1)
                if avail and any(cbf):
                    ats_inter = self._enc_ats_inter(log2w, log2h, avail)

        # coefficients, Y then U then V (ref: src_base/xevd_eco.c:676-733)
        if cbf[0]:
            ltw, lth = T.ats_inter_tu_size(ats_inter, log2w, log2h)
            self._enc_coef_block(ltw, lth, 0)
        if cbf[1] or cbf[2]:
            ltw, lth = T.ats_inter_tu_size(ats_inter, log2w - 1, log2h - 1)
            if cbf[1]:
                self._enc_coef_block(ltw, lth, 1)
            if cbf[2]:
                self._enc_coef_block(ltw, lth, 1)

        self.cod[y_scu:y_scu + scuh, x_scu:x_scu + scuw] = 1
        self.map_logw[y_scu:y_scu + scuh, x_scu:x_scu + scuw] = log2w
        self.map_logh[y_scu:y_scu + scuh, x_scu:x_scu + scuw] = log2h

    def _pick_ibc_bv(self, x_scu, y_scu, cuw, cuh):
        """A block vector whose source rect is fully inside the
        already-coded area (integer-pel, SCU-aligned candidates)."""
        scuw, scuh = cuw >> 2, cuh >> 2
        cands = [(-cuw, 0), (0, -cuh), (-cuw, -cuh), (-2 * cuw, 0),
                 (0, -2 * cuh)]
        for k in self.rng.permutation(len(cands)):
            bvx, bvy = cands[int(k)]
            sx, sy = (x_scu * 4 + bvx) >> 2, (y_scu * 4 + bvy) >> 2
            if sx < 0 or sy < 0:
                continue
            if sx + scuw > self.w_scu or sy + scuh > self.h_scu:
                continue
            if self.cod[sy:sy + scuh, sx:sx + scuw].all():
                return (bvx, bvy)
        return None

    def _ctx_affine(self, x_scu, y_scu, scuw, scuh):
        # mirror of frame.EntropyDecoder._ctx_flags affine count
        if not self.tools.cm_init:
            return 0
        yb = y_scu + scuh - 1
        ca = 0
        n = 0
        for (py, px) in ((y_scu - 1, x_scu), (yb, x_scu - 1),
                         (yb, x_scu + scuw)):
            if 0 <= py and 0 <= px < self.w_scu and self.cod[py, px]:
                ca += int(self.map_aff_eco[py, px])
                n += 1
        if n == 0:
            return 0
        return min(ca, 1)

    def _apply_affine(self, x_scu, y_scu, log2w, log2h, refi, ac_mv2,
                      vertex, skip):
        """Common affine CU state update: sub-block motion field, affine
        geometry maps, HMVP center entry (mirror of derive.py)."""
        from xevd_tpu import affine as AF
        scuw, scuh = (1 << log2w) >> 2, (1 << log2h) >> 2
        ys = slice(y_scu, y_scu + scuh)
        xs = slice(x_scu, x_scu + scuw)
        self.map_if[ys, xs] = 0
        self.map_skip[ys, xs] = 1 if skip else 0
        self.cod[ys, xs] = 1
        AF.set_affine_mvf(self.mm, x_scu, y_scu, log2w, log2h, refi,
                          ac_mv2, vertex)
        self.am.set_cu(x_scu, y_scu, scuw, scuh, vertex - 1, log2w, log2h)
        if self.tools.hmvp:
            refi_sp, mv_sp, any_valid = AF.affine_center_mv(
                ac_mv2, refi, log2w, log2h, vertex)
            self.mm.history_update(refi_sp, mv_sp, valid=any_valid)

    def _enc_affine_merge(self, x_scu, y_scu, log2w, log2h, skip):
        """Affine merge: encode the merge idx, apply the candidate."""
        from xevd_tpu import affine as AF
        sb = self.sb
        cuw, cuh = 1 << log2w, 1 << log2h
        mrg = int(self.rng.integers(0, AF.AFF_MAX_CAND))
        sb.trunc_unary(sb.ctx.affine_mrg, 5, 5, mrg)
        lr = self.mm.avail_lr(x_scu, y_scu, cuw >> 2)
        refi_l, cpmv_l, cp_num = AF.get_affine_merge_candidate(
            self.poc, self.slice_type, self.mm, self.am, self.refp,
            x_scu, y_scu, cuw, cuh, lr, self.sh_mirror, T.CTU_LOG2_B)
        vertex = cp_num[mrg]
        refi = [refi_l[mrg][0], refi_l[mrg][1]]
        ac_mv2 = [[list(v) for v in cpmv_l[mrg][l]] for l in range(2)]
        for l in range(2):
            if refi[l] < 0:
                ac_mv2[l] = [[0, 0], [0, 0], [0, 0]]
        self._apply_affine(x_scu, y_scu, log2w, log2h, refi, ac_mv2,
                           vertex, skip)

    def _enc_affine_amvp(self, x_scu, y_scu, log2w, log2h, inter_dir):
        """Affine AMVP: affine_mode + per-list refi/mvp/mvds; applies the
        resulting CPMVs (mirror of src_main/xevdm.c:978-1021)."""
        from xevd_tpu import affine as AF
        sb = self.sb
        ctx = sb.ctx
        rng = self.rng
        cuw, cuh = 1 << log2w, 1 << log2h
        mode_bit = int(rng.random() < 0.5)
        sb.encode_bin(ctx.affine_mode, 0, mode_bit)
        vertex = 2 + mode_bit
        refi_out = [-1, -1]
        ac_mv2 = [[[0, 0], [0, 0], [0, 0]] for _ in range(2)]
        for lidx in range(2):
            if not (((inter_dir + 1) >> lidx) & 1):
                continue
            nrefp = self.num_refp if lidx == 0 else self.num_refp1
            refi = int(rng.integers(0, nrefp))
            self._enc_refi(refi, nrefp)
            mvp_i = int(rng.integers(0, AF.AFF_MAX_NUM_MVP))
            sb.trunc_unary(ctx.affine_mvp_idx, 1, 2, mvp_i)
            bzero = int(rng.random() < 0.3)
            sb.encode_bin(ctx.affine_mvd_flag, lidx, bzero)
            mvds = []
            for v in range(vertex):
                if bzero:
                    mvds.append((0, 0))
                else:
                    mvd = (int(rng.integers(-16, 17)),
                           int(rng.integers(-16, 17)))
                    for d in range(2):
                        sb.abs_mvd(ctx.mvd, abs(mvd[d]))
                        if mvd[d]:
                            sb.encode_bin_ep(1 if mvd[d] < 0 else 0)
                    mvds.append(mvd)
            lr = self.mm.avail_lr(x_scu, y_scu, cuw >> 2)
            mvp_a = AF.get_affine_motion_scaling(
                self.poc, self.mm, self.am, x_scu, y_scu, lidx, refi,
                nrefp, self.refp, cuw, cuh, vertex, T.CTU_LOG2_B)
            mp = [list(v) for v in mvp_a[mvp_i]]
            for v in range(vertex):
                mvd0x = mvds[0][0] if v > 0 else 0
                mvd0y = mvds[0][1] if v > 0 else 0
                ac_mv2[lidx][v] = [_s16v(mp[v][0] + mvd0x + mvds[v][0]),
                                   _s16v(mp[v][1] + mvd0y + mvds[v][1])]
            refi_out[lidx] = refi
        self._apply_affine(x_scu, y_scu, log2w, log2h, refi_out, ac_mv2,
                           vertex, skip=False)
        return vertex

    def _enc_merge_idx(self, x_scu, y_scu, cuw, cuh):
        """Choose + encode a merge index; returns the resulting (refi, mv)
        via the shared merge-list derivation."""
        from xevd_tpu.motion import get_motion_merge_main
        sb = self.sb
        max_cand = 4 if cuw * cuh <= 32 else 6
        midx = int(self.rng.integers(0, max_cand))
        sb.trunc_unary(sb.ctx.merge_idx, 5, 6, midx)
        lr = self.mm.avail_lr(x_scu, y_scu, cuw >> 2)
        refi_l, mvp_l = get_motion_merge_main(
            self.poc, self.slice_type, self.mm, self.refp, x_scu, y_scu,
            cuw, cuh, lr, self.sh_mirror, T.CTU_LOG2_B)
        refi = [refi_l[0][midx], refi_l[1][midx]]
        mv = [list(mvp_l[0][midx]), list(mvp_l[1][midx])]
        if self.slice_type == T.SLICE_P:
            refi[1] = -1
            mv[1] = [0, 0]
        return refi, mv

    def _enc_mmvd(self, x_scu, y_scu, cuw, cuh, log2w, log2h):
        """Choose + encode an MMVD index (mirror of frame._read_mmvd_data);
        returns the derived (refi, mv)."""
        from xevd_tpu.motion import get_mmvd_motion
        sb = self.sb
        ctx = sb.ctx
        rng = self.rng
        small_cu = cuw * cuh <= 32
        group = 0 if small_cu else int(rng.integers(0, 3))
        base = int(rng.integers(0, 4))
        dist = int(rng.integers(0, 8))
        dirx = int(rng.integers(0, 4))
        idx = group * 128 + base * 32 + dist * 4 + dirx
        type_ = (self.mmvd_group_enable
                 and not ((1 << (log2w + log2h)) <= 32))
        if type_:
            sb.encode_bin(ctx.mmvd_group_idx, 0, 1 if group else 0)
            if group:
                sb.encode_bin(ctx.mmvd_group_idx, 1, group - 1)
        else:
            idx = base * 32 + dist * 4 + dirx  # group forced 0
        sb.trunc_unary(ctx.mmvd_merge_idx, 3, 4, base)
        sb.trunc_unary(ctx.mmvd_distance_idx, 7, 8, dist)
        sb.encode_bin(ctx.mmvd_direction_idx, 0, (dirx >> 1) & 1)
        sb.encode_bin(ctx.mmvd_direction_idx, 1, dirx & 1)
        lr = self.mm.avail_lr(x_scu, y_scu, cuw >> 2)
        nrefp = (self.num_refp, self.num_refp1)
        refi, mv = get_mmvd_motion(idx, self.poc, self.slice_type, self.mm,
                                   self.refp, nrefp, x_scu, y_scu, cuw, cuh,
                                   lr, self.sh_mirror, T.CTU_LOG2_B)
        if self.slice_type == T.SLICE_P:
            refi[1] = -1
            mv[1] = [0, 0]
        return refi, mv

    def _enc_inter_admvp(self, x_scu, y_scu, cuw, cuh, mvr_idx=0):
        """Non-merge ADMVP inter CU: inter_dir, bi_idx, refi, mvd."""
        from xevd_tpu.motion import (check_bi_applicability, get_first_refi,
                                     get_motion_from_mvr)
        sb = self.sb
        ctx = sb.ctx
        rng = self.rng
        is_b = self.slice_type == T.SLICE_B
        if is_b:
            inter_dir = int(rng.choice([T.PRED_L0, T.PRED_L1, T.PRED_BI]))
            bi_ok = check_bi_applicability(self.slice_type, cuw, cuh)
            if not bi_ok and inter_dir == T.PRED_BI:
                inter_dir = T.PRED_L0
            if inter_dir == T.PRED_BI:
                sb.encode_bin(ctx.inter_dir, 0, 0)
            else:
                if bi_ok:
                    sb.encode_bin(ctx.inter_dir, 0, 1)
                sb.encode_bin(ctx.inter_dir, 1,
                              1 if inter_dir == T.PRED_L1 else 0)
        else:
            inter_dir = T.PRED_L0
        if self.tools.affine and cuw >= 16 and cuh >= 16 and mvr_idx == 0:
            x_s, y_s = x_scu, y_scu
            scuw_, scuh_ = cuw >> 2, cuh >> 2
            aff = int(rng.random() < 0.4)
            sb.encode_bin(ctx.affine_flag,
                          self._ctx_affine(x_s, y_s, scuw_, scuh_), aff)
            if aff:
                import math
                log2w = int(math.log2(cuw))
                log2h = int(math.log2(cuh))
                vertex = self._enc_affine_amvp(x_s, y_s, log2w, log2h,
                                               inter_dir)
                self.map_aff_eco[y_s:y_s + scuh_, x_s:x_s + scuw_] = \
                    vertex - 1
                return None, None
        bi = 0
        if inter_dir == T.PRED_BI:
            bi = int(rng.choice([1, 1, 2, 3]))  # BI_NORMAL twice as likely
            v = bi - 1
            sb.encode_bin(ctx.bi_idx, 0, 1 if v == 0 else 0)
            if v != 0:
                sb.encode_bin(ctx.bi_idx, 1, 1 if v == 1 else 0)
        lr = self.mm.avail_lr(x_scu, y_scu, cuw >> 2)
        hmvp = bool(self.tools.hmvp)
        refi_out = [-1, -1]
        mv_out = [[0, 0], [0, 0]]
        for lidx in range(2):
            if not (((inter_dir + 1) >> lidx) & 1):
                continue
            nrefp = self.num_refp if lidx == 0 else self.num_refp1
            if bi in (2, 3):
                refi = get_first_refi(self.mm, x_scu, y_scu, cuw, cuh,
                                      lidx, mvr_idx, lr, hmvp)
            else:
                refi = int(rng.integers(0, nrefp))
                self._enc_refi(refi, nrefp)
            if bi != 2 + lidx:
                mvd = (int(rng.integers(-32, 33)), int(rng.integers(-32, 33)))
                for d in range(2):
                    sb.abs_mvd(ctx.mvd, abs(mvd[d]))
                    if mvd[d]:
                        sb.encode_bin_ep(1 if mvd[d] < 0 else 0)
            else:
                mvd = (0, 0)
            mvp0 = get_motion_from_mvr(mvr_idx, self.poc, self.mm, x_scu,
                                       y_scu, lidx, refi, nrefp, self.refp,
                                       cuw, cuh, lr, hmvp)
            mv_out[lidx] = [_s16v(mvp0[0] + (mvd[0] << mvr_idx)),
                            _s16v(mvp0[1] + (mvd[1] << mvr_idx))]
            refi_out[lidx] = refi
        return refi_out, mv_out

    def _enc_intra_dir_main(self, x_scu, y_scu, cuw, cuh):
        """EIPD luma mode: pick a decodable mode at random, then encode it
        (mirror of xevd_eco_intra_dir, ref: src_base/xevd_eco.c:842-879)."""
        from xevd_tpu.frame import get_mpm_main
        sb = self.sb
        ctx = sb.ctx
        mpm, mpm_ext, pims = get_mpm_main(
            x_scu, y_scu, cuw, cuh, self.map_if, self.map_ipm, self.cod,
            self.w_scu)
        decodable = list(dict.fromkeys(list(mpm) + list(mpm_ext) + pims[10:]))
        ipm = int(self.rng.choice(decodable))
        if ipm in mpm:
            sb.encode_bin(ctx.intra_luma_pred_mpm_flag, 0, 1)
            sb.encode_bin(ctx.intra_luma_pred_mpm_idx, 0, mpm.index(ipm))
            return ipm
        sb.encode_bin(ctx.intra_luma_pred_mpm_flag, 0, 0)
        if ipm in mpm_ext:
            sb.encode_bin_ep(1)
            sb.encode_bins_ep(mpm_ext.index(ipm), 3)
            return ipm
        sb.encode_bin_ep(0)
        rem = pims.index(ipm) - 10
        # truncated binary, 23 symbols: val 16, b 7
        if rem < 9:
            sb.encode_bins_ep(rem, 4)
        else:
            t = rem + 9
            sb.encode_bins_ep(t >> 1, 4)
            sb.encode_bin_ep(t & 1)
        return ipm

    def _enc_intra_dir_c(self, ipm_l):
        """EIPD chroma mode encoder (mirror of xevd_eco_intra_dir_c)."""
        CONV = {12: 4, 24: 3, 0: 2, 2: 1}   # VER->VER_C HOR->HOR_C DC BI
        conv = CONV.get(ipm_l)
        sb = self.sb
        rng = self.rng
        # candidate chroma modes: DM always; others except conv
        cands = [0] + [c for c in range(1, 5) if c != conv]
        ipm_c = int(rng.choice(cands))
        if ipm_c == 0:
            sb.encode_bin(sb.ctx.intra_chroma_pred_mode, 0, 1)
            return 0
        sb.encode_bin(sb.ctx.intra_chroma_pred_mode, 0, 0)
        u = ipm_c - 1
        if conv is not None and ipm_c > conv:
            u -= 1
        sb.unary_ep(4, u)
        return ipm_c

    def _enc_intra_dir(self, ipm, x_scu, y_scu):
        ipm_l = ipm_u = 0
        if x_scu > 0 and self.map_if[y_scu, x_scu - 1] and self.cod[y_scu, x_scu - 1]:
            ipm_l = int(self.map_ipm[y_scu, x_scu - 1]) + 1
        if y_scu > 0 and self.map_if[y_scu - 1, x_scu] and self.cod[y_scu - 1, x_scu]:
            ipm_u = int(self.map_ipm[y_scu - 1, x_scu]) + 1
        t0 = int(T.MPM_B[ipm_l][ipm_u][ipm])
        self.sb.unary(self.sb.ctx.intra_dir, 0, 2, t0)

    def _enc_refi(self, refi, num_refp):
        if num_refp > 1:
            self.sb.encode_bin(self.sb.ctx.refi, 0, 1 if refi > 0 else 0)
            if refi > 0 and num_refp > 2:
                self.sb.encode_bin(self.sb.ctx.refi, 1, 1 if refi > 1 else 0)
                if refi > 1:
                    for r in range(2, num_refp - 1):
                        self.sb.encode_bin_ep(1 if refi > r else 0)

    def _cu_chroma_only(self, x, y, log2w, log2h):
        """TREE_C dual-tree unit: chroma intra dir + chroma coefficients
        (mirror of the decoder's TREE_C path)."""
        sb = self.sb
        rng = self.rng
        x_scu, y_scu = x >> 2, y >> 2
        scuw, scuh = (1 << log2w) >> 2, (1 << log2h) >> 2
        yc = y_scu + (scuh >> 1)
        xc = x_scu + (scuw >> 1)
        if self.tools.eipd:
            if self.map_if[yc, xc]:
                ipm = int(self.map_ipm[yc, xc])
            else:
                ipm = 0
            self._enc_intra_dir_c(ipm)
        cbf = [int(rng.random() < self.density * 0.6),
               int(rng.random() < self.density * 0.6)]
        sb.encode_bin(sb.ctx.cbf_cb, 0, cbf[0])
        sb.encode_bin(sb.ctx.cbf_cr, 0, cbf[1])
        if cbf[0]:
            self._enc_coef_block(log2w - 1, log2h - 1, 1)
        if cbf[1]:
            self._enc_coef_block(log2w - 1, log2h - 1, 1)

    def _enc_ats_inter(self, log2w, log2h, avail):
        """Choose + encode ats_inter_info (mirror of
        frame._read_ats_inter_info)."""
        sb = self.sb
        ctx = sb.ctx
        rng = self.rng
        mode_vert = avail & 1
        mode_hori = (avail >> 1) & 1
        mode_vert_quad = (avail >> 2) & 1
        mode_hori_quad = (avail >> 3) & 1
        cands = [(q, h) for q in (0, 1) for h in (0, 1)
                 if (q and (mode_hori_quad if h else mode_vert_quad))
                 or (not q and (mode_hori if h else mode_vert))]
        flag = int(rng.random() < 0.5) if cands else 0
        cm = bool(self.tools.cm_init)
        ctx_f = (0 if log2w + log2h >= 8 else 1) if cm else 0
        sb.encode_bin(ctx.ats_cu_inter_flag, ctx_f, flag)
        if not flag:
            return 0
        quad, hor = cands[int(rng.integers(0, len(cands)))]
        pos = int(rng.random() < 0.5)
        if (mode_vert_quad or mode_hori_quad) and (mode_vert or mode_hori):
            sb.encode_bin(ctx.ats_cu_inter_quad_flag, 0, quad)
        if (quad and mode_vert_quad and mode_hori_quad) or \
                (not quad and mode_vert and mode_hori):
            ctx_h = ((0 if log2w == log2h else (1 if log2w < log2h else 2))
                     if cm else 0)
            sb.encode_bin(ctx.ats_cu_inter_hor_flag, ctx_h, hor)
        sb.encode_bin(ctx.ats_cu_inter_pos_flag, 0, pos)
        idx = (2 if quad else 0) + (1 if hor else 0) + 1
        return idx + (pos << 4)

    def _enc_cbf(self, intra, no_cbf, luma_only=False):
        rng = self.rng
        d = self.density
        cbf = [int(rng.random() < d), int(rng.random() < d * 0.6),
               int(rng.random() < d * 0.6)]
        if luma_only:
            cbf[1] = cbf[2] = 0
            self.sb.encode_bin(self.sb.ctx.cbf_luma, 0, cbf[0])
            return cbf
        ctx = self.sb.ctx
        if not intra:
            if not no_cbf:
                allc = 1 if any(cbf) else 0
                self.sb.encode_bin(ctx.cbf_all, 0, allc)
                if not allc:
                    return [0, 0, 0]
                # must have at least one set
                if not any(cbf):
                    cbf[0] = 1
            self.sb.encode_bin(ctx.cbf_cb, 0, cbf[1])
            self.sb.encode_bin(ctx.cbf_cr, 0, cbf[2])
            if cbf[1] + cbf[2] == 0:
                cbf[0] = 1  # inferred
            else:
                self.sb.encode_bin(ctx.cbf_luma, 0, cbf[0])
        else:
            self.sb.encode_bin(ctx.cbf_cb, 0, cbf[1])
            self.sb.encode_bin(ctx.cbf_cr, 0, cbf[2])
            self.sb.encode_bin(ctx.cbf_luma, 0, cbf[0])
        return cbf

    def _enc_coef_block(self, log2w, log2h, ch_type):
        if self.tools.adcc:
            return self._enc_coef_adcc(log2w, log2h, ch_type)
        return self._enc_coef_rl(log2w, log2h, ch_type)

    def _level_cap(self):
        """Keep dequantized magnitudes within a realistic range: the
        reference binary's SIMD transform paths overflow 32-bit lanes on
        coefficient levels a real encoder can never produce (dequant output
        beyond the transform dynamic range)."""
        from xevd_tpu.ops.ref_numpy import qp_scale
        scale = qp_scale(self.qp, bool(self.tools.iqt))
        return max(1, min(23, (16384 << 1) // scale))

    def _coef_position_pool(self, log2w, log2h):
        """Candidate nonzero raster positions.  With tool_iqt the reference
        binary's AVX 64-point inverse transform ignores frequencies >= 32
        (encoder zero-out assumption, src_main/avx/xevdm_itdq_avx.c:1147),
        so restrict accordingly to stay within the oracle's domain."""
        w, h = 1 << log2w, 1 << log2h
        if self.tools.iqt and (w == 64 or h == 64):
            xs = np.arange(w * h) % w
            ys = np.arange(w * h) // w
            return np.nonzero((xs < min(w, 32)) & (ys < min(h, 32)))[0]
        return np.arange(w * h)

    def _enc_coef_adcc(self, log2w, log2h, ch_type):
        """Random coefficients in ADCC form — exact mirror of
        frame._read_coef_adcc (ref: src_main/xevdm_eco.c:492-693)."""
        from xevd_tpu.frame import adcc_ctx_gtx, adcc_ctx_sig, adcc_rice_para
        rng = self.rng
        sb = self.sb
        width, height = 1 << log2w, 1 << log2h
        n = width * height
        # random sparse block
        target = np.zeros(n, np.int32)
        pool = self._coef_position_pool(log2w, log2h)
        nnz = int(rng.integers(1, max(2, len(pool) // 4)))
        ppos = rng.choice(pool, size=min(nnz, len(pool)), replace=False)
        nnz = len(ppos)
        cap = self._level_cap()
        mag = rng.integers(1, cap + 1, size=nnz)
        big = rng.random(nnz) < 0.15
        mag = np.minimum(np.where(big, mag * 8, mag), cap)
        sign = rng.integers(0, 2, size=nnz)
        target[ppos] = np.where(sign, -mag, mag)

        scan = T.SCAN_TBL[(log2w, log2h)]
        scan_inv = T.INV_SCAN_TBL[(log2w, log2h)]
        cm = bool(self.tools.cm_init)
        # last significant position in scan order
        nz_scan = sorted(int(scan_inv[p]) for p in np.nonzero(target)[0])
        scan_pos_last = nz_scan[-1]
        last_blk = int(scan[scan_pos_last])
        last_x, last_y = last_blk % width, last_blk // width
        self._enc_last_pos_xy(last_x, last_y, log2w, log2h, ch_type)

        log2_block = min(log2w, log2h)
        if cm:
            offset0 = 0 if log2_block <= 2 else \
                T.NUM_CTX_SIG_COEFF_LUMA_TU << min(1, log2_block - 3)
            sig_base = offset0 if ch_type == 0 else T.NUM_CTX_SIG_COEFF_LUMA
            gtx_base = 0 if ch_type == 0 else T.NUM_CTX_GTX_LUMA
        else:
            sig_base = 0 if ch_type == 0 else 1
            gtx_base = 0 if ch_type == 0 else 1
        cm_sig = sb.ctx.sig_coeff_flag
        cm_gtx = sb.ctx.coeff_abs_level_greaterAB_flag

        num_coeff = scan_pos_last + 1
        last_scan_set = (num_coeff - 1) >> T.LOG2_CG_SIZE
        coef = [0] * n                     # decoder-state mirror
        ipos = scan_pos_last
        is_last_nz = False
        pos_last = 0
        ctx_gtA = ctx_gtB = 0
        for sub_set in range(last_scan_set, -1, -1):
            sub_pos = sub_set << T.LOG2_CG_SIZE
            pos = []
            while ipos >= sub_pos:
                blkpos = int(scan[ipos])
                sig = 1 if target[blkpos] else 0
                if ipos != scan_pos_last:
                    ctx_sig = adcc_ctx_sig(coef, blkpos, width, height,
                                           ch_type) if cm else 0
                    sb.encode_bin(cm_sig, sig_base + ctx_sig, sig)
                coef[blkpos] = sig
                if sig:
                    pos.append(blkpos)
                    if not is_last_nz:
                        pos_last = blkpos
                        is_last_nz = True
                ipos -= 1
            num_nz = len(pos)
            if num_nz == 0:
                continue
            abs_coef = [1] * num_nz
            escape = False
            first_c2 = -1
            for idx in range(min(num_nz, T.CAFLAG_NUMBER)):
                if pos[idx] != pos_last:
                    ctx_gtA = adcc_ctx_gtx(coef, pos[idx], width, height,
                                           ch_type, 1) if cm else 0
                gtA = 1 if abs(int(target[pos[idx]])) > 1 else 0
                sb.encode_bin(cm_gtx, gtx_base + ctx_gtA, gtA)
                coef[pos[idx]] += gtA
                abs_coef[idx] = gtA + 1
                if gtA:
                    if first_c2 == -1:
                        first_c2 = idx
                    else:
                        escape = True
            if first_c2 != -1:
                if pos[first_c2] != pos_last:
                    ctx_gtB = adcc_ctx_gtx(coef, pos[first_c2], width,
                                           height, ch_type, 2) if cm else 0
                gtB = 1 if abs(int(target[pos[first_c2]])) > 2 else 0
                sb.encode_bin(cm_gtx, gtx_base + ctx_gtB, gtB)
                coef[pos[first_c2]] += gtB
                abs_coef[first_c2] = gtB + 2
                if gtB:
                    escape = True
            escape = escape or (num_nz > T.CAFLAG_NUMBER)
            if escape:
                first2 = 1
                for idx in range(num_nz):
                    base_level = (2 + first2) if idx < T.CAFLAG_NUMBER else 1
                    tgt = abs(int(target[pos[idx]]))
                    if abs_coef[idx] >= base_level:
                        # decoder reads a remainder here; it must reproduce
                        # the target magnitude
                        assert tgt >= base_level or tgt == abs_coef[idx], \
                            (tgt, abs_coef[idx], base_level)
                        rparam = adcc_rice_para(coef, pos[idx], width,
                                                height, base_level)
                        self._enc_remain_exgolomb(tgt - base_level, rparam)
                        coef[pos[idx]] = tgt
                        abs_coef[idx] = tgt
                    if abs_coef[idx] >= 2:
                        first2 = 0
            signs = 0
            for idx in range(num_nz):
                s = 1 if target[pos[idx]] < 0 else 0
                signs = (signs << 1) | s
            sb.encode_bins_ep(signs, num_nz)
            for idx in range(num_nz):
                v = abs_coef[idx]
                coef[pos[idx]] = -v if target[pos[idx]] < 0 else v

    def _enc_last_pos_xy(self, last_x, last_y, log2w, log2h, ch_type):
        """Mirror of frame._read_last_pos_xy."""
        sb = self.sb
        width, height = 1 << log2w, 1 << log2h
        cm = bool(self.tools.cm_init)
        base = 0 if ch_type == 0 else (T.NUM_CTX_LAST_SIG_COEFF_LUMA
                                       if cm else 11)
        if cm:
            off_x, off_y, sh_x, sh_y = T.adcc_last_pos_ctx_para(
                ch_type, width, height)
        else:
            off_x = off_y = sh_x = sh_y = 0
        gx = T.ADCC_GROUP_IDX[last_x]
        gy = T.ADCC_GROUP_IDX[last_y]
        for pos in range(gx):
            sb.encode_bin(sb.ctx.last_sig_coeff_x_prefix,
                          base + off_x + (pos >> sh_x), 1)
        if gx < T.ADCC_GROUP_IDX[width - 1]:
            sb.encode_bin(sb.ctx.last_sig_coeff_x_prefix,
                          base + off_x + (gx >> sh_x), 0)
        for pos in range(gy):
            sb.encode_bin(sb.ctx.last_sig_coeff_y_prefix,
                          base + off_y + (pos >> sh_y), 1)
        if gy < T.ADCC_GROUP_IDX[height - 1]:
            sb.encode_bin(sb.ctx.last_sig_coeff_y_prefix,
                          base + off_y + (gy >> sh_y), 0)
        if gx > 3:
            cnt = (gx - 2) >> 1
            sb.encode_bins_ep(last_x - T.ADCC_MIN_IN_GROUP[gx], cnt)
        if gy > 3:
            cnt = (gy - 2) >> 1
            sb.encode_bins_ep(last_y - T.ADCC_MIN_IN_GROUP[gy], cnt)

    def _enc_remain_exgolomb(self, symbol, rparam):
        """Mirror of frame._read_remain_exgolomb."""
        sb = self.sb
        rng_ = T.ADCC_GO_RICE_RANGE[rparam]
        if symbol < (rng_ << rparam):
            prefix = symbol >> rparam
            for _ in range(prefix):
                sb.encode_bin_ep(1)
            sb.encode_bin_ep(0)
            if rparam:
                sb.encode_bins_ep(symbol & ((1 << rparam) - 1), rparam)
            return
        prefix = rng_
        while True:
            base = (((1 << (prefix - rng_)) + rng_ - 1) << rparam)
            width = prefix - rng_ + rparam
            if symbol < base + (1 << width):
                break
            prefix += 1
        for _ in range(prefix):
            sb.encode_bin_ep(1)
        sb.encode_bin_ep(0)
        if width:
            sb.encode_bins_ep(symbol - base, width)

    def _enc_coef_rl(self, log2w, log2h, ch_type):
        """Random sparse levels in zigzag run/level form."""
        rng = self.rng
        n = 1 << (log2w + log2h)
        pool_raster = self._coef_position_pool(log2w, log2h)
        scanp = T.SCAN_TBL[(log2w, log2h)]
        ok = np.zeros(n, bool)
        ok[pool_raster] = True
        pool_scan = np.nonzero(ok[scanp])[0]   # scan positions within pool
        nnz = max(1, int(rng.integers(1, max(2, len(pool_scan) // 4))))
        nnz_positions = sorted(rng.choice(
            pool_scan, size=min(nnz, len(pool_scan)), replace=False))
        sb = self.sb
        ctx = sb.ctx
        cm = bool(self.tools.cm_init)
        ctx_last = 0 if ch_type == 0 else 1
        prev = -1
        prev_level = 6
        for j, pos in enumerate(nnz_positions):
            if cm:  # ref: src_main/xevdm_eco.c:319
                t0 = (min(prev_level - 1, 5) << 1) + (0 if ch_type == 0 else 12)
            else:
                t0 = 0 if ch_type == 0 else 2
            run = pos - prev - 1
            sb.unary(ctx.run, t0, 2, run)
            level = int(rng.integers(1, self._level_cap() + 1))
            prev_level = level
            sb.unary(ctx.level, t0, 2, level - 1)
            sb.encode_bin_ep(int(rng.random() < 0.5))
            prev = pos
            if pos >= n - 1:
                break
            last = 1 if j == len(nnz_positions) - 1 else 0
            sb.encode_bin(ctx.last, ctx_last, last)

    # -- motion bookkeeping (mirror of derive.py) -------------------------
    def _mvp_candidates(self, x_scu, y_scu, scuw, lidx):
        mvp = np.ones((4, 2), np.int32)
        avail_le = x_scu > 0 and not self.map_if[y_scu, x_scu - 1] and \
            self.cod[y_scu, x_scu - 1]
        if avail_le:
            mvp[0] = self.map_mv[y_scu, x_scu - 1, lidx]
        if y_scu > 0:
            if not self.map_if[y_scu - 1, x_scu]:
                mvp[1] = self.map_mv[y_scu - 1, x_scu, lidx]
            if x_scu + scuw < self.w_scu and self.cod[y_scu - 1, x_scu + scuw] \
                    and not self.map_if[y_scu - 1, x_scu + scuw]:
                mvp[2] = self.map_mv[y_scu - 1, x_scu + scuw, lidx]
        if self.refp is not None and self.refp[0][lidx] is not None:
            mvp[3] = self.refp[0][lidx].map_mv[y_scu, x_scu, 0]
        elif self.prev_maps is not None and lidx == 0:
            mvp[3] = self.prev_maps[y_scu, x_scu, 0]
        else:
            mvp[3] = 0
        return mvp

    def _set_inter(self, x_scu, y_scu, scuw, scuh, refi, mv, intra, skip):
        ys = slice(y_scu, y_scu + scuh)
        xs = slice(x_scu, x_scu + scuw)
        self.map_if[ys, xs] = 0
        self.map_skip[ys, xs] = 1 if skip else 0
        self.map_refi[ys, xs, 0] = refi[0]
        self.map_refi[ys, xs, 1] = refi[1]
        self.map_mv[ys, xs] = np.asarray(mv, np.int16)
        self.cod[ys, xs] = 1
        if self.tools.hmvp:
            mva = np.asarray(mv, np.int64)
            self.mm.history_update(refi, mva)

    def _set_intra(self, x_scu, y_scu, scuw, scuh, ipm):
        ys = slice(y_scu, y_scu + scuh)
        xs = slice(x_scu, x_scu + scuw)
        self.map_if[ys, xs] = 1
        self.map_skip[ys, xs] = 0
        self.map_ipm[ys, xs] = ipm
        self.map_refi[ys, xs] = -1
        self.map_mv[ys, xs] = 0


def encode_stream(w, h, n_frames=1, qp=30, seed=0, gop="I",
                  density=0.5, idr_period=0, bd=8, profile=0,
                  tools=None, intra_frac=0.35) -> bytes:
    """Generate a stream.

    gop: 'I' all-intra, 'IPPP' low-delay P, 'RA' hierarchical B
    (sub-GOP 4: tids [0,1,2,2], POCs [+4,+2,+1,+3]).
    Uses the decoder's own PictureManager/POC derivation to mirror
    reference-list construction exactly; the reference binary remains
    the conformance oracle.
    """
    from xevd_tpu.dpb import PictureManager, Picture, RefPicView
    from xevd_tpu.decoder import Poc, poc_derivation
    from xevd_tpu.syntax import Sps as _Sps

    rng = np.random.default_rng(seed)
    tools = tools or Tools()
    log2_sub_gop = 2 if gop == "RA" else 0
    out = write_sps(w, h, bd=bd, max_num_ref_pics=2,
                    log2_sub_gop_length=log2_sub_gop, profile=profile,
                    tools=tools)
    out += write_pps(dra_aps_id=0 if tools.dra else None)
    if tools.dra:
        out += write_aps_dra(0, rng,
                             num_ranges=int(rng.integers(4, 9)),
                             equal=bool(rng.random() < 0.5))
    if tools.alf:
        # a spread of ALF APS configurations, referenced round-robin
        out += write_aps_alf(0, rng, num_filters=4, filter_type=1)
        out += write_aps_alf(1, rng, num_filters=1, filter_type=0,
                             fixed_pattern=1)
        out += write_aps_alf(2, rng, num_filters=6, filter_type=1,
                             fixed_pattern=2, coeff_delta=True)
        out += write_aps_alf(3, rng, num_filters=3, filter_type=1,
                             delta_pred=True)

    sps = _Sps()
    sps.log2_sub_gop_length = log2_sub_gop
    h_scu, w_scu = (h + 3) >> 2, (w + 3) >> 2

    pm = PictureManager(2)
    poc = Poc()
    last_intra_poc = 0

    # (slice_type, tid) decode-order schedule
    sched = []
    if gop == "I":
        sched = [(T.SLICE_I, 0)] * n_frames
    elif gop == "IPPP":
        sched = [(T.SLICE_I, 0)] + [(T.SLICE_P, 0)] * (n_frames - 1)
    else:  # RA
        # Only complete sub-GOPs: truncating mid-pattern leaves POC holes
        # (e.g. anchor poc 8 without 5..7), and the reference app's bumping
        # drain (xevdm_picman_out_pic poc_next_output) then spins forever
        # at EOF.  Real encoders close the GOP; we round the frame count up
        # to the next sub-GOP boundary instead.
        sched = [(T.SLICE_I, 0)]
        pat = [(T.SLICE_P, 0), (T.SLICE_B, 1), (T.SLICE_B, 2), (T.SLICE_B, 2)]
        while len(sched) < n_frames:
            sched += pat

    for f, (st, tid) in enumerate(sched):
        is_idr = st == T.SLICE_I and (f == 0 or (idr_period and f % idr_period == 0))
        if f > 0 and st == T.SLICE_I:
            is_idr = True
        nut = T.NUT_IDR if is_idr else T.NUT_NONIDR
        if poc.poc_val > poc.prev_pic_max_poc_val:
            poc.prev_pic_max_poc_val = poc.poc_val
        if is_idr:
            poc.prev_doc_offset = -1
            poc.prev_poc_val = 0
            poc.poc_val = 0
        else:
            poc_derivation(sps, tid, poc)
        slice_ref_flag = tid == 0 or tid < log2_sub_gop
        if st == T.SLICE_I:
            last_intra_poc = poc.poc_val

        if tools.pocs:
            slice_ref_flag = True
        # RPL mode: signal the legacy-heuristic lists explicitly, plus a
        # keep-list (all currently marked pictures) as extra entries so the
        # decoder's RPL marking tracks the encoder's legacy-marked DPB
        refp = pm.refp_init(st, poc.poc_val, tid, last_intra_poc)
        num_refp = tuple(pm.num_refp)
        rpl0 = rpl1 = None
        active_num = None
        if tools.rpl and st != T.SLICE_I:
            l0 = [poc.poc_val - refp[i][0].poc for i in range(num_refp[0])]
            l1 = [poc.poc_val - refp[i][1].poc for i in range(num_refp[1])]
            listed = {poc.poc_val - d for d in l0} | \
                     {poc.poc_val - d for d in l1}
            extras = [poc.poc_val - p.poc for p in pm.pic
                      if p is not None and p.is_ref and p.poc not in listed]
            rpl0 = l0 + extras
            rpl1 = l1
            active_num = (max(num_refp[0], 1), max(num_refp[1], 1))
        elif tools.rpl:
            rpl0, rpl1 = [], []

        mmvd_grp = 1 if tools.mmvd else 0
        alf = None
        if tools.alf:
            # exercise frame-level off, all-on and per-CTU map paths,
            # varied APS configs and chroma idcs
            r = rng.random()
            if r < 0.8:
                alf = {"aps_id_y": int(rng.integers(0, 4)),
                       "is_ctb": int(rng.random() < 0.5),
                       "chroma_idc": int(rng.integers(0, 4)),
                       "aps_id_ch": int(rng.integers(0, 4))}
        sh = write_sh(st, qp, nut, tools=tools, mmvd_group=mmvd_grp,
                      alf=alf, poc_lsb=poc.poc_val, rpl0=rpl0, rpl1=rpl1,
                      active_num=active_num)
        fe = FrameEncoder(w, h, st, qp, rng, num_refp=num_refp[0],
                          density=density, intra_frac=intra_frac,
                          refp=refp, num_refp1=num_refp[1],
                          poc=poc.poc_val, tools=tools,
                          main=profile in (1, 3),
                          mmvd_group_enable=mmvd_grp if st != T.SLICE_I
                          else 0)
        fe.alf_ctb_bins = bool(alf and alf["is_ctb"])
        payload = fe.encode()
        out += _nalu(sh, nut, tid, payload)

        pic = Picture(w=w, h=h)
        pic.map_mv = fe.map_mv.copy()
        pic.map_refi = fe.map_refi.copy()
        if tools.dmvr:
            # DMVR refines MVs from reconstructed pixels, which this
            # syntax-level encoder does not track; an embedded decoder
            # supplies the refined motion field the next frames' TMVP
            # must see (ref: xevdm_util.c map_mv<-dmvr_mv, :4325-4333)
            from xevd_tpu import info as _nal_info
            from xevd_tpu.decoder import Decoder as _Dec
            if not hasattr(pm, "_emb_dec"):
                pm._emb_dec = _Dec()
                pm._emb_pos = 0
            while pm._emb_pos + 4 <= len(out):
                ln, _, _ = _nal_info(out[pm._emb_pos:pm._emb_pos + 6])
                pm._emb_dec.decode(
                    out[pm._emb_pos + 4:pm._emb_pos + 4 + ln])
                pm._emb_pos += 4 + ln
                while True:
                    f_out, _st = pm._emb_dec.pull()
                    if f_out is None:
                        break
            pic.map_mv = pm._emb_dec.last_pic.map_mv.copy()
        pm.put_pic(pic, is_idr, poc.poc_val, tid, True, refp,
                   slice_ref_flag, 1 << 0)
        # release bumped outputs so DPB slots recycle
        while True:
            p_out, status = pm.out_pic()
            if p_out is None:
                break
    return out



def picture_signature_sei(md5_digests) -> bytes:
    """SEI NALU with payload_type 0x10: per-plane MD5
    (ref: src_base/xevd_eco.c:1652-1665)."""
    bw = BitWriter()
    bw.write(0x10, 8)          # payload_type
    bw.write(16, 8)            # payload_size (per plane)
    for dig in md5_digests:
        for b in dig:
            bw.write(b, 8)
    bw.write(0x80, 8)          # rbsp trailing byte
    return _nalu(bw, T.NUT_SEI)


def add_signatures(stream: bytes) -> bytes:
    """Decode `stream` with xevd_tpu and interleave picture-signature SEIs
    after each slice NALU (matching decode order)."""
    import hashlib
    from xevd_tpu.decoder import Decoder
    from xevd_tpu import info as nal_info
    dec = Decoder()
    out = b""
    pos = 0
    sigs = []
    frames_in_order = {}
    # first pass: decode to get per-frame planes in DECODE order
    chunks = []
    while pos + 4 <= len(stream):
        ln, _, _ = nal_info(stream[pos:pos + 6])
        chunk = stream[pos:pos + 4 + ln]
        nalu = stream[pos + 4:pos + 4 + ln]
        pos += 4 + ln
        st = dec.decode(nalu)
        sig = None
        if st.fnum >= 0:
            pic = dec.last_pic
            import numpy as np
            pad, pad_c = pic.pad_l, pic.pad_c
            digs = []
            y = np.asarray(pic.y[pad:pad + pic.h, pad:pad + pic.w])
            digs.append(hashlib.md5(np.ascontiguousarray(
                y.astype("<u2")).tobytes()).digest())
            for pl in (pic.u, pic.v):
                c = np.asarray(pl[pad_c:pad_c + (pic.h >> 1),
                                  pad_c:pad_c + (pic.w >> 1)])
                digs.append(hashlib.md5(np.ascontiguousarray(
                    c.astype("<u2")).tobytes()).digest())
            sig = picture_signature_sei(digs)
        chunks.append((chunk, sig))
        while dec.pull()[0] is not None:
            pass
    for chunk, sig in chunks:
        out += chunk
        if sig:
            out += sig
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-o", "--output", required=True)
    ap.add_argument("-W", "--width", type=int, default=64)
    ap.add_argument("-H", "--height", type=int, default=64)
    ap.add_argument("-n", "--frames", type=int, default=1)
    ap.add_argument("-q", "--qp", type=int, default=30)
    ap.add_argument("-s", "--seed", type=int, default=0)
    ap.add_argument("-g", "--gop", default="I", choices=["I", "IPPP", "RA"])
    ap.add_argument("-b", "--bitdepth", type=int, default=8)
    ap.add_argument("-p", "--profile", type=int, default=0,
                    help="0=baseline, 1=main")
    ap.add_argument("-t", "--tools", default="",
                    help="comma list of main tools to enable, e.g. eipd,adcc")
    args = ap.parse_args()
    tools = Tools(**{k: 1 for k in args.tools.split(",") if k})
    if tools.ats and not tools.iqt:
        tools.iqt = 1      # SPS signals ATS under tool_iqt
    if tools.adcc and not tools.cm_init:
        tools.cm_init = 1  # SPS signals ADCC under tool_cm_init
    data = encode_stream(args.width, args.height, args.frames, args.qp,
                         args.seed, args.gop, bd=args.bitdepth,
                         profile=args.profile, tools=tools)
    Path(args.output).write_bytes(data)
    print(f"wrote {args.output}: {len(data)} bytes")


if __name__ == "__main__":
    main()
