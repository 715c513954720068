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

from xevd_tpu import tables as T
from xevd_tpu.bitstream import BitWriter
from xevd_tpu.sbac import SbacCtx


class SbacEnc:
    """Mirror of the SBAC decoder; see xevd_tpu/sbac.py."""

    def __init__(self):
        self.range = 16384
        self.low = 0
        self.shifts = 0
        self.ctx = SbacCtx()

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


def write_sps(w, h, bd=8, max_num_ref_pics=2, qp_table=None) -> bytes:
    bw = BitWriter()
    bw.write_ue(0)            # sps id
    bw.write(0, 8)            # profile baseline
    bw.write(0, 8)            # level
    bw.write(0, 32)           # toolset_idc_h
    bw.write(0, 32)           # toolset_idc_l
    bw.write_ue(1)            # chroma 4:2:0
    bw.write_ue(w)
    bw.write_ue(h)
    bw.write_ue(bd - 8)
    bw.write_ue(bd - 8)
    for _ in range(13):
        bw.write1(0)          # btt,suco,admvp,eipd,cm_init,iqt,addb,alf,htdf,
                              # rpl,pocs,dquant,dra
    bw.write_ue(0)            # log2_sub_gop_length
    bw.write_ue(0)            # log2_ref_pic_gap_length
    bw.write_ue(max_num_ref_pics)
    bw.write1(0)              # cropping
    bw.write1(0)              # chroma qp table present
    bw.write1(0)              # vui
    bw.align()
    return _nalu(bw, T.NUT_SPS)


def write_pps() -> bytes:
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
    bw.write1(0)              # pic_dra
    bw.write1(0)              # arbitrary_slice
    bw.write1(0)              # constrained_intra_pred
    bw.write1(0)              # cu_qp_delta
    bw.align()
    return _nalu(bw, T.NUT_PPS)


def write_sh(slice_type, qp, nut, qp_u_off=0, qp_v_off=0) -> BitWriter:
    bw = BitWriter()
    bw.write_ue(0)            # pps id
    bw.write_ue(slice_type)
    if nut == T.NUT_IDR:
        bw.write1(0)          # no_output_of_prior_pics
    if slice_type != T.SLICE_I:
        bw.write1(0)          # num_ref_idx_active_override
    bw.write1(1)              # deblocking on
    bw.write(qp, 6)
    bw.write_se(qp_u_off)
    bw.write_se(qp_v_off)
    bw.align()
    return bw


class FrameEncoder:
    """Encodes one slice worth of CTUs with random decisions."""

    def __init__(self, w, h, slice_type, qp, rng: np.random.Generator,
                 num_refp=0, prev_maps=None, density=0.5):
        self.w, self.h = w, h
        self.slice_type = slice_type
        self.qp = qp
        self.rng = rng
        self.num_refp = num_refp
        self.sb = SbacEnc()
        self.w_scu = (w + 3) >> 2
        self.h_scu = (h + 3) >> 2
        self.cod = np.zeros((self.h_scu, self.w_scu), np.uint8)
        self.map_if = np.zeros((self.h_scu, self.w_scu), np.uint8)
        self.map_ipm = np.full((self.h_scu, self.w_scu), -1, np.int8)
        self.map_mv = np.zeros((self.h_scu, self.w_scu, 2, 2), np.int16)
        self.map_refi = np.full((self.h_scu, self.w_scu, 2), -1, np.int8)
        self.prev_maps = prev_maps  # (map_mv of refp[0][0]) for TMVP
        self.density = density

    def encode(self) -> bytes:
        ctu = T.CTU_SIZE_B
        for y0 in range(0, self.h, ctu):
            for x0 in range(0, self.w, ctu):
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
            self._cu(x0, y0, log2)

    # -- CU ---------------------------------------------------------------
    def _cu(self, x, y, log2):
        sb = self.sb
        ctx = sb.ctx
        rng = self.rng
        cuw = 1 << log2
        x_scu, y_scu = x >> 2, y >> 2
        scuw = cuw >> 2

        is_inter_slice = self.slice_type != T.SLICE_I
        skip = 0
        if is_inter_slice:
            skip = int(rng.random() < 0.3)
            sb.encode_bin(ctx.skip_flag, 0, skip)

        if skip:
            mvp_idx = int(rng.integers(0, 4))
            sb.trunc_unary(ctx.mvp_idx, 3, 4, mvp_idx)
            if self.slice_type == T.SLICE_B:
                mvp_idx1 = int(rng.integers(0, 4))
                sb.trunc_unary(ctx.mvp_idx, 3, 4, mvp_idx1)
            mvp = self._mvp_candidates(x_scu, y_scu, scuw, 0)
            mv0 = mvp[mvp_idx]
            self._set_inter(x_scu, y_scu, scuw, [0, -1],
                            np.array([mv0, [0, 0]]), intra=False, skip=True)
            return

        intra = 1
        if is_inter_slice:
            intra = int(rng.random() < 0.35)
            sb.encode_bin(ctx.pred_mode, 0, intra)

        if not intra:
            # P: always L0 with refi/mvp/mvd
            refi = int(rng.integers(0, self.num_refp))
            self._enc_refi(refi, self.num_refp)
            mvp_idx = int(rng.integers(0, 4))
            sb.trunc_unary(ctx.mvp_idx, 3, 4, mvp_idx)
            mvd = (int(rng.integers(-32, 33)), int(rng.integers(-32, 33)))
            for d in range(2):
                sb.abs_mvd(ctx.mvd, abs(mvd[d]))
                if mvd[d]:
                    sb.encode_bin_ep(1 if mvd[d] < 0 else 0)
            mvp = self._mvp_candidates(x_scu, y_scu, scuw, 0)
            mv0 = (int(mvp[mvp_idx][0]) + mvd[0], int(mvp[mvp_idx][1]) + mvd[1])
            self._set_inter(x_scu, y_scu, scuw, [refi, -1],
                            np.array([mv0, [0, 0]]), intra=False, skip=False)
            cbf = self._enc_cbf(intra=False, no_cbf=False)
        else:
            ipm = int(rng.integers(0, 5))
            self._enc_intra_dir(ipm, x_scu, y_scu)
            self._set_intra(x_scu, y_scu, scuw, ipm)
            cbf = self._enc_cbf(intra=True, no_cbf=False)

        # coefficients, Y then U then V (ref: src_base/xevd_eco.c:676-733)
        if cbf[0]:
            self._enc_coef_block(log2, 0)
        if cbf[1]:
            self._enc_coef_block(log2 - 1, 1)
        if cbf[2]:
            self._enc_coef_block(log2 - 1, 1)

        self.cod[y_scu:y_scu + scuw, x_scu:x_scu + scuw] = 1

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

    def _enc_cbf(self, intra, no_cbf):
        rng = self.rng
        d = self.density
        cbf = [int(rng.random() < d), int(rng.random() < d * 0.6),
               int(rng.random() < d * 0.6)]
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

    def _enc_coef_block(self, log2, ch_type):
        """Random sparse levels in zigzag run/level form."""
        rng = self.rng
        n = 1 << (2 * log2)
        nnz_positions = sorted(rng.choice(
            n, size=max(1, int(rng.integers(1, max(2, n // 4)))),
            replace=False))
        sb = self.sb
        ctx = sb.ctx
        t0 = 0 if ch_type == 0 else 2
        ctx_last = 0 if ch_type == 0 else 1
        prev = -1
        for j, pos in enumerate(nnz_positions):
            run = pos - prev - 1
            sb.unary(ctx.run, t0, 2, run)
            level = int(rng.integers(1, 24))
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
        if self.prev_maps is not None:
            mvp[3] = self.prev_maps[y_scu, x_scu, 0]
        else:
            mvp[3] = 0
        return mvp

    def _set_inter(self, x_scu, y_scu, scuw, refi, mv, intra, skip):
        ys = slice(y_scu, y_scu + scuw)
        xs = slice(x_scu, x_scu + scuw)
        self.map_if[ys, xs] = 0
        self.map_refi[ys, xs, 0] = refi[0]
        self.map_refi[ys, xs, 1] = refi[1]
        self.map_mv[ys, xs] = np.asarray(mv, np.int16)
        self.cod[ys, xs] = 1

    def _set_intra(self, x_scu, y_scu, scuw, ipm):
        ys = slice(y_scu, y_scu + scuw)
        xs = slice(x_scu, x_scu + scuw)
        self.map_if[ys, xs] = 1
        self.map_ipm[ys, xs] = ipm
        self.map_refi[ys, xs] = -1
        self.map_mv[ys, xs] = 0


def encode_stream(w, h, n_frames=1, qp=30, seed=0, gop="I",
                  density=0.5) -> bytes:
    """Generate a stream: 'I' = all intra, 'IPPP' = first IDR then P."""
    rng = np.random.default_rng(seed)
    out = write_sps(w, h, max_num_ref_pics=2) + write_pps()
    prev_map_mv = None
    map_history = []  # map_mv of decoded pics, most recent first
    for f in range(n_frames):
        if gop == "I" or f == 0:
            st, nut = T.SLICE_I, T.NUT_IDR
            num_refp = 0
        else:
            st, nut = T.SLICE_P, T.NUT_NONIDR
            num_refp = min(2, len(map_history))
        sh = write_sh(st, qp, nut)
        prev = map_history[0] if map_history else None
        fe = FrameEncoder(w, h, st, qp, rng, num_refp=num_refp,
                          prev_maps=prev, density=density)
        payload = fe.encode()
        out += _nalu(sh, nut, 0, payload)
        map_history.insert(0, fe.map_mv.copy())
        map_history = map_history[:5]
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-o", "--output", required=True)
    ap.add_argument("-W", "--width", type=int, default=64)
    ap.add_argument("-H", "--height", type=int, default=64)
    ap.add_argument("-n", "--frames", type=int, default=1)
    ap.add_argument("-q", "--qp", type=int, default=30)
    ap.add_argument("-s", "--seed", type=int, default=0)
    ap.add_argument("-g", "--gop", default="I", choices=["I", "IPPP"])
    args = ap.parse_args()
    data = encode_stream(args.width, args.height, args.frames, args.qp,
                         args.seed, args.gop)
    Path(args.output).write_bytes(data)
    print(f"wrote {args.output}: {len(data)} bytes")


if __name__ == "__main__":
    main()
