"""Main-profile (EIPD) sequential intra reconstruction as a lax.scan (TPU).

Same architecture as ops/jax_intra.py but for the Main profile: rectangular
CUs, the 33-mode EIPD predictor family (DC/PLANE/BI/angular with LR
right-column support) and dual-tree luma/chroma gating.  Each scan step
rebuilds the Main neighbor arrays (up + left + right columns with per-unit
availability replication, ref: src_main/xevdm_ipred.c:39-148) with
vectorized last-available propagation, evaluates every predictor on a fixed
64x64 (32x32 chroma) tile with exact int32 arithmetic (matching the C
operand widths), selects by ipm, adds the precomputed residual and scatters
the masked tile back.  Validated against ops/ref_numpy_main.py which is
itself ctypes-fuzzed against libxevd.

Angular prediction computes its gather geometry *inside* the kernel from
the Q10/Q5 slope tables (ref: src_base/xevd_ipred.c:377-585) instead of
host-side caching — every (w, h, ipm, avail_lr) combination shares one
traced program.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import tables as T

from .jax_intra import BORDER, PAD_R, plane_with_border  # noqa: F401

_DXDY = jnp.asarray(T.IPRED_DXDY, dtype=jnp.int32)       # [33, 2]
_ADI = jnp.asarray(T.IPRED_ADI, dtype=jnp.int32)         # [32, 4]
_LUTP1 = jnp.asarray([2048, 1365, 819, 455, 241, 124, 63, 32], jnp.int32)
_IBM = jnp.asarray([13, 17, 5, 11, 23, 47], jnp.int32)
_IBS = jnp.asarray([7, 10, 11, 15, 19, 23], jnp.int32)
_WC = jnp.asarray([0, 341, 205, 114, 60, 31], jnp.int32)

LR_00, LR_10, LR_01, LR_11 = 0, 1, 2, 3

_HTDF_TBL = jnp.asarray(T.HTDF_TBL, dtype=jnp.int32)          # [5, 16]
_HTDF_THR_LOG2 = jnp.asarray(T.HTDF_THR_LOG2, dtype=jnp.int32)


def _htdf_read_table(z, tbl_row, thr, shift, rnd):
    """(ref: src_main/xevdm_recon.c:173-187)"""
    v = jnp.abs(z)
    idx = ((v + rnd) & thr) >> shift
    w0 = jnp.where(v < thr, tbl_row[idx], v)
    return jnp.where(z < 0, -w0, w0)


def _step_htdf(rec, x, y, lw, lh, avail, tbl_idx, enabled, bd):
    """Apply HTDF to one luma CU inside the scan
    (ref: src_main/xevdm_recon.c:196-385).  The 1-px ring comes from the
    carried picture plane gated by recon-time availability bits
    (ops/htdf.py HT_*); unavailable sides replicate the block edge.  All
    2x2 hadamard windows are computed batched on a fixed 66x66 tile."""
    S2 = 66
    maxv = (1 << bd) - 1
    w = 1 << lw
    h = 1 << lh
    e0 = jax.lax.dynamic_slice(
        rec, (BORDER + y - 1, BORDER + x - 1), (S2, S2)).astype(jnp.int32)
    rr = jax.lax.broadcasted_iota(jnp.int32, (S2, S2), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (S2, S2), 1)
    LE = (avail & 1) > 0
    RI = (avail & 2) > 0
    UP = (avail & 4) > 0
    UP_LE = (avail & 8) > 0
    UP_RI = (avail & 16) > 0
    LO_LE = (avail & 32) > 0
    LO_RI = (avail & 64) > 0
    rr_idx = jnp.where(rr == 0, jnp.where(UP, 0, 1), jnp.minimum(rr, h))
    cc_idx = jnp.where(cc == 0, jnp.where(LE, 0, 1),
                       jnp.where(cc == w + 1, jnp.where(RI, w + 1, w),
                                 jnp.minimum(cc, w)))
    val = e0[rr_idx, cc_idx]
    c00 = jnp.where(UP_LE, e0[0, 0], e0[1, 1])
    c01 = jnp.where(UP_RI, e0[0, w + 1], e0[1, w])
    c10 = jnp.where(LO_LE, e0[h + 1, 0], e0[h, 1])
    c11 = jnp.where(LO_RI, e0[h + 1, w + 1], e0[h, w])
    val = jnp.where((rr == 0) & (cc == 0), c00, val)
    val = jnp.where((rr == 0) & (cc == w + 1), c01, val)
    val = jnp.where((rr == h + 1) & (cc == 0), c10, val)
    val = jnp.where((rr == h + 1) & (cc == w + 1), c11, val)

    x0 = val[:-1, :-1]
    x1 = val[:-1, 1:]
    x2 = val[1:, :-1]
    x3 = val[1:, 1:]
    y0 = x0 + x2
    y1 = x1 + x3
    y2 = x0 - x2
    y3 = x1 - x3
    t0 = y0 + y1
    t1 = y0 - y1
    t2 = y2 + y3
    t3 = y2 - y3
    ti = jnp.clip(tbl_idx, 0, 4)
    thr_log2 = _HTDF_THR_LOG2[ti]
    shift = thr_log2 - 4
    rnd = (1 << shift) >> 1
    thr = (1 << thr_log2) - (1 << shift)
    tbl_row = _HTDF_TBL[ti]
    z1 = _htdf_read_table(t1, tbl_row, thr, shift, rnd)
    z2 = _htdf_read_table(t2, tbl_row, thr, shift, rnd)
    z3 = _htdf_read_table(t3, tbl_row, thr, shift, rnd)
    iy0 = t0 + z2
    iy1 = z1 + z3
    iy2 = t0 - z2
    iy3 = z1 - z3
    acc = jnp.zeros((S2, S2), jnp.int32)
    acc = acc.at[:-1, :-1].add((iy0 + iy1) >> 2)
    acc = acc.at[:-1, 1:].add((iy0 - iy1) >> 2)
    acc = acc.at[1:, :-1].add((iy2 + iy3) >> 2)
    acc = acc.at[1:, 1:].add((iy2 - iy3) >> 2)
    out = jnp.clip((acc + 2) >> 2, 0, maxv)
    blk = out[1:65, 1:65].astype(rec.dtype)
    old = jax.lax.dynamic_slice(rec, (BORDER + y, BORDER + x), (64, 64))
    ii = jax.lax.broadcasted_iota(jnp.int32, (64, 64), 1)
    jj = jax.lax.broadcasted_iota(jnp.int32, (64, 64), 0)
    m = (ii < w) & (jj < h) & (enabled == 1)
    new = jnp.where(m, blk, old)
    return jax.lax.dynamic_update_slice(rec, new, (BORDER + y, BORDER + x))


def _fill_dir(raw, mask, lg_unit, seed, n):
    """Forward per-unit availability fill (ref: src_main/xevdm_ipred.c
    top/left/right loops): raw int32 [n]; unit u = 1<<lg_unit; mask bit i
    covers raw[i*u:(i+1)*u].  Unavailable units replicate the last pixel of
    the nearest available unit to their left, or `seed` if none."""
    nu = n >> lg_unit
    iu = jax.lax.broadcasted_iota(jnp.int32, (nu,), 0)
    avail = (jax.lax.shift_right_logical(
        jnp.broadcast_to(mask.astype(jnp.uint32), (nu,)), iu.astype(jnp.uint32))
        & 1).astype(jnp.int32)
    lastu = jax.lax.cummax(jnp.where(avail == 1, iu, -1))
    k = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    li = lastu[k >> lg_unit]
    rep = raw[jnp.clip((li << lg_unit) + (1 << lg_unit) - 1, 0, n - 1)]
    own = avail[k >> lg_unit] == 1
    return jnp.where(li < 0, seed, jnp.where(own, raw, rep))


def _get_dc(numer, lw, lh):
    """(ref: src_base/xevd_ipred.c:124-144)"""
    basic = jnp.minimum(lw, lh)
    asp = jnp.abs(lw - lh)
    return (numer * _LUTP1[asp]) >> (basic + 12)   # numer >= 0


def _masked_sum(vals, count):
    k = jax.lax.broadcasted_iota(jnp.int32, vals.shape, 0)
    return jnp.sum(jnp.where(k < count, vals, 0))


def _predict_main(upg, leg, rig, up0, ipm, lw, lh, lr, ii, jj, S, bd):
    """All EIPD predictors on an S x S tile, selected by traced ipm.

    upg/leg/rig: int32 [2S+1] gather buffers with [0] = the C index -1;
    up0 = upg[1:] (the up row from position 0).  lw/lh/lr/ipm traced."""
    w = 1 << lw
    h = 1 << lh
    maxv = (1 << bd) - 1
    right_av = (lr & 2) > 0
    le0 = leg[1:]
    ri0 = rig[1:]

    # ---- VER ----------------------------------------------------------
    ver = up0[ii]

    # ---- HOR (ref: src_main/xevdm_ipred.c:153-196) ----------------------
    vle = le0[jj]
    vri = ri0[jj]
    hor11 = ((vle * (w - ii) + vri * (ii + 1) + (w >> 1)) * _LUTP1[lw]) >> 12
    hor = jnp.where(lr == LR_11, hor11, jnp.where(lr == LR_01, vri, vle))

    # ---- DC (ref: src_main/xevdm_ipred.c:198-229) -----------------------
    s_le = _masked_sum(le0[:2 * S], h)
    s_ri = _masked_sum(ri0[:2 * S], h)
    s_up = _masked_sum(up0[:2 * S], w)
    dc11 = _get_dc(s_le + s_ri + s_up + ((w + h + h) >> 1), lw, lh + 1)
    dc01 = _get_dc(s_ri + s_up + ((w + h) >> 1), lw, lh)
    dc00 = _get_dc(s_le + s_up + ((w + h) >> 1), lw, lh)
    dc = jnp.where(lr == LR_11, dc11, jnp.where(lr == LR_01, dc01, dc00))

    # ---- PLANE (ref: src_base/xevd_ipred.c:163-249) ---------------------
    w2 = w >> 1
    h2 = h >> 1
    kx = jax.lax.broadcasted_iota(jnp.int32, (S,), 0) + 1     # 1..S
    mx = kx <= w2
    my = kx <= h2
    # right branch (up indices stay >= 0; side columns reach index -1)
    ch_r = jnp.sum(jnp.where(mx, kx * (upg[jnp.clip(1 + w2 - kx, 0, 2 * S)]
                                       - upg[jnp.clip(1 + w2 + kx, 0, 2 * S)]),
                             0))
    cv_r = jnp.sum(jnp.where(my, kx * (rig[jnp.clip(h2 + kx, 0, 2 * S)]
                                       - rig[jnp.clip(h2 - kx, 0, 2 * S)]),
                             0))
    a_r = (ri0[h - 1] + up0[0]) << 4
    # left branch: up(w2-1-x) reaches index -1 -> gather via upg
    ch_l = jnp.sum(jnp.where(mx, kx * (upg[jnp.clip(w2 + kx, 0, 2 * S)]
                                       - upg[jnp.clip(w2 - kx, 0, 2 * S)]),
                             0))
    cv_l = jnp.sum(jnp.where(my, kx * (leg[jnp.clip(h2 + kx, 0, 2 * S)]
                                       - leg[jnp.clip(h2 - kx, 0, 2 * S)]),
                             0))
    a_l = (le0[h - 1] + up0[w - 1]) << 4
    coef_h = jnp.where(right_av, ch_r, ch_l)
    coef_v = jnp.where(right_av, cv_r, cv_l)
    a = jnp.where(right_av, a_r, a_l)
    idx_w = jnp.maximum(lw - 2, 0)
    idx_h = jnp.maximum(lh - 2, 0)
    im_h, is_h = _IBM[idx_w], _IBS[idx_w]
    im_v, is_v = _IBM[idx_h], _IBS[idx_h]
    b = ((coef_h << 5) * im_h + (1 << (is_h - 1))) >> is_h
    c = ((coef_v << 5) * im_v + (1 << (is_v - 1))) >> is_v
    temp0 = a - (h2 - 1) * c - (w2 - 1) * b + 16
    steps = jnp.where(right_av, w - 1 - ii, ii)
    plane = jnp.clip((temp0 + jj * c + steps * b) >> 5, 0, maxv)

    # ---- BI (ref: src_base/xevd_ipred.c:251-368) ------------------------
    up_i = up0[ii]
    offset = 1 << (lw + lh)
    ish = jnp.minimum(lw, lh)
    ish_xy = lw + lh + 1
    wc = _WC[jnp.abs(lw - lh)]
    # LR_11
    dst_tmp = ((vle * (w - ii) + vri * (ii + 1) + (w >> 1)) * _LUTP1[lw]) >> 12
    last = jnp.take(dst_tmp, jnp.clip(h - 1, 0, S - 1), axis=0)  # [S]
    tmp11 = (up_i * (h - 1 - jj) + last[None, :] * (jj + 1) + (h >> 1)) >> lh
    bi11 = (dst_tmp + tmp11 + 1) >> 1
    # LR_01
    a01 = upg[0]
    b01 = rig[1 + h]
    # LR_00 / LR_10
    a00 = up0[w]
    b00 = leg[1 + h]
    aa = jnp.where(lr == LR_01, a01, a00)
    bb = jnp.where(lr == LR_01, b01, b00)
    cc = jnp.where(
        lw == lh, (aa + bb + 1) >> 1,
        (((aa << lw) + (bb << lh)) * wc + (1 << (ish + 9))) >> (ish + 10))
    wt = (cc << 1) - aa - bb
    up_s = bb - up_i
    ref_up = (up_i << lh) + (jj + 1) * up_s
    side = jnp.where(lr == LR_01, ri0[jj], le0[jj])
    side_s = aa - side
    kpx = jnp.where(lr == LR_01, w - ii, ii + 1)
    px = (side << lw) + kpx * side_s
    wx = jnp.where(lr == LR_01, (w - 1 - ii), ii) * jj * wt
    bi_lo = jnp.clip(((px << lh) + (ref_up << lw) + wx + offset) >> ish_xy,
                     0, maxv)
    bi = jnp.where(lr == LR_11, bi11, bi_lo)

    # ---- angular (ref: src_base/xevd_ipred.c:377-585) -------------------
    mt = _DXDY[jnp.clip(ipm, 0, 32)]
    m0, m1 = mt[0], mt[1]

    def grp(m, d):
        prod = d * m
        d_out = prod >> 10
        return d_out, (prod >> 5) - (d_out << 5)

    # branch ipm < VER
    tdx1, offa1 = grp(m0, jj + 1)
    tdy1, offb1 = grp(m1, w - ii)
    condr1 = right_av & (ii >= (w - tdx1))
    rp1 = jnp.where(condr1, 2, 0)
    pos1 = jnp.where(condr1, jj - tdy1, ii + tdx1)
    off1 = jnp.where(condr1, offb1, offa1)
    # branch ipm > HOR
    tdyr, offr = grp(m1, w - ii)
    tdxr, offr2 = grp(m0, w - ii)
    condr2 = jj < tdyr
    rp2r = jnp.where(condr2, 0, 2)
    pos2r = jnp.where(condr2, ii + tdxr, jj - tdyr)
    off2r = jnp.where(condr2, offr2, offr)
    tdyl, offl = grp(m1, ii + 1)
    rp2 = jnp.where(right_av, rp2r, 1)
    pos2 = jnp.where(right_av, pos2r, jj + tdyl)
    off2 = jnp.where(right_av, off2r, offl)
    # branch VER < ipm < HOR
    tdy3, offa3 = grp(m1, ii + 1)
    cond31 = jj < tdy3
    tdx3, offb3 = grp(m0, jj + 1)
    tdy3b, offc3 = grp(m1, w - ii)
    is01 = lr == LR_01
    rp3 = jnp.where(cond31, 0, jnp.where(is01, 2, 1))
    pos3 = jnp.where(cond31, ii - tdx3,
                     jnp.where(is01, jj + tdy3b, jj - tdy3))
    off3 = jnp.where(cond31, offb3, jnp.where(is01, offc3, offa3))

    b1 = ipm < T.IPD_VER
    b2 = ipm > T.IPD_HOR
    refpos = jnp.where(b1, rp1, jnp.where(b2, rp2, rp3))
    pos = jnp.where(b1, pos1, jnp.where(b2, pos2, pos3))
    off = jnp.where(b1, off1, jnp.where(b2, off2, off3))

    dxy = jnp.where(b1 | b2, -1, 1)
    flip = jnp.where(refpos == 2, -dxy, dxy)
    asc = flip < 0
    k0 = jnp.where(asc, pos - 1, pos + 1)
    k2 = jnp.where(asc, pos + 1, pos - 1)
    k3 = jnp.where(asc, pos + 2, pos - 2)
    pos_max = w + h - 1
    stride = 2 * S + 1
    flat = jnp.concatenate([upg, leg, rig])

    def gat(k):
        kc = jnp.clip(k, -1, pos_max)
        return flat[refpos * stride + kc + 1]

    filt = _ADI[jnp.clip(off, 0, 31)]                     # [S, S, 4]
    acc = (gat(k0) * filt[..., 0] + gat(pos) * filt[..., 1]
           + gat(k2) * filt[..., 2] + gat(k3) * filt[..., 3])
    ang = jnp.clip((acc + 64) >> 7, 0, maxv)

    pred = jnp.where(
        ipm == T.IPD_VER, ver,
        jnp.where(ipm == T.IPD_HOR, hor,
                  jnp.where(ipm == T.IPD_DC, dc,
                            jnp.where(ipm == T.IPD_PLN, plane,
                                      jnp.where(ipm == T.IPD_BI, bi, ang)))))
    return pred


def _nbr_main(rec, x, y, lw, lh, up_mask, left_mask, right_mask, corner,
              lg_unit, S, bd):
    """Build the (upg, leg, rig) gather buffers for one CU on one plane.

    Mirrors xevdm_get_nbr (ref: src_main/xevdm_ipred.c:39-148).  Only
    up[-1] from the top-left extension is ever consumed by the predictors
    (positions clip to -1), and its value equals the corner pixel when the
    corner unit is available, else the post-fill up[0]."""
    mid = 1 << (bd - 1)
    n = 2 * S
    row = jax.lax.dynamic_slice(
        rec, (BORDER + y - 1, BORDER + x - S), (1, 3 * S))[0].astype(jnp.int32)
    up_raw = row[S:]                                     # rec[y-1, x + t]
    corner_px = row[S - 1]
    col_l = jax.lax.dynamic_slice(
        rec, (BORDER + y, BORDER + x - 1), (n, 1))[:, 0].astype(jnp.int32)
    w = 1 << lw
    col_r = jax.lax.dynamic_slice(
        rec, (BORDER + y, BORDER + x + w), (n, 1))[:, 0].astype(jnp.int32)

    seed_up = jnp.where(corner == 1, corner_px, mid)
    val_up = _fill_dir(up_raw, up_mask, lg_unit, seed_up, n)
    up_m1 = jnp.where(corner == 1, corner_px, val_up[0])
    le = _fill_dir(col_l, left_mask, lg_unit, up_m1, n)
    ri_m1 = val_up[w]
    ri = _fill_dir(col_r, right_mask, lg_unit, ri_m1, n)

    upg = jnp.concatenate([up_m1[None], val_up])
    leg = jnp.concatenate([up_m1[None], le])
    rig = jnp.concatenate([ri_m1[None], ri])
    return upg, leg, rig


def _step_plane_main(rec, resid, x, y, lw, lh, ipm, up_mask, left_mask,
                     right_mask, corner, lr, enabled, lg_unit, S, bd):
    """Reconstruct one intra CU on one plane; returns the updated plane."""
    maxv = (1 << bd) - 1
    upg, leg, rig = _nbr_main(rec, x, y, lw, lh, up_mask, left_mask,
                              right_mask, corner, lg_unit, S, bd)
    ii = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
    jj = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
    pred = _predict_main(upg, leg, rig, upg[1:], ipm, lw, lh, lr, ii, jj,
                         S, bd)
    rblk = jax.lax.dynamic_slice(resid, (BORDER + y, BORDER + x),
                                 (S, S)).astype(jnp.int32)
    t = (pred + rblk).astype(jnp.int16).astype(jnp.int32)
    rec_blk = jnp.clip(t, 0, maxv).astype(rec.dtype)
    old = jax.lax.dynamic_slice(rec, (BORDER + y, BORDER + x), (S, S))
    m = (ii < (1 << lw)) & (jj < (1 << lh)) & (enabled == 1)
    new = jnp.where(m, rec_blk, old)
    return jax.lax.dynamic_update_slice(rec, new, (BORDER + y, BORDER + x))


@partial(jax.jit, static_argnums=(3, 4), donate_argnums=(0,))
def intra_scan_main(planes, resids, cu, bit_depth, chroma):
    """EIPD intra scan.  planes/resids: (y, u, v) bordered int16; cu: dict
    of [N] int32 arrays (x, y, log2w, log2h, ipm, ipm_c, up_mask, left_mask,
    right_mask, corner, lr, tree, valid)."""
    rec_y, rec_u, rec_v = planes
    res_y, res_u, res_v = resids

    has_htdf = "htdf_idx" in cu

    def step(carry, c):
        ry, ru, rv = carry
        x, y, lw, lh = c["x"], c["y"], c["log2w"], c["log2h"]
        intra = c.get("do_intra", c["valid"])
        do_l = jnp.where((c["tree"] != 2) & (c["valid"] == 1)
                         & (intra == 1), 1, 0)
        ry = _step_plane_main(ry, res_y, x, y, lw, lh, c["ipm"],
                              c["up_mask"], c["left_mask"], c["right_mask"],
                              c["corner"], c["lr"], do_l, 2, 64, bit_depth)
        if chroma:
            do_c = jnp.where((c["tree"] != 1) & (c["valid"] == 1)
                             & (intra == 1), 1, 0)
            # chroma mode mapping (ref: src_main/xevdm_ipred.c:267-305)
            ipm, ipm_c = c["ipm"], c["ipm_c"]
            dm_map = jnp.where(
                ipm == T.IPD_VER, T.IPD_VER_C,
                jnp.where(ipm == T.IPD_HOR, T.IPD_HOR_C,
                          jnp.where(ipm == T.IPD_DC, T.IPD_DC_C,
                                    T.IPD_BI_C)))
            mapped = (ipm_c == T.IPD_DM_C) & (
                (ipm == T.IPD_VER) | (ipm == T.IPD_HOR) | (ipm == T.IPD_DC)
                | (ipm == T.IPD_BI))
            ipm_ce = jnp.where(mapped, dm_map, ipm_c)
            # effective angular/named mode on the chroma tile:
            #   DM -> luma ipm (plane or angular); else the *_C constants
            ipm_eff = jnp.where(
                ipm_ce == T.IPD_DM_C, ipm,
                jnp.where(ipm_ce == T.IPD_BI_C, T.IPD_BI,
                          jnp.where(ipm_ce == T.IPD_DC_C, T.IPD_DC,
                                    jnp.where(ipm_ce == T.IPD_HOR_C,
                                              T.IPD_HOR, T.IPD_VER))))
            xc, yc = x >> 1, y >> 1
            ru = _step_plane_main(ru, res_u, xc, yc, lw - 1, lh - 1, ipm_eff,
                                  c["up_mask"], c["left_mask"],
                                  c["right_mask"], c["corner"], c["lr"],
                                  do_c, 1, 32, bit_depth)
            rv = _step_plane_main(rv, res_v, xc, yc, lw - 1, lh - 1, ipm_eff,
                                  c["up_mask"], c["left_mask"],
                                  c["right_mask"], c["corner"], c["lr"],
                                  do_c, 1, 32, bit_depth)
        if has_htdf:
            do_h = jnp.where((c["valid"] == 1) & (c["htdf_idx"] >= 0), 1, 0)
            ry = _step_htdf(ry, x, y, lw, lh, c["htdf_avail"],
                            c["htdf_idx"], do_h, bit_depth)
        return (ry, ru, rv), 0

    (rec_y, rec_u, rec_v), _ = jax.lax.scan(step, (rec_y, rec_u, rec_v), cu)
    return rec_y, rec_u, rec_v


# ---------------------------------------------------------------------------
# Wavefront scan: dependency-leveled batches (ops/wavefront.py computes the
# schedule).  Each lax.scan step processes one level: every CU in the level
# is provably independent, so per-class vmap + one scatter replaces the
# per-CU step — the config-3/4 intra throughput fix.
# ---------------------------------------------------------------------------
def _htdf_tile(rec, x, y, lw, lh, avail, tbl_idx, S, bd):
    """S x S HTDF tile for one CU (body of _step_htdf, parameterized)."""
    S2 = S + 2
    maxv = (1 << bd) - 1
    w = 1 << lw
    h = 1 << lh
    e0 = jax.lax.dynamic_slice(
        rec, (BORDER + y - 1, BORDER + x - 1), (S2, S2)).astype(jnp.int32)
    rr = jax.lax.broadcasted_iota(jnp.int32, (S2, S2), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (S2, S2), 1)
    LE = (avail & 1) > 0
    RI = (avail & 2) > 0
    UP = (avail & 4) > 0
    UP_LE = (avail & 8) > 0
    UP_RI = (avail & 16) > 0
    LO_LE = (avail & 32) > 0
    LO_RI = (avail & 64) > 0
    rr_idx = jnp.where(rr == 0, jnp.where(UP, 0, 1), jnp.minimum(rr, h))
    cc_idx = jnp.where(cc == 0, jnp.where(LE, 0, 1),
                       jnp.where(cc == w + 1, jnp.where(RI, w + 1, w),
                                 jnp.minimum(cc, w)))
    val = e0[rr_idx, cc_idx]
    c00 = jnp.where(UP_LE, e0[0, 0], e0[1, 1])
    c01 = jnp.where(UP_RI, e0[0, w + 1], e0[1, w])
    c10 = jnp.where(LO_LE, e0[h + 1, 0], e0[h, 1])
    c11 = jnp.where(LO_RI, e0[h + 1, w + 1], e0[h, w])
    val = jnp.where((rr == 0) & (cc == 0), c00, val)
    val = jnp.where((rr == 0) & (cc == w + 1), c01, val)
    val = jnp.where((rr == h + 1) & (cc == 0), c10, val)
    val = jnp.where((rr == h + 1) & (cc == w + 1), c11, val)
    x0 = val[:-1, :-1]
    x1 = val[:-1, 1:]
    x2 = val[1:, :-1]
    x3 = val[1:, 1:]
    y0 = x0 + x2
    y1 = x1 + x3
    y2 = x0 - x2
    y3 = x1 - x3
    t0 = y0 + y1
    t1 = y0 - y1
    t2 = y2 + y3
    t3 = y2 - y3
    ti = jnp.clip(tbl_idx, 0, 4)
    thr_log2 = _HTDF_THR_LOG2[ti]
    shift = thr_log2 - 4
    rnd = (1 << shift) >> 1
    thr = (1 << thr_log2) - (1 << shift)
    tbl_row = _HTDF_TBL[ti]
    z1 = _htdf_read_table(t1, tbl_row, thr, shift, rnd)
    z2 = _htdf_read_table(t2, tbl_row, thr, shift, rnd)
    z3 = _htdf_read_table(t3, tbl_row, thr, shift, rnd)
    iy0 = t0 + z2
    iy1 = z1 + z3
    iy2 = t0 - z2
    iy3 = z1 - z3
    acc = jnp.zeros((S2, S2), jnp.int32)
    acc = acc.at[:-1, :-1].add((iy0 + iy1) >> 2)
    acc = acc.at[:-1, 1:].add((iy0 - iy1) >> 2)
    acc = acc.at[1:, :-1].add((iy2 + iy3) >> 2)
    acc = acc.at[1:, 1:].add((iy2 - iy3) >> 2)
    out = jnp.clip((acc + 2) >> 2, 0, maxv)
    return out[1:S + 1, 1:S + 1]


def _tile_idx_vals(plane, tiles, x, y, lw, lh, ok, S):
    """Flat scatter (indices, values) for B S x S tiles; lanes with
    ok == 0 or beyond the CU extent get an out-of-bounds index (dropped
    by the scatter)."""
    B = tiles.shape[0]
    ii = jax.lax.broadcasted_iota(jnp.int32, (B, S, S), 2)
    jj = jax.lax.broadcasted_iota(jnp.int32, (B, S, S), 1)
    okm = (ii < (1 << lw)[:, None, None]) & \
          (jj < (1 << lh)[:, None, None]) & (ok[:, None, None] == 1)
    rows = BORDER + y[:, None, None] + jj
    cols = BORDER + x[:, None, None] + ii
    Wp = plane.shape[1]
    n = plane.shape[0] * Wp
    idx = jnp.where(okm, rows * Wp + cols, jnp.int32(n))  # n -> dropped
    return idx.reshape(-1), tiles.astype(plane.dtype).reshape(-1)


def _scatter_many(plane, pairs):
    """One scatter applying all (idx, vals) pairs to the plane."""
    if not pairs:
        return plane
    idx = jnp.concatenate([p[0] for p in pairs])
    vals = jnp.concatenate([p[1] for p in pairs])
    flat = plane.reshape(-1).at[idx].set(vals, mode="drop")
    return flat.reshape(plane.shape)


def _chroma_ipm_eff(ipm, ipm_c):
    """Effective chroma mode (ref: src_main/xevdm_ipred.c:267-305)."""
    dm_map = jnp.where(
        ipm == T.IPD_VER, T.IPD_VER_C,
        jnp.where(ipm == T.IPD_HOR, T.IPD_HOR_C,
                  jnp.where(ipm == T.IPD_DC, T.IPD_DC_C, T.IPD_BI_C)))
    mapped = (ipm_c == T.IPD_DM_C) & (
        (ipm == T.IPD_VER) | (ipm == T.IPD_HOR) | (ipm == T.IPD_DC)
        | (ipm == T.IPD_BI))
    ipm_ce = jnp.where(mapped, dm_map, ipm_c)
    return jnp.where(
        ipm_ce == T.IPD_DM_C, ipm,
        jnp.where(ipm_ce == T.IPD_BI_C, T.IPD_BI,
                  jnp.where(ipm_ce == T.IPD_DC_C, T.IPD_DC,
                            jnp.where(ipm_ce == T.IPD_HOR_C,
                                      T.IPD_HOR, T.IPD_VER))))


def _pred_tile(rec, resid, x, y, lw, lh, ipm, um, lm, rm, co, lr, lg_unit,
               S, bd):
    maxv = (1 << bd) - 1
    upg, leg, rig = _nbr_main(rec, x, y, lw, lh, um, lm, rm, co, lg_unit,
                              S, bd)
    ii = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
    jj = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
    pred = _predict_main(upg, leg, rig, upg[1:], ipm, lw, lh, lr, ii, jj,
                         S, bd)
    rblk = jax.lax.dynamic_slice(resid, (BORDER + y, BORDER + x),
                                 (S, S)).astype(jnp.int32)
    t = (pred + rblk).astype(jnp.int16).astype(jnp.int32)
    return jnp.clip(t, 0, maxv)


@partial(jax.jit, static_argnums=(3, 4), donate_argnums=(0,))
def intra_scan_wave(planes, resids, groups, bit_depth, chroma):
    """Wavefront EIPD scan.  groups: {tile_S: int32 [L, B_S, ncol]} with
    the same 13/16 column layout as intra_scan_main's icu rows; every
    class shares the level axis L."""
    rec_y, rec_u, rec_v = planes
    res_y, res_u, res_v = resids
    sizes = sorted(groups.keys())
    ncol = next(iter(groups.values())).shape[2]
    has_htdf = ncol > 13

    def cols(a):
        c = {"x": a[:, 0], "y": a[:, 1], "log2w": a[:, 2], "log2h": a[:, 3],
             "ipm": a[:, 4], "ipm_c": a[:, 5], "up_mask": a[:, 6],
             "left_mask": a[:, 7], "right_mask": a[:, 8],
             "corner": a[:, 9], "lr": a[:, 10], "tree": a[:, 11],
             "valid": a[:, 12]}
        if has_htdf:
            c["do_intra"] = a[:, 13]
            c["htdf_idx"] = a[:, 14]
            c["htdf_avail"] = a[:, 15]
        else:
            c["do_intra"] = c["valid"]
        return c

    def step(carry, cs):
        ry, ru, rv = carry
        # phase 1: all prediction tiles from the pre-step planes
        staged = []
        for S in sizes:
            c = cols(cs[S])
            ty = jax.vmap(
                lambda x, y, lw, lh, ipm, um, lm, rm, co, lr:
                _pred_tile(ry, res_y, x, y, lw, lh, ipm, um, lm, rm, co,
                           lr, 2, S, bit_depth)
            )(c["x"], c["y"], c["log2w"], c["log2h"], c["ipm"],
              c["up_mask"], c["left_mask"], c["right_mask"], c["corner"],
              c["lr"])
            tu = tv = None
            if chroma:
                Sc = S >> 1
                ipm_eff = _chroma_ipm_eff(c["ipm"], c["ipm_c"])
                def cpred(res_p, plane):
                    return jax.vmap(
                        lambda x, y, lw, lh, ipm, um, lm, rm, co, lr:
                        _pred_tile(plane, res_p, x, y, lw, lh, ipm, um,
                                   lm, rm, co, lr, 1, Sc, bit_depth)
                    )(c["x"] >> 1, c["y"] >> 1, c["log2w"] - 1,
                      c["log2h"] - 1, ipm_eff, c["up_mask"],
                      c["left_mask"], c["right_mask"], c["corner"],
                      c["lr"])
                tu = cpred(res_u, ru)
                tv = cpred(res_v, rv)
            staged.append((S, c, ty, tu, tv))
        # phase 2: one scatter per plane across all classes
        py_, pu_, pv_ = [], [], []
        for S, c, ty, tu, tv in staged:
            do_l = jnp.where((c["tree"] != 2) & (c["valid"] == 1)
                             & (c["do_intra"] == 1), 1, 0)
            py_.append(_tile_idx_vals(ry, ty, c["x"], c["y"], c["log2w"],
                                      c["log2h"], do_l, S))
            if chroma:
                do_c = jnp.where((c["tree"] != 1) & (c["valid"] == 1)
                                 & (c["do_intra"] == 1), 1, 0)
                pu_.append(_tile_idx_vals(ru, tu, c["x"] >> 1,
                                          c["y"] >> 1, c["log2w"] - 1,
                                          c["log2h"] - 1, do_c, S >> 1))
                pv_.append(_tile_idx_vals(rv, tv, c["x"] >> 1,
                                          c["y"] >> 1, c["log2w"] - 1,
                                          c["log2h"] - 1, do_c, S >> 1))
        ry = _scatter_many(ry, py_)
        if chroma:
            ru = _scatter_many(ru, pu_)
            rv = _scatter_many(rv, pv_)
        # phase 3: HTDF from the post-scatter plane, then one scatter
        if has_htdf:
            ph_ = []
            for S in sizes:
                c = cols(cs[S])
                th = jax.vmap(
                    lambda x, y, lw, lh, av, ti:
                    _htdf_tile(ry, x, y, lw, lh, av, ti, S, bit_depth)
                )(c["x"], c["y"], c["log2w"], c["log2h"],
                  c["htdf_avail"], c["htdf_idx"])
                do_h = jnp.where((c["valid"] == 1) & (c["htdf_idx"] >= 0),
                                 1, 0)
                ph_.append(_tile_idx_vals(ry, th, c["x"], c["y"],
                                          c["log2w"], c["log2h"], do_h, S))
            ry = _scatter_many(ry, ph_)
        return (ry, ru, rv), 0

    (rec_y, rec_u, rec_v), _ = jax.lax.scan(step, (rec_y, rec_u, rec_v),
                                            groups)
    return rec_y, rec_u, rec_v
