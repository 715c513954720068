"""ALF as a batched device kernel (TPU path).

The reference fans CTUs across a thread pool (ref: src_main/xevdm_alf.c:
901,1167-1249); on TPU every CTU is independent by construction (each CTU's
local buffer reads the PRE-ALF picture), so the whole filter is one
batched tensor program over [n_ctu, CTU+6, CTU+6] windows: gather windows
-> fix boundary margins (mirror at unavailable sides) -> 4x4 gradient
classification -> per-class 7x7 diamond filter (luma) / 5x5 (chroma) ->
masked scatter back.  Filter math mirrors ops/alf.py (the numpy oracle),
which is golden-tested against the reference binary.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..tables_alf import (ALF_CLASS_TO_FILTER_MAPPING, ALF_FIXED_FILTER_COEF,
                          PATTERN_TO_LARGE_FILTER_5,
                          PATTERN_TO_LARGE_FILTER_7)
from .alf import _ACT_TH, _L_TBL, _TAPS5, _TAPS7, _TRANS_TBL

_ACT_TH_J = jnp.asarray(_ACT_TH)
_TRANS_J = jnp.asarray(_TRANS_TBL)
_L_TBL_J = jnp.asarray(_L_TBL)

M = 3


def _fix_margins(buf, wb, hb, av_l, av_r, av_t, av_b, S):
    """Apply the reference's unavailable-side mirror rules to a gathered
    (S+6, S+6) window (ref: src_main/xevdm_alf.c:1000-1052).  wb/hb and the
    avail flags are traced per CTU; columns first, then full rows."""
    n = S + 2 * M
    rr = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    ccm = jnp.where(~av_l & (cc < M), 2 * M - cc, cc)
    ccm = jnp.where(~av_r & (cc >= M + wb), 2 * (M + wb) - ccm - 2, ccm)
    rrm = jnp.where(~av_t & (rr < M), 2 * M - rr, rr)
    rrm = jnp.where(~av_b & (rr >= M + hb), 2 * (M + hb) - rrm - 2, rrm)
    # side mirrors apply only where the (row-mapped) source row is a CTU
    # interior row; available top/bottom margin rows come straight from the
    # replicated picture, replicate columns included (the reference copies
    # those as full tmpYuv rows — xevdm_alf.c:1028-1052)
    src_interior = (rrm >= M) & (rrm < M + hb)
    ccm = jnp.where(src_interior, ccm, cc)
    rrm = jnp.clip(rrm, 0, n - 1)
    ccm = jnp.clip(ccm, 0, n - 1)
    return buf[rrm, ccm]


def _classify(buf, bd, S):
    """Packed (class<<2)|trans per 4x4 block of an (S+6, S+6) window
    (mirror of ops/alf.classify_block)."""
    pix = buf.astype(jnp.int32)
    G = (S + 4) // 2            # laplacian grid size

    # slice size S+3 (not S+4): the strided grid only needs start+2*(G-1),
    # and a full S+4 block would run past the buffer for dy=+1
    def at(dy, dx):
        return jax.lax.dynamic_slice(
            pix, (M - 2 + dy, M - 2 + dx), (S + 3, S + 3))[::2, ::2]

    def at1(dy, dx):
        return jax.lax.dynamic_slice(
            pix, (M - 1 + dy, M - 2 + dx), (S + 3, S + 3))[::2, ::2]

    a = jnp.abs
    Lv = (a(2 * at(0, 0) - at(-1, 0) - at(1, 0))
          + a(2 * at(0, 1) - at(-1, 1) - at(1, 1))
          + a(2 * at1(0, 0) - at1(-1, 0) - at1(1, 0))
          + a(2 * at1(0, 1) - at1(-1, 1) - at1(1, 1)))
    Lh = (a(2 * at(0, 0) - at(0, 1) - at(0, -1))
          + a(2 * at(0, 1) - at(0, 2) - at(0, 0))
          + a(2 * at1(0, 0) - at1(0, 1) - at1(0, -1))
          + a(2 * at1(0, 1) - at1(0, 2) - at1(0, 0)))
    Ld0 = (a(2 * at(0, 0) - at(-1, -1) - at(1, 1))
           + a(2 * at(0, 1) - at(-1, 0) - at(1, 2))
           + a(2 * at1(0, 0) - at1(-1, -1) - at1(1, 1))
           + a(2 * at1(0, 1) - at1(-1, 0) - at1(1, 2)))
    Ld1 = (a(2 * at(0, 0) - at(1, -1) - at(-1, 1))
           + a(2 * at(0, 1) - at(1, 0) - at(-1, 2))
           + a(2 * at1(0, 0) - at1(1, -1) - at1(-1, 1))
           + a(2 * at1(0, 1) - at1(1, 0) - at1(-1, 2)))

    nb = S // 4

    def bsum(L):
        c = jnp.cumsum(jnp.vstack([jnp.zeros((1, G), L.dtype), L]), 0)
        rows = c[4::2][:nb] - c[0::2][:nb]
        c2 = jnp.cumsum(
            jnp.hstack([jnp.zeros((rows.shape[0], 1), L.dtype), rows]), 1)
        return c2[:, 4::2][:, :nb] - c2[:, 0::2][:, :nb]

    sv = bsum(Lv)
    sh_ = bsum(Lh)
    sd0 = bsum(Ld0)
    sd1 = bsum(Ld1)
    act = jnp.clip((sv + sh_) >> (bd - 2), 0, 15)
    cls = _ACT_TH_J[act]
    hv1 = jnp.maximum(sv, sh_)
    hv0 = jnp.minimum(sv, sh_)
    dir_hv = jnp.where(sv > sh_, 1, 3)
    d1 = jnp.maximum(sd0, sd1)
    d0 = jnp.minimum(sd0, sd1)
    dir_d = jnp.where(sd0 > sd1, 0, 2)
    # wrapping 32-bit products, matching the reference's (overflowing)
    # int arithmetic at 10-bit — see ops/alf.py
    use_d = d1 * hv0 > hv1 * d0
    hvd1 = jnp.where(use_d, d1, hv1)
    hvd0 = jnp.where(use_d, d0, hv0)
    main_dir = jnp.where(use_d, dir_d, dir_hv)
    sec_dir = jnp.where(use_d, dir_hv, dir_d)
    ds = jnp.zeros_like(cls)
    ds = jnp.where(hvd1 > 2 * hvd0, 1, ds)
    ds = jnp.where(hvd1 * 2 > 9 * hvd0, 2, ds)
    cls = jnp.where(ds > 0, cls + (((main_dir & 1) << 1) + ds) * 5, cls)
    trans = _TRANS_J[main_dir * 2 + (sec_dir >> 1)]
    return (cls << 2) | trans


def _filter_luma(buf, cl, coef_final, bd, S):
    trans = cl & 3
    cls = (cl >> 2) & 0x1F
    co = coef_final[cls[..., None], _L_TBL_J[trans]]    # [nb, nb, 13]
    co_px = jnp.repeat(jnp.repeat(co, 4, 0), 4, 1)      # [S, S, 13]
    acc = jnp.zeros((S, S), jnp.int32)
    for i, taps in enumerate(_TAPS7):
        s = jnp.zeros((S, S), jnp.int32)
        for dy, dx in taps:
            s = s + jax.lax.dynamic_slice(
                buf, (M + dy, M + dx), (S, S)).astype(jnp.int32)
        acc += co_px[..., i] * s
    return jnp.clip((acc + 256) >> 9, 0, (1 << bd) - 1)


def _filter_chroma(buf, coef, bd, S):
    acc = jnp.zeros((S, S), jnp.int32)
    for i, taps in enumerate(_TAPS5):
        s = jnp.zeros((S, S), jnp.int32)
        for dy, dx in taps:
            s = s + jax.lax.dynamic_slice(
                buf, (M + dy, M + dx), (S, S)).astype(jnp.int32)
        acc += coef[i] * s
    return jnp.clip((acc + 256) >> 9, 0, (1 << bd) - 1)


def alf_apply(y_area, u_area, v_area, coef_l, coef_c, ctu_on,
              h, w, log2_ctu, enables, bd, across_tiles, chroma):
    """Apply ALF to the unpadded (SCU-rounded) plane areas; pure function.
    enables/(h, w)/log2_ctu/across_tiles static."""
    ctu = 1 << log2_ctu
    n_w = (w + ctu - 1) >> log2_ctu
    n_h = (h + ctu - 1) >> log2_ctu
    N = n_w * n_h
    idx = np.arange(N, dtype=np.int32)
    xs_np = (idx % n_w) << log2_ctu
    ys_np = (idx // n_w) << log2_ctu
    xs = jnp.asarray(xs_np)
    ys = jnp.asarray(ys_np)
    wb = jnp.minimum(ctu, w - xs)
    hb = jnp.minimum(ctu, h - ys)
    av_l = xs > 0
    av_t = ys > 0
    if across_tiles:
        av_r = jnp.ones(N, bool)
        av_b = jnp.ones(N, bool)
    else:
        av_r = (xs + wb) != w
        av_b = (ys + hb) != h

    def run_plane(area, ph, pw, S, filt, shift):
        # replicate-extend; over-pad so partial-CTU windows never clamp
        ext = jnp.pad(area[:ph, :pw],
                      ((M, (n_h << (log2_ctu - shift)) - ph + M + S),
                       (M, (n_w << (log2_ctu - shift)) - pw + M + S)),
                      mode="edge")

        def window(y0, x0):
            return jax.lax.dynamic_slice(ext, (y0, x0),
                                         (S + 2 * M, S + 2 * M))

        bufs = jax.vmap(window)(ys >> shift, xs >> shift)
        bufs = jax.vmap(_fix_margins, in_axes=(0, 0, 0, 0, 0, 0, 0, None))(
            bufs, wb >> shift, hb >> shift, av_l, av_r, av_t, av_b, S)
        vals = filt(bufs)                               # [N, S, S]
        yy = (ys >> shift)[:, None, None] + jax.lax.broadcasted_iota(
            jnp.int32, (1, S, S), 1)
        xx = (xs >> shift)[:, None, None] + jax.lax.broadcasted_iota(
            jnp.int32, (1, S, S), 2)
        jj = jax.lax.broadcasted_iota(jnp.int32, (1, S, S), 1)
        ii = jax.lax.broadcasted_iota(jnp.int32, (1, S, S), 2)
        return vals, yy, xx, ii, jj

    if enables[0]:
        def filt_l(bufs):
            cls = jax.vmap(_classify, in_axes=(0, None, None))(bufs, bd, ctu)
            return jax.vmap(_filter_luma, in_axes=(0, 0, None, None, None))(
                bufs, cls, coef_l, bd, ctu)

        vals, yy, xx, ii, jj = run_plane(y_area, h, w, ctu, filt_l, 0)
        m = ((ii < wb[:, None, None]) & (jj < hb[:, None, None])
             & (ctu_on[:, None, None] > 0))
        yy = jnp.where(m, yy, 1 << 20)
        y_area = y_area.at[yy, xx].set(vals.astype(y_area.dtype),
                                       mode="drop")
    if chroma and (enables[1] or enables[2]):
        for pi, en in ((1, enables[1]), (2, enables[2])):
            if not en:
                continue
            area = u_area if pi == 1 else v_area

            def filt_c(bufs):
                return jax.vmap(_filter_chroma,
                                in_axes=(0, None, None, None))(
                    bufs, coef_c, bd, ctu >> 1)

            vals, yy, xx, ii, jj = run_plane(area, h >> 1, w >> 1,
                                             ctu >> 1, filt_c, 1)
            m = ((ii < (wb >> 1)[:, None, None])
                 & (jj < (hb >> 1)[:, None, None]))
            yy = jnp.where(m, yy, 1 << 20)
            out = area.at[yy, xx].set(vals.astype(area.dtype), mode="drop")
            if pi == 1:
                u_area = out
            else:
                v_area = out
    return y_area, u_area, v_area


def recon_coef_arrays(param, chroma_on):
    """Host: final coefficient arrays for the device kernel (reuses the
    oracle's reconstruction in ops/alf.py)."""
    from .alf import recon_coef_chroma, recon_coef_luma
    cl = recon_coef_luma(param)
    cc = (recon_coef_chroma(param) if chroma_on
          else np.zeros(7, np.int32))
    return cl, cc
