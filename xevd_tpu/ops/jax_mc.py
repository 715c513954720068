"""Batched fractional-pel motion compensation in JAX (TPU path).

Blocks are bucketed host-side by (size, filter-case); each bucket is a
single batched kernel: a vmapped dynamic-slice window gather from the
stacked padded reference planes, then separable tap filtering with exact
integer semantics matching ops/ref_numpy.mc_luma / mc_chroma
(ref: src_base/xevd_mc.c:169-408).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import tables as T

_MC_L = jnp.asarray(T.MC_L_COEFF, dtype=jnp.int32)   # [16, 8]
_MC_C = jnp.asarray(T.MC_C_COEFF, dtype=jnp.int32)   # [32, 4]
_MC_L_MAIN = jnp.asarray(T.MC_L_COEFF_MAIN, dtype=jnp.int32)
_MC_C_MAIN = jnp.asarray(T.MC_C_COEFF_MAIN, dtype=jnp.int32)

# filter-case ids
CASE_00, CASE_N0, CASE_0N, CASE_NN = 0, 1, 2, 3


def _gather_windows(refs, ref_idx, iy, ix, wh, ww):
    """refs [R, H, W] int16; per-block (ref_idx, iy, ix) -> [N, wh, ww]."""
    def one(r, y, x):
        return jax.lax.dynamic_slice(refs, (r, y, x), (1, wh, ww))[0]
    return jax.vmap(one)(ref_idx, iy, ix)


def _hfilter(win, taps, ntap, w):
    """win [N, H, w+ntap-1] int32, taps [N, ntap] -> [N, H, w] int32."""
    acc = taps[:, 0, None, None] * win[:, :, 0:w]
    for k in range(1, ntap):
        acc = acc + taps[:, k, None, None] * win[:, :, k:k + w]
    return acc


def _vfilter(win, taps, ntap, h):
    acc = taps[:, 0, None, None] * win[:, 0:h, :]
    for k in range(1, ntap):
        acc = acc + taps[:, k, None, None] * win[:, k:k + h, :]
    return acc


@partial(jax.jit, static_argnums=(1, 2, 3, 4, 5, 6))
def mc_bucket(args, case, w, h, bit_depth, is_luma, main_taps=False):
    """One MC bucket.

    args = (refs [R,H,W] int16, ref_idx [N], gmv_x [N], gmv_y [N])
    gmv_* are positions in 1/16-pel (luma) or 1/32-pel (chroma) units
    relative to the padded plane origin.  Returns [N, h, w] int32 pred,
    clipped to [0, 2^bd-1].
    """
    refs, ref_idx, gx, gy = args
    maxv = (1 << bit_depth) - 1
    if is_luma:
        fbits, ntap = 4, 8
        tbl = _MC_L_MAIN if main_taps else _MC_L
    else:
        fbits, ntap = 5, 4
        tbl = _MC_C_MAIN if main_taps else _MC_C
    half = ntap // 2 - 1
    dx = gx & ((1 << fbits) - 1)
    dy = gy & ((1 << fbits) - 1)
    ix = gx >> fbits
    iy = gy >> fbits

    if case == CASE_00:
        win = _gather_windows(refs, ref_idx, iy, ix, h, w)
        return win.astype(jnp.int32)

    if case == CASE_N0:
        win = _gather_windows(refs, ref_idx, iy, ix - half, h, w + ntap - 1)
        acc = _hfilter(win.astype(jnp.int32), tbl[dx], ntap, w)
        return jnp.clip(acc >> 6, 0, maxv)

    if case == CASE_0N:
        win = _gather_windows(refs, ref_idx, iy - half, ix, h + ntap - 1, w)
        acc = _vfilter(win.astype(jnp.int32), tbl[dy], ntap, h)
        return jnp.clip(acc >> 6, 0, maxv)

    # CASE_NN: separable with s16 intermediate truncation
    shift1 = min(4, bit_depth - 8)
    shift2 = max(8, 20 - bit_depth)
    offset2 = 1 << (shift2 - 1)
    win = _gather_windows(refs, ref_idx, iy - half, ix - half,
                          h + ntap - 1, w + ntap - 1)
    buf = _hfilter(win.astype(jnp.int32), tbl[dx], ntap, w)
    buf = (buf >> shift1).astype(jnp.int16).astype(jnp.int32)
    acc = _vfilter(buf, tbl[dy], ntap, h)
    return jnp.clip((acc + offset2) >> shift2, 0, maxv)


@jax.jit
def bi_average(p0, p1):
    """(p0 + p1 + 1) >> 1 (ref: src_base/xevd_mc.c:145-166)."""
    return (p0 + p1 + 1) >> 1
