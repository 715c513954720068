"""Sequential intra reconstruction as a lax.scan over CUs (TPU path).

Intra prediction of CU n needs reconstructed neighbors of earlier CUs
(ref: src_base/xevd.c:733-744), so whole-frame batching is impossible for
intra content.  The TPU-native form is a `lax.scan` in decode order: each
step gathers the neighbor rows/columns of one CU with dynamic slices,
applies per-unit availability masking, evaluates the 5 baseline predictors
on a fixed 64x64 (32x32 chroma) tile, adds the precomputed residual and
scatters the masked tile back.  Inter CUs were reconstructed beforehand as
one batched pass, so their pixels are already in the carried planes.

Planes carry a border: B pixels top/left, 136 right/bottom, so every
dynamic slice is in-bounds (XLA clamps out-of-range starts, which would
silently skew reads).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

BORDER = 72         # top/left border of carried planes (the Main intra
                    # neighbor row reads reach x-64, ops/jax_intra_main.py)
PAD_R = 136         # right/bottom border

_IOTA64 = None


def plane_with_border(plane: np.ndarray) -> np.ndarray:
    """Embed [H, W] into [B+H+PAD_R, B+W+PAD_R] (host helper)."""
    h, w = plane.shape
    out = np.zeros((BORDER + h + PAD_R, BORDER + w + PAD_R), dtype=plane.dtype)
    out[BORDER:BORDER + h, BORDER:BORDER + w] = plane
    return out


def _predict(up, left, corner, ipm, log2, size, mid):
    """All 5 baseline predictors on a size x size tile, select by ipm.

    up/left: int32 [2*size] masked neighbor arrays; corner scalar.
    (ref: src_base/xevd_ipred.c:95-676)
    """
    ii = jax.lax.broadcasted_iota(jnp.int32, (size, size), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (size, size), 1)
    cuw = 1 << log2
    k1 = jax.lax.broadcasted_iota(jnp.int32, (2 * size,), 0)
    inw = k1 < cuw

    ver = jnp.broadcast_to(up[None, :size], (size, size))
    hor = jnp.broadcast_to(left[:size, None], (size, size))
    dc_val = (jnp.sum(jnp.where(inw, left, 0)) + jnp.sum(jnp.where(inw, up, 0))
              + cuw) >> (log2 + 1)
    dc = jnp.broadcast_to(dc_val, (size, size))
    diag = ii - jj
    ul = jnp.where(
        diag > 0, left[jnp.clip(diag - 1, 0, 2 * size - 1)],
        jnp.where(diag == 0, corner, up[jnp.clip(-diag - 1, 0, 2 * size - 1)]))
    k = jnp.clip(ii + jj + 1, 0, 2 * size - 1)
    ur = (up[k] + left[k]) >> 1

    pred = jnp.where(ipm == 2, ver,
            jnp.where(ipm == 1, hor,
             jnp.where(ipm == 0, dc,
              jnp.where(ipm == 3, ul, ur))))
    return pred


def _step_plane(rec, resid, x, y, log2, ipm, up_mask, left_mask, corner_f,
                valid, size, unit, bit_depth):
    """Process one CU on one plane; returns updated plane."""
    mid = 1 << (bit_depth - 1)
    maxv = (1 << bit_depth) - 1
    n2 = 2 * size
    # neighbor slices: corner + up row / left col
    row = jax.lax.dynamic_slice(rec, (BORDER + y - 1, BORDER + x - 1),
                                (1, n2 + 4))[0]
    col = jax.lax.dynamic_slice(rec, (BORDER + y - 1, BORDER + x - 1),
                                (n2 + 4, 1))[:, 0]
    corner_px = row[0].astype(jnp.int32)
    up_raw = row[1:n2 + 1].astype(jnp.int32)
    left_raw = col[1:n2 + 1].astype(jnp.int32)

    k = jax.lax.broadcasted_iota(jnp.uint32, (n2,), 0)
    units = k // unit
    up_ok = jax.lax.shift_right_logical(
        jnp.broadcast_to(up_mask.astype(jnp.uint32), (n2,)), units) & 1 == 1
    left_ok = jax.lax.shift_right_logical(
        jnp.broadcast_to(left_mask.astype(jnp.uint32), (n2,)), units) & 1 == 1
    up = jnp.where(up_ok, up_raw, mid)
    left = jnp.where(left_ok, left_raw, mid)
    corner = jnp.where(corner_f == 1, corner_px, mid)

    log2c = log2  # caller passes the per-plane log2
    pred = _predict(up, left, corner, ipm, log2c, size, mid)

    rblk = jax.lax.dynamic_slice(resid, (BORDER + y, BORDER + x),
                                 (size, size)).astype(jnp.int32)
    t = (pred + rblk).astype(jnp.int16).astype(jnp.int32)
    rec_blk = jnp.clip(t, 0, maxv).astype(rec.dtype)

    old = jax.lax.dynamic_slice(rec, (BORDER + y, BORDER + x), (size, size))
    ii = jax.lax.broadcasted_iota(jnp.int32, (size, size), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (size, size), 1)
    cuw = 1 << log2c
    m = (ii < cuw) & (jj < cuw) & (valid == 1)
    new = jnp.where(m, rec_blk, old)
    return jax.lax.dynamic_update_slice(rec, new, (BORDER + y, BORDER + x))


@partial(jax.jit, static_argnums=(3, 4), donate_argnums=(0,))
def intra_scan(planes, resids, cu, bit_depth, chroma):
    """planes: (y, u, v) bordered int16; resids likewise; cu: dict of [N]
    int32 arrays (x, y, log2, ipm, up_mask, left_mask, corner, valid)."""
    rec_y, rec_u, rec_v = planes
    res_y, res_u, res_v = resids

    def step(carry, c):
        ry, ru, rv = carry
        x, y, log2, ipm = c["x"], c["y"], c["log2"], c["ipm"]
        upm, lem, cor, valid = (c["up_mask"], c["left_mask"], c["corner"],
                                c["valid"])
        ry = _step_plane(ry, res_y, x, y, log2, ipm, upm, lem, cor, valid,
                         64, 4, bit_depth)
        if chroma:
            ru = _step_plane(ru, res_u, x >> 1, y >> 1, log2 - 1, ipm, upm,
                             lem, cor, valid, 32, 2, bit_depth)
            rv = _step_plane(rv, res_v, x >> 1, y >> 1, log2 - 1, ipm, upm,
                             lem, cor, valid, 32, 2, bit_depth)
        return (ry, ru, rv), 0

    (rec_y, rec_u, rec_v), _ = jax.lax.scan(step, (rec_y, rec_u, rec_v), cu)
    return rec_y, rec_u, rec_v
