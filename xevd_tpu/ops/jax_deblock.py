"""Deblocking filter in JAX (TPU path).

Two frame passes, matching the reference driver order: vertical edges
first, then horizontal edges (ref: src_base/xevd.c:1918-1976).  Luma edges
are >=4 px apart and each filter touches +-2 px, so every luma pass is one
fully vectorized tensor op over a [H, W/4, 4] view — no sequential
dependencies.  Chroma (4:2:0) edges are 2 px apart, so adjacent edges
cascade; those run as a lax.scan over edge columns/rows, each step
vectorized over the whole orthogonal dimension.

Strength maps (per SCU, 0 = no filtering) are derived on the host
(derive.py) from the final mode/mv/ref maps.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _div_trunc(a, d_log2):
    """C-style truncating division by 2^d_log2."""
    q = jnp.abs(a) >> d_log2
    return jnp.where(a < 0, -q, q)


def _luma_filter(A, B, C, D, st, maxv):
    """(ref: src_base/xevd_df.c:96-135) — vectorized; st==0 passthrough."""
    d = _div_trunc(A - (B << 2) + (C << 2) - D, 3)
    abs_d = jnp.abs(d)
    t16 = jnp.maximum(0, (abs_d - st) << 1)
    clip = jnp.maximum(0, abs_d - t16)
    d1 = jnp.where(d < 0, -clip, clip)
    clip2 = clip >> 1
    d2 = jnp.clip(_div_trunc(A - D, 2), -clip2, clip2)
    on = st > 0
    An = jnp.where(on, jnp.clip(A - d2, 0, maxv), A)
    Bn = jnp.where(on, jnp.clip(B + d1, 0, maxv), B)
    Cn = jnp.where(on, jnp.clip(C - d1, 0, maxv), C)
    Dn = jnp.where(on, jnp.clip(D + d2, 0, maxv), D)
    return An, Bn, Cn, Dn


def _chroma_filter(A, B, C, D, st, maxv):
    """(ref: src_base/xevd_df.c:137-195) — only B, C change."""
    d = _div_trunc(A - (B << 2) + (C << 2) - D, 3)
    abs_d = jnp.abs(d)
    t16 = jnp.maximum(0, (abs_d - st) << 1)
    clip = jnp.maximum(0, abs_d - t16)
    d1 = jnp.where(d < 0, -clip, clip)
    on = st > 0
    Bn = jnp.where(on, jnp.clip(B + d1, 0, maxv), B)
    Cn = jnp.where(on, jnp.clip(C - d1, 0, maxv), C)
    return Bn, Cn


@partial(jax.jit, static_argnums=(2,))
def luma_ver_pass(plane, st_rows, bit_depth):
    """plane [H, W] int16 (W % 4 == 0); st_rows [H, W//4] int32 strength of
    the vertical edge left of each 4-col block, 0 for none/first."""
    maxv = (1 << bit_depth) - 1
    H, W = plane.shape
    p4 = plane.reshape(H, W // 4, 4).astype(jnp.int32)
    A = p4[:, :-1, 2]
    B = p4[:, :-1, 3]
    C = p4[:, 1:, 0]
    D = p4[:, 1:, 1]
    st = st_rows[:, 1:]
    An, Bn, Cn, Dn = _luma_filter(A, B, C, D, st, maxv)
    p4 = p4.at[:, :-1, 2].set(An).at[:, :-1, 3].set(Bn)
    p4 = p4.at[:, 1:, 0].set(Cn).at[:, 1:, 1].set(Dn)
    return p4.reshape(H, W).astype(plane.dtype)


@partial(jax.jit, static_argnums=(2,))
def luma_hor_pass(plane, st_cols, bit_depth):
    """st_cols [H//4, W]: strength of the horizontal edge above each
    4-row block."""
    maxv = (1 << bit_depth) - 1
    H, W = plane.shape
    p4 = plane.reshape(H // 4, 4, W).astype(jnp.int32)
    A = p4[:-1, 2, :]
    B = p4[:-1, 3, :]
    C = p4[1:, 0, :]
    D = p4[1:, 1, :]
    st = st_cols[1:, :]
    An, Bn, Cn, Dn = _luma_filter(A, B, C, D, st, maxv)
    p4 = p4.at[:-1, 2, :].set(An).at[:-1, 3, :].set(Bn)
    p4 = p4.at[1:, 0, :].set(Cn).at[1:, 1, :].set(Dn)
    return p4.reshape(H, W).astype(plane.dtype)


@partial(jax.jit, static_argnums=(2,))
def chroma_ver_pass(plane, st_rows, bit_depth):
    """Chroma vertical-edge pass with 2-px cascade as a scan over edge
    columns.  plane [H, W] (W % 2 == 0); st_rows [H, W//2]: strength of the
    edge left of each 2-col block (col 2i), 0 for none."""
    maxv = (1 << bit_depth) - 1
    H, W = plane.shape
    p2 = plane.reshape(H, W // 2, 2).astype(jnp.int32)
    n = W // 2 - 1

    # step i (0-based) handles edge at col 2(i+1):
    #   A = updated col 2i (carry), B = col 2i+1, C = col 2i+2, D = col 2i+3
    B_all = p2[:, :-1, 1].T       # [n, H] (cols 1,3,..) for blocks 0..n-1
    C_all = p2[:, 1:, 0].T        # [n, H]
    D_all = p2[:, 1:, 1].T        # [n, H]
    st_all = st_rows[:, 1:].T     # [n, H]

    def step(carry_A, xs):
        B, C, D, st = xs
        Bn, Cn = _chroma_filter(carry_A, B, C, D, st, maxv)
        return Cn, (Bn, Cn)

    _, (Bs, Cs) = jax.lax.scan(step, p2[:, 0, 0], (B_all, C_all, D_all, st_all))
    p2 = p2.at[:, :-1, 1].set(Bs.T).at[:, 1:, 0].set(Cs.T)
    return p2.reshape(H, W).astype(plane.dtype)


@partial(jax.jit, static_argnums=(3,))
def chroma_ver_ordered(u, v, waves, bit_depth):
    """SUCO-order chroma vertical-edge pass.

    Under SUCO the left-right CU visit order flips, so horizontally
    cascading chroma edges must run in the reference's per-CU order
    (ref: src_main/xevdm.c:1854-1933 recon/deblock SUCO ordering;
    src_base/xevd_df.c:388-545 edge gating).  The host assigns each edge a
    rank within its SCU row (edges in different rows never interact); wave
    k processes at most one edge per row, so each scan step is a batched
    gather -> filter -> scatter of [h_scu] tiny windows.

    waves: int32 [n_waves, h_scu, 4] = (row_px, col_px, st_u, st_v) in
    chroma pixel coords; row_px >= 1<<20 marks an empty slot (scatter
    drops it).
    """
    maxv = (1 << bit_depth) - 1
    r2 = jax.lax.broadcasted_iota(jnp.int32, (1, 2, 1), 1)
    c2 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 2), 2)

    def step(planes, wv):
        up, vp = planes
        yy, xx, stu, stv = wv[:, 0], wv[:, 1], wv[:, 2], wv[:, 3]
        ys = jnp.clip(yy, 0, up.shape[0] - 2)
        xs = jnp.clip(xx - 2, 0, up.shape[1] - 4)

        def gather(pl):
            def one(y, x):
                return jax.lax.dynamic_slice(pl, (y, x), (2, 4))
            return jax.vmap(one)(ys, xs).astype(jnp.int32)   # [E, 2, 4]

        rows = yy[:, None, None] + r2                        # [E, 2, 1]
        cols = xx[:, None, None] - 1 + c2                    # [E, 1, 2]

        def filt(pl, st):
            w = gather(pl)
            Bn, Cn = _chroma_filter(w[..., 0], w[..., 1], w[..., 2],
                                    w[..., 3], st[:, None], maxv)
            vals = jnp.stack([Bn, Cn], axis=-1).astype(pl.dtype)
            return pl.at[rows, cols].set(vals, mode="drop")

        return (filt(up, stu), filt(vp, stv)), 0

    (u, v), _ = jax.lax.scan(step, (u, v), waves)
    return u, v


@partial(jax.jit, static_argnums=(2,))
def chroma_hor_pass(plane, st_cols, bit_depth):
    """Chroma horizontal-edge pass; st_cols [H//2, W]."""
    maxv = (1 << bit_depth) - 1
    H, W = plane.shape
    p2 = plane.reshape(H // 2, 2, W).astype(jnp.int32)

    B_all = p2[:-1, 1, :]
    C_all = p2[1:, 0, :]
    D_all = p2[1:, 1, :]
    st_all = st_cols[1:, :]

    def step(carry_A, xs):
        B, C, D, st = xs
        Bn, Cn = _chroma_filter(carry_A, B, C, D, st, maxv)
        return Cn, (Bn, Cn)

    _, (Bs, Cs) = jax.lax.scan(step, p2[0, 0, :], (B_all, C_all, D_all, st_all))
    p2 = p2.at[:-1, 1, :].set(Bs).at[1:, 0, :].set(Cs)
    return p2.reshape(H, W).astype(plane.dtype)


# ---------------------------------------------------------------------------
# ADDB (Main profile, tool_addb) — all edges on the 8x8 luma grid, filters
# touch <=3 px a side, so every pass is ONE fully vectorized tensor op (no
# scans).  Parameter maps come from derive._addb_params
# (ref: src_main/xevdm_df.c:835-1135).
# ---------------------------------------------------------------------------
from . import addb_common as _AC


def addb_luma_ver(plane, pars, bit_depth):
    """plane [H, W] (W % 8 == 0); pars [H//4, W//4, 4] per-SCU
    (bs, alpha, beta, c1); edge left of each 8-col block."""
    H, W = plane.shape
    nb = W // 8
    p8 = plane.reshape(H, nb, 8).astype(jnp.int32)
    p = tuple(p8[:, :-1, 7 - k] for k in range(4))
    q = tuple(p8[:, 1:, k] for k in range(4))
    sel = jnp.repeat(pars[:, ::2], 4, axis=0)[:, 1:]     # [H, nb-1, 4]
    (p0, p1, p2), (q0, q1, q2) = _AC.luma_line(
        jnp, p, q, sel[..., 0], sel[..., 1], sel[..., 2], sel[..., 3],
        bit_depth)
    p8 = p8.at[:, :-1, 7].set(p0).at[:, :-1, 6].set(p1).at[:, :-1, 5].set(p2)
    p8 = p8.at[:, 1:, 0].set(q0).at[:, 1:, 1].set(q1).at[:, 1:, 2].set(q2)
    return p8.reshape(H, W).astype(plane.dtype)


def addb_luma_hor(plane, pars, bit_depth):
    H, W = plane.shape
    nb = H // 8
    p8 = plane.reshape(nb, 8, W).astype(jnp.int32)
    p = tuple(p8[:-1, 7 - k, :] for k in range(4))
    q = tuple(p8[1:, k, :] for k in range(4))
    sel = jnp.repeat(pars[::2], 4, axis=1)[1:]           # [nb-1, W, 4]
    (p0, p1, p2), (q0, q1, q2) = _AC.luma_line(
        jnp, p, q, sel[..., 0], sel[..., 1], sel[..., 2], sel[..., 3],
        bit_depth)
    p8 = p8.at[:-1, 7, :].set(p0).at[:-1, 6, :].set(p1).at[:-1, 5, :].set(p2)
    p8 = p8.at[1:, 0, :].set(q0).at[1:, 1, :].set(q1).at[1:, 2, :].set(q2)
    return p8.reshape(H, W).astype(plane.dtype)


def addb_chroma_ver(plane, pars, bit_depth):
    """4:2:0 chroma: plane [Hc, Wc] (Wc % 4 == 0); pars [Hc//2, Wc//2, 4]
    per-SCU (bs, alpha, beta, c0)."""
    H, W = plane.shape
    nb = W // 4
    p4 = plane.reshape(H, nb, 4).astype(jnp.int32)
    p = (p4[:, :-1, 3], p4[:, :-1, 2])
    q = (p4[:, 1:, 0], p4[:, 1:, 1])
    sel = jnp.repeat(pars[:, ::2], 2, axis=0)[:, 1:]
    p0, q0 = _AC.chroma_line(jnp, p, q, sel[..., 0], sel[..., 1],
                             sel[..., 2], sel[..., 3], bit_depth)
    p4 = p4.at[:, :-1, 3].set(p0).at[:, 1:, 0].set(q0)
    return p4.reshape(H, W).astype(plane.dtype)


def addb_chroma_hor(plane, pars, bit_depth):
    H, W = plane.shape
    nb = H // 4
    p4 = plane.reshape(nb, 4, W).astype(jnp.int32)
    p = (p4[:-1, 3, :], p4[:-1, 2, :])
    q = (p4[1:, 0, :], p4[1:, 1, :])
    sel = jnp.repeat(pars[::2], 2, axis=1)[1:]
    p0, q0 = _AC.chroma_line(jnp, p, q, sel[..., 0], sel[..., 1],
                             sel[..., 2], sel[..., 3], bit_depth)
    p4 = p4.at[:-1, 3, :].set(p0).at[1:, 0, :].set(q0)
    return p4.reshape(H, W).astype(plane.dtype)
