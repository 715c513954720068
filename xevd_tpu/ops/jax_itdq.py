"""Batched inverse transform + dequant in JAX (TPU path).

Per frame, TUs are bucketed by log2 size on the host; each bucket runs one
batched kernel: exact integer dequant, then the two-stage inverse DCT-2 as
batched matrix multiplies (MXU work), with bit-exact integer semantics
matching the scalar oracle (ops/ref_numpy.itdq_block; ref:
src_base/xevd_itdq.c:473-541).

TPU has no fast int64, so the two wide operations are decomposed:
- dequant (coef * M + off) >> shift with M up to ~2^24: split M into
  12-bit halves;
- IDCT stage 2 accumulates up to ~2^41: split the stage-1 output into
  16-bit halves and combine the two int32 matmuls with an exact
  floor-shift recomposition.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import tables as T

_TM = {k: jnp.asarray(v, dtype=jnp.int32) for k, v in T.TM.items()}
_TR7 = {k: jnp.asarray(v, dtype=jnp.int32) for k, v in T.TR_DST7.items()}
_TR8 = {k: jnp.asarray(v, dtype=jnp.int32) for k, v in T.TR_DCT8.items()}


def _floor_shift_recompose(hi, lo, hi_scale_log2, shift):
    """Exact (hi * 2^hi_scale + lo) >> shift for int32 hi/lo with
    lo in [0, 2^hi_scale) ... actually lo may be any int32 >= 0; hi*2^s
    must be representable only piecewise.  Uses the identity
    (a*2^k + t) >> s == (a >> (s-k)) + ((a - ((a >> (s-k)) << (s-k))) * 2^k + t) >> s
    which keeps every intermediate within int32 range for our operand
    bounds (hi < 2^26, lo < 2^30, shift <= 20)."""
    if shift <= hi_scale_log2:
        return (hi << (hi_scale_log2 - shift)) + (lo >> shift)
    d = shift - hi_scale_log2
    hi_q = hi >> d
    hi_r = hi - (hi_q << d)
    return hi_q + (((hi_r << hi_scale_log2) + lo) >> shift)


@partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def itdq_bucket(coef, scale, log2_w, log2_h, bit_depth, iqt=False, trs=0):
    """coef int32 [N, h, w], scale int32 [N] -> residual int16 [N, h, w].

    iqt selects the Main per-stage-clipped DCT-2 (ref:
    src_main/xevdm_itdq.c:423-708); trs != 0 selects ATS bases
    (trs = (trh+1)<<2 | (trv+1) with 0=DST7 1=DCT8 per axis, ref:
    src_main/xevdm_itdq.c:163-421) — ATS stages are also 16-bit clipped,
    so plain int32 matmuls are exact and no 64-bit splits are needed."""
    ns_scale = 181 if ((log2_w + log2_h) & 1) else 1
    ns_shift = 8 if ((log2_w + log2_h) & 1) else 0
    log2_size = (log2_w + log2_h) >> 1
    tr_shift = T.MAX_TX_DYNAMIC_RANGE - bit_depth - log2_size
    shift = T.QUANT_IQUANT_SHIFT - T.QUANT_SHIFT - tr_shift + ns_shift
    offset = 0 if shift == 0 else 1 << (shift - 1)

    # ---- dequant: coef * (scale*ns) via 12-bit split of M ---------------
    coef = coef.astype(jnp.int32)
    m = scale * ns_scale                      # [N], up to ~2^24
    m_hi = m >> 12
    m_lo = m & 0xFFF
    m_hi = m_hi[:, None, None]
    m_lo = m_lo[:, None, None]
    # coef in [-2^15, 2^15): coef*m_hi < 2^15*2^12 = 2^27 OK; coef*m_lo < 2^27
    p_lo = coef * m_lo + offset               # |.| < 2^28
    p_hi = coef * m_hi
    lev = _floor_shift_recompose(p_hi, p_lo, 12, shift)
    dq = jnp.clip(lev, -32768, 32767)

    if iqt or trs:
        # Main path: both stages clip to 16 bits, so every matmul operand
        # is < 2^15 and every accumulation < 2^28 — exact in int32
        if trs:
            trh_t, trv_t = (trs >> 2) - 1, (trs & 3) - 1
            tr_h = (_TR8 if trh_t else _TR7)[log2_w]
            tr_v = (_TR8 if trv_t else _TR7)[log2_h]
        else:
            tr_h, tr_v = _TM[log2_w], _TM[log2_h]
        s1 = jnp.einsum("vy,nvu->nyu", tr_v, dq,
                        preferred_element_type=jnp.int32)
        s1 = jnp.clip((s1 + (1 << 6)) >> 7, -32768, 32767)
        if trs:
            shift2 = 6 + 15 - 1 - bit_depth
        else:
            shift2 = 12 - (bit_depth - 8)
        r = jnp.einsum("nyu,ux->nyx", s1, tr_h,
                       preferred_element_type=jnp.int32)
        r = (r + (1 << (shift2 - 1))) >> shift2
        r = jnp.clip(r, -32768, 32767)   # == MIN/MAX_TX_VAL
        return r.astype(jnp.int16)

    # ---- stage 0: S0[n, y, u] = sum_v TMh[v, y] * dq[n, v, u] -----------
    tm_h = _TM[log2_h]
    tm_w = _TM[log2_w]
    # int32 matmul: max |sum| <= 64*90*2^15 < 2^28 — exact in int32.
    s0 = jnp.einsum("vy,nvu->nyu", tm_h, dq,
                    preferred_element_type=jnp.int32)

    # ---- stage 1 with 16-bit split (|s0| < 2^28) ------------------------
    shift2 = 7 + (12 - (bit_depth - 8))
    add = 1 << (shift2 - 1)
    neg = s0 < 0
    s0a = jnp.where(neg, -s0, s0)
    hi = s0a >> 16
    lo = s0a & 0xFFFF
    hi = jnp.where(neg, -hi, hi)
    lo = jnp.where(neg, -lo, lo)
    # r = sum_u s0[n,y,u]*tm_w[u,x]: split sums: |hi|<2^12 → sum<2^25;
    # |lo|<2^16 → sum < 64*90*2^16 < 2^29
    r_hi = jnp.einsum("nyu,ux->nyx", hi, tm_w,
                      preferred_element_type=jnp.int32)
    r_lo = jnp.einsum("nyu,ux->nyx", lo, tm_w,
                      preferred_element_type=jnp.int32) + add
    r = _floor_shift_recompose(r_hi, r_lo, 16, shift2)
    r = jnp.clip(r, T.MIN_TX_VAL, T.MAX_TX_VAL)
    return r.astype(jnp.int16)
