"""JAX pixel-pipeline backend: per-frame batched reconstruction.

Architecture (one host->device payload per frame, three async dispatches):
  payload  — all per-frame syntax tensors packed into ONE flat int32 array
             (the XEVD_CU_DATA-equivalent host→device batch,
             ref: src_base/xevd_def.h:1145-1190); its static layout
             signature keys the jit cache
  stage A  — ITDQ: per-size batched dequant+IDCT, scatter into residual
             planes
  stage B  — MC: per-(size,case) batched window gather + taps, scatter-add
             into pred planes; bi areas detected by a parallel count plane
  stage C  — full-plane recon, intra lax.scan, deblock passes, pad-expand

Nothing blocks on the device mid-stream: decoded picture planes stay in
HBM for reference by later frames; output planes are fetched lazily at
pull/write time, so successive frames pipeline through the async queue.
"""
from __future__ import annotations

from collections import defaultdict
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# Persistent compilation cache: kernels compile once per shape class, ever.
# TPU-only: XLA:CPU AOT artifacts are machine/feature-set-specific and
# deserializing a stale one can SEGFAULT the process (observed in round 3
# even with a /proc/cpuinfo-keyed dir), so the CPU backend always compiles
# fresh.  The TPU dir is keyed by the jaxlib version.
import os as _os


def _maybe_enable_jit_cache():
    try:
        plats = {d.platform for d in jax.devices()}
    except Exception:
        return
    if plats == {"cpu"}:
        return
    import jaxlib
    ver = getattr(jaxlib, "__version__", "unk")
    d = _os.environ.get(
        "XEVD_TPU_JIT_CACHE",
        _os.path.expanduser(f"~/.cache/xevd_tpu_jit_tpu_{ver}"))
    jax.config.update("jax_compilation_cache_dir", d)
    # persist even sub-second compiles: the wavefront intra scan builds
    # hundreds of small bucketed step programs; at the default threshold
    # none are cached and every process pays the full compile sweep
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


_maybe_enable_jit_cache()

from .. import tables as T
from ..syntax import UnsupportedStream
from . import jax_deblock as JD
from . import jax_intra as JI
from . import jax_intra_main as JIM
from . import jax_itdq as JQ
from . import jax_mc as JM
from .jax_intra import BORDER, PAD_R
from .ref_numpy import qp_scale

MIN_BUCKET = 16


def _pow2(n, lo=MIN_BUCKET):
    p = lo
    while p < n:
        p <<= 1
    return p


# ---------------------------------------------------------------------------
# payload packing
# ---------------------------------------------------------------------------
class _Packer:
    """Flat payload assembler.  With a backing buffer (`buf`), alloc()
    returns slices INTO the payload and finish() is zero-copy; without one
    (or when the frame outgrows it) the filled arrays are concatenated.
    Bucket sizes are sticky (they only grow), so steady-state frames write
    straight into the persistent buffer."""

    def __init__(self, buf=None):
        self.buf = buf
        self.chunks = []
        self.sig = []
        self.off = 0
        self.overflow = False

    def alloc(self, name, shape):
        size = int(np.prod(shape))
        if self.buf is not None and not self.overflow \
                and self.off + size <= self.buf.size:
            arr = self.buf[self.off:self.off + size].reshape(shape)
        else:
            self.overflow = True
            arr = np.empty(shape, np.int32)
        self.chunks.append(arr)
        self.sig.append((name, self.off, shape))
        self.off += size
        return arr

    def add(self, name, arr: np.ndarray):
        out = self.alloc(name, arr.shape)
        out[...] = arr

    def finish(self):
        if not self.chunks:
            return np.zeros(1, np.int32), tuple(self.sig)
        if self.buf is not None and not self.overflow:
            return self.buf[:self.off], tuple(self.sig)
        payload = np.concatenate([c.ravel() for c in self.chunks])
        return payload, tuple(self.sig)


def _unpack(payload, sig):
    out = {}
    for name, off, shape in sig:
        size = int(np.prod(shape))
        out[name] = jax.lax.dynamic_slice(payload, (off,), (size,)).reshape(shape)
    return out


def _iota_pos(pos, s):
    return _iota_pos_wh(pos, s, s)


def _iota_pos_wh(pos, h, w):
    yy = pos[:, 0][:, None, None] + jax.lax.broadcasted_iota(
        jnp.int32, (1, h, w), 1)
    xx = pos[:, 1][:, None, None] + jax.lax.broadcasted_iota(
        jnp.int32, (1, h, w), 2)
    return yy, xx


# ---------------------------------------------------------------------------
# stage A: ITDQ
# ---------------------------------------------------------------------------
@partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def _itdq_all(payload, coefs, sig, shp_y, shp_c, bd, iqt=False):
    """Bucket rows are [scale, y, x] only; the coefficient BLOCKS are
    gathered here from the whole coef planes (int16, shipped as-is) —
    the host never touches coefficient data after entropy."""
    names = _unpack(payload, sig)
    coef_y, coef_u, coef_v = coefs
    src = {0: coef_y, 1: coef_u, 2: coef_v}
    planes = {0: jnp.zeros(shp_y, jnp.int16)}
    if shp_c is not None:
        planes[1] = jnp.zeros(shp_c, jnp.int16)
        planes[2] = jnp.zeros(shp_c, jnp.int16)
    for name, _, shape in sig:
        if not name.startswith("q"):
            continue
        _, lw_s, lh_s, comp_s, trs_s = name.split("_")
        lw, lh, comp, trs = int(lw_s), int(lh_s), int(comp_s), int(trs_s)
        w, h = 1 << lw, 1 << lh
        blk = names[name]                  # [Np, 3] rows: scale, y, x
        scale = blk[:, 0]
        pos = blk[:, 1:3]
        yy, xx = _iota_pos_wh(pos, h, w)
        H, W = src[comp].shape
        coef = src[comp][jnp.clip(yy, 0, H - 1),
                         jnp.clip(xx, 0, W - 1)].astype(jnp.int32)
        res = JQ.itdq_bucket(coef, scale, lw, lh, bd, iqt, trs)
        planes[comp] = planes[comp].at[yy + BORDER, xx + BORDER].set(
            res, mode="drop")
    if shp_c is not None:
        return planes[0], planes[1], planes[2]
    return planes[0], None, None


# ---------------------------------------------------------------------------
# stage B: MC
# ---------------------------------------------------------------------------
@partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def _mc_all(payload, refs, sig, shp_y, shp_c, bd, main_taps=False):
    refs_y, refs_u, refs_v = refs
    names = _unpack(payload, sig)
    pred_y = jnp.zeros(shp_y, jnp.int32)
    cnt_y = jnp.zeros(shp_y, jnp.int8)
    chroma = shp_c is not None
    if chroma:
        pred_u = jnp.zeros(shp_c, jnp.int32)
        pred_v = jnp.zeros(shp_c, jnp.int32)
        cnt_c = jnp.zeros(shp_c, jnp.int8)
    for name, _, shape in sig:
        if not name.startswith("m"):
            continue
        _, plane_s, w_s, h_s, case_s = name.split("_")
        w, h, case = int(w_s), int(h_s), int(case_s)
        is_luma = plane_s == "l"
        e = names[name]                    # [Np, 5]: slot, gx, gy, py, px
        slot, gx, gy = e[:, 0], e[:, 1], e[:, 2]
        pos = e[:, 3:5]
        if is_luma:
            p = JM.mc_bucket((refs_y, slot, gx, gy), case, w, h, bd, True,
                             main_taps)
            yy, xx = _iota_pos_wh(pos, h, w)
            pred_y = pred_y.at[yy, xx].add(p, mode="drop")
            cnt_y = cnt_y.at[yy, xx].add(1, mode="drop")
        else:
            pu = JM.mc_bucket((refs_u, slot, gx, gy), case, w, h, bd, False,
                              main_taps)
            pv = JM.mc_bucket((refs_v, slot, gx, gy), case, w, h, bd, False,
                              main_taps)
            yy, xx = _iota_pos_wh(pos, h, w)
            pred_u = pred_u.at[yy, xx].add(pu, mode="drop")
            pred_v = pred_v.at[yy, xx].add(pv, mode="drop")
            cnt_c = cnt_c.at[yy, xx].add(1, mode="drop")
    if chroma:
        return pred_y, cnt_y, pred_u, pred_v, cnt_c
    return pred_y, cnt_y, None, None, None


# ---------------------------------------------------------------------------
# stage C: recon + intra + deblock + pad-expand
# ---------------------------------------------------------------------------
def _recon_plane(pred, cnt, resid, bd):
    maxv = (1 << bd) - 1
    p = jnp.where(cnt == 2, (pred + 1) >> 1, pred)
    t = (p + resid.astype(jnp.int32)).astype(jnp.int16).astype(jnp.int32)
    return jnp.clip(t, 0, maxv).astype(jnp.int16)


@partial(jax.jit, static_argnums=(2, 3))
def _recon_all(resids, preds, bd, chroma):
    resid_y, resid_u, resid_v = resids
    pred_y, cnt_y, pred_u, pred_v, cnt_c = preds
    rec_y = _recon_plane(pred_y, cnt_y, resid_y, bd)
    if chroma:
        rec_u = _recon_plane(pred_u, cnt_c, resid_u, bd)
        rec_v = _recon_plane(pred_v, cnt_c, resid_v, bd)
    else:
        rec_u = rec_v = jnp.zeros((8, 8), jnp.int16)
    return rec_y, rec_u, rec_v


def _pad_out(y_area, u_area, v_area, h, w, chroma, pad):
    pic_y = jnp.pad(y_area[:h, :w], pad, mode="edge")
    if chroma:
        pic_u = jnp.pad(u_area[:h >> 1, :w >> 1], pad >> 1, mode="edge")
        pic_v = jnp.pad(v_area[:h >> 1, :w >> 1], pad >> 1, mode="edge")
        return pic_y, pic_u, pic_v
    return pic_y, None, None


@partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def _deblock_finish_addb(recs, pars, geom, bd, chroma, pad, pad_out=True):
    """ADDB deblock + pad-expand.  pars = (luma [2, hs, ws, 4],
    chroma [2, hs, ws, 7]) per-SCU parameter maps (host-padded so the
    covered area is a multiple of 8 px); dir 0 = ver pass, 1 = hor pass.
    Every ADDB pass is a single vectorized op (8-px edge grid, <=3 px
    reach — no cascades)."""
    h, w, h_scu, w_scu = geom
    luma_pars, chroma_pars = pars
    rec_y, rec_u, rec_v = recs
    H8 = luma_pars.shape[1] * 4
    W8 = luma_pars.shape[2] * 4
    y_area = jax.lax.dynamic_slice(rec_y, (BORDER, BORDER), (H8, W8))
    y_area = JD.addb_luma_ver(y_area, luma_pars[0], bd)
    if chroma:
        u_area = jax.lax.dynamic_slice(rec_u, (BORDER, BORDER),
                                       (H8 >> 1, W8 >> 1))
        v_area = jax.lax.dynamic_slice(rec_v, (BORDER, BORDER),
                                       (H8 >> 1, W8 >> 1))
        u_sel = chroma_pars[..., jnp.array([0, 1, 2, 3])]
        v_sel = chroma_pars[..., jnp.array([0, 4, 5, 6])]
        u_area = JD.addb_chroma_ver(u_area, u_sel[0], bd)
        v_area = JD.addb_chroma_ver(v_area, v_sel[0], bd)
    y_area = JD.addb_luma_hor(y_area, luma_pars[1], bd)
    if chroma:
        u_area = JD.addb_chroma_hor(u_area, u_sel[1], bd)
        v_area = JD.addb_chroma_hor(v_area, v_sel[1], bd)
    if not chroma:
        u_area = v_area = None
    if not pad_out:
        return y_area, u_area, v_area
    return _pad_out(y_area, u_area, v_area, h, w, chroma, pad)


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8))
def _deblock_finish(recs, st, waves, geom, bd, chroma, deblock_on, pad,
                    pad_out=True):
    """geom = (h, w, h_scu, w_scu).  st [6, h_scu, w_scu] or None.
    waves: SUCO-order chroma vertical-edge schedule (or None for raster
    order, which matches non-SUCO decode order — see jax_deblock)."""
    h, w, h_scu, w_scu = geom
    rec_y, rec_u, rec_v = recs
    H4, W4 = h_scu * 4, w_scu * 4
    y_area = jax.lax.dynamic_slice(rec_y, (BORDER, BORDER), (H4, W4))
    if chroma:
        u_area = jax.lax.dynamic_slice(rec_u, (BORDER, BORDER),
                                       (H4 >> 1, W4 >> 1))
        v_area = jax.lax.dynamic_slice(rec_v, (BORDER, BORDER),
                                       (H4 >> 1, W4 >> 1))
    if deblock_on:
        y_area = JD.luma_ver_pass(y_area, jnp.repeat(st[0], 4, axis=0), bd)
        if chroma and waves is not None:
            u_area, v_area = JD.chroma_ver_ordered(u_area, v_area, waves, bd)
        elif chroma:
            u_area = JD.chroma_ver_pass(u_area, jnp.repeat(st[2], 2, axis=0), bd)
            v_area = JD.chroma_ver_pass(v_area, jnp.repeat(st[4], 2, axis=0), bd)
        y_area = JD.luma_hor_pass(y_area, jnp.repeat(st[1], 4, axis=1), bd)
        if chroma:
            u_area = JD.chroma_hor_pass(u_area, jnp.repeat(st[3], 2, axis=1), bd)
            v_area = JD.chroma_hor_pass(v_area, jnp.repeat(st[5], 2, axis=1), bd)

    if not chroma:
        u_area = v_area = None
    if not pad_out:
        return y_area, u_area, v_area
    return _pad_out(y_area, u_area, v_area, h, w, chroma, pad)


@partial(jax.jit, static_argnums=(0,))
def _frame_step(st_items, payload, icu, dbst, waves, refs_y, refs_u, refs_v,
                alf=None, coefs=None):
    """ONE jitted dispatch per frame (the serial decode path).

    Everything fuses into a single XLA program: the reference-plane stack,
    all pipeline stages, deblock, pad-expand.  Critical for latency when the
    device is remote (eager per-frame ops each cost a host<->device round
    trip; round 3 spent 99% of the frame time there)."""
    st = dict(st_items)
    refs = (jnp.stack(refs_y) if refs_y else None,
            jnp.stack(refs_u) if refs_u else None,
            jnp.stack(refs_v) if refs_v else None)
    return run_frame_device(payload, icu, dbst, waves, refs, st, alf, coefs)


def run_frame_device(payload, icu, dbst, waves, refs, st, alf=None,
                     coefs=None):
    """Device half of one-frame decode: ITDQ -> MC -> recon -> intra scan
    -> deblock -> [ALF] -> padded picture planes.  Pure jax on traced
    args; `st` is the static metadata dict from JaxPixelBackend.pack_frame.
    Callable standalone, under jit, or under vmap (GOP batch axis)."""
    shp_y, shp_c = st["shp_y"], st["shp_c"]
    bd, chroma, iqt = st["bd"], st["chroma"], st["iqt"]
    resids = _itdq_all(payload, coefs, st["sig_q"], shp_y, shp_c, bd, iqt)
    if st["has_inter"]:
        preds = _mc_all(payload, refs, st["sig_m"], shp_y, shp_c, bd,
                        st["main_taps"])
    else:
        z32 = jnp.zeros(shp_y, jnp.int32)
        z8 = jnp.zeros(shp_y, jnp.int8)
        if chroma:
            zc32 = jnp.zeros(shp_c, jnp.int32)
            zc8 = jnp.zeros(shp_c, jnp.int8)
            preds = (z32, z8, zc32, zc32, zc8)
        else:
            preds = (z32, z8, None, None, None)

    recs = _recon_all(resids, preds, bd, chroma)
    if icu is not None:
        rtuple = (resids[0], resids[1] if chroma else resids[0],
                  resids[2] if chroma else resids[0])
        if st["eipd"]:
            # wavefront schedule: dict {tile_S: [L, B, ncol]}
            recs = JIM.intra_scan_wave(recs, rtuple, icu, bd, chroma)
        else:
            cu = {"x": icu[:, 0], "y": icu[:, 1], "log2": icu[:, 2],
                  "ipm": icu[:, 3], "up_mask": icu[:, 4],
                  "left_mask": icu[:, 5], "corner": icu[:, 6],
                  "valid": icu[:, 7]}
            recs = JI.intra_scan(recs, rtuple, cu, bd, chroma)
    alf_cfg = st.get("alf")
    if st.get("addb"):
        out = _deblock_finish_addb(recs, dbst, st["geom"], bd, chroma,
                                   T.PIC_PAD_SIZE_L, alf_cfg is None)
    else:
        out = _deblock_finish(recs, dbst, waves, st["geom"], bd, chroma,
                              st["deblock_on"], T.PIC_PAD_SIZE_L,
                              alf_cfg is None)
    if alf_cfg is None:
        return out
    # ALF stage (ref: src_main/xevdm.c:3209-3213): batched CTU kernel on
    # the unpadded areas, then pad-expand
    from . import jax_alf as JA
    enables, log2_ctu, across = alf_cfg
    h, w = st["geom"][0], st["geom"][1]
    coef_l, coef_c, ctu_on = alf
    y_area, u_area, v_area = out
    y_area, u_area, v_area = JA.alf_apply(
        y_area, u_area, v_area, coef_l, coef_c, ctu_on, h, w, log2_ctu,
        enables, bd, across, chroma)
    return _pad_out(y_area, u_area, v_area, h, w, chroma, T.PIC_PAD_SIZE_L)


class JaxPixelBackend:
    """Bit-exact JAX/XLA implementation of the Baseline pixel pipeline."""

    name = "jax"
    device_resident = True

    def __init__(self):
        # sticky per-bucket row counts: shapes only grow, so jit signatures
        # stabilize after the first few frames of a sequence
        self._sched = {}
        # Host-buffer reuse: bucket arrays and the flat payload are reused
        # across frames to avoid cold-allocation page faults (~25ms/frame
        # at 1080p).  Only when the device is NOT the host CPU — jax's CPU
        # backend may alias numpy buffers zero-copy, and mutating them next
        # frame would corrupt in-flight computations.  XEVD_TPU_REUSE=1
        # forces it on (used by a CPU test to exercise this path).
        import os
        self._reuse = (os.environ.get("XEVD_TPU_REUSE") == "1"
                       or jax.default_backend() not in ("cpu",))
        self._payload_bufs = [None, None]   # double buffer: frame n vs n+1
        self._payload_flip = 0

    def _sched_keys(self, prefix):
        for name in self._sched:
            if not name.startswith(prefix):
                continue
            parts = name.split("_")
            if prefix == "q":
                yield (int(parts[1]), int(parts[2]), int(parts[3]),
                       int(parts[4]))
            else:
                yield (parts[1], int(parts[2]), int(parts[3]), int(parts[4]))

    def _rows(self, name, n):
        req = _pow2(n)
        cur = self._sched.get(name, 0)
        if req > cur:
            self._sched[name] = req
            cur = req
        return cur

    # ------------------------------------------------------------------
    def check_caps(self, sps):
        """Refuse toolsets this backend cannot decode bit-exactly
        (round-2 verdict: never silently emit wrong pixels)."""
        if sps.chroma_format_idc not in (0, 1):
            raise UnsupportedStream("JAX backend: 4:2:0/4:0:0 only")
        if getattr(sps, "is_main", False) and sps.sps_btt_flag \
                and not sps.tool_eipd:
            raise UnsupportedStream(
                "JAX backend: BTT with baseline intra (eipd off) "
                "unsupported — rect CUs need the EIPD kernel")
        if getattr(sps, "is_main", False) and sps.tool_htdf \
                and not sps.tool_eipd:
            raise UnsupportedStream(
                "JAX backend: HTDF requires the EIPD scan path "
                "(tool_eipd on); use the numpy backend")
        if getattr(sps, "is_main", False) and sps.tool_affine:
            raise UnsupportedStream(
                "JAX backend: affine MC not on the device path yet; "
                "use the numpy backend")
        if getattr(sps, "is_main", False) and sps.ibc_flag:
            raise UnsupportedStream(
                "JAX backend: IBC not on the device path yet; "
                "use the numpy backend")
        if getattr(sps, "is_main", False) and sps.tool_dmvr:
            raise UnsupportedStream(
                "JAX backend: DMVR not on the device path yet; "
                "use the numpy backend")

    # ------------------------------------------------------------------
    def pack_frame(self, job, sps, refp):
        """Host half of decode_frame: build the flat device payload + all
        static metadata for one frame.  Returns a dict consumed by
        run_frame_device (directly by decode_frame; stacked over a GOP
        batch by parallel/gop.decode_gops_sharded)."""
        fs = job.fs
        bd = sps.bit_depth_luma_minus8 + 8
        cfi = sps.chroma_format_idc
        if cfi not in (0, 1):
            raise UnsupportedStream("JAX backend: 4:2:0/4:0:0 only")
        chroma = cfi == 1
        is_main = bool(getattr(sps, "is_main", False))
        iqt = bool(is_main and sps.tool_iqt)
        eipd = bool(is_main and sps.tool_eipd)
        suco = bool(is_main and getattr(sps, "sps_suco_flag", 0))

        shp_y = (BORDER + fs.h_pad + PAD_R, BORDER + fs.w_pad + PAD_R)
        shp_c = ((BORDER + (fs.h_pad >> 1) + PAD_R,
                  BORDER + (fs.w_pad >> 1) + PAD_R) if chroma else None)

        def coef_out(p):
            if p is None:
                return np.zeros((8, 8), np.int16)
            # copy when jax may zero-copy alias host memory (CPU backend):
            # the native entropy scratch is reused two slices later
            return p if self._reuse else p.copy()

        coefs = (coef_out(fs.coef_y), coef_out(fs.coef_u),
                 coef_out(fs.coef_v))

        if self._reuse:
            # double-buffered backing store: buckets write straight into
            # the payload; frame n+1 never touches host memory a
            # still-in-flight transfer of frame n might read
            self._payload_flip ^= 1
            pk = _Packer(self._payload_bufs[self._payload_flip])
        else:
            pk = _Packer()
        self._pack_itdq(pk, fs, bd, chroma, iqt)
        refs, has_inter = self._pack_mc(pk, fs, job, refp, chroma)
        icu_np = (self._pack_intra_main(fs, job, chroma) if eipd
                  else self._pack_intra(None, fs, job))
        deblock_on = bool(fs.sh.deblocking_filter_on)
        addb = bool(deblock_on and job.addb_luma is not None)
        if addb:
            # pad the per-SCU parameter maps so the covered pixel area is
            # a multiple of 8 (the ADDB edge grid); padded cells have
            # bs == 0 and filter nothing
            hs2 = (fs.h_scu + 1) & ~1
            ws2 = (fs.w_scu + 1) & ~1
            luma = np.zeros((2, hs2, ws2, 4), np.int32)
            luma[:, :fs.h_scu, :fs.w_scu] = job.addb_luma
            chroma_p = np.zeros((2, hs2, ws2, 7), np.int32)
            chroma_p[:, :fs.h_scu, :fs.w_scu] = job.addb_chroma
            dbst_np = (luma, chroma_p)
        elif deblock_on:
            dbst_np = np.stack([job.db_ver_y, job.db_hor_y,
                                job.db_ver_u, job.db_hor_u,
                                job.db_ver_v, job.db_hor_v])
        else:
            dbst_np = None
        waves_np = None
        if deblock_on and suco and chroma and not addb:
            waves_np = _chroma_ver_waves(fs, job)
            if waves_np is not None:
                nw = self._rows("dbw", waves_np.shape[0])
                if nw > waves_np.shape[0]:
                    pad_w = np.full((nw - waves_np.shape[0],) +
                                    waves_np.shape[1:], 1 << 20, np.int32)
                    waves_np = np.concatenate([waves_np, pad_w])
        payload_np, sig = pk.finish()
        if self._reuse and (pk.buf is None or pk.overflow):
            # bucket schedule grew: bigger persistent buffer next time
            self._payload_bufs[self._payload_flip] = \
                np.empty(pk.off + (pk.off >> 2), np.int32)
        alf_np = None
        alf_cfg = None
        if job.alf_param is not None:
            from . import jax_alf as JA
            log2_ctu, across = job.alf_misc
            cl, cc = JA.recon_coef_arrays(
                job.alf_param, job.alf_enable[1] or job.alf_enable[2])
            alf_np = (cl, cc, fs.alf_ctu_on.astype(np.int32))
            alf_cfg = (tuple(job.alf_enable), log2_ctu, across)
        return {
            "payload": payload_np, "icu": icu_np, "alf": alf_np,
            "coefs": coefs,
            "dbst": dbst_np, "waves": waves_np, "refs": refs,
            "slots": list(getattr(self, "_last_slots", [])),
            "static": dict(
                sig_q=tuple(e for e in sig if e[0].startswith("q")),
                sig_m=tuple(e for e in sig if e[0].startswith("m")),
                shp_y=shp_y, shp_c=shp_c, bd=bd, chroma=chroma, iqt=iqt,
                eipd=eipd, has_inter=has_inter, deblock_on=deblock_on,
                addb=addb, alf=alf_cfg,
                main_taps=bool(is_main and sps.tool_admvp),
                geom=(fs.h, fs.w, fs.h_scu, fs.w_scu)),
        }

    # ------------------------------------------------------------------
    def decode_frame(self, job, sps, refp):
        pack = self.pack_frame(job, sps, refp)
        ry, ru, rv = pack["refs"]
        st_items = tuple(sorted(pack["static"].items()))
        return _frame_step(st_items, pack["payload"], pack["icu"],
                           pack["dbst"], pack["waves"], ry, ru, rv,
                           pack["alf"], pack["coefs"])

    # ------------------------------------------------------------------
    def make_picture_planes(self, rec_planes, fs, sps):
        # decode_frame already produced padded picture planes on device
        return rec_planes

    def to_host(self, plane):
        return np.asarray(plane)

    # ------------------------------------------------------------------
    def _pack_itdq(self, pk, fs, bd, chroma, iqt=False):
        """Vectorized TU bucketing: one fancy-indexed coefficient gather per
        (size, transform) bucket instead of a per-CU Python loop."""
        pm = fs.cu_pred_mode
        cbf = fs.cu_cbf
        coded = pm != T.MODE_SKIP
        ats = fs.cu_ats                     # [N,3] (cu, mode, inter)
        dq_tbl = T.DQ_SCALE if iqt else T.DQ_SCALE_B

        def scales(qp):
            return dq_tbl[qp % 6].astype(np.int64) << (qp // 6)

        entries = []                        # (comp, idx, lw, lh, xo, yo, trs)

        def split_ats(comp, idx, lw, lh):
            """Split selected CUs into plain vs ATS-affected subsets and
            emit per-entry TU geometry (rare ATS path loops; plain is
            fully vectorized)."""
            inter = ats[idx, 2]
            plain = inter == 0
            pidx = idx[plain]
            if comp == 0:
                a_cu = ats[pidx, 0]
                a_mode = ats[pidx, 1]
                trs_p = np.where(
                    a_cu != 0,
                    (((a_mode >> 1) + 1) << 2) | ((a_mode & 1) + 1), 0)
            else:
                trs_p = np.zeros(len(pidx), np.int32)
            for trs in np.unique(trs_p):
                sel = pidx[trs_p == trs]
                entries.append((comp, sel, lw[plain][trs_p == trs],
                                lh[plain][trs_p == trs],
                                np.zeros(len(sel), np.int32),
                                np.zeros(len(sel), np.int32), int(trs)))
            for j in np.nonzero(~plain)[0]:  # ATS-inter sub-TUs (rare)
                i = idx[j]
                lwi, lhi = int(lw[j]), int(lh[j])
                info = int(ats[i, 2])
                ltw, lth = T.ats_inter_tu_size(info, lwi, lhi)
                xo, yo = T.ats_inter_tu_offset(info, lwi, lhi)
                if comp == 0:
                    a_cu, a_mode = T.ats_inter_trs(info, lwi, lhi)
                    trs = ((((a_mode >> 1) + 1) << 2) | ((a_mode & 1) + 1)) \
                        if a_cu else 0
                else:
                    trs = 0
                entries.append((comp, np.array([i]),
                                np.array([ltw]), np.array([lth]),
                                np.array([xo]), np.array([yo]), trs))

        idx_y = np.nonzero(coded & (cbf[:, 0] != 0))[0]
        split_ats(0, idx_y, fs.cu_log2w[idx_y], fs.cu_log2h[idx_y])
        if chroma:
            for comp in (1, 2):
                idx_c = np.nonzero(coded & (cbf[:, comp] != 0))[0]
                split_ats(comp, idx_c, fs.cu_log2w[idx_c] - 1,
                          fs.cu_log2h[idx_c] - 1)

        buckets = defaultdict(list)         # key -> [(idx, xo, yo, trs)]
        for comp, idx, lw, lh, xo, yo, trs in entries:
            if len(idx) == 0:
                continue
            key = (lw << 4) | lh
            uniq, inv = np.unique(key, return_inverse=True)
            for k, kv in enumerate(uniq):
                m = inv == k
                buckets[(int(kv) >> 4, int(kv) & 15, comp, trs)].append(
                    (idx[m], xo[m], yo[m]))

        out = {}
        qps = (fs.cu_qp + 6 * (bd - 8), fs.cu_qp_u, fs.cu_qp_v)
        shifts = (0, 1, 1)
        for (lw, lh, comp, trs), groups in buckets.items():
            idx = np.concatenate([g[0] for g in groups])
            xo = np.concatenate([g[1] for g in groups])
            yo = np.concatenate([g[2] for g in groups])
            s = shifts[comp] if comp else 0
            N = len(idx)
            # rows are (scale, y, x) only; coefficient blocks are gathered
            # from the shipped coef planes ON DEVICE (_itdq_all)
            arr_n = np.empty((N, 3), np.int32)
            arr_n[:, 0] = scales(qps[comp][idx])
            arr_n[:, 1] = (fs.cu_y[idx] >> s) + yo
            arr_n[:, 2] = (fs.cu_x[idx] >> s) + xo
            out[(lw, lh, comp, trs)] = arr_n
        for key in self._sched_keys("q"):
            if key not in out:
                out[key] = np.zeros((0, 3), np.int32)
        for (lw, lh, comp, trs), arr_n in sorted(out.items()):
            name = f"q_{lw}_{lh}_{comp}_{trs}"
            N = len(arr_n)
            Np = self._rows(name, max(N, 1))
            arr = pk.alloc(name, (Np, 3))
            arr[:N] = arr_n
            arr[N:, 1:3] = 1 << 20          # OOB positions -> dropped

    # ------------------------------------------------------------------
    def _pack_mc(self, pk, fs, job, refp, chroma):
        """Vectorized MC bucketing (ref semantics: src_base/xevd_mc.c:
        435-557 clip + identical-motion skip + case dispatch)."""
        inter = fs.cu_pred_mode != T.MODE_INTRA
        idx = np.nonzero(inter)[0]
        if len(idx) == 0:
            self._last_slots = []
            for key in sorted(self._sched_keys("m")):
                self._emit_mc_bucket(pk, key, np.zeros((0, 5), np.int32))
            return ((), (), ()), False

        x = fs.cu_x[idx]
        y = fs.cu_y[idx]
        cuw = (1 << fs.cu_log2w[idx]).astype(np.int64)
        cuh = (1 << fs.cu_log2h[idx]).astype(np.int64)
        refi = job.cu_refi[idx]              # [M, 2]
        mv = job.cu_mv[idx].astype(np.int64)  # [M, 2, 2]

        # vectorized MV clip (ref: src_base/xevd_mc.c:435-467)
        x4 = (x << 2).astype(np.int64)[:, None]
        y4 = (y << 2).astype(np.int64)[:, None]
        w4 = (cuw << 2)[:, None]
        h4 = (cuh << 2)[:, None]
        lo = -(T.MAX_CU_SIZE << 2)
        hix = (fs.w - 1 + T.MAX_CU_SIZE) << 2
        hiy = (fs.h - 1 + T.MAX_CU_SIZE) << 2
        mvx = mv[:, :, 0]
        mvy = mv[:, :, 1]
        mvx_c = np.where(x4 + mvx < lo, lo - x4, mvx)
        mvy_c = np.where(y4 + mvy < lo, lo - y4, mvy)
        mvx_c = np.where(x4 + mvx + w4 - 4 > hix, hix - x4 - w4 + 4, mvx_c)
        mvy_c = np.where(y4 + mvy + h4 - 4 > hiy, hiy - y4 - h4 + 4, mvy_c)

        # poc per (list, refi) for the identical-motion test
        max_ref = int(refi.max()) + 1 if refi.size else 0
        poc_tbl = np.full((2, max(max_ref, 1)), -(1 << 30), np.int64)
        used = set()
        for lidx in range(2):
            for r in np.unique(refi[:, lidx]):
                if r >= 0:
                    poc_tbl[lidx, r] = refp[r][lidx].poc
                    used.add((lidx, int(r)))
        pocs = np.take_along_axis(
            poc_tbl, np.maximum(refi, 0).T, 1).T       # [M, 2] via transpose
        valid = refi >= 0
        dup = (valid[:, 0] & valid[:, 1]
               & (pocs[:, 0] == pocs[:, 1])
               & (mvx_c[:, 0] == mvx_c[:, 1])
               & (mvy_c[:, 0] == mvy_c[:, 1]))
        valid = valid.copy()
        valid[:, 1] &= ~dup                  # identical-motion skip

        ref_map = {}
        planes_y, planes_u, planes_v = [], [], []
        slot_tbl = np.zeros((2, max(max_ref, 1)), np.int32)
        self._last_slots = []          # (lidx, r, ref_poc) per device slot
        for (lidx, r) in sorted(used):
            pic = refp[r][lidx].pic
            ref_map[(lidx, r)] = len(planes_y)
            slot_tbl[lidx, r] = len(planes_y)
            self._last_slots.append((lidx, r, int(refp[r][lidx].poc)))
            planes_y.append(pic.y)
            if chroma:
                planes_u.append(pic.u)
                planes_v.append(pic.v)

        buckets = {}
        pad = T.PIC_PAD_SIZE_L
        pad_c = T.PIC_PAD_SIZE_C
        for lidx in range(2):
            sel = np.nonzero(valid[:, lidx])[0]
            if len(sel) == 0:
                continue
            gx16 = (((x[sel].astype(np.int64) << 2) + mvx_c[sel, lidx]) << 2)
            gy16 = (((y[sel].astype(np.int64) << 2) + mvy_c[sel, lidx]) << 2)
            slot = slot_tbl[lidx, refi[sel, lidx]]
            fx = (mvx[sel, lidx] << 2) & 15
            fy = (mvy[sel, lidx] << 2) & 15
            case = (fx != 0) * 1 + (fy != 0) * 2
            rows = np.stack([slot, gx16 + (pad << 4), gy16 + (pad << 4),
                             y[sel] + BORDER, x[sel] + BORDER],
                            1).astype(np.int32)
            # scalar bucket keys: 1-D unique is much cheaper than axis=0
            key = (cuw[sel] << 16) | (cuh[sel] << 4) | case
            uniq, inv = np.unique(key, return_inverse=True)
            for k, kv in enumerate(uniq):
                kv = int(kv)
                buckets.setdefault(
                    ("l", kv >> 16, (kv >> 4) & 0xFFF, kv & 0xF),
                    []).append(rows[inv == k])
            if chroma:
                fx_c = (mvx[sel, lidx] << 2) & 31
                fy_c = (mvy[sel, lidx] << 2) & 31
                case_c = (fx_c != 0) * 1 + (fy_c != 0) * 2
                rows_c = np.stack(
                    [slot, gx16 + (pad_c << 5), gy16 + (pad_c << 5),
                     (y[sel] >> 1) + BORDER, (x[sel] >> 1) + BORDER],
                    1).astype(np.int32)
                key_c = ((cuw[sel] >> 1) << 16) | ((cuh[sel] >> 1) << 4) \
                    | case_c
                uniq_c, inv_c = np.unique(key_c, return_inverse=True)
                for k, kv in enumerate(uniq_c):
                    kv = int(kv)
                    buckets.setdefault(
                        ("c", kv >> 16, (kv >> 4) & 0xFFF, kv & 0xF),
                        []).append(rows_c[inv_c == k])

        out = {k: np.concatenate(v) for k, v in buckets.items()}
        for key in self._sched_keys("m"):
            if key not in out:
                out[key] = np.zeros((0, 5), np.int32)
        for key, arr_n in sorted(out.items()):
            self._emit_mc_bucket(pk, key, arr_n)

        if planes_y:
            # tuples of per-slot planes; stacked INSIDE the jitted frame
            # step so no eager device op runs per frame
            refs = (tuple(planes_y),
                    tuple(planes_u) if chroma else (),
                    tuple(planes_v) if chroma else ())
            return refs, True
        return ((), (), ()), False

    def _emit_mc_bucket(self, pk, key, arr_n):
        pl, w, h, case = key
        name = f"m_{pl}_{w}_{h}_{case}"
        N = len(arr_n)
        Np = self._rows(name, max(N, 64))
        arr = pk.alloc(name, (Np, 5))
        arr[:N] = arr_n
        arr[N:, 0] = 0               # pad rows: valid slot, positions OOB
        arr[N:, 1:3] = 0
        arr[N:, 3:5] = 1 << 20

    # ------------------------------------------------------------------
    def _pack_intra(self, pk, fs, job):
        idx = np.nonzero(fs.cu_pred_mode == T.MODE_INTRA)[0]
        if len(idx) == 0:
            return None
        N = len(idx)
        Np = self._rows("icu", max(N, 64))
        arr = np.zeros((Np, 8), np.int32)
        arr[:, 2] = 2
        # Baseline intra is always square (JAX intra scan assumes it)
        if (fs.cu_log2w[idx] != fs.cu_log2h[idx]).any():
            raise UnsupportedStream(
                "JAX baseline intra kernel: square CUs only")
        arr[:N] = np.stack(
            [fs.cu_x[idx], fs.cu_y[idx], fs.cu_log2w[idx], fs.cu_ipm[idx],
             (job.cu_nbr_up[idx] & 0xFFFFFFFF).astype(np.uint32)
             .astype(np.int32),
             (job.cu_nbr_left[idx] & 0xFFFFFFFF).astype(np.uint32)
             .astype(np.int32),
             job.cu_nbr_corner[idx].astype(np.int32),
             np.ones(N, np.int32)], 1)
        return arr

    # ------------------------------------------------------------------
    def _pack_intra_main(self, fs, job, chroma=True):
        """Per-CU tensor rows for the EIPD intra scan
        (ops/jax_intra_main.intra_scan_main).  When the frame has HTDF
        work, the scan list also carries the HTDF-qualifying inter CUs
        (decode order preserved) and three extra columns
        (do_intra, htdf_idx, htdf_avail)."""
        intra = fs.cu_pred_mode == T.MODE_INTRA
        htdf_any = (job.cu_htdf_idx is not None
                    and (job.cu_htdf_idx >= 0).any())
        sel = intra | (job.cu_htdf_idx >= 0) if htdf_any else intra
        idx = np.nonzero(sel)[0]
        if len(idx) == 0:
            return None
        N = len(idx)
        ncol = 16 if htdf_any else 13
        Np = self._rows("icum" if ncol == 13 else "icumh", max(N, 64))
        arr = np.zeros((Np, ncol), np.int32)
        arr[:, 2] = 2
        arr[:, 3] = 2
        if (fs.cu_log2w[idx] > 6).any() or (fs.cu_log2h[idx] > 6).any():
            raise UnsupportedStream(
                "JAX EIPD kernel: intra CU > 64 unsupported")

        def u32(v):
            return (v & 0xFFFFFFFF).astype(np.uint32).astype(np.int32)

        cols = [fs.cu_x[idx], fs.cu_y[idx], fs.cu_log2w[idx],
                fs.cu_log2h[idx],
                fs.cu_ipm[idx], fs.cu_ipm_c[idx],
                u32(job.cu_nbr_up[idx]), u32(job.cu_nbr_left[idx]),
                u32(job.cu_nbr_right[idx]),
                job.cu_nbr_corner[idx].astype(np.int32),
                job.cu_avail_lr[idx].astype(np.int32),
                fs.cu_tree[idx], np.ones(N, np.int32)]
        if htdf_any:
            cols += [intra[idx].astype(np.int32),
                     job.cu_htdf_idx[idx], job.cu_htdf_avail[idx]]
        rows = np.stack(cols, 1).astype(np.int32)
        # wavefront schedule: dependency levels -> per-size-class batches
        from .wavefront import group_wavefront, level_scan_cus
        levels = level_scan_cus(fs, job, idx, chroma=chroma)
        # L is pow2-bucketed PER FRAME (not monotone like _rows): an
        # all-intra frame needs ~1000 steps, inter frames a few dozen —
        # monotone growth would pad every inter frame to the intra L
        return group_wavefront(rows, levels, rows[:, 2], rows[:, 3],
                               lambda name, v: _pow2(v))


def _chroma_ver_waves(fs, job):
    """Host schedule for the SUCO-order chroma vertical-edge pass.

    Replays the per-CU deblock visit (ops/ref_numpy._cu_deblock_order with
    the pass-local coded-map gating, ref: src_base/xevd_df.c:388-545) and
    assigns each chroma edge a rank within its SCU row.  Edges in different
    rows never interact (the filter writes 2 chroma rows per SCU), so wave
    k = {edges of rank k} has at most one edge per row.  Returns int32
    [n_waves, h_scu, 4] = (row_px, col_px, st_u, st_v), or None."""
    h_scu, w_scu = fs.h_scu, fs.w_scu
    w, h = fs.w, fs.h
    h_scu_max = (h + 3) >> 2
    cod = np.zeros((h_scu, w_scu), np.uint8)
    nxt = np.zeros(h_scu, np.int32)
    dvu, dvv = job.db_ver_u, job.db_ver_v
    edges = []
    for i in range(fs.num_cus()):
        tree = fs.cu_tree[i]
        x0, y0 = fs.cu_x[i], fs.cu_y[i]
        cuw = 1 << fs.cu_log2w[i]
        cuh = 1 << fs.cu_log2h[i]
        xs_, ys_ = x0 >> 2, y0 >> 2
        scuw, scuh = cuw >> 2, cuh >> 2
        if tree != 1:  # do_chroma
            cands = []
            if 0 < x0 < w and cod[ys_, xs_ - 1]:
                cands.append(xs_)
            if x0 + cuw < w and xs_ + scuw < w_scu and cod[ys_, xs_ + scuw]:
                cands.append(xs_ + scuw)
            for xp in cands:
                for ys in range(ys_, min(ys_ + scuh, h_scu_max)):
                    su = int(dvu[ys, xp])
                    sv = int(dvv[ys, xp])
                    if su or sv:
                        edges.append((int(nxt[ys]), ys, xp, su, sv))
                        nxt[ys] += 1
        cod[ys_:ys_ + scuh, xs_:xs_ + scuw] = 1
    if not edges:
        return None
    n_waves = int(nxt.max())
    waves = np.full((n_waves, h_scu, 4), 1 << 20, np.int32)
    for r, ys, xp, su, sv in edges:
        waves[r, ys] = (ys * 2, xp * 2, su, sv)
    return waves


def _mv_clip(x, y, pic_w, pic_h, w, h, mv):
    """(ref: src_base/xevd_mc.c:435-467)"""
    mvx, mvy = int(mv[0]), int(mv[1])
    x4, y4, w4, h4 = x << 2, y << 2, w << 2, h << 2
    lo = -(T.MAX_CU_SIZE << 2)
    hix = (pic_w - 1 + T.MAX_CU_SIZE) << 2
    hiy = (pic_h - 1 + T.MAX_CU_SIZE) << 2
    ox, oy = mvx, mvy
    if x4 + mvx < lo:
        ox = lo - x4
    if y4 + mvy < lo:
        oy = lo - y4
    if x4 + mvx + w4 - 4 > hix:
        ox = hix - x4 - w4 + 4
    if y4 + mvy + h4 - 4 > hiy:
        oy = hiy - y4 - h4 + 4
    return ox, oy
