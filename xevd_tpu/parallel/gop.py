"""Multi-chip scaling: GOP-parallel decode of a real bitstream over a
`jax.sharding.Mesh`.

The reference decoder is single-process shared-memory (ref:
src_base/xevd_tp.c thread pool); its parallel axes are tiles and CTU-row
wavefronts.  The TPU-native scaling axis is coarser: random access starts
at IDR boundaries, so the GOPs of a stream are embarrassingly parallel.
Here that is realized for real, not as a demo:

  host   — each GOP's bitstream is entropy-decoded + derived serially
           (the inherently sequential CABAC part), producing the same flat
           per-frame device payloads the single-chip JaxPixelBackend ships
           (ops/pipeline.pack_frame)
  device — ONE jitted SPMD step over the mesh decodes all GOPs: the GOP
           batch axis is sharded over the 'gop' mesh axis, every frame of
           the GOP runs the full pixel pipeline (ITDQ -> MC -> recon ->
           intra scan -> deblock) with the reference-picture planes held
           in a device-resident DPB carry — reference windows never leave
           HBM, and a psum'd global checksum rides the ICI.

Bit-exactness is asserted by `decode_gops_sharded`: the sharded decode's
per-frame MD5s must equal the serial numpy-oracle decode of the same
stream (tests/test_multichip.py runs this on an 8-device CPU mesh).
"""
from __future__ import annotations

import hashlib
from functools import partial

import numpy as np


def make_mesh(n_devices: int | None = None, axis: str = "gop"):
    import jax
    from jax.sharding import Mesh
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def _nalu_walk(data: bytes):
    from .. import NAL_UNIT_LENGTH_BYTE, info
    pos = 0
    while pos + NAL_UNIT_LENGTH_BYTE <= len(data):
        ln, _, _ = info(data[pos:pos + 6])
        pos += NAL_UNIT_LENGTH_BYTE
        yield data[pos:pos + ln]
        pos += ln


def _capture_gop(data: bytes, packer, collect: bool):
    """Serially decode one GOP with the numpy oracle, capturing per-frame
    device packs (pass 1: only grow the packer's sticky bucket schedule;
    pass 2: collect packs + oracle planes + POCs for the sharded replay)."""
    from ..decoder import Decoder, NumpyPixelBackend

    out = []
    holder = {}

    class _Cap(NumpyPixelBackend):
        def decode_frame(self, job, sps, refp):
            pack = packer.pack_frame(job, sps, refp)
            pack["refs"] = None            # device DPB substitutes these
            rec = NumpyPixelBackend.decode_frame(self, job, sps, refp)
            if collect:
                poc = holder["dec"].poc.poc_val
                out.append({"pack": pack, "rec": rec, "poc": poc,
                            "fs": job.fs})
            return rec

    dec = Decoder(backend=_Cap())
    holder["dec"] = dec
    for nalu in _nalu_walk(data):
        dec.decode(nalu)
    return out


def _crop_md5(y, u, v, h, w):
    """MD5 over the cropped 4:2:0 planes (uint16 LE, like the picture
    signature in src_base/xevd_util.c:985-1002)."""
    m = hashlib.md5()
    for p, ph, pw in ((y, h, w), (u, h >> 1, w >> 1), (v, h >> 1, w >> 1)):
        m.update(np.ascontiguousarray(
            np.asarray(p[:ph, :pw]).astype("<u2")).tobytes())
    return m.hexdigest()


def decode_gops_sharded(streams: list[bytes], mesh=None,
                        n_devices: int | None = None, verbose=False):
    """Decode `streams` (one independent IDR-led GOP each) with ONE jitted
    SPMD step sharded over the mesh's 'gop' axis.  Returns
    (device_md5s, serial_md5s): per-GOP, per-frame plane digests — equal
    iff the sharded decode is bit-exact vs the serial oracle."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from .. import tables as T
    from ..ops.pipeline import JaxPixelBackend, run_frame_device

    if mesh is None:
        mesh = make_mesh(n_devices)
    axis = mesh.axis_names[0]
    G = len(streams)
    assert G % mesh.devices.size == 0, "GOP count must tile the mesh"

    packer = JaxPixelBackend()
    for s in streams:                      # pass 1: union bucket schedule
        _capture_gop(s, packer, collect=False)
    caps = [_capture_gop(s, packer, collect=True) for s in streams]

    # Variable GOP lengths: pad shorter GOPs with inert copies of their
    # last frame (output ignored; a pad frame's garbage planes enter only
    # DPB-carry slots that later pad frames of the same GOP would read).
    F = max(len(c) for c in caps)
    valid = [[t < len(caps[g]) for t in range(F)] for g in range(G)]
    for g in range(G):
        while len(caps[g]) < F:
            last = caps[g][-1]
            pad_fr = dict(last)
            pad_fr["pack"] = dict(last["pack"],
                                  payload=last["pack"]["payload"].copy())
            caps[g].append(pad_fr)
    fs0 = caps[0][0]["fs"]
    h, w = fs0.h, fs0.w
    pad, pad_c = T.PIC_PAD_SIZE_L, T.PIC_PAD_SIZE_C

    # --- stack per-frame packs over the GOP axis; statics must agree -----
    statics, payloads, icus, dbsts, deltas_t = [], [], [], [], []
    coefs_t = []
    depth = 1
    for t in range(F):
        frames = [caps[g][t] for g in range(G)]
        # has_inter may differ per GOP (a P frame can come out all-intra);
        # running MC over all-padded buckets is a no-op, so lift to any()
        has_any = any(fr["pack"]["static"]["has_inter"] for fr in frames)
        st = dict(frames[0]["pack"]["static"], has_inter=has_any)
        for fr in frames[1:]:
            assert dict(fr["pack"]["static"], has_inter=has_any) == st, \
                "GOPs must share frame structure for SPMD decode"
        # ref slots -> DPB recency indices (poc deltas).  GOPs may use a
        # different subset of refs (a P frame might only reference the
        # nearest picture), so per-GOP compact slot numbers diverge —
        # remap every GOP's packed slot fields onto the union, in place.
        per_gop = [[fr["poc"] - s_[2] for s_ in fr["pack"]["slots"]]
                   for fr in frames]
        union = sorted({d for ds in per_gop for d in ds}) \
            or ([1] if has_any else [])
        assert all(d >= 1 for d in union)
        for fr, ds in zip(frames, per_gop):
            if not ds:
                continue
            lut = np.array([union.index(d) for d in ds], np.int32)
            pay = fr["pack"]["payload"]
            for name, off, shape in st["sig_m"]:
                rows = pay[off:off + shape[0] * shape[1]].reshape(shape)
                rows[:, 0] = lut[np.clip(rows[:, 0], 0, len(lut) - 1)]
        deltas = union
        if deltas:
            depth = max(depth, max(deltas))
        statics.append(st)
        deltas_t.append(deltas)
        payloads.append(np.stack([fr["pack"]["payload"] for fr in frames]))
        coefs_t.append(tuple(
            np.stack([fr["pack"]["coefs"][c] for fr in frames])
            for c in range(3)))
        ic = [fr["pack"]["icu"] for fr in frames]
        if any(x is not None for x in ic):
            ncol = next(x.shape[1] for x in ic if x is not None)
            nrow = next(x.shape[0] for x in ic if x is not None)
            ic = [x if x is not None else np.zeros((nrow, ncol), np.int32)
                  for x in ic]
            icus.append(np.stack(ic))
        else:
            icus.append(None)
        db = [fr["pack"]["dbst"] for fr in frames]
        assert all((x is None) == (db[0] is None) for x in db)
        dbsts.append(None if db[0] is None else np.stack(db))
        assert frames[0]["pack"]["waves"] is None, \
            "SUCO wave schedule not supported in the GOP-sharded path yet"

    shard = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    D = depth
    hp, wp = h + 2 * pad, w + 2 * pad
    hpc, wpc = (h >> 1) + 2 * pad_c, (w >> 1) + 2 * pad_c

    def sh_tree(tree):
        return jax.tree.map(lambda _: shard, tree)

    args = (tuple(jnp.asarray(p) for p in payloads),
            tuple(None if x is None else jnp.asarray(x) for x in icus),
            tuple(None if x is None else jnp.asarray(x) for x in dbsts),
            tuple(tuple(jnp.asarray(c) for c in cs) for cs in coefs_t))

    @partial(jax.jit,
             in_shardings=sh_tree(args),
             out_shardings=(tuple((shard,) * 3 for _ in range(F)), rep))
    def gop_step(payloads, icus, dbsts, coefs):
        # device-resident DPB: last D decoded pictures per GOP, in HBM
        dpb_y = jnp.zeros((D, G, hp, wp), jnp.int16)
        dpb_u = jnp.zeros((D, G, hpc, wpc), jnp.int16)
        dpb_v = jnp.zeros((D, G, hpc, wpc), jnp.int16)
        outs = []
        for t in range(F):
            st = statics[t]
            if st["has_inter"]:
                ds = [d - 1 for d in deltas_t[t]]
                refs = (dpb_y[jnp.array(ds)], dpb_u[jnp.array(ds)],
                        dpb_v[jnp.array(ds)])
                r_ax = 1
            else:
                refs, r_ax = None, None
            fn = lambda p, i, s, r, c, st=st: run_frame_device(
                p, i, s, None, r, st, None, c)
            py, pu, pv = jax.vmap(fn, in_axes=(0, 0, 0, r_ax, 0))(
                payloads[t], icus[t], dbsts[t], refs, coefs[t])
            outs.append((py, pu, pv))
            dpb_y = jnp.concatenate([py[None], dpb_y[:-1]], 0)
            dpb_u = jnp.concatenate([pu[None], dpb_u[:-1]], 0)
            dpb_v = jnp.concatenate([pv[None], dpb_v[:-1]], 0)
        # a cross-GOP global stat: forces an all-reduce over the mesh
        checksum = sum(jnp.sum(o[0].astype(jnp.int32)) for o in outs)
        return tuple(outs), checksum

    outs, checksum = gop_step(*args)
    jax.block_until_ready(outs)

    device_md5s, serial_md5s = [], []
    for g in range(G):
        dev_g, ser_g = [], []
        for t in range(F):
            if not valid[g][t]:
                continue                    # padding frame of a short GOP
            py, pu, pv = (np.asarray(outs[t][0][g]),
                          np.asarray(outs[t][1][g]),
                          np.asarray(outs[t][2][g]))
            dev_g.append(_crop_md5(py[pad:, pad:], pu[pad_c:, pad_c:],
                                   pv[pad_c:, pad_c:], h, w))
            ry, ru, rv = caps[g][t]["rec"]
            ser_g.append(_crop_md5(ry, ru, rv, h, w))
        device_md5s.append(dev_g)
        serial_md5s.append(ser_g)
    if verbose:
        for g in range(G):
            for t in range(len(device_md5s[g])):
                ok = device_md5s[g][t] == serial_md5s[g][t]
                print(f"gop {g} frame {t}: device {device_md5s[g][t][:12]} "
                      f"serial {serial_md5s[g][t][:12]} "
                      f"{'OK' if ok else 'MISMATCH'}")
        print(f"ici checksum: {int(checksum)}")
    return device_md5s, serial_md5s


def gen_gop_streams(g: int, w: int = 64, h: int = 64, frames: int = 3,
                    qp: int = 30, variable: bool = False):
    """Generate g independent IDR-led IPPP GOP bitstreams (tools/evc_enc).
    With `variable`, GOP g_ has frames + (g_ % 3) frames — exercising the
    non-uniform-length sharded decode."""
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).resolve().parents[2] / "tools"))
    import evc_enc
    return [evc_enc.encode_stream(
        w, h, frames + (g_ % 3 if variable else 0), qp,
        1000 + 7 * g_, "IPPP", 0.5)
            for g_ in range(g)]
