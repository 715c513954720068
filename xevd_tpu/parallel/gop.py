"""Multi-chip scaling: GOP/frame-parallel decode over a device mesh.

The reference decoder is single-process shared-memory (ref:
src_base/xevd_tp.c thread pool); its parallel axes are tiles and CTU-row
wavefronts.  The TPU-native scaling axis is coarser: frames of a GOP and
independent GOPs are sharded over a `jax.sharding.Mesh`, with each device
running the batched pixel pipeline on its shard and ICI collectives
carrying cross-shard data (DPB reference windows at GOP seams, checksums,
bitrate stats).  Random access starts at IDR boundaries, so GOPs are
embarrassingly parallel — the sharding below is the transport for that.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import tables as T
from ..ops import jax_deblock as JD


def make_mesh(n_devices: int | None = None, axis: str = "gop") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def _recon_one(pred, resid, bi_mask, st_ver, st_hor, bit_depth):
    """Single-frame recon + deblock (jittable, used under shard_map/vmap)."""
    maxv = (1 << bit_depth) - 1
    p = jnp.where(bi_mask, (pred + 1) >> 1, pred)
    t = (p + resid.astype(jnp.int32)).astype(jnp.int16).astype(jnp.int32)
    rec = jnp.clip(t, 0, maxv).astype(jnp.int16)
    rec = JD.luma_ver_pass(rec, st_ver, bit_depth)
    rec = JD.luma_hor_pass(rec, st_hor, bit_depth)
    return rec


def gop_parallel_step(mesh: Mesh, bit_depth: int = 8):
    """Build the jitted multi-chip decode step: a batch of G frames
    (leading axis) sharded over the mesh's 'gop' axis; each device runs the
    pixel pipeline on its frames, then a psum'd activity stat rides the ICI.

    Returns fn(pred [G,H,W] i32, resid [G,H,W] i16, bi [G,H,W] bool,
               st_ver [G,H,W//4] i32, st_hor [G,H//4,W] i32)
         -> (rec [G,H,W] i16 sharded, checksums [G] i64-ish)
    """
    axis = mesh.axis_names[0]
    shard = NamedSharding(mesh, P(axis))

    @partial(jax.jit,
             in_shardings=(shard, shard, shard, shard, shard),
             out_shardings=(shard, NamedSharding(mesh, P())))
    def step(pred, resid, bi, st_ver, st_hor):
        rec = jax.vmap(
            lambda p, r, b, sv, sh: _recon_one(p, r, b, sv, sh, bit_depth)
        )(pred, resid, bi, st_ver, st_hor)
        # cross-chip reduction over the frame batch (ICI collective):
        # total sample activity — stands in for DPB seam/stat exchange.
        checksum = jnp.sum(rec.astype(jnp.int32) & 0xFF)
        return rec, checksum

    return step


def demo_inputs(g: int, h: int, w: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    pred = rng.integers(0, 255, size=(g, h, w)).astype(np.int32)
    resid = rng.integers(-64, 64, size=(g, h, w)).astype(np.int16)
    bi = np.zeros((g, h, w), bool)
    st_ver = (rng.integers(0, 2, size=(g, h, w // 4)) * 4).astype(np.int32)
    st_hor = (rng.integers(0, 2, size=(g, h // 4, w)) * 4).astype(np.int32)
    return pred, resid, bi, st_ver, st_hor
