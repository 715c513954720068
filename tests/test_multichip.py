"""GOP-parallel SPMD decode over a multi-device mesh (virtual CPU devices,
see conftest).  The sharded decode replays real bitstreams through one
jitted step with the DPB device-resident per GOP shard; every frame's MD5
must equal the serial numpy-oracle decode."""
import jax
import pytest

from xevd_tpu.parallel.gop import (decode_gops_sharded, gen_gop_streams,
                                   make_mesh)


@pytest.mark.parametrize("n_devices,gops", [(2, 2), (8, 8)])
def test_gop_sharded_bit_exact(n_devices, gops):
    if len(jax.devices()) < n_devices:
        pytest.skip(f"need {n_devices} devices")
    mesh = make_mesh(n_devices)
    streams = gen_gop_streams(gops, w=64, h=64, frames=3)
    dev, ser = decode_gops_sharded(streams, mesh=mesh)
    assert dev == ser


def test_gop_sharded_multiple_gops_per_device():
    if len(jax.devices()) < 4:
        pytest.skip("need 4 devices")
    mesh = make_mesh(4)
    streams = gen_gop_streams(8, w=64, h=64, frames=2)
    dev, ser = decode_gops_sharded(streams, mesh=mesh)
    assert dev == ser


def test_gop_sharded_variable_lengths():
    """Non-uniform GOP lengths (2..4 frames): short GOPs are padded with
    inert frames inside the SPMD step; outputs compare per real frame."""
    if len(jax.devices()) < 4:
        pytest.skip("need 4 devices")
    mesh = make_mesh(4)
    streams = gen_gop_streams(4, w=64, h=64, frames=2, variable=True)
    dev, ser = decode_gops_sharded(streams, mesh=mesh)
    assert dev == ser
    assert [len(g) for g in dev] == [2, 3, 4, 2]
