"""JAX kernels vs the numpy scalar oracle on random inputs (CPU backend)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from xevd_tpu import tables as T  # noqa: E402
from xevd_tpu.ops import jax_deblock as JD  # noqa: E402
from xevd_tpu.ops import jax_itdq as JQ  # noqa: E402
from xevd_tpu.ops import jax_mc as JM  # noqa: E402
from xevd_tpu.ops import ref_numpy as RN  # noqa: E402


@pytest.mark.parametrize("log2", [2, 3, 4, 5, 6])
@pytest.mark.parametrize("bd", [8, 10])
def test_itdq_bucket_matches_oracle(log2, bd):
    rng = np.random.default_rng(log2 * 100 + bd)
    size = 1 << log2
    n = 9
    coef = rng.integers(-2000, 2000, size=(n, size, size)).astype(np.int32)
    # extreme values too
    coef[0, 0, 0] = 32767
    coef[1, 0, 0] = -32768
    qps = rng.integers(0, 52 + 6 * (bd - 8), size=n)
    scales = np.array([RN.qp_scale(int(q)) for q in qps], np.int32)
    got = np.asarray(JQ.itdq_bucket(jnp.asarray(coef), jnp.asarray(scales),
                                    log2, log2, bd))
    for i in range(n):
        want = RN.itdq_block(coef[i], log2, log2, int(scales[i]), bd)
        np.testing.assert_array_equal(got[i], want, err_msg=f"block {i}")


@pytest.mark.parametrize("case", [0, 1, 2, 3])
@pytest.mark.parametrize("bd", [8, 10])
def test_mc_luma_matches_oracle(case, bd):
    rng = np.random.default_rng(case * 10 + bd)
    H = W = 128
    ref = rng.integers(0, (1 << bd), size=(H, W)).astype(np.int16)
    n, s = 8, 8
    ix = rng.integers(8, W - 24, n)
    iy = rng.integers(8, H - 24, n)
    fx = rng.integers(1, 16, n) if case in (1, 3) else np.zeros(n, int)
    fy = rng.integers(1, 16, n) if case in (2, 3) else np.zeros(n, int)
    gx = (ix * 16 + fx).astype(np.int32)
    gy = (iy * 16 + fy).astype(np.int32)
    slot = np.zeros(n, np.int32)
    got = np.asarray(JM.mc_bucket(
        (jnp.asarray(ref[None]), jnp.asarray(slot), jnp.asarray(gx),
         jnp.asarray(gy)), case, s, s, bd, True))
    for i in range(n):
        want = RN.mc_luma(ref, int(gx[i]), int(gy[i]), int(fx[i]), int(fy[i]),
                          s, s, bd, 0)
        np.testing.assert_array_equal(got[i], want, err_msg=f"block {i}")


@pytest.mark.parametrize("case", [0, 1, 2, 3])
def test_mc_chroma_matches_oracle(case):
    bd = 8
    rng = np.random.default_rng(77 + case)
    H = W = 96
    ref = rng.integers(0, 256, size=(H, W)).astype(np.int16)
    n, s = 6, 4
    ix = rng.integers(4, W - 12, n)
    iy = rng.integers(4, H - 12, n)
    fx = rng.integers(1, 32, n) if case in (1, 3) else np.zeros(n, int)
    fy = rng.integers(1, 32, n) if case in (2, 3) else np.zeros(n, int)
    gx = (ix * 32 + fx).astype(np.int32)
    gy = (iy * 32 + fy).astype(np.int32)
    slot = np.zeros(n, np.int32)
    got = np.asarray(JM.mc_bucket(
        (jnp.asarray(ref[None]), jnp.asarray(slot), jnp.asarray(gx),
         jnp.asarray(gy)), case, s, s, bd, False))
    for i in range(n):
        want = RN.mc_chroma(ref, int(gx[i]), int(gy[i]), int(fx[i]),
                            int(fy[i]), s, s, bd)
        np.testing.assert_array_equal(got[i], want, err_msg=f"block {i}")


def test_luma_deblock_passes_match_oracle():
    rng = np.random.default_rng(5)
    H = W = 64
    bd = 8
    plane = rng.integers(0, 256, size=(H, W)).astype(np.int16)
    h_scu, w_scu = H // 4, W // 4
    st = (rng.integers(0, 4, size=(h_scu, w_scu)) *
          rng.integers(0, 2, size=(h_scu, w_scu))).astype(np.int32) * 4

    # oracle: apply per-edge
    want = plane.copy()
    for xs in range(1, w_scu):
        for ys in range(h_scu):
            s = int(st[ys, xs])
            if not s:
                continue
            rows = slice(ys * 4, ys * 4 + 4)
            x = xs * 4
            A, B, C, D = (want[rows, x - 2], want[rows, x - 1],
                          want[rows, x], want[rows, x + 1])
            A, B, C, D = RN.deblock_luma_edge(A, B, C, D, s, bd)
            want[rows, x - 2], want[rows, x - 1] = A, B
            want[rows, x], want[rows, x + 1] = C, D

    st_rows = np.repeat(st, 4, axis=0)
    got = np.asarray(JD.luma_ver_pass(jnp.asarray(plane),
                                      jnp.asarray(st_rows), bd))
    np.testing.assert_array_equal(got, want)


def test_chroma_ver_cascade_matches_oracle():
    rng = np.random.default_rng(6)
    H, W = 32, 32
    bd = 8
    plane = rng.integers(0, 256, size=(H, W)).astype(np.int16)
    n_edges = W // 2
    st = (rng.integers(0, 3, size=(H // 2, n_edges)) * 4).astype(np.int32)

    # oracle: left-to-right cascade per edge column
    want = plane.copy()
    for i in range(1, n_edges):
        x = 2 * i
        s_col = np.repeat(st[:, i], 2)
        A, B, C, D = (want[:, x - 2].astype(np.int32),
                      want[:, x - 1].astype(np.int32),
                      want[:, x].astype(np.int32),
                      want[:, x + 1].astype(np.int32))
        B2, C2 = RN.deblock_chroma_edge(A, B, C, D, s_col, bd)
        want[:, x - 1] = B2
        want[:, x] = C2

    st_rows = np.repeat(st, 2, axis=0)
    got = np.asarray(JD.chroma_ver_pass(jnp.asarray(plane),
                                        jnp.asarray(st_rows), bd))
    np.testing.assert_array_equal(got, want)
