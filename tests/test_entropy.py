"""Unit tests: bit reader/writer and SBAC encoder/decoder round-trips."""
import numpy as np
import pytest

from xevd_tpu.bitstream import BitReader, BitWriter
from xevd_tpu.sbac import Sbac, SbacCtx


def test_bitrw_roundtrip():
    rng = np.random.default_rng(0)
    bw = BitWriter()
    vals = []
    for _ in range(500):
        kind = rng.integers(0, 3)
        if kind == 0:
            n = int(rng.integers(1, 25))
            v = int(rng.integers(0, 1 << n))
            bw.write(v, n)
            vals.append(("f", n, v))
        elif kind == 1:
            v = int(rng.integers(0, 1000))
            bw.write_ue(v)
            vals.append(("ue", None, v))
        else:
            v = int(rng.integers(-500, 500))
            bw.write_se(v)
            vals.append(("se", None, v))
    bw.align()
    bs = BitReader(bw.to_bytes())
    for kind, n, v in vals:
        if kind == "f":
            assert bs.read(n) == v
        elif kind == "ue":
            assert bs.read_ue() == v
        else:
            assert bs.read_se() == v


def test_sbac_roundtrip():
    import sys
    from .conftest import REPO
    sys.path.insert(0, str(REPO / "tools"))
    from evc_enc import SbacEnc

    rng = np.random.default_rng(42)
    enc = SbacEnc()
    bins = []
    for _ in range(5000):
        kind = int(rng.integers(0, 3))
        if kind == 0:
            b = int(rng.integers(0, 2))
            ctx_i = int(rng.integers(0, 2))
            enc.encode_bin(enc.ctx.skip_flag, ctx_i, b)
            bins.append(("ctx", ctx_i, b))
        elif kind == 1:
            b = int(rng.integers(0, 2))
            enc.encode_bin_ep(b)
            bins.append(("ep", None, b))
        else:
            v = int(rng.integers(0, 40))
            enc.unary(enc.ctx.run, 0, 2, v)
            bins.append(("unary", None, v))
    enc.encode_bin_trm(1)
    payload = enc.finish()

    bs = BitReader(payload)
    dec = Sbac(bs)
    dec.reset(bs)
    for kind, ctx_i, v in bins:
        if kind == "ctx":
            assert dec.decode_bin(dec.ctx.skip_flag, ctx_i) == v
        elif kind == "ep":
            assert dec.decode_bin_ep() == v
        else:
            assert dec.read_unary_sym(dec.ctx.run, 0, 2) == v
    assert dec.decode_bin_trm() == 1


def test_abs_mvd_roundtrip():
    import sys
    from .conftest import REPO
    sys.path.insert(0, str(REPO / "tools"))
    from evc_enc import SbacEnc

    vals = list(range(0, 40)) + [100, 1000, 5000]
    enc = SbacEnc()
    for v in vals:
        enc.abs_mvd(enc.ctx.mvd, v)
    enc.encode_bin_trm(1)
    bs = BitReader(enc.finish())
    dec = Sbac(bs)
    dec.reset(bs)

    def read_abs_mvd():
        code = dec.decode_bin(dec.ctx.mvd, 0)
        if code:
            return 0
        length = 0
        while not (code & 1):
            if length == 0:
                code = dec.decode_bin(dec.ctx.mvd, 0)
            else:
                code = dec.decode_bin_ep()
            length += 1
        val = (1 << length) - 1
        while length:
            length -= 1
            val += dec.decode_bin_ep() << length
        return val

    for v in vals:
        assert read_abs_mvd() == v
