"""Debug: numpy-vs-jax with deblocking forcibly disabled, to bisect whether
a divergence lives in the deblock stage or earlier (itdq/mc/intra/recon)."""
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

import xevd_tpu.decoder as D

_orig_parse_sh = D.parse_sh


def patched_parse_sh(bs, sps, pps, nut):
    sh = _orig_parse_sh(bs, sps, pps, nut)
    sh.deblocking_filter_on = 0
    return sh


D.parse_sh = patched_parse_sh


def decode(stream, out, backend):
    from xevd_tpu.app import main
    rc = main(["-i", str(stream), "-o", str(out), "-v", "0",
               "--output-bit-depth", "10", "--backend", backend])
    assert rc == 0


def main_cli():
    stream = Path(sys.argv[1])
    w, h = int(sys.argv[2]), int(sys.argv[3])
    a, b = Path("/tmp/_sd_np.yuv"), Path("/tmp/_sd_jax.yuv")
    for p in (a, b):
        if p.exists():
            p.unlink()
    decode(stream, a, "numpy")
    decode(stream, b, "jax")
    da = np.fromfile(a, np.uint16)
    db = np.fromfile(b, np.uint16)
    fsz = w * h + 2 * (w // 2) * (h // 2)
    nf = len(da) // fsz
    csz = (w // 2) * (h // 2)
    print(f"[deblock OFF] {nf} frames, equal={np.array_equal(da, db)}")
    for f in range(nf):
        fa = da[f * fsz:(f + 1) * fsz]
        fb = db[f * fsz:(f + 1) * fsz]
        if np.array_equal(fa, fb):
            continue
        planes_a = (fa[:w * h].reshape(h, w),
                    fa[w * h:w * h + csz].reshape(h // 2, w // 2),
                    fa[w * h + csz:].reshape(h // 2, w // 2))
        planes_b = (fb[:w * h].reshape(h, w),
                    fb[w * h:w * h + csz].reshape(h // 2, w // 2),
                    fb[w * h + csz:].reshape(h // 2, w // 2))
        for name, pa, pb in zip("YUV", planes_a, planes_b):
            if np.array_equal(pa, pb):
                continue
            dy, dx = np.nonzero(pa != pb)
            cells = sorted({(int(y) // 4 * 4, int(x) // 4 * 4)
                            for y, x in zip(dy, dx)})
            print(f"frame {f} plane {name}: {len(dy)} diffs, cells "
                  f"{cells[:30]}{'...' if len(cells) > 30 else ''}")
    return 0


if __name__ == "__main__":
    sys.exit(main_cli())
