"""Debug helper: decode a stream with numpy and jax backends and report the
first differing frame/plane/pixels, to localize device-path divergences."""
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")


def decode(stream, out, backend):
    from xevd_tpu.app import main
    rc = main(["-i", str(stream), "-o", str(out), "-v", "0",
               "--output-bit-depth", "10", "--backend", backend])
    assert rc == 0


def main_cli():
    stream = Path(sys.argv[1])
    w, h = int(sys.argv[2]), int(sys.argv[3])
    a = Path("/tmp/_dbg_np.yuv")
    b = Path("/tmp/_dbg_jax.yuv")
    for p in (a, b):
        if p.exists():
            p.unlink()
    decode(stream, a, "numpy")
    decode(stream, b, "jax")
    da = np.fromfile(a, np.uint16)
    db = np.fromfile(b, np.uint16)
    fsz = w * h + 2 * (w // 2) * (h // 2)
    nf = len(da) // fsz
    print(f"{nf} frames, equal={np.array_equal(da, db)}")
    for f in range(nf):
        fa = da[f * fsz:(f + 1) * fsz]
        fb = db[f * fsz:(f + 1) * fsz]
        if np.array_equal(fa, fb):
            continue
        ya, ua, va = fa[:w * h].reshape(h, w), \
            fa[w * h:w * h + fsz - w * h - (w // 2) * (h // 2)].reshape(h // 2, w // 2), \
            fa[w * h + (w // 2) * (h // 2):].reshape(h // 2, w // 2)
        yb = fb[:w * h].reshape(h, w)
        ub = fb[w * h:w * h + (w // 2) * (h // 2)].reshape(h // 2, w // 2)
        vb = fb[w * h + (w // 2) * (h // 2):].reshape(h // 2, w // 2)
        for name, pa, pb in (("Y", ya, yb), ("U", ua, ub), ("V", va, vb)):
            if np.array_equal(pa, pb):
                continue
            dy, dx = np.nonzero(pa != pb)
            print(f"frame {f} plane {name}: {len(dy)} diffs, "
                  f"rows {dy.min()}..{dy.max()} cols {dx.min()}..{dx.max()}")
            print("  first at", dy[0], dx[0], "np=", pa[dy[0], dx[0]],
                  "jax=", pb[dy[0], dx[0]])
            # bounding boxes of diff clusters (4x4 grid)
            cells = sorted({(int(y) // 4 * 4, int(x) // 4 * 4)
                            for y, x in zip(dy, dx)})
            print("  4x4 cells:", cells[:40],
                  "..." if len(cells) > 40 else "")
    return 0


if __name__ == "__main__":
    sys.exit(main_cli())
