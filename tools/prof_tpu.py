"""Time-split profile of the decode loop on the live device (axon TPU or
CPU): entropy+derive vs pack vs device dispatch."""
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np

from xevd_tpu import NAL_UNIT_LENGTH_BYTE, info
from xevd_tpu.decoder import Decoder
import xevd_tpu.ops.pipeline as PL

STREAM = REPO / "tests" / "fixtures" / "b1080p_ippp.evc"
data = STREAM.read_bytes()

T = {"pack": 0.0, "step": 0.0}


class TimedBackend(PL.JaxPixelBackend):
    def decode_frame(self, job, sps, refp):
        t0 = time.time()
        pack = self.pack_frame(job, sps, refp)
        t1 = time.time()
        ry, ru, rv = pack["refs"]
        st_items = tuple(sorted(pack["static"].items()))
        out = PL._frame_step(st_items, pack["payload"], pack["icu"],
                             pack["dbst"], pack["waves"], ry, ru, rv)
        t2 = time.time()
        T["pack"] += t1 - t0
        T["step"] += t2 - t1
        return out


def decode_once():
    dec = Decoder(backend=TimedBackend())
    pos = 0
    while pos + NAL_UNIT_LENGTH_BYTE <= len(data):
        ln, _, _ = info(data[pos:pos + 6])
        pos += NAL_UNIT_LENGTH_BYTE
        dec.decode(data[pos:pos + ln])
        pos += ln
    return dec


decode_once()
for k in T:
    T[k] = 0.0
import cProfile, pstats
t0 = time.time()
pr = cProfile.Profile()
pr.enable()
decode_once()
pr.disable()
el = time.time() - t0
print(f"total {el*1000/16:.1f} ms/frame | pack {T['pack']*1000/16:.1f} | "
      f"step-dispatch {T['step']*1000/16:.1f}")
st = pstats.Stats(pr)
st.sort_stats("cumulative").print_stats(25)
