"""Profile the host side of the jax-backend decode loop on 1080p IPPP."""
import cProfile
import pstats
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

from xevd_tpu import NAL_UNIT_LENGTH_BYTE, info
from xevd_tpu.decoder import Decoder
from xevd_tpu.ops.pipeline import JaxPixelBackend

STREAM = REPO / "tests" / "fixtures" / "b1080p_ippp.evc"
data = STREAM.read_bytes()


def decode_once():
    dec = Decoder(backend=JaxPixelBackend())
    pos = 0
    n = 0
    while pos + NAL_UNIT_LENGTH_BYTE <= len(data):
        ln, _, _ = info(data[pos:pos + 6])
        pos += NAL_UNIT_LENGTH_BYTE
        dec.decode(data[pos:pos + ln])
        pos += ln
    return n


decode_once()  # warm up jit
t0 = time.time()
pr = cProfile.Profile()
pr.enable()
decode_once()
pr.disable()
el = time.time() - t0
print(f"total {el*1000:.0f} ms for 16 frames = {el*1000/16:.1f} ms/frame")
st = pstats.Stats(pr)
st.sort_stats("cumulative").print_stats(35)
