"""Benchmark: decoded frames/s of the JAX pixel backend vs the reference
CPU decoder on the same stream.  Prints ONE JSON line.

The stream is generated deterministically (tools/evc_enc); the reference
baseline fps is measured live when refbin/xevdb_app exists, else a recorded
constant is used.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

W, H, FRAMES, QP, SEED = 176, 144, 8, 30, 123
RECORDED_REF_FPS = 1244.0  # xevdb_app -m 8 on this stream (this host, r1)


def main():
    import evc_enc
    stream_path = Path("/tmp/bench_stream.evc")
    if not stream_path.exists():
        stream_path.write_bytes(
            evc_enc.encode_stream(W, H, FRAMES, QP, SEED, "IPPP"))

    # reference baseline (best-effort)
    ref_fps = RECORDED_REF_FPS
    ref_bin = REPO / "refbin" / "xevdb_app"
    if ref_bin.exists():
        try:
            r = subprocess.run(
                [str(ref_bin), "-i", str(stream_path), "-o",
                 "/tmp/bench_ref.yuv", "-m", "8"],
                capture_output=True, text=True, timeout=300)
            for line in r.stdout.splitlines():
                if "frames/sec" in line:
                    ref_fps = float(line.split("=")[-1].split()[0])
        except Exception:
            pass

    from xevd_tpu.decoder import Decoder
    from xevd_tpu.ops.pipeline import JaxPixelBackend
    from xevd_tpu import NAL_UNIT_LENGTH_BYTE, info

    data = stream_path.read_bytes()

    def decode_once():
        dec = Decoder(backend=JaxPixelBackend())
        pos = 0
        n = 0
        while pos + NAL_UNIT_LENGTH_BYTE <= len(data):
            ln, _, _ = info(data[pos:pos + 6])
            pos += NAL_UNIT_LENGTH_BYTE
            stat = dec.decode(data[pos:pos + ln])
            pos += ln
            if stat.fnum >= 0:
                dec.pull()
                n += 1
        while True:
            f, st = dec.pull()
            if f is None:
                break
            n += 1
        return n

    decode_once()                     # warm-up (jit compiles)
    t0 = time.time()
    n = decode_once()
    el = time.time() - t0
    fps = n / el
    print(json.dumps({
        "metric": "decoded_frames_per_sec_qcif_ippp",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / ref_fps, 5),
    }))


if __name__ == "__main__":
    main()
