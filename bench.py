"""Benchmark: decoded frames/s of the TPU decoder vs the reference CPU
decoder on a 1080p IPPP Baseline stream (BASELINE.json config 2).

Prints ONE JSON line.  The reference fps is always measured live with
refbin/xevdb_app (built from /root/reference if missing — BASELINE.md
recipe); there is no recorded-constant fallback.  vs_baseline uses the
best of -m 1 / -m 8 as the denominator.
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

W, H, FRAMES, QP, SEED, DENSITY = 1920, 1080, 16, 32, 777, 0.3
STREAM = REPO / "tests" / "fixtures" / "b1080p_ippp.evc"
# config 3 (BASELINE.json): Main profile, 1080p random-access GOP —
# ALF/ADDB/HTDF in-loop filters + the advanced itdq/ipred/inter toolset.
# intra_frac 0.1 keeps the inter-frame intra share realistic (real
# encoders pick intra rarely in B frames; the synthetic default of 0.35
# is an entropy-stress setting, not a decode workload).
MAIN_TOOLS = ("eipd cm_init btt suco adcc admvp hmvp mmvd amvr iqt ats "
              "addb htdf alf").split()
STREAM3 = REPO / "tests" / "fixtures" / "m1080p_ra_bench.evc"
FRAMES3, QP3, SEED3 = 9, 32, 779


def ensure_ref_bin() -> Path:
    ref_bin = REPO / "refbin" / "xevdb_app"
    if ref_bin.exists():
        return ref_bin
    build = Path("/tmp/xevd_base_build")
    build.mkdir(parents=True, exist_ok=True)
    subprocess.run(["cmake", "/root/reference", "-DSET_PROF=BASE",
                    "-DCMAKE_BUILD_TYPE=Release"], cwd=build, check=True,
                   capture_output=True)
    subprocess.run(["make", "-j4"], cwd=build, check=True,
                   capture_output=True)
    (REPO / "refbin").mkdir(exist_ok=True)
    ref_bin.write_bytes((build / "bin" / "xevdb_app").read_bytes())
    ref_bin.chmod(0o755)
    return ref_bin


def ensure_ref_bin_main() -> Path:
    ref_bin = REPO / "refbin" / "xevd_app"
    if ref_bin.exists():
        return ref_bin
    build = Path("/tmp/xevd_main_build")
    build.mkdir(parents=True, exist_ok=True)
    subprocess.run(["cmake", "/root/reference", "-DSET_PROF=MAIN",
                    "-DCMAKE_BUILD_TYPE=Release"], cwd=build, check=True,
                   capture_output=True)
    subprocess.run(["make", "-j4"], cwd=build, check=True,
                   capture_output=True)
    (REPO / "refbin").mkdir(exist_ok=True)
    ref_bin.write_bytes((build / "bin" / "xevd_app").read_bytes())
    ref_bin.chmod(0o755)
    return ref_bin


def measure_ref(ref_bin: Path, stream: Path, threads: int) -> float:
    r = subprocess.run(
        [str(ref_bin), "-i", str(stream), "-o", "/tmp/bench_ref.yuv",
         "-m", str(threads)],
        capture_output=True, text=True, timeout=600)
    for line in r.stdout.splitlines():
        if "frames/sec" in line:
            return float(line.split("=")[-1].split()[0])
    raise RuntimeError(f"reference decode failed:\n{r.stdout}\n{r.stderr}")


def main():
    # must be set before xevd_tpu.ops.pipeline is imported (it picks the
    # cache dir at import time)
    os.environ.setdefault("XEVD_TPU_JIT_CACHE", str(REPO / ".jaxcache"))
    import jax as _jax
    _jax.config.update("jax_compilation_cache_dir",
                       str(REPO / ".jaxcache"))
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    if not STREAM.exists():
        import evc_enc
        STREAM.parent.mkdir(parents=True, exist_ok=True)
        STREAM.write_bytes(evc_enc.encode_stream(
            W, H, FRAMES, QP, SEED, "IPPP", DENSITY))
    if not STREAM3.exists():
        import evc_enc
        t = evc_enc.Tools(**{k: 1 for k in MAIN_TOOLS})
        STREAM3.write_bytes(evc_enc.encode_stream(
            W, H, FRAMES3, QP3, SEED3, "RA", DENSITY, profile=1, tools=t,
            intra_frac=0.1))

    ref_bin = ensure_ref_bin()
    ref_fps = max(measure_ref(ref_bin, STREAM, 1),
                  measure_ref(ref_bin, STREAM, 8))
    ref_bin_main = ensure_ref_bin_main()
    ref_fps3 = max(measure_ref(ref_bin_main, STREAM3, 1),
                   measure_ref(ref_bin_main, STREAM3, 8))

    from xevd_tpu.decoder import Decoder
    from xevd_tpu.ops.pipeline import JaxPixelBackend
    from xevd_tpu import NAL_UNIT_LENGTH_BYTE, info

    data = STREAM.read_bytes()

    import xevd_tpu.native as N
    from xevd_tpu.ops import pipeline as PL

    phase = {"entropy": 0.0, "pack": 0.0}
    orig_entropy = N.decode_slice_native
    orig_pack = JaxPixelBackend.pack_frame

    def timed_entropy(*a, **k):
        t0 = time.time()
        r = orig_entropy(*a, **k)
        phase["entropy"] += time.time() - t0
        return r

    def timed_pack(self, job, sps, refp):
        t0 = time.time()
        r = orig_pack(self, job, sps, refp)
        phase["pack"] += time.time() - t0
        return r

    N.decode_slice_native = timed_entropy
    JaxPixelBackend.pack_frame = timed_pack

    def decode_once(measure_host=False):
        dec = Decoder(backend=JaxPixelBackend())
        pos = 0
        n = 0
        host_t = 0.0
        while pos + NAL_UNIT_LENGTH_BYTE <= len(data):
            ln, _, _ = info(data[pos:pos + 6])
            pos += NAL_UNIT_LENGTH_BYTE
            t0 = time.time() if measure_host else 0.0
            stat = dec.decode(data[pos:pos + ln])
            if measure_host:
                host_t += time.time() - t0
            pos += ln
            if stat.fnum >= 0:
                f, _ = dec.pull()
                if f is not None:
                    n += 1
        while True:
            f, st = dec.pull()
            if f is None:
                break
            n += 1
        return n, host_t

    decode_once()                     # warm-up (jit compiles, cached)
    phase["entropy"] = phase["pack"] = 0.0
    t0 = time.time()
    n, host_t = decode_once(measure_host=True)
    el = time.time() - t0
    fps = n / el
    entropy_ms = 1000 * phase["entropy"] / n
    pack_ms = 1000 * phase["pack"] / n

    # ---- config 3: Main 1080p RA ----
    data3 = STREAM3.read_bytes()

    def decode_main_once():
        dec = Decoder(backend=JaxPixelBackend())
        pos = 0
        m = 0
        while pos + NAL_UNIT_LENGTH_BYTE <= len(data3):
            ln, _, _ = info(data3[pos:pos + 6])
            pos += NAL_UNIT_LENGTH_BYTE
            stat = dec.decode(data3[pos:pos + ln])
            pos += ln
            if stat.fnum >= 0:
                f, _ = dec.pull()
                if f is not None:
                    m += 1
        while True:
            f, st = dec.pull()
            if f is None:
                break
            import numpy as _np
            _np.asarray(f.y)
            m += 1
        return m

    decode_main_once()                # warm-up
    el3 = 1e30
    for _ in range(2):                # best-of-2 warm runs
        t0 = time.time()
        m = decode_main_once()
        el3 = min(el3, time.time() - t0)
    fps3 = m / el3

    print(json.dumps({
        "metric": "decoded_frames_per_sec_1080p_ippp",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / ref_fps, 4),
        "ref_fps_best": round(ref_fps, 3),
        "frames": n,
        "total_ms_per_frame": round(1000 * el / n, 2),
        "host_ms_per_frame": round(1000 * host_t / n, 2),
        # breakdown: C entropy+derive runs on a worker thread overlapped
        # with pack+dispatch (see decoder._drain_pipeline)
        "entropy_ms_per_frame": round(entropy_ms, 2),
        "pack_ms_per_frame": round(pack_ms, 2),
        # config 3: Main-profile 1080p RA (ALF/ADDB/HTDF + full toolset)
        "fps_main_1080p_ra": round(fps3, 3),
        "ref_fps_main_best": round(ref_fps3, 3),
        "vs_ref_main": round(fps3 / ref_fps3, 4),
        "frames_main": m,
    }))


if __name__ == "__main__":
    main()
