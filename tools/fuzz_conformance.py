"""Randomized conformance fuzzer: generate random-syntax streams across
tool combinations, decode with the reference binary (oracle) and with
xevd_tpu, and require bit-exact output.

Usage: python tools/fuzz_conformance.py [-n ITERS] [-j JOBS] [--seed S]
"""
from __future__ import annotations

import argparse
import random
import subprocess
import sys
import tempfile
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

TOOL_SETS = [
    (),                                             # baseline-profile
    ("eipd",),
    ("btt", "eipd", "cm_init"),
    ("btt", "suco", "eipd", "cm_init"),
    ("adcc", "cm_init", "eipd"),
    ("admvp", "hmvp", "cm_init", "eipd"),
    ("admvp", "hmvp", "mmvd", "cm_init", "eipd"),
    ("admvp", "hmvp", "amvr", "btt", "suco", "cm_init", "eipd"),
    ("admvp", "btt", "suco", "cm_init"),
    ("admvp", "hmvp", "mmvd", "amvr", "btt", "suco", "adcc", "cm_init",
     "eipd"),
]
GOPS = ["I", "IPPP", "RA"]
SIZES = [(64, 64), (96, 48), (176, 144), (128, 128)]


def run_one(idx: int, seed: int, tmp: Path) -> str:
    rng = random.Random(seed)
    tools = rng.choice(TOOL_SETS)
    gop = rng.choice(GOPS)
    w, h = rng.choice(SIZES)
    qp = rng.randint(22, 42)
    # RA needs a complete sub-GOP or the reference app cannot drain its DPB
    n = 5 if gop == "RA" else rng.randint(2, 4)
    profile = 1 if tools else rng.choice([0, 1])
    desc = (f"seed={seed} {w}x{h} n={n} qp={qp} gop={gop} p={profile} "
            f"tools={','.join(tools) or '-'}")
    evc = tmp / f"f{idx}.evc"
    ref = tmp / f"f{idx}_ref.yuv"
    my = tmp / f"f{idx}_my.yuv"
    cmd = [sys.executable, str(ROOT / "tools/evc_enc.py"), "-o", str(evc),
           "-W", str(w), "-H", str(h), "-n", str(n), "-q", str(qp),
           "-s", str(seed), "-g", gop, "-p", str(profile)]
    if tools:
        cmd += ["-t", ",".join(tools)]
    r = subprocess.run(cmd, capture_output=True)
    if r.returncode:
        return f"ENC-FAIL {desc}: {r.stderr.decode()[-200:]}"
    app = ROOT / ("refbin/xevd_app" if profile else "refbin/xevdb_app")
    r = subprocess.run([str(app), "-i", str(evc), "-o", str(ref),
                        "--output-bit-depth", "10"],
                       capture_output=True, timeout=60)
    if r.returncode:
        return f"REF-FAIL {desc}"
    r = subprocess.run([sys.executable, "-m", "xevd_tpu.app", "-i", str(evc),
                        "-o", str(my), "--output-bit-depth", "10"],
                       capture_output=True, timeout=900, cwd=str(ROOT))
    if r.returncode:
        return f"MY-FAIL {desc}: {r.stderr.decode()[-300:]}"
    if ref.read_bytes() != my.read_bytes():
        return f"MISMATCH {desc}"
    return f"OK {desc}"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=20)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    fails = 0
    with tempfile.TemporaryDirectory() as td:
        tmp = Path(td)
        for i in range(args.n):
            res = run_one(i, args.seed + i * 1009 + 1, tmp)
            print(res, flush=True)
            if not res.startswith("OK"):
                fails += 1
    print(f"--- {args.n - fails}/{args.n} passed ---")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
