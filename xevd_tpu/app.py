"""CLI decoder compatible with xevd_app's flag set and output formats
(ref: app/xevd_app.c:358-633, app/xevd_app_args.h:348-391).

Usage: python -m xevd_tpu.app -i in.evc -o out.yuv [-m N] [-s] [-v N]
"""
from __future__ import annotations

import argparse
import sys
import time

from . import NAL_UNIT_LENGTH_BYTE, Decoder, info
from .utils.yuv import YuvWriter


def main(argv=None):
    ap = argparse.ArgumentParser(prog="xevd_tpu")
    ap.add_argument("-i", "--input", required=True, help="input .evc")
    ap.add_argument("-o", "--output", help="output YUV/Y4M file")
    ap.add_argument("-m", "--threads", type=int, default=1)
    ap.add_argument("-s", "--signature", action="store_true",
                    help="verify picture signature SEI")
    ap.add_argument("-v", "--verbose", type=int, default=1)
    ap.add_argument("-f", "--frames", type=int, default=0,
                    help="max frames to decode (0=all)")
    ap.add_argument("--output-bit-depth", type=int, default=0)
    ap.add_argument("--backend", default="numpy", choices=["numpy", "jax"])
    ap.add_argument("--trace", help="write a syntax-element trace "
                    "(CU/split events; forces the Python entropy engine)")
    ap.add_argument("--trace-bins", action="store_true",
                    help="also trace every SBAC bin")
    args = ap.parse_args(argv)

    if args.trace:
        from . import trace as _trace
        _trace.init(args.trace, bins=args.trace_bins)

    if args.backend == "jax":
        from .ops.pipeline import JaxPixelBackend
        dec = Decoder(threads=args.threads, backend=JaxPixelBackend(),
                      use_native_entropy=False if args.trace else None)
    else:
        dec = Decoder(threads=args.threads,
                      use_native_entropy=False if args.trace else None)
    dec.use_pic_signature = args.signature

    lookahead = []  # decoded frames pending write (lets device work pipeline)
    LOOKAHEAD_DEPTH = 4
    try:
        data = open(args.input, "rb").read()
    except OSError as e:
        print(f"ERR: cannot open '{args.input}': {e.strerror}", file=sys.stderr)
        return 1
    pos = 0
    writer = None
    n_out = 0
    n_dec = 0
    t0 = time.time()
    decode_time = 0.0
    bumping = False
    crc_fail = False

    while True:
        if not bumping:
            if pos + NAL_UNIT_LENGTH_BYTE > len(data):
                bumping = True
                continue
            nalu_len, _, _ = info(data[pos:pos + 6])
            if nalu_len <= 0:
                print("Invalid bitstream size!", file=sys.stderr)
                return 1
            pos += NAL_UNIT_LENGTH_BYTE
            nalu = data[pos:pos + nalu_len]
            pos += nalu_len
            if len(nalu) < nalu_len:
                print("ERR: truncated NAL unit", file=sys.stderr)
                return 1
            td = time.time()
            try:
                stat = dec.decode(nalu)
            except Exception as e:
                print(f"ERR: decoding failed: {e}", file=sys.stderr)
                return 1
            decode_time += time.time() - td
            if stat.crc_ok is False:
                crc_fail = True
            have_frame = stat.fnum >= 0
        else:
            have_frame = True

        if have_frame:
            frame, status = dec.pull()
            if frame is not None:
                if writer is None and args.output:
                    out_bd = args.output_bit_depth or 8
                    w = frame.y.shape[1]
                    h = frame.y.shape[0]
                    y4m = args.output.endswith(".y4m")
                    writer = YuvWriter(args.output, w, h, out_bd,
                                       frame.chroma_format_idc, y4m)
                lookahead.append(frame)
                if writer and len(lookahead) > LOOKAHEAD_DEPTH:
                    writer.write(lookahead.pop(0))
                n_out += 1
                if not bumping:
                    n_dec += 1
            elif bumping:
                break
        if args.frames and n_out >= args.frames:
            break

    if writer:
        for frame in lookahead:
            writer.write(frame)
        lookahead = []

    if writer:
        writer.close()
    el = time.time() - t0
    if args.verbose:
        print(f"[xevd_tpu] decoded frames: {n_out}")
        print(f"total decoding time   = {el*1000:.0f} msec")
        print(f"Average decoding time = {el*1000/max(n_out,1):.1f} msec/frame")
        print(f"Average decoding speed = {n_out/max(el,1e-9):.3f} frames/sec")
        if args.signature:
            print(f"signature check: {'FAIL' if crc_fail else 'OK'}")
    return 2 if crc_fail else 0


if __name__ == "__main__":
    sys.exit(main())
