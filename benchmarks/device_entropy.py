"""Device entropy tier benchmark: on-device Huffman decode strategies and
bitstream-pack strategies on a real 1080p restart-segmented stream.

Measures, fully device-resident (bytes uploaded once, planes stay in HBM):
  decode: device_huffman in {range, lut, pallas}
  encode: device_pack in {xla, pallas} (fused encode incl. device packing)
at restart_interval in {1, mcus_per_row}.

    timeout 1200 python benchmarks/device_entropy.py --iters 5

The decode role matches the reference's 16-way codeword matcher
throughput (jpeg/hardcaml/src/codeword_decoder.ml:69-76); the encode role
its bitstream_writer.ml packer.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--quality", type=int, default=75)
    p.add_argument("--decoders", default="range,lut,pallas")
    p.add_argument("--packers", default="xla,pallas")
    p.add_argument("--intervals", default="1,row")
    p.add_argument("--skip-encode", action="store_true")
    args = p.parse_args(argv)

    import jax

    from video_coding_tpu.common.bitstream import BitReader
    from video_coding_tpu.common.frame import ChromaSubsampling, Frame
    from video_coding_tpu.common.plane import Plane
    from video_coding_tpu.model.decoder import Header, decode_a_frame
    from video_coding_tpu.model.encoder import Parameters
    from video_coding_tpu.runtime.engine import (JpegDecoderSession,
                                                 JpegEncoderSession)

    W, H = 1920, 1080
    mpix = W * H * 1.5 / 1e6  # three planes, 4:2:0
    platform = jax.devices()[0].platform
    mouse = decode_a_frame(
        open("/root/reference/jpeg/test_data/Mouse480.jpg", "rb").read())

    def tile(d, h, w):
        ph, pw = d.shape
        return np.tile(d, ((h + ph - 1) // ph, (w + pw - 1) // pw))[:h, :w]

    frame = Frame(Plane(data=tile(mouse.y.data, H, W).copy()),
                  Plane(data=tile(mouse.u.data, H // 2, W // 2).copy()),
                  Plane(data=tile(mouse.v.data, H // 2, W // 2).copy()),
                  ChromaSubsampling.C420)
    params = Parameters.c420(W, H, args.quality)
    mcus_per_row = (W + 15) // 16

    for ival in args.intervals.split(","):
        ri = mcus_per_row if ival == "row" else int(ival)
        stream = JpegEncoderSession(params, restart_interval=ri).encode(frame)
        bits = BitReader(stream)
        header = Header.decode(bits)
        payload = stream[bits.bit_pos >> 3:]

        for mode in filter(None, args.decoders.split(",")):
            try:
                sess = JpegDecoderSession(header, device_huffman=mode)
                out = sess.decode_device_e2e(payload)  # compile + warm
                jax.block_until_ready(out)
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    out = sess.decode_device_e2e(payload)
                jax.block_until_ready(out)
                dt = (time.perf_counter() - t0) / args.iters
                rec = {"bench": "decode_device_e2e", "huffman": mode,
                       "restart_interval": ri, "platform": platform,
                       "ms_per_frame": round(dt * 1e3, 2),
                       "mpix_s": round(mpix / dt, 1)}
            except Exception as e:  # Mosaic lowering can fail per-strategy
                rec = {"bench": "decode_device_e2e", "huffman": mode,
                       "restart_interval": ri, "platform": platform,
                       "error": f"{type(e).__name__}: {e}"[:200]}
            print(json.dumps(rec), flush=True)

        if args.skip_encode:
            continue
        for packer in filter(None, args.packers.split(",")):
            try:
                sess = JpegEncoderSession(params, restart_interval=ri,
                                          entropy="tpu", device_pack=packer)
                # warm TWICE: the first call runs the budget ladder and
                # locks a (usually smaller) per-segment buffer; the second
                # compiles the locked-budget graph. Timing after one warm
                # call would include a remote recompile.
                sess.encode_device(frame)
                sess.encode_device(frame)
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    out = sess.encode_device(frame)
                dt = (time.perf_counter() - t0) / args.iters
                ok = out == stream
                rec = {"bench": "encode_device", "packer": packer,
                       "restart_interval": ri, "platform": platform,
                       "ms_per_frame": round(dt * 1e3, 2),
                       "mpix_s": round(mpix / dt, 1), "bit_exact": ok}
            except Exception as e:
                rec = {"bench": "encode_device", "packer": packer,
                       "restart_interval": ri, "platform": platform,
                       "error": f"{type(e).__name__}: {e}"[:200]}
            print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
