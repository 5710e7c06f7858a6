"""BASELINE config 4: a Motion-JPEG 1080p30 stream, encoded and decoded
through the batched engine sessions (frames/s vs the 30 fps real-time bar).

    python benchmarks/mjpeg_1080p30.py [--frames 30] [--quality 75]
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
    p.add_argument("--frames", type=int, default=30)
    p.add_argument("--quality", type=int, default=75)
    p.add_argument("--batch", type=int, default=6)
    args = p.parse_args(argv)

    from video_coding_tpu.common.frame import ChromaSubsampling, Frame
    from video_coding_tpu.common.plane import Plane
    from video_coding_tpu.model.decoder import decode_a_frame
    from video_coding_tpu.model.encoder import Parameters
    from video_coding_tpu.runtime.engine import JpegEncoderSession
    from video_coding_tpu.tools import mjpeg

    W, H = 1920, 1080
    mouse = decode_a_frame(
        open("/root/reference/jpeg/test_data/Mouse480.jpg", "rb").read())

    def tile(d, h, w):
        ph, pw = d.shape
        return np.tile(d, ((h + ph - 1) // ph, (w + pw - 1) // pw))[:h, :w]

    rng = np.random.default_rng(0)
    base = Frame(Plane(data=tile(mouse.y.data, H, W).copy()),
                 Plane(data=tile(mouse.u.data, H // 2, W // 2).copy()),
                 Plane(data=tile(mouse.v.data, H // 2, W // 2).copy()),
                 ChromaSubsampling.C420)
    frames = []
    for _ in range(args.frames):
        f = base.copy()
        jitter = rng.integers(0, 4, (H, W), dtype=np.uint8)
        f.y.data[...] = np.clip(f.y.data.astype(np.int16) + jitter,
                                0, 255).astype(np.uint8)
        frames.append(f)

    mcus_per_row = (W + 15) // 16
    enc = JpegEncoderSession(Parameters.c420(W, H, args.quality),
                             restart_interval=mcus_per_row)
    # warm compiles
    mjpeg.encode_stream(frames[:args.batch], session=enc)

    t0 = time.perf_counter()
    stream = b"".join(
        mjpeg.encode_stream(frames[i:i + args.batch], session=enc)
        for i in range(0, len(frames), args.batch))
    t_enc = time.perf_counter() - t0

    # decode the stream back in fixed-size batches (one compiled shape)
    from video_coding_tpu.common.bitstream import BitReader
    from video_coding_tpu.model.decoder import Header
    from video_coding_tpu.runtime.engine import JpegDecoderSession

    parts = mjpeg.split_stream(stream)
    assert len(parts) == args.frames
    bits = BitReader(parts[0])
    dsess = JpegDecoderSession(Header.decode(bits))
    mjpeg.decode_stream(b"".join(parts[:args.batch]), session=dsess)  # warm
    t0 = time.perf_counter()
    decoded = []
    for i in range(0, len(parts), args.batch):
        decoded.extend(mjpeg.decode_stream(
            b"".join(parts[i:i + args.batch]), session=dsess))
    t_dec = time.perf_counter() - t0
    assert len(decoded) == args.frames

    print(json.dumps({
        "workload": "mjpeg 1080p, q%d, %d frames" % (args.quality,
                                                     args.frames),
        "encode_fps": round(args.frames / t_enc, 1),
        "decode_fps": round(args.frames / t_dec, 1),
        "pipeline_fps": round(args.frames / (t_enc + t_dec), 1),
        "realtime_30fps": args.frames / (t_enc + t_dec) >= 30.0,
        "stream_mb": round(len(stream) / 1e6, 2),
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
