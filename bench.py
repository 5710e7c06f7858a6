"""Benchmark: bit-exact baseline JPEG decode+encode throughput per chip.

Workload (BASELINE.json config 3 analog): 1080p 4:2:0, quality 75,
restart interval = one MCU row (parallel-decodable stream), through the
production engine — C++ segment-parallel entropy on host, jit/Pallas block
datapath + plane assembly on device.

Prints ONE JSON line:
  {"metric": ..., "value": MPix/s (decode+encode pipeline, all planes),
   "unit": "MPix/s", "vs_baseline": value / 13.7}
vs_baseline compares against the reference RTL accelerator's serial-IDCT
upper bound of 13.7 MPix/s per instance (BASELINE.md derived throughput).
"""

import json
import os
import sys
import threading
import time

import numpy as np

WATCHDOG_SECS = 420


def _watchdog():
    print(json.dumps({
        "metric": "decode+encode MPix/s/chip (bit-exact baseline JPEG, "
                  "1080p q75)",
        "value": 0.0,
        "unit": "MPix/s",
        "vs_baseline": 0.0,
        "error": "watchdog timeout (TPU tunnel stalled)",
    }), flush=True)
    os._exit(2)


def main():
    timer = threading.Timer(WATCHDOG_SECS, _watchdog)
    timer.daemon = True
    timer.start()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))

    from video_coding_tpu.common.frame import ChromaSubsampling, Frame
    from video_coding_tpu.common.plane import Plane
    from video_coding_tpu.common.bitstream import BitReader
    from video_coding_tpu.model.decoder import Header, decode_a_frame
    from video_coding_tpu.model.encoder import Parameters
    from video_coding_tpu.runtime.engine import (JpegDecoderSession,
                                                 JpegEncoderSession)

    W, H = 1920, 1080
    rng = np.random.default_rng(0)

    # Build a natural-image-statistics 1080p frame by tiling Mouse480.
    mouse = decode_a_frame(
        open("/root/reference/jpeg/test_data/Mouse480.jpg", "rb").read())

    def tile(plane_data, h, w):
        ph, pw = plane_data.shape
        reps = (h + ph - 1) // ph, (w + pw - 1) // pw
        return np.tile(plane_data, reps)[:h, :w].copy()

    frame = Frame(
        Plane(data=tile(mouse.y.data, H, W)),
        Plane(data=tile(mouse.u.data, H // 2, W // 2)),
        Plane(data=tile(mouse.v.data, H // 2, W // 2)),
        ChromaSubsampling.C420)

    mcus_per_row = (W + 15) // 16
    enc = JpegEncoderSession(Parameters.c420(W, H, 75),
                             restart_interval=mcus_per_row)
    stream = enc.encode(frame)

    bits = BitReader(stream)
    header = Header.decode(bits)
    dec = JpegDecoderSession(header)
    entropy = stream[bits.bit_pos >> 3:]

    # Correctness gate: engine decode must be bit-exact vs golden model.
    model_frame = decode_a_frame(stream)
    eng_frame = dec.decode(entropy)
    for p in "yuv":
        if not np.array_equal(getattr(eng_frame, p).data,
                              getattr(model_frame, p).data):
            print(json.dumps({
                "metric": "decode+encode MPix/s/chip (bit-exact baseline "
                          "JPEG, 1080p q75)",
                "value": 0.0, "unit": "MPix/s", "vs_baseline": 0.0,
                "error": f"bit-exactness check failed on plane {p}",
            }), flush=True)
            return 1

    # Warm up (compiles cached by geometry).
    for _ in range(2):
        enc.encode(frame)
        dec.decode(entropy)

    pixels_per_frame = W * H * 3 // 2  # all planes, 4:2:0

    iters = 8
    t0 = time.perf_counter()
    for _ in range(iters):
        enc.encode(frame)
    t_enc = (time.perf_counter() - t0) / iters

    t0 = time.perf_counter()
    for _ in range(iters):
        dec.decode(entropy)
    t_dec = (time.perf_counter() - t0) / iters

    enc_mpix = pixels_per_frame / t_enc / 1e6
    dec_mpix = pixels_per_frame / t_dec / 1e6
    # pipeline rate: one frame must pass encode AND decode
    value = pixels_per_frame / (t_enc + t_dec) / 1e6

    timer.cancel()
    print(json.dumps({
        "metric": "decode+encode MPix/s/chip (bit-exact baseline JPEG, "
                  "1080p q75)",
        "value": round(value, 2),
        "unit": "MPix/s",
        "vs_baseline": round(value / 13.7, 2),
        "decode_mpix_s": round(dec_mpix, 2),
        "encode_mpix_s": round(enc_mpix, 2),
        "encode_ms_per_frame": round(t_enc * 1e3, 2),
        "decode_ms_per_frame": round(t_dec * 1e3, 2),
        "stream_bytes": len(stream),
        "restart_segments": (H + 15) // 16,
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
