"""Frames/s scaling sweep across device counts (BASELINE configs 4-5).

Real end-to-end codec scaling: a restart-segmented MJPEG stream (real
JPEG bytes, encoded from real image content) is decoded bytes→frames and
re-encoded frames→bytes through the mesh-sharded sessions
(runtime.engine JpegDecoderSession/JpegEncoderSession with mesh=...) on
meshes of 1..N devices. Reports frames/s and scaling efficiency vs the
1-device rate, per direction and quality.

On real multi-chip hardware run as-is; without it, run on the virtual
CPU mesh:

    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python benchmarks/scaling.py --resolution 512x512 --frames 8

Multi-host: initialize jax.distributed on every host (see
parallel/multihost.py) and run this same script once per process.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _real_frame(width: int, height: int):
    """Tile the Mouse480 fixture to the target size — real image content
    (natural-image coefficient statistics), not random blocks."""
    from video_coding_tpu.common.frame import ChromaSubsampling, Frame
    from video_coding_tpu.common.plane import Plane
    from video_coding_tpu.model.decoder import decode_a_frame

    mouse = decode_a_frame(
        open("/root/reference/jpeg/test_data/Mouse480.jpg", "rb").read())

    def tile(d, th, tw):
        ph, pw = d.shape
        return np.tile(d, ((th + ph - 1) // ph,
                           (tw + pw - 1) // pw))[:th, :tw]

    return Frame(
        Plane(data=tile(mouse.y.data, height, width).copy()),
        Plane(data=tile(mouse.u.data, height // 2, width // 2).copy()),
        Plane(data=tile(mouse.v.data, height // 2, width // 2).copy()),
        ChromaSubsampling.C420)


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--resolution", default="512x512")
    p.add_argument("--frames", type=int, default=8,
                   help="frames per step (batch size per device sweep)")
    p.add_argument("--qualities", default="50,75,90")
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--restart-interval", type=int, default=1)
    args = p.parse_args(argv)

    import jax

    from video_coding_tpu.common.bitstream import BitReader
    from video_coding_tpu.common.size import Size
    from video_coding_tpu.model.decoder import Header
    from video_coding_tpu.model.encoder import Parameters
    from video_coding_tpu.runtime.engine import (JpegDecoderSession,
                                                 JpegEncoderSession)
    from video_coding_tpu.parallel import codec_mesh

    size = Size.of_string(args.resolution)
    w, h = size.width, size.height
    frame = _real_frame(w, h)
    n_dev = len(jax.devices())
    counts = [c for c in (1, 2, 4, 8, 16, 32) if c <= n_dev]
    F = args.frames

    results = []
    for q in (int(x) for x in args.qualities.split(",")):
        params = Parameters.c420(w, h, q)
        stream = JpegEncoderSession(
            params, restart_interval=args.restart_interval).encode(frame)
        bits = BitReader(stream)
        header = Header.decode(bits)
        payload = stream[bits.bit_pos >> 3:]
        payloads = [payload] * F
        frames = [frame] * F
        base = {}
        for c in counts:
            mesh = codec_mesh(c)
            dec = JpegDecoderSession(header, mesh=mesh)
            enc = JpegEncoderSession(
                params, restart_interval=args.restart_interval, mesh=mesh)
            for direction, fn in (
                    ("decode",
                     lambda: jax.block_until_ready(
                         dec.decode_device_batch_stacked(payloads))),
                    ("encode", lambda: enc.encode_device_batch(frames))):
                fn()  # warm up / compile
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    fn()
                dt = (time.perf_counter() - t0) / args.iters
                fps = F / dt
                base.setdefault(direction, fps)
                # scaling_efficiency: fps / (fps_1dev * c) — the real-
                # hardware metric (each device is its own silicon).
                # virtual_efficiency: fps / fps_1dev — the right metric on
                # a forced-host virtual mesh, where all "devices" timeshare
                # one CPU so ideal sharding keeps total throughput flat;
                # any drop is genuine sharding overhead (collectives,
                # padding, unsharded work).
                eff = fps / (base[direction] * c)
                results.append({
                    "quality": q, "devices": c, "direction": direction,
                    "frames_per_s": round(fps, 1),
                    "scaling_efficiency": round(eff, 3),
                    "virtual_efficiency": round(fps / base[direction], 3),
                    "stream_bytes": len(stream),
                })
                print(json.dumps(results[-1]), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
