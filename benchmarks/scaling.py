"""Frames/s scaling sweep across device counts (BASELINE configs 4-5).

Runs the frame-sharded codec step on meshes of 1..N devices and reports
frames/s plus scaling efficiency vs the 1-device rate. On real multi-chip
hardware run as-is; without it, run on the virtual CPU mesh:

    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python benchmarks/scaling.py --resolution 512x512 --frames 16

Multi-host: initialize jax.distributed on every host (see
parallel/multihost.py) and run this same script once per process.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--resolution", default="512x512")
    p.add_argument("--frames", type=int, default=16,
                   help="frames per step (divisible by device counts)")
    p.add_argument("--qualities", default="50,75,90")
    p.add_argument("--iters", type=int, default=3)
    args = p.parse_args(argv)

    import jax

    from video_coding_tpu.common.size import Size
    from video_coding_tpu.model import quant_tables
    from video_coding_tpu.parallel import codec_mesh, mjpeg_codec_step

    size = Size.of_string(args.resolution)
    blocks = (size.width // 8) * (size.height // 8)
    n_dev = len(jax.devices())
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256,
                          size=(args.frames, blocks, 8, 8)).astype(np.uint8)

    results = []
    counts = [c for c in (1, 2, 4, 8, 16, 32) if c <= n_dev]
    for q in (int(x) for x in args.qualities.split(",")):
        quant = np.tile(quant_tables.scale(quant_tables.LUMA, q),
                        (blocks, 1)).astype(np.int32)
        base_fps = None
        for c in counts:
            mesh = codec_mesh(c, seg_parallel=1)
            out = mjpeg_codec_step(mesh, frames, quant)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = mjpeg_codec_step(mesh, frames, quant)
                jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / args.iters
            fps = args.frames / dt
            if base_fps is None:
                base_fps = fps
            eff = fps / (base_fps * c)
            results.append({
                "quality": q, "devices": c,
                "frames_per_s": round(fps, 1),
                "scaling_efficiency": round(eff, 3),
            })
            print(json.dumps(results[-1]), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
