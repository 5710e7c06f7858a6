"""Pod-slice frames/s report over an explicit ('data','seg') mesh —
the exact experiment for BASELINE.json configs 4 (MJPEG 1080p30
frame-sharded across one host's chips) and 5 (4K multi-stream Q sweep
across hosts with a frames/s efficiency report), shipped as runnable
code (VERDICT r3 item 9).

On real hardware (e.g. a v5e-16) this is one flag away from the report:

    python benchmarks/pod_scaling.py --mesh 4,4 --resolution 3840x2160
    python benchmarks/pod_scaling.py --mesh 8,1 --resolution 1920x1080 \
        --target-fps 30          # config 4: 1080p30 per-host check

Multi-host: initialize jax.distributed on every process (see
parallel/multihost.py) and run the same command everywhere.

Without hardware it dry-runs on the virtual CPU mesh (this is what
__graft_entry__.dryrun_multichip exercises):

    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python benchmarks/pod_scaling.py --mesh 2,4 \
        --resolution 512x512 --frames 4 --qualities 75 --iters 2

Per quality it measures batched mesh decode (bytes → device-resident
planes), batched mesh encode (frames → bytes) and the 1-device rate on
the same workload, and emits one JSON report line with frames/s,
scaling_efficiency (multi-chip metric: fps / (fps_1dev * n_dev)) and
virtual_efficiency (timeshared-host metric: fps / fps_1dev).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _real_frame(width: int, height: int, shift: int = 0):
    """Tile the Mouse480 fixture (real image statistics) to the target
    size; ``shift`` rolls the content so multi-stream batches are not
    byte-identical frames."""
    from video_coding_tpu.common.frame import ChromaSubsampling, Frame
    from video_coding_tpu.common.plane import Plane
    from video_coding_tpu.model.decoder import decode_a_frame

    mouse = decode_a_frame(
        open("/root/reference/jpeg/test_data/Mouse480.jpg", "rb").read())

    def tile(d, th, tw, s):
        d = np.roll(d, s, axis=1)
        ph, pw = d.shape
        return np.tile(d, ((th + ph - 1) // ph,
                           (tw + pw - 1) // pw))[:th, :tw]

    return Frame(
        Plane(data=tile(mouse.y.data, height, width, shift).copy()),
        Plane(data=tile(mouse.u.data, height // 2, width // 2,
                        shift // 2).copy()),
        Plane(data=tile(mouse.v.data, height // 2, width // 2,
                        shift // 2).copy()),
        ChromaSubsampling.C420)


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--mesh", default=None,
                   help="data,seg axis sizes (e.g. 4,4); default: "
                        "codec_mesh over all visible devices")
    p.add_argument("--resolution", default="3840x2160")
    p.add_argument("--frames", type=int, default=0,
                   help="streams per step (0: 2 per data-axis device)")
    p.add_argument("--qualities", default="50,75,90")
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--restart-interval", type=int, default=1)
    p.add_argument("--target-fps", type=float, default=0.0,
                   help="assert the mesh sustains this frames/s "
                        "(config 4: 30 for a 1080p30 MJPEG stream)")
    p.add_argument("--skip-single", action="store_true",
                   help="skip the 1-device reference measurement "
                        "(report absolute frames/s only)")
    p.add_argument("--assert-virtual-efficiency", type=float, default=0.0,
                   help="fail (rc=1) if any direction's "
                        "virtual_efficiency falls below this floor — "
                        "the regression tripwire dryrun_multichip sets "
                        "(VERDICT r4 item 4)")
    p.add_argument("--distributed", default=None, metavar="COORD,N,PID",
                   help="join a jax.distributed run first (e.g. "
                        "'127.0.0.1:9999,2,0') — every process runs this "
                        "same command with its own PID; the mesh then "
                        "spans all processes' devices (BASELINE config-5 "
                        "multi-host readiness, VERDICT r4 item 9). "
                        "Implies --skip-single: a 1-device reference is "
                        "not meaningful across controllers.")
    args = p.parse_args(argv)

    if args.distributed:
        coord, nproc, pid = args.distributed.rsplit(",", 2)
        from video_coding_tpu.parallel import multihost

        multihost.initialize(coord, int(nproc), int(pid))
        args.skip_single = True

    import jax

    from video_coding_tpu.common.bitstream import BitReader
    from video_coding_tpu.common.size import Size
    from video_coding_tpu.model.decoder import Header
    from video_coding_tpu.model.encoder import Parameters
    from video_coding_tpu.parallel import codec_mesh
    from video_coding_tpu.parallel.mesh import make_mesh
    from video_coding_tpu.runtime.engine import (JpegDecoderSession,
                                                 JpegEncoderSession)

    if args.mesh:
        shape = tuple(int(x) for x in args.mesh.split(","))
        mesh = make_mesh(shape, ("data", "seg"))
    else:
        mesh = codec_mesh()
    n_dev = int(mesh.size)
    size = Size.of_string(args.resolution)
    w, h = size.width, size.height
    F = args.frames or 2 * mesh.shape["data"]
    frames = [_real_frame(w, h, shift=16 * i) for i in range(F)]

    report = {"bench": "pod_scaling",
              "mesh": dict(mesh.shape), "devices": n_dev,
              "platform": jax.devices()[0].platform,
              "resolution": f"{w}x{h}", "frames_per_step": F,
              "restart_interval": args.restart_interval, "results": []}

    for q in (int(x) for x in args.qualities.split(",")):
        params = Parameters.c420(w, h, q)
        enc1 = JpegEncoderSession(params,
                                  restart_interval=args.restart_interval)
        streams = [enc1.encode(f) for f in frames]
        bits = BitReader(streams[0])
        header = Header.decode(bits)
        hdr_len = bits.bit_pos >> 3
        payloads = [s[hdr_len:] for s in streams]

        dec = JpegDecoderSession(header, mesh=mesh)
        enc = JpegEncoderSession(params,
                                 restart_interval=args.restart_interval,
                                 mesh=mesh)
        row = {"quality": q, "stream_bytes": len(streams[0])}
        for direction, fn in (
                ("decode", lambda: jax.block_until_ready(
                    dec.decode_device_batch_stacked(payloads))),
                ("encode", lambda: enc.encode_device_batch(frames))):
            fn()  # compile
            t0 = time.perf_counter()
            for _ in range(args.iters):
                fn()
            fps = F * args.iters / (time.perf_counter() - t0)
            row[f"{direction}_fps"] = round(fps, 2)
        if not args.skip_single:
            dec1 = JpegDecoderSession(header)
            e1 = JpegEncoderSession(params,
                                    restart_interval=args.restart_interval)
            for direction, fn in (
                    ("decode", lambda: jax.block_until_ready(
                        dec1.decode_device_batch_stacked(payloads))),
                    ("encode", lambda: e1.encode_device_batch(frames))):
                fn()
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    fn()
                fps1 = F * args.iters / (time.perf_counter() - t0)
                row[f"{direction}_fps_1dev"] = round(fps1, 2)
                fps = row[f"{direction}_fps"]
                row[f"{direction}_scaling_efficiency"] = round(
                    fps / (fps1 * n_dev), 3)
                row[f"{direction}_virtual_efficiency"] = round(fps / fps1, 3)
        report["results"].append(row)
        print(json.dumps(row), flush=True)

    print(json.dumps(report), flush=True)
    if args.target_fps:
        for row in report["results"]:
            lo = min(row["decode_fps"], row["encode_fps"])
            if lo < args.target_fps:
                print(f"TARGET MISSED: {lo} < {args.target_fps} fps at "
                      f"q{row['quality']}", file=sys.stderr)
                return 1
    if args.assert_virtual_efficiency and not args.skip_single:
        for row in report["results"]:
            for d in ("decode", "encode"):
                eff = row.get(f"{d}_virtual_efficiency")
                if eff is not None and eff < args.assert_virtual_efficiency:
                    print(f"EFFICIENCY FLOOR MISSED: {d} {eff} < "
                          f"{args.assert_virtual_efficiency} at "
                          f"q{row['quality']}", file=sys.stderr)
                    return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
