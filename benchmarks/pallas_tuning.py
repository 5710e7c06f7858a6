"""Pallas entropy-decode kernel tuning sweep: syms_per_iter x lane_chunk
on a real 1080p restart_interval=1 stream, kernel-only timing (segments
pre-packed and resident; no datapath, no transfers).

    timeout 2400 python benchmarks/pallas_tuning.py --iters 5
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
    p.add_argument("--syms", default="2,4")
    p.add_argument("--chunks", default="256,512,1024")
    p.add_argument("--kernel", default="sublanes",
                   choices=["sublanes", "lanes", "bs"])
    p.add_argument("--wins", default="8,16,32",
                   help="window sizes for --kernel bs (blocks)")
    p.add_argument("--restart-interval", type=int, default=1,
                   help="MCUs per restart segment (use rows for bs: "
                        "e.g. 120 at 1080p)")
    p.add_argument("--resolution", default="1920x1080")
    p.add_argument("--sort", action="store_true",
                   help="sort segments by byte length (engine behavior)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from video_coding_tpu.common.bitstream import BitReader
    from video_coding_tpu.common.frame import ChromaSubsampling, Frame
    from video_coding_tpu.common.plane import Plane
    from video_coding_tpu.entropy import pallas_decode, tpu_decode
    from video_coding_tpu.entropy.tables import pack_decoder_tables
    from video_coding_tpu.model import decoder as mdec
    from video_coding_tpu.model.decoder import decode_a_frame
    from video_coding_tpu.model.encoder import Parameters
    from video_coding_tpu.runtime.engine import JpegEncoderSession

    W, H = (int(x) for x in args.resolution.split("x"))
    mpix = W * H * 1.5 / 1e6
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
    stream = JpegEncoderSession(
        Parameters.c420(W, H, args.quality),
        restart_interval=args.restart_interval).encode(frame)
    bits = BitReader(stream)
    dec = mdec.Decoder(mdec.Header.decode(bits), bits)
    comp_idx = np.array([s[0] for s in dec.block_schedule()], dtype=np.int32)
    tabs = pack_decoder_tables([c.dc_tab for c in dec.components],
                               [c.ac_tab for c in dec.components])
    mcu = sum(c.component.horizontal_sampling_factor
              * c.component.vertical_sampling_factor
              for c in dec.components)
    mcu *= args.restart_interval  # blocks per segment
    golden = dec.decode_entropy()

    segbytes, seg_lens = tpu_decode.pack_segments(dec.entropy_segments)
    S = len(dec.entropy_segments)
    n_blocks = len(comp_idx)
    seg_blocks_np = np.full(S, mcu, dtype=np.int32)
    if n_blocks % mcu:
        seg_blocks_np[-1] = n_blocks % mcu
    perm = np.arange(S)
    if args.sort:
        perm = np.argsort(seg_lens, kind="stable")
        segbytes = segbytes[perm]
        seg_blocks_np = seg_blocks_np[perm]
    seg_blocks = jnp.asarray(seg_blocks_np)
    segb = jnp.asarray(segbytes)
    sched = jnp.asarray(comp_idx[:mcu])
    lo, hi, off, values = map(jnp.asarray, tpu_decode.range_tables(tabs))
    if n_blocks % mcu:
        pad = S * mcu - n_blocks
        golden = np.concatenate(
            [golden, np.zeros((pad, 64), golden.dtype)])
    golden_segs = golden.reshape(S, mcu, 64)

    if args.kernel == "bs":
        for win in (int(x) for x in args.wins.split(",")):
            try:
                def run(win=win):
                    return pallas_decode.decode_segments_pallas_bs(
                        segb, seg_blocks, lo, hi, off, values,
                        blocks_per_segment=mcu, n_components=3,
                        comp_sched_t=tuple(int(x) for x in comp_idx[:mcu]),
                        win=win,
                        interpret=jax.default_backend() == "cpu")
                out = np.asarray(jax.block_until_ready(run()))
                ok = np.array_equal(
                    out.reshape(S, mcu, 64)[np.argsort(perm)], golden_segs)
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    r = run()
                jax.block_until_ready(r)
                dt = (time.perf_counter() - t0) / args.iters
                rec = {"bench": "pallas_entropy_decode_bs",
                       "platform": platform, "win": win,
                       "restart_interval": args.restart_interval,
                       "ms_per_frame": round(dt * 1e3, 2),
                       "mpix_s": round(mpix / dt, 1), "bit_exact": ok}
            except Exception as e:
                rec = {"bench": "pallas_entropy_decode_bs",
                       "platform": platform, "win": win,
                       "error": f"{type(e).__name__}: {e}"[:160]}
            print(json.dumps(rec), flush=True)
        return 0

    for spi in (int(x) for x in args.syms.split(",")):
        for ch in (int(x) for x in args.chunks.split(",")):
            try:
                if args.kernel == "lanes":
                    def run():
                        return pallas_decode.decode_segments_pallas_t(
                            segb, seg_blocks, sched, lo, hi, off, values,
                            blocks_per_segment=mcu, n_components=3,
                            lanes=ch, syms_per_iter=spi,
                            interpret=jax.default_backend() == "cpu")
                else:
                    def run():
                        return pallas_decode.decode_segments_pallas(
                            segb, seg_blocks, sched, lo, hi, off, values,
                            blocks_per_segment=mcu, n_components=3,
                            lane_chunk=ch, syms_per_iter=spi,
                            interpret=jax.default_backend() == "cpu")
                out = np.asarray(jax.block_until_ready(run()))
                ok = np.array_equal(
                    out.reshape(S, mcu, 64)[np.argsort(perm)], golden_segs)
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    r = run()
                jax.block_until_ready(r)
                dt = (time.perf_counter() - t0) / args.iters
                rec = {"bench": "pallas_entropy_decode", "platform": platform,
                       "syms_per_iter": spi, "lane_chunk": ch,
                       "ms_per_frame": round(dt * 1e3, 2),
                       "mpix_s": round(mpix / dt, 1), "bit_exact": ok}
            except Exception as e:
                rec = {"bench": "pallas_entropy_decode", "platform": platform,
                       "syms_per_iter": spi, "lane_chunk": ch,
                       "error": f"{type(e).__name__}: {e}"[:160]}
            print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
