"""Kernel microbenchmarks: the block datapath and entropy tiers in
isolation, across batch sizes and implementations.

    python benchmarks/kernels.py            # current backend (TPU if up)
    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python benchmarks/kernels.py
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--batches", default="4096,16384,65536")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from video_coding_tpu.ops import datapath

    rng = np.random.default_rng(0)
    platform = jax.devices()[0].platform
    for n in (int(x) for x in args.batches.split(",")):
        coefs = jnp.asarray(
            rng.integers(-200, 200, size=(n, 64)).astype(np.int32))
        quant = jnp.asarray(
            rng.integers(1, 256, size=(n, 64)).astype(np.int32))
        pixels = jnp.asarray(
            rng.integers(0, 256, size=(n, 8, 8)).astype(np.uint8))
        impls = [("decode_jnp", lambda: datapath.decode_datapath_jnp(
            coefs, quant)),
            ("encode_jnp", lambda: datapath.encode_datapath_jnp(
                pixels, quant))]
        if platform != "cpu":
            impls += [("decode_pallas", lambda: datapath.
                       decode_datapath_pallas(coefs, quant)),
                      ("encode_pallas", lambda: datapath.
                       encode_datapath_pallas(pixels, quant))]
        for name, fn in impls:
            jax.block_until_ready(fn())  # compile + warm
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = fn()
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / args.iters
            print(json.dumps({
                "kernel": name, "platform": platform, "blocks": n,
                "us_per_call": round(dt * 1e6, 1),
                "mpix_s": round(n * 64 / dt / 1e6, 1),
            }), flush=True)

    # host entropy engines
    from video_coding_tpu.entropy import decode_scan, encode_scan
    from video_coding_tpu.entropy.tables import (pack_decoder_tables,
                                                 pack_encoder_tables)
    from video_coding_tpu.model.huffman import (AC_LUMA, DC_LUMA, Lut)

    n = 8192
    q = rng.integers(-30, 30, size=(n, 64)).astype(np.int32)
    q[:, 12:] = 0
    ci = np.zeros(n, dtype=np.int32)
    enc_t = pack_encoder_tables([DC_LUMA], [AC_LUMA])
    dec_t = pack_decoder_tables([Lut(DC_LUMA.dc_code_table(), ac=False)],
                                [Lut(AC_LUMA.ac_code_table(), ac=True)])
    for bps, label in ((n, "serial"), (8, "threaded")):
        t0 = time.perf_counter()
        for _ in range(args.iters):
            segs = encode_scan(q, ci, bps, enc_t)
        dt = (time.perf_counter() - t0) / args.iters
        print(json.dumps({
            "kernel": f"cpp_encode_{label}", "blocks": n,
            "us_per_call": round(dt * 1e6, 1),
            "mpix_s": round(n * 64 / dt / 1e6, 1)}), flush=True)
    from video_coding_tpu.entropy import destuff_segments
    segs = [destuff_segments(s)[0] for s in encode_scan(q, ci, 8, enc_t)]
    t0 = time.perf_counter()
    for _ in range(args.iters):
        decode_scan(segs, ci, 8, dec_t)
    dt = (time.perf_counter() - t0) / args.iters
    print(json.dumps({
        "kernel": "cpp_decode_threaded", "blocks": n,
        "us_per_call": round(dt * 1e6, 1),
        "mpix_s": round(n * 64 / dt / 1e6, 1)}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
