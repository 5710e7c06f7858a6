"""Stage-level profile of the fused device encode at restart_interval=1:
datapath → symbol construction → compaction → pack (xla | pallas) →
stream assembly, each timed as its own warm jit with device-resident
inputs (no host transfers inside the timed region).

    timeout 1800 python benchmarks/encode_profile.py --iters 10
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--quality", type=int, default=75)
    p.add_argument("--slope", action="store_true",
                   help="slope-timed (dispatch-cancelling) stage ladder: "
                        "run each stage at two fori_loop trip counts "
                        "inside one jit and report (t_hi-t_lo)/diff — "
                        "the single-call numbers above carry a relay "
                        "dispatch (~10-30 ms) per call")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from video_coding_tpu.common.frame import ChromaSubsampling, Frame
    from video_coding_tpu.common.plane import Plane
    from video_coding_tpu.entropy import pallas_encode, tpu_encode
    from video_coding_tpu.model.decoder import decode_a_frame
    from video_coding_tpu.model.encoder import Parameters
    from video_coding_tpu.runtime.engine import JpegEncoderSession

    W, H = 1920, 1080
    mpix = W * H * 1.5 / 1e6
    platform = jax.devices()[0].platform
    interp = jax.default_backend() == "cpu"
    mouse = decode_a_frame(
        open("/root/reference/jpeg/test_data/Mouse480.jpg", "rb").read())

    def tile(d, h, w):
        ph, pw = d.shape
        return np.tile(d, ((h + ph - 1) // ph, (w + pw - 1) // pw))[:h, :w]

    frame = Frame(Plane(data=tile(mouse.y.data, H, W).copy()),
                  Plane(data=tile(mouse.u.data, H // 2, W // 2).copy()),
                  Plane(data=tile(mouse.v.data, H // 2, W // 2).copy()),
                  ChromaSubsampling.C420)
    sess = JpegEncoderSession(Parameters.c420(W, H, args.quality),
                              restart_interval=1)
    planes = [jnp.asarray(p) for p in sess.load_planes(frame)]
    B = sess.blocks_per_segment
    S = sess.n_blocks // B
    tabs = tuple(map(jnp.asarray,
                     tpu_encode.device_encoder_tables(sess.tables)))
    comp = jnp.asarray(np.resize(sess.comp_idx[:B], sess.n_blocks)
                       .astype(np.int32))
    sched = sess.comp_idx[:B]
    prev_same = np.full(B, -1, dtype=np.int32)
    last_seen: dict[int, int] = {}
    for i, c in enumerate(sched):
        prev_same[i] = last_seen.get(int(c), -1)
        last_seen[int(c)] = i
    prev = jnp.asarray(prev_same)
    msb = B * 24 + 64
    m_out = msb + msb // 4 + 8

    qc = jax.jit(sess._encode_qc)(planes)
    qc = jax.block_until_ready(qc)

    @jax.jit
    def stage_symbols(qc):
        return tpu_encode._symbol_parts(qc, comp, prev, *tabs, B)

    @jax.jit
    def stage_compact(qc):
        hi, lo, ln = tpu_encode._symbol_parts(qc, comp, prev, *tabs, B)
        return tpu_encode._compact_symbols(
            hi.reshape(S, -1), lo.reshape(S, -1), ln.reshape(S, -1))

    @functools.partial(jax.jit, static_argnames=())
    def stage_pack_xla(qc):
        return tpu_encode.encode_segments_device(
            qc, comp, prev, *tabs, blocks_per_segment=B,
            max_seg_bytes=msb)

    @jax.jit
    def stage_pack_pallas(qc):
        return pallas_encode.encode_segments_pallas(
            qc, comp, prev, *tabs, blocks_per_segment=B,
            max_seg_bytes=msb, interpret=interp)

    @jax.jit
    def stage_assemble(qc):
        out, lens, ovf = pallas_encode.encode_segments_pallas(
            qc, comp, prev, *tabs, blocks_per_segment=B,
            max_seg_bytes=msb, interpret=interp)
        buf, total = tpu_encode.assemble_stream_device(
            out, lens, cap=S * m_out + 2 * S)
        return buf, total, ovf

    @jax.jit
    def stage_compact_reduced(qc):
        """Compaction compute forced, outputs reduced to scalars (no big
        HBM result materialization)."""
        hi, lo, ln = tpu_encode._symbol_parts(qc, comp, prev, *tabs, B)
        outs = tpu_encode._compact_symbols(
            hi.reshape(S, -1), lo.reshape(S, -1), ln.reshape(S, -1))
        return sum(jnp.sum(o.astype(jnp.uint32)) for o in outs)

    # resident symbol-slot operands (pad slot appended) → kernel-only
    def _slots(h, l, n):
        h = h.reshape(S, -1)
        l = l.reshape(S, -1)
        n = n.reshape(S, -1)
        total = jnp.sum(n, axis=1)
        pad = (-total) & 7
        return (jnp.concatenate([h, jnp.zeros((S, 1), jnp.uint32)], 1),
                jnp.concatenate(
                    [l, ((1 << pad) - 1).astype(jnp.uint32)[:, None]], 1),
                jnp.concatenate([n, pad[:, None]], 1),
                (total + pad) >> 3)

    hi, lo, ln = jax.jit(stage_symbols)(qc)
    c_hi, c_lo, c_len, rbl = jax.block_until_ready(
        jax.jit(_slots)(hi, lo, ln))

    @jax.jit
    def stage_kernel_only(c_hi, c_lo, c_len, rbl):
        return pallas_encode.pack_stuff_pallas(
            c_hi, c_lo, c_len, rbl,
            m_raw=msb, m_out=m_out, interpret=interp)

    if args.slope:
        def t(fn, n=args.iters):
            fn()
            t0 = time.perf_counter()
            for _ in range(n):
                r = fn()
            jax.block_until_ready(r)
            return (time.perf_counter() - t0) / n * 1e3

        def dev_loop(stage, *operands):
            @functools.partial(jax.jit, static_argnames=("reps",))
            def loop(*ops, reps):
                def body(i, acc):
                    perturbed = tuple(o + (acc & 1).astype(o.dtype)
                                      for o in ops)
                    out = stage(*perturbed)
                    leaves = jax.tree_util.tree_leaves(out)
                    return acc + sum(l.sum().astype(jnp.int32)
                                     for l in leaves)
                return jax.lax.fori_loop(0, reps, body, jnp.int32(0))

            if interp:
                return t(lambda: jax.block_until_ready(
                    loop(*operands, reps=1)))
            times = {}
            for reps in (8, 40):
                jax.block_until_ready(loop(*operands, reps=reps))
                times[reps] = t(lambda: jax.block_until_ready(
                    loop(*operands, reps=reps)))
            return (times[40] - times[8]) / 32

        rec = {"bench": "encode_profile_slope", "platform": platform,
               "ms_datapath": round(dev_loop(
                   lambda *ps: sess._encode_qc(list(ps)), *planes), 3),
               "ms_symbols": round(dev_loop(
                   lambda q: stage_symbols(q), qc), 3),
               "ms_pack_kernel_only": round(dev_loop(
                   lambda lo_p: pallas_encode.pack_stuff_pallas(
                       c_hi, lo_p, c_len, rbl, m_raw=msb, m_out=m_out,
                       interpret=interp), c_lo), 3),
               "ms_entropy_pallas_full": round(dev_loop(
                   lambda q: stage_pack_pallas(q), qc), 3),
               "ms_entropy_plus_assemble": round(dev_loop(
                   lambda q: stage_assemble(q), qc), 3)}
        print(json.dumps(rec), flush=True)
        return 0

    stages = [
        ("datapath", jax.jit(sess._encode_qc), planes),
        ("symbols", stage_symbols, qc),
        ("symbols+compact", stage_compact, qc),
        ("symbols+compact_reduced", stage_compact_reduced, qc),
        ("symbols+compact+pack_xla", stage_pack_xla, qc),
        ("symbols+compact+pack_pallas", stage_pack_pallas, qc),
        ("full_entropy_pallas+assemble", stage_assemble, qc),
    ]
    stages.append(("pack_pallas_kernel_only", None, None))
    for name, fn, arg in stages:
        try:
            if name == "pack_pallas_kernel_only":
                r = jax.block_until_ready(stage_kernel_only(
                    c_hi, c_lo, c_len, rbl))
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    r = stage_kernel_only(c_hi, c_lo, c_len, rbl)
                jax.block_until_ready(r)
            else:
                r = jax.block_until_ready(fn(arg))  # compile + warm
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    r = fn(arg)
                jax.block_until_ready(r)
            dt = (time.perf_counter() - t0) / args.iters
            rec = {"stage": name, "platform": platform,
                   "ms": round(dt * 1e3, 2),
                   "mpix_s": round(mpix / dt, 1)}
        except Exception as e:
            rec = {"stage": name, "platform": platform,
                   "error": f"{type(e).__name__}: {e}"[:160]}
        print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
