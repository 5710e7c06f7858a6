"""Stage profile of the fused device decode: host prep (destuff + pack +
balance), upload, entropy kernel, datapath+assembly — to find where
decode_device_e2e's wall time goes.

    timeout 560 python benchmarks/decode_profile.py --iters 5
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
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--quality", type=int, default=75)
    p.add_argument("--resolution", default="1920x1080")
    p.add_argument("--kernel-only", action="store_true",
                   help="measure just the entropy kernel (skips the fused "
                        "device-graph stages; used by bench.py to report "
                        "the speed-of-light detail field cheaply)")
    p.add_argument("--flat", action="store_true",
                   help="profile the flat-upload path stage by stage "
                        "(destuff_flat, host prep, upload, byte-lane vs "
                        "word-row materialization, kernel, full e2e) — "
                        "the ladder VERDICT r3 item 2 asks for")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from video_coding_tpu.common.bitstream import BitReader
    from video_coding_tpu.common.frame import ChromaSubsampling, Frame
    from video_coding_tpu.common.plane import Plane
    from video_coding_tpu.entropy import scan as entropy_scan
    from video_coding_tpu.entropy import tpu_decode
    from video_coding_tpu.model.decoder import Header, decode_a_frame
    from video_coding_tpu.model.encoder import Parameters
    from video_coding_tpu.runtime import engine as eng

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
    params = Parameters.c420(W, H, args.quality)
    stream = eng.JpegEncoderSession(params, restart_interval=1).encode(frame)
    bits = BitReader(stream)
    header = Header.decode(bits)
    payload = stream[bits.bit_pos >> 3:]

    sess = eng.JpegDecoderSession(header)

    def t(fn, n=args.iters):
        fn()
        t0 = time.perf_counter()
        for _ in range(n):
            r = fn()
        jax.block_until_ready(r) if hasattr(r, "block_until_ready") or \
            isinstance(r, (tuple, list)) else None
        return (time.perf_counter() - t0) / n * 1e3, r

    if args.flat:
        return profile_flat(args, sess, payload, mpix, platform, t)

    # stage 1: host destuff (C++)
    ms_destuff, segments = t(lambda: entropy_scan.destuff_segments(payload))
    # stage 2: host pack to (S, L)
    ms_pack, (segbytes, lens) = t(lambda: tpu_decode.pack_segments(segments))
    S = len(segments)
    B = sess.blocks_per_segment
    seg_blocks = np.full(S, B, dtype=np.int32)
    if sess.n_blocks % B:
        seg_blocks[-1] = sess.n_blocks % B
    # stage 3: balance + pad (host)
    ms_bal, (sb2, sgb2, inv) = t(lambda: eng._balance_segments(
        segbytes, seg_blocks, np.asarray(lens), 1))
    L = 1 << max(8, (sb2.shape[1] - 1).bit_length())
    sb2p = np.pad(sb2, ((0, 0), (0, L - sb2.shape[1])))
    # stage 4: upload
    ms_up, dev = t(lambda: jax.block_until_ready(
        (jnp.asarray(sb2p), jnp.asarray(sgb2), jnp.asarray(inv))))
    dsb, dsgb, dinv = dev

    # stage 5: full device graph from resident arrays
    if not args.kernel_only:
        fn = sess._device_e2e_jit(L)
        ms_dev, _ = t(lambda: jax.block_until_ready(fn(dsb, dsgb, dinv)))
    else:
        ms_dev = float("nan")

    # stage 5a: entropy kernel only, resident — timed as 8 iterations
    # inside ONE jit (lax.fori_loop, hoist-proof) so relay/dispatch
    # latency doesn't pollute the device number (BENCH_NOTES round 4:
    # single-call timings carry 10s of ms of relay jitter)
    from video_coding_tpu.entropy import pallas_decode
    lo, hi, off, values = map(jnp.asarray,
                              tpu_decode.range_tables(sess.tables))
    sched = jnp.asarray(sess.comp_idx[:B])
    n_comp = len(sess.components)
    interp = jax.default_backend() == "cpu"
    REPS = 1 if interp else 8

    @jax.jit
    def kernel_loop(segb_in, sgb):
        def body(i, acc):
            sb = jnp.where(acc < 0, segb_in ^ 1, segb_in)
            out = pallas_decode.decode_segments_pallas_t(
                sb, sgb, sched, lo, hi, off, values,
                blocks_per_segment=B, n_components=n_comp,
                interpret=interp)
            return acc + out.sum()
        return jax.lax.fori_loop(0, REPS, body, jnp.int32(0))

    ms_ent, _ = t(lambda: jax.block_until_ready(kernel_loop(dsb, dsgb)))
    ms_ent /= REPS

    # end to end (the bench number)
    if not args.kernel_only:
        ms_e2e, _ = t(lambda: jax.block_until_ready(
            sess.decode_device_e2e(payload)))
    else:
        ms_e2e = float("nan")

    out = {
        "bench": "decode_profile", "platform": platform, "S": S, "L": L,
        "ms_destuff": round(ms_destuff, 2), "ms_pack": round(ms_pack, 2),
        "ms_balance": round(ms_bal, 2), "ms_upload": round(ms_up, 2),
        "ms_entropy_kernel": round(ms_ent, 2)}
    if not args.kernel_only:
        out.update({"ms_device_graph": round(ms_dev, 2),
                    "ms_e2e": round(ms_e2e, 2),
                    "mpix_s_e2e": round(mpix / (ms_e2e / 1e3), 1)})
    print(json.dumps(out), flush=True)
    return 0


def profile_flat(args, sess, payload, mpix, platform, t):
    """Stage ladder for the flat-upload fused decode (the bench path):
    host destuff, host lane prep, upload, byte-lane vs word-row
    materialization, kernel from each, and the full e2e graph."""
    import json as _json

    import jax
    import jax.numpy as jnp

    from video_coding_tpu.entropy import pallas_decode, scan as entropy_scan
    from video_coding_tpu.entropy import tpu_decode

    ms_destuff, (flat, lens64) = t(
        lambda: entropy_scan.destuff_flat(payload))
    seg_blocks = sess._expected_seg_blocks(len(lens64))
    ms_prep, (flat_p, starts, lens, segb, inv_perm, L, M) = t(
        lambda: sess._flat_lane_inputs(flat, lens64, seg_blocks))
    S = len(lens)
    B = sess.blocks_per_segment
    ms_up, dev = t(lambda: jax.block_until_ready(tuple(map(
        jnp.asarray, (flat_p, starts, lens, segb, inv_perm)))))
    dflat, dstarts, dlens, dsegb, dinv = dev

    interp = jax.default_backend() == "cpu"
    REPS = 1 if interp else 8

    def dev_loop(stage):
        """Time `stage(starts) -> array` as REPS hoist-proof iterations
        inside one jit — relay dispatch latency (10s of ms per call in
        this container) otherwise swamps the device number."""
        @jax.jit
        def loop(s):
            def body(i, acc):
                return acc + stage(s + (i & 1)).sum()
            return jax.lax.fori_loop(0, REPS, body, jnp.int32(0))

        ms, _ = t(lambda: jax.block_until_ready(loop(dstarts)))
        return ms / REPS

    # lane materialization alone: byte gather vs word-row gather
    ms_bytes = dev_loop(
        lambda s: sess._gather_lanes(dflat, s, dlens, L).astype(jnp.int32))
    ms_words = dev_loop(
        lambda s: pallas_decode.flat_word_rows(dflat, s, dlens, L)[0])

    # materialization + kernel. Hoist-proofing must keep the DECODE
    # valid (garbage windows would run every lane to max_iters): the
    # per-lane DC init takes a runtime-zero perturbation derived from
    # the carried accumulator instead of shifting the starts.
    lut_args = tuple(map(jnp.asarray, tpu_decode.range_tables(sess.tables)))
    sched = jnp.asarray(sess.comp_idx[:B])
    lanes = pallas_decode.max_lanes_t(L + 24, B)
    S = dstarts.shape[0]
    n_comp = len(sess.components)

    @jax.jit
    def kloop(s):
        def body(i, acc):
            dc0 = jnp.full((S, n_comp),
                           jnp.where(acc == jnp.int32(-12345), 1, 0),
                           jnp.int32)
            out = pallas_decode.decode_flat_pallas_t(
                dflat, s, dlens, dsegb, sched, *lut_args, L=L,
                blocks_per_segment=B, n_components=n_comp,
                init_dc=dc0, lanes=min(max(lanes, 128), 512),
                interpret=interp)
            return acc + out.sum()
        return jax.lax.fori_loop(0, REPS, body, jnp.int32(0))

    ms_kernel, _ = t(lambda: jax.block_until_ready(kloop(dstarts)))
    ms_kernel /= REPS

    # padded route (round-5 default): host C++ pack at stride Lp, free
    # device reshape, kernel straight from the (S, Lp) matrix
    ms_prep_pad, pad_inputs = t(
        lambda: sess._padded_lane_inputs(flat, lens64, seg_blocks))
    lanebuf_p, p_starts, p_lens, p_segb, p_inv, Lp, Mp = pad_inputs
    ms_up_pad, pdev = t(lambda: jax.block_until_ready(tuple(map(
        jnp.asarray, (lanebuf_p, p_segb, p_inv)))))
    dlane, dpsegb, dpinv = pdev
    lanes_p = pallas_decode.max_lanes_t(Lp, B)

    @jax.jit
    def kloop_pad(lb):
        def body(i, acc):
            dc0 = jnp.full((S, n_comp),
                           jnp.where(acc == jnp.int32(-12345), 1, 0),
                           jnp.int32)
            out = pallas_decode.decode_segments_pallas_t(
                lb.reshape(-1, Lp), dpsegb, sched, *lut_args,
                blocks_per_segment=B, n_components=n_comp,
                init_dc=dc0, lanes=min(max(lanes_p, 128), 512),
                interpret=interp)
            return acc + out.sum()
        return jax.lax.fori_loop(0, REPS, body, jnp.int32(0))

    ms_kernel_pad, _ = t(lambda: jax.block_until_ready(kloop_pad(dlane)))
    ms_kernel_pad /= REPS

    # full fused graph from resident arrays, and end to end
    fn = sess._device_e2e_flat_jit(L, M)
    ms_graph, _ = t(lambda: jax.block_until_ready(
        fn(dflat, dstarts, dlens, dsegb, dinv)))
    fnp = sess._device_e2e_flat_jit(Lp, Mp, True)
    ms_graph_pad, _ = t(lambda: jax.block_until_ready(
        fnp(dlane, jnp.asarray(p_starts), jnp.asarray(p_lens),
            dpsegb, dpinv)))
    ms_e2e, _ = t(lambda: jax.block_until_ready(
        sess.decode_device_e2e(payload)))

    print(_json.dumps({
        "bench": "decode_profile_flat", "platform": platform, "S": S,
        "L": L, "M": M,
        "ms_destuff_flat": round(ms_destuff, 2),
        "ms_host_prep": round(ms_prep, 2),
        "ms_upload": round(ms_up, 2),
        "ms_byte_lane_gather": round(ms_bytes, 2),
        "ms_word_row_gather": round(ms_words, 2),
        "ms_words_plus_kernel": round(ms_kernel, 2),
        "Lp": Lp,
        "ms_host_prep_padded": round(ms_prep_pad, 2),
        "ms_upload_padded": round(ms_up_pad, 2),
        "ms_kernel_padded": round(ms_kernel_pad, 2),
        "ms_device_graph_padded": round(ms_graph_pad, 2),
        "ms_device_graph": round(ms_graph, 2),
        "ms_e2e": round(ms_e2e, 2),
        "mpix_s_e2e": round(mpix / (ms_e2e / 1e3), 1)}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
